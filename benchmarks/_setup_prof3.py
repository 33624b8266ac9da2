"""Profile build_problem setup at bench scale on CPU (host-side work)."""
import cProfile, io, os, pstats, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
os.environ["BENCH_DEADLINE"] = str(time.time() + 3600)
import bench
lc = float(sys.argv[1]) if len(sys.argv) > 1 else 0.024
t0 = time.time()
pr = cProfile.Profile()
pr.enable()
mesh, W, lp, mask, g, g64, hier = bench.build_problem(lc)
pr.disable()
print(f"total setup {time.time()-t0:.1f}s ndofs={W.ndofs} cells={mesh.n_cells}")
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue())
