import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ["JAX_TRACEBACK_FILTERING"] = "off"
sys.path.insert(0, "/root/repo")
import bench
t0=time.time()
try:
    info = bench.run_bench(float(sys.argv[1]) if len(sys.argv)>1 else 0.024)
    print("OK", info)
except Exception:
    import traceback; traceback.print_exc()
print("elapsed", time.time()-t0)
