#!/usr/bin/env python
"""Benchmark: NS channel assembly + Newton wall-clock near 1M DOFs.

Matches the driver-defined metric (BASELINE.md): stabilized Navier-Stokes
on the image-derived channel — per-iteration cost of the Newton loop
(residual+Jacobian layered assembly, preconditioned FGMRES) on one TPU
chip.  Work per measured headline run is fixed (5 Newton iterations with
a capped inner solve), so the number is comparable across rounds.

BUDGET-SAFE (VERDICT round-2 item 1): the whole script runs under a hard
wall-clock budget (BENCH_BUDGET_S, default 2200 s).  The headline JSON
line is printed the moment ``steady_s`` exists — a late kill cannot erase
it — and every later phase (converged solve, trace+IO, roofline) runs in
whatever budget remains, deadline-checked between dispatches, each phase
re-emitting the JSON line with its extra keys (the driver reads the LAST
line).

ROUND-4 REDESIGN (VERDICT round-3 items 1-4):
  * The converged companion runs IN the headline child process — the
    headline line is already flushed, so a later crash costs only the
    extra keys, and the warm in-process jit cache saves the ~75 s the
    round-3 separate child spent rebuilding + re-deserializing.
  * NO Stokes program: the initializer is ONE Newton step of the SAME
    compiled headline program with the NS kernel at Re=1 (nu is a traced
    pytree leaf, utils/kernelbase.py; the reference's own main() uses
    Re=1 for its first pass, NavierStokesChannelFlow.py:567).  At w=0
    the NS Jacobian IS the Stokes operator, so this is the Stokes init
    by another (compile-free) name.  Round 3 spent 182 s here.
  * The double-float refine program is AOT-compiled (lower+compile)
    BEFORE the converged clock segment it is used in; its compile time
    is recorded separately (``compile_refine_s``) per VERDICT item 1
    ("report compile time separately from solve time").
  * ``first_run_s`` is decomposed: ``newton_trace_s`` (jaxpr trace) +
    ``newton_compile_s`` (XLA) are measured via AOT on the headline
    program (item 4's breakdown).
  * After the converged solve: the TRUE north-star tail — XDMF write,
    re-read from disk, forward+reverse streamtrace with the reference's
    200x200 reverse grid (InletBatchScript.py:39-77) — recorded as
    ``trace_io_s`` and ``e2e_s = converged_solve_s + trace_io_s``.
    ``trace_s`` is the WARM (second in-process) pass — the per-Re
    operating point of a production sweep; the first-in-process pass
    (program-upload dominated) is ``trace_cold_s``.
  * Roofline grounding (item 3): achieved HBM GB/s for the SpMV and
    Jacobian-assembly phases as fractions of the chip's published HBM
    bandwidth (ROOFLINE_HBM_GBPS, default 819 for v5e).

Prints one JSON line per completed phase (same metric/value, growing
key set):
  {"metric": ..., "value": ..., "unit": "s", "vs_baseline": ...}
"""

import glob
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

if os.environ.get("BENCH_CPU"):
    # logic-testing escape hatch: the axon TPU backend is pinned by
    # sitecustomize, so opting onto CPU needs a config update post-import
    import jax

    jax.config.update("jax_platforms", "cpu")

# ONE PC throughout (VERDICT round-2: no pc zoo): the degree-6
# Chebyshev-accelerated block-Jacobi V-cycle — the one smoother that is
# mesh-near-independent on the NS Jacobian AND survives the evolved-state
# complex spectrum at 1.05M dofs (history and measurements: solve/mg.py
# _lam_max_tail docstring, ROUND3.md).  BENCH_PC pins a single PC for
# A/B runs.
HEADLINE_PC = os.environ.get("BENCH_PC", "mg_cheby6_bf16")
# v5e HBM roofline (GB/s); override per-chip with ROOFLINE_HBM_GBPS
HBM_GBPS = float(os.environ.get("ROOFLINE_HBM_GBPS", "819"))
# v5e VPU f32 roofline ESTIMATE (GFLOP/s): an (8,128) vector unit with
# 4 FMA ALUs at ~0.94 GHz -> 8*128*4*2*0.94e9 ~ 7.7 TFLOP/s.  Used only
# to bound the elementwise assembly kernels' achieved-FLOPs fraction
# (VERDICT round-4 "FLOPs roofline for assembly"); override per chip.
VPU_GFLOPS = float(os.environ.get("ROOFLINE_VPU_GFLOPS", "7700"))


def _flops_of(fn, args):
    """XLA cost-analysis FLOP count of a jitted phase (the compiler's
    own static count — includes masked/predicated work, so it is an
    UPPER bound on useful flops and a fair utilization denominator)."""
    import jax

    comp = jax.jit(fn).lower(*args).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    return float((ca or {}).get("flops", 0.0))


def _budget() -> float:
    return float(os.environ.get("BENCH_BUDGET_S", "2200"))


def _deadline() -> float:
    return float(os.environ["BENCH_DEADLINE"])


def _note(msg):
    sys.stderr.write(msg.rstrip() + "\n")
    sys.stderr.flush()


def _mark_state(**kv):
    path = os.environ.get("BENCH_STATE")
    if not path:
        return
    try:
        state = json.load(open(path)) if os.path.exists(path) else {}
    except Exception:
        state = {}
    state.update(kv)
    with open(path, "w") as f:
        json.dump(state, f)


def build_problem(lc: float):
    from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
    from stabilized_navier_stokes_flow_fenicsx_tpu.flow.channel import (
        _setup_layered, generate_channel_mesh)
    from stabilized_navier_stokes_flow_fenicsx_tpu.flow.inlet import (
        solve_inlet_profiles)
    from stabilized_navier_stokes_flow_fenicsx_tpu.utils.testimg import (
        make_annulus_image)

    img = "/tmp/bench_circle.png"
    if not os.path.exists(img):
        make_annulus_image(img, "circle")
    inlet1, inlet2 = solve_inlet_profiles(img, 0.5, DEFAULT)
    mesh, _, _ = generate_channel_mesh(img, lc, DEFAULT, layered=True)
    W, lp, mask, g, g64, hier = _setup_layered(mesh, inlet1, inlet2,
                                               mg_levels=3)
    return dict(img=img, inlet1=inlet1, mesh=mesh, W=W, lp=lp, mask=mask,
                g=g, g64=g64, hier=hier)


def aot_newton_step(ctx, ksp_rtol=1e-3, ksp_max_restarts=4,
                    pc=HEADLINE_PC):
    """AOT-compile ONE max_it=1 Newton-step program (the headline shape)
    and return (call, trace_s, compile_s).

    The returned ``call(kern, w)`` dispatches the compiled executable
    directly — the nu/C_I kernel leaves are dynamic, so the SAME
    executable serves the Re=1 init rung, the target-Re Newton loop and
    the headline timing loop.  Per-dispatch stepping (not one big Newton
    jit) is the proven-safe shape at 1M+ dofs on the tunneled TPU."""
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
        make_ns_sups_kernel)
    from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
        solve_newton_layered)

    lp, mask, g, hier = ctx["lp"], ctx["mask"], ctx["g"], ctx["hier"]
    kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
    args = (kern, lp.n2d, lp.n_planes, lp.bs, lp.arrays, mask, g, g,
            lp.E, 0.0, 0.0, 1, ksp_rtol, 50, ksp_max_restarts, pc,
            ctx["hier"])
    t0 = time.time()
    lowered = solve_newton_layered.lower(*args)
    trace_s = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    compile_s = time.time() - t0

    def call(kern, w):
        # dynamic args only (statics are baked into the executable)
        return compiled(kern, lp.arrays, mask, g, w, hier)

    return call, trace_s, compile_s


def run_bench(ctx, newton_its: int = 5):
    import jax

    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
        make_ns_sups_kernel)

    deadline = _deadline()
    W, mesh = ctx["W"], ctx["mesh"]
    kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
    t0 = time.time()
    step, trace_s, compile_s = aot_newton_step(ctx)
    _note(f"bench: newton program trace {trace_s:.1f}s "
          f"compile {compile_s:.1f}s")
    ctx["step"] = step

    def run5():
        w, out = ctx["g"], None
        for _ in range(newton_its):
            out = step(kern, w)
            w = out.x
        jax.block_until_ready(out.x)
        return out

    # first dispatch timed alone: on the tunneled backend the first
    # execution of a fresh executable pays a program-load/warmup cost
    # that is NOT part of .compile() (measured 132 s at 70k dofs in
    # round 4) — keep it visible separately from the per-step cost
    t1 = time.time()
    out0 = step(kern, ctx["g"])
    float(out0.resnorm)    # host read: block_until_ready is a no-op on
    first_step_s = time.time() - t1       # the tunneled axon buffers
    _note(f"bench: first dispatch {first_step_s:.1f}s")
    t1 = time.time()
    out = run5()
    resnorm = float(out.resnorm)              # full sync through host read
    first_s = time.time() - t1 + first_step_s
    cold_s = time.time() - t0                 # trace + compile + first run
    _note(f"bench: first run {first_s:.1f}s (cold total {cold_s:.1f}s) "
          f"|F|={resnorm:.3e}")
    # shared-pool TPU: take the min of repeated runs to suppress
    # multi-tenant contention noise — but never past the deadline
    steady_s = first_s
    for _ in range(3):
        if time.time() + 1.2 * steady_s > deadline - 90:
            break
        t1 = time.time()
        out = run5()
        resnorm = float(out.resnorm)
        steady_s = min(steady_s, time.time() - t1)
    return {
        "ndofs": W.ndofs,
        "n_cells": mesh.n_cells,
        "pc": HEADLINE_PC,
        "setup_s": round(ctx["setup_s"], 2),
        "newton_trace_s": round(trace_s, 2),
        "newton_compile_s": round(compile_s, 2),
        "first_dispatch_s": round(first_step_s, 2),
        "first_run_s": round(cold_s, 2),
        "steady_s": round(steady_s, 3),
        "newton_its": int(out.iters),
        "resnorm": resnorm,
    }


def run_converged(info, ctx):
    """BASELINE.md's actual metric: a CONVERGED solve at this mesh —
    Re=1 Newton-step init (the compile-free Stokes equivalent), stepped
    Newton to the f32 floor, then double-float iterative refinement to
    the reference's 1e-8*n0.  The refine program is AOT-compiled first;
    its compile time is reported separately (compile_refine_s) and the
    converged clock counts only solve segments."""
    import jax.numpy as jnp

    from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.df_assembly import (
        DFResidual)
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
        make_ns_sups_kernel)
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes_df import (
        make_ns_sups_kernel_df, split64)
    from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
        refine_newton_layered, residual_norm_layered)

    deadline = _deadline()
    lp, mask, g, hier = ctx["lp"], ctx["mask"], ctx["g"], ctx["hier"]
    step = ctx["step"]
    pc = HEADLINE_PC

    ns_k = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
    ns_1 = make_ns_sups_kernel("tetrahedron", nu=1.0)

    # AOT the small assembly-only ||F|| program up front (its compile is
    # bookkeeping, not solve time)
    t0 = time.time()
    rn_compiled = residual_norm_layered.lower(
        ns_k, lp.n2d, lp.n_planes, lp.bs, lp.arrays, mask, g, g,
        lp.E).compile()
    _note(f"conv: resnorm program compile {time.time() - t0:.1f}s")

    # ---- init rung: one Newton step at Re=1 through the SAME compiled
    # headline program (at w=0 its Jacobian is the Stokes operator) ----
    t0 = time.time()
    out1 = step(ns_1, g)
    w = out1.x
    init_s = time.time() - t0
    _note(f"conv: re1 init {init_s:.1f}s |F_1|={float(out1.resnorm):.3e}")

    # ||F(w_init)|| at the TARGET Re (SNES tol semantics:
    # tol = 1e-8 * ||F(x_init)||)
    t0 = time.time()
    r0 = float(rn_compiled(ns_k, lp.arrays, mask, g, w))
    r0_s = time.time() - t0
    tol = 1e-8 * r0
    info["converged_r0"] = r0
    solve_s = init_s + r0_s

    # ---- f32 Newton to its noise floor -------------------------------
    its, rn = 0, r0
    last_step_s = max(init_s, 1.0)
    while its < 10 and rn > 1e-6 * r0:
        if time.time() + max(60.0, 1.3 * last_step_s) > deadline - 60:
            _note("conv: newton deadline — stopping early")
            break
        t1 = time.time()
        outc = step(ns_k, w)
        new_rn = float(outc.resnorm)     # blocks: the dispatch is async,
        last_step_s = time.time() - t1   # so time AFTER the host read
        solve_s += last_step_s
        _note(f"conv: newton it {its} |F|={new_rn:.3e} "
              f"({last_step_s:.1f}s)")
        if bool(outc.stalled) or new_rn > 0.5 * rn:
            # f32 floor territory (less than 2x reduction per step): the
            # df refinement below converges from here anyway
            if new_rn < rn:          # keep the better iterate
                w, rn = outc.x, new_rn
            break
        w = outc.x
        rn = new_rn
        its += 1
    info.update(converged_newton_its=its,
                converged_rel_resnorm=rn / r0,
                converged_solve_s=round(solve_s, 2))
    _mark_state(newton_done=True)
    # flush the Newton-stage keys NOW: the refine compile below is the
    # one big fresh program left and a crash there must not erase this
    emit(info)

    # ---- double-float refinement to the reference's 1e-8 -------------
    kdf = make_ns_sups_kernel_df("tetrahedron", nu=1.0 / 10.0)
    dfr = DFResidual(ctx["W"], kdf)
    g_df = split64(ctx["g64"])
    x_hi, x_lo = w, jnp.zeros_like(w)
    n0_dev = jnp.asarray(r0, x_hi.dtype)
    ref_args = (ns_k, kdf, lp.n2d, lp.n_planes, lp.bs, lp.E, lp.arrays,
                dfr.dfa, mask, g_df.hi, g_df.lo, x_hi, n0_dev,
                1e-8, 0.0, 1, 1e-2, 50, 8, pc, hier, x_lo)
    if time.time() + 60 > deadline - 45:
        _note("conv: no budget for refine compile")
        return info
    t0 = time.time()
    lowered = refine_newton_layered.lower(*ref_args)
    ref_trace_s = time.time() - t0
    t0 = time.time()
    ref_compiled = lowered.compile()
    ref_compile_s = time.time() - t0
    info["compile_refine_s"] = round(ref_trace_s + ref_compile_s, 2)
    _note(f"conv: refine program trace {ref_trace_s:.1f}s "
          f"compile {ref_compile_s:.1f}s")
    # Force the device program upload OUTSIDE the solve clock: the first
    # dispatch of a fresh executable pays the program transfer over the
    # relay (~14 s at 1M under congestion) — same convention as
    # first_dispatch_s for the headline program; the timed refine loop
    # below then re-runs from its own inputs.
    t0 = time.time()
    out0 = ref_compiled(ns_k, kdf, lp.arrays, dfr.dfa, mask, g_df.hi,
                        g_df.lo, x_hi, n0_dev, hier, x_lo)
    float(out0.resnorm)
    info["refine_first_dispatch_s"] = round(time.time() - t0, 2)
    _note(f"conv: refine first dispatch "
          f"{info['refine_first_dispatch_s']:.1f}s")

    def run_refine(kern_f32, kern_df, x_hi, x_lo, n0, rn_in, tol_in,
                   budget_guard=45):
        nonlocal last_step_s
        spent = 0.0
        its, rn_cur = 0, rn_in
        while its < 8 and rn_cur > tol_in:
            if time.time() + max(60.0, 1.3 * last_step_s) \
                    > deadline - budget_guard:
                _note("conv: refine deadline — stopping early")
                break
            t1 = time.time()
            out = ref_compiled(kern_f32, kern_df, lp.arrays, dfr.dfa,
                               mask, g_df.hi, g_df.lo, x_hi, n0, hier,
                               x_lo)
            new_rn = float(out.resnorm)      # blocks (async dispatch)
            last_step_s = time.time() - t1
            spent += last_step_s
            _note(f"conv: refine it {its} df|F|={new_rn:.3e} "
                  f"({last_step_s:.1f}s)")
            if new_rn >= rn_cur or not np.isfinite(new_rn):
                rn_cur = min(rn_cur, new_rn)
                break
            x_hi, x_lo = out.x_hi, out.x_lo
            rn_cur = new_rn
            its += 1
        return x_hi, x_lo, rn_cur, its, spent

    # the Re=1 init + Re=10 Newton segments are the shared ladder
    # prefix; the Re=40 clock below re-uses them but NOT the Re=10
    # refine (which only serves the Re=10 record)
    ladder_prefix_s = solve_s
    x_hi, x_lo, ref_rn, ref_its, spent = run_refine(
        ns_k, kdf, x_hi, x_lo, n0_dev, rn, tol)
    solve_s += spent
    info.update(refine_its=ref_its,
                converged_rel_resnorm=ref_rn / r0,
                converged_solve_s=round(solve_s, 2),
                converged=bool(ref_rn <= tol))
    ctx["x_hi"], ctx["x_lo"] = x_hi, x_lo
    ctx["trace_field"] = "re10"
    emit(info)

    # ---- production Reynolds (VERDICT round-4 item 2): continue the
    # continuation ladder from the f32 Re=10 iterate to Re=40 — the
    # easiest rung of the reference's production sweep
    # (run_all_RE.sh:7-10) — through the SAME compiled programs (nu is
    # a traced kernel leaf), then df-refine at Re=40.  re40_solve_s =
    # shared prefix + Re=40 segments (the Re=10 refine is excluded:
    # it is not on the Re=40 ladder path).
    if time.time() + 2 * max(60.0, last_step_s) > deadline - 45:
        _note("conv: no budget for the Re=40 ladder")
        return info
    re40_s = ladder_prefix_s
    w40 = w
    ladder_its = 0
    ns_40 = make_ns_sups_kernel("tetrahedron", nu=1.0 / 40.0)
    kdf_40 = make_ns_sups_kernel_df("tetrahedron", nu=1.0 / 40.0)
    t0 = time.time()
    r0_40 = float(rn_compiled(ns_40, lp.arrays, mask, g, w40))
    re40_s += time.time() - t0
    tol_40 = 1e-8 * r0_40
    # rung at Re=20 (2 steps to land in the Re=40 Newton basin), then
    # Newton at Re=40 to its f32 floor
    rungs = [(make_ns_sups_kernel("tetrahedron", nu=1.0 / 20.0), 2, "20"),
             (ns_40, 14, "40")]
    rn40 = r0_40
    for kern_r, max_r, name in rungs:
        rlast = np.inf
        for _ in range(max_r):
            if time.time() + max(60.0, 1.3 * last_step_s) \
                    > deadline - 45:
                _note("conv: re40 newton deadline — stopping early")
                break
            t1 = time.time()
            outc = step(kern_r, w40)
            new_rn = float(outc.resnorm)
            last_step_s = time.time() - t1
            re40_s += last_step_s
            ladder_its += 1
            _note(f"conv: re{name} newton |F|={new_rn:.3e} "
                  f"({last_step_s:.1f}s)")
            if not np.isfinite(new_rn):
                break
            if new_rn < rlast:
                w40 = outc.x
            if name == "40":
                rn40 = min(rn40, new_rn)
            if bool(outc.stalled) or new_rn > 0.5 * rlast:
                break                     # f32 floor: df refine takes over
            rlast = new_rn
    info.update(re40_newton_its=ladder_its, re40_r0=r0_40)
    x40_hi, x40_lo = w40, jnp.zeros_like(w40)
    n40_dev = jnp.asarray(r0_40, x40_hi.dtype)
    x40_hi, x40_lo, rn40, r40_ref_its, spent = run_refine(
        ns_40, kdf_40, x40_hi, x40_lo, n40_dev, rn40, tol_40)
    re40_s += spent
    info.update(re40_refine_its=r40_ref_its,
                re40_rel_resnorm=rn40 / r0_40,
                re40_solve_s=round(re40_s, 2),
                re40_converged=bool(rn40 <= tol_40))
    if np.isfinite(rn40) and rn40 <= tol_40:
        ctx["x_hi"], ctx["x_lo"] = x40_hi, x40_lo
        ctx["trace_field"] = "re40"
    return info


def run_trace_io(info, ctx):
    """The north-star tail (VERDICT round-3 item 2): XDMF write + re-read
    + forward/reverse streamtrace with the reference's 200x200 grid
    (InletBatchScript.py:39-77) on the converged 1M-dof field."""
    import shutil
    import tempfile

    from stabilized_navier_stokes_flow_fenicsx_tpu.config import DEFAULT
    from stabilized_navier_stokes_flow_fenicsx_tpu.io.xdmf import (
        read_xdmf_function, write_xdmf_function)
    from stabilized_navier_stokes_flow_fenicsx_tpu.trace.pipeline import (
        for_and_rev_streamtrace)

    deadline = _deadline()
    if "x_hi" not in ctx or time.time() + 120 > deadline:
        _note("trace: skipped (no converged field or no budget)")
        return info
    W, mesh = ctx["W"], ctx["mesh"]
    w_full = np.asarray(ctx["x_hi"], np.float64) + np.asarray(ctx["x_lo"])
    u, p = W.split(w_full)

    folder = tempfile.mkdtemp(prefix="bench_trace_")
    try:
        t0 = time.time()
        write_xdmf_function(f"{folder}/Re10ChannelVelocity", mesh,
                            np.asarray(u), "Velocity")
        write_xdmf_function(f"{folder}/Re10ChannelPressure", mesh,
                            np.asarray(p), "Pressure")
        io_write_s = time.time() - t0
        t0 = time.time()
        mesh_r, u_r = read_xdmf_function(
            f"{folder}/Re10ChannelVelocity", "Velocity")
        io_read_s = time.time() - t0
        t0 = time.time()
        seed_points = ctx["inlet1"].mesh.points
        res = for_and_rev_streamtrace(
            200, ctx["img"], mesh_r, u_r, seed_points, DEFAULT)
        trace_cold_s = time.time() - t0
        # Warm pass = the production sweep's per-Re operating point
        # (apps/sweep.py traces once per Re in one process; executables
        # and locator uploads are cached after the first).  The cold
        # first-in-process pass is dominated by program upload over the
        # relay (0.5-9 s per dispatch under congestion) and is reported
        # separately as trace_cold_s — same convention as
        # steady_s vs first_run_s for the solve.
        if time.time() + 60.0 < deadline:
            t0 = time.time()
            res = for_and_rev_streamtrace(
                200, ctx["img"], mesh_r, u_r, seed_points, DEFAULT)
            trace_s = time.time() - t0
        else:
            trace_s = trace_cold_s
    finally:
        shutil.rmtree(folder, ignore_errors=True)
    trace_io_s = io_write_s + io_read_s + trace_s
    # e2e_s DEFINITION (stated per VERDICT round-4 item 6): converged
    # device solve + XDMF write + re-read + full 200x200 streamtrace.
    # EXCLUDES setup_s (host meshing/pattern build) and AOT compile
    # times, which are reported separately (setup_s, newton_compile_s,
    # compile_refine_s).  re40_e2e_s uses the production-Reynolds
    # ladder clock; the trace runs on the field named by trace_field.
    st = dict(res.stats)
    disp = st.pop("dispatch_s", None) or []
    info.update(
        io_write_s=round(io_write_s, 2), io_read_s=round(io_read_s, 2),
        trace_s=round(trace_s, 2), trace_cold_s=round(trace_cold_s, 2),
        trace_io_s=round(trace_io_s, 2),
        n_outlet_points=int(len(res.outlet_points)),
        trace_field=ctx.get("trace_field", "re10"),
        trace_locator_s=st.get("locator_build_s"),
        trace_fwd_s=st.get("fwd_s"), trace_rev_s=st.get("rev_s"),
        trace_dispatches=st.get("dispatches"),
        trace_lane_steps=st.get("lane_steps"),
        trace_seed_steps=st.get("seed_steps"),
        trace_dispatch_sum_s=round(sum(disp), 2),
        trace_first_dispatch_s=(round(disp[0], 2) if disp else None),
        e2e_s=round(info.get("converged_solve_s", 0.0) + trace_io_s, 2))
    if "re40_solve_s" in info:
        info["re40_e2e_s"] = round(info["re40_solve_s"] + trace_io_s, 2)
    _note(f"trace: write {io_write_s:.1f}s read {io_read_s:.1f}s "
          f"trace {trace_s:.1f}s outlet_pts={len(res.outlet_points)} "
          f"stats={st} disp={disp}")
    return info


def _phase_bw(fn, args, nbytes, n_rep=10, chain=1):
    """(achieved GB/s, fraction of HBM roofline) for a jitted phase.

    ``nbytes`` is the FIRST-PRINCIPLES algorithmic byte count (the
    streams the algorithm must move), NOT XLA cost_analysis's "bytes
    accessed" — the latter sums per-op operand bytes including
    fusion-internal traffic and overcounts ~8-50x (measured round 4),
    which would make the fraction unfalsifiable.

    ``chain`` > 1 applies fn to its own output that many times INSIDE
    one jitted program (fn must be an endomorphism in its last arg) —
    required for sub-10ms phases, where the ~4-5 ms per-dispatch floor
    of the tunneled TPU otherwise swamps the kernel (measured: the
    1.05M-dof SpMV reads 0.15 of roofline per-dispatch, 0.7+ chained).
    """
    import jax
    import jax.numpy as jnp

    def _sync(out):
        # block_until_ready is a no-op on tunneled axon buffers; a
        # scalar host read is the only reliable fence
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf).astype(jnp.float32))

    if chain > 1:
        inner = fn

        def fn(*a):
            def body(_, x):
                return inner(*a[:-1], x)
            return jax.lax.fori_loop(0, chain, body, a[-1])

    compiled = jax.jit(fn).lower(*args).compile()
    _sync(compiled(*args))
    t0 = time.time()
    for _ in range(n_rep):
        out = compiled(*args)
    _sync(out)
    dt = (time.time() - t0) / n_rep / chain
    gbps = nbytes / dt / 1e9
    return gbps, gbps / HBM_GBPS, dt


def run_roofline(info, ctx):
    """Ground the perf claims in hardware (VERDICT round-3 item 3):
    achieved HBM bandwidth of the bandwidth-bound phases as a fraction
    of the chip roofline (HBM_GBPS)."""
    import jax.numpy as jnp

    from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
        layered_matvec, matrix_values_layered, residual_layered)
    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
        make_ns_sups_kernel)

    deadline = _deadline()
    lp, mask, g = ctx["lp"], ctx["mask"], ctx["g"]
    kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
    arrays = lp.arrays
    n2d, Lp, bs, E = lp.n2d, lp.n_planes, lp.bs, lp.E
    ndofs = n2d * Lp * bs
    nc = int(arrays.cell_dofs.shape[0])
    ndl = int(arrays.cell_dofs.shape[1])
    nnzb = E * 3 * Lp
    # first-principles stream bytes (f32):
    #   spmv: value tensor once + x gathered per directed pair-plane
    #         (3-plane stack) + y write
    spmv_bytes = nnzb * bs * bs * 4 + 3 * nnzb * bs * 4 + 2 * ndofs * 4
    #   residual: per cell, dof ids (int32) + gathered w + coords, plus
    #             the segment-sum contribution write/read and y
    resid_bytes = nc * (ndl * 4 + ndl * 4 + 12 * 4) \
        + 2 * nc * ndl * 4 + 2 * ndofs * 4
    #   jacobian: same cell streams + the (bs, bs) block value writes
    jac_bytes = nc * (ndl * 4 + ndl * 4 + 12 * 4) + nnzb * bs * bs * 4 \
        + 2 * nc * ndl * ndl * 4
    try:
        if time.time() + 90 > deadline:
            return info
        V = matrix_values_layered(kern, E, Lp, bs, arrays, g)
        # chained (16 back-to-back matvecs in ONE program): the ~4-5 ms
        # relay dispatch floor otherwise swamps the ~1 ms kernel
        gbps, frac, dt = _phase_bw(
            lambda v, x: layered_matvec(arrays, n2d, Lp, v, x), (V, g),
            spmv_bytes, n_rep=4, chain=16)
        info.update(spmv_gbps=round(gbps, 1), spmv_bw_frac=round(frac, 3),
                    spmv_ms=round(dt * 1e3, 2))
        _note(f"roofline: spmv {gbps:.0f} GB/s ({frac:.2f} of "
              f"{HBM_GBPS:.0f}) {dt * 1e3:.1f} ms")
        # SpMV granularity proof (VERDICT round-4 item 9): the
        # gather+fold skeleton of the matvec WITHOUT the value stream —
        # x.reshape(Lp,n2d,bs)[:, cols, :] materialized, then the same
        # sorted segment_sum fold (needed to stay an endomorphism for
        # chaining).  If this skeleton alone runs at the same achieved
        # GB/s as the full matvec, the gather/scatter granularity IS
        # the bound; if it runs near roofline, the bound is the value
        # stream.
        import jax

        gath_bytes = 2 * Lp * E * bs * 4 + 2 * ndofs * 4

        def xgather(x):
            xg = x.reshape(Lp, n2d, bs)[:, arrays.cols, :]
            y2d = jax.ops.segment_sum(
                xg.transpose(1, 2, 0), arrays.row_ids, num_segments=n2d,
                indices_are_sorted=True)
            return y2d.transpose(2, 0, 1).reshape(-1)

        gbps_g, _, dt_g = _phase_bw(
            lambda _v, x: xgather(x), (V, g), gath_bytes, n_rep=4,
            chain=16)
        info.update(spmv_gather_gbps=round(gbps_g, 1),
                    spmv_gather_ms=round(dt_g * 1e3, 2))
        _note(f"roofline: spmv x-gather {gbps_g:.0f} GB/s "
              f"({gbps_g / HBM_GBPS:.2f}) {dt_g * 1e3:.1f} ms")
        if time.time() + 120 > deadline:
            return info
        # ELL A/B (VERDICT round-3 item 9): same values, scatter-free
        # gathered-x layout — one recorded number at the bench mesh
        try:
            from stabilized_navier_stokes_flow_fenicsx_tpu.assemble. \
                pallas_spmv import build_ell

            ell = build_ell(arrays, n2d, Lp)
            arr_ell = arrays._replace(
                ell_perm=jnp.asarray(ell.perm),
                ell_mask=jnp.asarray(ell.slot_mask, g.dtype),
                ell_cols=jnp.asarray(ell.cols))
            gbps, frac, dt = _phase_bw(
                lambda v, x: layered_matvec(arr_ell, n2d, Lp, v, x),
                (V, g), spmv_bytes, n_rep=4, chain=16)
            info.update(spmv_ell_gbps=round(gbps, 1),
                        spmv_ell_ms=round(dt * 1e3, 2))
            _note(f"roofline: spmv-ell {gbps:.0f} GB/s ({frac:.2f}) "
                  f"{dt * 1e3:.1f} ms")
        except Exception as e:
            _note(f"roofline: spmv-ell skipped ({type(e).__name__}: {e})")
        if time.time() + 240 > deadline:
            return info
        # the SHIPPING residual path (SoA structured when available)
        gbps, frac, dt = _phase_bw(
            lambda w: residual_layered(kern, n2d, Lp, bs, arrays, w),
            (g,), resid_bytes, n_rep=5)
        info.update(resid_gbps=round(gbps, 1),
                    resid_bw_frac=round(frac, 3),
                    resid_ms=round(dt * 1e3, 2))
        rf = _flops_of(
            lambda w: residual_layered(kern, n2d, Lp, bs, arrays, w),
            (g,))
        info.update(resid_gflops=round(rf / dt / 1e9, 1),
                    resid_flops_frac=round(rf / dt / 1e9 / VPU_GFLOPS, 3))
        _note(f"roofline: residual {gbps:.0f} GB/s ({frac:.2f}) "
              f"{dt * 1e3:.1f} ms  {rf / dt / 1e9:.0f} GFLOP/s "
              f"({rf / dt / 1e9 / VPU_GFLOPS:.2f} of VPU est)")
        if time.time() + 300 > deadline:
            return info
        gbps, frac, dt = _phase_bw(
            lambda w: matrix_values_layered(kern, E, Lp, bs, arrays, w),
            (g,), jac_bytes, n_rep=3)
        info.update(asm_gbps=round(gbps, 1), asm_bw_frac=round(frac, 3),
                    asm_ms=round(dt * 1e3, 2), asm_path=ctx["lp"].asm_path)
        af = _flops_of(
            lambda w: matrix_values_layered(kern, E, Lp, bs, arrays, w),
            (g,))
        info.update(asm_gflops=round(af / dt / 1e9, 1),
                    asm_flops_frac=round(af / dt / 1e9 / VPU_GFLOPS, 3))
        _note(f"roofline: jacobian {gbps:.0f} GB/s ({frac:.2f}) "
              f"{dt * 1e3:.1f} ms [{ctx['lp'].asm_path}]  "
              f"{af / dt / 1e9:.0f} GFLOP/s "
              f"({af / dt / 1e9 / VPU_GFLOPS:.2f} of VPU est)")
    except Exception as e:              # roofline is evidence, not product
        _note(f"roofline: failed ({type(e).__name__}: {e})")
    return info


def run_step_budget(info, ctx):
    """Publish the per-Newton-step budget (VERDICT round-4 item 3):
    five instrumented steps (per-step wall + inner KSP iterations from
    NewtonResult.history), then isolated component programs — Jacobian
    assembly, residual, SpMV (from the roofline phase), V-cycle apply
    and PC setup (two-program difference) — composed into a model that
    must account for steady_s/5, with any gap published as
    ``unattributed_ms``."""
    import jax
    import jax.numpy as jnp

    from stabilized_navier_stokes_flow_fenicsx_tpu.forms.navier_stokes import (
        make_ns_sups_kernel)
    from stabilized_navier_stokes_flow_fenicsx_tpu.assemble.layered import (
        matrix_values_layered)
    from stabilized_navier_stokes_flow_fenicsx_tpu.solve.driver import (
        _layered_pc)

    deadline = _deadline()
    if "step" not in ctx or time.time() + 120 > deadline:
        _note("step_budget: skipped (no budget)")
        return info
    lp, mask, g, hier = ctx["lp"], ctx["mask"], ctx["g"], ctx["hier"]
    step = ctx["step"]
    kern = make_ns_sups_kernel("tetrahedron", nu=1.0 / 10.0)
    try:
        w = g
        per, ksp_its, ls_lam = [], [], []
        for _ in range(5):
            t1 = time.time()
            out = step(kern, w)
            float(out.resnorm)            # host read = fence
            per.append(round(time.time() - t1, 3))
            h = np.asarray(out.history)
            ksp_its.append(int(h[0, 2]))
            ls_lam.append(float(h[0, 1]))
            w = out.x
        V = matrix_values_layered(kern, lp.E, lp.n_planes, lp.bs,
                                  lp.arrays, w)
        make_pc = _layered_pc(HEADLINE_PC, lp.arrays, lp.n2d,
                              lp.n_planes, mask, hier)

        def apply1(v, r):
            return make_pc(v)(r)

        def apply9(v, r):
            pc = make_pc(v)
            return jax.lax.fori_loop(0, 9, lambda i, x: pc(x), r)

        def _time_it(fn, n_rep=4):
            comp = jax.jit(fn).lower(V, g).compile()
            float(jnp.sum(comp(V, g)).astype(jnp.float32))
            t0 = time.time()
            for _ in range(n_rep):
                o = comp(V, g)
            float(jnp.sum(o).astype(jnp.float32))
            return (time.time() - t0) / n_rep

        t1 = _time_it(apply1)
        t9 = _time_it(apply9)
        vcycle_ms = (t9 - t1) / 8 * 1e3
        pc_setup_ms = max(t1 * 1e3 - vcycle_ms, 0.0)
        step_ms = info.get("steady_s", sum(per)) / 5 * 1e3
        asm_ms = info.get("asm_ms", 0.0)
        resid_ms = info.get("resid_ms", 0.0)
        spmv_ms = info.get("spmv_ms", 0.0)
        k_mean = float(np.mean(ksp_its))
        krylov_ms = k_mean * (spmv_ms + vcycle_ms)
        # line search: lambda == 1 -> one residual eval (accept); each
        # backtrack adds one more.  The Newton step also pays one
        # residual for the convergence check.
        ls_evals = [1 + max(0, int(round(np.log2(1 / max(l, 1e-6)))))
                    for l in ls_lam]
        ls_ms = (1 + float(np.mean(ls_evals))) * resid_ms
        model_ms = asm_ms + pc_setup_ms + krylov_ms + ls_ms
        info["step_budget"] = {
            "step_ms": round(step_ms, 1),
            "per_step_s": per,
            "ksp_its": ksp_its,
            "ls_lambda": ls_lam,
            "jac_ms": asm_ms,
            "resid_ms": resid_ms,
            "spmv_ms": spmv_ms,
            "vcycle_ms": round(vcycle_ms, 2),
            "pc_setup_ms": round(pc_setup_ms, 1),
            "krylov_ms": round(krylov_ms, 1),
            "linesearch_ms": round(ls_ms, 1),
            "model_ms": round(model_ms, 1),
            "unattributed_ms": round(step_ms - model_ms, 1),
        }
        _note(f"step_budget: {json.dumps(info['step_budget'])}")
    except Exception as e:          # evidence, not product
        _note(f"step_budget: failed ({type(e).__name__}: {e})")
    return info


def previous_round_value():
    best = None
    for f in sorted(glob.glob("BENCH_r*.json")):
        try:
            d = json.load(open(f))
            if isinstance(d, dict) and "parsed" in d:
                d = d["parsed"]           # driver wraps the JSON line
            if isinstance(d, dict) and d and "value" in d:
                best = float(d["value"])
        except Exception:
            pass
    return best


EMIT_KEYS = (
    "pc", "newton_trace_s", "newton_compile_s", "first_dispatch_s",
    "first_run_s",
    "converged_solve_s", "compile_refine_s", "refine_first_dispatch_s",
    "converged_newton_its",
    "refine_its", "converged_rel_resnorm", "converged",
    "re40_newton_its", "re40_refine_its", "re40_rel_resnorm",
    "re40_solve_s", "re40_converged", "re40_e2e_s",
    "trace_io_s", "e2e_s", "n_outlet_points", "trace_field",
    "trace_s", "trace_cold_s", "trace_locator_s", "trace_fwd_s",
    "trace_rev_s",
    "trace_dispatches", "trace_lane_steps", "trace_seed_steps",
    "trace_dispatch_sum_s", "trace_first_dispatch_s",
    "spmv_gbps", "spmv_bw_frac", "spmv_ms", "spmv_gather_gbps",
    "spmv_gather_ms", "spmv_ell_gbps",
    "spmv_ell_ms", "resid_gbps",
    "resid_bw_frac", "resid_ms", "asm_gbps", "asm_bw_frac", "asm_ms",
    "asm_path", "asm_gflops", "asm_flops_frac", "resid_gflops",
    "resid_flops_frac",
    "step_budget",
)


def emit(info):
    value = info["steady_s"]
    prev = previous_round_value()
    vs = round(prev / value, 3) if prev else 1.0
    line = {
        "metric": ("ns_channel_assembly_newton_5it_wallclock_"
                   f"{info['ndofs']}dofs"),
        "value": value,
        "unit": "s",
        "vs_baseline": vs,
    }
    for k in EMIT_KEYS:
        if k in info:
            line[k] = info[k]
    print(json.dumps(line), flush=True)
    _mark_state(printed=True)
    _note(json.dumps(info))


def child(lc: float):
    """One child process runs all phases in order, re-emitting the JSON
    line as each phase completes.  The headline line is flushed first, so
    later phases can only ADD evidence, never cost it."""
    t0 = time.time()
    ctx = build_problem(lc)
    ctx["setup_s"] = time.time() - t0
    _note(f"bench: setup {ctx['setup_s']:.1f}s ndofs={ctx['W'].ndofs} "
          f"cells={ctx['mesh'].n_cells}")
    info = run_bench(ctx)
    emit(info)                          # headline is now on stdout
    _mark_state(info=info, lc=lc)
    info = run_converged(info, ctx)
    emit(info)
    _mark_state(converged_done=True, info=info)
    info = run_trace_io(info, ctx)
    info = run_roofline(info, ctx)
    info = run_step_budget(info, ctx)
    emit(info)
    _mark_state(all_done=True, info=info)


def child_converged(lc: float):
    """Fallback: converged+trace phases in a fresh process (used only
    when the main child died after printing the headline)."""
    state = json.load(open(os.environ["BENCH_STATE"]))
    info = state["info"]
    t0 = time.time()
    ctx = build_problem(lc)
    ctx["setup_s"] = time.time() - t0
    _note(f"conv: rebuild {ctx['setup_s']:.1f}s")
    step, trace_s, compile_s = aot_newton_step(ctx)
    ctx["step"] = step
    info = run_converged(info, ctx)
    emit(info)
    info = run_trace_io(info, ctx)
    info = run_roofline(info, ctx)
    info = run_step_budget(info, ctx)
    emit(info)


def main():
    import subprocess
    import tempfile

    args = [a for a in sys.argv[1:]
            if a not in ("--child", "--child-converged")]
    if "--child" in sys.argv[1:]:
        child(float(args[0]))
        return
    if "--child-converged" in sys.argv[1:]:
        child_converged(float(args[0]))
        return

    t_start = time.time()
    deadline = t_start + _budget()
    lc0 = float(args[0]) if args else 0.024
    state_file = tempfile.mktemp(prefix="bench_state_")

    # The tunneled TPU relay sometimes wedges for tens of minutes (device
    # init hangs, round-3 observation): a doomed first attempt would
    # otherwise hang until the subprocess timeout and burn the entire
    # budget.  Probe with a trivial jit in a short-lived child and wait
    # out a wedge while budget allows.
    if not os.environ.get("BENCH_CPU"):
        probe = ("import jax, jax.numpy as jnp; "
                 "jax.jit(lambda a: a + 1)(jnp.ones(4)).block_until_ready()")

        def _tpu_alive():
            try:
                return subprocess.run(
                    [sys.executable, "-c", probe], timeout=180,
                    cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
                ).returncode == 0
            except subprocess.TimeoutExpired:
                return False

        while deadline - time.time() > 420 and not _tpu_alive():
            _note("bench: TPU backend unresponsive — waiting 120 s "
                  "for the relay to recover")
            time.sleep(120)
    env = dict(os.environ,
               BENCH_DEADLINE=str(deadline - 10),
               BENCH_STATE=state_file)
    # attempt ladder over (mesh, preconditioner): degree-6 Chebyshev
    # first (the one smoother that survives the evolved-state spectrum
    # at 1.05M — see HEADLINE_PC notes), demoting degree/mesh in a FRESH
    # child on any failure.  BENCH_PC pins one PC (A/B runs).
    user_pc = os.environ.get("BENCH_PC")
    if user_pc:
        attempts = [(lc0, user_pc), (0.035, user_pc)]
    else:
        attempts = [(lc0, "mg_cheby6_bf16"), (lc0, "mg_cheby8_bf16"),
                    (0.035, "mg_cheby6_bf16")]
    state = None
    pc_used = None
    for try_lc, pc in attempts:
        remaining = deadline - time.time() - 5
        if remaining < 120:
            break
        try:
            # child inherits stdout: its headline JSON line reaches the
            # driver the moment it is printed, kill-proof.  A failed TPU
            # dispatch poisons the process-wide client, so each attempt
            # gets a fresh process.
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child",
                 str(try_lc)],
                env=dict(env, BENCH_PC=pc), timeout=remaining,
                cwd=os.path.dirname(os.path.abspath(__file__)) or ".")
        except subprocess.TimeoutExpired:
            pass
        try:
            state = json.load(open(state_file))
        except Exception:
            state = {}
        if state.get("printed"):
            pc_used = pc
            break                       # headline is on stdout
        _note(f"bench: attempt lc={try_lc} pc={pc} produced no "
              "headline; falling back")
        state = None
    if state and state.get("printed") and not state.get("all_done"):
        # the child died mid-extras: finish the converged companion in a
        # fresh process (warm persistent cache) if budget remains
        remaining = deadline - time.time() - 5
        if remaining > 240 and not state.get("converged_done"):
            try:
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--child-converged", str(state["lc"])],
                    env=dict(env, BENCH_PC=pc_used),
                    timeout=remaining, cwd=os.path.dirname(
                        os.path.abspath(__file__)) or ".")
            except subprocess.TimeoutExpired:
                pass
        return
    if state and state.get("printed"):
        return
    # last resort: tiny in-process run so the round records SOMETHING
    os.environ["BENCH_DEADLINE"] = str(time.time() + 600)
    ctx = build_problem(0.08)
    ctx["setup_s"] = 0.0
    info = run_bench(ctx)
    emit(info)


if __name__ == "__main__":
    main()
