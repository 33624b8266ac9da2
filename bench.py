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

    ref_its, ref_rn = 0, rn
    while ref_its < 8 and ref_rn > tol:
        if time.time() + max(60.0, 1.3 * last_step_s) > deadline - 45:
            _note("conv: refine deadline — stopping early")
            break
        t1 = time.time()
        out = ref_compiled(ns_k, kdf, lp.arrays, dfr.dfa, mask,
                           g_df.hi, g_df.lo, x_hi, n0_dev, hier, x_lo)
        new_rn = float(out.resnorm)      # blocks (async dispatch)
        last_step_s = time.time() - t1
        solve_s += last_step_s
        _note(f"conv: refine it {ref_its} df|F|={new_rn:.3e} "
              f"({last_step_s:.1f}s)")
        if new_rn >= ref_rn or not np.isfinite(new_rn):
            ref_rn = min(ref_rn, new_rn)
            break
        x_hi, x_lo = out.x_hi, out.x_lo
        ref_rn = new_rn
        ref_its += 1
    info.update(refine_its=ref_its,
                converged_rel_resnorm=ref_rn / r0,
                converged_solve_s=round(solve_s, 2),
                converged=bool(ref_rn <= tol))
    ctx["x_hi"], ctx["x_lo"] = x_hi, x_lo
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
        trace_s = time.time() - t0
    finally:
        shutil.rmtree(folder, ignore_errors=True)
    trace_io_s = io_write_s + io_read_s + trace_s
    info.update(
        io_write_s=round(io_write_s, 2), io_read_s=round(io_read_s, 2),
        trace_s=round(trace_s, 2), trace_io_s=round(trace_io_s, 2),
        n_outlet_points=int(len(res.outlet_points)),
        e2e_s=round(info.get("converged_solve_s", 0.0) + trace_io_s, 2))
    _note(f"trace: write {io_write_s:.1f}s read {io_read_s:.1f}s "
          f"trace {trace_s:.1f}s outlet_pts={len(res.outlet_points)}")
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
        _note(f"roofline: residual {gbps:.0f} GB/s ({frac:.2f}) "
              f"{dt * 1e3:.1f} ms")
        if time.time() + 300 > deadline:
            return info
        gbps, frac, dt = _phase_bw(
            lambda w: matrix_values_layered(kern, E, Lp, bs, arrays, w),
            (g,), jac_bytes, n_rep=3)
        info.update(asm_gbps=round(gbps, 1), asm_bw_frac=round(frac, 3),
                    asm_ms=round(dt * 1e3, 2), asm_path=ctx["lp"].asm_path)
        _note(f"roofline: jacobian {gbps:.0f} GB/s ({frac:.2f}) "
              f"{dt * 1e3:.1f} ms [{ctx['lp'].asm_path}]")
    except Exception as e:              # roofline is evidence, not product
        _note(f"roofline: failed ({type(e).__name__}: {e})")
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
    "converged_solve_s", "compile_refine_s", "converged_newton_its",
    "refine_its", "converged_rel_resnorm", "converged",
    "trace_io_s", "e2e_s", "n_outlet_points",
    "spmv_gbps", "spmv_bw_frac", "spmv_ms", "spmv_ell_gbps",
    "spmv_ell_ms", "resid_gbps",
    "resid_bw_frac", "resid_ms", "asm_gbps", "asm_bw_frac", "asm_ms",
    "asm_path",
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
