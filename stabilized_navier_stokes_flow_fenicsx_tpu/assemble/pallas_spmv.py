"""Pallas TPU kernel experiment: fused layered SpMV (VERDICT item 10).

The layered operator's SpMV (assemble/layered.py::layered_matvec) is the
hot op of every FGMRES iteration.  The XLA formulation materializes two
SpMV-sized intermediates in HBM (the shifted gather stack ``xs`` and the
per-pair ``contrib`` before segment_sum); on a bandwidth-bound op those
round-trips are the remaining headroom (~40% extra bytes).

This kernel removes them with a regularized ELL layout:

* pairs are padded per 2D row to a fixed degree D (ELL) so every grid
  tile maps to a *static* slice — the whole kernel is BlockSpec-
  pipelined, no manual DMA, no scalar prefetch;
* the plane axis (padded to a lane multiple of 128) rides the lanes, so
  the tridiagonal plane shifts x[l±1] are lane rolls with edge masks —
  no shifted copies of x ever exist in HBM;
* the row reduction happens in VMEM (sum over the D slot axis), so the
  per-pair contributions are never written out.

Cost model (bs=4): values stream 48 f32/pair vs gather+contrib aux
traffic ~(12*2 + 4*2); ELL padding multiplies the value stream by
D/avg_degree (~1.34 on tri2d cross-sections) and the lane padding by
ceil(Lp/128)*128/Lp (1.66x at the lc=0.04 channel's Lp=77).

MEASURED (v5e, 230k-dof channel, lc=0.04, D=9, avg_deg=6.72, Lp=77):

    xla layered_matvec f32   1.18 ms   (baseline)
    pallas ELL f32           2.27 ms   0.59x  <- lane+ELL padding loses
    pallas ELL bf16 values   1.85 ms   0.72x
    xla ELL f32 (below)      1.17 ms   1.14x  <- scatter-free, no lanes pad
    xla ELL bf16 values      2.56 ms   0.52x  (XLA upcasts the whole
                                               tensor in a separate pass)

Conclusion (docs/ARCHITECTURE.md): the existing XLA layered matvec is
already within ~15% of the value-stream bandwidth bound; the fused
Pallas kernel cannot beat it at the production channel's plane counts
because the (8,128) lane tiling forces Lp->128 padding on the dominant
value stream.  The scatter-free XLA-ELL variant (layered_matvec_ell) is
the only net win (+14%) and needs no Pallas at all.  Kept as a measured
experiment + interpreter-mode correctness tests; not wired into the
solver (a ~5% end-to-end win does not justify forking the value layout).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .layered import LayeredArrays


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class EllLayout(NamedTuple):
    """Host-precomputed ELL metadata for the layered pattern."""

    perm: np.ndarray          # (n2d, D) pair id feeding each slot (or 0)
    slot_mask: np.ndarray     # (n2d, D) 1.0 for real pairs, 0.0 for pad
    cols: np.ndarray          # (n2d, D) 2D column node of each slot
    D: int
    n2d: int
    Lp: int
    Lpad: int
    tile_rows: int


def build_ell(arrays: LayeredArrays, n2d: int, n_planes: int,
              tile_rows: int = 8) -> EllLayout:
    """Regularize the row-sorted pair list to fixed degree D."""
    row_ids = np.asarray(arrays.row_ids)
    cols = np.asarray(arrays.cols)
    counts = np.bincount(row_ids, minlength=n2d)
    D = int(counts.max())
    perm = np.zeros((n2d, D), dtype=np.int32)
    mask = np.zeros((n2d, D), dtype=np.float32)
    cell = np.zeros((n2d, D), dtype=np.int32)
    start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for r in range(n2d):
        c = counts[r]
        perm[r, :c] = np.arange(start[r], start[r] + c)
        mask[r, :c] = 1.0
        cell[r, :c] = cols[start[r]:start[r] + c]
    return EllLayout(perm, mask, cell, D, n2d,
                     n_planes, _round_up(n_planes, 128), tile_rows)


def ell_values(ell: EllLayout, values: jnp.ndarray,
               dtype=None) -> jnp.ndarray:
    """(bs, bs, 3, E, Lp) -> (n2d*D, bs*bs*3, Lpad), slot-masked."""
    bs = values.shape[0]
    v = values.reshape(bs * bs * 3, -1, ell.Lp)        # (48, E, Lp)
    v = v[:, ell.perm.reshape(-1), :]                  # (48, n2d*D, Lp)
    v = v * ell.slot_mask.reshape(1, -1, 1)
    v = jnp.pad(v, ((0, 0), (0, 0), (0, ell.Lpad - ell.Lp)))
    v = v.transpose(1, 0, 2)                           # (n2d*D, 48, Lpad)
    if dtype is not None:
        v = v.astype(dtype)
    return v


def _spmv_kernel(x_ref, v_ref, out_ref, *, TR: int, D: int, bs: int,
                 Lp: int, Lpad: int):
    """One tile: TR rows x D slots, all planes.

    x_ref:   (TR*D*bs, Lpad) gathered x, slot-order matching v_ref
    v_ref:   (TR*D*bs*bs*3, Lpad) ELL values
    out_ref: (TR*bs, Lpad)
    """
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:].astype(jnp.float32).reshape(TR, D, bs, Lpad)
    v = v_ref[:].astype(jnp.float32).reshape(TR, D, bs, bs, 3, Lpad)
    # plane shifts on the lane axis: delta=-1 wants x[l-1] -> roll +1,
    # delta=+1 wants x[l+1] -> roll -1.  Edge masks: x[-1] = 0 (lane 0
    # after the +1 roll); x[Lp] = 0 (lane Lp-1 after the -1 roll --
    # already zero when Lpad > Lp via the pad region, masked explicitly
    # so Lp == Lpad stays correct too).
    lane = jax.lax.broadcasted_iota(jnp.int32, (TR, D, bs, Lpad), 3)
    # pltpu.roll wants a non-negative shift and an explicit axis: the
    # x[l+1] shift of -1 is the circular shift Lpad-1
    xm = jnp.where(lane == 0, 0.0, pltpu.roll(x, shift=1, axis=3))
    xp = jnp.where(lane == Lp - 1, 0.0,
                   pltpu.roll(x, shift=Lpad - 1, axis=3))
    xs = jnp.stack([xm, x, xp], axis=3)                # (TR,D,bs,3,Lpad)
    # y[r, i, l] = sum_{k, j, d} V[r,k,i,j,d,l] * xs[r,k,j,d,l]
    y = (v * xs[:, :, None]).sum(axis=(1, 3, 4))       # (TR, bs, Lpad)
    out_ref[:] = y.reshape(TR * bs, Lpad)


def layered_matvec_pallas(
    ell: EllLayout,
    v_ell: jnp.ndarray,           # ell_values output
    x: jnp.ndarray,               # (ndofs,) plane-major
    bs: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A x with the fused Pallas kernel (single chip)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TR, D, Lp, Lpad, n2d = (ell.tile_rows, ell.D, ell.Lp, ell.Lpad,
                            ell.n2d)
    n_tiles = n2d // TR if n2d % TR == 0 else n2d // TR + 1
    n2d_pad = n_tiles * TR

    xg = x.reshape(Lp, n2d, bs)
    # one XLA gather: (Lp, n2d, bs) -> slot-ordered (n2d*D, bs, Lp)
    xg = xg[:, ell.cols.reshape(-1), :]                # (Lp, n2d*D, bs)
    xg = xg.transpose(1, 2, 0)                         # (n2d*D, bs, Lp)
    # zero the l >= Lp lanes (doubles as the x[l+1] edge mask)
    xg = jnp.pad(xg, ((0, (n2d_pad - n2d) * D), (0, 0),
                      (0, Lpad - Lp)))
    v_pad = jnp.pad(v_ell, ((0, (n2d_pad - n2d) * D), (0, 0), (0, 0)))

    out = pl.pallas_call(
        partial(_spmv_kernel, TR=TR, D=D, bs=bs, Lp=Lp, Lpad=Lpad),
        out_shape=jax.ShapeDtypeStruct((n2d_pad * bs, Lpad),
                                       jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TR * D * bs, Lpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR * D * bs * bs * 3, Lpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TR * bs, Lpad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xg.reshape(n2d_pad * D * bs, Lpad),
      v_pad.reshape(n2d_pad * D * bs * bs * 3, Lpad))

    y = out.reshape(n2d_pad, bs, Lpad)[:n2d, :, :Lp]
    return y.transpose(2, 0, 1).reshape(-1)


def layered_matvec_ell(
    ell: EllLayout,
    v_ell_t: jnp.ndarray,         # (n2d, D, bs, bs, 3, Lp) -- ell_values_t
    x: jnp.ndarray,               # (ndofs,) plane-major
    bs: int,
) -> jnp.ndarray:
    """Scatter-free pure-XLA ELL matvec (no Pallas, no lane padding).

    The ELL regularization already removes the segment_sum scatter: with a
    fixed degree D the row reduction is a dense sum over the slot axis,
    which XLA fuses with the multiply — no contrib materialization, no
    sorted-segment pass.  Value padding D/avg_degree (~1.34x) is the only
    overhead; measured against layered_matvec in benchmarks/_pallas_bench.py.
    """
    n2d, D, Lp = ell.n2d, ell.D, ell.Lp
    xr = x.reshape(Lp, n2d, bs)
    xg = xr[:, ell.cols.reshape(-1), :]              # (Lp, n2d*D, bs)
    xg = xg.transpose(1, 2, 0).reshape(n2d, D, bs, Lp)
    zero = jnp.zeros((n2d, D, bs, 1), xg.dtype)
    xm = jnp.concatenate([zero, xg[..., :-1]], axis=-1)
    xp = jnp.concatenate([xg[..., 1:], zero], axis=-1)
    xs = jnp.stack([xm, xg, xp], axis=3)             # (n2d, D, bs, 3, Lp)
    y = (v_ell_t.astype(xs.dtype) * xs[:, :, None]).sum(axis=(1, 3, 4))
    return y.transpose(2, 0, 1).reshape(-1)          # (Lp*n2d*bs,)


def ell_values_t(ell: EllLayout, values: jnp.ndarray,
                 dtype=None) -> jnp.ndarray:
    """(bs, bs, 3, E, Lp) -> (n2d, D, bs, bs, 3, Lp) for the XLA ELL."""
    bs = values.shape[0]
    v = values.reshape(bs * bs * 3, -1, ell.Lp)      # (48, E, Lp)
    v = v[:, ell.perm.reshape(-1), :]                # (48, n2d*D, Lp)
    v = v * ell.slot_mask.reshape(1, -1, 1)
    v = v.transpose(1, 0, 2).reshape(ell.n2d, ell.D, bs, bs, 3, ell.Lp)
    if dtype is not None:
        v = v.astype(dtype)
    return v
