"""Structured-extrusion Jacobian assembly: the scatter-free hot path.

The profiled bottleneck of the 1M-dof Newton step is the Jacobian
scatter (~3.7 s of a 9.2 s step on v5e: 16 colliding segment-sum
scatter-adds running at ~9 ns/element).  Generic gather-plan
replacements lose too — TPU random gathers at 4-64 B granule are no
faster than the scatter (measured, benchmarks/_gather_asm_bench.py).

What IS fast on TPU is gathering long contiguous rows — the insight the
layered SpMV already exploits (assemble/layered.py).  The extruded
channel gives the assembly the same structure: cells form an
(layer l, column c) grid where a column is a (triangle, tet-of-prism)
pair of the 2D cross-section, and the (matrix-pair, plane-offset)
scatter pattern of a column is LAYER-INVARIANT (the Dompierre split
depends only on relative node order, which the plane-major numbering
preserves).  So per 2D pair p, the assembled values across ALL planes
are a fixed small set of per-column contribution streams:

    V[ci, cj, p, l] = sum_t  J[col_t, l - off_t, a_t*bs+ci, b_t*bs+cj]

Laying the element Jacobians out as (column*entry, layer) — layer
minor — turns the reduction into row gathers of nl*4 B (~1 KB at
production meshes) plus plane-shifted adds: no scatter at all.

The plan is DERIVED FROM ``ell_pos`` AND VERIFIED cell-by-cell at build
time (layer-invariance is checked, not assumed); any mismatch returns
None and the caller keeps the scatter path.

Replaces the reference's FFCx insertion loop
(/root/reference/NavierStokes/NavierStokesChannelFlow.py:69-75) on the
flagship extruded-channel path.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import ASM_CHUNK, _cell_jacobians


class StructuredAsm(NamedTuple):
    """Device arrays of the structured plan (a pytree; rides inside
    ``LayeredArrays.sasm``)."""

    cell_dofs: jnp.ndarray     # (M3p*nl, ndl) column-major (col, l) cells
    cell_coords: jnp.ndarray   # (M3p*nl, nv, 3)
    alive: jnp.ndarray         # (M3p*nl,) f32 1=real cell, 0=dead
    tab: jnp.ndarray           # (3Ep, degA) row-base ids into the buffer
    off: jnp.ndarray           # (3Ep, degA) f32 plane offset (0/1)
    tab_over: jnp.ndarray      # (n_over, degB) row-base ids
    off_over: jnp.ndarray      # (n_over, degB) f32
    over_ids: jnp.ndarray      # (n_over,) pair ids


def build_structured_plan(mesh, cd_np, cc_np, ep_np, n2d: int, Lp: int,
                          E: int, bs: int,
                          max_degA: int = 8,
                          cover: float = 0.99) -> Optional[StructuredAsm]:
    """Host-side plan build from the (numpy) padded cell arrays; returns
    None when the mesh does not carry the extrusion grid or the pattern
    fails layer-invariance."""
    ext = getattr(mesh, "extrusion", None)
    if ext is None:
        return None
    ntri, nl, keep = ext            # keep: (nl, ntri) bool
    if nl != Lp - 1:
        return None
    nbl = ep_np.shape[1]
    ndl = cd_np.shape[1]
    nc = mesh.n_cells
    cells = np.asarray(mesh.cells[:nc])
    ep = np.asarray(ep_np)[:nc]                   # (nc, nbl, nbl)
    cd = np.asarray(cd_np)[:nc]
    cc = np.asarray(cc_np)[:nc]
    M3 = 3 * ntri

    # ---- cell grid from the deterministic extrusion order -------------
    k_l = keep.sum(axis=1) * 3
    if int(k_l.sum()) != nc:
        return None
    offs = np.concatenate([[0], np.cumsum(k_l)])
    grid = np.full((nl, M3), -1, np.int64)
    for l in range(nl):
        kept = np.nonzero(keep[l])[0]
        cols = (3 * kept[:, None] + np.arange(3)[None, :]).ravel()
        grid[l, cols] = offs[l] + np.arange(len(cols))

    # ---- derive (pair, off) per cell and verify layer-invariance ------
    lb = (cells.min(axis=1) // n2d).astype(np.int64)       # base plane
    pair = ep // Lp                                        # (nc, nbl, nbl)
    off = ep % Lp - lb[:, None, None]
    if off.min() < 0 or off.max() > 1:
        return None
    alive = grid >= 0
    gi = np.where(alive, grid, 0)
    # reference = first alive layer of each column
    first_l = np.argmax(alive, axis=0)                     # (M3,)
    ref_cell = gi[first_l, np.arange(M3)]
    pref, oref = pair[ref_cell], off[ref_cell]             # (M3, nbl, nbl)
    ok = ((pair[gi] == pref[None]) & (off[gi] == oref[None])) \
        | ~alive[:, :, None, None]
    if not bool(ok.all()):
        return None
    if not bool((lb[gi] == np.arange(nl)[:, None])[alive].all()):
        return None

    # ---- invert: pair p -> padded contribution tables -----------------
    # contribution q = col*nbl*nbl + a*nbl + b; buffer row base =
    # col*ndl*ndl + a*bs*ndl + b*bs (16 (ci, cj) rows at +ci*ndl+cj)
    n_pairs = 3 * E
    q = np.arange(M3 * nbl * nbl, dtype=np.int64)
    colq, aq, bq = q // (nbl * nbl), (q // nbl) % nbl, q % nbl
    rowbase = colq * ndl * ndl + aq * bs * ndl + bq * bs
    p_flat = pref.reshape(-1).astype(np.int64)
    o_flat = oref.reshape(-1)
    order = np.argsort(p_flat, kind="stable")
    counts = np.bincount(p_flat, minlength=n_pairs)
    starts = np.zeros(n_pairs + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    degA = int(min(max(np.quantile(counts, cover), 1), max_degA))
    trash_row = M3 * ndl * ndl                  # the appended zero block
    j = np.arange(degA, dtype=np.int64)
    idxA = starts[:n_pairs, None] + j[None, :]
    valid = j[None, :] < counts[:, None]
    src = order[np.minimum(idxA, M3 * nbl * nbl - 1)]
    tab = np.where(valid, rowbase[src], trash_row).astype(np.int32)
    offA = np.where(valid, o_flat[src], 0).astype(np.float32)
    over_ids = np.nonzero(counts > degA)[0]
    if len(over_ids):
        degB = int(counts[over_ids].max()) - degA
        jB = degA + np.arange(degB, dtype=np.int64)
        idxB = starts[over_ids, None] + jB[None, :]
        validB = jB[None, :] < counts[over_ids, None]
        srcB = order[np.minimum(idxB, M3 * nbl * nbl - 1)]
        tab_over = np.where(validB, rowbase[srcB], trash_row) \
            .astype(np.int32)
        off_over = np.where(validB, o_flat[srcB], 0).astype(np.float32)
    else:
        tab_over = np.full((0, 1), trash_row, np.int32)
        off_over = np.zeros((0, 1), np.float32)

    # ---- pad: columns to a chunk multiple, pairs to a multiple of 8 ---
    m = max(1, ASM_CHUNK // nl)
    M3p = -(-M3 // m) * m
    P = 8
    n_pp = -(-n_pairs // P) * P
    if n_pp > n_pairs:
        padt = np.full((n_pp - n_pairs, tab.shape[1]), trash_row, np.int32)
        tab = np.concatenate([tab, padt])
        offA = np.concatenate(
            [offA, np.zeros((n_pp - n_pairs, offA.shape[1]), np.float32)])

    # ---- column-major structured cell arrays --------------------------
    ndofs = n2d * Lp * bs
    giT = grid.T                                   # (M3, nl)
    aliveT = alive.T
    gsafe = np.where(aliveT, giT, 0)
    scd = np.empty((M3p, nl, ndl), np.int32)
    scd[:M3] = cd[gsafe]
    scd[:M3][~aliveT] = ndofs                      # dead cells: safe dof
    scd[M3:] = ndofs
    np_dtype = cc.dtype
    scc = np.empty((M3p, nl) + cc.shape[1:], np_dtype)
    scc[:M3] = cc[gsafe]
    scc[M3:] = cc[0]
    smask = np.zeros((M3p, nl), np.float32)
    smask[:M3] = aliveT

    return StructuredAsm(
        cell_dofs=jnp.asarray(scd.reshape(M3p * nl, ndl)),
        cell_coords=jnp.asarray(scc.reshape((M3p * nl,) + cc.shape[1:])),
        alive=jnp.asarray(smask.reshape(M3p * nl)),
        tab=jnp.asarray(tab),
        off=jnp.asarray(offA),
        tab_over=jnp.asarray(tab_over),
        off_over=jnp.asarray(off_over),
        over_ids=jnp.asarray(over_ids.astype(np.int32)),
    )


def matrix_values_structured(kernel, E: int, Lp: int, bs: int,
                             sasm: StructuredAsm,
                             w: jnp.ndarray) -> jnp.ndarray:
    """(bs, bs, 3, E, Lp) Jacobian values via the structured plan."""
    nl = Lp - 1
    ndl = sasm.cell_dofs.shape[1]
    e2 = ndl * ndl
    ncs = sasm.cell_dofs.shape[0]
    M3p = ncs // nl
    m = max(1, ASM_CHUNK // nl)
    n_chunks = M3p // m

    def chunk_rows(cdi, cci, mki):
        # (m*nl, ndl, ndl) cell Jacobians -> (m*e2, nl) layer-minor rows
        J = _cell_jacobians(kernel, cci, cdi, w)
        J = J * mki[:, None, None]
        return J.reshape(m, nl, e2).transpose(0, 2, 1).reshape(m * e2, nl)

    if n_chunks == 1:
        buf = chunk_rows(sasm.cell_dofs, sasm.cell_coords, sasm.alive)
    else:
        cd = sasm.cell_dofs.reshape(n_chunks, m * nl, ndl)
        cc = sasm.cell_coords.reshape(
            (n_chunks, m * nl) + sasm.cell_coords.shape[1:])
        mk = sasm.alive.reshape(n_chunks, m * nl)
        offs = jnp.arange(n_chunks, dtype=jnp.int32) * (m * e2)

        def body(b, inp):
            cdi, cci, mki, o = inp
            return jax.lax.dynamic_update_slice(
                b, chunk_rows(cdi, cci, mki), (o, 0)), None

        buf, _ = jax.lax.scan(
            body, jnp.zeros((M3p * e2, nl), w.dtype), (cd, cc, mk, offs))

    bufz = jnp.concatenate([buf, jnp.zeros((e2, nl), w.dtype)])
    b2 = bs * bs
    ent = (jnp.arange(bs)[:, None] * ndl
           + jnp.arange(bs)[None, :]).reshape(-1)          # ci*ndl + cj

    def reduce_pairs(tab, off):
        # tab (np_, deg) row bases; returns (np_, b2, Lp)
        np_, deg = tab.shape
        idx = (tab[:, :, None] + ent[None, None, :])
        rows = bufz[idx.reshape(-1)].reshape(np_, deg, b2, nl)
        o = off[:, :, None, None]
        s0 = (rows * (1.0 - o)).sum(axis=1)                # plane l
        s1 = (rows * o).sum(axis=1)                        # plane l+1
        return (jnp.pad(s0, ((0, 0), (0, 0), (0, 1)))
                + jnp.pad(s1, ((0, 0), (0, 0), (1, 0))))

    n_pp = sasm.tab.shape[0]
    P = 8
    cE = n_pp // P
    Vp = []
    for k in range(P):
        Vp.append(reduce_pairs(sasm.tab[k * cE:(k + 1) * cE],
                               sasm.off[k * cE:(k + 1) * cE]))
    V = jnp.concatenate(Vp, axis=0)[:3 * E]                # (3E, b2, Lp)
    if sasm.tab_over.shape[0] > 0:
        V = V.at[sasm.over_ids].add(
            reduce_pairs(sasm.tab_over, sasm.off_over),
            unique_indices=True)
    return V.transpose(1, 0, 2).reshape(bs, bs, 3, E, Lp)
