// Native mesh-preprocessing kernels (C++), loaded via ctypes.
//
// The reference delegates this layer to PT-Scotch/ParMETIS + the DOLFINx
// C++ core (SURVEY.md 2.2: partitioning, dofmap/sparsity construction).
// Here the two hottest host-side setup passes are native:
//
//   * block-CSR sparsity construction from element connectivity
//     (assemble/assembly.py build_pattern): sort + unique over
//     n_cells * nbl^2 int64 keys — numpy's np.unique is the setup
//     bottleneck at ~10^6 cells;
//   * boundary-facet extraction (facets appearing exactly once).
//
// Build:  cd csrc && make     (produces libmeshops.so)
// Python falls back to the numpy path when the library is absent.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Sort+unique of keys = rows * n_blocks + cols from element block
// connectivity; emits CSR (indptr, indices), the element->nnz scatter
// positions, and diagonal positions.
//
// cell_blocks: nc * nbl int32 (block ids per cell)
// outputs are caller-allocated:
//   ell_pos:  nc * nbl * nbl int32
//   (indices, row_ids): up to nc*nbl*nbl int32 (true nnz returned)
//   indptr:   n_blocks + 1 int32
//   diag_pos: n_blocks int32 (-1 if missing)
// returns nnz
int64_t build_pattern(
    const int32_t* cell_blocks, int64_t nc, int32_t nbl, int64_t n_blocks,
    int32_t* ell_pos, int32_t* indices, int32_t* row_ids,
    int32_t* indptr, int32_t* diag_pos)
{
    const int64_t total = nc * nbl * nbl;
    std::vector<int64_t> keys(total);
    for (int64_t c = 0; c < nc; ++c) {
        const int32_t* blk = cell_blocks + c * nbl;
        int64_t base = c * nbl * nbl;
        for (int32_t a = 0; a < nbl; ++a)
            for (int32_t b = 0; b < nbl; ++b)
                keys[base + a * nbl + b] =
                    (int64_t)blk[a] * n_blocks + blk[b];
    }
    std::vector<int64_t> sorted(keys);
    std::sort(sorted.begin(), sorted.end());
    sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
    const int64_t nnz = (int64_t)sorted.size();

    // CSR
    std::memset(indptr, 0, sizeof(int32_t) * (n_blocks + 1));
    for (int64_t i = 0; i < nnz; ++i) {
        int64_t r = sorted[i] / n_blocks;
        int64_t cc = sorted[i] % n_blocks;
        indices[i] = (int32_t)cc;
        row_ids[i] = (int32_t)r;
        indptr[r + 1] += 1;
    }
    for (int64_t r = 0; r < n_blocks; ++r) indptr[r + 1] += indptr[r];

    // scatter positions by binary search
    for (int64_t i = 0; i < total; ++i) {
        auto it = std::lower_bound(sorted.begin(), sorted.end(), keys[i]);
        ell_pos[i] = (int32_t)(it - sorted.begin());
    }
    for (int64_t r = 0; r < n_blocks; ++r) {
        int64_t key = r * n_blocks + r;
        auto it = std::lower_bound(sorted.begin(), sorted.end(), key);
        diag_pos[r] = (it != sorted.end() && *it == key)
                          ? (int32_t)(it - sorted.begin()) : -1;
    }
    return nnz;
}

// Fused layered-pattern builder (assemble/layered.py::build_layered).
//
// For an extruded mesh with plane-major node ids (node = l * n2d + i),
// builds the directed 2D pair list (sorted row-major), the diagonal pair
// positions, and the FINAL per-cell scatter ids
//     ell_pos[c, a, b] = ((delta + 1) * E + pair(i_a, i_b)) * Lp + l_a
// in two linear passes.  Replaces a chain of numpy repeat/tile/unique/
// searchsorted over nc*nbl^2 int64 temporaries (~20 s of the 39.5 s
// setup at 1.45M cells on the single-core bench host).  The dense pair
// map is n2d^2 int32, but only the ~E distinct pairs' cache lines are
// ever touched, so lookups stay L2-hot.
//
// cells: nc * nbl int32 (global plane-major node ids)
// outputs (caller-allocated):
//   ell_pos:  nc * nbl * nbl int32
//   cols2d, rows2d: capacity >= min(nc*nbl*nbl, n2d*n2d) int32
//   diag_pos: n2d int32
// returns E (directed 2D pairs), or -1 if not a 1-layer extrusion
// (|delta| > 1) or a diagonal pair is missing.
int64_t build_layered_pattern(
    const int32_t* cells, int64_t nc, int32_t nbl,
    int64_t n2d, int32_t Lp,
    int32_t* ell_pos, int32_t* cols2d, int32_t* rows2d,
    int32_t* diag_pos)
{
    std::vector<int32_t> map(n2d * n2d, -1);
    std::vector<int32_t> iv(nbl), lv(nbl);
    // pass 1: mark present pairs
    for (int64_t c = 0; c < nc; ++c) {
        const int32_t* cell = cells + c * nbl;
        for (int32_t a = 0; a < nbl; ++a) {
            iv[a] = (int32_t)(cell[a] % n2d);
            lv[a] = (int32_t)(cell[a] / n2d);
        }
        for (int32_t a = 0; a < nbl; ++a) {
            const int64_t base = (int64_t)iv[a] * n2d;
            for (int32_t b = 0; b < nbl; ++b) {
                int32_t d = lv[b] - lv[a];
                if (d < -1 || d > 1) return -1;
                map[base + iv[b]] = 1;
            }
        }
    }
    // assign ids in sorted (row-major) key order: row_ids come out
    // sorted, as layered_matvec's indices_are_sorted segment-sum needs
    int64_t E = 0;
    for (int64_t key = 0; key < n2d * n2d; ++key) {
        if (map[key] >= 0) {
            map[key] = (int32_t)E;
            rows2d[E] = (int32_t)(key / n2d);
            cols2d[E] = (int32_t)(key % n2d);
            ++E;
        }
    }
    for (int64_t r = 0; r < n2d; ++r) {
        int32_t id = map[r * n2d + r];
        if (id < 0) return -1;
        diag_pos[r] = id;
    }
    // pass 2: final scatter ids
    for (int64_t c = 0; c < nc; ++c) {
        const int32_t* cell = cells + c * nbl;
        int32_t* out = ell_pos + c * nbl * nbl;
        for (int32_t a = 0; a < nbl; ++a) {
            iv[a] = (int32_t)(cell[a] % n2d);
            lv[a] = (int32_t)(cell[a] / n2d);
        }
        for (int32_t a = 0; a < nbl; ++a) {
            const int64_t base = (int64_t)iv[a] * n2d;
            for (int32_t b = 0; b < nbl; ++b) {
                int32_t d = lv[b] - lv[a];
                out[a * nbl + b] = (int32_t)(
                    (((int64_t)(d + 1) * E + map[base + iv[b]]) * Lp
                     + lv[a]));
            }
        }
    }
    return E;
}

// Fused prism split + orientation (mesh/extrude.py::split_prisms +
// SimplexMesh.orient_positive): Dompierre minimum-vertex rotation, quad
// diagonal choice, and positive-Jacobian vertex swap in ONE linear pass
// (the numpy version makes ~40 array passes; ~4.5 s of the lc=0.024
// setup on the single-core bench host).
//
// points: npts * 3 float64; prisms: n * 6 int32 (bottom 0,1,2; top 3,4,5)
// tets_out: caller-allocated 3n * 4 int32
void split_prisms_oriented(
    const double* points, const int32_t* prisms, int64_t n,
    int32_t* tets_out)
{
    // rotations bringing vertex j to slot 0 preserving orientation
    static const int32_t ROT[6][6] = {
        {0, 1, 2, 3, 4, 5}, {1, 2, 0, 4, 5, 3}, {2, 0, 1, 5, 3, 4},
        {3, 5, 4, 0, 2, 1}, {4, 3, 5, 1, 0, 2}, {5, 4, 3, 2, 1, 0}};
    // tet pattern A: diagonal V1-V5; B: diagonal V2-V4
    static const int32_t TA[3][4] = {{0, 1, 2, 5}, {0, 1, 5, 4},
                                     {0, 4, 5, 3}};
    static const int32_t TB[3][4] = {{0, 1, 2, 4}, {0, 4, 2, 5},
                                     {0, 4, 5, 3}};
    for (int64_t c = 0; c < n; ++c) {
        const int32_t* pr = prisms + c * 6;
        int32_t imin = 0;
        for (int32_t j = 1; j < 6; ++j)
            if (pr[j] < pr[imin]) imin = j;
        int32_t V[6];
        for (int32_t j = 0; j < 6; ++j) V[j] = pr[ROT[imin][j]];
        const bool useA = std::min(V[1], V[5]) < std::min(V[2], V[4]);
        const int32_t(*pat)[4] = useA ? TA : TB;
        for (int32_t t = 0; t < 3; ++t) {
            int32_t* out = tets_out + (c * 3 + t) * 4;
            for (int32_t j = 0; j < 4; ++j) out[j] = V[pat[t][j]];
            const double* p0 = points + (int64_t)out[0] * 3;
            const double* p1 = points + (int64_t)out[1] * 3;
            const double* p2 = points + (int64_t)out[2] * 3;
            const double* p3 = points + (int64_t)out[3] * 3;
            double a[3], b[3], d[3];
            for (int32_t k = 0; k < 3; ++k) {
                a[k] = p1[k] - p0[k];
                b[k] = p2[k] - p0[k];
                d[k] = p3[k] - p0[k];
            }
            const double det =
                a[0] * (b[1] * d[2] - b[2] * d[1])
                - a[1] * (b[0] * d[2] - b[2] * d[0])
                + a[2] * (b[0] * d[1] - b[1] * d[0]);
            if (det < 0.0) std::swap(out[2], out[3]);
        }
    }
}

// Boundary facets of a simplex mesh: facets referenced exactly once.
// cells: nc * nv int32; facet_verts_out: caller-allocated
// nc * nv * (nv-1) int32 (worst case); returns number of boundary facets.
int64_t boundary_facets(
    const int32_t* cells, int64_t nc, int32_t nv,
    int32_t* facet_verts_out)
{
    const int32_t fv = nv - 1;     // vertices per facet
    const int32_t nf = nv;         // facets per cell (opposite each vertex)
    const int64_t total = nc * nf;
    struct Key {
        int32_t v[3];
        bool operator<(const Key& o) const {
            if (v[0] != o.v[0]) return v[0] < o.v[0];
            if (v[1] != o.v[1]) return v[1] < o.v[1];
            return v[2] < o.v[2];
        }
        bool operator==(const Key& o) const {
            return v[0] == o.v[0] && v[1] == o.v[1] && v[2] == o.v[2];
        }
    };
    std::vector<Key> keys(total);
    for (int64_t c = 0; c < nc; ++c) {
        const int32_t* cell = cells + c * nv;
        for (int32_t f = 0; f < nf; ++f) {
            Key k;
            int32_t n = 0;
            for (int32_t a = 0; a < nv; ++a)
                if (a != f) k.v[n++] = cell[a];
            for (; n < 3; ++n) k.v[n] = -1;
            std::sort(k.v, k.v + fv);
            if (fv < 3) { k.v[2] = -1; if (fv < 2) k.v[1] = -1; }
            keys[c * nf + f] = k;
        }
    }
    std::vector<Key> sorted(keys);
    std::sort(sorted.begin(), sorted.end());
    int64_t out = 0;
    for (int64_t i = 0; i < (int64_t)sorted.size();) {
        int64_t j = i + 1;
        while (j < (int64_t)sorted.size() && sorted[j] == sorted[i]) ++j;
        if (j - i == 1) {
            for (int32_t a = 0; a < fv; ++a)
                facet_verts_out[out * fv + a] = sorted[i].v[a];
            ++out;
        }
        i = j;
    }
    return out;
}

}  // extern "C"
