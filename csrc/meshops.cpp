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
