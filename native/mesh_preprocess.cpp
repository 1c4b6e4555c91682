// Native mesh preprocessing for pinn_fem_tpu.
//
// The host-side problem setup (structure-of-arrays geometry + the
// transposed DOF incidence used by the gather-based segment sum) is pure
// pointer-chasing work that numpy does in O(n log n) with temporary
// allocations; these C++ routines do it in O(n) single passes so setup
// stays negligible at 10M+ elements.  Exposed over a C ABI and loaded via
// ctypes (pinn_fem_tpu/utils/native.py), with the numpy implementation as
// the always-available fallback.
//
// Build: make -C native    (produces libmeshprep.so)

#include <cstdint>
#include <cmath>
#include <cstring>

extern "C" {

// Maximum number of element slots accumulating into any single DOF.
int64_t max_valence(const int64_t* dof_flat, int64_t n_slots, int64_t ndof,
                    int64_t* counts_scratch /* ndof, zeroed by callee */) {
    std::memset(counts_scratch, 0, sizeof(int64_t) * ndof);
    for (int64_t i = 0; i < n_slots; ++i) {
        ++counts_scratch[dof_flat[i]];
    }
    int64_t v = 0;
    for (int64_t d = 0; d < ndof; ++d) {
        if (counts_scratch[d] > v) v = counts_scratch[d];
    }
    return v;
}

// Transposed incidence: for each DOF, the flat slot indices (element-major)
// that accumulate into it, padded with n_slots (callers append a zero slot).
// counts_scratch must hold ndof int64 (will be clobbered).
// out has shape (ndof, valence), int32, C-order.
void build_gather_map(const int64_t* dof_flat, int64_t n_slots, int64_t ndof,
                      int64_t valence, int32_t* out,
                      int64_t* counts_scratch) {
    for (int64_t i = 0; i < ndof * valence; ++i) {
        out[i] = static_cast<int32_t>(n_slots);
    }
    std::memset(counts_scratch, 0, sizeof(int64_t) * ndof);
    // Single stable pass: slots appear in element order per DOF, matching
    // numpy's stable argsort layout in ops/scatter.build_gather_map.
    for (int64_t i = 0; i < n_slots; ++i) {
        const int64_t d = dof_flat[i];
        out[d * valence + counts_scratch[d]] = static_cast<int32_t>(i);
        ++counts_scratch[d];
    }
}

// SoA element geometry: signed direction vectors, reciprocal lengths,
// midpoints, and DOF maps, all in one pass.
//   coords: (nnode, dim) float64
//   elements: (nelm, 2) int64
//   gvec: (nelm, 2*dim), inv_len: (nelm,), mid: (nelm, dim) float64
//   dof_map: (nelm, 2*dim) int64
// Returns 0 on success, -1 if a zero-length element is found (its index is
// written to *bad_element).
int compute_geometry(const double* coords, const int64_t* elements,
                     int64_t nelm, int dim,
                     double* gvec, double* inv_len, double* mid,
                     int64_t* dof_map, int64_t* bad_element) {
    for (int64_t e = 0; e < nelm; ++e) {
        const int64_t i = elements[2 * e];
        const int64_t j = elements[2 * e + 1];
        double len_sq = 0.0;
        double dx[2] = {0.0, 0.0};
        for (int k = 0; k < dim; ++k) {
            dx[k] = coords[j * dim + k] - coords[i * dim + k];
            len_sq += dx[k] * dx[k];
            mid[e * dim + k] = 0.5 * (coords[i * dim + k] + coords[j * dim + k]);
        }
        if (len_sq <= 0.0) {
            *bad_element = e;
            return -1;
        }
        const double len = std::sqrt(len_sq);
        inv_len[e] = 1.0 / len;
        for (int k = 0; k < dim; ++k) {
            const double c = dx[k] / len;
            gvec[e * 2 * dim + k] = -c;
            gvec[e * 2 * dim + dim + k] = c;
        }
        if (dim == 1) {
            dof_map[2 * e] = i;
            dof_map[2 * e + 1] = j;
        } else {
            dof_map[4 * e] = 2 * i;
            dof_map[4 * e + 1] = 2 * i + 1;
            dof_map[4 * e + 2] = 2 * j;
            dof_map[4 * e + 3] = 2 * j + 1;
        }
    }
    return 0;
}

}  // extern "C"
