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
#include <vector>

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
        double dx[3] = {0.0, 0.0, 0.0};
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
        for (int k = 0; k < dim; ++k) {
            dof_map[e * 2 * dim + k] = dim * i + k;
            dof_map[e * 2 * dim + dim + k] = dim * j + k;
        }
    }
    return 0;
}


// Reverse Cuthill-McKee node ordering: BFS from a minimum-degree seed per
// connected component, visiting neighbors in ascending-degree order, then
// reversed.  Minimizes the stiffness bandwidth so arbitrarily-numbered
// meshes qualify for the banded DIA fast path (ops/dia.py).
//
// elements: nelm x 2 node pairs.  order_out: nnode int32, order_out[new] =
// old node id.  scratch must hold (2*nnode + 2 + 4*nelm) int64.
// Returns 0 on success, 1 on an out-of-range node id.
int rcm_order(const int64_t* elements, int64_t nelm, int64_t nnode,
              int32_t* order_out, int64_t* scratch) {
    // scratch layout:
    //   degree : [0, nnode)
    //   offset : [nnode, 2*nnode + 1)
    //   adj    : [2*nnode + 2, 2*nnode + 2 + 2*nelm)   (each edge twice)
    int64_t* degree = scratch;
    int64_t* offset = scratch + nnode;
    int64_t* adj = scratch + 2 * nnode + 2;

    std::memset(degree, 0, sizeof(int64_t) * nnode);
    for (int64_t e = 0; e < nelm; ++e) {
        const int64_t a = elements[2 * e], b = elements[2 * e + 1];
        if (a < 0 || a >= nnode || b < 0 || b >= nnode) return 1;
        ++degree[a];
        ++degree[b];
    }
    offset[0] = 0;
    for (int64_t n = 0; n < nnode; ++n) offset[n + 1] = offset[n] + degree[n];
    // Fill adjacency (cursor = offset copy living in degree's slot).
    for (int64_t n = 0; n < nnode; ++n) degree[n] = offset[n];
    for (int64_t e = 0; e < nelm; ++e) {
        const int64_t a = elements[2 * e], b = elements[2 * e + 1];
        adj[degree[a]++] = b;
        adj[degree[b]++] = a;
    }
    // Restore degrees.
    for (int64_t n = 0; n < nnode; ++n) degree[n] = offset[n + 1] - offset[n];

    // Sort each adjacency list by (degree, id) once — BFS then emits
    // neighbors in Cuthill-McKee order with no per-visit sorting.
    for (int64_t n = 0; n < nnode; ++n) {
        int64_t* first = adj + offset[n];
        const int64_t len = offset[n + 1] - offset[n];
        for (int64_t i = 1; i < len; ++i) {  // insertion sort (lists are tiny)
            const int64_t v = first[i];
            int64_t j = i - 1;
            while (j >= 0 && (degree[first[j]] > degree[v] ||
                              (degree[first[j]] == degree[v] && first[j] > v))) {
                first[j + 1] = first[j];
                --j;
            }
            first[j + 1] = v;
        }
    }

    // BFS over components (order_out doubles as the queue).
    std::vector<uint8_t> visited(static_cast<size_t>(nnode), 0);
    int64_t head = 0, tail = 0;
    for (int64_t seed_scan = 0; seed_scan < nnode; ++seed_scan) {
        if (tail == nnode) break;
        // Min-degree unvisited seed.
        int64_t seed = -1;
        for (int64_t n = 0; n < nnode; ++n) {
            if (!visited[n] && (seed < 0 || degree[n] < degree[seed])) seed = n;
        }
        if (seed < 0) break;
        visited[seed] = 1;
        order_out[tail++] = static_cast<int32_t>(seed);
        while (head < tail) {
            const int64_t n = order_out[head++];
            for (int64_t i = offset[n]; i < offset[n + 1]; ++i) {
                const int64_t m = adj[i];
                if (!visited[m]) {
                    visited[m] = 1;
                    order_out[tail++] = static_cast<int32_t>(m);
                }
            }
        }
    }
    // Reverse (the "R" in RCM).
    for (int64_t i = 0, j = nnode - 1; i < j; ++i, --j) {
        const int32_t t = order_out[i];
        order_out[i] = order_out[j];
        order_out[j] = t;
    }
    return 0;
}

}  // extern "C"
