// Native mesh-topology kernels.
//
// The reference gets its mesh data structures from dolfinx's C++ core;
// here the hot preprocessing steps (boundary-facet extraction, global
// edge numbering for P2+ dofmaps) are hash-map based C++ replacing the
// O(n log n) numpy sort/unique path — the setup-time analogue of the
// reference's native mesh layer. Exposed with a plain C ABI and loaded
// via ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC fastmesh.cpp -o libfastmesh.so

#include <cstdint>
#include <unordered_map>
#include <vector>
#include <algorithm>
#include <cstring>

namespace {

struct VecHash {
    size_t operator()(const std::vector<int32_t>& v) const {
        size_t h = 1469598103934665603ull;
        for (int32_t x : v) {
            h ^= static_cast<size_t>(x) + 0x9e3779b97f4a7c15ull;
            h *= 1099511628211ull;
        }
        return h;
    }
};

}  // namespace

extern "C" {

// Extract boundary facets (facets referenced by exactly one cell).
//
// cells:        nc x nv cell->vertex connectivity
// local_facets: nlf x nfv local facet vertex indices
// out_facets:   capacity nc*nlf*nfv, receives facet vertices (cell order,
//               not sorted) for each boundary facet
// out_cells/out_lf: adjacent cell id and local facet index
// returns number of boundary facets
int64_t boundary_facets(const int32_t* cells, int64_t nc, int32_t nv,
                        const int32_t* local_facets, int32_t nlf,
                        int32_t nfv, int32_t* out_facets,
                        int32_t* out_cells, int32_t* out_lf) {
    // key -> (count, first row id)
    std::unordered_map<std::vector<int32_t>, std::pair<int32_t, int64_t>,
                       VecHash> seen;
    seen.reserve(static_cast<size_t>(nc) * nlf);

    std::vector<int32_t> key(nfv);
    for (int64_t c = 0; c < nc; ++c) {
        const int32_t* cv = cells + c * nv;
        for (int32_t lf = 0; lf < nlf; ++lf) {
            const int32_t* fv = local_facets + lf * nfv;
            for (int32_t k = 0; k < nfv; ++k) key[k] = cv[fv[k]];
            std::sort(key.begin(), key.end());
            auto it = seen.find(key);
            if (it == seen.end()) {
                seen.emplace(key, std::make_pair(1, c * nlf + lf));
            } else {
                it->second.first += 1;
            }
        }
    }

    int64_t n_out = 0;
    for (const auto& kv : seen) {
        if (kv.second.first != 1) continue;
        int64_t row = kv.second.second;
        int64_t c = row / nlf;
        int32_t lf = static_cast<int32_t>(row % nlf);
        const int32_t* cv = cells + c * nv;
        const int32_t* fv = local_facets + lf * nfv;
        for (int32_t k = 0; k < nfv; ++k)
            out_facets[n_out * nfv + k] = cv[fv[k]];
        out_cells[n_out] = static_cast<int32_t>(c);
        out_lf[n_out] = lf;
        ++n_out;
    }
    return n_out;
}

// Global edge numbering: assigns a unique id to each undirected edge.
//
// cells:       nc x nv connectivity
// local_edges: nle x 2 local edge vertex pairs
// out_ids:     nc x nle receives the global edge id per (cell, local edge)
// returns the number of unique edges
int64_t edge_numbering(const int32_t* cells, int64_t nc, int32_t nv,
                       const int32_t* local_edges, int32_t nle,
                       int32_t* out_ids) {
    std::unordered_map<uint64_t, int32_t> ids;
    ids.reserve(static_cast<size_t>(nc) * nle);
    int32_t next = 0;
    for (int64_t c = 0; c < nc; ++c) {
        const int32_t* cv = cells + c * nv;
        for (int32_t le = 0; le < nle; ++le) {
            int32_t a = cv[local_edges[le * 2]];
            int32_t b = cv[local_edges[le * 2 + 1]];
            if (a > b) std::swap(a, b);
            uint64_t key = (static_cast<uint64_t>(a) << 32) |
                           static_cast<uint32_t>(b);
            auto it = ids.find(key);
            int32_t id;
            if (it == ids.end()) {
                id = next++;
                ids.emplace(key, id);
            } else {
                id = it->second;
            }
            out_ids[c * nle + le] = id;
        }
    }
    return next;
}

}  // extern "C"
