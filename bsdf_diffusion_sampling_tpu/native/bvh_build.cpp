// Native BVH builder: top-down median split, C ABI for ctypes.
//
// The Python/numpy recursive builder in render/bvh.py takes minutes on the
// 61k-triangle matpreview scene (one numpy dispatch per node); this C++
// version builds the same tree layout in milliseconds using
// std::nth_element for the median split. It fills the flattened arrays the
// device traversal expects:
//   - DFS preorder node order; an inner node's left child is node+1
//   - inner nodes store the RIGHT child index in `left[]`, count[] == 0
//   - leaves store the first reordered-primitive index in `left[]`,
//     count[] == primitive count (<= max_leaf)
//   - prims[] is the primitive permutation (leaf ranges contiguous)
//
// Build: g++ -O2 -shared -fPIC bvh_build.cpp -o libbvh_build.so

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct Builder {
    const float *lo, *hi;   // (n, 3) per-prim bounds
    std::vector<float> cen; // (n, 3) centroids
    int max_leaf;
    // outputs
    float *bb_min, *bb_max;
    int32_t *left, *count;
    int64_t *prims;
    int n_nodes = 0;
    int64_t cursor = 0;

    int new_node() { return n_nodes++; }

    int build(int64_t *idx, int64_t n) {
        int node = new_node();
        float mn[3] = {1e30f, 1e30f, 1e30f};
        float mx[3] = {-1e30f, -1e30f, -1e30f};
        for (int64_t i = 0; i < n; ++i) {
            const float *l = lo + 3 * idx[i];
            const float *h = hi + 3 * idx[i];
            for (int a = 0; a < 3; ++a) {
                mn[a] = std::min(mn[a], l[a]);
                mx[a] = std::max(mx[a], h[a]);
            }
        }
        for (int a = 0; a < 3; ++a) {
            bb_min[3 * node + a] = mn[a];
            bb_max[3 * node + a] = mx[a];
        }
        if (n <= max_leaf) {
            left[node] = (int32_t)cursor;
            count[node] = (int32_t)n;
            for (int64_t i = 0; i < n; ++i) prims[cursor++] = idx[i];
            return node;
        }
        // longest centroid axis
        float cmn[3] = {1e30f, 1e30f, 1e30f};
        float cmx[3] = {-1e30f, -1e30f, -1e30f};
        for (int64_t i = 0; i < n; ++i) {
            const float *c = cen.data() + 3 * idx[i];
            for (int a = 0; a < 3; ++a) {
                cmn[a] = std::min(cmn[a], c[a]);
                cmx[a] = std::max(cmx[a], c[a]);
            }
        }
        int axis = 0;
        float ext = cmx[0] - cmn[0];
        for (int a = 1; a < 3; ++a) {
            if (cmx[a] - cmn[a] > ext) {
                ext = cmx[a] - cmn[a];
                axis = a;
            }
        }
        int64_t half = n / 2;
        const float *c = cen.data();
        std::nth_element(idx, idx + half, idx + n,
                         [c, axis](int64_t a, int64_t b) {
                             return c[3 * a + axis] < c[3 * b + axis];
                         });
        build(idx, half);  // left child == node + 1
        int r = build(idx + half, n - half);
        left[node] = (int32_t)r;
        count[node] = 0;
        return node;
    }
};

}  // namespace

extern "C" {

// Returns the node count; caller provides arrays sized for 2*n nodes.
int bvh_build(const float *lo, const float *hi, int64_t n, int max_leaf,
              float *bb_min, float *bb_max, int32_t *left, int32_t *count,
              int64_t *prims) {
    Builder b;
    b.lo = lo;
    b.hi = hi;
    b.max_leaf = max_leaf;
    b.cen.resize(3 * n);
    for (int64_t i = 0; i < 3 * n; ++i) b.cen[i] = 0.5f * (lo[i] + hi[i]);
    b.bb_min = bb_min;
    b.bb_max = bb_max;
    b.left = left;
    b.count = count;
    b.prims = prims;
    std::vector<int64_t> idx(n);
    for (int64_t i = 0; i < n; ++i) idx[i] = i;
    b.build(idx.data(), n);
    return b.n_nodes;
}

}  // extern "C"
