// Multi-threaded Morton-ordered implicit-BVH builder — the native
// counterpart of scene/bvh.py (and the analog of the reference's parallel
// SAH kd-tree TreeBuilder pool, src/librender/gkdtree.h:1040-1063).
//
// Outputs exactly the arrays the device traversal consumes
// (ops/bvh_traverse.py): heap-ordered AABBs, miss links, triangle order.
// The Python builder stays as the portable fallback; this one wins on big
// meshes (std::sort + threaded AABB reduction).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cmath>
#include <functional>
#include <thread>
#include <vector>

namespace {

inline uint32_t spread3(uint32_t v) {
    v = (v | (v << 16)) & 0x030000FFu;
    v = (v | (v << 8)) & 0x0300F00Fu;
    v = (v | (v << 4)) & 0x030C30C3u;
    v = (v | (v << 2)) & 0x09249249u;
    return v;
}

void parallel_for(int64_t n, int nthreads,
                  const std::function<void(int64_t, int64_t)>& fn) {
    if (nthreads <= 1 || n < 4096) { fn(0, n); return; }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nthreads - 1) / nthreads;
    for (int i = 0; i < nthreads; ++i) {
        int64_t lo = i * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// vertices: (nv, 3) float32; indices: (nt, 3) int32; leaf_size: tris/leaf.
// Outputs (caller-allocated by the Python side after a sizing call, or
// malloc'd here): we malloc and hand over; bvh_free releases.
int build_lbvh(const float* vertices, int64_t nv,
               const int32_t* indices, int64_t nt,
               int32_t leaf_size,
               float** out_aabb_min, float** out_aabb_max,
               int32_t** out_miss, int32_t** out_order,
               int64_t* out_nodes, int64_t* out_cap) {
    (void)nv;
    int nthreads = (int)std::thread::hardware_concurrency();
    if (nthreads < 1) nthreads = 1;

    std::vector<float> tmin(nt * 3), tmax(nt * 3), cent(nt * 3);
    parallel_for(nt, nthreads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const int32_t* tri = indices + 3 * i;
            for (int k = 0; k < 3; ++k) {
                float a = vertices[3 * tri[0] + k];
                float b = vertices[3 * tri[1] + k];
                float c = vertices[3 * tri[2] + k];
                float mn = std::min(a, std::min(b, c));
                float mx = std::max(a, std::max(b, c));
                tmin[3 * i + k] = mn;
                tmax[3 * i + k] = mx;
                cent[3 * i + k] = 0.5f * (mn + mx);
            }
        }
    });

    float lo3[3] = {1e38f, 1e38f, 1e38f}, hi3[3] = {-1e38f, -1e38f, -1e38f};
    for (int64_t i = 0; i < nt; ++i)
        for (int k = 0; k < 3; ++k) {
            lo3[k] = std::min(lo3[k], cent[3 * i + k]);
            hi3[k] = std::max(hi3[k], cent[3 * i + k]);
        }
    float ext[3];
    for (int k = 0; k < 3; ++k)
        ext[k] = std::max(hi3[k] - lo3[k], 1e-9f);

    std::vector<std::pair<uint32_t, int32_t>> keyed(nt);
    parallel_for(nt, nthreads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            uint32_t m = 0;
            uint32_t q[3];
            for (int k = 0; k < 3; ++k) {
                float r = (cent[3 * i + k] - lo3[k]) / ext[k];
                int32_t qi = (int32_t)(r * 1024.0f);
                q[k] = (uint32_t)std::min(std::max(qi, 0), 1023);
            }
            m = (spread3(q[0]) << 2) | (spread3(q[1]) << 1) | spread3(q[2]);
            keyed[i] = {m, (int32_t)i};
        }
    });
    std::sort(keyed.begin(), keyed.end());

    // leaf count: next power of two of ceil(nt / leaf_size)
    int64_t leaves = 1;
    while (leaves * leaf_size < nt) leaves <<= 1;
    int64_t cap = leaves * leaf_size;
    int64_t nodes = 2 * leaves - 1;

    int32_t* order = (int32_t*)std::malloc(cap * sizeof(int32_t));
    for (int64_t i = 0; i < cap; ++i)
        order[i] = i < nt ? keyed[i].second : -1;

    float* amin = (float*)std::malloc(nodes * 3 * sizeof(float));
    float* amax = (float*)std::malloc(nodes * 3 * sizeof(float));
    const float BIG = 3e38f;

    // leaf AABBs
    parallel_for(leaves, nthreads, [&](int64_t lo, int64_t hi) {
        for (int64_t L = lo; L < hi; ++L) {
            float mn[3] = {BIG, BIG, BIG}, mx[3] = {-BIG, -BIG, -BIG};
            for (int64_t j = 0; j < leaf_size; ++j) {
                int32_t t = order[L * leaf_size + j];
                if (t < 0) continue;
                for (int k = 0; k < 3; ++k) {
                    mn[k] = std::min(mn[k], tmin[3 * t + k]);
                    mx[k] = std::max(mx[k], tmax[3 * t + k]);
                }
            }
            int64_t node = leaves - 1 + L;
            for (int k = 0; k < 3; ++k) {
                amin[3 * node + k] = mn[k];
                amax[3 * node + k] = mx[k];
            }
        }
    });
    // internal levels bottom-up
    for (int64_t level_start = leaves - 1; level_start > 0;) {
        int64_t parent_start = (level_start - 1) / 2;
        parallel_for(level_start - parent_start, nthreads,
                     [&](int64_t lo, int64_t hi) {
            for (int64_t off = lo; off < hi; ++off) {
                int64_t i = parent_start + off;
                for (int k = 0; k < 3; ++k) {
                    amin[3 * i + k] = std::min(amin[3 * (2 * i + 1) + k],
                                               amin[3 * (2 * i + 2) + k]);
                    amax[3 * i + k] = std::max(amax[3 * (2 * i + 1) + k],
                                               amax[3 * (2 * i + 2) + k]);
                }
            }
        });
        level_start = parent_start;
    }

    int32_t* miss = (int32_t*)std::malloc(nodes * sizeof(int32_t));
    miss[0] = -1;
    for (int64_t i = 1; i < nodes; ++i)
        miss[i] = (i % 2 == 1) ? (int32_t)(i + 1) : miss[(i - 1) / 2];

    *out_aabb_min = amin;
    *out_aabb_max = amax;
    *out_miss = miss;
    *out_order = order;
    *out_nodes = nodes;
    *out_cap = cap;
    return 0;
}

void bvh_free(float* a, float* b, int32_t* c, int32_t* d) {
    std::free(a); std::free(b); std::free(c); std::free(d);
}

}  // extern "C"
