// Native host-side graph construction kernels.
//
// TPU-native counterpart of the reference's C++/CUDA ingest path
// (cpp/src/structure/renumber_edgelist_impl.cuh compute_renumber_map,
// create_graph_from_edgelist_impl.cuh CSR compression): on TPU the device
// computes, but ingest (sort/renumber/compress) is host work, so it gets a
// native implementation. Exposed as a C ABI consumed via ctypes
// (cugraph_tpu/native/__init__.py); numpy fallback when the .so is absent.
//
// Build: make -C cugraph_tpu/native

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Parallel-for over [0, n) in contiguous chunks.
template <typename F>
void parallel_for(int64_t n, F&& fn) {
  int nt = hardware_threads();
  if (n < (1 << 16) || nt <= 1) {
    fn(int64_t{0}, n);
    return;
  }
  std::vector<std::thread> workers;
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& w : workers) w.join();
}

}  // namespace

extern "C" {

// Total-degree histogram: deg[v] += 1 per endpoint occurrence.
void ct_degree_histogram(const int32_t* src, const int32_t* dst, int64_t e,
                         int32_t num_vertices, int64_t* deg) {
  std::memset(deg, 0, sizeof(int64_t) * num_vertices);
  // sharded counting to avoid atomics: one histogram per thread, reduce
  int nt = hardware_threads();
  if (e < (1 << 18) || nt <= 1) {
    for (int64_t k = 0; k < e; ++k) {
      ++deg[src[k]];
      ++deg[dst[k]];
    }
    return;
  }
  std::vector<std::vector<int64_t>> partial(nt);
  std::vector<std::thread> workers;
  int64_t chunk = (e + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk, hi = std::min(e, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([&, t, lo, hi] {
      partial[t].assign(num_vertices, 0);
      for (int64_t k = lo; k < hi; ++k) {
        ++partial[t][src[k]];
        ++partial[t][dst[k]];
      }
    });
  }
  for (auto& w : workers) w.join();
  parallel_for(num_vertices, [&](int64_t lo, int64_t hi) {
    for (int64_t v = lo; v < hi; ++v) {
      int64_t s = 0;
      for (auto& p : partial)
        if (!p.empty()) s += p[v];
      deg[v] = s;
    }
  });
}

// Degree-descending renumber map (stable): new_to_old[i] = old id of new i.
// ref: renumber_edgelist_impl.cuh:96 compute_renumber_map.
void ct_renumber_map(const int32_t* src, const int32_t* dst, int64_t e,
                     int32_t num_vertices, int32_t* new_to_old) {
  std::vector<int64_t> deg(num_vertices);
  ct_degree_histogram(src, dst, e, num_vertices, deg.data());
  std::vector<int32_t> ids(num_vertices);
  std::iota(ids.begin(), ids.end(), 0);
  std::stable_sort(ids.begin(), ids.end(), [&](int32_t a, int32_t b) {
    return deg[a] > deg[b];
  });
  std::memcpy(new_to_old, ids.data(), sizeof(int32_t) * num_vertices);
}

// Apply inverse permutation: out[k] = old_to_new[in[k]].
void ct_apply_map(const int32_t* new_to_old, int32_t num_vertices,
                  const int32_t* in, int64_t n, int32_t* out) {
  std::vector<int32_t> old_to_new(num_vertices);
  for (int32_t i = 0; i < num_vertices; ++i) old_to_new[new_to_old[i]] = i;
  parallel_for(n, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) out[k] = old_to_new[in[k]];
  });
}

// CSR compression: sort edges by (major, minor), emit offsets + padded
// minor/major/weight arrays (padding: major = num_majors, minor = 0, w = 0).
// ref: create_graph_from_edgelist_impl.cuh per-partition compression.
void ct_build_csr(const int32_t* majors, const int32_t* minors,
                  const float* weights,  // may be null
                  int64_t e, int32_t num_majors, int64_t e_pad,
                  int32_t* out_offsets,   // num_majors + 1
                  int32_t* out_majors,    // e_pad
                  int32_t* out_minors,    // e_pad
                  float* out_weights) {   // e_pad or null
  // counting sort by major (stable), then sort minors within each row.
  std::vector<int64_t> cnt(num_majors + 1, 0);
  for (int64_t k = 0; k < e; ++k) ++cnt[majors[k] + 1];
  for (int32_t v = 0; v < num_majors; ++v) cnt[v + 1] += cnt[v];
  out_offsets[0] = 0;
  for (int32_t v = 0; v < num_majors; ++v)
    out_offsets[v + 1] = static_cast<int32_t>(cnt[v + 1]);

  std::vector<int64_t> cursor(cnt.begin(), cnt.end() - 1);
  std::vector<int64_t> order(e);
  for (int64_t k = 0; k < e; ++k) order[cursor[majors[k]]++] = k;

  parallel_for(e, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      int64_t o = order[k];
      out_majors[k] = majors[o];
      out_minors[k] = minors[o];
      if (weights) out_weights[k] = weights[o];
    }
  });
  // per-row minor sort (weights follow)
  parallel_for(num_majors, [&](int64_t lo, int64_t hi) {
    std::vector<int64_t> idx;
    for (int64_t v = lo; v < hi; ++v) {
      int64_t b = out_offsets[v], t = out_offsets[v + 1];
      int64_t len = t - b;
      if (len <= 1) continue;
      idx.resize(len);
      std::iota(idx.begin(), idx.end(), 0);
      // stable: parallel edges keep input order (matches np.lexsort)
      std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t c) {
        return out_minors[b + a] < out_minors[b + c];
      });
      std::vector<int32_t> tmp_m(len);
      std::vector<float> tmp_w(weights ? len : 0);
      for (int64_t i = 0; i < len; ++i) {
        tmp_m[i] = out_minors[b + idx[i]];
        if (weights) tmp_w[i] = out_weights[b + idx[i]];
      }
      std::memcpy(out_minors + b, tmp_m.data(), sizeof(int32_t) * len);
      if (weights)
        std::memcpy(out_weights + b, tmp_w.data(), sizeof(float) * len);
    }
  });
  // tail padding
  parallel_for(e_pad - e, [&](int64_t lo, int64_t hi) {
    for (int64_t k = lo; k < hi; ++k) {
      out_majors[e + k] = num_majors;
      out_minors[e + k] = 0;
      if (weights) out_weights[e + k] = 0.0f;
    }
  });
}

// Symmetrize: append reciprocal of non-loop edges. Returns new count.
int64_t ct_symmetrize(const int32_t* src, const int32_t* dst,
                      const float* w, int64_t e, int32_t* out_src,
                      int32_t* out_dst, float* out_w) {
  std::memcpy(out_src, src, sizeof(int32_t) * e);
  std::memcpy(out_dst, dst, sizeof(int32_t) * e);
  if (w) std::memcpy(out_w, w, sizeof(float) * e);
  int64_t n = e;
  for (int64_t k = 0; k < e; ++k) {
    if (src[k] != dst[k]) {
      out_src[n] = dst[k];
      out_dst[n] = src[k];
      if (w) out_w[n] = w[k];
      ++n;
    }
  }
  return n;
}


// ---------------------------------------------------------------------------
// Benes network routing (static permutation -> butterfly switch bits).
// Element at input position i must reach output position perm[i].
// bits layout: (2k-1) stages x n positions, both pair positions share the
// pair's bit. Stage distances: n/2 ... 2, 1, 2 ... n/2.
// Classic Waksman 2-coloring, iterative over levels. O(n log n).
// ---------------------------------------------------------------------------
void ct_benes_route(const int64_t* perm, int64_t n, uint8_t* bits) {
  int k = 0;
  while ((int64_t(1) << k) < n) ++k;
  if ((int64_t(1) << k) != n || n < 2) return;
  const int n_stages = 2 * k - 1;
  std::vector<int64_t> dest(perm, perm + n), next(n), inv(n);
  std::vector<int8_t> color(n);
  for (int level = 0;; ++level) {
    const int64_t nloc = n >> level;
    const int stage_in = level, stage_out = n_stages - 1 - level;
    uint8_t* bin = bits + (int64_t)stage_in * n;
    uint8_t* bout = bits + (int64_t)stage_out * n;
    if (nloc == 2) {
      for (int64_t seg = 0; seg < n; seg += 2) {
        uint8_t b = dest[seg] == 1 ? 1 : 0;
        bin[seg] = b;
        bin[seg + 1] = b;
      }
      break;
    }
    const int64_t m = nloc >> 1;
    for (int64_t seg = 0; seg < n; seg += nloc) {
      int64_t* d = dest.data() + seg;
      int64_t* iv = inv.data() + seg;
      int8_t* col = color.data() + seg;
      for (int64_t i = 0; i < nloc; ++i) iv[d[i]] = i;
      std::fill(col, col + nloc, (int8_t)-1);
      for (int64_t e0 = 0; e0 < nloc; ++e0) {
        if (col[e0] >= 0) continue;
        int64_t e = e0;
        int8_t c = 0;
        while (col[e] < 0) {
          col[e] = c;
          int64_t pin = e ^ m;
          if (col[pin] < 0) col[pin] = (int8_t)(1 - c);
          e = iv[d[pin] ^ m];
          c = (int8_t)(1 - col[pin]);
        }
      }
      int64_t* td = next.data() + seg;
      int64_t* bd = next.data() + seg + m;
      for (int64_t i = 0; i < m; ++i) {
        uint8_t b = col[i] == 1 ? 1 : 0;
        bin[seg + i] = b;
        bin[seg + i + m] = b;
        int64_t top_e = b ? i + m : i;
        int64_t bot_e = b ? i : i + m;
        td[i] = d[top_e] & (m - 1);
        bd[i] = d[bot_e] & (m - 1);
        int64_t p = td[i];
        uint8_t bo = d[top_e] >= m ? 1 : 0;
        bout[seg + p] = bo;
        bout[seg + p + m] = bo;
      }
    }
    std::swap(dest, next);
  }
}

}  // extern "C"

extern "C" {

// ---------------------------------------------------------------------------
// Stable LSD radix argsort over uint64 keys (8-bit digits, skipping digits
// that are constant across the key range). Replaces np.lexsort in the
// sorted-layout builder (spmv2.py stages 1/4/7) where composite keys fit
// 64 bits — the host-side analog of the reference's thrust::sort ingest
// (create_graph_from_edgelist_impl.cuh).
// ---------------------------------------------------------------------------
void ct_radix_argsort_u64(const uint64_t* keys, int64_t n, int64_t* order) {
  if (n <= 0) return;
  std::vector<int64_t> tmp(n);
  int64_t* cur = order;
  int64_t* alt = tmp.data();
  for (int64_t i = 0; i < n; ++i) cur[i] = i;
  uint64_t all_or = 0, all_and = ~uint64_t{0};
  for (int64_t i = 0; i < n; ++i) {
    all_or |= keys[i];
    all_and &= keys[i];
  }
  uint64_t varying = all_or ^ all_and;  // bits that differ somewhere
  for (int pass = 0; pass < 8; ++pass) {
    int shift = pass * 8;
    if (((varying >> shift) & 0xFF) == 0) continue;
    int64_t hist[256] = {0};
    for (int64_t i = 0; i < n; ++i) ++hist[(keys[cur[i]] >> shift) & 0xFF];
    int64_t sum = 0;
    for (int d = 0; d < 256; ++d) {
      int64_t c = hist[d];
      hist[d] = sum;
      sum += c;
    }
    for (int64_t i = 0; i < n; ++i) {
      int64_t o = cur[i];
      alt[hist[(keys[o] >> shift) & 0xFF]++] = o;
    }
    std::swap(cur, alt);
  }
  if (cur != order) std::memcpy(order, cur, sizeof(int64_t) * n);
}

// ---------------------------------------------------------------------------
// Batched 128-wide Benes routing packed to 13-bit switch words: one row per
// permutation (the eat mode's per-row lane fix, spmv2.py). perms: count x 128
// int64; words: count x 128 int32 (bit s = stage s switch).
// ---------------------------------------------------------------------------
void ct_lane_fix_words(const int64_t* perms, int64_t count, int32_t* words) {
  const int64_t n = 128;
  const int n_stages = 13;  // 2*7 - 1
  parallel_for(count, [&](int64_t lo, int64_t hi) {
    std::vector<uint8_t> bits(n_stages * n);
    for (int64_t r = lo; r < hi; ++r) {
      std::memset(bits.data(), 0, bits.size());
      ct_benes_route(perms + r * n, n, bits.data());
      int32_t* w = words + r * n;
      for (int64_t i = 0; i < n; ++i) {
        uint32_t acc = 0;
        for (int s = 0; s < n_stages; ++s)
          acc |= uint32_t(bits[s * n + i]) << s;
        w[i] = static_cast<int32_t>(acc);
      }
    }
  });
}

}  // extern "C"
