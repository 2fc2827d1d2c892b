// gbnns_ref — C++/OpenMP reference engine: brute-force kNN build and
// greedy/beam graph search with an exact visited set.
//
// Role in the TPU rebuild: the original reference implements its searcher
// and graph builder in C++ with OpenMP query-parallelism (SURVEY.md §3,
// native components #1/#2; /root/reference was empty so this is a clean
// re-implementation of the documented semantics, not a copy). This library
// is (a) the recall-parity oracle the TPU walkers are gated against at
// equal index memory (BASELINE.json:5) and (b) the single-node CPU QPS
// baseline for the recall-vs-QPS comparison.
//
// Build: `make -C native` → libgbnns_ref.so, loaded via ctypes
// (gbnns_tpu.native). No Python deps; plain C ABI.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <utility>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline float dist_l2(const float* a, const float* b, int d) {
  float acc = 0.f;
  for (int i = 0; i < d; ++i) {
    const float t = a[i] - b[i];
    acc += t * t;
  }
  return acc;
}

inline float dist_ip(const float* a, const float* b, int d) {
  float acc = 0.f;
  for (int i = 0; i < d; ++i) acc += a[i] * b[i];
  return -acc;
}

inline float dist(const float* a, const float* b, int d, int metric) {
  return metric == 0 ? dist_l2(a, b, d) : dist_ip(a, b, d);
}

}  // namespace

extern "C" {

// Exact kNN graph: for each node, the K nearest other nodes (self excluded),
// ascending by distance. graph_out: n*K int32. metric: 0=l2, 1=ip/angular.
void gbnns_knn_build(const float* base, int n, int d, int K, int metric,
                     int* graph_out) {
#pragma omp parallel for schedule(dynamic, 64)
  for (int i = 0; i < n; ++i) {
    // max-heap of (dist, id) keeping the K smallest
    std::priority_queue<std::pair<float, int>> heap;
    const float* xi = base + (size_t)i * d;
    for (int j = 0; j < n; ++j) {
      if (j == i) continue;
      const float dj = dist(xi, base + (size_t)j * d, d, metric);
      if ((int)heap.size() < K) {
        heap.emplace(dj, j);
      } else if (dj < heap.top().first) {
        heap.pop();
        heap.emplace(dj, j);
      }
    }
    int k = (int)heap.size();
    for (int slot = k - 1; slot >= 0; --slot) {
      graph_out[(size_t)i * K + slot] = heap.top().second;
      heap.pop();
    }
    for (int slot = k; slot < K; ++slot) graph_out[(size_t)i * K + slot] = -1;
  }
}

// Greedy/beam (ef) graph search with exact per-query visited set; the
// classical best-first loop: pop nearest unexpanded candidate, stop when it
// is worse than the worst of the ef-pool, evaluate its neighbors, keep the
// pool bounded at ef. Results: per query the ef pool ascending (id, dist),
// padded with (-1, inf). ndist_out: distance computations per query.
void gbnns_beam_search(const float* base, int n, int d, const int* graph,
                       int K, const float* queries, int nq, int ef,
                       const int* entries, int n_entries, int metric,
                       int* ids_out, float* dists_out, int64_t* ndist_out) {
#pragma omp parallel
  {
    std::vector<uint8_t> visited((size_t)n, 0);
    std::vector<int> touched;
    touched.reserve(4096);
#pragma omp for schedule(dynamic, 8)
    for (int q = 0; q < nq; ++q) {
      const float* xq = queries + (size_t)q * d;
      // clear visited marks from the previous query handled by this thread
      for (int t : touched) visited[t] = 0;
      touched.clear();
      int64_t ndist = 0;

      // candidates: min-heap by dist (to pop nearest unexpanded);
      // pool: max-heap by dist (to evict worst), size <= ef
      using PD = std::pair<float, int>;
      std::priority_queue<PD, std::vector<PD>, std::greater<PD>> cand;
      std::priority_queue<PD> pool;

      for (int e = 0; e < n_entries; ++e) {
        const int id = entries[e];
        if (id < 0 || id >= n || visited[id]) continue;
        visited[id] = 1;
        touched.push_back(id);
        const float de = dist(xq, base + (size_t)id * d, d, metric);
        ++ndist;
        cand.emplace(de, id);
        pool.emplace(de, id);
        if ((int)pool.size() > ef) pool.pop();
      }

      while (!cand.empty()) {
        const auto [dc, c] = cand.top();
        cand.pop();
        if ((int)pool.size() >= ef && dc > pool.top().first) break;
        const int* nbrs = graph + (size_t)c * K;
        for (int j = 0; j < K; ++j) {
          const int nb = nbrs[j];
          if (nb < 0 || visited[nb]) continue;
          visited[nb] = 1;
          touched.push_back(nb);
          const float dn = dist(xq, base + (size_t)nb * d, d, metric);
          ++ndist;
          if ((int)pool.size() < ef || dn < pool.top().first) {
            cand.emplace(dn, nb);
            pool.emplace(dn, nb);
            if ((int)pool.size() > ef) pool.pop();
          }
        }
      }

      // drain pool (descending) into ascending output
      int cnt = (int)pool.size();
      for (int slot = ef - 1; slot >= cnt; --slot) {
        ids_out[(size_t)q * ef + slot] = -1;
        dists_out[(size_t)q * ef + slot] = INFINITY;
      }
      for (int slot = cnt - 1; slot >= 0; --slot) {
        ids_out[(size_t)q * ef + slot] = pool.top().second;
        dists_out[(size_t)q * ef + slot] = pool.top().first;
        pool.pop();
      }
      ndist_out[q] = ndist;
    }
  }
}

// Exact re-rank: candidates (nq, C) scored in full dimension, top-k out.
void gbnns_rerank(const float* base, int n, int d, const float* queries,
                  int nq, const int* cand, int C, int k, int metric,
                  int* ids_out, float* dists_out) {
#pragma omp parallel for schedule(dynamic, 8)
  for (int q = 0; q < nq; ++q) {
    const float* xq = queries + (size_t)q * d;
    std::vector<std::pair<float, int>> scored;
    scored.reserve(C);
    for (int c = 0; c < C; ++c) {
      const int id = cand[(size_t)q * C + c];
      if (id < 0) continue;
      bool dup = false;
      for (const auto& s : scored)
        if (s.second == id) { dup = true; break; }
      if (dup) continue;
      scored.emplace_back(dist(xq, base + (size_t)id * d, d, metric), id);
    }
    std::sort(scored.begin(), scored.end());
    for (int slot = 0; slot < k; ++slot) {
      if (slot < (int)scored.size()) {
        ids_out[(size_t)q * k + slot] = scored[slot].second;
        dists_out[(size_t)q * k + slot] = scored[slot].first;
      } else {
        ids_out[(size_t)q * k + slot] = -1;
        dists_out[(size_t)q * k + slot] = INFINITY;
      }
    }
  }
}

int gbnns_num_threads() {
#if defined(_OPENMP)
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
