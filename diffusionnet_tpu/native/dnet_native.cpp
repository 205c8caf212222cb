// dnet_native — in-repo C++ host kernels for the TPU-native DiffusionNet framework.
//
// Replaces external native dependencies of the reference (sklearn KDTree used at
// reference geometry.py:704; libigl exact_geodesic + multiprocessing Pool at
// geometry.py:784-867) with a single self-contained shared library exposed via
// ctypes (no pybind11 in this environment).
//
// Exposed C ABI:
//   dnet_knn(target, n_target, source, n_source, k, out_dists, out_inds)
//   dnet_dijkstra_geodesics(verts, V, faces, F, sources, S, out)  // (S, V) float32
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 dnet_native.cpp -o libdnet_native.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <limits>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------------------
// KD-tree (3-D, median split) for kNN queries
// ----------------------------------------------------------------------------

struct KDNode {
  int32_t left = -1, right = -1;
  int32_t begin = 0, end = 0;  // leaf range into `order`
  int8_t axis = -1;            // -1 => leaf
  double split = 0.0;
};

class KDTree3 {
 public:
  KDTree3(const double* pts, int64_t n) : pts_(pts), n_(n), order_(n) {
    for (int64_t i = 0; i < n; ++i) order_[i] = i;
    nodes_.reserve(2 * (n / kLeafSize + 1));
    root_ = build(0, n);
  }

  // k nearest neighbors of query q; writes sorted (dist, idx) pairs.
  void query(const double* q, int k, double* out_d, int64_t* out_i) const {
    // bounded max-heap of (dist2, idx)
    heap_.clear();
    search(root_, q, k);
    std::sort_heap(heap_.begin(), heap_.end());
    int m = static_cast<int>(heap_.size());
    for (int i = 0; i < k; ++i) {
      if (i < m) {
        out_d[i] = std::sqrt(heap_[i].first);
        out_i[i] = heap_[i].second;
      } else {  // fewer points than k: repeat last
        out_d[i] = out_d[m - 1];
        out_i[i] = out_i[m - 1];
      }
    }
  }

 private:
  static constexpr int kLeafSize = 16;

  int32_t build(int64_t begin, int64_t end) {
    KDNode node;
    if (end - begin <= kLeafSize) {
      node.axis = -1;
      node.begin = static_cast<int32_t>(begin);
      node.end = static_cast<int32_t>(end);
      nodes_.push_back(node);
      return static_cast<int32_t>(nodes_.size() - 1);
    }
    // pick the widest axis
    double lo[3] = {1e300, 1e300, 1e300}, hi[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = begin; i < end; ++i) {
      const double* p = pts_ + 3 * order_[i];
      for (int a = 0; a < 3; ++a) {
        lo[a] = std::min(lo[a], p[a]);
        hi[a] = std::max(hi[a], p[a]);
      }
    }
    int axis = 0;
    double width = hi[0] - lo[0];
    for (int a = 1; a < 3; ++a)
      if (hi[a] - lo[a] > width) { width = hi[a] - lo[a]; axis = a; }

    int64_t mid = (begin + end) / 2;
    std::nth_element(order_.begin() + begin, order_.begin() + mid,
                     order_.begin() + end, [&](int64_t x, int64_t y) {
                       return pts_[3 * x + axis] < pts_[3 * y + axis];
                     });
    node.axis = static_cast<int8_t>(axis);
    node.split = pts_[3 * order_[mid] + axis];
    int32_t me = static_cast<int32_t>(nodes_.size());
    nodes_.push_back(node);
    int32_t l = build(begin, mid);
    int32_t r = build(mid, end);
    nodes_[me].left = l;
    nodes_[me].right = r;
    return me;
  }

  void consider(const double* q, int64_t idx, int k) const {
    const double* p = pts_ + 3 * idx;
    double d2 = 0.0;
    for (int a = 0; a < 3; ++a) {
      double d = p[a] - q[a];
      d2 += d * d;
    }
    if (static_cast<int>(heap_.size()) < k) {
      heap_.emplace_back(d2, idx);
      std::push_heap(heap_.begin(), heap_.end());
    } else if (d2 < heap_.front().first) {
      std::pop_heap(heap_.begin(), heap_.end());
      heap_.back() = {d2, idx};
      std::push_heap(heap_.begin(), heap_.end());
    }
  }

  void search(int32_t ni, const double* q, int k) const {
    const KDNode& node = nodes_[ni];
    if (node.axis < 0) {
      for (int32_t i = node.begin; i < node.end; ++i)
        consider(q, order_[i], k);
      return;
    }
    double diff = q[node.axis] - node.split;
    int32_t near = diff <= 0 ? node.left : node.right;
    int32_t far = diff <= 0 ? node.right : node.left;
    search(near, q, k);
    double worst = (static_cast<int>(heap_.size()) < k)
                       ? std::numeric_limits<double>::infinity()
                       : heap_.front().first;
    if (diff * diff < worst) search(far, q, k);
  }

  const double* pts_;
  int64_t n_;
  std::vector<int64_t> order_;
  std::vector<KDNode> nodes_;
  int32_t root_;
  mutable std::vector<std::pair<double, int64_t>> heap_;
};

}  // namespace

extern "C" {

// target: (n_target, 3) float64; source: (n_source, 3) float64.
// out_dists: (n_source, k) float64; out_inds: (n_source, k) int64.
void dnet_knn(const double* target, int64_t n_target, const double* source,
              int64_t n_source, int32_t k, double* out_dists, int64_t* out_inds) {
  KDTree3 tree(target, n_target);
  for (int64_t i = 0; i < n_source; ++i) {
    tree.query(source + 3 * i, k, out_dists + (int64_t)k * i,
               out_inds + (int64_t)k * i);
  }
}

// Graph geodesics: Dijkstra over the mesh edge graph with Euclidean weights.
// verts: (V,3) float64; faces: (F,3) int64; sources: (S,) int64;
// out: (S, V) float32 distances.
void dnet_dijkstra_geodesics(const double* verts, int64_t V, const int64_t* faces,
                             int64_t F, const int64_t* sources, int64_t S,
                             float* out) {
  // build CSR adjacency (undirected, deduped per face edge)
  std::vector<std::vector<std::pair<int32_t, float>>> adj(V);
  auto add_edge = [&](int64_t a, int64_t b) {
    double d2 = 0.0;
    for (int c = 0; c < 3; ++c) {
      double d = verts[3 * a + c] - verts[3 * b + c];
      d2 += d * d;
    }
    float w = static_cast<float>(std::sqrt(d2));
    adj[a].emplace_back(static_cast<int32_t>(b), w);
    adj[b].emplace_back(static_cast<int32_t>(a), w);
  };
  for (int64_t f = 0; f < F; ++f) {
    int64_t i = faces[3 * f], j = faces[3 * f + 1], k = faces[3 * f + 2];
    add_edge(i, j);
    add_edge(j, k);
    add_edge(k, i);
  }
  for (auto& nbrs : adj) {
    std::sort(nbrs.begin(), nbrs.end());
    nbrs.erase(std::unique(nbrs.begin(), nbrs.end()), nbrs.end());
  }

  // independent per-source Dijkstras fanned over hardware threads
  // (replaces the reference's Python multiprocessing.Pool, geometry.py:862)
  unsigned n_threads = std::max<unsigned>(1, std::thread::hardware_concurrency());
  auto worker = [&](int64_t begin, int64_t step) {
    std::vector<float> dist(V);
    using QE = std::pair<float, int32_t>;
    for (int64_t s = begin; s < S; s += step) {
      std::fill(dist.begin(), dist.end(),
                std::numeric_limits<float>::infinity());
      std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
      dist[sources[s]] = 0.0f;
      pq.emplace(0.0f, static_cast<int32_t>(sources[s]));
      while (!pq.empty()) {
        auto [d, u] = pq.top();
        pq.pop();
        if (d > dist[u]) continue;
        for (auto [v, w] : adj[u]) {
          float nd = d + w;
          if (nd < dist[v]) {
            dist[v] = nd;
            pq.emplace(nd, v);
          }
        }
      }
      std::memcpy(out + s * V, dist.data(), V * sizeof(float));
    }
  };
  if (n_threads <= 1 || S <= 1) {
    worker(0, 1);
  } else {
    std::vector<std::thread> pool;
    for (unsigned t = 0; t < n_threads; ++t)
      pool.emplace_back(worker, t, n_threads);
    for (auto& th : pool) th.join();
  }
}

// Steiner-point geodesics: Dijkstra over a refined graph with k extra nodes per
// edge and complete connections among the (3 + 3k) nodes bordering each face.
// Converges to the true polyhedral geodesic as k grows (error ~ O(1/k));
// substantially more accurate than vertex-graph Dijkstra for few-source queries.
// verts: (V,3) float64; faces: (F,3) int64; sources: (S,) int64 (vertex ids);
// out: (S, V) float32 distances at original vertices.
void dnet_steiner_geodesics(const double* verts, int64_t V, const int64_t* faces,
                            int64_t F, const int64_t* sources, int64_t S,
                            int32_t k_steiner, float* out) {
  const int32_t k = k_steiner;
  // ---- node table: originals [0, V); Steiner nodes appended per unique edge
  struct PairHash {
    size_t operator()(const std::pair<int64_t, int64_t>& p) const {
      return std::hash<int64_t>()(p.first * 0x9e3779b97f4a7c15LL + p.second);
    }
  };
  std::unordered_map<std::pair<int64_t, int64_t>, int64_t, PairHash> edge_base;
  std::vector<double> pos(verts, verts + 3 * V);

  auto edge_key = [](int64_t a, int64_t b) {
    return std::make_pair(std::min(a, b), std::max(a, b));
  };

  // first pass: allocate Steiner nodes on unique edges
  for (int64_t f = 0; f < F; ++f) {
    for (int c = 0; c < 3; ++c) {
      int64_t a = faces[3 * f + c], b = faces[3 * f + (c + 1) % 3];
      auto key = edge_key(a, b);
      if (edge_base.count(key)) continue;
      int64_t base = pos.size() / 3;
      edge_base[key] = base;
      for (int32_t s = 1; s <= k; ++s) {
        double t = double(s) / (k + 1);
        for (int d = 0; d < 3; ++d)
          pos.push_back((1.0 - t) * verts[3 * key.first + d]
                        + t * verts[3 * key.second + d]);
      }
    }
  }
  int64_t N = pos.size() / 3;

  auto dist3 = [&](int64_t a, int64_t b) {
    double d2 = 0.0;
    for (int d = 0; d < 3; ++d) {
      double dd = pos[3 * a + d] - pos[3 * b + d];
      d2 += dd * dd;
    }
    return static_cast<float>(std::sqrt(d2));
  };

  // second pass: complete graph among each face's boundary nodes
  std::vector<std::vector<std::pair<int32_t, float>>> adj(N);
  std::vector<int64_t> ring;
  for (int64_t f = 0; f < F; ++f) {
    ring.clear();
    for (int c = 0; c < 3; ++c) {
      int64_t a = faces[3 * f + c], b = faces[3 * f + (c + 1) % 3];
      ring.push_back(a);
      auto key = edge_key(a, b);
      int64_t base = edge_base[key];
      if (a <= b) {
        for (int32_t s = 0; s < k; ++s) ring.push_back(base + s);
      } else {
        for (int32_t s = k - 1; s >= 0; --s) ring.push_back(base + s);
      }
    }
    for (size_t i = 0; i < ring.size(); ++i)
      for (size_t j = i + 1; j < ring.size(); ++j) {
        float w = dist3(ring[i], ring[j]);
        adj[ring[i]].emplace_back(static_cast<int32_t>(ring[j]), w);
        adj[ring[j]].emplace_back(static_cast<int32_t>(ring[i]), w);
      }
  }
  for (auto& nbrs : adj) {
    std::sort(nbrs.begin(), nbrs.end());
    nbrs.erase(std::unique(nbrs.begin(), nbrs.end()), nbrs.end());
  }

  // independent per-source Dijkstras fanned over hardware threads
  // (replaces the reference's Python multiprocessing.Pool, geometry.py:862)
  unsigned n_threads = std::max<unsigned>(1, std::thread::hardware_concurrency());
  auto worker = [&](int64_t begin, int64_t step) {
    std::vector<float> dist(N);
    using QE = std::pair<float, int32_t>;
    for (int64_t s = begin; s < S; s += step) {
      std::fill(dist.begin(), dist.end(),
                std::numeric_limits<float>::infinity());
      std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
      dist[sources[s]] = 0.0f;
      pq.emplace(0.0f, static_cast<int32_t>(sources[s]));
      while (!pq.empty()) {
        auto [d, u] = pq.top();
        pq.pop();
        if (d > dist[u]) continue;
        for (auto [v, w] : adj[u]) {
          float nd = d + w;
          if (nd < dist[v]) {
            dist[v] = nd;
            pq.emplace(nd, v);
          }
        }
      }
      std::memcpy(out + s * V, dist.data(), V * sizeof(float));
    }
  };
  if (n_threads <= 1 || S <= 1) {
    worker(0, 1);
  } else {
    std::vector<std::thread> pool;
    for (unsigned t = 0; t < n_threads; ++t)
      pool.emplace_back(worker, t, n_threads);
    for (auto& th : pool) th.join();
  }
}

}  // extern "C"
