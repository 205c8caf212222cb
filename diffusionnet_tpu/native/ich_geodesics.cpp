// Exact polyhedral geodesics via ICH (improved Chen-Han continuous Dijkstra),
// the exact-geodesic capability matching the reference's use of libigl's MMP
// (reference geometry.py:784-794). Computes exact source-to-all-VERTICES
// distances, which is precisely what the geodesic-error metric consumes
// (geometry.py:768-770).
//
// Algorithm: windows (unfolded source images over directed half-edges)
// propagate across faces in a priority queue ordered by minimal window
// distance; vertex distance labels give Dijkstra-style pruning (windows
// dominated by a through-vertex path are dropped); saddle/boundary vertices
// spawn pseudo-sources. Pruning keeps the window count near-linear in
// practice; a hard window budget guards the exponential worst case (the
// caller falls back to Steiner-refined Dijkstra on failure).
//
// Mesh assumptions: triangle mesh, edge-manifold and consistently oriented
// (each directed edge appears at most once). Returns 1 on success, 0 when the
// mesh is non-manifold or the window budget is exceeded.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <queue>
#include <thread>
#include <unordered_map>
#include <vector>

namespace ich {

constexpr double kEps = 1e-12;

struct HalfEdge {
  int32_t dst = -1;    // head vertex
  int32_t src = -1;    // tail vertex
  int32_t twin = -1;   // opposite half-edge (-1 on boundary)
  int32_t next = -1;   // next half-edge in the face (ccw)
  int32_t face = -1;
  double len = 0.0;
};

struct Window {
  int32_t he;      // directed half-edge the window lives on
  double b0, b1;   // interval on [0, len(he)], measured from src(he)
  double d0, d1;   // distances from interval endpoints to the pseudo-source
  double sigma;    // distance from pseudo-source to the true source
  double key;      // priority: sigma + min distance to interval
  int32_t vevent = -1;  // >= 0: not a window but a vertex-settled event — when
  // popped (in key order) the vertex's label is final and, if it is a saddle
  // or boundary vertex, its pseudo-source windows are spawned exactly then
};

struct WinCmp {
  bool operator()(const Window& a, const Window& b) const {
    return a.key > b.key;
  }
};

// planar source position from (b0, b1, d0, d1): place the edge on the x-axis
// (src at b0? no — absolute coordinates along the half-edge), source at y > 0.
inline bool source_pos(const Window& w, double& sx, double& sy) {
  double dx = w.b1 - w.b0;
  if (dx < kEps) return false;
  // |s - (b0,0)| = d0, |s - (b1,0)| = d1
  double x = (w.d0 * w.d0 - w.d1 * w.d1 + w.b1 * w.b1 - w.b0 * w.b0)
             / (2.0 * dx);
  double y2 = w.d0 * w.d0 - (x - w.b0) * (x - w.b0);
  sx = x;
  sy = (y2 <= 0.0) ? 0.0 : std::sqrt(y2);
  return true;
}

inline double min_window_dist(const Window& w) {
  double sx, sy;
  if (!source_pos(w, sx, sy)) return std::min(w.d0, w.d1);
  if (sx < w.b0) return w.d0;
  if (sx > w.b1) return w.d1;
  return sy;  // perpendicular foot inside the interval
}

class Solver {
 public:
  // returns false if the mesh is unusable (non-manifold / non-oriented)
  bool build(const double* verts, int64_t V, const int64_t* faces, int64_t F) {
    V_ = V;
    pos_ = verts;
    he_.clear();
    he_.reserve(3 * F);
    std::unordered_map<int64_t, int32_t> half;  // (u<<32|v) -> he index
    half.reserve(3 * F);

    auto vkey = [&](int64_t u, int64_t v) { return (u << 32) | v; };

    for (int64_t f = 0; f < F; ++f) {
      int32_t base = static_cast<int32_t>(he_.size());
      for (int c = 0; c < 3; ++c) {
        int64_t u = faces[3 * f + c], v = faces[3 * f + (c + 1) % 3];
        if (u == v) return false;
        HalfEdge h;
        h.src = static_cast<int32_t>(u);
        h.dst = static_cast<int32_t>(v);
        h.face = static_cast<int32_t>(f);
        h.next = base + (c + 1) % 3;
        double d2 = 0.0;
        for (int k = 0; k < 3; ++k) {
          double d = pos_[3 * v + k] - pos_[3 * u + k];
          d2 += d * d;
        }
        h.len = std::sqrt(d2);
        if (h.len < kEps) return false;
        auto key = vkey(u, v);
        if (half.count(key)) return false;  // non-oriented / non-manifold
        half[key] = static_cast<int32_t>(he_.size());
        he_.push_back(h);
      }
    }
    for (size_t i = 0; i < he_.size(); ++i) {
      auto it = half.find(vkey(he_[i].dst, he_[i].src));
      he_[i].twin = (it == half.end()) ? -1 : it->second;
    }

    // outgoing half-edge lists + total angle per vertex (saddle detection)
    out_.assign(V_, {});
    angle_.assign(V_, 0.0);
    for (size_t i = 0; i < he_.size(); ++i) {
      out_[he_[i].src].push_back(static_cast<int32_t>(i));
      // corner angle at src of this half-edge within its face
      const HalfEdge& a = he_[i];
      const HalfEdge& c = he_[he_[a.next].next];  // incoming at src
      // angle between a (src->dst) and reversed c (src->c.src)
      double la = a.len, lb = he_[a.next].len, lc = c.len;
      // opposite side of the corner at src is the edge a.next (dst->apex)
      double cosv = (la * la + lc * lc - lb * lb) / (2.0 * la * lc);
      cosv = std::max(-1.0, std::min(1.0, cosv));
      angle_[a.src] += std::acos(cosv);
    }
    boundary_.assign(V_, false);
    for (const auto& h : he_)
      if (h.twin < 0) {
        boundary_[h.src] = true;
        boundary_[h.dst] = true;
      }
    return true;
  }

  // single-source exact distances to all vertices; false on budget overflow
  bool solve(int64_t source, float* out_dist, int64_t window_budget) {
    dist_.assign(V_, std::numeric_limits<double>::infinity());
    // reuse per-edge window buffers across solves (keeps their capacity
    // instead of reallocating ~3F vectors per source)
    if (edge_wins_.size() != he_.size()) {
      edge_wins_.assign(he_.size(), {});
    } else {
      for (auto& lst : edge_wins_) lst.clear();
    }
    std::priority_queue<Window, std::vector<Window>, WinCmp> pq;
    processed_ = 0;
    budget_ = window_budget;

    dist_[source] = 0.0;
    // initial windows: full opposite edge of every face incident to source
    for (int32_t hi : out_[source]) {
      const HalfEdge& h = he_[hi];
      int32_t opp = h.next;  // edge (dst -> apex), opposite the source corner
      push_source_windows(pq, opp, source, 0.0);
      // direct edge distances
      relax(pq, h.dst, h.len);
    }

    while (!pq.empty()) {
      Window w = pq.top();
      pq.pop();
      if (++processed_ > budget_) return false;
      if (w.vevent >= 0) {
        // spawn only if this event still matches the best label (stale events
        // from earlier, larger labels are skipped cheaply)
        if (w.key <= dist_[w.vevent] + 1e-15) spawn_pseudo(pq, w.vevent);
        continue;
      }
      if (w.key > max_dist_bound()) continue;
      propagate(pq, w);
    }
    for (int64_t v = 0; v < V_; ++v)
      out_dist[v] = static_cast<float>(dist_[v]);
    return true;
  }

 private:
  using PQ = std::priority_queue<Window, std::vector<Window>, WinCmp>;

  double max_dist_bound() const { return std::numeric_limits<double>::max(); }

  // Improve a vertex distance. Every improvement at a saddle/boundary vertex
  // must eventually spawn its pseudo-source windows — geodesics bend around
  // such vertices, and a label improved through an edge-endpoint relaxation
  // covers paths the window propagation alone would miss (classic MMP/CH
  // invariant). Spawning is deferred to a vertex event popped in key order,
  // so each vertex spawns once, from its settled (final) label.
  void relax(PQ& pq, int32_t v, double d) {
    if (d < dist_[v]) {
      dist_[v] = d;
      if (boundary_[v] || angle_[v] > 2.0 * M_PI + 1e-9) {
        Window ev{};
        ev.vevent = v;
        ev.key = d;
        pq.push(ev);
      }
    }
  }

  // windows from a (pseudo)source AT A VERTEX `src_v` with accumulated sigma,
  // placed on half-edge `hi` (an edge of a face incident to src_v, opposite it)
  void push_source_windows(PQ& pq, int32_t hi, int32_t src_v, double sigma) {
    const HalfEdge& h = he_[hi];
    double dA = 0.0, dB = 0.0;
    for (int k = 0; k < 3; ++k) {
      double a = pos_[3 * h.src + k] - pos_[3 * src_v + k];
      double b = pos_[3 * h.dst + k] - pos_[3 * src_v + k];
      dA += a * a;
      dB += b * b;
    }
    dA = std::sqrt(dA);
    dB = std::sqrt(dB);
    relax(pq, h.src, sigma + dA);
    relax(pq, h.dst, sigma + dB);
    Window w{hi, 0.0, h.len, dA, dB, sigma, 0.0};
    w.key = sigma + min_window_dist(w);
    if (!dominated(w) && !window_dominated(w)) {
      record_window(w);
      pq.push(w);
    }
  }

  // vertex-domination pruning: drop the window if a path through either edge
  // endpoint is at least as good for BOTH interval endpoints
  bool dominated(const Window& w) const {
    const HalfEdge& h = he_[w.he];
    double through_A0 = dist_[h.src] + w.b0;
    double through_A1 = dist_[h.src] + w.b1;
    double through_B0 = dist_[h.dst] + (h.len - w.b0);
    double through_B1 = dist_[h.dst] + (h.len - w.b1);
    double w0 = w.sigma + w.d0, w1 = w.sigma + w.d1;
    if (through_A0 <= w0 + kEps && through_A1 <= w1 + kEps) return true;
    if (through_B0 <= w0 + kEps && through_B1 <= w1 + kEps) return true;
    return false;
  }

  void spawn_pseudo(PQ& pq, int32_t v) {
    double sig = dist_[v];
    for (int32_t hi : out_[v]) {
      int32_t opp = he_[hi].next;
      push_source_windows(pq, opp, v, sig);
    }
  }

  void propagate(PQ& pq, const Window& w) {
    const HalfEdge& h = he_[w.he];
    if (h.twin < 0) return;  // boundary: nothing beyond
    if (dominated(w)) return;

    // unfold: place the twin's face in the plane. Coordinates: the shared
    // edge on the x-axis from 0..len, window source at y > 0 (computed from
    // b/d), the apex of the twin face at y < 0.
    double sx, sy;
    if (!source_pos(w, sx, sy)) return;

    const HalfEdge& t = he_[h.twin];             // dst->src direction
    const HalfEdge& e1 = he_[t.next];            // src -> apex
    const HalfEdge& e2 = he_[e1.next];           // apex -> dst
    double L = h.len;
    // apex position (x, -y): from lengths |src-apex| = e1.len (from x=0),
    // |dst-apex| = e2.len (from x=L). NOTE twin runs dst->src, so in OUR
    // coordinates (origin at h.src): t.src == h.dst at x=L, t.dst == h.src
    // at x=0; e1 = (h.dst -> apex) starts at x=L.
    double ax = (e1.len * e1.len - e2.len * e2.len + L * L) / (2.0 * L);
    // wait: e1 runs from t.dst? recompute below from explicit endpoints.
    // e1.src == t.dst == h.src (x=0); e1.dst == apex.
    // e2.src == apex; e2.dst == t.src == h.dst (x=L).
    ax = (e1.len * e1.len - e2.len * e2.len + L * L) / (2.0 * L);
    double ay2 = e1.len * e1.len - ax * ax;
    double ay = (ay2 <= 0.0) ? 0.0 : -std::sqrt(ay2);
    int32_t apex = e1.dst;

    // distance source -> apex through this window's unfolding
    double d_apex = std::hypot(sx - ax, sy - ay);

    // rays from source through interval endpoints (on the x-axis at b0/b1)
    // continue into y < 0. Intersect with left edge (x=0..apex) = e1 and
    // right edge (apex..x=L) = e2.
    // Parametrize target edges; compute ray/segment intersections.
    auto intersect = [&](double bx, double px, double py, double qx, double qy,
                         double& tt, double& ix, double& iy) -> bool {
      // ray: from (sx, sy) through (bx, 0); segment p->q (both y <= 0)
      double rx = bx - sx, ry = -sy;
      double ex = qx - px, ey = qy - py;
      double den = rx * ey - ry * ex;
      if (std::fabs(den) < kEps) return false;
      // solve s*(rx,ry) + (sx,sy) = (px,py) + t*(ex,ey)
      double ss = ((px - sx) * ey - (py - sy) * ex) / den;
      tt = (std::fabs(ex) > std::fabs(ey))
               ? ((sx + ss * rx) - px) / ex
               : ((sy + ss * ry) - py) / ey;
      if (ss < 1.0 - 1e-6) return false;  // must pass BEYOND the shared edge
      ix = sx + ss * rx;
      iy = sy + ss * ry;
      return tt >= -1e-9 && tt <= 1.0 + 1e-9;
    };

    // which side of the apex do the rays pass? Use the signed area test of
    // ray direction vs (apex - source).
    auto side_of_apex = [&](double bx) {
      // cross of (b-s) x (a-s): >0 means apex is to the left of the ray
      return (bx - sx) * (ay - sy) - (0.0 - sy) * (ax - sx);
    };
    double c0 = side_of_apex(w.b0);
    double c1 = side_of_apex(w.b1);

    // LEFT edge e1: from (0,0) to (ax,ay). RIGHT edge e2: (ax,ay) to (L,0).
    // A ray hits the left edge when the apex is to its left... determine via
    // intersection attempts (robust enough with the tt range checks).
    struct Hit { bool ok; double t, x, y; };
    auto hit_left = [&](double bx) {
      Hit r{false, 0, 0, 0};
      r.ok = intersect(bx, 0.0, 0.0, ax, ay, r.t, r.x, r.y);
      return r;
    };
    auto hit_right = [&](double bx) {
      Hit r{false, 0, 0, 0};
      r.ok = intersect(bx, ax, ay, L, 0.0, r.t, r.x, r.y);
      return r;
    };

    Hit l0 = hit_left(w.b0), l1 = hit_left(w.b1);
    Hit r0 = hit_right(w.b0), r1 = hit_right(w.b1);

    auto push = [&](int32_t edge_he, double t_lo, double t_hi,
                    double x_lo, double y_lo, double x_hi, double y_hi,
                    double edge_len) {
      if (t_hi - t_lo < 1e-12) return;
      Window nw;
      nw.he = edge_he;
      nw.b0 = std::max(0.0, t_lo * edge_len);
      nw.b1 = std::min(edge_len, t_hi * edge_len);
      if (nw.b1 - nw.b0 < 1e-12) return;
      nw.d0 = std::hypot(sx - x_lo, sy - y_lo);
      nw.d1 = std::hypot(sx - x_hi, sy - y_hi);
      nw.sigma = w.sigma;
      nw.key = nw.sigma + min_window_dist(nw);
      // endpoint relaxations
      const HalfEdge& eh = he_[edge_he];
      if (nw.b0 < 1e-9) relax(pq, eh.src, nw.sigma + nw.d0);
      if (nw.b1 > edge_len - 1e-9) relax(pq, eh.dst, nw.sigma + nw.d1);
      if (!dominated(nw) && !window_dominated(nw)) {
        record_window(nw);
        pq_push(pq, nw);
      }
    };

    // strict apex-straddle test: the apex must lie INSIDE the window's cone;
    // a loose OR over ray hits can relax the apex through an invalid straight
    // line, and pseudo-sources then propagate the underestimate
    bool through_apex = (c0 > kEps && c1 < -kEps) || (c0 < -kEps && c1 > kEps);
    if (through_apex) {
      relax(pq, apex, w.sigma + d_apex);
      if (l0.ok) push(t.next, l0.t, 1.0, l0.x, l0.y, ax, ay, e1.len);
      if (r1.ok) push(e1.next, 0.0, r1.t, ax, ay, r1.x, r1.y, e2.len);
    } else if (l0.ok && l1.ok) {
      push(t.next, l0.t, l1.t, l0.x, l0.y, l1.x, l1.y, e1.len);
    } else if (r0.ok && r1.ok) {
      push(e1.next, r0.t, r1.t, r0.x, r0.y, r1.x, r1.y, e2.len);
    } else if (l0.ok && r1.ok) {
      // rays hit different edges but the strict straddle test was inconclusive
      // (apex grazing a ray): split at the apex WITHOUT relaxing it directly —
      // the pushed windows' endpoint relaxations reach it through valid paths
      push(t.next, l0.t, 1.0, l0.x, l0.y, ax, ay, e1.len);
      push(e1.next, 0.0, r1.t, ax, ay, r1.x, r1.y, e2.len);
    }
    // remaining combinations are numerical slivers; dropping them can only
    // lose coverage (over-estimate), never produce an invalid short path
  }

  void pq_push(PQ& pq, const Window& w) { pq.push(w); }

  const double* pos_ = nullptr;
  int64_t V_ = 0;
  std::vector<HalfEdge> he_;
  std::vector<std::vector<int32_t>> out_;
  std::vector<double> angle_;
  std::vector<bool> boundary_;
  std::vector<double> dist_;
  int64_t processed_ = 0, budget_ = 0;

 public:
  // per-edge record of accepted windows (for pairwise domination pruning)
  struct EdgeWin {
    double b0, b1, sx, sy, sigma;
  };
  std::vector<std::vector<EdgeWin>> edge_wins_;

  // distance of an edge-window's source to edge parameter p
  static double win_f(const EdgeWin& e, double p) {
    return e.sigma + std::hypot(p - e.sx, e.sy);
  }

  // true if candidate w (with source (sx,sy), sigma) is dominated on its whole
  // interval by an existing window: conservative 3-point check (endpoints +
  // midpoint; distance functions are hyperbola branches, so this can very
  // rarely keep a dominated window but prunes the flat-domain blowup)
  bool window_dominated(const Window& w) {
    double sx, sy;
    if (!source_pos(w, sx, sy)) return false;
    auto& lst = edge_wins_[w.he];
    double m = 0.5 * (w.b0 + w.b1);
    double f0 = w.sigma + w.d0, f1 = w.sigma + w.d1;
    double fm = w.sigma + std::hypot(m - sx, sy);
    for (const auto& e : lst) {
      if (e.b0 > w.b0 + 1e-12 || e.b1 < w.b1 - 1e-12) continue;  // must cover
      if (win_f(e, w.b0) <= f0 + 1e-12 && win_f(e, w.b1) <= f1 + 1e-12
          && win_f(e, m) <= fm + 1e-12)
        return true;
    }
    return false;
  }

  void record_window(const Window& w) {
    double sx, sy;
    if (!source_pos(w, sx, sy)) return;
    auto& lst = edge_wins_[w.he];
    if (lst.size() < 256)  // bounded per-edge memory
      lst.push_back({w.b0, w.b1, sx, sy, w.sigma});
  }
};

}  // namespace ich

extern "C" {

// Exact geodesic distances source->all-vertices. Returns 1 when every source
// solved, 0 when some sources exceeded the window budget, -1 when the mesh is
// non-manifold/non-oriented (nothing computed). ok_out (len S, may be null)
// gets a per-source success flag so callers can patch ONLY failed rows with
// Steiner distances instead of discarding the exact result wholesale.
// out: (S, V) float32.
int32_t dnet_ich_geodesics(const double* verts, int64_t V, const int64_t* faces,
                           int64_t F, const int64_t* sources, int64_t S,
                           int64_t window_budget, float* out, int32_t* ok_out) {
  ich::Solver proto;
  if (!proto.build(verts, V, faces, F)) {
    if (ok_out) std::memset(ok_out, 0, S * sizeof(int32_t));
    return -1;
  }

  std::vector<int32_t> ok(S, 1);
  unsigned n_threads = std::max<unsigned>(1, std::thread::hardware_concurrency());
  auto worker = [&](int64_t begin, int64_t step) {
    ich::Solver solver;
    solver.build(verts, V, faces, F);
    for (int64_t s = begin; s < S; s += step) {
      if (!solver.solve(sources[s], out + s * V, window_budget)) ok[s] = 0;
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
  if (ok_out) std::memcpy(ok_out, ok.data(), S * sizeof(int32_t));
  for (int64_t s = 0; s < S; ++s)
    if (!ok[s]) return 0;
  return 1;
}

}  // extern "C"
