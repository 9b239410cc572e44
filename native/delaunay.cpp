// Incremental 2-D Delaunay triangulation (Bowyer-Watson) for the mesher.
//
// Native-runtime analog of the reference's cv::Subdiv2D Delaunay in
// Mesher::createMesh2D (reference: cpp/src/data/mesh/mesher.cpp:134-165).
// The TPU build keeps mesh *topology* on the host (data-dependent,
// pointer-chasing work XLA can't help with) and runs the geometry gates /
// ZNCC / raycast as device kernels; this file is the host half, replacing
// the scipy.spatial.Delaunay fallback with a dependency-free C++ kernel.
//
// Landmark counts are small (<= a few hundred per keyframe), so the simple
// O(n^2) incremental scheme is faster than qhull's generality. Exact-ish
// predicates: all geometry in double, incircle via the standard 3x3
// determinant with a relative epsilon.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct Tri {
  int a, b, c;     // point indices (CCW)
  bool alive;
};

struct Edge {
  int u, v;
  bool operator==(const Edge& o) const { return u == o.u && v == o.v; }
};

inline double orient2d(const double* p, const double* q, const double* r) {
  return (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0]);
}

// > 0 iff d strictly inside the circumcircle of CCW triangle (a, b, c)
inline double incircle(const double* a, const double* b, const double* c,
                       const double* d) {
  const double adx = a[0] - d[0], ady = a[1] - d[1];
  const double bdx = b[0] - d[0], bdy = b[1] - d[1];
  const double cdx = c[0] - d[0], cdy = c[1] - d[1];
  const double ad2 = adx * adx + ady * ady;
  const double bd2 = bdx * bdx + bdy * bdy;
  const double cd2 = cdx * cdx + cdy * cdy;
  return adx * (bdy * cd2 - cdy * bd2) - ady * (bdx * cd2 - cdx * bd2) +
         ad2 * (bdx * cdy - cdx * bdy);
}

}  // namespace

extern "C" {

// xy: n interleaved (x, y) float32 pairs. tri_out: capacity 3*max_tri int32.
// Returns the number of triangles written (>= 0), or -1 if max_tri was too
// small. Duplicate / collinear inputs yield fewer (possibly zero) triangles.
int sadvio_delaunay(const float* xy, int n, int32_t* tri_out, int max_tri) {
  if (n < 3) return 0;

  std::vector<double> pts(2 * (n + 3));
  double xmin = 1e300, xmax = -1e300, ymin = 1e300, ymax = -1e300;
  for (int i = 0; i < n; ++i) {
    pts[2 * i] = xy[2 * i];
    pts[2 * i + 1] = xy[2 * i + 1];
    xmin = std::min(xmin, pts[2 * i]);
    xmax = std::max(xmax, pts[2 * i]);
    ymin = std::min(ymin, pts[2 * i + 1]);
    ymax = std::max(ymax, pts[2 * i + 1]);
  }
  const double dx = xmax - xmin, dy = ymax - ymin;
  const double dmax = std::max(std::max(dx, dy), 1.0);
  const double cx = 0.5 * (xmin + xmax), cy = 0.5 * (ymin + ymax);
  // super-triangle comfortably containing every point
  const int s0 = n, s1 = n + 1, s2 = n + 2;
  pts[2 * s0] = cx - 20.0 * dmax; pts[2 * s0 + 1] = cy - 10.0 * dmax;
  pts[2 * s1] = cx + 20.0 * dmax; pts[2 * s1 + 1] = cy - 10.0 * dmax;
  pts[2 * s2] = cx;               pts[2 * s2 + 1] = cy + 20.0 * dmax;

  std::vector<Tri> tris;
  tris.reserve(4 * static_cast<size_t>(n));
  tris.push_back({s0, s1, s2, true});

  std::vector<int> bad;
  std::vector<Edge> boundary;

  for (int p = 0; p < n; ++p) {
    const double* pp = &pts[2 * p];
    bad.clear();
    for (int t = 0; t < static_cast<int>(tris.size()); ++t) {
      if (!tris[t].alive) continue;
      const double* a = &pts[2 * tris[t].a];
      const double* b = &pts[2 * tris[t].b];
      const double* c = &pts[2 * tris[t].c];
      if (incircle(a, b, c, pp) > 0.0) bad.push_back(t);
    }
    if (bad.empty()) continue;  // duplicate of an existing vertex

    // boundary of the cavity = edges appearing in exactly one bad triangle
    boundary.clear();
    for (int t : bad) {
      const int e[3][2] = {{tris[t].a, tris[t].b},
                           {tris[t].b, tris[t].c},
                           {tris[t].c, tris[t].a}};
      for (auto& ed : e) {
        Edge rev{ed[1], ed[0]};
        bool shared = false;
        for (size_t k = 0; k < boundary.size(); ++k) {
          if (boundary[k] == rev) {
            boundary.erase(boundary.begin() + k);
            shared = true;
            break;
          }
        }
        if (!shared) boundary.push_back({ed[0], ed[1]});
      }
      tris[t].alive = false;
    }
    for (const Edge& ed : boundary) {
      // cavity boundary edges keep the CCW orientation of their dead
      // triangle, so (u, v, p) is CCW; guard degenerate slivers anyway
      if (orient2d(&pts[2 * ed.u], &pts[2 * ed.v], pp) <= 0.0) continue;
      tris.push_back({ed.u, ed.v, p, true});
    }
  }

  int m = 0;
  for (const Tri& t : tris) {
    if (!t.alive) continue;
    if (t.a >= n || t.b >= n || t.c >= n) continue;  // touches super-tri
    if (m >= max_tri) return -1;
    tri_out[3 * m] = t.a;
    tri_out[3 * m + 1] = t.b;
    tri_out[3 * m + 2] = t.c;
    ++m;
  }
  return m;
}

}  // extern "C"
