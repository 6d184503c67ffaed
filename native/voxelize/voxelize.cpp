// Mesh voxelization + point-in-mesh, C API for ctypes.
//
// From-scratch replacement for the reference's vendored Cython/C voxel
// tooling (`BlenderProc/utils/libvoxelize/voxelize.pyx` + tribox2.h and
// `BlenderProc/utils/libmesh/triangle_hash.pyx` + inside_mesh.py):
//   - separating-axis triangle/AABB overlap test (the standard 13-axis SAT);
//   - surface voxelization: rasterise each face into the unit-cube grid;
//   - point-in-mesh via +Z ray parity with a 2D (x, y) triangle bucket grid
//     (the "triangle hash" acceleration structure).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

namespace {

struct V3 {
  double x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline double dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

inline void axis_minmax(V3 axis, const V3* v, double& mn, double& mx) {
  mn = mx = dot(axis, v[0]);
  for (int i = 1; i < 3; ++i) {
    const double p = dot(axis, v[i]);
    mn = std::min(mn, p);
    mx = std::max(mx, p);
  }
}

bool tri_box_overlap_impl(V3 c, V3 h, V3 t0, V3 t1, V3 t2) {
  // Translate triangle into box frame.
  V3 v[3] = {sub(t0, c), sub(t1, c), sub(t2, c)};
  // 1) box axes
  for (int a = 0; a < 3; ++a) {
    const double p0 = (a == 0) ? v[0].x : (a == 1) ? v[0].y : v[0].z;
    const double p1 = (a == 0) ? v[1].x : (a == 1) ? v[1].y : v[1].z;
    const double p2 = (a == 0) ? v[2].x : (a == 1) ? v[2].y : v[2].z;
    const double mn = std::min({p0, p1, p2});
    const double mx = std::max({p0, p1, p2});
    const double e = (a == 0) ? h.x : (a == 1) ? h.y : h.z;
    if (mn > e || mx < -e) return false;
  }
  // 2) triangle normal plane
  const V3 e0 = sub(v[1], v[0]), e1 = sub(v[2], v[1]), e2 = sub(v[0], v[2]);
  const V3 n = cross(e0, e1);
  const double d = dot(n, v[0]);
  const double r = h.x * std::fabs(n.x) + h.y * std::fabs(n.y)
                 + h.z * std::fabs(n.z);
  if (std::fabs(d) > r) return false;
  // 3) nine cross-product axes
  const V3 edges[3] = {e0, e1, e2};
  const V3 units[3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int i = 0; i < 3; ++i) {
    for (int j = 0; j < 3; ++j) {
      const V3 axis = cross(units[j], edges[i]);
      double mn, mx;
      axis_minmax(axis, v, mn, mx);
      const double rad = h.x * std::fabs(axis.x) + h.y * std::fabs(axis.y)
                       + h.z * std::fabs(axis.z);
      if (mn > rad || mx < -rad) return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

int tri_box_overlap(const double* boxcenter, const double* boxhalf,
                    const double* tri /* 9 doubles */) {
  return tri_box_overlap_impl(
             {boxcenter[0], boxcenter[1], boxcenter[2]},
             {boxhalf[0], boxhalf[1], boxhalf[2]},
             {tri[0], tri[1], tri[2]}, {tri[3], tri[4], tri[5]},
             {tri[6], tri[7], tri[8]})
             ? 1
             : 0;
}

// Surface-voxelize faces (nf, 3, 3) given in UNIT-CUBE coords [0, 1]^3 into
// a res^3 occupancy grid (C-order, axes x, y, z).
void voxelize_mesh(const double* faces, int64_t nf, int64_t res,
                   uint8_t* grid_out) {
  const double cell = 1.0 / res;
  for (int64_t f = 0; f < nf; ++f) {
    const double* t = faces + f * 9;
    double mn[3], mx[3];
    for (int a = 0; a < 3; ++a) {
      mn[a] = std::min({t[a], t[3 + a], t[6 + a]});
      mx[a] = std::max({t[a], t[3 + a], t[6 + a]});
    }
    int64_t lo[3], hi[3];
    for (int a = 0; a < 3; ++a) {
      lo[a] = std::max<int64_t>(0, (int64_t)std::floor(mn[a] * res));
      hi[a] = std::min<int64_t>(res - 1, (int64_t)std::floor(mx[a] * res));
    }
    for (int64_t i = lo[0]; i <= hi[0]; ++i)
      for (int64_t j = lo[1]; j <= hi[1]; ++j)
        for (int64_t k = lo[2]; k <= hi[2]; ++k) {
          const int64_t idx = (i * res + j) * res + k;
          if (grid_out[idx]) continue;
          const double c[3] = {(i + 0.5) * cell, (j + 0.5) * cell,
                               (k + 0.5) * cell};
          const double h[3] = {cell / 2, cell / 2, cell / 2};
          if (tri_box_overlap(c, h, t)) grid_out[idx] = 1;
        }
  }
}

// Point-in-mesh by +Z ray parity with a 2D bucket grid over (x, y).
// verts: (nv, 3); faces: (nf, 3) int32 indices; points: (np, 3).
void points_in_mesh(const double* verts, int64_t nv, const int32_t* faces,
                    int64_t nf, const double* points, int64_t np,
                    int64_t grid_res, uint8_t* inside_out) {
  // Bounding box over x, y.
  double mnx = 1e300, mny = 1e300, mxx = -1e300, mxy = -1e300;
  for (int64_t i = 0; i < nv; ++i) {
    mnx = std::min(mnx, verts[i * 3]);
    mxx = std::max(mxx, verts[i * 3]);
    mny = std::min(mny, verts[i * 3 + 1]);
    mxy = std::max(mxy, verts[i * 3 + 1]);
  }
  const double sx = (mxx - mnx) > 0 ? grid_res / (mxx - mnx) : 1.0;
  const double sy = (mxy - mny) > 0 ? grid_res / (mxy - mny) : 1.0;
  auto cell_of = [&](double x, double y, int64_t& cx, int64_t& cy) {
    cx = std::min<int64_t>(grid_res - 1,
                           std::max<int64_t>(0, (int64_t)((x - mnx) * sx)));
    cy = std::min<int64_t>(grid_res - 1,
                           std::max<int64_t>(0, (int64_t)((y - mny) * sy)));
  };
  // Bucket triangles by the (x, y) cells their projection covers.
  std::vector<std::vector<int32_t>> buckets(grid_res * grid_res);
  for (int64_t f = 0; f < nf; ++f) {
    const double* a = verts + faces[f * 3] * 3;
    const double* b = verts + faces[f * 3 + 1] * 3;
    const double* c = verts + faces[f * 3 + 2] * 3;
    int64_t x0, y0, x1, y1, t;
    cell_of(std::min({a[0], b[0], c[0]}), std::min({a[1], b[1], c[1]}), x0, y0);
    cell_of(std::max({a[0], b[0], c[0]}), std::max({a[1], b[1], c[1]}), x1, y1);
    for (int64_t i = x0; i <= x1; ++i)
      for (int64_t j = y0; j <= y1; ++j)
        buckets[i * grid_res + j].push_back((int32_t)f);
    (void)t;
  }
  // Parity test per point.  The query is nudged by a tiny, fixed,
  // incommensurate offset so rays never pass exactly through shared
  // triangle edges (which would double-count and flip parity).
  const double ex = 1.3719e-7 * ((mxx - mnx) + 1e-12);
  const double ey = 0.7129e-7 * ((mxy - mny) + 1e-12);
  for (int64_t p = 0; p < np; ++p) {
    const double px = points[p * 3] + ex, py = points[p * 3 + 1] + ey,
                 pz = points[p * 3 + 2];
    int64_t cx, cy;
    cell_of(px, py, cx, cy);
    int crossings = 0;
    for (const int32_t f : buckets[cx * grid_res + cy]) {
      const double* a = verts + faces[f * 3] * 3;
      const double* b = verts + faces[f * 3 + 1] * 3;
      const double* c = verts + faces[f * 3 + 2] * 3;
      // Barycentric test in (x, y).
      const double d = (b[1] - c[1]) * (a[0] - c[0])
                     + (c[0] - b[0]) * (a[1] - c[1]);
      if (std::fabs(d) < 1e-15) continue;
      const double l1 = ((b[1] - c[1]) * (px - c[0])
                       + (c[0] - b[0]) * (py - c[1])) / d;
      const double l2 = ((c[1] - a[1]) * (px - c[0])
                       + (a[0] - c[0]) * (py - c[1])) / d;
      const double l3 = 1.0 - l1 - l2;
      if (l1 < 0 || l2 < 0 || l3 < 0) continue;
      const double z = l1 * a[2] + l2 * b[2] + l3 * c[2];
      if (z > pz) ++crossings;
    }
    inside_out[p] = (crossings & 1) ? 1 : 0;
  }
}

}  // extern "C"
