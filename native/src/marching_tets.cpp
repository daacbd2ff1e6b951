// Native marching-tetrahedra isosurface extraction.
//
// Same algorithm as isogs_slam_tpu/mesh/marching.py (Freudenthal 6-tet
// split, numerically oriented case table, edge-keyed vertex merge ->
// watertight, outward winding toward decreasing density): the C++ core
// replaces the vectorized-numpy host loop for large grids, playing the
// role of the reference's native meshing module
// (cpp/src/meshing/marching_cubes.cpp — whose triangle table was left a
// placeholder; this one is complete and verified against the Python
// implementation).
//
// C API (ctypes): mt_extract fills malloc'd buffers; mt_free releases.

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// corner c of the unit cube: (c&1, (c>>1)&1, (c>>2)&1)
const int kCorner[8][3] = {{0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {1, 1, 0},
                           {0, 0, 1}, {1, 0, 1}, {0, 1, 1}, {1, 1, 1}};
// positively oriented Freudenthal tets (match marching.py _TETS)
const int kTets[6][4] = {{0, 1, 3, 7}, {0, 5, 1, 7}, {0, 3, 2, 7},
                         {0, 2, 6, 7}, {0, 4, 5, 7}, {0, 6, 4, 7}};
// tet edges (match marching.py _TET_EDGES)
const int kTetEdges[6][2] = {{0, 1}, {0, 2}, {0, 3},
                             {1, 2}, {1, 3}, {2, 3}};

struct CaseTable {
  // tris[code][t][e]: up to 2 triangles of 3 tet-edge ids; count[code]
  int tris[16][2][3];
  int count[16];
};

int edge_id(int a, int b) {
  if (a > b) std::swap(a, b);
  static const int lut[4][4] = {{-1, 0, 1, 2},
                                {0, -1, 3, 4},
                                {1, 3, -1, 5},
                                {2, 4, 5, -1}};
  return lut[a][b];
}

// Build the oriented case table numerically on the canonical positive tet,
// exactly like marching.py::_tet_triangles.
CaseTable build_case_table() {
  CaseTable T{};
  const double V[4][3] = {{0, 0, 0}, {1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  for (int code = 1; code < 15; ++code) {
    int inside[4], outside[4], ni = 0, no = 0;
    for (int i = 0; i < 4; ++i) {
      if (code & (1 << i)) inside[ni++] = i; else outside[no++] = i;
    }
    int raw[2][3];
    int cnt = 0;
    if (ni == 1) {
      int a = inside[0];
      raw[0][0] = edge_id(a, outside[0]);
      raw[0][1] = edge_id(a, outside[1]);
      raw[0][2] = edge_id(a, outside[2]);
      cnt = 1;
    } else if (ni == 3) {
      int a = outside[0];
      raw[0][0] = edge_id(a, inside[0]);
      raw[0][1] = edge_id(a, inside[2]);
      raw[0][2] = edge_id(a, inside[1]);
      cnt = 1;
    } else {  // ni == 2
      int a = inside[0], b = inside[1], c = outside[0], d = outside[1];
      raw[0][0] = edge_id(a, c); raw[0][1] = edge_id(b, c);
      raw[0][2] = edge_id(b, d);
      raw[1][0] = edge_id(a, c); raw[1][1] = edge_id(b, d);
      raw[1][2] = edge_id(a, d);
      cnt = 2;
    }
    // numeric orientation: normal must point inside -> outside
    double vals[4];
    for (int i = 0; i < 4; ++i) vals[i] = (code & (1 << i)) ? 1.0 : 0.0;
    double pts[6][3];
    for (int e = 0; e < 6; ++e) {
      int a = kTetEdges[e][0], b = kTetEdges[e][1];
      if ((vals[a] >= 0.5) != (vals[b] >= 0.5)) {
        double t = (0.5 - vals[a]) / (vals[b] - vals[a]);
        for (int k = 0; k < 3; ++k)
          pts[e][k] = V[a][k] + t * (V[b][k] - V[a][k]);
      }
    }
    double cin[3] = {0, 0, 0}, cout[3] = {0, 0, 0};
    for (int i = 0; i < ni; ++i)
      for (int k = 0; k < 3; ++k) cin[k] += V[inside[i]][k] / ni;
    for (int i = 0; i < no; ++i)
      for (int k = 0; k < 3; ++k) cout[k] += V[outside[i]][k] / no;
    double dir[3] = {cout[0] - cin[0], cout[1] - cin[1], cout[2] - cin[2]};
    T.count[code] = cnt;
    for (int t = 0; t < cnt; ++t) {
      const double *p0 = pts[raw[t][0]], *p1 = pts[raw[t][1]],
                   *p2 = pts[raw[t][2]];
      double u[3] = {p1[0] - p0[0], p1[1] - p0[1], p1[2] - p0[2]};
      double w[3] = {p2[0] - p0[0], p2[1] - p0[1], p2[2] - p0[2]};
      double n[3] = {u[1] * w[2] - u[2] * w[1], u[2] * w[0] - u[0] * w[2],
                     u[0] * w[1] - u[1] * w[0]};
      double dp = n[0] * dir[0] + n[1] * dir[1] + n[2] * dir[2];
      if (dp > 0) {
        T.tris[code][t][0] = raw[t][0];
        T.tris[code][t][1] = raw[t][1];
        T.tris[code][t][2] = raw[t][2];
      } else {
        T.tris[code][t][0] = raw[t][0];
        T.tris[code][t][1] = raw[t][2];
        T.tris[code][t][2] = raw[t][1];
      }
    }
  }
  return T;
}

const CaseTable kTable = build_case_table();

}  // namespace

extern "C" {

// density: [nx*ny*nz] C-order (z fastest). Outputs malloc'd; caller frees
// with mt_free. Returns 0 on success.
int mt_extract(const float* density, int64_t nx, int64_t ny, int64_t nz,
               float level, const double* spacing, const double* origin,
               float** out_verts, int64_t* out_nverts,
               int32_t** out_faces, int64_t* out_nfaces) {
  *out_verts = nullptr; *out_faces = nullptr;
  *out_nverts = 0; *out_nfaces = 0;
  if (nx < 2 || ny < 2 || nz < 2) return 0;

  auto vid = [&](int64_t x, int64_t y, int64_t z) {
    return (x * ny + y) * nz + z;
  };
  auto val = [&](int64_t x, int64_t y, int64_t z) {
    return density[(x * ny + y) * nz + z];
  };

  std::vector<double> verts;          // interleaved xyz (grid coords)
  std::vector<int64_t> vert_of_edge_key;  // parallel to verts/3
  std::vector<int32_t> faces;
  std::unordered_map<int64_t, int32_t> edge_to_vert;
  edge_to_vert.reserve(1 << 16);
  const int64_t NV = nx * ny * nz;

  double corner_val[8];
  int64_t corner_id[8];
  double corner_pos[8][3];

  for (int64_t cx = 0; cx + 1 < nx; ++cx)
    for (int64_t cy = 0; cy + 1 < ny; ++cy)
      for (int64_t cz = 0; cz + 1 < nz; ++cz) {
        bool any_in = false, all_in = true;
        for (int c = 0; c < 8; ++c) {
          int64_t x = cx + kCorner[c][0], y = cy + kCorner[c][1],
                  z = cz + kCorner[c][2];
          corner_val[c] = val(x, y, z);
          corner_id[c] = vid(x, y, z);
          corner_pos[c][0] = double(x);
          corner_pos[c][1] = double(y);
          corner_pos[c][2] = double(z);
          bool in = corner_val[c] >= level;
          any_in |= in; all_in &= in;
        }
        if (!any_in || all_in) continue;

        for (int t = 0; t < 6; ++t) {
          const int* tet = kTets[t];
          int code = 0;
          for (int i = 0; i < 4; ++i)
            if (corner_val[tet[i]] >= level) code |= 1 << i;
          if (code == 0 || code == 15) continue;
          for (int tri = 0; tri < kTable.count[code]; ++tri) {
            int32_t tri_v[3];
            for (int e = 0; e < 3; ++e) {
              int eid = kTable.tris[code][tri][e];
              int a = tet[kTetEdges[eid][0]], b = tet[kTetEdges[eid][1]];
              int64_t ga = corner_id[a], gb = corner_id[b];
              int64_t lo = ga < gb ? ga : gb, hi = ga < gb ? gb : ga;
              int64_t key = lo * NV + hi;
              auto it = edge_to_vert.find(key);
              if (it != edge_to_vert.end()) {
                tri_v[e] = it->second;
              } else {
                double va = corner_val[a], vb = corner_val[b];
                double tt = (vb != va) ? (level - va) / (vb - va) : 0.0;
                if (tt < 0) tt = 0; if (tt > 1) tt = 1;
                double p[3];
                for (int k = 0; k < 3; ++k)
                  p[k] = corner_pos[a][k]
                       + tt * (corner_pos[b][k] - corner_pos[a][k]);
                int32_t nvid = int32_t(verts.size() / 3);
                verts.push_back(p[0]);
                verts.push_back(p[1]);
                verts.push_back(p[2]);
                edge_to_vert.emplace(key, nvid);
                tri_v[e] = nvid;
              }
            }
            if (tri_v[0] != tri_v[1] && tri_v[1] != tri_v[2]
                && tri_v[0] != tri_v[2]) {
              faces.push_back(tri_v[0]);
              faces.push_back(tri_v[1]);
              faces.push_back(tri_v[2]);
            }
          }
        }
      }

  int64_t nv = int64_t(verts.size() / 3);
  int64_t nf = int64_t(faces.size() / 3);
  float* vbuf = (float*)std::malloc(sizeof(float) * verts.size());
  int32_t* fbuf = (int32_t*)std::malloc(sizeof(int32_t) * faces.size());
  if ((!vbuf && nv) || (!fbuf && nf)) {
    std::free(vbuf); std::free(fbuf);
    return 1;
  }
  for (int64_t i = 0; i < nv; ++i)
    for (int k = 0; k < 3; ++k)
      vbuf[i * 3 + k] = float(origin[k] + verts[i * 3 + k] * spacing[k]);
  std::memcpy(fbuf, faces.data(), sizeof(int32_t) * faces.size());
  *out_verts = vbuf; *out_nverts = nv;
  *out_faces = fbuf; *out_nfaces = nf;
  return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
