// Native isosurface extraction for TSDF volumes.
//
// TPU-native-framework counterpart of the reference's `marching_cubes` C++
// extension (used via util/visualization.py:35-38 for all mesh dumps). The
// extraction runs on host over numpy grids; implementation is marching
// tetrahedra (each cell split into 6 tets), which produces the same
// isosurface as classic marching cubes without the 256-case lookup tables,
// with shared vertices deduplicated on cell edges.
//
// C ABI for ctypes binding (no pybind11 in this image).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

// key identifying an interpolated vertex by its (sorted) grid-point pair
static inline uint64_t edge_key(uint32_t a, uint32_t b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(a) << 32) | b;
}

struct MeshBuilder {
  std::vector<float> verts;  // xyz triplets
  std::vector<int32_t> tris; // index triplets
  std::unordered_map<uint64_t, int32_t> edge_to_vertex;

  int32_t vertex_on_edge(uint32_t ga, uint32_t gb, const V3 &pa, const V3 &pb,
                         float va, float vb, float level) {
    const uint64_t key = edge_key(ga, gb);
    auto it = edge_to_vertex.find(key);
    if (it != edge_to_vertex.end()) return it->second;
    float t = (level - va) / (vb - va);
    if (t < 0.f) t = 0.f;
    if (t > 1.f) t = 1.f;
    const int32_t idx = static_cast<int32_t>(verts.size() / 3);
    verts.push_back(pa.x + t * (pb.x - pa.x));
    verts.push_back(pa.y + t * (pb.y - pa.y));
    verts.push_back(pa.z + t * (pb.z - pa.z));
    edge_to_vertex.emplace(key, idx);
    return idx;
  }

  void add_tri(int32_t a, int32_t b, int32_t c) {
    if (a == b || b == c || a == c) return;
    tris.push_back(a);
    tris.push_back(b);
    tris.push_back(c);
  }
};

// The 6-tetrahedron decomposition of a cell (corner indices 0..7 with
// corner c = (x + (c&1), y + ((c>>1)&1), z + ((c>>2)&1)) ). All six tets
// share the main diagonal 0-7, guaranteeing crack-free faces between cells.
static const int TETS[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

// triangulate one tetrahedron against the level set; corners inside when
// value < level (the mesh bounds the region where the TSDF is below level).
static void do_tet(MeshBuilder &mb, const uint32_t g[4], const V3 p[4],
                   const float v[4], float level) {
  int inside_mask = 0;
  for (int i = 0; i < 4; ++i)
    if (v[i] < level) inside_mask |= (1 << i);
  if (inside_mask == 0 || inside_mask == 15) return;

  // collect the 3 or 4 crossing edges in a consistent order per case.
  // cases with one corner isolated (inside or outside) give one triangle;
  // two-and-two gives a quad (two triangles).
  auto vert = [&](int a, int b) {
    return mb.vertex_on_edge(g[a], g[b], p[a], p[b], v[a], v[b], level);
  };
  // orientation: triangles wound counter-clockwise seen from the inside
  // corner(s), flipped below where needed so normals point outward
  // (towards v >= level).
  switch (inside_mask) {
    case 1:  mb.add_tri(vert(0, 1), vert(0, 2), vert(0, 3)); break;
    case 14: mb.add_tri(vert(0, 1), vert(0, 3), vert(0, 2)); break;
    case 2:  mb.add_tri(vert(1, 0), vert(1, 3), vert(1, 2)); break;
    case 13: mb.add_tri(vert(1, 0), vert(1, 2), vert(1, 3)); break;
    case 4:  mb.add_tri(vert(2, 0), vert(2, 1), vert(2, 3)); break;
    case 11: mb.add_tri(vert(2, 0), vert(2, 3), vert(2, 1)); break;
    case 8:  mb.add_tri(vert(3, 0), vert(3, 2), vert(3, 1)); break;
    case 7:  mb.add_tri(vert(3, 0), vert(3, 1), vert(3, 2)); break;
    case 3: {  // 0,1 inside
      int32_t a = vert(0, 2), b = vert(0, 3), c = vert(1, 3), d = vert(1, 2);
      mb.add_tri(a, b, c); mb.add_tri(a, c, d); break;
    }
    case 12: { // 2,3 inside (complement of 3)
      int32_t a = vert(0, 2), b = vert(0, 3), c = vert(1, 3), d = vert(1, 2);
      mb.add_tri(a, c, b); mb.add_tri(a, d, c); break;
    }
    case 5: {  // 0,2 inside
      int32_t a = vert(0, 1), b = vert(0, 3), c = vert(2, 3), d = vert(2, 1);
      mb.add_tri(a, c, b); mb.add_tri(a, d, c); break;
    }
    case 10: { // 1,3 inside (complement of 5)
      int32_t a = vert(0, 1), b = vert(0, 3), c = vert(2, 3), d = vert(2, 1);
      mb.add_tri(a, b, c); mb.add_tri(a, c, d); break;
    }
    case 6: {  // 1,2 inside
      int32_t a = vert(1, 0), b = vert(1, 3), c = vert(2, 3), d = vert(2, 0);
      mb.add_tri(a, b, c); mb.add_tri(a, c, d); break;
    }
    case 9: {  // 0,3 inside (complement of 6)
      int32_t a = vert(1, 0), b = vert(1, 3), c = vert(2, 3), d = vert(2, 0);
      mb.add_tri(a, c, b); mb.add_tri(a, d, c); break;
    }
    default: break;
  }
}

}  // namespace

extern "C" {

// Extract the level-set surface of a (nx, ny, nz) C-order float grid.
// Returns 0 on success; caller must free with mc_free. Vertex coordinates
// are in voxel units (grid index space), matching the reference extension's
// convention so downstream OBJ/metric code agrees.
int mc_extract(const float *sdf, int nx, int ny, int nz, float level,
               float **out_verts, int *n_verts, int32_t **out_tris, int *n_tris) {
  if (!sdf || nx < 2 || ny < 2 || nz < 2) return 1;
  MeshBuilder mb;
  const int64_t sy = nz;        // stride of y in elements
  const int64_t sx = (int64_t)ny * nz;
  auto gid = [&](int x, int y, int z) -> uint32_t {
    return static_cast<uint32_t>(x * sx + y * sy + z);
  };
  for (int x = 0; x < nx - 1; ++x) {
    for (int y = 0; y < ny - 1; ++y) {
      for (int z = 0; z < nz - 1; ++z) {
        float cv[8];
        V3 cp[8];
        uint32_t cg[8];
        bool all_in = true, all_out = true;
        for (int c = 0; c < 8; ++c) {
          const int cx = x + (c & 1), cy = y + ((c >> 1) & 1), cz = z + ((c >> 2) & 1);
          cg[c] = gid(cx, cy, cz);
          cv[c] = sdf[cg[c]];
          cp[c] = V3{(float)cx, (float)cy, (float)cz};
          if (cv[c] < level) all_out = false; else all_in = false;
        }
        if (all_in || all_out) continue;
        for (int t = 0; t < 6; ++t) {
          uint32_t g[4];
          V3 p[4];
          float v[4];
          for (int i = 0; i < 4; ++i) {
            const int c = TETS[t][i];
            g[i] = cg[c]; p[i] = cp[c]; v[i] = cv[c];
          }
          do_tet(mb, g, p, v, level);
        }
      }
    }
  }
  *n_verts = static_cast<int>(mb.verts.size() / 3);
  *n_tris = static_cast<int>(mb.tris.size() / 3);
  *out_verts = static_cast<float *>(std::malloc(mb.verts.size() * sizeof(float)));
  *out_tris = static_cast<int32_t *>(std::malloc(mb.tris.size() * sizeof(int32_t)));
  if ((!*out_verts && !mb.verts.empty()) || (!*out_tris && !mb.tris.empty())) return 2;
  if (!mb.verts.empty()) std::memcpy(*out_verts, mb.verts.data(), mb.verts.size() * sizeof(float));
  if (!mb.tris.empty()) std::memcpy(*out_tris, mb.tris.data(), mb.tris.size() * sizeof(int32_t));
  return 0;
}

void mc_free(float *verts, int32_t *tris) {
  std::free(verts);
  std::free(tris);
}

}  // extern "C"
