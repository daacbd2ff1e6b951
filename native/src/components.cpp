// Largest-connected-component extraction for triangle meshes.
//
// Native replacement for the scipy-csgraph path in
// isogs_slam_tpu/mesh/marching.py::largest_component — the reference
// cleans meshes with trimesh.split + largest
// (python_ordinary/scripts/extract_mesh_fast.py:445-466). At marching-
// cubes scale (10^7 faces) building a sparse adjacency matrix on the
// Python side dominated mesh postprocessing (~1 min); a flat union-find
// over face edges does the same work in a few hundred ms.
//
// C ABI (consumed by isogs_slam_tpu/native_ext.py via ctypes):
//   mesh_largest_component(faces, n_faces, n_verts,
//                          face_keep, vert_new_index) -> n_kept_verts
//   faces          int32 [n_faces*3]
//   face_keep      out int32 [n_faces]   1 = face survives
//   vert_new_index out int32 [n_verts]   compacted index, -1 = dropped
// Returns the number of kept vertices (new vertex count), -1 on error.

#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
    std::vector<int32_t> parent;
    std::vector<int32_t> size;

    explicit UnionFind(int64_t n) : parent(n), size(n, 1) {
        for (int64_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
    }

    int32_t find(int32_t x) {
        // path halving: single pass, no recursion, cache friendly
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    }

    void unite(int32_t a, int32_t b) {
        a = find(a);
        b = find(b);
        if (a == b) return;
        if (size[a] < size[b]) { int32_t t = a; a = b; b = t; }
        parent[b] = a;
        size[a] += size[b];
    }
};

}  // namespace

extern "C" int64_t mesh_largest_component(const int32_t* faces,
                                          int64_t n_faces, int64_t n_verts,
                                          int32_t* face_keep,
                                          int32_t* vert_new_index) {
    if (n_verts <= 0 || n_faces < 0) return -1;
    UnionFind uf(n_verts);
    for (int64_t f = 0; f < n_faces; ++f) {
        const int32_t a = faces[3 * f + 0];
        const int32_t b = faces[3 * f + 1];
        const int32_t c = faces[3 * f + 2];
        if (a < 0 || b < 0 || c < 0 || a >= n_verts || b >= n_verts ||
            c >= n_verts)
            return -1;
        // two unions connect all three vertices
        uf.unite(a, b);
        uf.unite(b, c);
    }

    // largest component root (by vertex count, matching trimesh.split's
    // "largest" selection on vertex-connected pieces)
    int32_t best_root = -1;
    int32_t best_size = -1;
    for (int64_t v = 0; v < n_verts; ++v) {
        const int32_t r = uf.find(static_cast<int32_t>(v));
        if (r == static_cast<int32_t>(v) && uf.size[r] > best_size) {
            best_size = uf.size[r];
            best_root = r;
        }
    }

    // faces survive iff their vertices are in the largest component;
    // vertices survive iff referenced by a surviving face
    std::vector<uint8_t> used(n_verts, 0);
    for (int64_t f = 0; f < n_faces; ++f) {
        const int32_t a = faces[3 * f + 0];
        const bool keep = uf.find(a) == best_root;
        face_keep[f] = keep ? 1 : 0;
        if (keep) {
            used[a] = 1;
            used[faces[3 * f + 1]] = 1;
            used[faces[3 * f + 2]] = 1;
        }
    }
    int64_t n_kept = 0;
    for (int64_t v = 0; v < n_verts; ++v)
        vert_new_index[v] =
            used[v] ? static_cast<int32_t>(n_kept++) : -1;
    return n_kept;
}
