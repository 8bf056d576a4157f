// marching_tets.cpp — first-party isosurface extraction for shapeformer_tpu.
//
// TPU-native replacement for the reference's PyMCubes dependency
// (xgutils/geoutil.py:5,199): occupancy grids are evaluated on-device, then
// meshed here on host.  Uses marching tetrahedra (6-tet cube decomposition)
// instead of table-driven marching cubes: tiny case logic, no lookup tables,
// watertight within each cube, with edge-keyed vertex deduplication.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmarching_tets.so marching_tets.cpp
// ABI: marching_tets() fills malloc'd buffers; caller frees with mt_free().

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// The 13 canonical (lexicographically positive) grid-point offsets an edge of
// the 6-tet cube decomposition can have: 3 axis edges, 6 face diagonals,
// 4 main diagonals.  Since the sweep goes slab by slab along i and every edge's
// canonical origin lies in slice i or i+1, vertex dedup uses two ROLLING
// per-slice id planes of ny*nz*13 int32 (~1.7 MB at 128^2 — cache resident)
// instead of a whole-grid table or hash map: the random-access dedup lookups
// that dominate the profile stay in L2.
struct Mesher {
    const float* grid;
    int64_t nx, ny, nz;
    float iso;
    std::vector<float> verts;         // x,y,z triples in grid-index coords
    std::vector<int64_t> faces;       // index triples
    std::vector<int32_t> id_plane[2]; // slice i / slice i+1 edge-vertex ids
    int32_t* cur = nullptr;           // ids whose canonical origin is slice i
    int32_t* nxt = nullptr;           // ... slice i+1
    int64_t i_base = 0;               // current slab
    int dir_map[27];

    void init_ids() {
        for (int i = 0; i < 27; ++i) dir_map[i] = -1;
        int next = 0;
        for (int di = -1; di <= 1; ++di)
            for (int dj = -1; dj <= 1; ++dj)
                for (int dk = -1; dk <= 1; ++dk) {
                    if (di == 0 && dj == 0 && dk == 0) continue;
                    bool pos = di > 0 || (di == 0 && (dj > 0 || (dj == 0 && dk > 0)));
                    if (pos)
                        dir_map[(di + 1) * 9 + (dj + 1) * 3 + (dk + 1)] = next++;
                }
        size_t plane = (size_t)ny * nz * 13;
        for (auto& p : id_plane) {
            if (p.size() == plane)
                std::fill(p.begin(), p.end(), -1);
            else
                p.assign(plane, -1);
        }
        cur = id_plane[0].data();
        nxt = id_plane[1].data();
        verts.clear();
        faces.clear();
    }

    void advance_slab() {          // slab i done -> slice i+1 ids become 'cur'
        std::swap(cur, nxt);
        std::fill_n(nxt, (size_t)ny * nz * 13, -1);
    }

    inline float at(int64_t i, int64_t j, int64_t k) const {
        return grid[(i * ny + j) * nz + k];
    }

    // Interpolated vertex on the edge between grid points a and b (deduped).
    int64_t edge_point(int64_t ai, int64_t aj, int64_t ak,
                       int64_t bi, int64_t bj, int64_t bk) {
        // canonical (lexicographically positive) direction => origin a
        if (ai > bi || (ai == bi && (aj > bj || (aj == bj && ak > bk)))) {
            std::swap(ai, bi); std::swap(aj, bj); std::swap(ak, bk);
        }
        int d = dir_map[(int)((bi - ai + 1) * 9 + (bj - aj + 1) * 3
                              + (bk - ak + 1))];
        int32_t* plane = (ai == i_base) ? cur : nxt;
        size_t slot = ((size_t)aj * nz + (size_t)ak) * 13 + (size_t)d;
        int32_t cached = plane[slot];
        if (cached >= 0) return cached;
        float va = at(ai, aj, ak), vb = at(bi, bj, bk);
        float denom = vb - va;
        float t = (denom == 0.0f) ? 0.5f : (iso - va) / denom;
        if (t < 0.0f) t = 0.0f;
        if (t > 1.0f) t = 1.0f;
        int64_t id = (int64_t)(verts.size() / 3);
        verts.push_back((float)ai + t * (float)(bi - ai));
        verts.push_back((float)aj + t * (float)(bj - aj));
        verts.push_back((float)ak + t * (float)(bk - ak));
        plane[slot] = (int32_t)id;
        return id;
    }

    // Emit triangle (a, b, c), swapping b/c if needed so the geometric
    // normal points along d = inside->outside: the 6-tet decomposition
    // contains tets of BOTH parities, so case-order winding alone leaves
    // ~half the faces inverted (CCW-from-outside is the contract,
    // surface_nets.cpp:11-12).
    void tri(int64_t a, int64_t b, int64_t c,
             float dx, float dy, float dz) {
        if (a == b || b == c || a == c) return;  // degenerate (t clamped)
        const float* A = &verts[3 * (size_t)a];
        const float* B = &verts[3 * (size_t)b];
        const float* C = &verts[3 * (size_t)c];
        float ux = B[0] - A[0], uy = B[1] - A[1], uz = B[2] - A[2];
        float vx = C[0] - A[0], vy = C[1] - A[1], vz = C[2] - A[2];
        float nxn = uy * vz - uz * vy;
        float nyn = uz * vx - ux * vz;
        float nzn = ux * vy - uy * vx;
        if (nxn * dx + nyn * dy + nzn * dz < 0.0f) std::swap(b, c);
        faces.push_back(a); faces.push_back(b); faces.push_back(c);
    }

    // One tetrahedron given 4 grid-point index triples and the 4 already-
    // fetched grid values (avoids re-reading 4 corners per tet x 6 tets).
    void tet(const int64_t p[4][3], const float v[4]) {
        int inside = 0, code = 0;
        for (int i = 0; i < 4; ++i)
            if (v[i] > iso) { code |= 1 << i; ++inside; }
        if (inside == 0 || inside == 4) return;
        int in_idx[4], out_idx[4], ni = 0, no = 0;
        for (int i = 0; i < 4; ++i) {
            if (code & (1 << i)) in_idx[ni++] = i; else out_idx[no++] = i;
        }
        auto ep = [&](int a, int b) {
            return edge_point(p[a][0], p[a][1], p[a][2],
                              p[b][0], p[b][1], p[b][2]);
        };
        // inside->outside direction for orientation (grid coords)
        float ix = 0, iy = 0, iz = 0, ox = 0, oy = 0, oz = 0;
        for (int i = 0; i < ni; ++i) {
            ix += p[in_idx[i]][0]; iy += p[in_idx[i]][1]; iz += p[in_idx[i]][2];
        }
        for (int i = 0; i < no; ++i) {
            ox += p[out_idx[i]][0]; oy += p[out_idx[i]][1]; oz += p[out_idx[i]][2];
        }
        float dx = ox / no - ix / ni, dy = oy / no - iy / ni,
              dz = oz / no - iz / ni;
        if (inside == 1) {
            int a = in_idx[0];
            tri(ep(a, out_idx[0]), ep(a, out_idx[1]), ep(a, out_idx[2]),
                dx, dy, dz);
        } else if (inside == 3) {
            int a = out_idx[0];
            tri(ep(a, in_idx[0]), ep(a, in_idx[2]), ep(a, in_idx[1]),
                dx, dy, dz);
        } else {  // 2 in, 2 out -> quad -> two triangles
            int a = in_idx[0], b = in_idx[1], c = out_idx[0], d = out_idx[1];
            int64_t ac = ep(a, c), ad = ep(a, d), bd = ep(b, d), bc = ep(b, c);
            tri(ac, ad, bd, dx, dy, dz);
            tri(ac, bd, bc, dx, dy, dz);
        }
    }

    void run() {
        init_ids();
        // 6-tet decomposition of each cube around the main diagonal c0-c6.
        static const int tets[6][4] = {
            {0, 5, 1, 6}, {0, 1, 2, 6}, {0, 2, 3, 6},
            {0, 3, 7, 6}, {0, 7, 4, 6}, {0, 4, 5, 6}};
        // cube corner offsets (i, j, k)
        static const int corner[8][3] = {
            {0, 0, 0}, {1, 0, 0}, {1, 1, 0}, {0, 1, 0},
            {0, 0, 1}, {1, 0, 1}, {1, 1, 1}, {0, 1, 1}};
        for (int64_t i = 0; i + 1 < nx; ++i, advance_slab()) {
            i_base = i;
            for (int64_t j = 0; j + 1 < ny; ++j)
                for (int64_t k = 0; k + 1 < nz; ++k) {
                    // skip uniform cubes fast; keep the 8 corner values for
                    // the tets (the scattered loads dominate the profile)
                    bool any_in = false, any_out = false;
                    float cv[8];
                    for (int c = 0; c < 8; ++c) {
                        cv[c] = at(i + corner[c][0], j + corner[c][1],
                                   k + corner[c][2]);
                        if (cv[c] > iso) any_in = true; else any_out = true;
                    }
                    if (!any_in || !any_out) continue;
                    for (int t = 0; t < 6; ++t) {
                        int64_t p[4][3];
                        float v[4];
                        for (int c = 0; c < 4; ++c) {
                            const int* off = corner[tets[t][c]];
                            p[c][0] = i + off[0];
                            p[c][1] = j + off[1];
                            p[c][2] = k + off[2];
                            v[c] = cv[tets[t][c]];
                        }
                        tet(p, v);
                    }
                }
        }
    }
};

}  // namespace

extern "C" {

int marching_tets(const float* grid, int64_t nx, int64_t ny, int64_t nz,
                  float iso, float** verts_out, int64_t** faces_out,
                  int64_t* n_verts, int64_t* n_faces) {
    static thread_local Mesher m;  // buffers persist across calls
    m.grid = grid; m.nx = nx; m.ny = ny; m.nz = nz; m.iso = iso;
    m.run();
    *n_verts = (int64_t)(m.verts.size() / 3);
    *n_faces = (int64_t)(m.faces.size() / 3);
    *verts_out = (float*)std::malloc(m.verts.size() * sizeof(float));
    *faces_out = (int64_t*)std::malloc(m.faces.size() * sizeof(int64_t));
    if ((m.verts.size() && !*verts_out) || (m.faces.size() && !*faces_out)) {
        std::free(*verts_out); std::free(*faces_out);
        *verts_out = nullptr; *faces_out = nullptr;
        return -1;
    }
    std::memcpy(*verts_out, m.verts.data(), m.verts.size() * sizeof(float));
    std::memcpy(*faces_out, m.faces.data(), m.faces.size() * sizeof(int64_t));
    return 0;
}

void mt_free(void* p) { std::free(p); }

}  // extern "C"
