// surface_nets.cpp — naive-surface-nets isosurface extraction for
// shapeformer_tpu (host hot path of the completion pipeline).
//
// Emits about half the triangles of the 6-tet decomposition
// (marching_tets.cpp) for the same field — one vertex per sign-mixed cell
// (centroid of its edge crossings), one quad per sign-changing interior grid
// edge — and needs no vertex dedup structure at all: a vertex's id IS its
// cell's rank, assigned in one linear pass.  That makes it ~5-10x faster per
// output face than the tet mesher on the single host core.
//
// Winding: triangles CCW seen from outside (occ > iso is 'inside'), matching
// marching_tets.cpp and ops/surface_nets.py (the device-resident variant).
//
// Build: handled by shapeformer_tpu/utils/native.py (g++ -O3 -shared).
// ABI: surface_nets() fills malloc'd buffers; caller frees with sn_free().

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct SNMesher {
    const float* grid;
    int64_t nx, ny, nz;
    float iso;
    std::vector<float> verts;
    std::vector<int64_t> faces;
    std::vector<int32_t> cell_id;  // (nx-1)*(ny-1)*(nz-1), -1 = inactive

    inline float at(int64_t i, int64_t j, int64_t k) const {
        return grid[(i * ny + j) * nz + k];
    }
    inline int64_t cidx(int64_t i, int64_t j, int64_t k) const {
        return (i * (ny - 1) + j) * (nz - 1) + k;
    }

    void vertex_pass() {
        int64_t cx = nx - 1, cy = ny - 1, cz = nz - 1;
        cell_id.assign(cx * cy * cz, -1);
        verts.clear();
        faces.clear();
        // cube edges as corner-offset pairs (4 per axis)
        static const int E[12][2][3] = {
            {{0,0,0},{1,0,0}}, {{0,1,0},{1,1,0}}, {{0,0,1},{1,0,1}},
            {{0,1,1},{1,1,1}},
            {{0,0,0},{0,1,0}}, {{1,0,0},{1,1,0}}, {{0,0,1},{0,1,1}},
            {{1,0,1},{1,1,1}},
            {{0,0,0},{0,0,1}}, {{1,0,0},{1,0,1}}, {{0,1,0},{0,1,1}},
            {{1,1,0},{1,1,1}}};
        for (int64_t i = 0; i < cx; ++i)
            for (int64_t j = 0; j < cy; ++j)
                for (int64_t k = 0; k < cz; ++k) {
                    float v[2][2][2];
                    bool any_in = false, any_out = false;
                    for (int a = 0; a < 2; ++a)
                        for (int b = 0; b < 2; ++b)
                            for (int c = 0; c < 2; ++c) {
                                float x = at(i + a, j + b, k + c);
                                v[a][b][c] = x;
                                if (x > iso) any_in = true; else any_out = true;
                            }
                    if (!any_in || !any_out) continue;
                    float sx = 0, sy = 0, sz = 0;
                    int cnt = 0;
                    for (const auto& e : E) {
                        float v0 = v[e[0][0]][e[0][1]][e[0][2]];
                        float v1 = v[e[1][0]][e[1][1]][e[1][2]];
                        if ((v0 > iso) == (v1 > iso)) continue;
                        float d = v1 - v0;
                        float t = (d == 0.0f) ? 0.5f : (iso - v0) / d;
                        if (t < 0.0f) t = 0.0f;
                        if (t > 1.0f) t = 1.0f;
                        sx += e[0][0] + t * (e[1][0] - e[0][0]);
                        sy += e[0][1] + t * (e[1][1] - e[0][1]);
                        sz += e[0][2] + t * (e[1][2] - e[0][2]);
                        ++cnt;
                    }
                    cell_id[cidx(i, j, k)] = (int32_t)(verts.size() / 3);
                    float inv = 1.0f / (float)cnt;
                    verts.push_back((float)i + sx * inv);
                    verts.push_back((float)j + sy * inv);
                    verts.push_back((float)k + sz * inv);
                }
    }

    inline void quad(int32_t q0, int32_t q1, int32_t q2, int32_t q3,
                     bool base_inside) {
        // base (low end of the edge) inside -> outward normal along +axis ->
        // CCW order as given; else reverse.
        if (!base_inside) {
            int32_t t = q0; q0 = q3; q3 = t;
            t = q1; q1 = q2; q2 = t;
        }
        faces.push_back(q0); faces.push_back(q1); faces.push_back(q2);
        faces.push_back(q0); faces.push_back(q2); faces.push_back(q3);
    }

    void face_pass() {
        const int32_t* id = cell_id.data();
        // x-edges at (i, j, k), 1 <= j,k: cells (i, j-1..j, k-1..k);
        // quad CCW seen from +x with (u, v) = (y, z)
        for (int64_t i = 0; i + 1 < nx; ++i)
            for (int64_t j = 1; j + 1 < ny; ++j)
                for (int64_t k = 1; k + 1 < nz; ++k) {
                    bool s0 = at(i, j, k) > iso;
                    if (s0 == (at(i + 1, j, k) > iso)) continue;
                    quad(id[cidx(i, j - 1, k - 1)], id[cidx(i, j, k - 1)],
                         id[cidx(i, j, k)], id[cidx(i, j - 1, k)], s0);
                }
        // y-edges: (u, v) = (z, x)
        for (int64_t i = 1; i + 1 < nx; ++i)
            for (int64_t j = 0; j + 1 < ny; ++j)
                for (int64_t k = 1; k + 1 < nz; ++k) {
                    bool s0 = at(i, j, k) > iso;
                    if (s0 == (at(i, j + 1, k) > iso)) continue;
                    quad(id[cidx(i - 1, j, k - 1)], id[cidx(i - 1, j, k)],
                         id[cidx(i, j, k)], id[cidx(i, j, k - 1)], s0);
                }
        // z-edges: (u, v) = (x, y)
        for (int64_t i = 1; i + 1 < nx; ++i)
            for (int64_t j = 1; j + 1 < ny; ++j)
                for (int64_t k = 0; k + 1 < nz; ++k) {
                    bool s0 = at(i, j, k) > iso;
                    if (s0 == (at(i, j, k + 1) > iso)) continue;
                    quad(id[cidx(i - 1, j - 1, k)], id[cidx(i, j - 1, k)],
                         id[cidx(i, j, k)], id[cidx(i - 1, j, k)], s0);
                }
    }
};

}  // namespace

extern "C" {

int surface_nets(const float* grid, int64_t nx, int64_t ny, int64_t nz,
                 float iso, float** verts_out, int64_t** faces_out,
                 int64_t* n_verts, int64_t* n_faces) {
    static thread_local SNMesher m;  // buffers persist across calls
    if (nx < 2 || ny < 2 || nz < 2) {  // no cells -> empty mesh (a negative
        *n_verts = *n_faces = 0;       // cell count would wrap the allocator)
        *verts_out = nullptr; *faces_out = nullptr;
        return 0;
    }
    m.grid = grid; m.nx = nx; m.ny = ny; m.nz = nz; m.iso = iso;
    m.vertex_pass();
    m.face_pass();
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
    std::memcpy(*faces_out, m.faces.data(),
                m.faces.size() * sizeof(int64_t));
    return 0;
}

void sn_free(void* p) { std::free(p); }

}  // extern "C"
