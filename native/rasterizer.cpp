// rasterizer.cpp — first-party software renderer for shapeformer_tpu.
//
// TPU-native replacement for the reference's fresnel path tracer dependency
// (xgutils/vis/fresnelvis.py — C++/CUDA, SURVEY.md section 2.3): the same
// orthographic camera model (camPos, camLookat, camUp, camHeight) rendering
// triangle meshes (flat Lambertian, two-sided, headlight + ambient) and point
// clouds (screen-space disc splats), z-buffered, optional supersampling.
// Rendering is observability-only in this framework, so a few hundred lines
// of scanline rasterization replace a ray tracer.
//
// ABI: raster_scene() writes H*W*3 uint8 into a caller-allocated buffer.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct V3 {
    float x, y, z;
};

inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 cross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
inline V3 norm(V3 a) {
    float n = std::sqrt(dot(a, a));
    if (n < 1e-12f) return {0, 0, 1};
    return {a.x / n, a.y / n, a.z / n};
}

struct Raster {
    int W, H;
    std::vector<float> zbuf;
    std::vector<float> color;     // RGB float accumulation
    V3 cam_pos, fwd, right, up;
    float half_h, half_w;

    void setup(const float* cam, int w, int h) {
        W = w; H = h;
        cam_pos = {cam[0], cam[1], cam[2]};
        V3 lookat = {cam[3], cam[4], cam[5]};
        V3 up_hint = {cam[6], cam[7], cam[8]};
        float height = cam[9];
        fwd = norm(sub(lookat, cam_pos));
        right = norm(cross(fwd, up_hint));
        up = cross(right, fwd);
        half_h = height * 0.5f;
        half_w = half_h * (float)W / (float)H;
        zbuf.assign((size_t)W * H, 1e30f);
        color.assign((size_t)W * H * 3, 1.0f);   // white background
    }

    // camera-space coords: (sx, sy) pixel centers, depth along fwd
    inline void project(const float* v, float* sx, float* sy, float* depth) const {
        V3 d = sub({v[0], v[1], v[2]}, cam_pos);
        float x = dot(d, right), y = dot(d, up);
        *depth = dot(d, fwd);
        *sx = (x / half_w * 0.5f + 0.5f) * W - 0.5f;
        *sy = (0.5f - y / half_h * 0.5f) * H - 0.5f;
    }

    inline void put(int px, int py, float z, const float* rgb, float shade) {
        size_t i = (size_t)py * W + px;
        if (z <= 0.0f || z >= zbuf[i]) return;
        zbuf[i] = z;
        color[i * 3 + 0] = rgb[0] * shade;
        color[i * 3 + 1] = rgb[1] * shade;
        color[i * 3 + 2] = rgb[2] * shade;
    }

    void triangle(const float* a, const float* b, const float* c,
                  const float* rgb) {
        float ax, ay, az, bx, by, bz, cx, cy, cz;
        project(a, &ax, &ay, &az);
        project(b, &bx, &by, &bz);
        project(c, &cx, &cy, &cz);
        // flat shading from the world-space normal: headlight + ambient
        V3 n = norm(cross(sub({b[0], b[1], b[2]}, {a[0], a[1], a[2]}),
                          sub({c[0], c[1], c[2]}, {a[0], a[1], a[2]})));
        float lambert = std::fabs(dot(n, fwd));
        float shade = 0.35f + 0.65f * lambert;

        float area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
        if (std::fabs(area) < 1e-12f) return;
        float inv_area = 1.0f / area;
        int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx})));
        int x1 = std::min(W - 1, (int)std::ceil(std::max({ax, bx, cx})));
        int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy})));
        int y1 = std::min(H - 1, (int)std::ceil(std::max({ay, by, cy})));
        for (int py = y0; py <= y1; ++py)
            for (int px = x0; px <= x1; ++px) {
                float w0 = ((bx - px) * (cy - py) - (by - py) * (cx - px)) * inv_area;
                float w1 = ((cx - px) * (ay - py) - (cy - py) * (ax - px)) * inv_area;
                float w2 = 1.0f - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                float z = w0 * az + w1 * bz + w2 * cz;
                put(px, py, z, rgb, shade);
            }
    }

    void splat(const float* p, float radius, const float* rgb) {
        float sx, sy, z;
        project(p, &sx, &sy, &z);
        float pr = std::max(radius / (half_h * 2.0f) * H, 0.75f);
        int x0 = std::max(0, (int)std::floor(sx - pr));
        int x1 = std::min(W - 1, (int)std::ceil(sx + pr));
        int y0 = std::max(0, (int)std::floor(sy - pr));
        int y1 = std::min(H - 1, (int)std::ceil(sy + pr));
        float pr2 = pr * pr;
        for (int py = y0; py <= y1; ++py)
            for (int px = x0; px <= x1; ++px) {
                float dx = px - sx, dy = py - sy;
                float d2 = dx * dx + dy * dy;
                if (d2 > pr2) continue;
                // fake sphere shading: brighter at the center
                float shade = 0.55f + 0.45f * std::sqrt(
                    std::max(0.0f, 1.0f - d2 / pr2));
                put(px, py, z, rgb, shade);
            }
    }
};

}  // namespace

extern "C" {

// cam: camPos(3) camLookat(3) camUp(3) camHeight(1).
// face_colors: n_faces*3; cloud_colors: n_cloud*3; cloud_radii: n_cloud
// (per-splat world radius, matching fresnel's per-geometry radii).
// ssaa in {1, 2, 3}.
int raster_scene(const float* verts, int64_t n_verts,
                 const int64_t* faces, int64_t n_faces,
                 const float* face_colors,
                 const float* cloud, int64_t n_cloud,
                 const float* cloud_colors, const float* cloud_radii,
                 const float* cam, int W, int H, int ssaa,
                 unsigned char* out_rgb) {
    // per-call buffers: renders are sporadic observability work, so holding
    // the ~W*H*ssaa^2*16 bytes resident between renders isn't worth it
    Raster r;
    int SW = W * ssaa, SH = H * ssaa;
    r.setup(cam, SW, SH);
    for (int64_t f = 0; f < n_faces; ++f) {
        int64_t i0 = faces[f * 3], i1 = faces[f * 3 + 1], i2 = faces[f * 3 + 2];
        if (i0 < 0 || i1 < 0 || i2 < 0
            || i0 >= n_verts || i1 >= n_verts || i2 >= n_verts)
            continue;
        r.triangle(verts + i0 * 3, verts + i1 * 3, verts + i2 * 3,
                   face_colors + f * 3);
    }
    for (int64_t p = 0; p < n_cloud; ++p)
        r.splat(cloud + p * 3, cloud_radii[p], cloud_colors + p * 3);
    // box-filter downsample to the requested resolution
    float inv = 1.0f / (ssaa * ssaa);
    for (int py = 0; py < H; ++py)
        for (int px = 0; px < W; ++px) {
            float acc[3] = {0, 0, 0};
            for (int sy = 0; sy < ssaa; ++sy)
                for (int sx = 0; sx < ssaa; ++sx) {
                    size_t i = ((size_t)(py * ssaa + sy) * SW
                                + (px * ssaa + sx)) * 3;
                    acc[0] += r.color[i];
                    acc[1] += r.color[i + 1];
                    acc[2] += r.color[i + 2];
                }
            size_t o = ((size_t)py * W + px) * 3;
            for (int c = 0; c < 3; ++c) {
                float v = acc[c] * inv;
                out_rgb[o + c] = (unsigned char)std::lround(
                    std::min(std::max(v, 0.0f), 1.0f) * 255.0f);
            }
        }
    return 0;
}

}  // extern "C"
