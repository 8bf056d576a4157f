// decimate.cpp — quadric edge-collapse mesh simplification (Garland &
// Heckbert '97) for shapeformer_tpu.
//
// First-party replacement for the reference's igl.decimate call
// (xgutils/geoutil.py:228) and the ConvONet Generator3D simplify_nfaces
// option (shapeformer/models/vqdif/conv_onet/generation.py:414-416): collapse
// minimum-error edges until the live face count reaches the target.
//
// Textbook QEM: per-vertex 4x4 plane quadrics, a lazy binary min-heap of
// candidate collapses validated by per-vertex version stamps, union-find
// vertex representatives (faces are never rewritten mid-run), optimal
// collapse position from the 3x3 normal system with midpoint/endpoint
// fallback, and a normal-flip penalty so slivers don't invert.
//
// Build: handled by shapeformer_tpu/utils/native.py (g++ -O3 -shared).
// ABI: decimate_qem() fills malloc'd buffers; caller frees with dq_free().

#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <vector>

namespace {

struct Quadric {
    // symmetric 4x4, upper triangle: a2 ab ac ad b2 bc bd c2 cd d2
    double q[10] = {0};
    void add_plane(double a, double b, double c, double d, double w) {
        q[0] += w * a * a; q[1] += w * a * b; q[2] += w * a * c;
        q[3] += w * a * d; q[4] += w * b * b; q[5] += w * b * c;
        q[6] += w * b * d; q[7] += w * c * c; q[8] += w * c * d;
        q[9] += w * d * d;
    }
    void add(const Quadric& o) { for (int i = 0; i < 10; ++i) q[i] += o.q[i]; }
    double eval(const double p[3]) const {
        double x = p[0], y = p[1], z = p[2];
        return q[0]*x*x + 2*q[1]*x*y + 2*q[2]*x*z + 2*q[3]*x
             + q[4]*y*y + 2*q[5]*y*z + 2*q[6]*y
             + q[7]*z*z + 2*q[8]*z + q[9];
    }
    // solve grad Q = 0 (3x3 system); false if near-singular
    bool minimize(double out[3]) const {
        double a=q[0], b=q[1], c=q[2], d=q[4], e=q[5], f=q[7];
        double det = a*(d*f - e*e) - b*(b*f - c*e) + c*(b*e - c*d);
        if (std::fabs(det) < 1e-10) return false;
        double rx = -q[3], ry = -q[6], rz = -q[8];
        out[0] = (rx*(d*f - e*e) - b*(ry*f - rz*e) + c*(ry*e - rz*d)) / det;
        out[1] = (a*(ry*f - rz*e) - rx*(b*f - c*e) + c*(b*rz - c*ry)) / det;
        out[2] = (a*(d*rz - e*ry) - b*(b*rz - c*ry) + rx*(b*e - c*d)) / det;
        return true;
    }
};

struct Cand {
    double cost;
    int32_t a, b;       // vertex representatives at push time
    uint32_t va, vb;    // version stamps for lazy invalidation
    uint8_t tries = 0;  // flip-rejection requeue count
    bool operator<(const Cand& o) const { return cost > o.cost; }  // min-heap
};

struct Decimator {
    std::vector<double> V;        // 3*nv
    std::vector<int32_t> F;       // 3*nf (original ids; resolve via find())
    std::vector<Quadric> Q;
    std::vector<uint32_t> ver;
    std::vector<int32_t> parent;  // union-find
    std::vector<std::vector<int32_t>> vfaces;  // rep vertex -> face ids
    std::vector<uint8_t> dead;    // face liveness
    std::priority_queue<Cand> heap;
    int64_t live_faces = 0;

    int32_t find(int32_t v) {
        while (parent[v] != v) { parent[v] = parent[parent[v]]; v = parent[v]; }
        return v;
    }

    void face_plane(int64_t f, double n[3], double* d, double* area) {
        int32_t i = find(F[3*f]), j = find(F[3*f+1]), k = find(F[3*f+2]);
        double* p0 = &V[3*i]; double* p1 = &V[3*j]; double* p2 = &V[3*k];
        double u[3] = {p1[0]-p0[0], p1[1]-p0[1], p1[2]-p0[2]};
        double w[3] = {p2[0]-p0[0], p2[1]-p0[1], p2[2]-p0[2]};
        n[0] = u[1]*w[2] - u[2]*w[1];
        n[1] = u[2]*w[0] - u[0]*w[2];
        n[2] = u[0]*w[1] - u[1]*w[0];
        double len = std::sqrt(n[0]*n[0] + n[1]*n[1] + n[2]*n[2]);
        *area = 0.5 * len;
        if (len > 1e-300) { n[0]/=len; n[1]/=len; n[2]/=len; }
        *d = -(n[0]*p0[0] + n[1]*p0[1] + n[2]*p0[2]);
    }

    bool face_degenerate(int64_t f) {
        int32_t i = find(F[3*f]), j = find(F[3*f+1]), k = find(F[3*f+2]);
        return i == j || j == k || i == k;
    }

    // best collapse position for (a, b) and its quadric cost
    double collapse_cost(int32_t a, int32_t b, double pos[3]) {
        Quadric q = Q[a]; q.add(Q[b]);
        if (!q.minimize(pos)) {
            const double* pa = &V[3*a]; const double* pb = &V[3*b];
            double mid[3] = {(pa[0]+pb[0])/2, (pa[1]+pb[1])/2, (pa[2]+pb[2])/2};
            const double* best = mid;
            double cm = q.eval(mid), ca = q.eval(pa), cb = q.eval(pb);
            double c = cm;
            if (ca < c) { c = ca; best = pa; }
            if (cb < c) { c = cb; best = pb; }
            pos[0]=best[0]; pos[1]=best[1]; pos[2]=best[2];
            return c;
        }
        return q.eval(pos);
    }

    // would moving rep vertex r to pos flip any of its live faces?
    bool flips(int32_t r, int32_t other, const double pos[3]) {
        double save[3] = {V[3*r], V[3*r+1], V[3*r+2]};
        for (int32_t f : vfaces[r]) {
            if (dead[f] || face_degenerate(f)) continue;
            // skip faces that will vanish (contain both endpoints)
            bool has_other = false;
            for (int c = 0; c < 3; ++c)
                if (find(F[3*f+c]) == other) has_other = true;
            if (has_other) continue;
            double n0[3], n1[3], d, ar0, ar1;
            face_plane(f, n0, &d, &ar0);
            V[3*r]=pos[0]; V[3*r+1]=pos[1]; V[3*r+2]=pos[2];
            face_plane(f, n1, &d, &ar1);
            V[3*r]=save[0]; V[3*r+1]=save[1]; V[3*r+2]=save[2];
            if (ar0 < 1e-14 || ar1 < 1e-14) continue;  // sliver: no signal
            if (n0[0]*n1[0] + n0[1]*n1[1] + n0[2]*n1[2] < 0.0) return true;
        }
        return false;
    }

    void push_edge(int32_t a, int32_t b) {
        if (a == b) return;
        double pos[3];
        double c = collapse_cost(a, b, pos);
        heap.push({c, a, b, ver[a], ver[b]});
    }

    void push_vertex_edges(int32_t a) {
        // candidate edges = a's neighbors through its live faces
        for (int32_t f : vfaces[a]) {
            if (dead[f]) continue;
            for (int c = 0; c < 3; ++c) {
                int32_t o = find(F[3*f+c]);
                if (o != a) push_edge(a, o);
            }
        }
    }

    void run(int64_t target_faces) {
        int64_t nv = (int64_t)V.size() / 3, nf = (int64_t)F.size() / 3;
        Q.assign(nv, Quadric());
        ver.assign(nv, 0);
        parent.resize(nv);
        for (int64_t i = 0; i < nv; ++i) parent[i] = (int32_t)i;
        vfaces.assign(nv, {});
        dead.assign(nf, 0);
        live_faces = 0;
        for (int64_t f = 0; f < nf; ++f) {
            if (face_degenerate(f)) { dead[f] = 1; continue; }
            ++live_faces;
            double n[3], d, area;
            face_plane(f, n, &d, &area);
            for (int c = 0; c < 3; ++c) {
                int32_t v = F[3*f+c];
                Q[v].add_plane(n[0], n[1], n[2], d, area);
                vfaces[v].push_back((int32_t)f);
            }
        }
        for (int64_t f = 0; f < nf; ++f) {
            if (dead[f]) continue;
            for (int c = 0; c < 3; ++c)
                push_edge(find(F[3*f+c]), find(F[3*f+(c+1)%3]));
        }
        while (live_faces > target_faces && !heap.empty()) {
            Cand e = heap.top(); heap.pop();
            int32_t a = find(e.a), b = find(e.b);
            if (a != e.a || b != e.b || ver[a] != e.va || ver[b] != e.vb
                || a == b)
                continue;  // stale
            double pos[3];
            double cost = collapse_cost(a, b, pos);
            if (flips(a, b, pos) || flips(b, a, pos)) {
                // penalty requeue (igl applies a cost penalty instead of
                // dropping): neighbor collapses may make the edge viable
                // later; without this, a region of flip-blocked edges can
                // drain the heap and return far more faces than the target
                if (e.tries < 3)
                    heap.push({cost * 16.0 + 1e-12, a, b, ver[a], ver[b],
                               (uint8_t)(e.tries + 1)});
                continue;
            }
            // collapse b into a at pos
            parent[b] = a;
            V[3*a]=pos[0]; V[3*a+1]=pos[1]; V[3*a+2]=pos[2];
            Q[a].add(Q[b]);
            ++ver[a]; ++ver[b];
            auto& fa = vfaces[a];
            for (int32_t f : vfaces[b]) {
                if (dead[f]) continue;
                if (face_degenerate(f)) { dead[f] = 1; --live_faces; }
                else fa.push_back(f);
            }
            vfaces[b].clear(); vfaces[b].shrink_to_fit();
            // a's own faces may also have degenerated
            size_t w = 0;
            for (size_t r = 0; r < fa.size(); ++r) {
                int32_t f = fa[r];
                if (dead[f]) continue;
                if (face_degenerate(f)) { dead[f] = 1; --live_faces; continue; }
                fa[w++] = f;
            }
            fa.resize(w);
            push_vertex_edges(a);
        }
    }
};

}  // namespace

extern "C" {

int decimate_qem(const float* verts, int64_t n_verts,
                 const int64_t* faces, int64_t n_faces,
                 int64_t target_faces,
                 float** verts_out, int64_t** faces_out,
                 int64_t* n_verts_out, int64_t* n_faces_out) {
    if (n_verts < 0 || n_faces < 0 || n_verts > INT32_MAX
        || n_faces > INT32_MAX)
        return -2;
    Decimator d;
    d.V.resize(3 * n_verts);
    for (int64_t i = 0; i < 3 * n_verts; ++i) d.V[i] = verts[i];
    d.F.resize(3 * n_faces);
    for (int64_t i = 0; i < 3 * n_faces; ++i) {
        // reject out-of-range indices (corrupt/truncated input meshes) —
        // they would read past V in find()/face_plane and crash the host
        if (faces[i] < 0 || faces[i] >= n_verts) return -2;
        d.F[i] = (int32_t)faces[i];
    }
    d.run(target_faces);
    // compact: live faces with resolved reps, then referenced vertices
    std::vector<int64_t> vmap(n_verts, -1);
    std::vector<float> VO;
    std::vector<int64_t> FO;
    int64_t nf = (int64_t)d.F.size() / 3;
    for (int64_t f = 0; f < nf; ++f) {
        if (d.dead[f] || d.face_degenerate(f)) continue;
        for (int c = 0; c < 3; ++c) {
            int32_t v = d.find(d.F[3*f+c]);
            if (vmap[v] < 0) {
                vmap[v] = (int64_t)VO.size() / 3;
                VO.push_back((float)d.V[3*v]);
                VO.push_back((float)d.V[3*v+1]);
                VO.push_back((float)d.V[3*v+2]);
            }
            FO.push_back(vmap[v]);
        }
    }
    *n_verts_out = (int64_t)VO.size() / 3;
    *n_faces_out = (int64_t)FO.size() / 3;
    *verts_out = (float*)std::malloc(VO.size() * sizeof(float));
    *faces_out = (int64_t*)std::malloc(FO.size() * sizeof(int64_t));
    if ((VO.size() && !*verts_out) || (FO.size() && !*faces_out)) {
        std::free(*verts_out); std::free(*faces_out);
        *verts_out = nullptr; *faces_out = nullptr;
        return -1;
    }
    std::memcpy(*verts_out, VO.data(), VO.size() * sizeof(float));
    std::memcpy(*faces_out, FO.data(), FO.size() * sizeof(int64_t));
    return 0;
}

void dq_free(void* p) { std::free(p); }

}  // extern "C"
