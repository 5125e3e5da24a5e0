// meshkit — native host-side mesh kernels for omfs4d.
//
// The reference delegated these to VTK's C++ filters (ref:
// dicom_loader.py:153-163 uses .smooth()/.decimate()).  This library
// provides first-party equivalents exposed over a C ABI (loaded via
// ctypes, no pybind11):
//
//   * laplacian_smooth : padded-adjacency neighbor averaging
//   * qem_decimate     : quadric-error-metric edge collapse with a lazy
//                        min-heap (higher quality than the Python
//                        vertex-clustering fallback)
//
// Build: g++ -O3 -shared -fPIC -o libmeshkit.so meshkit.cpp

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>
#include <unordered_set>
#include <algorithm>
#include <array>
#include <functional>

extern "C" {

// verts: (n_verts, 3) float32, modified in place.
// nbr:   (n_verts, max_deg) int64 neighbor ids; mask: same shape, uint8.
void laplacian_smooth(float* verts, const int64_t* nbr, const uint8_t* mask,
                      int64_t n_verts, int64_t max_deg, int n_iter,
                      float relax) {
  std::vector<float> next(static_cast<size_t>(n_verts) * 3);
  for (int it = 0; it < n_iter; ++it) {
    for (int64_t v = 0; v < n_verts; ++v) {
      double mx = 0, my = 0, mz = 0;
      int64_t cnt = 0;
      const int64_t* row = nbr + v * max_deg;
      const uint8_t* mrow = mask + v * max_deg;
      for (int64_t k = 0; k < max_deg; ++k) {
        if (!mrow[k]) continue;
        const float* p = verts + row[k] * 3;
        mx += p[0]; my += p[1]; mz += p[2];
        ++cnt;
      }
      float* out = &next[v * 3];
      const float* cur = verts + v * 3;
      if (cnt == 0) {
        out[0] = cur[0]; out[1] = cur[1]; out[2] = cur[2];
      } else {
        const double inv = 1.0 / cnt;
        out[0] = cur[0] + relax * (float)(mx * inv - cur[0]);
        out[1] = cur[1] + relax * (float)(my * inv - cur[1]);
        out[2] = cur[2] + relax * (float)(mz * inv - cur[2]);
      }
    }
    std::memcpy(verts, next.data(), next.size() * sizeof(float));
  }
}

namespace {

struct Quadric {
  // symmetric 4x4: a2 ab ac ad | b2 bc bd | c2 cd | d2
  double m[10] = {0};
  void add_plane(double a, double b, double c, double d) {
    m[0] += a * a; m[1] += a * b; m[2] += a * c; m[3] += a * d;
    m[4] += b * b; m[5] += b * c; m[6] += b * d;
    m[7] += c * c; m[8] += c * d;
    m[9] += d * d;
  }
  void add(const Quadric& o) { for (int i = 0; i < 10; ++i) m[i] += o.m[i]; }
  double eval(double x, double y, double z) const {
    return m[0]*x*x + 2*m[1]*x*y + 2*m[2]*x*z + 2*m[3]*x
         + m[4]*y*y + 2*m[5]*y*z + 2*m[6]*y
         + m[7]*z*z + 2*m[8]*z + m[9];
  }
};

struct HeapEntry {
  double cost;
  int64_t va, vb;
  uint32_t ver_a, ver_b;
  bool operator<(const HeapEntry& o) const { return cost > o.cost; }  // min-heap
};

}  // namespace

// QEM edge-collapse decimation.
// in:  verts (n_verts,3) f32, faces (n_faces,3) i32, target_faces
// out: out_verts/out_faces buffers sized at least as the inputs;
//      returns number of output faces; out_n_verts receives vertex count.
int64_t qem_decimate(const float* verts_in, int64_t n_verts,
                     const int32_t* faces_in, int64_t n_faces,
                     int64_t target_faces,
                     float* out_verts, int64_t* out_n_verts,
                     int32_t* out_faces) {
  std::vector<double> vx(n_verts), vy(n_verts), vz(n_verts);
  for (int64_t i = 0; i < n_verts; ++i) {
    vx[i] = verts_in[i*3]; vy[i] = verts_in[i*3+1]; vz[i] = verts_in[i*3+2];
  }
  std::vector<std::array<int32_t,3>> faces(n_faces);
  for (int64_t f = 0; f < n_faces; ++f)
    faces[f] = {faces_in[f*3], faces_in[f*3+1], faces_in[f*3+2]};

  // per-vertex quadrics from incident face planes
  std::vector<Quadric> Q(n_verts);
  for (auto& f : faces) {
    double ax = vx[f[1]] - vx[f[0]], ay = vy[f[1]] - vy[f[0]], az = vz[f[1]] - vz[f[0]];
    double bx = vx[f[2]] - vx[f[0]], by = vy[f[2]] - vy[f[0]], bz = vz[f[2]] - vz[f[0]];
    double nx = ay*bz - az*by, ny = az*bx - ax*bz, nz = ax*by - ay*bx;
    double len = std::sqrt(nx*nx + ny*ny + nz*nz);
    if (len < 1e-30) continue;
    nx /= len; ny /= len; nz /= len;
    double d = -(nx*vx[f[0]] + ny*vy[f[0]] + nz*vz[f[0]]);
    for (int k = 0; k < 3; ++k) Q[f[k]].add_plane(nx, ny, nz, d);
  }

  // union-find over collapses
  std::vector<int64_t> parent(n_verts);
  for (int64_t i = 0; i < n_verts; ++i) parent[i] = i;
  std::function<int64_t(int64_t)> find = [&](int64_t a) {
    while (parent[a] != a) { parent[a] = parent[parent[a]]; a = parent[a]; }
    return a;
  };

  // vertex adjacency (sets of neighbor roots), versions for lazy heap
  std::vector<std::unordered_set<int64_t>> adj(n_verts);
  for (auto& f : faces)
    for (int k = 0; k < 3; ++k) {
      adj[f[k]].insert(f[(k+1)%3]);
      adj[f[k]].insert(f[(k+2)%3]);
    }
  std::vector<uint32_t> version(n_verts, 0);

  auto edge_cost = [&](int64_t a, int64_t b, double* px, double* py, double* pz) {
    Quadric q = Q[a]; q.add(Q[b]);
    // candidate positions: midpoint, a, b — pick the cheapest (robust, no
    // 4x4 solve needed for preview-grade decimation)
    double cx[3] = {(vx[a]+vx[b])*0.5, vx[a], vx[b]};
    double cy[3] = {(vy[a]+vy[b])*0.5, vy[a], vy[b]};
    double cz[3] = {(vz[a]+vz[b])*0.5, vz[a], vz[b]};
    double best = 1e300; int bi = 0;
    for (int i = 0; i < 3; ++i) {
      double c = q.eval(cx[i], cy[i], cz[i]);
      if (c < best) { best = c; bi = i; }
    }
    *px = cx[bi]; *py = cy[bi]; *pz = cz[bi];
    return best;
  };

  std::priority_queue<HeapEntry> heap;
  for (int64_t a = 0; a < n_verts; ++a)
    for (int64_t b : adj[a])
      if (a < b) {
        double px, py, pz;
        double c = edge_cost(a, b, &px, &py, &pz);
        heap.push({c, a, b, 0, 0});
      }

  int64_t live_faces = n_faces;
  while (live_faces > target_faces && !heap.empty()) {
    HeapEntry e = heap.top(); heap.pop();
    int64_t a = find(e.va), b = find(e.vb);
    if (a == b) continue;
    if (e.ver_a != version[a] || e.ver_b != version[b]) continue;  // stale

    double px, py, pz;
    edge_cost(a, b, &px, &py, &pz);

    // collapse b into a
    parent[b] = a;
    vx[a] = px; vy[a] = py; vz[a] = pz;
    Q[a].add(Q[b]);
    version[a]++;

    // merge adjacency
    for (int64_t n : adj[b]) {
      int64_t rn = find(n);
      if (rn != a) adj[a].insert(rn);
    }
    adj[b].clear();
    // refresh neighbor costs
    std::vector<int64_t> nbrs(adj[a].begin(), adj[a].end());
    adj[a].clear();
    for (int64_t n : nbrs) {
      int64_t rn = find(n);
      if (rn == a) continue;
      adj[a].insert(rn);
      double qx, qy, qz;
      double c = edge_cost(a, rn, &qx, &qy, &qz);
      heap.push({c, a, rn, version[a], version[rn]});
    }
    // each interior edge collapse removes ~2 faces
    live_faces -= 2;
  }

  // rebuild: remap faces through union-find, drop degenerates + dups
  std::vector<int64_t> root(n_verts);
  std::vector<int64_t> new_id(n_verts, -1);
  int64_t nv = 0;
  for (int64_t i = 0; i < n_verts; ++i) root[i] = find(i);

  std::vector<std::array<int32_t,3>> out;
  out.reserve(static_cast<size_t>(std::max<int64_t>(target_faces, 16)));
  std::unordered_set<uint64_t> seen;
  for (auto& f : faces) {
    int64_t r0 = root[f[0]], r1 = root[f[1]], r2 = root[f[2]];
    if (r0 == r1 || r1 == r2 || r0 == r2) continue;
    for (int64_t r : {r0, r1, r2})
      if (new_id[r] < 0) {
        new_id[r] = nv;
        out_verts[nv*3]   = (float)vx[r];
        out_verts[nv*3+1] = (float)vy[r];
        out_verts[nv*3+2] = (float)vz[r];
        ++nv;
      }
    int32_t i0 = (int32_t)new_id[r0], i1 = (int32_t)new_id[r1], i2 = (int32_t)new_id[r2];
    int32_t s0 = std::min({i0, i1, i2});
    int32_t s2 = std::max({i0, i1, i2});
    int32_t s1 = i0 + i1 + i2 - s0 - s2;
    uint64_t key = ((uint64_t)s0 << 42) ^ ((uint64_t)s1 << 21) ^ (uint64_t)s2;
    if (!seen.insert(key).second) continue;
    out.push_back({i0, i1, i2});
  }
  for (size_t f = 0; f < out.size(); ++f) {
    out_faces[f*3] = out[f][0];
    out_faces[f*3+1] = out[f][1];
    out_faces[f*3+2] = out[f][2];
  }
  *out_n_verts = nv;
  return (int64_t)out.size();
}

}  // extern "C"
