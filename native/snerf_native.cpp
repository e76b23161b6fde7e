// Native geometry core for the S-NeRF++ simulation pipeline.
//
// TPU-native replacement for the reference's GPU-only native deps
// (SURVEY.md §2.6.3-4): nvdiffrast rasterization (only forward color +
// depth is needed: s-nerfpp/stage0_code/rasterizer.py:37-53,
// api_code/mesh_renderer.py:42-67) and the `raytracing` BVH caster used
// for occlusion ordering (stage1_code/utils_render.py:732-737) and
// depth-from-mesh (:887+). These run on the HOST next to the TPU — mesh
// compositing is not a TPU workload.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsnerf_native.so
//        snerf_native.cpp
// Exposed via ctypes (snerf_tpu/sim/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Z-buffer triangle rasterizer with perspective-correct attribute
// interpolation. Camera: OpenCV pinhole (+z forward), points already in
// camera space.
//   verts_cam: [V, 3]  attrs: [V, C]  faces: [F, 3]
//   K: [9] row-major   out_attr: [H, W, C]  out_depth/out_mask: [H, W]
// ---------------------------------------------------------------------
void rasterize(const float* verts_cam, const int32_t* faces,
               const float* attrs, int32_t n_verts, int32_t n_faces,
               int32_t n_chan, const float* K, int32_t H, int32_t W,
               float* out_attr, float* out_depth, uint8_t* out_mask) {
  const float fx = K[0], fy = K[4], cx = K[2], cy = K[5];
  std::vector<float> zbuf((size_t)H * W,
                          std::numeric_limits<float>::infinity());
  std::memset(out_mask, 0, (size_t)H * W);
  std::memset(out_depth, 0, sizeof(float) * (size_t)H * W);
  std::memset(out_attr, 0, sizeof(float) * (size_t)H * W * n_chan);

  // Project all vertices once.
  std::vector<float> px(n_verts), py(n_verts), pz(n_verts);
  for (int32_t v = 0; v < n_verts; ++v) {
    const float x = verts_cam[3 * v], y = verts_cam[3 * v + 1],
                z = verts_cam[3 * v + 2];
    pz[v] = z;
    if (z <= 1e-6f) { px[v] = py[v] = -1e9f; continue; }
    px[v] = fx * x / z + cx;
    py[v] = fy * y / z + cy;
  }

  for (int32_t f = 0; f < n_faces; ++f) {
    const int32_t i0 = faces[3 * f], i1 = faces[3 * f + 1],
                  i2 = faces[3 * f + 2];
    const float z0 = pz[i0], z1 = pz[i1], z2 = pz[i2];
    if (z0 <= 1e-6f || z1 <= 1e-6f || z2 <= 1e-6f) continue;  // clip
    const float x0 = px[i0], y0 = py[i0], x1 = px[i1], y1 = py[i1],
                x2 = px[i2], y2 = py[i2];
    const float area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.0f / area;

    int xmin = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    int xmax = std::min(W - 1, (int)std::ceil(std::max({x0, x1, x2})));
    int ymin = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    int ymax = std::min(H - 1, (int)std::ceil(std::max({y0, y1, y2})));
    if (xmin > xmax || ymin > ymax) continue;

    const float iz0 = 1.0f / z0, iz1 = 1.0f / z1, iz2 = 1.0f / z2;
    for (int y = ymin; y <= ymax; ++y) {
      for (int x = xmin; x <= xmax; ++x) {
        const float pxf = x + 0.0f, pyf = y + 0.0f;
        float w0 = ((x1 - pxf) * (y2 - pyf) - (x2 - pxf) * (y1 - pyf)) *
                   inv_area;
        float w1 = ((x2 - pxf) * (y0 - pyf) - (x0 - pxf) * (y2 - pyf)) *
                   inv_area;
        float w2 = 1.0f - w0 - w1;
        if (w0 < 0 || w1 < 0 || w2 < 0) continue;
        // perspective-correct: interpolate 1/z and attr/z
        const float iz = w0 * iz0 + w1 * iz1 + w2 * iz2;
        const float z = 1.0f / iz;
        const size_t pix = (size_t)y * W + x;
        if (z >= zbuf[pix]) continue;
        zbuf[pix] = z;
        out_depth[pix] = z;
        out_mask[pix] = 1;
        for (int32_t c = 0; c < n_chan; ++c) {
          const float a = (w0 * attrs[(size_t)i0 * n_chan + c] * iz0 +
                           w1 * attrs[(size_t)i1 * n_chan + c] * iz1 +
                           w2 * attrs[(size_t)i2 * n_chan + c] * iz2) * z;
          out_attr[pix * n_chan + c] = a;
        }
      }
    }
  }
}

// ---------------------------------------------------------------------
// BVH ray caster (median-split) — closest-hit t and triangle id.
// ---------------------------------------------------------------------
namespace {

struct BVHNode {
  float bmin[3], bmax[3];
  int32_t left = -1, right = -1;   // children, or
  int32_t start = 0, count = 0;    // leaf triangle range
};

struct BVH {
  std::vector<BVHNode> nodes;
  std::vector<int32_t> tri_idx;
  const float* verts;
  const int32_t* faces;
};

void tri_bounds(const BVH& b, int32_t t, float* bmin, float* bmax) {
  for (int k = 0; k < 3; ++k) {
    bmin[k] = std::numeric_limits<float>::infinity();
    bmax[k] = -std::numeric_limits<float>::infinity();
  }
  for (int j = 0; j < 3; ++j) {
    const float* v = b.verts + 3 * b.faces[3 * t + j];
    for (int k = 0; k < 3; ++k) {
      bmin[k] = std::min(bmin[k], v[k]);
      bmax[k] = std::max(bmax[k], v[k]);
    }
  }
}

int32_t build_node(BVH& b, std::vector<int32_t>& idx, int32_t start,
                   int32_t count) {
  BVHNode node;
  for (int k = 0; k < 3; ++k) {
    node.bmin[k] = std::numeric_limits<float>::infinity();
    node.bmax[k] = -std::numeric_limits<float>::infinity();
  }
  for (int32_t i = start; i < start + count; ++i) {
    float bmin[3], bmax[3];
    tri_bounds(b, idx[i], bmin, bmax);
    for (int k = 0; k < 3; ++k) {
      node.bmin[k] = std::min(node.bmin[k], bmin[k]);
      node.bmax[k] = std::max(node.bmax[k], bmax[k]);
    }
  }
  const int32_t node_id = (int32_t)b.nodes.size();
  b.nodes.push_back(node);
  if (count <= 4) {
    b.nodes[node_id].start = start;
    b.nodes[node_id].count = count;
    return node_id;
  }
  // split along the widest axis at the median centroid
  int axis = 0;
  float ext[3];
  for (int k = 0; k < 3; ++k) ext[k] = node.bmax[k] - node.bmin[k];
  if (ext[1] > ext[0]) axis = 1;
  if (ext[2] > ext[axis]) axis = 2;
  auto centroid = [&](int32_t t) {
    const float* a = b.verts + 3 * b.faces[3 * t];
    const float* c = b.verts + 3 * b.faces[3 * t + 1];
    const float* d = b.verts + 3 * b.faces[3 * t + 2];
    return (a[axis] + c[axis] + d[axis]) / 3.0f;
  };
  std::nth_element(idx.begin() + start, idx.begin() + start + count / 2,
                   idx.begin() + start + count,
                   [&](int32_t a, int32_t c) {
                     return centroid(a) < centroid(c);
                   });
  const int32_t mid = count / 2;
  const int32_t l = build_node(b, idx, start, mid);
  const int32_t r = build_node(b, idx, start + mid, count - mid);
  b.nodes[node_id].left = l;
  b.nodes[node_id].right = r;
  b.nodes[node_id].count = 0;
  return node_id;
}

inline bool aabb_hit(const BVHNode& n, const float* o, const float* inv_d,
                     float t_best) {
  float t0 = 0.0f, t1 = t_best;
  for (int k = 0; k < 3; ++k) {
    float ta = (n.bmin[k] - o[k]) * inv_d[k];
    float tb = (n.bmax[k] - o[k]) * inv_d[k];
    if (ta > tb) std::swap(ta, tb);
    t0 = std::max(t0, ta);
    t1 = std::min(t1, tb);
    if (t0 > t1) return false;
  }
  return true;
}

inline bool moller_trumbore(const float* o, const float* d, const float* v0,
                            const float* v1, const float* v2, float* t_out) {
  float e1[3], e2[3], p[3], tv[3], q[3];
  for (int k = 0; k < 3; ++k) {
    e1[k] = v1[k] - v0[k];
    e2[k] = v2[k] - v0[k];
  }
  p[0] = d[1] * e2[2] - d[2] * e2[1];
  p[1] = d[2] * e2[0] - d[0] * e2[2];
  p[2] = d[0] * e2[1] - d[1] * e2[0];
  const float det = e1[0] * p[0] + e1[1] * p[1] + e1[2] * p[2];
  if (std::fabs(det) < 1e-12f) return false;
  const float inv_det = 1.0f / det;
  for (int k = 0; k < 3; ++k) tv[k] = o[k] - v0[k];
  const float u = (tv[0] * p[0] + tv[1] * p[1] + tv[2] * p[2]) * inv_det;
  if (u < 0.0f || u > 1.0f) return false;
  q[0] = tv[1] * e1[2] - tv[2] * e1[1];
  q[1] = tv[2] * e1[0] - tv[0] * e1[2];
  q[2] = tv[0] * e1[1] - tv[1] * e1[0];
  const float v = (d[0] * q[0] + d[1] * q[1] + d[2] * q[2]) * inv_det;
  if (v < 0.0f || u + v > 1.0f) return false;
  const float t = (e2[0] * q[0] + e2[1] * q[1] + e2[2] * q[2]) * inv_det;
  if (t <= 1e-6f) return false;
  *t_out = t;
  return true;
}

}  // namespace

void raycast(const float* verts, const int32_t* faces, int32_t n_verts,
             int32_t n_faces, const float* origins, const float* dirs,
             int32_t n_rays, float* out_t, int32_t* out_tri) {
  (void)n_verts;
  BVH bvh;
  bvh.verts = verts;
  bvh.faces = faces;
  bvh.tri_idx.resize(n_faces);
  for (int32_t i = 0; i < n_faces; ++i) bvh.tri_idx[i] = i;
  if (n_faces > 0) build_node(bvh, bvh.tri_idx, 0, n_faces);

  for (int32_t r = 0; r < n_rays; ++r) {
    const float* o = origins + 3 * r;
    const float* d = dirs + 3 * r;
    float inv_d[3];
    for (int k = 0; k < 3; ++k)
      inv_d[k] = 1.0f / (std::fabs(d[k]) < 1e-12f
                             ? std::copysign(1e-12f, d[k]) : d[k]);
    float best_t = std::numeric_limits<float>::infinity();
    int32_t best_tri = -1;
    if (n_faces > 0) {
      int32_t stack[64];
      int sp = 0;
      stack[sp++] = 0;
      while (sp > 0) {
        const BVHNode& node = bvh.nodes[stack[--sp]];
        if (!aabb_hit(node, o, inv_d, best_t)) continue;
        if (node.count > 0) {
          for (int32_t i = node.start; i < node.start + node.count; ++i) {
            const int32_t t_id = bvh.tri_idx[i];
            const float* v0 = verts + 3 * faces[3 * t_id];
            const float* v1 = verts + 3 * faces[3 * t_id + 1];
            const float* v2 = verts + 3 * faces[3 * t_id + 2];
            float t;
            if (moller_trumbore(o, d, v0, v1, v2, &t) && t < best_t) {
              best_t = t;
              best_tri = t_id;
            }
          }
        } else {
          if (sp + 2 <= 64) {
            stack[sp++] = node.left;
            stack[sp++] = node.right;
          }
        }
      }
    }
    out_t[r] = best_tri >= 0 ? best_t
                             : std::numeric_limits<float>::infinity();
    out_tri[r] = best_tri;
  }
}

}  // extern "C"
