// Fusion-path extraction of the ACTUAL reference octree (validation oracle).
//
// Compiles /root/reference/src/lib/octree.cpp verbatim (PCL console + boost
// stubbed in ./stubs — see SKILL: PCL itself is unavailable on this machine)
// and drives it with a faithful restatement of the driver logic the octree
// sits under:
//   * reset():       tsdf_volume_octree.cpp:200-219 (init to d=-1, w=0)
//   * pre-split:     impl/tsdf_volume_octree.hpp:57-90 (num_random_splits=1)
//   * updateVoxel(): impl/tsdf_volume_octree.hpp:113-218 (recursion, split
//                    rule, clamp/drop, normalization, weighting, pruning)
//   * reprojectPoint tsdf_volume_octree.cpp:611-617
// Frustum culling is intentionally omitted (PCL FrustumCulling unavailable);
// compare against the framework with frustum_culling=False.
//
// The octree node math itself — addObservation's weighted average, weight
// cap, Welford M/nsample, adaptive split topology, RGB/Normalized/LAB color
// fusion — is GENUINE reference code compiled from /root/reference, closing
// the "oracle written by the same author" gap flagged in round 1.
//
// stdin (binary, little-endian):
//   int32  xres, W, H, integrate_color (0/1), weight_by_depth, weight_by_variance, n_frames
//   f32    xsize, max_dist_pos, max_dist_neg, max_weight, min_sensor_dist,
//          max_sensor_dist, fx, fy, cx, cy, max_cell_size
//   per frame: f32[16] camera-to-volume pose (row major); f32[H*W] depth
//              (NaN = missing); if integrate_color: u8[H*W*3] rgb
// stdout (binary):
//   int32 n_leaves; per leaf: f32 x, y, z, d, w, M; int32 nsample;
//   u8 r, g, b (zeros when colorless)

#include <cpu_tsdf/octree.h>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <vector>

using cpu_tsdf::Octree;
using cpu_tsdf::OctreeNode;

static int xres, W, H, use_color, weight_by_depth, weight_by_variance, n_frames;
static float xsize, max_dist_pos, max_dist_neg, max_weight, min_sensor_dist,
    max_sensor_dist, fx, fy, cx_, cy_, max_cell;
static std::vector<float> depth;
static std::vector<unsigned char> rgb;
static float pose_inv[16];  // volume -> camera

static inline void apply(const float *m, float x, float y, float z,
                         float &ox, float &oy, float &oz) {
  ox = m[0] * x + m[1] * y + m[2] * z + m[3];
  oy = m[4] * x + m[5] * y + m[6] * z + m[7];
  oz = m[8] * x + m[9] * y + m[10] * z + m[11];
}

// tsdf_volume_octree.cpp:611-617 (float->int truncation semantics)
static inline bool reproject(float x, float y, float z, int &u, int &v) {
  u = (int)(x * fx / z + cx_);
  v = (int)(y * fy / z + cy_);
  return z > 0 && u >= 0 && u < W && v >= 0 && v < H;
}

// logNormal: hpp:106-110
static inline float log_normal(float x, float mean, float var) {
  return -std::pow(x - mean, 2) / (2 * var);
}

// updateVoxel: hpp:113-218, driving the REAL OctreeNode
static int update_voxel(const OctreeNode::Ptr &voxel) {
  if (voxel->hasChildren()) {
    std::vector<OctreeNode::Ptr> &children = voxel->getChildren();
    bool all_empty = true;
    for (size_t i = 0; i < children.size(); i++)
      all_empty &= (update_voxel(children[i]) < 0);
    if (all_empty) children.clear();
    else return 1;
  }
  float gx, gy, gz;
  voxel->getCenter(gx, gy, gz);
  float vx, vy, vz;
  apply(pose_inv, gx, gy, gz, vx, vy, vz);
  if (vz < min_sensor_dist || vz > max_sensor_dist) return 0;
  int u, v;
  if (!reproject(vx, vy, vz, u, v)) return 0;
  float z_img = depth[(size_t)v * W + u];
  if (std::isnan(z_img)) return 0;
  float d, w;
  voxel->getData(d, w);
  float d_new = z_img - vz;
  if (std::fabs(d_new) < 3 * voxel->getMaxSize() / 4.) {
    float sx, sy, sz;
    voxel->getSize(sx, sy, sz);
    float fine = xsize / xres;
    if (sx > fine && sy > fine && sz > fine) {
      std::vector<OctreeNode::Ptr> &children = voxel->split();
      bool all_empty = true;
      for (size_t i = 0; i < children.size(); i++)
        all_empty &= (update_voxel(children[i]) < 0);
      if (all_empty) children.clear();
      else return 1;
    }
  }
  if (d_new > max_dist_pos) d_new = max_dist_pos;
  else if (d_new < -max_dist_neg) return 0;
  d_new /= max_dist_neg;
  float w_new = 1;
  if (weight_by_depth) w_new *= (1 - std::min(z_img / 10., 1.));
  if (weight_by_variance && voxel->nsample_ > 5)
    w_new *= std::exp(log_normal(d_new, voxel->d_, voxel->getVariance()));
  if (use_color) {
    size_t px = ((size_t)v * W + u) * 3;
    voxel->addObservation(d_new, w_new, max_weight, rgb[px], rgb[px + 1],
                          rgb[px + 2]);
  } else {
    voxel->addObservation(d_new, w_new, max_weight);
  }
  if (voxel->d_ < -0.99) return 0;
  else if (voxel->d_ < 0.99 * max_dist_pos / max_dist_neg) return 1;
  else return -1;
}

// ---------------------------------------------------------------------------
// renderView restatement over the GENUINE fused octree
// (tsdf_volume_octree.cpp:278-424 driver logic, trilinear getTSDFValue
// cpp:453-541 with use_trilinear_interpolation_ = true, cpp:80) — dumps a
// depth image so the framework's renderers can be diffed against reference
// behavior on reference-fused data.
// ---------------------------------------------------------------------------

static bool get_voxel_index(float x, float y, float z, int &xi, int &yi, int &zi) {
  double off = (double)xsize / 2.0;  // cubic volume (cpp:611-617 semantics)
  xi = (int)std::floor(((double)x + off) / (double)xsize * (double)xres);
  yi = (int)std::floor(((double)y + off) / (double)xsize * (double)xres);
  zi = (int)std::floor(((double)z + off) / (double)xsize * (double)xres);
  return xi >= 0 && yi >= 0 && zi >= 0 && xi < xres && yi < xres && zi < xres;
}

static void voxel_center(int xi, int yi, int zi, float &x, float &y, float &z) {
  float off = xsize / 2.0f;
  x = (xi + 0.5) * xsize / (double)xres - off;
  y = (yi + 0.5) * xsize / (double)xres - off;
  z = (zi + 0.5) * xsize / (double)xres - off;
}

static float interp_trilinear(cpu_tsdf::Octree &oct, float x, float y, float z,
                              bool *valid) {
  int xi, yi, zi;
  bool exists = get_voxel_index(x, y, z, xi, yi, zi);
  if (!exists || xi <= 0 || xi >= xres - 1 || yi <= 0 || yi >= xres - 1 ||
      zi <= 0 || zi >= xres - 1) {
    if (valid) *valid = false;
    return std::numeric_limits<float>::quiet_NaN();
  }
  float vx_, vy_, vz_;
  voxel_center(xi, yi, zi, vx_, vy_, vz_);
  if (x < vx_) xi -= 1;
  if (y < vy_) yi -= 1;
  if (z < vz_) zi -= 1;
  voxel_center(xi, yi, zi, vx_, vy_, vz_);
  float a = (x - vx_) * xres / xsize;
  float b = (y - vy_) * xres / xsize;
  float c = (z - vz_) * xres / xsize;
  const cpu_tsdf::OctreeNode *n[2][2][2];
  for (int dx = 0; dx < 2; dx++)
    for (int dy = 0; dy < 2; dy++)
      for (int dz = 0; dz < 2; dz++) {
        float cx2, cy2, cz2;
        voxel_center(xi + dx, yi + dy, zi + dz, cx2, cy2, cz2);
        n[dx][dy][dz] = oct.getContainingVoxel(cx2, cy2, cz2);
        if (valid) *valid &= (n[dx][dy][dz]->w_ > 0);
      }
  return n[0][0][0]->d_ * (1 - a) * (1 - b) * (1 - c) +
         n[0][0][1]->d_ * (1 - a) * (1 - b) * c +
         n[0][1][0]->d_ * (1 - a) * b * (1 - c) +
         n[0][1][1]->d_ * (1 - a) * b * c +
         n[1][0][0]->d_ * a * (1 - b) * (1 - c) +
         n[1][0][1]->d_ * a * (1 - b) * c +
         n[1][1][0]->d_ * a * b * (1 - c) +
         n[1][1][1]->d_ * a * b * c;
}

// per-pixel march (cpp:291-424); pose = camera-to-volume row-major 4x4
static void render_depth(cpu_tsdf::Octree &oct, const float *pose,
                         std::vector<float> &out) {
  float min_step = max_dist_neg * 3 / 4.0f;
  float ox = pose[3], oy = pose[7], oz = pose[11];
  for (int i = 0; i < W * H; i++) {
    int px = i % W, py = i / W;
    float dux = (px - cx_) / fx, duy = (py - cy_) / fy, duz = 1.0f;
    float nrm = std::sqrt(dux * dux + duy * duy + duz * duz);
    dux /= nrm; duy /= nrm; duz /= nrm;
    float rx = pose[0] * dux + pose[1] * duy + pose[2] * duz;
    float ry = pose[4] * dux + pose[5] * duy + pose[6] * duz;
    float rz = pose[8] * dux + pose[9] * duy + pose[10] * duz;
    bool found_crossing = false;
    float d = 0, w = 0, last_w = 0, last_d = 0;
    float t = min_sensor_dist;
    float p0 = ox + t * rx, p1 = oy + t * ry, p2 = oz + t * rz;
    float step = min_step;
    bool hit_voxel = false;
    while (t < max_sensor_dist) {
      const cpu_tsdf::OctreeNode *voxel = oct.getContainingVoxel(p0, p1, p2);
      if (voxel) {
        hit_voxel = true;
        voxel->getData(d, w);
        if (((d < 0 && last_d > 0) || (d > 0 && last_d < 0)) && last_w && w) {
          found_crossing = true;
          float old_t = t - step;
          step = (xsize / xres) / 2.0f;  // cubic: zsize_/zres_
          float new_d, new_w;
          float last_new_d = d, last_new_w = w;
          while (t >= old_t) {
            t -= step;
            p0 -= step * rx; p1 -= step * ry; p2 -= step * rz;
            voxel = oct.getContainingVoxel(p0, p1, p2);
            if (!voxel) break;
            voxel->getData(new_d, new_w);
            if ((last_d > 0 && new_d > 0) || (last_d < 0 && new_d < 0)) {
              last_d = new_d;
              last_w = new_w;
              d = last_new_d;
              w = last_new_w;
              t += step;
              p0 += step * rx; p1 += step * ry; p2 += step * rz;
              break;
            }
            last_new_d = d;
            last_new_w = w;
          }
          break;
        }
        last_d = d;
        last_w = w;
        step = std::max((float)voxel->getMinSize() / 4.0f,
                        (float)(std::fabs(d) * max_dist_neg));
      } else if (hit_voxel) {
        break;
      }
      t += step;
      p0 += step * rx; p1 += step * ry; p2 += step * rz;
    }
    float depth_val = std::numeric_limits<float>::quiet_NaN();
    if (found_crossing) {
      bool has_data = true;
      float tcurr = t, tprev = t - step;
      last_d = interp_trilinear(oct, ox + tprev * rx, oy + tprev * ry,
                                oz + tprev * rz, &has_data);
      d = interp_trilinear(oct, ox + tcurr * rx, oy + tcurr * ry,
                           oz + tcurr * rz, &has_data);
      if (has_data && !std::isnan(d) && !std::isnan(last_d)) {
        float t_star = t + step * (-1 + std::fabs(last_d / (last_d - d)));
        float hx = ox + t_star * rx, hy = oy + t_star * ry, hz = oz + t_star * rz;
        // camera-frame depth (pcl::transformPointCloudWithNormals by
        // trans.inverse(), cpp:423)
        float cxp, cyp, czp;
        apply(pose_inv, hx, hy, hz, cxp, cyp, czp);
        depth_val = czp;
      }
    }
    out[i] = depth_val;
  }
}

int main(int argc, char **argv) {
  const char *color_mode = argc > 1 ? argv[1] : "RGB";
  int ints[7];
  if (std::fread(ints, 4, 7, stdin) != 7) return 2;
  xres = ints[0]; W = ints[1]; H = ints[2]; use_color = ints[3];
  weight_by_depth = ints[4]; weight_by_variance = ints[5]; n_frames = ints[6];
  float fls[11];
  if (std::fread(fls, 4, 11, stdin) != 11) return 2;
  xsize = fls[0]; max_dist_pos = fls[1]; max_dist_neg = fls[2];
  max_weight = fls[3]; min_sensor_dist = fls[4]; max_sensor_dist = fls[5];
  fx = fls[6]; fy = fls[7]; cx_ = fls[8]; cy_ = fls[9]; max_cell = fls[10];

  // reset(): tsdf_volume_octree.cpp:200-219
  Octree octree(xres, xres, xres, xsize, xsize, xsize,
                use_color ? color_mode : "NOCOLOR");
  octree.init(max_cell, max_cell, max_cell);
  {
    std::vector<OctreeNode::Ptr> leaves;
    octree.getLeaves(leaves);
    for (size_t i = 0; i < leaves.size(); i++) leaves[i]->setData(-1, 0);
  }

  depth.resize((size_t)W * H);
  if (use_color) rgb.resize((size_t)W * H * 3);
  static float last_pose[16];
  for (int f = 0; f < n_frames; f++) {
    float pose[16];
    if (std::fread(pose, 4, 16, stdin) != 16) return 2;
    std::memcpy(last_pose, pose, sizeof(last_pose));
    if (std::fread(depth.data(), 4, depth.size(), stdin) != depth.size()) return 2;
    if (use_color &&
        std::fread(rgb.data(), 1, rgb.size(), stdin) != rgb.size()) return 2;
    // rigid inverse (volume -> camera)
    for (int r = 0; r < 3; r++)
      for (int c = 0; c < 3; c++) pose_inv[r * 4 + c] = pose[c * 4 + r];
    for (int r = 0; r < 3; r++)
      pose_inv[r * 4 + 3] = -(pose_inv[r * 4 + 0] * pose[3] +
                              pose_inv[r * 4 + 1] * pose[7] +
                              pose_inv[r * 4 + 2] * pose[11]);

    // pre-split pass: hpp:57-90 (num_random_splits=1 -> zero noise)
    float fine = xsize / xres;
    for (int v = 0; v < H; v++) {
      for (int u = 0; u < W; u++) {
        float z = depth[(size_t)v * W + u];
        if (std::isnan(z)) continue;
        float px = (u - cx_) / fx * z, py = (v - cy_) / fy * z;
        float wx, wy, wz;
        apply(pose, px, py, z, wx, wy, wz);  // pose is camera->volume, row-major
        OctreeNode *vox = octree.getContainingVoxel(wx, wy, wz);
        if (vox != NULL) {
          while (vox->getMinSize() > fine) {
            vox->split();
            vox = vox->getContainingVoxel(wx, wy, wz);
          }
        }
      }
    }
    // per-voxel update over ALL coarse leaves (frustum culling omitted)
    std::vector<OctreeNode::Ptr> coarse;
    octree.getLeaves(coarse, max_cell, max_cell, max_cell);
    if (getenv("REF_FUSE_DEBUG")) {
      std::vector<OctreeNode::Ptr> fl;
      octree.getLeaves(fl);
      std::fprintf(stderr, "coarse=%zu leaves_after_presplit=%zu\n",
                   coarse.size(), fl.size());
    }
    for (size_t i = 0; i < coarse.size(); i++) update_voxel(coarse[i]);
  }

  // dump every finest-level observed leaf
  std::vector<OctreeNode::Ptr> leaves;
  octree.getLeaves(leaves);
  float fine = 1.01f * xsize / xres;
  std::vector<char> out;
  int n = 0;
  for (size_t i = 0; i < leaves.size(); i++) {
    float d, w, x, y, z;
    leaves[i]->getData(d, w);
    if (w <= 0 || leaves[i]->getMinSize() > fine) continue;
    leaves[i]->getCenter(x, y, z);
    float rec[6] = {x, y, z, d, w, leaves[i]->M_};
    int ns = leaves[i]->nsample_;
    unsigned char rgbv[3] = {0, 0, 0};
    if (use_color) leaves[i]->getRGB(rgbv[0], rgbv[1], rgbv[2]);
    out.insert(out.end(), (char *)rec, (char *)rec + 24);
    out.insert(out.end(), (char *)&ns, (char *)&ns + 4);
    out.insert(out.end(), (char *)rgbv, (char *)rgbv + 3);
    n++;
  }
  if (getenv("REF_FUSE_DEBUG")) {
    int tot = 0, obs = 0;
    for (size_t i = 0; i < leaves.size(); i++) {
      float d, w; leaves[i]->getData(d, w);
      if (leaves[i]->getMinSize() <= fine) tot++;
      if (w > 0) obs++;
    }
    std::fprintf(stderr, "final leaves=%zu finest=%d observed_any=%d dumped=%d\n",
                 leaves.size(), tot, obs, n);
  }
  std::fwrite(&n, 4, 1, stdout);
  std::fwrite(out.data(), 1, out.size(), stdout);

  // optional: dump the GENUINE reference serialization (Octree::serialize,
  // octree.cpp:645-657 + per-node-type color prefixes) so .vol interop can
  // be golden-tested against real reference bytes
  if (argc > 2 && argv[2][0] != '-') {
    std::ofstream vf(argv[2], std::ios::binary);
    octree.serialize(vf);
  }

  // argv[3]: render the LAST frame's pose over the fused octree and dump the
  // f32 depth image (NaN = no crossing)
  if (argc > 3) {
    std::vector<float> img((size_t)W * H);
    render_depth(octree, last_pose, img);
    std::ofstream rf(argv[3], std::ios::binary);
    rf.write((const char *)img.data(), img.size() * 4);
  }
  return 0;
}
