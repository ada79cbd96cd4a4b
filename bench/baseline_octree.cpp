// Standalone performance baseline: a faithful re-creation of the REFERENCE
// DESIGN (sdmiller/cpu_tsdf) — recursive pointer octree, voxel-centric
// projective integration with adaptive splitting, per-pixel ray march — used
// to measure what the reference architecture achieves on THIS machine, since
// the reference itself needs PCL (unavailable here). Structure mirrors
// /root/reference/src/lib/octree.cpp + impl/tsdf_volume_octree.hpp +
// tsdf_volume_octree.cpp:278-424 (same algorithms, fresh code, no PCL/Boost).
//
// Build: g++ -O3 -fopenmp -std=c++17 baseline_octree.cpp -o baseline_octree
// Run:   ./baseline_octree [res] [frames]   (defaults 512 10)

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <chrono>
#include <limits>
#include <memory>
#include <vector>

static const float kNaN = std::numeric_limits<float>::quiet_NaN();

struct Node {
  float d = -1.f, w = 0.f, M = 0.f;
  int nsample = 0;
  float cx, cy, cz, size;
  std::vector<std::unique_ptr<Node>> children;

  Node(float x, float y, float z, float s) : cx(x), cy(y), cz(z), size(s) {}

  bool hasChildren() const { return !children.empty(); }
  float maxSize() const { return std::sqrt(3.f) * size; }

  void addObservation(float d_new, float w_new, float max_weight) {
    float d_old = d;
    d = (d * w + d_new * w_new) / (w + w_new);
    w += w_new;
    if (w > max_weight) w = max_weight;
    M += w_new * (d_new - d) * (d_new - d_old);
    ++nsample;
  }

  Node* containing(float x, float y, float z) {
    if (!hasChildren()) return this;
    int idx = ((x - cx) > 0) * 4 + ((y - cy) > 0) * 2 + ((z - cz) > 0);
    return children[idx]->containing(x, y, z);
  }

  void split() {
    children.reserve(8);
    float off = size / 4, ns = size / 2;
    for (int sx = -1; sx <= 1; sx += 2)
      for (int sy = -1; sy <= 1; sy += 2)
        for (int sz = -1; sz <= 1; sz += 2)
          children.emplace_back(new Node(cx + sx * off, cy + sy * off, cz + sz * off, ns));
  }

  void splitRecursive(int n) {
    if (n <= 0) return;
    split();
    for (auto& c : children) c->splitRecursive(n - 1);
  }
};

struct Config {
  int res = 512;
  float size = 3.0f;
  float max_dist_pos = 0.03f, max_dist_neg = 0.03f;
  float max_weight = 100.f;
  float min_sensor = 0.3f, max_sensor = 3.0f;
  float fx = 525.f, fy = 525.f, cx = 320.f, cy = 240.f;
  int W = 640, H = 480;
  float max_cell = 0.5f;
};

struct Tsdf {
  Config cfg;
  std::unique_ptr<Node> root;
  std::vector<Node*> coarse;
  long long updates = 0;

  explicit Tsdf(const Config& c) : cfg(c) {
    root.reset(new Node(0, 0, 0, c.size));
    int desired = (int)(c.size / c.max_cell);
    int levels = (int)std::ceil(std::log((double)desired) / std::log(2.0));
    root->splitRecursive(levels);
    collectCoarse(root.get(), levels);
  }

  void collectCoarse(Node* n, int depth) {
    if (depth == 0 || !n->hasChildren()) { coarse.push_back(n); return; }
    for (auto& c : n->children) collectCoarse(c.get(), depth - 1);
  }

  Node* containing(float x, float y, float z) {
    if (std::isnan(z) || std::fabs(x) > cfg.size / 2 || std::fabs(y) > cfg.size / 2 ||
        std::fabs(z) > cfg.size / 2)
      return nullptr;
    return root->containing(x, y, z);
  }

  // integrateCloud: pre-split pass + parallel update over culled coarse cells
  void integrate(const std::vector<float>& depth, float camz) {
    float finest = cfg.size / cfg.res;
    for (int v = 0; v < cfg.H; ++v) {
      for (int u = 0; u < cfg.W; ++u) {
        float z = depth[v * cfg.W + u];
        if (std::isnan(z)) continue;
        float x = (u - cfg.cx) / cfg.fx * z;
        float y = (v - cfg.cy) / cfg.fy * z;
        Node* vox = containing(x, y, z + camz);
        if (!vox) continue;
        while (vox->size > finest) {
          vox->split();
          vox = vox->containing(x, y, z + camz);
        }
      }
    }
    long long local = 0;
#pragma omp parallel for reduction(+ : local) schedule(dynamic)
    for (size_t i = 0; i < coarse.size(); ++i) local += update(coarse[i], depth, camz);
    updates += local;
  }

  // updateVoxel (hpp:113-218): recursion + adaptive split + fuse
  long long update(Node* vox, const std::vector<float>& depth, float camz) {
    long long cnt = 1;
    if (vox->hasChildren()) {
      bool all_empty = true;
      for (auto& c : vox->children) {
        long long r = update(c.get(), depth, camz);
        cnt += r < 0 ? -r : r;
        if (r >= 0) all_empty = false;
      }
      if (all_empty) vox->children.clear();
      else return cnt;
    }
    float zc = vox->cz - camz * -1.f;  // camera at (0,0,camz): z_cam = cz - camz
    zc = vox->cz - camz;
    if (zc < cfg.min_sensor || zc > cfg.max_sensor) return cnt;
    int u = (int)(vox->cx * cfg.fx / zc + cfg.cx);
    int v = (int)(vox->cy * cfg.fy / zc + cfg.cy);
    if (!(zc > 0 && u >= 0 && u < cfg.W && v >= 0 && v < cfg.H)) return cnt;
    float z_img = depth[v * cfg.W + u];
    if (std::isnan(z_img)) return cnt;
    float d_new = z_img - zc;
    if (std::fabs(d_new) < 3 * vox->maxSize() / 4 && vox->size > cfg.size / cfg.res) {
      vox->split();
      bool all_empty = true;
      for (auto& c : vox->children) {
        long long r = update(c.get(), depth, camz);
        cnt += r < 0 ? -r : r;
        if (r >= 0) all_empty = false;
      }
      if (all_empty) vox->children.clear();
      else return cnt;
    }
    if (d_new > cfg.max_dist_pos) d_new = cfg.max_dist_pos;
    else if (d_new < -cfg.max_dist_neg) return cnt;
    d_new /= cfg.max_dist_neg;
    vox->addObservation(d_new, 1.f, cfg.max_weight);
    if (vox->d < -0.99f) return cnt;
    if (vox->d < 0.99f * cfg.max_dist_pos / cfg.max_dist_neg) return cnt;
    return -cnt;  // "empty" marker, magnitude keeps the visit count
  }

  // renderView (cpp:278-424): per-pixel adaptive ray march
  long long raycast(float camz, std::vector<float>& out) {
    long long steps = 0;
    float min_step = cfg.max_dist_neg * 3.f / 4.f;
    float cell = cfg.size / cfg.res;
#pragma omp parallel for reduction(+ : steps) schedule(dynamic)
    for (int i = 0; i < cfg.W * cfg.H; ++i) {
      int px = i % cfg.W, py = i / cfg.W;
      float dx = (px - cfg.cx) / cfg.fx, dy = (py - cfg.cy) / cfg.fy, dz = 1.f;
      float n = std::sqrt(dx * dx + dy * dy + dz * dz);
      dx /= n; dy /= n; dz /= n;
      float t = cfg.min_sensor, step = min_step, last_d = 0, last_w = 0;
      bool hit = false, found = false;
      while (t < cfg.max_sensor) {
        float x = t * dx, y = t * dy, z = camz + t * dz;
        Node* vox = containing(x, y, z);
        ++steps;
        if (vox) {
          hit = true;
          float d = vox->d, w = vox->w;
          if (((d < 0 && last_d > 0) || (d > 0 && last_d < 0)) && last_w && w) {
            found = true;
            break;
          }
          last_d = d; last_w = w;
          step = std::max(cell / 4.f, std::fabs(d) * cfg.max_dist_neg);
        } else if (hit) {
          break;
        }
        t += step;
      }
      out[i] = found ? t : kNaN;
    }
    return steps;
  }
};

// ---------------------------------------------------------------------------
// Marching cubes over the octree leaves — the reference's
// MarchingCubesTSDFOctree::createSurface path (recursive leaf walk + per-cube
// corner queries + case-table triangulation,
// /root/reference/src/lib/marching_cubes_tsdf_octree.cpp:108-236). Tables are
// built at runtime with the same face-tracing construction as the framework's
// cpu_tsdf_tpu/ops/mc_tables.py so triangle SETS are comparable.
// ---------------------------------------------------------------------------

struct MCTables {
  int8_t tri[256][16];  // flat edge triples, -1 padded
  int cnt[256];
  // corner i offset: x=(i&1)^((i>>1)&1), y=(i>>2)&1, z=(i>>1)&1 (PCL order)
  int off[8][3];
  int edge[12][2] = {{0, 1}, {1, 2}, {2, 3}, {3, 0}, {4, 5}, {5, 6},
                     {6, 7}, {7, 4}, {0, 4}, {1, 5}, {2, 6}, {3, 7}};
  int faces[6][4] = {{0, 1, 2, 3}, {4, 7, 6, 5}, {0, 3, 7, 4},
                     {1, 5, 6, 2}, {0, 4, 5, 1}, {3, 2, 6, 7}};

  MCTables() {
    for (int i = 0; i < 8; ++i) {
      off[i][0] = (i & 1) ^ ((i >> 1) & 1);
      off[i][1] = (i >> 2) & 1;
      off[i][2] = (i >> 1) & 1;
    }
    int edge_of[8][8];
    for (int e = 0; e < 12; ++e) {
      edge_of[edge[e][0]][edge[e][1]] = e;
      edge_of[edge[e][1]][edge[e][0]] = e;
    }
    for (int code = 0; code < 256; ++code) {
      bool in[8];
      for (int i = 0; i < 8; ++i) in[i] = (code >> i) & 1;
      int succ[12];
      bool has[12] = {false};
      for (int f = 0; f < 6; ++f) {
        const int* fc = faces[f];
        int nin = in[fc[0]] + in[fc[1]] + in[fc[2]] + in[fc[3]];
        if (nin == 0 || nin == 4) continue;
        for (int k = 0; k < 4; ++k) {
          int a = fc[k], b = fc[(k + 1) % 4];
          if (!in[a] && in[b]) {
            int e_in = edge_of[a][b];
            int m = (k + 1) % 4;
            while (in[fc[(m + 1) % 4]]) m = (m + 1) % 4;
            int e_out = edge_of[fc[m]][fc[(m + 1) % 4]];
            succ[e_in] = e_out;
            has[e_in] = true;
          }
        }
      }
      int n = 0;
      bool visited[12] = {false};
      for (int s = 0; s < 12; ++s) {
        if (!has[s] || visited[s]) continue;
        int loop[12], len = 0, cur = s;
        do {
          loop[len++] = cur;
          visited[cur] = true;
          cur = succ[cur];
        } while (cur != s);
        for (int k = 1; k + 1 < len; ++k) {
          tri[code][n++] = (int8_t)loop[0];
          tri[code][n++] = (int8_t)loop[k];
          tri[code][n++] = (int8_t)loop[k + 1];
        }
      }
      cnt[code] = n / 3;
      for (; n < 16; ++n) tri[code][n] = -1;
    }
  }
};

static void collectLeaves(Node* n, float finest, float min_w,
                          std::vector<Node*>& out) {
  if (!n->hasChildren()) {
    if (n->size <= finest * 1.001f && n->w >= min_w && std::fabs(n->d) < 1.f)
      out.push_back(n);
    return;
  }
  for (auto& c : n->children) collectLeaves(c.get(), finest, min_w, out);
}

// returns triangles appended to verts (9 floats each); parallel over leaves
// (generous to the baseline: the reference's createSurface is serial)
static long long marchingCubes(Tsdf& tsdf, const MCTables& T, float min_w,
                               std::vector<float>& verts) {
  const Config& cfg = tsdf.cfg;
  float cell = cfg.size / cfg.res;
  float half = cfg.size / 2;
  std::vector<Node*> leaves;
  collectLeaves(tsdf.root.get(), cell, min_w, leaves);
  long long ntris = 0;
#pragma omp parallel
  {
    std::vector<float> local;
#pragma omp for schedule(dynamic, 64) reduction(+ : ntris)
    for (size_t i = 0; i < leaves.size(); ++i) {
      Node* n = leaves[i];
      // interior-only, like the reference (cpp:199-202)
      float gx = (n->cx + half) / cell, gy = (n->cy + half) / cell,
            gz = (n->cz + half) / cell;
      if (gx < 1 || gx >= cfg.res - 2 || gy < 1 || gy >= cfg.res - 2 ||
          gz < 1 || gz >= cfg.res - 2)
        continue;
      float vals[8];
      float px[8], py[8], pz[8];
      bool ok = true, any_neg = false, any_pos = false;
      for (int c = 0; c < 8 && ok; ++c) {
        px[c] = n->cx + T.off[c][0] * cell;
        py[c] = n->cy + T.off[c][1] * cell;
        pz[c] = n->cz + T.off[c][2] * cell;
        Node* v = tsdf.containing(px[c], py[c], pz[c]);
        if (!v || v->w < min_w || std::fabs(v->d) >= 1.f) { ok = false; break; }
        vals[c] = v->d * cfg.max_dist_neg;
        (vals[c] < 0 ? any_neg : any_pos) = true;
      }
      if (!ok || !any_neg || !any_pos) continue;
      int code = 0;
      for (int c = 0; c < 8; ++c) code |= (vals[c] < 0) << c;
      ntris += T.cnt[code];
      for (int k = 0; k < T.cnt[code] * 3; ++k) {
        int e = T.tri[code][k];
        int a = T.edge[e][0], b = T.edge[e][1];
        float denom = vals[b] - vals[a];
        float mu = denom == 0 ? 0.5f : (0.f - vals[a]) / denom;
        local.push_back(px[a] + mu * (px[b] - px[a]));
        local.push_back(py[a] + mu * (py[b] - py[a]));
        local.push_back(pz[a] + mu * (pz[b] - pz[a]));
      }
    }
#pragma omp critical
    verts.insert(verts.end(), local.begin(), local.end());
  }
  return ntris;
}

int main(int argc, char** argv) {
  Config cfg;
  if (argc > 1) cfg.res = atoi(argv[1]);
  int frames = argc > 2 ? atoi(argv[2]) : 10;

  // synthetic sphere depth frames (like our TPU bench): camera at z=-1.0 in
  // volume frame, sphere radius 0.5 at origin
  float camz = -1.0f;
  std::vector<float> depth(cfg.W * cfg.H);
  for (int v = 0; v < cfg.H; ++v) {
    for (int u = 0; u < cfg.W; ++u) {
      double dx = (u - cfg.cx) / cfg.fx, dy = (v - cfg.cy) / cfg.fy, dz = 1.0;
      double a = dx * dx + dy * dy + dz * dz;
      double b = -2.0 * (dz * 1.0);  // sphere center (0,0,1.0) in cam frame
      double c = 1.0 - 0.5 * 0.5;
      double disc = b * b - 4 * a * c;
      double t = (-b - std::sqrt(std::max(disc, 0.0))) / (2 * a);
      depth[v * cfg.W + u] = (disc > 0 && t > 0) ? (float)t : kNaN;
    }
  }

  Tsdf tsdf(cfg);
  auto t0 = std::chrono::steady_clock::now();
  for (int f = 0; f < frames; ++f) tsdf.integrate(depth, camz);
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  double visits_per_s = (double)tsdf.updates / dt;
  printf("integrate: res=%d frames=%d time=%.3fs voxel_visits=%lld visits/s=%.3e\n",
         cfg.res, frames, dt, tsdf.updates, visits_per_s);
  // Equivalent-dense-work rate: the dense TPU path touches res^3 voxels/frame.
  double dense_equiv = (double)cfg.res * cfg.res * cfg.res * frames / dt;
  printf("dense-equivalent voxels/s: %.3e\n", dense_equiv);

  std::vector<float> img(cfg.W * cfg.H);
  t0 = std::chrono::steady_clock::now();
  int passes = 5;
  long long steps = 0;
  for (int p = 0; p < passes; ++p) steps += tsdf.raycast(camz, img);
  t1 = std::chrono::steady_clock::now();
  dt = std::chrono::duration<double>(t1 - t0).count();
  printf("raycast: rays/s=%.3e steps/s=%.3e\n",
         (double)cfg.W * cfg.H * passes / dt, (double)steps / dt);

  // marching cubes (min_weight matching the framework bench: 0.5)
  MCTables T;
  long long tris = 0;
  std::vector<float> verts;
  t0 = std::chrono::steady_clock::now();
  int mc_passes = 3;
  for (int p = 0; p < mc_passes; ++p) {
    verts.clear();
    tris = marchingCubes(tsdf, T, 0.5f, verts);
  }
  t1 = std::chrono::steady_clock::now();
  dt = std::chrono::duration<double>(t1 - t0).count() / mc_passes;
  printf("mc: tris=%lld time=%.3fs tris/s=%.3e\n", tris, dt, (double)tris / dt);
  return 0;
}
