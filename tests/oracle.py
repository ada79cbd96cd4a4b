"""Pure-Python oracle replicating the reference C++ octree TSDF semantics.

The reference (/root/reference) has no test suite and its C++ build needs PCL,
which is unavailable here — so golden tests validate the TPU framework against
this independent, literal re-statement of the reference's *behavior* (from
SURVEY.md §2-3 and direct code reading). It is deliberately slow and simple:
a recursive pointer octree with the exact update rules of

  * OctreeNode::addObservation     /root/reference/src/lib/octree.cpp:153-163
  * Octree::getContainingVoxel     octree.cpp:113-133,627-643
  * TSDFVolumeOctree::integrateCloud / updateVoxel
                                   include/cpu_tsdf/impl/tsdf_volume_octree.hpp:48-218
  * getFrustumCulledVoxels         src/lib/tsdf_volume_octree.cpp:619-652

Only small grids (<=64^3) and images are practical.
"""

from __future__ import annotations

import math

import numpy as np


class Node:
    __slots__ = ("d", "w", "M", "nsample", "cx", "cy", "cz", "size", "children", "rgb")

    def __init__(self, cx, cy, cz, size):
        self.d = -1.0
        self.w = 0.0
        self.M = 0.0
        self.nsample = 0
        self.cx, self.cy, self.cz = cx, cy, cz
        self.size = size
        self.children = []
        self.rgb = np.zeros(3)  # RGBNode state (only exercised with color on)

    # octree.cpp:153-163 — cap applied after the average.
    def add_observation(self, d_new, w_new, max_weight, rgb=None):
        if rgb is not None:
            # RGBNode::addObservation (octree.cpp:328-337): uses pre-update w_.
            wsum = self.w + w_new
            self.rgb = np.trunc((self.w * self.rgb + w_new * np.asarray(rgb, float)) / wsum)
        d_old = self.d
        self.d = (self.d * self.w + d_new * w_new) / (self.w + w_new)
        self.w += w_new
        if self.w > max_weight:
            self.w = max_weight
        self.M += w_new * (d_new - self.d) * (d_new - d_old)
        self.nsample += 1

    def get_variance(self):
        if self.nsample < 5:
            return float("inf")
        # int division in the reference (octree.h:165): n/(n-1) == 1
        return (self.M / self.w) * (self.nsample // (self.nsample - 1))

    def max_size(self):
        return math.sqrt(3) * self.size

    def split(self):
        off = self.size / 4
        ns = self.size / 2
        self.children = [
            Node(self.cx + sx * off, self.cy + sy * off, self.cz + sz * off, ns)
            for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
        ]
        # Reference child order: index = (x>cx)*4 + (y>cy)*2 + (z>cz); the
        # comprehension above yields exactly that order (x slowest).
        return self.children

    def split_recursive(self, num_left):
        if num_left <= 0:
            return
        self.split()
        for c in self.children:
            c.split_recursive(num_left - 1)

    def get_containing(self, x, y, z, min_size=-1.0):
        if not self.children or (min_size > 0 and self.size <= min_size):
            return self
        idx = ((x - self.cx) > 0) * 4 + ((y - self.cy) > 0) * 2 + ((z - self.cz) > 0) * 1
        return self.children[idx].get_containing(x, y, z, min_size)

    def get_leaves(self, out, num_levels):
        for c in self.children:
            if c.children and num_levels != 0:
                c.get_leaves(out, num_levels - 1)
            else:
                out.append(c)


class OracleTSDF:
    """Literal restatement of TSDFVolumeOctree over a config-compatible dict."""

    def __init__(self, cfg):
        self.cfg = cfg
        # Octree::init (octree.cpp:583-599) + reset (tsdf_volume_octree.cpp:200-219)
        desired = int(max(cfg.xsize / cfg.max_cell_size_x,
                          cfg.ysize / cfg.max_cell_size_y,
                          cfg.zsize / cfg.max_cell_size_z))
        self.coarse_levels = int(math.ceil(math.log(desired) / math.log(2)))
        self.root = Node(0.0, 0.0, 0.0, cfg.xsize)
        self.root.split_recursive(self.coarse_levels)

    # octree.cpp:627-643
    def get_containing(self, x, y, z, min_size=-1.0):
        c = self.cfg
        if math.isnan(z) or abs(x) > c.xsize / 2 or abs(y) > c.ysize / 2 or abs(z) > c.zsize / 2:
            return None
        return self.root.get_containing(x, y, z, min_size)

    def frustum_culled_coarse(self, trans):
        """tsdf_volume_octree.cpp:619-652 (PCL FrustumCulling semantics)."""
        c = self.cfg
        leaves = []
        if self.coarse_levels == 0:
            leaves = [self.root]
        else:
            self.root.get_leaves(leaves, self.coarse_levels - 1)
        trans_inv = np.linalg.inv(trans)
        hfov = 1.1 * math.atan(0.5 * c.image_width / c.focal_length_x)
        vfov = 1.1 * math.atan(0.5 * c.image_height / c.focal_length_y)
        th, tv = math.tan(hfov), math.tan(vfov)
        out = []
        for n in leaves:
            p = trans_inv[:3, :3] @ np.array([n.cx, n.cy, n.cz]) + trans_inv[:3, 3]
            if (c.min_sensor_dist <= p[2] <= c.max_sensor_dist
                    and abs(p[0]) <= th * p[2] and abs(p[1]) <= tv * p[2]):
                out.append(n)
        return out

    def _reproject(self, x, y, z):
        c = self.cfg
        u = int(x * c.focal_length_x / z + c.principal_point_x)
        v = int(y * c.focal_length_y / z + c.principal_point_y)
        ok = z > 0 and 0 <= u < c.image_width and 0 <= v < c.image_height
        return u, v, ok

    def integrate(self, depth, trans, rgb=None):
        """integrateCloud (hpp:48-103). depth: [H,W] z-image; trans: camera pose."""
        c = self.cfg
        trans = np.asarray(trans, float)
        trans_inv = np.linalg.inv(trans)
        H, W = depth.shape
        finest = c.xsize / c.xres
        # Pre-split pass (hpp:57-90), num_random_splits==1 -> no noise.
        for v in range(H):
            for u in range(W):
                z = float(depth[v, u])
                if math.isnan(z):
                    continue
                x = (u - c.principal_point_x) / c.focal_length_x * z
                y = (v - c.principal_point_y) / c.focal_length_y * z
                pt = trans[:3, :3] @ np.array([x, y, z]) + trans[:3, 3]
                vox = self.get_containing(pt[0], pt[1], pt[2])
                if vox is not None:
                    while vox.size > finest:
                        vox.split()
                        vox = vox.get_containing(pt[0], pt[1], pt[2])
        for vox in self.frustum_culled_coarse(trans):
            self._update_voxel(vox, depth, rgb, trans_inv)

    def _update_voxel(self, voxel, depth, rgb, trans_inv):
        """updateVoxel (hpp:113-218). Returns 0 no-obs, 1 occupied, -1 empty."""
        c = self.cfg
        if voxel.children:
            empty = [self._update_voxel(ch, depth, rgb, trans_inv) < 0 for ch in voxel.children]
            if all(empty):
                voxel.children = []  # falls through to the leaf update below
            else:
                return 1
        p = trans_inv[:3, :3] @ np.array([voxel.cx, voxel.cy, voxel.cz]) + trans_inv[:3, 3]
        if p[2] < c.min_sensor_dist or p[2] > c.max_sensor_dist:
            return 0
        u, v, ok = self._reproject(p[0], p[1], p[2])
        if not ok:
            return 0
        z_img = float(depth[v, u])
        if math.isnan(z_img):
            return 0
        d_new = z_img - p[2]
        if abs(d_new) < 3 * voxel.max_size() / 4:
            finest = (c.xsize / c.xres, c.ysize / c.yres, c.zsize / c.zres)
            if voxel.size > finest[0] and voxel.size > finest[1] and voxel.size > finest[2]:
                voxel.split()
                empty = [self._update_voxel(ch, depth, rgb, trans_inv) < 0 for ch in voxel.children]
                if all(empty):
                    voxel.children = []
                else:
                    return 1
        if d_new > c.max_dist_pos:
            d_new = c.max_dist_pos
        elif d_new < -c.max_dist_neg:
            return 0
        d_new /= c.max_dist_neg
        w_new = 1.0
        if c.weight_by_depth:
            w_new *= 1.0 - min(z_img / 10.0, 1.0)
        if c.weight_by_variance and voxel.nsample > 5:
            w_new *= math.exp(-((d_new - voxel.d) ** 2) / (2 * voxel.get_variance()))
        obs_rgb = None
        if c.integrate_color and rgb is not None:
            obs_rgb = rgb[v, u]
        voxel.add_observation(d_new, w_new, c.max_weight, obs_rgb)
        if voxel.d < -0.99:
            return 0
        elif voxel.d < 0.99 * c.max_dist_pos / c.max_dist_neg:
            return 1
        return -1

    # ---- inspection helpers for tests ----

    def finest_leaves(self):
        """Yield (ix, iy, iz, node) for every leaf at the finest cell size."""
        c = self.cfg
        finest = c.xsize / c.xres
        out = []

        def walk(n):
            if n.children:
                for ch in n.children:
                    walk(ch)
            elif n.size <= finest * 1.0001:
                ix = int(math.floor((n.cx + c.xsize / 2) / c.xsize * c.xres))
                iy = int(math.floor((n.cy + c.ysize / 2) / c.ysize * c.yres))
                iz = int(math.floor((n.cz + c.zsize / 2) / c.zsize * c.zres))
                out.append((ix, iy, iz, n))

        walk(self.root)
        return out

    def rasterize(self):
        """Dense [xres,yres,zres] arrays of d/w at finest leaves + mask."""
        c = self.cfg
        d = np.full((c.xres, c.yres, c.zres), np.nan, np.float64)
        w = np.full((c.xres, c.yres, c.zres), np.nan, np.float64)
        mask = np.zeros((c.xres, c.yres, c.zres), bool)
        for ix, iy, iz, n in self.finest_leaves():
            d[ix, iy, iz] = n.d
            w[ix, iy, iz] = n.w
            mask[ix, iy, iz] = True
        return d, w, mask


def render_ray_reference(cfg, d_field, w_field, trans, u, v, use_trilinear=True):
    """Literal numpy restatement of TSDFVolumeOctree::renderView for ONE pixel
    over a dense (d, w) field (/root/reference/src/lib/tsdf_volume_octree.cpp:
    278-424). Returns the camera-frame hit point or None.

    Independent of the JAX implementation — used as the renderer's golden.
    """
    trans = np.asarray(trans, float)
    R = trans[:3, :3]
    t_vec = trans[:3, 3]
    du = np.array([(u - cfg.principal_point_x) / cfg.focal_length_x,
                   (v - cfg.principal_point_y) / cfg.focal_length_y, 1.0])
    du = R @ (du / np.linalg.norm(du))
    p0 = t_vec

    res = (cfg.xres, cfg.yres, cfg.zres)
    size = (cfg.xsize, cfg.ysize, cfg.zsize)

    def voxel_of(pt):
        if math.isnan(pt[2]) or abs(pt[0]) > size[0] / 2 or \
                abs(pt[1]) > size[1] / 2 or abs(pt[2]) > size[2] / 2:
            return None
        idx = [int(math.floor((pt[k] + size[k] / 2) / size[k] * res[k])) for k in range(3)]
        idx = [min(max(i, 0), r - 1) for i, r in zip(idx, res)]
        return d_field[idx[0], idx[1], idx[2]], w_field[idx[0], idx[1], idx[2]]

    def center(i, j, k):
        return np.array([(i + 0.5) * size[0] / res[0] - size[0] / 2,
                         (j + 0.5) * size[1] / res[1] - size[1] / 2,
                         (k + 0.5) * size[2] / res[2] - size[2] / 2])

    def trilinear(pt):
        xi = int(math.floor((pt[0] + size[0] / 2) / size[0] * res[0]))
        yi = int(math.floor((pt[1] + size[1] / 2) / size[1] * res[1]))
        zi = int(math.floor((pt[2] + size[2] / 2) / size[2] * res[2]))
        if xi <= 0 or xi >= res[0] - 1 or yi <= 0 or yi >= res[1] - 1 \
                or zi <= 0 or zi >= res[2] - 1:
            return float("nan"), False
        c = center(xi, yi, zi)
        if pt[0] < c[0]: xi -= 1
        if pt[1] < c[1]: yi -= 1
        if pt[2] < c[2]: zi -= 1
        c = center(xi, yi, zi)
        a = (pt[0] - c[0]) * res[0] / size[0]
        b = (pt[1] - c[1]) * res[1] / size[1]
        cc = (pt[2] - c[2]) * res[2] / size[2]
        val = 0.0
        ok = True
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    dv = d_field[xi + dx, yi + dy, zi + dz]
                    wv = w_field[xi + dx, yi + dy, zi + dz]
                    ok &= wv > 0
                    wgt = (a if dx else 1 - a) * (b if dy else 1 - b) * (cc if dz else 1 - cc)
                    val += wgt * dv
        return val, ok

    min_step = cfg.max_dist_neg * 3.0 / 4.0
    t = cfg.min_sensor_dist
    step = min_step
    last_d = 0.0
    last_w = 0.0
    hit_voxel = False
    found = False
    while t < cfg.max_sensor_dist:
        pt = p0 + t * du
        vox = voxel_of(pt)
        if vox is not None:
            hit_voxel = True
            d, w = vox
            if ((d < 0 and last_d > 0) or (d > 0 and last_d < 0)) and last_w and w:
                found = True
                old_t = t - step
                step = (size[2] / res[2]) / 2.0
                while t >= old_t:
                    t -= step
                    vox2 = voxel_of(p0 + t * du)
                    if vox2 is None:
                        break
                    nd, nw = vox2
                    if (last_d > 0 and nd > 0) or (last_d < 0 and nd < 0):
                        last_d, last_w = nd, nw
                        t += step
                        break
                break
            last_d, last_w = d, w
            step = max(size[0] / res[0] / 4.0, abs(d) * cfg.max_dist_neg)
        else:
            if hit_voxel:
                break
        t += step
    if not found:
        return None
    ld, ok1 = trilinear(p0 + (t - step) * du)
    dd, ok2 = trilinear(p0 + t * du)
    if not (ok1 and ok2) or math.isnan(dd) or math.isnan(ld):
        return None
    t_star = t + step * (-1.0 + abs(ld / (ld - dd)))
    hit = p0 + t_star * du
    return np.linalg.inv(trans)[:3, :3] @ hit + np.linalg.inv(trans)[:3, 3]
