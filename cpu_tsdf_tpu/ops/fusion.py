"""Projective TSDF integration: the hot op of the framework.

TPU-native re-design of ``TSDFVolumeOctree::integrateCloud`` / ``updateVoxel``
(``/root/reference/include/cpu_tsdf/impl/tsdf_volume_octree.hpp:48-218``).

The reference is voxel-centric (project each octree voxel center into the depth
image, recursively splitting near the surface). Here the volume is a dense SoA
grid, so integration is one fused elementwise-plus-gather computation over all
voxels: project every voxel center, gather its depth pixel, apply the
truncate -> normalize -> weighted-average -> cap update. No recursion, no
data-dependent control flow — XLA fuses the whole thing into a few
bandwidth-bound loops, and the same function shards over a device mesh by slab
(see :mod:`cpu_tsdf_tpu.parallel`).

Semantics replicated exactly from the reference (per finest voxel):
  * sensor-bound and projection gating       hpp:146-153
  * d_new = depth(u,v) - z_cam               hpp:159 (projective, not Euclidean)
  * clamp +max_dist_pos; DROP beyond -max_dist_neg (no space carving)
                                             hpp:189-196
  * normalize by max_dist_neg only           hpp:198 (asymmetric by design)
  * optional depth / variance weighting      hpp:200-204
  * weighted average with weight cap applied AFTER the average
                                             octree.cpp:153-163
  * Welford variance accumulator M, nsample  octree.cpp:160-161

Deliberate divergence (documented, also SURVEY.md quirk list): the reference
stores coarse octree cells far outside the truncation band with one shared
sample; the dense grid gives every voxel its own projective sample. Fields are
identical wherever the reference's leaves have a purely finest-level history.
When a node splits LATE — a trajectory brings a region into the truncation
band only after coarse-phase observations — the reference's split() creates
fresh children (octree.cpp:244-267), discarding the pre-split accumulation,
while the dense grid keeps every per-voxel sample; those (rare) leaves carry
more history here than in the reference (quantified: <2% of leaves on the
real-scene trajectory golden, tests/test_realscene_golden.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import TSDFConfig
from ..geometry import frustum_contains, reproject_point, rigid_inverse, transform_points
from ..volume import TSDFVolume, voxel_centers_grid
from . import color as color_ops


def coarse_cell_frustum(cfg: TSDFConfig, trans_inv, vx, vy, vz):
    """Frustum test of the COARSE CELL containing voxel indices (vx, vy, vz).

    Replicates the reference's coarse-cell frustum culling: octree cells at
    the max_cell level are tested by their centers against a 1.1x-FOV frustum
    (tsdf_volume_octree.cpp:619-652); every fine voxel inside a culled-out
    cell is skipped for the whole frame, even if it projects into the image.

    Pure arithmetic per voxel (cell index -> cell center -> frustum test);
    deliberately gather-free — TPU gathers are ~3 orders of magnitude slower
    than the VPU math.
    """
    L = cfg.num_coarse_levels
    n = 1 << L  # coarse cells per axis (init subdivides uniformly, octree.cpp:585-599)
    gx = (vx * n) // cfg.xres
    gy = (vy * n) // cfg.yres
    gz = (vz * n) // cfg.zres
    ccx = (gx.astype(jnp.float32) + 0.5) * (cfg.xsize / n) - cfg.xsize / 2
    ccy = (gy.astype(jnp.float32) + 0.5) * (cfg.ysize / n) - cfg.ysize / 2
    ccz = (gz.astype(jnp.float32) + 0.5) * (cfg.zsize / n) - cfg.zsize / 2
    return frustum_contains(cfg, trans_inv, ccx, ccy, ccz)


def coarse_frustum_mask(cfg: TSDFConfig, trans_inv):
    """Dense [xres,yres,zres] version of :func:`coarse_cell_frustum`."""
    vx = jnp.arange(cfg.xres, dtype=jnp.int32)[:, None, None]
    vy = jnp.arange(cfg.yres, dtype=jnp.int32)[None, :, None]
    vz = jnp.arange(cfg.zres, dtype=jnp.int32)[None, None, :]
    return coarse_cell_frustum(cfg, trans_inv, vx, vy, vz)


def _gather_image(img, v, u):
    """img[v, u] with clipped indices (callers mask validity separately)."""
    H, W = img.shape[:2]
    vs = jnp.clip(v, 0, H - 1)
    us = jnp.clip(u, 0, W - 1)
    return img[vs, us]


def fuse_observation(d, w, M, nsample, d_new, w_new, max_weight):
    """One weighted-average fusion step, replicating OctreeNode::addObservation
    (octree.cpp:153-163): cap applied after the average so late observations
    keep nudging a saturated voxel.
    """
    wsum = w + w_new
    # wsum == 0 (unseen voxel + zero-weight observation, e.g. a >= 10 m
    # reading under weight_by_depth) must keep the old d: substituting the
    # denominator alone wrote a phantom d=0 "surface" at weight 0
    d_upd = jnp.where(wsum > 0,
                      (d * w + d_new * w_new) / jnp.where(wsum > 0, wsum, 1.0),
                      d)
    w_upd = jnp.minimum(wsum, max_weight)
    M_upd = M + w_new * (d_new - d_upd) * (d_new - d)
    return d_upd, w_upd, M_upd, nsample + 1


def voxel_variance(M, w, nsample):
    """OctreeNode::getVariance (octree.cpp:281-287); inf below 5 samples."""
    # getVariance computes (M/w)*(nsample/(nsample-1)) with INT nsample_
    # (octree.h:165), so the correction factor is integer division == 1 for
    # every reachable n >= 5 — reference variance is exactly M/w
    var = M / jnp.where(w > 0, w, 1.0)
    return jnp.where(nsample < 5, jnp.inf, var)


def compute_observation(cfg: TSDFConfig, depth, pose_inv, cx, cy, cz):
    """Per-voxel projective observation for voxel centers (cx, cy, cz).

    Returns (d_normalized, w_new, valid, z_img, u, v). Pure function of the
    depth image and camera pose; differentiable w.r.t. depth and pose_inv.
    """
    vx, vy, vz = transform_points(pose_inv, cx, cy, cz)
    in_range = (vz >= cfg.min_sensor_dist) & (vz <= cfg.max_sensor_dist)
    u, v, proj_ok = reproject_point(cfg, vx, vy, vz)
    z_img = _gather_image(depth, v, u)
    valid = in_range & proj_ok & ~jnp.isnan(z_img)
    d_new = z_img - vz
    # Observations behind the surface beyond -max_dist_neg are dropped entirely
    # (hpp:193-196): no space carving beyond the truncation band.
    valid &= d_new >= -cfg.max_dist_neg
    d_new = jnp.minimum(d_new, cfg.max_dist_pos) / cfg.max_dist_neg

    w_new = jnp.ones_like(d_new)
    if cfg.weight_by_depth:
        # Scales so a 10 m reading is worthless (hpp:200-202).
        w_new = w_new * (1.0 - jnp.minimum(z_img / 10.0, 1.0))
    return d_new, w_new, valid, z_img, u, v


@partial(jax.jit, donate_argnums=(0,))
def integrate(vol: TSDFVolume, depth: jnp.ndarray, pose: jnp.ndarray,
              rgb: Optional[jnp.ndarray] = None) -> TSDFVolume:
    """Fuse one registered depth frame into the volume.

    Args:
      vol: current volume state (donated; updated functionally).
      depth: [H, W] float32 depth in meters, NaN where missing (the z channel
        of the reference's organized cloud).
      pose: [4, 4] camera-to-volume transform (the reference's ``trans``,
        hpp:48-54 — the camera pose in the volume frame).
      rgb: optional [H, W, 3] float32 (0..255) color image.

    Returns the updated volume.
    """
    cfg = vol.config
    pose_inv = rigid_inverse(jnp.asarray(pose, jnp.float32))
    cx, cy, cz = voxel_centers_grid(cfg)
    d_obs, w_obs, valid, _, u, v = compute_observation(cfg, depth, pose_inv, cx, cy, cz)
    if cfg.frustum_culling:
        valid &= coarse_frustum_mask(cfg, pose_inv)

    if cfg.weight_by_variance:
        var = voxel_variance(vol.M, vol.weight, vol.nsample)
        # exp(logNormal(d_new, d_old, var)) gate above 5 samples (hpp:203-204).
        scale = jnp.exp(-((d_obs - vol.sdf) ** 2) / (2.0 * var))
        w_obs = w_obs * jnp.where(vol.nsample > 5, scale, 1.0)

    d_upd, w_upd, M_upd, n_upd = fuse_observation(
        vol.sdf, vol.weight, vol.M, vol.nsample, d_obs, w_obs, cfg.max_weight)

    new_color = vol.color
    if vol.color is not None and rgb is not None:
        # trunc mirrors the reference's uint8 color observations
        # (octree.cpp addObservation takes bytes) and keeps every engine —
        # dense XLA, brick XLA, Pallas packed lookup — fusing identical
        # values for non-integer rgb input
        rgb = jnp.trunc(rgb.astype(jnp.float32))
        r = _gather_image(rgb[..., 0], v, u)
        g = _gather_image(rgb[..., 1], v, u)
        b = _gather_image(rgb[..., 2], v, u)
        upd = color_ops.update_color(cfg.color_mode, vol.color, vol.weight, r, g, b, w_obs)
        new_color = jnp.where(valid[..., None], upd, vol.color)

    return TSDFVolume(
        sdf=jnp.where(valid, d_upd, vol.sdf),
        weight=jnp.where(valid, w_upd, vol.weight),
        M=jnp.where(valid, M_upd, vol.M),
        nsample=jnp.where(valid, n_upd, vol.nsample),
        color=new_color,
        global_transform=vol.global_transform,
        config=cfg,
    )
