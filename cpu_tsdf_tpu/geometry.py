"""Pure-JAX grid geometry: world <-> voxel index math, projection, frustum tests.

TPU-native replacement for the reference's pointer-octree coordinate walk
(``/root/reference/src/lib/octree.cpp:113-133``) and the voxel-index helpers
(``/root/reference/src/lib/tsdf_volume_octree.cpp:553-574,611-617``).

All functions are shape-polymorphic over leading batch dims and jit/vmap/shard-safe.
Conventions:
  * volume is centered at the world origin; voxel (i,j,k) has center
    ((i+0.5)*cell - size/2) per axis (tsdf_volume_octree.cpp:553-560)
  * pixel coordinates: u = x*fx/z + cx truncated toward zero (C++ int cast,
    tsdf_volume_octree.cpp:611-617)
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import TSDFConfig


def voxel_center(cfg: TSDFConfig, ix, iy, iz):
    """Center of voxel (ix,iy,iz) in the volume frame. tsdf_volume_octree.cpp:553-560."""
    cx, cy, cz = cfg.cell_size
    x = (ix + 0.5) * cx - cfg.xsize / 2.0
    y = (iy + 0.5) * cy - cfg.ysize / 2.0
    z = (iz + 0.5) * cz - cfg.zsize / 2.0
    return x, y, z


def voxel_index(cfg: TSDFConfig, x, y, z):
    """floor() voxel index of a point; also returns in-bounds mask.

    tsdf_volume_octree.cpp:562-574. NOTE: the reference computes the offset
    math in double; this runs in the input dtype (f32 under the default jax
    config), so points within f32 rounding of a voxel boundary can floor to
    the adjacent index relative to the reference — an inherent half-ULP
    divergence, not exact parity (tests use tilted poses to stay off the
    degenerate boundaries).
    """
    ix = jnp.floor((x + cfg.xsize / 2.0) / cfg.xsize * cfg.xres).astype(jnp.int32)
    iy = jnp.floor((y + cfg.ysize / 2.0) / cfg.ysize * cfg.yres).astype(jnp.int32)
    iz = jnp.floor((z + cfg.zsize / 2.0) / cfg.zsize * cfg.zres).astype(jnp.int32)
    valid = (
        (ix >= 0) & (iy >= 0) & (iz >= 0)
        & (ix < cfg.xres) & (iy < cfg.yres) & (iz < cfg.zres)
    )
    return ix, iy, iz, valid


def in_volume(cfg: TSDFConfig, x, y, z):
    """Bounds test used by Octree::getContainingVoxel (octree.cpp:627-643).

    NaN z is rejected; |coord| > size/2 is outside.
    """
    return (
        ~jnp.isnan(z)
        & (jnp.abs(x) <= cfg.xsize / 2.0)
        & (jnp.abs(y) <= cfg.ysize / 2.0)
        & (jnp.abs(z) <= cfg.zsize / 2.0)
    )


def reproject_point(cfg: TSDFConfig, x, y, z):
    """Project a camera-frame point to integer pixel coords.

    Replicates tsdf_volume_octree.cpp:611-617 including the C++ float->int cast,
    which truncates toward zero (so u in (-1, 0) maps to pixel 0 and still
    counts as in-bounds).
    """
    uf = x * cfg.focal_length_x / z + cfg.principal_point_x
    vf = y * cfg.focal_length_y / z + cfg.principal_point_y
    # .astype(int32) truncates toward zero, matching C++ (int) conversion.
    u = jnp.trunc(uf).astype(jnp.int32)
    v = jnp.trunc(vf).astype(jnp.int32)
    valid = (z > 0) & (u >= 0) & (u < cfg.image_width) & (v >= 0) & (v < cfg.image_height)
    return u, v, valid


def transform_points(mat4, x, y, z):
    """Apply a 4x4 (or 3x4) rigid transform to xyz coordinate arrays."""
    m = jnp.asarray(mat4)
    nx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + m[0, 3]
    ny = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + m[1, 3]
    nz = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + m[2, 3]
    return nx, ny, nz


def rotate_vectors(mat4, x, y, z):
    """Apply only the rotation part of a 4x4 transform."""
    m = jnp.asarray(mat4)
    nx = m[0, 0] * x + m[0, 1] * y + m[0, 2] * z
    ny = m[1, 0] * x + m[1, 1] * y + m[1, 2] * z
    nz = m[2, 0] * x + m[2, 1] * y + m[2, 2] * z
    return nx, ny, nz


def rigid_inverse(mat4):
    """Analytic inverse of a rigid 4x4 transform: [R^T, -R^T t]."""
    m = jnp.asarray(mat4)
    R = m[:3, :3]
    t = m[:3, 3]
    Rt = R.T
    out = jnp.eye(4, dtype=m.dtype)
    out = out.at[:3, :3].set(Rt)
    out = out.at[:3, 3].set(-Rt @ t)
    return out


def frustum_contains(cfg: TSDFConfig, trans_inv, x, y, z, fov_pad: float = 1.1):
    """Vectorized frustum test on volume-frame points.

    TPU-native replacement for pcl::FrustumCulling as configured at
    tsdf_volume_octree.cpp:619-652: FOV = fov_pad * image FOV from intrinsics,
    near/far = sensor bounds. `trans_inv` maps volume frame -> camera frame.
    """
    import math

    cx, cy, cz = transform_points(trans_inv, x, y, z)
    # PCL pads the ANGLE: fov = fov_pad * 2*atan(0.5*w/f) (cpp:641-642).
    tan_h = math.tan(fov_pad * math.atan(0.5 * cfg.image_width / cfg.focal_length_x))
    tan_v = math.tan(fov_pad * math.atan(0.5 * cfg.image_height / cfg.focal_length_y))
    return (
        (cz >= cfg.min_sensor_dist)
        & (cz <= cfg.max_sensor_dist)
        & (jnp.abs(cx) <= tan_h * cz)
        & (jnp.abs(cy) <= tan_v * cz)
    )
