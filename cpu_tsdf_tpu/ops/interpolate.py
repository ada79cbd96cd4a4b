"""Field queries: trilinear sampling and analytic value/gradient/Hessian.

TPU-native replacement for the reference's per-point octree descents:
  * ``interpolateTrilinearly``        /root/reference/src/lib/tsdf_volume_octree.cpp:486-541
  * ``getFxn/getGradient/getHessian`` tsdf_volume_octree.cpp:654-794 (tent kernel)
  * ``getNeighbors``                  tsdf_volume_octree.cpp:796-828

Everything is a pure vectorized function of the dense SDF/weight arrays; the
reference's "differentiable API" (analytic first/second derivatives of the
interpolated field) is provided both in closed form (fast path, exact parity)
and via ``jax.grad`` of the trilinear sampler (for arbitrary composition).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import TSDFConfig
from ..geometry import voxel_center, voxel_index


def _corner_base(cfg: TSDFConfig, x, y, z, adjusted_bounds: bool = False):
    """Select the lower corner voxel of the 8-cell interpolation neighborhood.

    Replicates the reference's two-step logic (cpp:489-501): floor index, then
    step back along axes where the point is below the voxel center.

    The two reference entry points bound DIFFERENT indices:
      * interpolateTrilinearly (cpp:491) checks the UN-adjusted index
        strictly inside [1, res-2] — an edge quirk we keep for the trilinear
        path (adjusted_bounds=False);
      * getNeighbors (cpp:809-811, behind getFxn/getGradient/getHessian)
        checks the ADJUSTED corner base in [0, res-2] — so the half-voxel
        shells at the volume faces are valid there (adjusted_bounds=True).
    """
    ix, iy, iz, exists = voxel_index(cfg, x, y, z)
    valid = exists & (ix > 0) & (ix < cfg.xres - 1) & (iy > 0) & (iy < cfg.yres - 1) \
        & (iz > 0) & (iz < cfg.zres - 1)
    cx, cy, cz = voxel_center(cfg, ix, iy, iz)
    ix = jnp.where(x < cx, ix - 1, ix)
    iy = jnp.where(y < cy, iy - 1, iy)
    iz = jnp.where(z < cz, iz - 1, iz)
    if adjusted_bounds:
        valid = exists & (ix >= 0) & (ix < cfg.xres - 1) & (iy >= 0) \
            & (iy < cfg.yres - 1) & (iz >= 0) & (iz < cfg.zres - 1)
    return ix, iy, iz, valid


def _gather8(grid, ix, iy, iz, Y, Z):
    """Gather the 8 cube corners [d000..d111] from a flattened [X*Y*Z] array."""
    lin = (ix * Y + iy) * Z + iz
    flat = grid.reshape(-1)
    g = lambda off: jnp.take(flat, lin + off, mode="clip")
    d000 = g(0)
    d001 = g(1)
    d010 = g(Z)
    d011 = g(Z + 1)
    d100 = g(Y * Z)
    d101 = g(Y * Z + 1)
    d110 = g(Y * Z + Z)
    d111 = g(Y * Z + Z + 1)
    return d000, d001, d010, d011, d100, d101, d110, d111


def trilinear(cfg: TSDFConfig, sdf, weight, x, y, z):
    """Trilinearly interpolated TSDF at world points. Returns (value, valid).

    Parity with interpolateTrilinearly (cpp:486-541): value computed regardless
    of weight validity; `valid` requires all 8 corner weights > 0 and interior
    indices. Differentiable w.r.t. sdf and the query point.
    """
    ix, iy, iz, valid = _corner_base(cfg, x, y, z)
    ixc = jnp.clip(ix, 0, cfg.xres - 2)
    iyc = jnp.clip(iy, 0, cfg.yres - 2)
    izc = jnp.clip(iz, 0, cfg.zres - 2)
    vx, vy, vz = voxel_center(cfg, ixc, iyc, izc)
    a = (x - vx) * cfg.xres / cfg.xsize
    b = (y - vy) * cfg.yres / cfg.ysize
    c = (z - vz) * cfg.zres / cfg.zsize

    d000, d001, d010, d011, d100, d101, d110, d111 = _gather8(sdf, ixc, iyc, izc, cfg.yres, cfg.zres)
    w000, w001, w010, w011, w100, w101, w110, w111 = _gather8(weight, ixc, iyc, izc, cfg.yres, cfg.zres)
    valid &= (w000 > 0) & (w001 > 0) & (w010 > 0) & (w011 > 0) \
        & (w100 > 0) & (w101 > 0) & (w110 > 0) & (w111 > 0)

    val = (d000 * (1 - a) * (1 - b) * (1 - c)
           + d001 * (1 - a) * (1 - b) * c
           + d010 * (1 - a) * b * (1 - c)
           + d011 * (1 - a) * b * c
           + d100 * a * (1 - b) * (1 - c)
           + d101 * a * (1 - b) * c
           + d110 * a * b * (1 - c)
           + d111 * a * b * c)
    return val, valid


def nearest(cfg: TSDFConfig, sdf, weight, x, y, z):
    """Nearest-voxel TSDF lookup (the use_trilinear_interpolation=False path,
    cpp:466-477). Returns (value, valid) with valid = in-bounds and w > 0."""
    ix, iy, iz, exists = voxel_index(cfg, x, y, z)
    lin = (jnp.clip(ix, 0, cfg.xres - 1) * cfg.yres + jnp.clip(iy, 0, cfg.yres - 1)) \
        * cfg.zres + jnp.clip(iz, 0, cfg.zres - 1)
    d = jnp.take(sdf.reshape(-1), lin, mode="clip")
    w = jnp.take(weight.reshape(-1), lin, mode="clip")
    return d, exists & (w > 0)


def tsdf_value(cfg: TSDFConfig, sdf, weight, x, y, z):
    """getTSDFValue dispatch (cpp:453-478)."""
    if cfg.use_trilinear_interpolation:
        return trilinear(cfg, sdf, weight, x, y, z)
    return nearest(cfg, sdf, weight, x, y, z)


def _sgn(v):
    """Reference sgn: x > 0 ? 1 : -1 (cpp:674-678; zero maps to -1)."""
    return jnp.where(v > 0, 1.0, -1.0)


def fxn_gradient_hessian(cfg: TSDFConfig, sdf, x, y, z):
    """Analytic tent-kernel value, gradient and Hessian of the TSDF field.

    Parity with getFxnGradientAndHessian (cpp:756-794): linear B-spline over
    the 8 surrounding voxel centers; the Hessian has only mixed partials (the
    diagonal of a piecewise-trilinear interpolant is identically zero).
    Uses cell size c = xsize/xres on every axis, exactly like the reference
    (cubic-cell assumption at cpp:663,689,711,770).

    Returns (val, grad[...,3], hess[...,3,3], valid). Unlike the trilinear
    sampler, weights are NOT consulted, and the bounds check is on the
    ADJUSTED corner base (getNeighbors semantics — boundary half-shells are
    valid here though the trilinear sampler rejects them).
    """
    ix, iy, iz, valid = _corner_base(cfg, x, y, z, adjusted_bounds=True)
    ixc = jnp.clip(ix, 0, cfg.xres - 2)
    iyc = jnp.clip(iy, 0, cfg.yres - 2)
    izc = jnp.clip(iz, 0, cfg.zres - 2)
    c = cfg.xsize / cfg.xres

    val = jnp.zeros_like(x)
    gx = jnp.zeros_like(x)
    gy = jnp.zeros_like(x)
    gz = jnp.zeros_like(x)
    hxy = jnp.zeros_like(x)
    hxz = jnp.zeros_like(x)
    hyz = jnp.zeros_like(x)
    corners = _gather8(sdf, ixc, iyc, izc, cfg.yres, cfg.zres)
    for idx, (dx, dy, dz) in enumerate(
            [(0, 0, 0), (0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]):
        ctr_x, ctr_y, ctr_z = voxel_center(cfg, ixc + dx, iyc + dy, izc + dz)
        d = corners[idx]
        rx, ry, rz = x - ctr_x, y - ctr_y, z - ctr_z
        tx, ty, tz = c - jnp.abs(rx), c - jnp.abs(ry), c - jnp.abs(rz)
        val += tx * ty * tz * d
        gx += -_sgn(rx) * ty * tz * d
        gy += tx * -_sgn(ry) * tz * d
        gz += tx * ty * -_sgn(rz) * d
        hxy += _sgn(rx) * _sgn(ry) * tz * d
        hxz += _sgn(rx) * ty * _sgn(rz) * d
        hyz += tx * _sgn(ry) * _sgn(rz) * d
    c3 = c ** 3
    val = val / c3
    grad = jnp.stack([gx, gy, gz], -1) / c3
    zeros = jnp.zeros_like(hxy)
    hess = jnp.stack([
        jnp.stack([zeros, hxy, hxz], -1),
        jnp.stack([hxy, zeros, hyz], -1),
        jnp.stack([hxz, hyz, zeros], -1),
    ], -2) / c3
    return val, grad, hess, valid


def fxn(cfg: TSDFConfig, sdf, x, y, z):
    """getFxn (cpp:654-672)."""
    val, _, _, valid = fxn_gradient_hessian(cfg, sdf, x, y, z)
    return val, valid


def gradient(cfg: TSDFConfig, sdf, x, y, z):
    """getGradient (cpp:680-700)."""
    _, grad, _, valid = fxn_gradient_hessian(cfg, sdf, x, y, z)
    return grad, valid


def hessian(cfg: TSDFConfig, sdf, x, y, z):
    """getHessian (cpp:702-725)."""
    _, _, hess, valid = fxn_gradient_hessian(cfg, sdf, x, y, z)
    return hess, valid


# ---------------------------------------------------------------------------
# volume-level API: works for dense TSDFVolume AND block-sparse BrickVolume
# through the uniform gather in cpu_tsdf_tpu.bricks
# ---------------------------------------------------------------------------

def trilinear_vol(vol, x, y, z):
    """Trilinear interpolation over either volume representation."""
    from ..bricks import gather_dw

    cfg = vol.config
    ix, iy, iz, valid = _corner_base(cfg, x, y, z)
    ixc = jnp.clip(ix, 0, cfg.xres - 2)
    iyc = jnp.clip(iy, 0, cfg.yres - 2)
    izc = jnp.clip(iz, 0, cfg.zres - 2)
    vx, vy, vz = voxel_center(cfg, ixc, iyc, izc)
    a = (x - vx) * cfg.xres / cfg.xsize
    b = (y - vy) * cfg.yres / cfg.ysize
    c = (z - vz) * cfg.zres / cfg.zsize
    val = jnp.zeros_like(a)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                d, w = gather_dw(vol, ixc + dx, iyc + dy, izc + dz)
                valid &= w > 0
                wx = a if dx else (1 - a)
                wy = b if dy else (1 - b)
                wz = c if dz else (1 - c)
                val = val + d * wx * wy * wz
    return val, valid


def nearest_vol(vol, x, y, z):
    from ..bricks import gather_dw

    cfg = vol.config
    ix, iy, iz, exists = voxel_index(cfg, x, y, z)
    d, w = gather_dw(vol, ix, iy, iz)
    return d, exists & (w > 0)


def tsdf_value_vol(vol, x, y, z):
    """getTSDFValue dispatch (cpp:453-478) over either volume type."""
    if vol.config.use_trilinear_interpolation:
        return trilinear_vol(vol, x, y, z)
    return nearest_vol(vol, x, y, z)


def fxn_gradient_hessian_vol(vol, x, y, z):
    """Tent-kernel value/grad/Hessian over either volume representation."""
    from ..bricks import gather_dw

    cfg = vol.config
    ix, iy, iz, valid = _corner_base(cfg, x, y, z, adjusted_bounds=True)
    ixc = jnp.clip(ix, 0, cfg.xres - 2)
    iyc = jnp.clip(iy, 0, cfg.yres - 2)
    izc = jnp.clip(iz, 0, cfg.zres - 2)
    c = cfg.xsize / cfg.xres
    val = jnp.zeros_like(x)
    gx = jnp.zeros_like(x); gy = jnp.zeros_like(x); gz = jnp.zeros_like(x)
    hxy = jnp.zeros_like(x); hxz = jnp.zeros_like(x); hyz = jnp.zeros_like(x)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ctr_x, ctr_y, ctr_z = voxel_center(cfg, ixc + dx, iyc + dy, izc + dz)
                d, _ = gather_dw(vol, ixc + dx, iyc + dy, izc + dz)
                rx, ry, rz = x - ctr_x, y - ctr_y, z - ctr_z
                tx, ty, tz = c - jnp.abs(rx), c - jnp.abs(ry), c - jnp.abs(rz)
                val += tx * ty * tz * d
                gx += -_sgn(rx) * ty * tz * d
                gy += tx * -_sgn(ry) * tz * d
                gz += tx * ty * -_sgn(rz) * d
                hxy += _sgn(rx) * _sgn(ry) * tz * d
                hxz += _sgn(rx) * ty * _sgn(rz) * d
                hyz += tx * _sgn(ry) * _sgn(rz) * d
    c3 = c ** 3
    zeros = jnp.zeros_like(hxy)
    hess = jnp.stack([
        jnp.stack([zeros, hxy, hxz], -1),
        jnp.stack([hxy, zeros, hyz], -1),
        jnp.stack([hxz, hyz, zeros], -1),
    ], -2) / c3
    return val / c3, jnp.stack([gx, gy, gz], -1) / c3, hess, valid


def fxn_autodiff_gradient(cfg: TSDFConfig, sdf, x, y, z):
    """Gradient of the tent-kernel field via jax.grad — the "collapses into
    jax.grad" story from SURVEY §3.5; used in tests to cross-check the
    analytic form."""
    def f(pt):
        v, *_ = fxn_gradient_hessian(cfg, sdf, pt[0], pt[1], pt[2])
        return v

    pts = jnp.stack([x, y, z], -1)
    flat = pts.reshape(-1, 3)
    g = jax.vmap(jax.grad(f))(flat)
    return g.reshape(pts.shape)
