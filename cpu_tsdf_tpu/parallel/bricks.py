"""Multi-chip brick-sparse integration: spatial slab sharding via shard_map.

SURVEY §5's TPU-native scaling story for the integrate side: the brick table
is block-distributed over the mesh. Device d owns the X-slab of the brick
grid ``bx in [d*nbx/D, (d+1)*nbx/D)`` — its slice of ``brick_map`` plus its
own partition of the data arrays with its own allocation counter and its own
reserved dump row. A frame integrates with ZERO collectives: the depth image
and pose replicate, every device activates/allocates/updates only its slab,
and brick updates never cross slab boundaries (bricks are disjoint).

Global slot ids are ``device * local_capacity + local_slot``, so gathering
the sharded arrays back yields a plain, valid :class:`BrickVolume`
(``merge_sharded``) that every single-device op (render, marching cubes,
field queries, checkpointing) consumes unchanged.

The Pallas fusion kernel is single-device-only for now (Pallas-in-shard_map
on this toolchain is round-2 work); the sharded body uses the XLA update
path, which GSPMD keeps device-local.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..bricks import BrickVolume, make_brick_volume
from ..config import TSDFConfig
from ..geometry import rigid_inverse, transform_points
from .sharding import AXIS


def make_sharded_brick_volume(cfg: TSDFConfig, mesh: Mesh, brick_size: int = 8,
                              capacity_per_device: int = 1 << 12) -> BrickVolume:
    """Brick volume laid out for slab sharding: brick_map sharded on x,
    data arrays sharded by slot partition, n_active as a [D] vector."""
    D = mesh.devices.size
    B = brick_size
    nbx = cfg.xres // B
    assert nbx % D == 0, (nbx, D)
    bv = make_brick_volume(cfg, brick_size, capacity_per_device * D)
    bv = dataclasses.replace(bv, n_active=jnp.zeros((D,), jnp.int32))

    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    return dataclasses.replace(
        bv,
        brick_map=put(bv.brick_map, P(AXIS)),
        n_active=put(bv.n_active, P(AXIS)),
        coords=put(bv.coords, P(AXIS)),
        sdf=put(bv.sdf, P(AXIS)),
        weight=put(bv.weight, P(AXIS)),
        M=put(bv.M, P(AXIS)),
        nsample=put(bv.nsample, P(AXIS)),
        color=None if bv.color is None else put(bv.color, P(AXIS)),
        overflowed=put(bv.overflowed, P()),
        global_transform=put(bv.global_transform, P()),
    )


@partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,))
def _integrate_sharded_jit(bv: BrickVolume, depth, pose, update_budget: int,
                           mesh: Mesh) -> BrickVolume:
    cfg = bv.config
    B = bv.brick_size
    D = mesh.devices.size
    C_local = bv.capacity // D
    nbx, nby, nbz = bv.bricks_per_axis
    nbx_local = nbx // D
    pose = jnp.asarray(pose, jnp.float32)
    pose_inv = rigid_inverse(pose)

    def body(brick_map_l, n_active_l, coords_l, sdf_l, w_l, M_l, n_l, ovf,
             depth_r, pose_r, pose_inv_r):
        dev = jax.lax.axis_index(AXIS)
        bx0 = dev * nbx_local

        # ---- slab-local band activation (bricks.py:_band_brick_mask) ----
        H, W = depth_r.shape
        cell = min(cfg.cell_size)
        band_lo = -(cfg.max_dist_neg + cell)
        band_hi = cfg.max_dist_pos + cell
        spacing = B * cell
        n_samples = int(np.ceil((band_hi - band_lo) / spacing)) + 1
        uu = jnp.arange(W, dtype=jnp.float32)[None, :]
        vv = jnp.arange(H, dtype=jnp.float32)[:, None]
        rx = (uu - cfg.principal_point_x) / cfg.focal_length_x
        ry = (vv - cfg.principal_point_y) / cfg.focal_length_y
        valid_px = ~jnp.isnan(depth_r)
        mask = jnp.zeros((nbx_local * nby * nbz + 1,), jnp.int32)
        for k in range(n_samples):
            zk = jnp.minimum(depth_r + band_lo + k * spacing, depth_r + band_hi)
            wx, wy, wz = transform_points(pose_r, rx * zk, ry * zk, zk)
            ix = jnp.floor((wx + cfg.xsize / 2) / cfg.xsize * cfg.xres).astype(jnp.int32)
            iy = jnp.floor((wy + cfg.ysize / 2) / cfg.ysize * cfg.yres).astype(jnp.int32)
            iz = jnp.floor((wz + cfg.zsize / 2) / cfg.zsize * cfg.zres).astype(jnp.int32)
            ok = valid_px & (ix >= 0) & (ix < cfg.xres) & (iy >= 0) \
                & (iy < cfg.yres) & (iz >= 0) & (iz < cfg.zres)
            # x-dilation happens HERE (during scattering) so that samples in a
            # NEIGHBOR slab can activate this slab's boundary bricks; y/z
            # dilation is slab-local and applied after the scatter.
            bxl = ix // B - bx0
            for dxo in (-1, 0, 1):
                bxl2 = bxl + dxo
                ok2 = ok & (bxl2 >= 0) & (bxl2 < nbx_local)
                blin = (bxl2 * nby + (iy // B)) * nbz + (iz // B)
                blin = jnp.where(ok2, blin, nbx_local * nby * nbz)
                mask = mask.at[blin.reshape(-1)].max(1)
        m = mask[:-1].reshape(nbx_local, nby, nbz) > 0
        for ax in range(1, 3):
            mp = jnp.pad(m, [(1, 1) if a == ax else (0, 0) for a in range(3)])
            sl_lo = tuple(slice(0, -2) if a == ax else slice(None) for a in range(3))
            sl_hi = tuple(slice(2, None) if a == ax else slice(None) for a in range(3))
            m = m | mp[sl_lo] | mp[sl_hi]

        # ---- local allocation (bricks.py:_allocate, per-device dump row) ----
        usable = C_local - 1
        n_act = n_active_l[0]
        new = m & (brick_map_l < 0)
        flat = new.reshape(-1).astype(jnp.int32)
        rank = jnp.cumsum(flat) - 1
        n_new = jnp.sum(flat)
        slots = n_act + rank                     # local slot ids
        overflow = (n_act + n_new) > usable
        okb = (flat > 0) & (slots < usable)
        gslot = dev * C_local + slots            # global slot ids in the map
        brick_map_l = jnp.where(new.reshape(-1), jnp.where(okb, gslot, -1),
                                brick_map_l.reshape(-1)).reshape(brick_map_l.shape)
        bidx = jnp.arange(nbx_local * nby * nbz, dtype=jnp.int32)
        bc = jnp.stack([bidx // (nby * nbz) + bx0, (bidx // nbz) % nby,
                        bidx % nbz], -1)
        slots_safe = jnp.where(okb, slots, C_local)
        coords_l = coords_l.at[slots_safe].set(jnp.where(okb[:, None], bc, 0),
                                               mode="drop")
        n_act = jnp.minimum(n_act + n_new, usable).astype(jnp.int32)

        # ---- local active list + update (XLA path) ----
        flat_band = m.reshape(-1).astype(jnp.int32)
        rank2 = jnp.cumsum(flat_band) - 1
        n_band = jnp.sum(flat_band)
        tgt = jnp.where((flat_band > 0) & (rank2 < update_budget), rank2,
                        update_budget + 1)
        ids = jnp.arange(flat_band.shape[0], dtype=jnp.int32)
        bids = jnp.full((update_budget + 1,), -1, jnp.int32).at[tgt].set(
            ids, mode="drop", unique_indices=True)[:update_budget]
        active_ok = bids >= 0
        overflow |= n_band > update_budget
        bsafe = jnp.maximum(bids, 0)
        gslots = jnp.take(brick_map_l.reshape(-1), bsafe, mode="clip")
        slot_ok = active_ok & (gslots >= 0)
        lslots = jnp.where(slot_ok, gslots - dev * C_local, C_local)
        lslots_c = jnp.clip(lslots, 0, C_local - 1)

        bx = bsafe // (nby * nbz) + bx0
        by = (bsafe // nbz) % nby
        bz = bsafe % nbz
        li = jnp.arange(B, dtype=jnp.int32)
        vx = bx[:, None, None, None] * B + li[None, :, None, None]
        vy = by[:, None, None, None] * B + li[None, None, :, None]
        vz = bz[:, None, None, None] * B + li[None, None, None, :]
        cx = (vx.astype(jnp.float32) + 0.5) * (cfg.xsize / cfg.xres) - cfg.xsize / 2
        cy = (vy.astype(jnp.float32) + 0.5) * (cfg.ysize / cfg.yres) - cfg.ysize / 2
        cz = (vz.astype(jnp.float32) + 0.5) * (cfg.zsize / cfg.zres) - cfg.zsize / 2

        from ..ops.fusion import compute_observation, fuse_observation

        d_obs, w_obs, valid, _, _, _ = compute_observation(
            cfg, depth_r, pose_inv_r, cx, cy, cz)
        if cfg.frustum_culling:
            from ..ops.fusion import coarse_cell_frustum

            valid &= coarse_cell_frustum(cfg, pose_inv_r, vx, vy, vz)
        valid &= slot_ok[:, None, None, None]

        d0 = jnp.take(sdf_l, lslots_c, axis=0)
        w0 = jnp.take(w_l, lslots_c, axis=0)
        M0 = jnp.take(M_l, lslots_c, axis=0)
        n0 = jnp.take(n_l, lslots_c, axis=0)
        if cfg.weight_by_variance:
            from ..ops.fusion import voxel_variance

            var = voxel_variance(M0, w0, n0)
            w_obs = w_obs * jnp.where(n0 > 5,
                                      jnp.exp(-((d_obs - d0) ** 2) / (2.0 * var)), 1.0)
        d1, w1, M1, n1 = fuse_observation(d0, w0, M0, n0, d_obs, w_obs, cfg.max_weight)
        d1 = jnp.where(valid, d1, d0)
        w1 = jnp.where(valid, w1, w0)
        M1 = jnp.where(valid, M1, M0)
        n1 = jnp.where(valid, n1, n0)
        sdf_l = sdf_l.at[lslots].set(d1, mode="drop")
        w_l = w_l.at[lslots].set(w1, mode="drop")
        M_l = M_l.at[lslots].set(M1, mode="drop")
        n_l = n_l.at[lslots].set(n1, mode="drop")

        ovf = ovf | (jax.lax.pmax(overflow.astype(jnp.int32), AXIS) > 0)
        return (brick_map_l, n_act[None], coords_l, sdf_l, w_l, M_l, n_l, ovf)

    spec_v = P(AXIS)
    out = shard_map(
        body, mesh=mesh,
        in_specs=(spec_v, spec_v, spec_v, spec_v, spec_v, spec_v, spec_v, P(),
                  P(), P(), P()),
        out_specs=(spec_v, spec_v, spec_v, spec_v, spec_v, spec_v, spec_v, P()),
    )(bv.brick_map, bv.n_active, bv.coords, bv.sdf, bv.weight, bv.M,
      bv.nsample, bv.overflowed, depth, pose, pose_inv)
    brick_map, n_active, coords, sdf, weight, M, nsample, ovf = out
    return dataclasses.replace(
        bv, brick_map=brick_map, n_active=n_active, coords=coords, sdf=sdf,
        weight=weight, M=M, nsample=nsample, overflowed=ovf)


def integrate_bricks_sharded(bv: BrickVolume, depth, pose, mesh: Mesh,
                             update_budget: int = 1 << 12) -> BrickVolume:
    """Fuse one frame into a slab-sharded brick volume (zero collectives)."""
    return _integrate_sharded_jit(bv, jnp.asarray(depth),
                                  jnp.asarray(pose, jnp.float32),
                                  update_budget, mesh)


def merge_sharded(bv: BrickVolume) -> BrickVolume:
    """Gather a slab-sharded brick volume into a plain single-device one.

    Global slot ids already match concatenated data rows, so this is just a
    device_put + n_active summary (the per-device dump rows stay inert)."""
    total = int(jnp.max(bv.n_active)) if bv.n_active.ndim else int(bv.n_active)
    merged = jax.device_get(bv)
    n_total = int(np.sum(np.asarray(merged.n_active)))
    return dataclasses.replace(
        BrickVolume(
            brick_map=jnp.asarray(np.asarray(merged.brick_map)),
            n_active=jnp.int32(n_total),
            coords=jnp.asarray(np.asarray(merged.coords)),
            sdf=jnp.asarray(np.asarray(merged.sdf)),
            weight=jnp.asarray(np.asarray(merged.weight)),
            M=jnp.asarray(np.asarray(merged.M)),
            nsample=jnp.asarray(np.asarray(merged.nsample)),
            color=None if merged.color is None else jnp.asarray(np.asarray(merged.color)),
            global_transform=jnp.asarray(np.asarray(merged.global_transform)),
            overflowed=jnp.asarray(bool(np.asarray(merged.overflowed))),
            config=bv.config,
            brick_size=bv.brick_size,
            capacity=bv.capacity,
        ))
