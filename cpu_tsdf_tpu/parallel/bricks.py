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
from ..geometry import rigid_inverse
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
        # multi-process meshes need per-host shard assembly; single-process
        # reduces to a plain device_put (parallel/distributed.py)
        from .distributed import shard_to_mesh

        return shard_to_mesh(np.asarray(a), mesh, spec)

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
        from ..activation import _compact, band_candidate_bricks, depth_mips

        dev = jax.lax.axis_index(AXIS)
        bx0 = dev * nbx_local

        # ---- band activation: replicated hierarchical candidate list ----
        # Every device computes the IDENTICAL global candidate list (inputs
        # are replicated), then filters to its own x-slab — this keeps the
        # sharded brick set bit-equal to the single-device one with zero
        # collectives.
        mips = depth_mips(depth_r)
        cand_g, _, overflow = band_candidate_bricks(
            cfg, B, (nbx, nby, nbz), mips, pose_inv_r, update_budget * D)
        gok = cand_g >= 0
        gsafe = jnp.maximum(cand_g, 0)
        bxc = gsafe // (nby * nbz)
        local = gok & (bxc >= bx0) & (bxc < bx0 + nbx_local)
        llin = (bxc - bx0) * (nby * nbz) + gsafe % (nby * nbz)
        bids, n_band = _compact(local, llin, update_budget)
        overflow |= n_band > update_budget
        active_ok = bids >= 0
        bsafe = jnp.maximum(bids, 0)

        # ---- local allocation (bricks.py:_allocate_from_list, local slots) --
        usable = C_local - 1
        n_act = n_active_l[0]
        cur = jnp.take(brick_map_l.reshape(-1), bsafe, mode="clip")
        is_new = active_ok & (cur < 0)
        rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        n_new = jnp.sum(is_new.astype(jnp.int32))
        slots = n_act + rank                     # local slot ids
        overflow |= (n_act + n_new) > usable
        okb = is_new & (slots < usable)
        gslot = dev * C_local + slots            # global slot ids in the map
        nbtot_l = nbx_local * nby * nbz
        brick_map_l = brick_map_l.reshape(-1).at[jnp.where(okb, bsafe, nbtot_l)].set(
            jnp.where(okb, gslot, 0), mode="drop",
            unique_indices=True).reshape(brick_map_l.shape)
        bc = jnp.stack([bsafe // (nby * nbz) + bx0, (bsafe // nbz) % nby,
                        bsafe % nbz], -1)
        slots_safe = jnp.where(okb, slots, C_local)
        coords_l = coords_l.at[slots_safe].set(jnp.where(okb[:, None], bc, 0),
                                               mode="drop")
        n_act = jnp.minimum(n_act + n_new, usable).astype(jnp.int32)
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


def merge_sharded(bv: BrickVolume, device=None) -> BrickVolume:
    """Gather a slab-sharded brick volume into a plain single-device one.

    Global slot ids already match concatenated data rows, so this is a pure
    device-side reshard (device-to-device gather over ICI on hardware — no
    host round trip); the per-device dump rows stay inert."""
    if device is None:
        # deterministic: the lowest-id device holding the array (an arbitrary
        # set.pop() here perturbs later executables' device assignment)
        devs = bv.sdf.devices() if hasattr(bv.sdf, "devices") else set(jax.devices()[:1])
        device = min(devs, key=lambda d: d.id)

    def g(a):
        return jax.device_put(a, device)

    return BrickVolume(
        brick_map=g(bv.brick_map),
        n_active=g(jnp.sum(bv.n_active).astype(jnp.int32)),
        coords=g(bv.coords),
        sdf=g(bv.sdf),
        weight=g(bv.weight),
        M=g(bv.M),
        nsample=g(bv.nsample),
        color=None if bv.color is None else g(bv.color),
        global_transform=g(bv.global_transform),
        overflowed=g(bv.overflowed),
        config=bv.config,
        brick_size=bv.brick_size,
        capacity=bv.capacity,
    )
