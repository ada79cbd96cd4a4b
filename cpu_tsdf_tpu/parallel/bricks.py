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

The per-frame update inside the shard_map body is the SAME code as the
single-device path (:func:`cpu_tsdf_tpu.bricks.fuse_brick_batch`) over each
device's local slot partition — including the Pallas fusion kernel
(use_pallas) and color fusion (rgb). Activation is slab-restricted
(``band_candidate_bricks(x_slab=...)``): each device only tests tile columns
overlapping its x-slab, so per-device activation cost scales with the slab,
not the volume, while staying bit-equal to the single-device active set.
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
    D = int(mesh.shape[AXIS])  # slab count = the shard axis extent
    # (hybrid [dcn, shard] meshes replicate the volume across dcn)
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


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10), donate_argnums=(0,))
def _integrate_sharded_jit(bv: BrickVolume, depth, rgb, pose,
                           budget_local: int, mesh: Mesh, use_pallas: bool,
                           pallas_interpret: bool, pallas_window: bool,
                           pallas_band: int, pallas_extra: int) -> BrickVolume:
    cfg = bv.config
    B = bv.brick_size
    D = int(mesh.shape[AXIS])  # slab count = the shard axis extent
    # (hybrid [dcn, shard] meshes replicate the volume across dcn)
    C_local = bv.capacity // D
    nbx, nby, nbz = bv.bricks_per_axis
    nbx_local = nbx // D
    pose = jnp.asarray(pose, jnp.float32)
    pose_inv = rigid_inverse(pose)
    has_color = bv.color is not None and rgb is not None

    def body(*args):
        from ..activation import (_compact_chunked, band_candidate_bricks,
                                  carve_candidate_slots, depth_mips,
                                  mip_base_level)
        from ..bricks import carve_budget_for, fuse_brick_batch

        brick_map_l, n_active_l, coords_l, sdf_l, w_l, M_l, n_l = args[:7]
        i = 7
        col_l = args[i] if has_color else None
        i += int(has_color)
        ovf, depth_r = args[i], args[i + 1]
        i += 2
        rgb_r = args[i] if has_color else None
        i += int(has_color)
        pose_inv_r = args[i]

        dev = jax.lax.axis_index(AXIS)
        bx0 = dev * nbx_local

        # ---- slab-restricted band activation (zero collectives): each
        # device tests only tile columns overlapping its x-slab; the result
        # is bit-equal to the global candidate list filtered to the slab ----
        mips = depth_mips(depth_r, mip_base_level(cfg, B))
        cand, n_band, overflow = band_candidate_bricks(
            cfg, B, (nbx, nby, nbz), mips, pose_inv_r, budget_local,
            x_slab=(bx0, nbx_local))
        gok = cand >= 0
        gsafe = jnp.maximum(cand, 0)
        bx = gsafe // (nby * nbz)
        by = (gsafe // nbz) % nby
        bz = gsafe % nbz
        llin = jnp.where(gok, (bx - bx0) * (nby * nbz) + gsafe % (nby * nbz), 0)

        # carve candidates come from the PRE-allocation live set (band-new
        # bricks cannot be in front of the band)
        coords_pre = coords_l

        # ---- local allocation (bricks.py:_allocate_from_list, local slots) --
        usable = C_local - 1
        n_act = n_active_l[0]
        cur = jnp.take(brick_map_l.reshape(-1), llin, mode="clip")
        is_new = gok & (cur < 0)
        rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
        n_new = jnp.sum(is_new.astype(jnp.int32))
        slots = n_act + rank                     # local slot ids
        overflow |= (n_act + n_new) > usable
        okb = is_new & (slots < usable)
        gslot = dev * C_local + slots            # global slot ids in the map
        nbtot_l = nbx_local * nby * nbz
        brick_map_l = brick_map_l.reshape(-1).at[jnp.where(okb, llin, nbtot_l)].set(
            jnp.where(okb, gslot, 0), mode="drop",
            unique_indices=True).reshape(brick_map_l.shape)
        bc = jnp.stack([bx, by, bz], -1)
        slots_safe = jnp.where(okb, slots, C_local)
        coords_l = coords_l.at[slots_safe].set(jnp.where(okb[:, None], bc, 0),
                                               mode="drop")
        n_act = jnp.minimum(n_act + n_new, usable).astype(jnp.int32)
        gslots = jnp.take(brick_map_l.reshape(-1), llin, mode="clip")
        slot_ok = gok & (gslots >= 0)
        lslots = jnp.where(slot_ok, gslots - dev * C_local, C_local)

        # ---- carve pass over the device's LOCAL live set (same semantics
        # as the single-device path; coords are global brick coords, so the
        # footprint math is identical and stays slab-restricted for free) --
        carve_budget = carve_budget_for(budget_local)
        live_pre = coords_pre[:, 0] >= 0
        carve_mask = carve_candidate_slots(cfg, B, mips, pose_inv_r,
                                           coords_pre, live_pre)
        carve_slots, n_carve = _compact_chunked(
            carve_mask, jnp.arange(C_local, dtype=jnp.int32), carve_budget)
        overflow |= n_carve > carve_budget
        carve_ok = carve_slots >= 0
        cs_safe = jnp.clip(carve_slots, 0, C_local - 1)
        cc = jnp.take(coords_pre, cs_safe, axis=0)
        bx = jnp.concatenate([bx, jnp.maximum(cc[:, 0], 0)])
        by = jnp.concatenate([by, jnp.maximum(cc[:, 1], 0)])
        bz = jnp.concatenate([bz, jnp.maximum(cc[:, 2], 0)])
        slot_ok = jnp.concatenate([slot_ok, carve_ok])
        lslots = jnp.concatenate([lslots, cs_safe])

        # ---- the SAME batched update as the single-device path (including
        # the Pallas kernel and color), over the local slot partition ----
        sdf_l, w_l, M_l, n_l, col_l, xovf = fuse_brick_batch(
            cfg, B, bx, by, bz, slot_ok, lslots,
            sdf_l, w_l, M_l, n_l, col_l, depth_r, pose_inv_r, rgb_r,
            use_pallas, pallas_interpret, pallas_window, pallas_band,
            pallas_extra)

        overflow |= xovf
        ovf = ovf | (jax.lax.pmax(overflow.astype(jnp.int32), AXIS) > 0)
        res = (brick_map_l, n_act[None], coords_l, sdf_l, w_l, M_l, n_l)
        if has_color:
            res += (col_l,)
        return res + (ovf,)

    spec_v = P(AXIS)
    ins = [bv.brick_map, bv.n_active, bv.coords, bv.sdf, bv.weight, bv.M,
           bv.nsample]
    in_specs = [spec_v] * 7
    if has_color:
        ins.append(bv.color)
        in_specs.append(spec_v)
    ins += [bv.overflowed, depth]
    in_specs += [P(), P()]
    if has_color:
        ins.append(rgb)
        in_specs.append(P())
    ins.append(pose_inv)
    in_specs.append(P())
    out_specs = tuple([spec_v] * (7 + int(has_color)) + [P()])
    # check_vma=False: pallas_call inside the body has no way to annotate its
    # out_shapes' varying axes (jax.ShapeDtypeStruct vma) without threading
    # mesh axis names into the kernel module; the specs above are explicit
    out = shard_map(body, mesh=mesh, in_specs=tuple(in_specs),
                    out_specs=out_specs, check_vma=False)(*ins)
    brick_map, n_active, coords, sdf, weight, M, nsample = out[:7]
    color = out[7] if has_color else bv.color
    ovf = out[-1]
    return dataclasses.replace(
        bv, brick_map=brick_map, n_active=n_active, coords=coords, sdf=sdf,
        weight=weight, M=M, nsample=nsample, color=color, overflowed=ovf)


def integrate_bricks_sharded(bv: BrickVolume, depth, pose, mesh: Mesh,
                             update_budget: int = 1 << 12, rgb=None,
                             use_pallas: bool = False,
                             pallas_interpret: bool = False,
                             budget_per_device: int = None,
                             pallas_window: bool = None,
                             pallas_band: int = None,
                             pallas_extra: int = None) -> BrickVolume:
    """Fuse one frame into a slab-sharded brick volume (zero collectives).

    With use_pallas the per-voxel update runs in the Pallas fusion kernel
    INSIDE the shard_map body (one kernel launch per device, each over its
    own slot partition); rgb enables color fusion, same semantics as
    :func:`cpu_tsdf_tpu.bricks.integrate_bricks`.

    ``update_budget`` is the GLOBAL band budget; each device's stages
    (candidate list, allocation, fuse) are sized to ``budget_per_device``
    (default: slack x ``update_budget / D`` — sizing every device at the
    full global budget made total work D x global, the round-2
    sharded-integrate overhead). The slack over a uniform split is 2x at
    D >= 4 (a small slab can hold the frustum's whole near field) and 1.5x
    at D < 4, where each slab covers so much of the frustum that relative
    imbalance is bounded — at D = 2 the 2x slack degenerated to the global
    budget, making per-device work equal to single-device work. A slab
    denser than the local budget raises ``overflowed``, never drops
    silently."""
    D = int(mesh.shape[AXIS])  # slab count = the shard axis extent
    # (hybrid [dcn, shard] meshes replicate the volume across dcn)
    if budget_per_device is None:
        num, den = (2, 1) if D >= 4 else (3, 2)
        budget_per_device = min(update_budget,
                                max(256, -(-num * update_budget // (den * 128 * D)) * 128))
    # resolve the kernel-tuning defaults OUTSIDE the jit (same reason as
    # integrate_bricks: the static cache key must carry concrete values, not
    # a None frozen to whatever the module flag was at first trace)
    from ..ops import pallas_fusion as pf

    window = pf.USE_DEPTH_WINDOW if pallas_window is None else bool(pallas_window)
    band = pf.resolve_band(pallas_band)
    extra = (pf.EXTRA_PASS_BUDGET if pallas_extra is None
             else int(pallas_extra))
    return _integrate_sharded_jit(bv, jnp.asarray(depth),
                                  None if rgb is None else jnp.asarray(rgb),
                                  jnp.asarray(pose, jnp.float32),
                                  budget_per_device, mesh, use_pallas,
                                  pallas_interpret, window, band, extra)


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
