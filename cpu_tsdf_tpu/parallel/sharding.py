"""Multi-chip sharding of the TSDF framework over a JAX device mesh.

The reference's only parallel substrate is OpenMP shared memory
(/root/reference: 4 `#pragma omp parallel for` sites, SURVEY §5). The
TPU-native scaling story replaces it with SPMD over `jax.sharding.Mesh`:

  * INTEGRATION — the volume SoA shards by X-SLAB (first array axis) across
    the mesh; the depth image and pose replicate. Every voxel's update is
    independent (project -> gather -> fuse), so GSPMD partitions the fused
    integrate op with ZERO collectives: each chip updates its slab at full
    local HBM bandwidth. This is the "shard the brick table" strategy of
    SURVEY §5 specialized to the dense grid.

  * RENDERING — rays shard across the mesh ("ray tiles"), the volume
    replicates (for scenes too large to replicate, the brick-sparse volume in
    :mod:`cpu_tsdf_tpu.bricks` keeps only the surface shell, which fits).
    Each chip marches its rays against its replica — again zero collectives
    in the forward pass.

  * MARCHING CUBES / field queries on a slab-sharded volume rely on GSPMD to
    insert halo exchanges (collective-permute) for the +-1-voxel shifted
    reads, and on psum for gradient reductions in the backward pass — the
    collectives ride ICI without hand-written NCCL-style code.

All functions here are thin: they build shardings and constrain inputs; the
math lives in the (unchanged) single-device ops — one codebase, any mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..volume import TSDFVolume

AXIS = "shard"


def make_tsdf_mesh(devices: Optional[Sequence] = None, platform: Optional[str] = None) -> Mesh:
    """1D device mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def shard_volume(vol: TSDFVolume, mesh: Mesh) -> TSDFVolume:
    """Place the volume slab-sharded on axis 0 (X) across the mesh."""
    def put(a, spec):
        return jax.device_put(a, NamedSharding(mesh, spec))

    return TSDFVolume(
        sdf=put(vol.sdf, P(AXIS)),
        weight=put(vol.weight, P(AXIS)),
        M=put(vol.M, P(AXIS)),
        nsample=put(vol.nsample, P(AXIS)),
        color=None if vol.color is None else put(vol.color, P(AXIS)),
        global_transform=put(vol.global_transform, P()),
        config=vol.config,
    )


def replicate_volume(vol: TSDFVolume, mesh: Mesh) -> TSDFVolume:
    """Replicate the volume on every device of the mesh (render-side layout)."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P()))

    return TSDFVolume(
        sdf=put(vol.sdf), weight=put(vol.weight), M=put(vol.M),
        nsample=put(vol.nsample),
        color=None if vol.color is None else put(vol.color),
        global_transform=put(vol.global_transform),
        config=vol.config,
    )


def integrate_sharded(vol: TSDFVolume, depth, pose, rgb=None) -> TSDFVolume:
    """Fuse one frame into a slab-sharded volume.

    The volume arrays must already be sharded (see :func:`shard_volume`); the
    op is the standard :func:`cpu_tsdf_tpu.ops.fusion.integrate` — GSPMD keeps
    the output sharding and partitions the computation voxel-locally.
    """
    from ..ops.fusion import integrate

    return integrate(vol, depth, pose, rgb)


def replicate_render_pack(vol, mesh: Mesh):
    """Pack + replicate a volume once for repeated sharded renders."""
    from ..bricks import PackedRenderVolume, pack_render

    if not isinstance(vol, PackedRenderVolume):
        vol = pack_render(vol)
    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, rep), vol)


import functools


@functools.lru_cache(maxsize=32)
def _sharded_march(mesh: Mesh, max_steps: int, colored: bool):
    """Cached jitted sharded march (a fresh inline jit would recompile per
    render call).

    shard_map (not bare jit): the march's lockstep while_loop terminates on
    an all-rays-done reduction, which GSPMD would turn into a cross-device
    collective EVERY iteration; per-device loops with local termination
    march independently, which is the whole point of ray sharding."""
    from jax import shard_map

    from ..ops.raycast import render_rays

    @jax.jit
    def run(vol_in, o, d):
        def body(vol_l, o_l, d_l):
            return render_rays(vol_l, o_l, d_l, max_steps=max_steps,
                               colored=colored)

        vol_spec = jax.tree.map(lambda _: P(), vol_in)
        return shard_map(
            body, mesh=mesh,
            in_specs=(vol_spec, P(AXIS, None), P(AXIS, None)),
            out_specs=P(AXIS),
            # no collectives inside; the varying-axis check trips on the
            # march state being initialized from unvarying constants
            check_vma=False,
        )(vol_in, o, d)

    return run


def render_view_sharded(vol: TSDFVolume, pose, mesh: Mesh, downsample_by: int = 1,
                        max_steps: int = 512, colored: bool = False):
    """Render with rays sharded across the mesh and the volume replicated.

    Rays are padded to a multiple of the mesh size and sharded on the ray
    axis; the march is embarrassingly parallel per ray. Pass a prebuilt
    :func:`replicate_render_pack` result to amortize packing + replication
    across renders of the same volume state.
    """
    from ..bricks import PackedRenderVolume, pack_render
    from ..ops.raycast import assemble_view, camera_rays, render_rays

    if not isinstance(vol, PackedRenderVolume):
        # pack before replicating: halves both the replicated bytes and the
        # per-sample gather traffic
        vol = pack_render(vol)
    cfg = vol.config
    W = cfg.image_width // downsample_by
    H = cfg.image_height // downsample_by
    N = H * W
    n_dev = mesh.devices.size
    pad = (-N) % n_dev

    pose = jnp.asarray(pose, jnp.float32)
    origins, dirs = camera_rays(cfg, pose, downsample_by)
    if pad:
        origins = jnp.concatenate([origins, jnp.zeros((pad, 3), origins.dtype)])
        # padded rays point along +z from the origin; they march and miss
        dirs = jnp.concatenate([dirs, jnp.tile(jnp.asarray([[0., 0., 1.]], dirs.dtype), (pad, 1))])
    ray_sharding = NamedSharding(mesh, P(AXIS, None))
    origins = jax.device_put(origins, ray_sharding)
    dirs = jax.device_put(dirs, ray_sharding)
    rep = NamedSharding(mesh, P())
    vol_r = jax.tree.map(lambda a: jax.device_put(a, rep), vol)

    run = _sharded_march(mesh, max_steps, colored)
    r = run(vol_r, origins, dirs)
    if pad:
        r = {k: v[:N] for k, v in r.items()}
    return assemble_view(cfg, pose, r, H, W)
