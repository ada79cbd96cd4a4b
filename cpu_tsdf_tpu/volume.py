"""The TSDF volume pytree: dense SoA voxel grid on device.

TPU-native replacement for the reference's recursive pointer octree
(``/root/reference/include/cpu_tsdf/octree.h:55-361``). Instead of lazily-split
``OctreeNode`` objects, the volume is a struct-of-arrays ``[xres, yres, zres]``
grid: SDF, weight, Welford variance accumulator ``M``, sample count, and
optional color channels — a static-shaped pytree that jit/pjit/shard_map can
transform. Free-space compression (the reference's reason for the octree,
README.md:2-3) is handled at a different layer: the brick-sparse volume in
:mod:`cpu_tsdf_tpu.bricks` and slab sharding in :mod:`cpu_tsdf_tpu.parallel`.

Channel semantics per voxel (octree.h:163-170):
  * ``sdf``     normalized TSDF, init -1 ("unseen", tsdf_volume_octree.cpp:212-218)
  * ``weight``  accumulated fusion weight, init 0
  * ``M``       Welford-style M2 accumulator (octree.cpp:160)
  * ``nsample`` observation count (octree.cpp:161)
  * ``color``   mode-dependent channels (octree.cpp:328-581):
      RGB            -> [..., 3] quantized uint8 values stored as f32
      RGBNormalized  -> [..., 4] (r_n, g_n, b_n, intensity), f32
      LAB            -> [..., 3] (L, A, B), f32
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import (
    COLOR_MODE_LAB,
    COLOR_MODE_NONE,
    COLOR_MODE_RGB,
    COLOR_MODE_RGB_NORMALIZED,
    TSDFConfig,
)


def color_channels(cfg: TSDFConfig) -> int:
    if not cfg.integrate_color or cfg.color_mode == COLOR_MODE_NONE:
        return 0
    return {COLOR_MODE_RGB: 3, COLOR_MODE_RGB_NORMALIZED: 4, COLOR_MODE_LAB: 3}[cfg.color_mode]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TSDFVolume:
    """Dense TSDF volume state. Arrays are [xres, yres, zres(, C)]."""

    sdf: jnp.ndarray
    weight: jnp.ndarray
    M: jnp.ndarray
    nsample: jnp.ndarray
    color: Optional[jnp.ndarray]
    # 4x4 volume->world transform (tsdf_interface.h global transform).
    global_transform: jnp.ndarray
    config: TSDFConfig = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return self.sdf.shape

    def is_empty(self) -> bool:
        """True iff nothing was ever integrated (reference is_empty_ flag)."""
        return bool((self.nsample.sum() == 0))


def make_volume(cfg: TSDFConfig, dtype=jnp.float32) -> TSDFVolume:
    """Allocate + reset a volume: d=-1, w=0 everywhere.

    Mirrors TSDFVolumeOctree::reset (tsdf_volume_octree.cpp:200-219): "unseen =
    just-inside-surface with no confidence".
    """
    shape = (cfg.xres, cfg.yres, cfg.zres)
    nc = color_channels(cfg)
    return TSDFVolume(
        sdf=jnp.full(shape, -1.0, dtype=dtype),
        weight=jnp.zeros(shape, dtype=dtype),
        M=jnp.zeros(shape, dtype=dtype),
        nsample=jnp.zeros(shape, dtype=jnp.int32),
        color=(jnp.zeros(shape + (nc,), dtype=dtype) if nc else None),
        global_transform=jnp.eye(4, dtype=jnp.float32),
        config=cfg,
    )


def reset(vol: TSDFVolume) -> TSDFVolume:
    """Reinitialize the fields; the global transform survives, exactly like
    TSDFVolumeOctree::reset (tsdf_volume_octree.cpp:200-219), which rebuilds
    only the octree."""
    import dataclasses

    fresh = make_volume(vol.config, dtype=vol.sdf.dtype)
    return dataclasses.replace(fresh, global_transform=vol.global_transform)


def occupied_voxel_indices(vol: TSDFVolume) -> np.ndarray:
    """Indices of voxels with w > 0 and |d| < 1.

    Parity with getOccupiedVoxelIndices (tsdf_volume_octree.cpp:590-609).
    Returns an [N, 3] int array on host (dynamic-shape op; host-side by design).
    """
    mask = np.asarray((vol.weight > 0) & (jnp.abs(vol.sdf) < 1))
    return np.argwhere(mask).astype(np.int32)


def voxel_centers_grid(cfg: TSDFConfig):
    """Meshgrid of all voxel centers, shape [xres,yres,zres] per axis."""
    from .geometry import voxel_center

    ix = jnp.arange(cfg.xres, dtype=jnp.float32)[:, None, None]
    iy = jnp.arange(cfg.yres, dtype=jnp.float32)[None, :, None]
    iz = jnp.arange(cfg.zres, dtype=jnp.float32)[None, None, :]
    x, y, z = voxel_center(cfg, ix, iy, iz)
    return (
        jnp.broadcast_to(x, (cfg.xres, cfg.yres, cfg.zres)),
        jnp.broadcast_to(y, (cfg.xres, cfg.yres, cfg.zres)),
        jnp.broadcast_to(z, (cfg.xres, cfg.yres, cfg.zres)),
    )
