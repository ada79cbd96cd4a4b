"""Block-sparse brick volume: the TPU-native octree replacement.

The reference scales past dense grids with a recursive pointer octree that
"compresses free space" (/root/reference/README.md:2-3, octree.cpp). Pointer
chasing is hostile to XLA, so here sparsity is a BRICK TABLE with static
shapes (SURVEY §7 architecture):

  * the volume is divided into B^3-voxel bricks (default B=8);
  * ``brick_map``   int32 [Bx,By,Bz]: brick coord -> slot id, -1 = unallocated
    (unallocated == the reference's unobserved coarse leaf: d=-1, w=0);
  * ``sdf/weight/...`` [C, B, B, B]: SoA data for up to C allocated bricks;
  * allocation happens per frame from the measured surface: every valid
    pixel's truncation-band ray segment is sampled at voxel granularity and
    the touched bricks are activated — the static-shape analog of the
    reference's pre-split pass (hpp:57-90) + adaptive split (hpp:161-188);
  * the per-voxel update inside active bricks is the SAME fusion math as the
    dense path (ops/fusion.compute_observation), so brick and dense volumes
    agree exactly on every allocated voxel — including re-observed free
    space: a CARVE pass adds live bricks strictly in front of the depths
    under their footprint to each frame's update list (the reference fuses
    clamped d=+1 observations there, hpp:189-198; band activation alone
    would skip them and stale surfaces would survive disocclusion).

Free-space observations of NEVER-allocated bricks (the reference's coarse
d=1 cells) are not stored — rays treat unallocated bricks as unobserved
(d=-1, w=0), which preserves the crossing semantics (a crossing requires
both weights nonzero and the pre-crossing sample always lies inside the
allocated band).

Capacity overflow is detected and reported via the ``overflowed`` field —
never silently dropped.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import TSDFConfig
from .geometry import rigid_inverse
from .volume import TSDFVolume, color_channels, make_volume


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class BrickVolume:
    """Block-sparse TSDF volume.

    The sdf/weight/M/nsample SoA arrays are stored VREG-TILED as
    [C, 4, B^3/4]: each brick row is the plain row-major flattening of its
    [B, B, B] voxels ((lx*B+ly)*B+lz), split into 4 sublane chunks of
    B^3/4 lanes. At B=8 that is [C, 4, 128] — whose default TPU entry
    layout {2,1,0:T(4,128)} is byte-identical to the Pallas fusion
    kernel's operand constraint, so the volume crosses the per-frame jit
    boundary with ZERO layout copies ([C, B, B, B] storage defaulted to a
    C-minor {0,3,2,1:T(8,128)} layout and paid 12 full-volume transpose
    copies ~1.4 ms/frame around the kernel chain — bench/hlo_copies r4).
    Any `.reshape(-1)` / `.reshape(C, V)` consumer sees the same linear
    order as the former [C, B, B, B] storage. `color` (not a kernel
    operand) stays [C, B, B, B, nc].
    """

    brick_map: jnp.ndarray     # int32 [Bx, By, Bz], slot or -1
    n_active: jnp.ndarray      # int32 scalar
    coords: jnp.ndarray        # int32 [C, 3] brick coords (or -1)
    sdf: jnp.ndarray
    weight: jnp.ndarray
    M: jnp.ndarray
    nsample: jnp.ndarray
    color: Optional[jnp.ndarray]
    global_transform: jnp.ndarray
    overflowed: jnp.ndarray    # bool scalar: capacity exceeded at some frame
    config: TSDFConfig = dataclasses.field(metadata=dict(static=True))
    brick_size: int = dataclasses.field(metadata=dict(static=True))
    capacity: int = dataclasses.field(metadata=dict(static=True))

    @property
    def bricks_per_axis(self):
        cfg, B = self.config, self.brick_size
        return (cfg.xres // B, cfg.yres // B, cfg.zres // B)


def soa_inner(brick_size: int) -> tuple:
    """Inner dims of the vreg-tiled SoA storage (see BrickVolume): [4, V/4]
    when the brick volume divides into 4 sublane chunks, else [1, V]."""
    V = brick_size ** 3
    return (4, V // 4) if V % 4 == 0 else (1, V)


def make_brick_volume(cfg: TSDFConfig, brick_size: int = 8,
                      capacity: int = 1 << 15, dtype=jnp.float32) -> BrickVolume:
    if cfg.xres % brick_size or cfg.yres % brick_size or cfg.zres % brick_size:
        raise ValueError("resolution must be divisible by brick_size")
    nb = (cfg.xres // brick_size, cfg.yres // brick_size, cfg.zres // brick_size)
    B = brick_size
    nc = color_channels(cfg)
    shape = (capacity,) + soa_inner(B)
    return BrickVolume(
        brick_map=jnp.full(nb, -1, jnp.int32),
        n_active=jnp.int32(0),
        coords=jnp.full((capacity, 3), -1, jnp.int32),
        sdf=jnp.full(shape, -1.0, dtype),
        weight=jnp.zeros(shape, dtype),
        M=jnp.zeros(shape, dtype),
        nsample=jnp.zeros(shape, jnp.int32),
        color=(jnp.zeros((capacity, B, B, B, nc), dtype) if nc else None),
        global_transform=jnp.eye(4, dtype=jnp.float32),
        overflowed=jnp.asarray(False),
        config=cfg,
        brick_size=brick_size,
        capacity=capacity,
    )


# ---------------------------------------------------------------------------
# uniform voxel gather (dense + brick)
# ---------------------------------------------------------------------------

def gather_dw(vol, ix, iy, iz):
    """(d, w) at clipped integer voxel indices, for any volume representation
    (dense, brick, or packed-render)."""
    cfg = vol.config
    ix = jnp.clip(ix, 0, cfg.xres - 1)
    iy = jnp.clip(iy, 0, cfg.yres - 1)
    iz = jnp.clip(iz, 0, cfg.zres - 1)
    if isinstance(vol, PackedRenderVolume):
        return _gather_packed(vol, ix, iy, iz)
    if isinstance(vol, TSDFVolume):
        lin = (ix * cfg.yres + iy) * cfg.zres + iz
        return (jnp.take(vol.sdf.reshape(-1), lin, mode="clip"),
                jnp.take(vol.weight.reshape(-1), lin, mode="clip"))
    B = vol.brick_size
    bx, lx = ix // B, ix % B
    by, ly = iy // B, iy % B
    bz, lz = iz // B, iz % B
    nbx, nby, nbz = vol.bricks_per_axis
    blin = (bx * nby + by) * nbz + bz
    slot = jnp.take(vol.brick_map.reshape(-1), blin, mode="clip")
    inner = (lx * B + ly) * B + lz
    lin = jnp.clip(slot, 0, vol.capacity - 1) * (B * B * B) + inner
    d = jnp.take(vol.sdf.reshape(-1), lin, mode="clip")
    w = jnp.take(vol.weight.reshape(-1), lin, mode="clip")
    empty = slot < 0
    # unallocated brick == unobserved voxel (d=-1, w=0)
    return jnp.where(empty, -1.0, d), jnp.where(empty, 0.0, w)


def gather_color(vol, ix, iy, iz):
    """Fused color channels at clipped voxel indices (any volume type)."""
    cfg = vol.config
    ix = jnp.clip(ix, 0, cfg.xres - 1)
    iy = jnp.clip(iy, 0, cfg.yres - 1)
    iz = jnp.clip(iz, 0, cfg.zres - 1)
    if isinstance(vol, (TSDFVolume, PackedRenderVolume)) and getattr(vol, "brick_map", None) is None:
        lin = (ix * cfg.yres + iy) * cfg.zres + iz
        return jnp.take(vol.color.reshape(-1, vol.color.shape[-1]), lin, axis=0, mode="clip")
    B = vol.brick_size
    bx, lx = ix // B, ix % B
    by, ly = iy // B, iy % B
    bz, lz = iz // B, iz % B
    nby, nbz = cfg.yres // B, cfg.zres // B
    blin = (bx * nby + by) * nbz + bz
    slot = jnp.take(vol.brick_map.reshape(-1), blin, mode="clip")
    inner = (lx * B + ly) * B + lz
    lin = jnp.clip(slot, 0, vol.capacity - 1) * (B * B * B) + inner
    c = jnp.take(vol.color.reshape(-1, vol.color.shape[-1]), lin, axis=0, mode="clip")
    return jnp.where((slot < 0)[..., None], 0.0, c)


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------

def carve_budget_for(update_budget: int) -> int:
    """Static size of the carve batch appended to each frame's update list:
    live-but-in-front bricks are empty in static scenes and a thin shell
    under motion, so an eighth of the band budget (lane-aligned) covers it;
    denser carve sets raise `overflowed`, never drop silently."""
    return max(256, (update_budget // 8 + 127) // 128 * 128)


def _allocate(vol: BrickVolume, want_mask):
    """Allocate slots for newly-active bricks (prefix-sum assignment).

    The LAST row (capacity - 1) is reserved as a write-off dump for the
    in-place Pallas kernel (inactive grid steps read and re-write it), so the
    usable capacity is capacity - 1 slots.
    """
    usable = vol.capacity - 1
    new = want_mask & (vol.brick_map < 0)
    flat = new.reshape(-1).astype(jnp.int32)
    rank = jnp.cumsum(flat) - 1          # rank among new bricks
    n_new = jnp.sum(flat)
    slots = vol.n_active + rank
    overflow = (vol.n_active + n_new) > usable
    ok = (flat > 0) & (slots < usable)
    slots_safe = jnp.where(ok, slots, vol.capacity)  # dump row for overflow
    # brick_map: newly-allocated bricks get their slot id; overflowed ones
    # stay unallocated (-1) and set the overflow flag
    brick_map = jnp.where(new.reshape(-1), jnp.where(ok, slots, -1),
                          vol.brick_map.reshape(-1))
    brick_map = brick_map.reshape(vol.brick_map.shape)
    # coords: scatter brick coordinates into their new slots
    nbx, nby, nbz = vol.bricks_per_axis
    bidx = jnp.arange(nbx * nby * nbz, dtype=jnp.int32)
    bc = jnp.stack([bidx // (nby * nbz), (bidx // nbz) % nby, bidx % nbz], -1)
    # slots_safe == capacity marks overflow/non-new bricks; mode="drop" skips
    coords = vol.coords.at[slots_safe].set(jnp.where(ok[:, None], bc, 0), mode="drop")
    n_active = jnp.minimum(vol.n_active + n_new, usable).astype(jnp.int32)
    return dataclasses.replace(
        vol, brick_map=brick_map, coords=coords, n_active=n_active,
        overflowed=vol.overflowed | overflow)


def _allocate_from_list(vol: BrickVolume, cand):
    """Allocate slots for the new bricks of a candidate list (budget-sized;
    -1 entries are padding). Candidates are unique.

    Assignment is GAP-AWARE: the k-th new brick takes the k-th FREE row
    (coords[:, 0] < 0), not row n_active + k — merge_sharded volumes have
    per-device slot gaps, where the prefix assumption silently mapped two
    bricks onto one row. On contiguous volumes the free rows are exactly
    [n_active, usable), so the assignment (and every downstream bit) is
    unchanged."""
    usable = vol.capacity - 1
    nbx, nby, nbz = vol.bricks_per_axis
    nbtot = nbx * nby * nbz
    ok_c = cand >= 0
    safe = jnp.maximum(cand, 0)
    cur = jnp.take(vol.brick_map.reshape(-1), safe, mode="clip")
    is_new = ok_c & (cur < 0)
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    n_new = jnp.sum(is_new.astype(jnp.int32))

    live = vol.coords[:, 0] >= 0
    free = (~live) & (jnp.arange(vol.capacity) < usable)  # dump row excluded
    n_free = jnp.sum(free.astype(jnp.int32))
    frank = jnp.cumsum(free.astype(jnp.int32)) - 1
    free_rows = jnp.full((vol.capacity + 1,), vol.capacity, jnp.int32).at[
        jnp.where(free, frank, vol.capacity)].set(
        jnp.arange(vol.capacity, dtype=jnp.int32), mode="drop",
        unique_indices=True)
    slots = jnp.take(free_rows, jnp.clip(rank, 0, vol.capacity), mode="clip")
    overflow = n_new > n_free
    ok = is_new & (rank < n_free)
    bm = vol.brick_map.reshape(-1).at[jnp.where(ok, safe, nbtot)].set(
        jnp.where(ok, slots, 0), mode="drop", unique_indices=True)
    bc = jnp.stack([safe // (nby * nbz), (safe // nbz) % nby, safe % nbz], -1)
    slots_safe = jnp.where(ok, slots, vol.capacity)
    coords = vol.coords.at[slots_safe].set(
        jnp.where(ok[:, None], bc, 0), mode="drop")
    n_active = (jnp.sum(live.astype(jnp.int32))
                + jnp.minimum(n_new, n_free)).astype(jnp.int32)
    return dataclasses.replace(
        vol, brick_map=bm.reshape(vol.brick_map.shape), coords=coords,
        n_active=n_active, overflowed=vol.overflowed | overflow)


def _jitter_split_bricks(cfg, nb, depth, pose, bids, update_budget, key):
    """Extra brick activation from jittered surface samples.

    Replicates the reference's ``num_random_splits`` pre-split jitter
    (/root/reference/include/cpu_tsdf/impl/tsdf_volume_octree.hpp:69-88):
    per valid pixel, samples 1..n-1 add noise of uniform[0, 0.03) m magnitude
    to the surface point (camera frame) and force its containing voxel to
    split — here, activate its containing brick. PRNG-keyed (the reference
    uses un-seeded rand(); we default to a fixed key for determinism) with
    uniform-sphere directions (the reference normalizes a random cube vector).

    Takes the hierarchical candidate list, unions the jittered bricks through
    a full-grid mask, and recompacts — the slow exotic-flag path.
    """
    from .activation import _compact
    from .geometry import transform_points

    B_ = cfg.xres // nb[0]
    nbx, nby, nbz = nb
    nbtot = nbx * nby * nbz
    mask = jnp.zeros((nbtot + 1,), bool)
    mask = mask.at[jnp.where(bids >= 0, bids, nbtot)].set(True)

    H, W = depth.shape
    uu = jnp.arange(W, dtype=jnp.float32)[None, :]
    vv = jnp.arange(H, dtype=jnp.float32)[:, None]
    rx = (uu - cfg.principal_point_x) / cfg.focal_length_x
    ry = (vv - cfg.principal_point_y) / cfg.focal_length_y
    valid = ~jnp.isnan(depth)
    z = jnp.where(valid, depth, 1.0)
    for perm in range(1, cfg.num_random_splits):
        key, k1, k2 = jax.random.split(key, 3)
        scale = jax.random.uniform(k1, (H, W)) * 0.03
        nvec = jax.random.normal(k2, (H, W, 3))
        nvec = nvec / jnp.maximum(jnp.linalg.norm(nvec, axis=-1, keepdims=True), 1e-9)
        px = rx * z + nvec[..., 0] * scale
        py = ry * z + nvec[..., 1] * scale
        pz = z + nvec[..., 2] * scale
        wx, wy, wz = transform_points(pose, px, py, pz)
        from .geometry import voxel_index

        ix, iy, iz, inb = voxel_index(cfg, wx, wy, wz)
        ok = valid & inb
        blin = ((ix // B_) * nby + (iy // B_)) * nbz + (iz // B_)
        mask = mask.at[jnp.where(ok, blin, nbtot).reshape(-1)].set(True)

    bids, n_band = _compact(mask[:-1], jnp.arange(nbtot, dtype=jnp.int32),
                            update_budget)
    return bids, n_band, n_band > update_budget


def integrate_bricks(vol: BrickVolume, depth, pose, rgb=None,
                     update_budget: int = 1 << 13, use_pallas: bool = False,
                     pallas_interpret: bool = False,
                     split_key=None, pallas_window: bool = None,
                     pallas_band: int = None,
                     pallas_extra: int = None) -> BrickVolume:
    """Fuse one depth frame into the brick volume.

    update_budget bounds the number of bricks updated per frame (band bricks
    visible in one frame); exceeding it sets `overflowed`. With use_pallas the
    per-voxel observation+fusion runs in the TPU kernel
    (:mod:`cpu_tsdf_tpu.ops.pallas_fusion`), including color configs (the
    kernel looks up a 24-bit-packed color image alongside depth and emits
    per-brick aux observations; the mode-specific transform — RGB/
    RGBNormalized/LAB, octree.cpp:328-434 — runs in XLA on those K rows).
    Bricks whose footprint exceeds one kernel tile (near-camera bricks)
    run as several disjoint-validity kernel passes — there is no XLA
    fallback path.

    This wrapper stays OUTSIDE jit so pallas_window/pallas_band defaults
    (None -> the USE_DEPTH_WINDOW / USE_NARROW_BAND module flags) resolve at
    every call: the jitted core only ever sees concrete values in its static
    cache key, so flipping a module flag or env default between calls can
    never silently reuse a stale executable — and positionally-passed flags
    are plain Python here, never tracers.
    """
    from .ops import pallas_fusion as pf

    window = (pf.USE_DEPTH_WINDOW if pallas_window is None
              else bool(pallas_window))
    band = pf.resolve_band(pallas_band)
    extra = (pf.EXTRA_PASS_BUDGET if pallas_extra is None
             else int(pallas_extra))
    return _integrate_bricks_jit(vol, depth, pose, rgb, split_key,
                                 int(update_budget), bool(use_pallas),
                                 bool(pallas_interpret), window, band, extra)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10), donate_argnums=(0,))
def _integrate_bricks_jit(vol: BrickVolume, depth, pose, rgb, split_key,
                          update_budget: int, use_pallas: bool,
                          pallas_interpret: bool, pallas_window: bool,
                          pallas_band: int, pallas_extra: int) -> BrickVolume:
    from .activation import (_compact_chunked, band_candidate_bricks,
                             carve_candidate_slots, depth_mips,
                             mip_base_level)

    cfg = vol.config
    B = vol.brick_size
    depth = jnp.asarray(depth)
    pose = jnp.asarray(pose, jnp.float32)
    pose_inv = rigid_inverse(pose)

    # hierarchical band activation: budgeted candidate brick list directly
    # (no full-grid mask/cumsum — the former 2048^3 bottleneck)
    nbx, nby, nbz = vol.bricks_per_axis
    mips = depth_mips(depth, mip_base_level(cfg, B))
    bids, n_band, overflow = band_candidate_bricks(
        cfg, B, (nbx, nby, nbz), mips, pose_inv, update_budget)
    if cfg.num_random_splits > 1:
        key = split_key if split_key is not None else jax.random.PRNGKey(0)
        bids, n_band, jovf = _jitter_split_bricks(
            cfg, (nbx, nby, nbz), depth, pose, bids, update_budget, key)
        overflow |= jovf

    # carve pass: LIVE bricks strictly in front of every depth under their
    # footprint get the reference's clamped free-space updates (hpp:189-198)
    # — the band list skips them by construction. Computed on the PRE-
    # allocation live set (band-new bricks can't be in front of the band).
    carve_budget = carve_budget_for(update_budget)
    live_pre = vol.coords[:, 0] >= 0
    carve_mask = carve_candidate_slots(cfg, B, mips, pose_inv, vol.coords,
                                       live_pre)
    carve_slots, n_carve = _compact_chunked(
        carve_mask, jnp.arange(vol.capacity, dtype=jnp.int32), carve_budget)
    overflow |= n_carve > carve_budget

    vol = _allocate_from_list(vol, bids)
    active_ok = bids >= 0
    bsafe = jnp.maximum(bids, 0)
    slots = jnp.take(vol.brick_map.reshape(-1), bsafe, mode="clip")
    slot_ok = active_ok & (slots >= 0)
    bx = bsafe // (nby * nbz)
    by = (bsafe // nbz) % nby
    bz = bsafe % nbz

    carve_ok = carve_slots >= 0
    cs_safe = jnp.clip(carve_slots, 0, vol.capacity - 1)
    cc = jnp.take(vol.coords, cs_safe, axis=0)
    bx = jnp.concatenate([bx, jnp.maximum(cc[:, 0], 0)])
    by = jnp.concatenate([by, jnp.maximum(cc[:, 1], 0)])
    bz = jnp.concatenate([bz, jnp.maximum(cc[:, 2], 0)])
    slot_ok = jnp.concatenate([slot_ok, carve_ok])
    slots = jnp.concatenate([slots, cs_safe])

    new_sdf, new_w, new_M, new_n, new_color, xovf = fuse_brick_batch(
        cfg, B, bx, by, bz, slot_ok, slots,
        vol.sdf, vol.weight, vol.M, vol.nsample, vol.color,
        depth, pose_inv, rgb, use_pallas, pallas_interpret, pallas_window,
        pallas_band, pallas_extra)
    return dataclasses.replace(
        vol, sdf=new_sdf, weight=new_w, M=new_M, nsample=new_n,
        color=new_color, overflowed=vol.overflowed | overflow | xovf)


def integrate_bricks_sequence(vol: BrickVolume, depths, poses, rgbs=None,
                              update_budget: int = 1 << 13,
                              use_pallas: bool = False,
                              pallas_interpret: bool = False,
                              split_key=None, pallas_window: bool = None,
                              pallas_band: int = None,
                              pallas_extra: int = None) -> BrickVolume:
    """Fuse a SEQUENCE of registered frames in ONE compiled scan.

    Throughput mode for offline reconstruction: identical semantics to
    calling :func:`integrate_bricks` per frame (bit-equal, asserted in
    tests), but the whole trajectory runs as a single `lax.scan` executable
    — no per-frame host dispatch (measured ~0.5 ms/frame through the TPU
    tunnel). ``depths`` [N, H, W], ``poses`` [N, 4, 4], optional ``rgbs``
    [N, H, W, 3] must be device-resident; with num_random_splits > 1 pass
    ``split_key`` to derive per-frame jitter keys.
    """
    from .ops import pallas_fusion as pf

    window = (pf.USE_DEPTH_WINDOW if pallas_window is None
              else bool(pallas_window))
    band = pf.resolve_band(pallas_band)
    extra = (pf.EXTRA_PASS_BUDGET if pallas_extra is None
             else int(pallas_extra))
    keys = None
    if vol.config.num_random_splits > 1:
        key = split_key if split_key is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(key, jnp.asarray(depths).shape[0])
    return _integrate_bricks_seq_jit(
        vol, jnp.asarray(depths),
        jnp.asarray(poses, jnp.float32),
        None if rgbs is None else jnp.asarray(rgbs), keys,
        int(update_budget), bool(use_pallas), bool(pallas_interpret),
        window, band, extra)


@partial(jax.jit, static_argnums=(5, 6, 7, 8, 9, 10), donate_argnums=(0,))
def _integrate_bricks_seq_jit(vol, depths, poses, rgbs, keys,
                              update_budget: int, use_pallas: bool,
                              pallas_interpret: bool, pallas_window: bool,
                              pallas_band: int, pallas_extra: int):
    step = _integrate_bricks_jit.__wrapped__   # the traced per-frame body
    n = depths.shape[0]

    def body(v, x):
        d, p, r, k = x
        return step(v, d, p,
                    r if rgbs is not None else None,
                    k if keys is not None else None,
                    update_budget, use_pallas, pallas_interpret,
                    pallas_window, pallas_band, pallas_extra), None

    xs = (depths, poses,
          rgbs if rgbs is not None else jnp.zeros((n, 0)),
          keys if keys is not None else jnp.zeros((n, 0)))
    return jax.lax.scan(body, vol, xs)[0]


def fuse_brick_batch(cfg: TSDFConfig, B: int, bx, by, bz, slot_ok, slots,
                     sdf, weight, M, nsample, color, depth, pose_inv,
                     rgb=None, use_pallas: bool = False,
                     pallas_interpret: bool = False,
                     pallas_window: bool = None, pallas_band: int = None,
                     pallas_extra: int = None):
    """Fuse one frame's budgeted brick batch into the [C, 4, B^3/4] SoA
    arrays (vreg-tiled storage — see :class:`BrickVolume`).

    The shared per-batch update behind both the single-device volume
    (:func:`integrate_bricks`) and the slab-sharded shard_map body
    (:mod:`cpu_tsdf_tpu.parallel.bricks`, where the arrays are the device's
    LOCAL slot partition and `slots` are local row ids). bx/by/bz are GLOBAL
    brick-grid coords [K] (they fix world positions); rows with slot_ok False
    are dumped. With use_pallas, row C-1 must be a reserved never-allocated
    dump row. Returns (sdf, weight, M, nsample, color, pass_overflow);
    pass_overflow is True when a frame needed more multipass kernel rows
    than EXTRA_PASS_BUDGET (results for the dropped passes are missing).
    """
    from .ops import color as color_ops
    from .ops.fusion import compute_observation

    if rgb is not None:
        # trunc mirrors the reference's uint8 color observations and keeps
        # the kernel path (pack_rgb truncates to pack 24 bits exactly) and
        # the XLA fallback bit-identical for non-integer rgb input
        rgb = jnp.trunc(jnp.asarray(rgb, jnp.float32))
    C = sdf.shape[0]
    slots = jnp.where(slot_ok, slots, C)  # C -> dump (mode="drop" skips)

    # voxel centers for each brick in the batch: [K, B, B, B]
    lx = jnp.arange(B, dtype=jnp.int32)
    vx = bx[:, None, None, None] * B + lx[None, :, None, None]
    vy = by[:, None, None, None] * B + lx[None, None, :, None]
    vz = bz[:, None, None, None] * B + lx[None, None, None, :]
    cx = (vx.astype(jnp.float32) + 0.5) * (cfg.xsize / cfg.xres) - cfg.xsize / 2
    cy = (vy.astype(jnp.float32) + 0.5) * (cfg.ysize / cfg.yres) - cfg.ysize / 2
    cz = (vz.astype(jnp.float32) + 0.5) * (cfg.zsize / cfg.zres) - cfg.zsize / 2

    # current state for the update batch comes from a clipped row gather
    # (invalid rows are masked by `valid`); the gathers are LAZY — the
    # kernel path updates in place via slot-indexed aliased blocks and only
    # needs them under the rare fallback cond or for color, so hoisting
    # them to the top cost ~2.2 ms/frame of dead [K, 512] gathers
    # (bench/integrate_trace)
    slots_c = jnp.clip(slots, 0, C - 1)
    K = bx.shape[0]

    def g(a):
        # row gather + view as [K, B, B, B] (storage is the vreg-tiled
        # [C, 4, V/4] — same linear order, see BrickVolume)
        return jnp.take(a, slots_c, axis=0).reshape(K, B, B, B)

    def xla_update():
        """Reference XLA path: per-voxel observation + fusion for the batch.

        Returns (du, wu, Mu, nu, valid, w0, w_eff, u, v) — w0 rides along
        for the callers' color update."""
        d0, w0, M0, n0 = g(sdf), g(weight), g(M), g(nsample)
        if cfg.frustum_culling:
            from .ops.fusion import coarse_cell_frustum

            frustum = coarse_cell_frustum(cfg, pose_inv, vx, vy, vz)
        else:
            frustum = jnp.ones(vx.shape, bool)
        d_obs, w_obs, valid, _, u, v = compute_observation(cfg, depth, pose_inv, cx, cy, cz)
        valid &= frustum & slot_ok[:, None, None, None]
        w_eff = w_obs
        if cfg.weight_by_variance:
            from .ops.fusion import voxel_variance

            var = voxel_variance(M0, w0, n0)
            scale = jnp.exp(-((d_obs - d0) ** 2) / (2.0 * var))
            w_eff = w_obs * jnp.where(n0 > 5, scale, 1.0)
        from .ops.fusion import fuse_observation

        du, wu, Mu, nu = fuse_observation(d0, w0, M0, n0, d_obs, w_eff, cfg.max_weight)
        du = jnp.where(valid, du, d0)
        wu = jnp.where(valid, wu, w0)
        Mu = jnp.where(valid, Mu, M0)
        nu = jnp.where(valid, nu, n0)
        return du, wu, Mu, nu, valid, w0, w_eff, u, v

    color_active = color is not None and rgb is not None
    if use_pallas:
        from .ops import pallas_fusion as pf
        from .ops.pallas_fusion import (brick_meta, fuse_bricks_inplace,
                                        pack_rgb, pad_depth, unpack_rgb)

        # None -> the module/env default. NOTE: jitted callers must resolve
        # the defaults BEFORE their jit boundary and pass concrete values
        # (as integrate_bricks does) — resolving here under an outer jit
        # whose cache key says None would freeze the flag at trace time.
        window = (pf.USE_DEPTH_WINDOW if pallas_window is None
                  else pallas_window)
        band = pf.resolve_band(pallas_band)
        V = B * B * B
        # EVERY brick runs through the kernel: bricks whose footprint spans
        # several (band x window) tiles get one kernel pass per tile (the
        # first in their main meta row, the rest via expand_extra_meta),
        # with disjoint per-pass validity — there is no XLA fallback path.
        meta, kernel_ok, tiles = brick_meta(cfg, B, bx, by, bz, slot_ok,
                                            pose_inv, window, band,
                                            multipass=True)
        # slot column: inactive/out-of-sensor-range bricks write to the
        # reserved dump row C-1 (never allocated — see _allocate)
        row_ok = slot_ok & kernel_ok
        kern_slot = jnp.where(row_ok, slots, C - 1).astype(jnp.int32)
        meta = meta.at[:, 4].set(row_ok.astype(jnp.int32))
        meta = meta.at[:, 5].set(kern_slot)
        meta_extra, xsrc, n_extra = pf.expand_extra_meta(
            cfg, C, meta, kern_slot, row_ok, tiles, window, band,
            budget=pallas_extra)
        pass_overflow = n_extra > meta_extra.shape[0]
        wact = pf._window_active(cfg, window)
        depth_c = pad_depth(depth, wact)
        pose_flat = pose_inv[:3, :].reshape(1, 12)

        out = fuse_bricks_inplace(
            cfg, B, meta, pose_flat, sdf, weight, M, nsample,
            pallas_interpret, depth=depth_c,
            rgb_packed=pack_rgb(rgb, wact) if color_active else None,
            window=window, band=band, meta_extra=meta_extra)
        new_sdf, new_w, new_M, new_n = out[:4]

        new_color = color
        if color_active:
            # color transform in XLA over the kernel's SLOT-INDEXED dense
            # aux channels: a pure full-array elementwise pass (the former
            # per-batch-row aux needed a [K, 512]-row gather of old color
            # plus a scatter of the update — ~7M arbitrary-indexed elements
            # each way per colored frame, the trajectory bench's dominant
            # cost). Multipass folding happened in-kernel (disjoint-validity
            # accumulation); the dump row C-1 keeps weff = -1 throughout.
            rgbp, weff = out[4], out[5]
            c4 = (C, B, B, B)
            rr, gg, bb = unpack_rgb(rgbp.reshape(c4))
            weff = weff.reshape(c4)
            cvalid = weff >= 0
            w0_all = weight.reshape(c4)  # PRE-update weights (the kernel
            # updated in place via aliasing, but `weight` still names the
            # pre-update buffer)
            cu = color_ops.update_color(cfg.color_mode, color, w0_all,
                                        rr, gg, bb, jnp.maximum(weff, 0.0))
            new_color = jnp.where(cvalid[..., None], cu, color)

        return new_sdf, new_w, new_M, new_n, new_color, pass_overflow

    d1, w1, M1, n1, valid, w0, w_eff, u, v = xla_update()
    new_color = color
    if color_active:
        c0 = jnp.take(color, slots_c, axis=0)
        rr = _gather_img(rgb[..., 0], v, u)
        gg = _gather_img(rgb[..., 1], v, u)
        bb = _gather_img(rgb[..., 2], v, u)
        cu = color_ops.update_color(cfg.color_mode, c0, w0, rr, gg, bb, w_eff)
        cu = jnp.where(valid[..., None], cu, c0)
        new_color = color.at[slots].set(cu, mode="drop")

    # invalid rows carry slot == C, which mode="drop" skips — so they never
    # clobber real slots (in particular not the clipped slot they read)
    def s(a, upd):
        return a.at[slots].set(upd.reshape((K,) + a.shape[1:]), mode="drop")

    return (s(sdf, d1), s(weight, w1), s(M, M1), s(nsample, n1), new_color,
            jnp.zeros((), bool))


def _gather_img(img, v, u):
    H, W = img.shape[:2]
    return img[jnp.clip(v, 0, H - 1), jnp.clip(u, 0, W - 1)]


# ---------------------------------------------------------------------------
# conversion
# ---------------------------------------------------------------------------

def to_dense(vol: BrickVolume) -> TSDFVolume:
    """Materialize the brick volume as a dense TSDFVolume (unallocated = -1/0)."""
    cfg = vol.config
    B = vol.brick_size
    nbx, nby, nbz = vol.bricks_per_axis

    def expand(data, fill):
        # color keeps [C, B, B, B, nc]; SoA rows are vreg-tiled [C, 4, V/4]
        extra = data.shape[4:]
        data = data.reshape((data.shape[0], B, B, B) + extra)
        pad = jnp.concatenate([data, jnp.full((1,) + data.shape[1:], fill, data.dtype)], 0)
        flat_map = jnp.where(vol.brick_map < 0, vol.capacity, vol.brick_map)
        blocks = pad[flat_map.reshape(-1)]  # [Nb, B, B, B(, c)]
        blocks = blocks.reshape((nbx, nby, nbz, B, B, B) + extra)
        blocks = jnp.moveaxis(blocks, (3, 4, 5), (1, 3, 5))
        return blocks.reshape((nbx * B, nby * B, nbz * B) + extra)

    return TSDFVolume(
        sdf=expand(vol.sdf, -1.0),
        weight=expand(vol.weight, 0.0),
        M=expand(vol.M, 0.0),
        nsample=expand(vol.nsample, 0),
        color=None if vol.color is None else expand(vol.color, 0.0),
        global_transform=vol.global_transform,
        config=cfg,
    )


def from_dense(vol: TSDFVolume, brick_size: int = 8,
               capacity: Optional[int] = None) -> BrickVolume:
    """Sparsify a dense volume: allocate every brick containing observations."""
    cfg = vol.config
    B = brick_size
    nbx, nby, nbz = cfg.xres // B, cfg.yres // B, cfg.zres // B
    obs = (vol.weight > 0).reshape(nbx, B, nby, B, nbz, B).any((1, 3, 5))
    n_obs = int(jnp.sum(obs))
    if capacity is None:
        # n_obs + 1: _allocate reserves the last row as the write-off dump,
        # so usable slots are capacity-1 — sizing to pow2(n_obs) exactly
        # dropped one brick (with overflowed set) whenever the observed
        # count was itself a power of two
        capacity = max(1024, 1 << int(np.ceil(np.log2(n_obs + 1))))
    bv = make_brick_volume(cfg, B, capacity, dtype=vol.sdf.dtype)
    bv = _allocate(bv, obs)

    def blockify(a):
        extra = a.shape[3:]
        blocks = a.reshape((nbx, B, nby, B, nbz, B) + extra)
        blocks = jnp.moveaxis(blocks, (1, 3), (3, 4))  # -> nbx,nby,nbz,B,B,B
        return blocks.reshape((nbx * nby * nbz, B, B, B) + extra)

    flat_map = bv.brick_map.reshape(-1)
    ok = flat_map >= 0
    slots = jnp.where(ok, flat_map, capacity)

    def scatter(data, blocks):
        blocks = blocks.reshape((blocks.shape[0],) + data.shape[1:])
        pad = jnp.concatenate([data, jnp.zeros((1,) + data.shape[1:], data.dtype)], 0)
        return pad.at[slots].set(blocks, mode="drop")[:-1]

    return dataclasses.replace(
        bv,
        sdf=scatter(bv.sdf, blockify(vol.sdf)),
        weight=scatter(bv.weight, blockify(vol.weight)),
        M=scatter(bv.M, blockify(vol.M)),
        nsample=scatter(bv.nsample, blockify(vol.nsample)),
        color=None if vol.color is None else scatter(bv.color, blockify(vol.color)),
        global_transform=vol.global_transform,
    )


# ---------------------------------------------------------------------------
# packed render source: one gather per voxel lookup instead of two
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedRenderVolume:
    """Render-only volume view with SDF and weight-validity packed into one
    f32 channel: NaN = unobserved (w == 0, d == -1), else the SDF value.

    Halves the gather traffic of the ray march / trilinear sampling (the
    renderer only ever uses `w` as a nonzero test). NOT usable for marching
    cubes or fusion (real weights are gone) — render paths only.
    """

    rd: jnp.ndarray                      # dense [X,Y,Z] or brick [C,4,V/4]
    brick_map: Optional[jnp.ndarray]     # None = dense layout
    color: Optional[jnp.ndarray]
    global_transform: jnp.ndarray
    config: TSDFConfig = dataclasses.field(metadata=dict(static=True))
    brick_size: int = dataclasses.field(metadata=dict(static=True), default=0)
    capacity: int = dataclasses.field(metadata=dict(static=True), default=0)


def pack_render(vol) -> PackedRenderVolume:
    """Build the packed render view from a dense or brick volume."""
    rd = jnp.where(vol.weight > 0, vol.sdf, jnp.nan)
    if isinstance(vol, TSDFVolume):
        return PackedRenderVolume(rd=rd, brick_map=None, color=vol.color,
                                  global_transform=vol.global_transform,
                                  config=vol.config)
    return PackedRenderVolume(rd=rd, brick_map=vol.brick_map, color=vol.color,
                              global_transform=vol.global_transform,
                              config=vol.config, brick_size=vol.brick_size,
                              capacity=vol.capacity)


def _gather_packed(vol: PackedRenderVolume, ix, iy, iz):
    cfg = vol.config
    if vol.brick_map is None:
        lin = (ix * cfg.yres + iy) * cfg.zres + iz
        rd = jnp.take(vol.rd.reshape(-1), lin, mode="clip")
    else:
        B = vol.brick_size
        nbx, nby, nbz = cfg.xres // B, cfg.yres // B, cfg.zres // B
        blin = ((ix // B) * nby + (iy // B)) * nbz + (iz // B)
        slot = jnp.take(vol.brick_map.reshape(-1), blin, mode="clip")
        inner = ((ix % B) * B + (iy % B)) * B + (iz % B)
        lin = jnp.clip(slot, 0, vol.capacity - 1) * (B * B * B) + inner
        rd = jnp.take(vol.rd.reshape(-1), lin, mode="clip")
        rd = jnp.where(slot < 0, jnp.nan, rd)
    unobserved = jnp.isnan(rd)
    return jnp.where(unobserved, -1.0, rd), jnp.where(unobserved, 0.0, 1.0)
