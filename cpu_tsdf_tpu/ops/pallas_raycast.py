"""Pallas TPU ray-march kernel: tile-sorted brick raycasting.

The TPU-native core of ``renderView``
(/root/reference/src/lib/tsdf_volume_octree.cpp:278-424). The XLA lockstep
march (ops/raycast.py) is bound by arbitrary-gather throughput (~0.1 G
elem/s measured on this chip — BASELINE.md); this kernel eliminates
arbitrary gathers entirely:

  * every active brick gets a HALOED 16^3 SDF table (brick 8^3 + 4-voxel halo,
    NaN = unobserved), streamed to VMEM per grid step via a scalar-prefetched
    BlockSpec index map;
  * the grid runs over (brick, 32x32-pixel tile) PAIRS, sorted by tile; each
    step marches the tile's 1024 rays (one (8,128) register tile) through the
    brick's [t_in, t_out] ray segment in lockstep;
  * per-voxel lookups are lane-wise ``take_along_axis`` gathers into the
    VMEM-resident table (the one vector-addressable gather TPUs have);
  * per-ray results min-combine across pairs into per-tile output blocks
    (revisited blocks stay VMEM-resident because pairs are tile-sorted).

March semantics replicate the reference recurrence per pair (adaptive step
max(cell/4, |d|*max_dist_neg), sign-change crossing with both weights
nonzero, half-voxel backtrack, analytic trilinear refinement, central-
difference normals — cpp:318-419). The only deliberate divergence: each
pair's march grid is anchored at its own segment entry (t_in - cell/2)
rather than carrying the global phase of the reference's free-space march,
so bracket positions can differ by up to half a cell; the refined crossing
agrees to O(h^2) on trilinear-smooth fields (validated against the XLA
renderer in tests/test_pallas_raycast.py).

Why this covers every crossing exactly once: a crossing has nonzero weights
on both sides, so it lies in an allocated brick whose pair samples
[t_in - cell/2, t_out + 2 cells] contiguously; zeros in the overlap are
found by both neighbors and deduped by the min-combine (keyed on the
pre-refinement bracket position, matching the reference's first-crossing
rule).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TSDFConfig

HALO = 4                   # voxels of halo per side; table = (8 + 2*HALO)^3 = 16^3
TDIM = 16
TABLE = TDIM * TDIM * TDIM   # 4096 voxels
PTABLE = TABLE // 2          # int32 lanes: two z-adjacent int16 values each
NAN_Q = -32768               # quantized sentinel for unobserved voxels
TILE_PX = 32               # ray tile = 32x32 pixels = (8, 128) lanes
MAX_TILES_PER_BRICK = 36   # bricks whose footprint spans more trigger overflow
NCH = 8                    # out channels: key_t, t_star, valid, nvalid, nx, ny, nz, pad
MAX_PAIRS_PER_CALL = 1024  # scalar-prefetch SMEM budget per pallas_call


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RenderPack:
    """Prebuilt kernel inputs for one brick volume state."""

    tables: jnp.ndarray      # int32 [R, 1, PTABLE] haloed SDF, int16 z-pairs
    coords: jnp.ndarray      # int32 [R, 3] brick coords (-1 = unused row)
    n_active: jnp.ndarray    # int32 (count of used rows)
    truncated: jnp.ndarray   # bool: live bricks beyond r_budget were DROPPED
    global_transform: jnp.ndarray
    color: Optional[jnp.ndarray]          # brick color array (for colored render)
    brick_map: Optional[jnp.ndarray]      # for colored-render voxel lookups
    config: TSDFConfig = dataclasses.field(metadata=dict(static=True))
    brick_size: int = dataclasses.field(metadata=dict(static=True))
    capacity: int = dataclasses.field(metadata=dict(static=True))


def _quant_scale(cfg: TSDFConfig) -> float:
    """int16 quantization scale: SDF values span [-1, max_dist_pos/mdn]."""
    return 32000.0 / max(1.0, cfg.max_dist_pos / cfg.max_dist_neg)


# int32 pair of two NAN_Q int16s (0x8000_8000)
NAN_PAIR = int(np.array(0x80008000, np.uint32).view(np.int32))


def quantize_pack_rows(cfg: TSDFConfig, sdf_rows, weight_rows):
    """int16-quantize SDF rows (NaN = unobserved) and pack z-adjacent values
    into int32 lanes. [R, 512] SoA rows -> [R, 8, 8, 4] packed pairs."""
    B = 8
    R = sdf_rows.shape[0]
    scale = _quant_scale(cfg)
    rd = jnp.where(weight_rows > 0, sdf_rows, jnp.nan).reshape(R, B, B, B)
    q = jnp.where(jnp.isnan(rd), NAN_Q,
                  jnp.clip(jnp.round(rd * scale), -32767, 32767)).astype(jnp.int32)
    return (q[..., 1::2] << 16) | (q[..., 0::2] & 0xFFFF)


def assemble_tables(raw_ext, own, neighbor_slot):
    """Haloed 16^3 table assembly: concat tree of 27 pair-aligned pieces.

    ``raw_ext`` [Rows, 8, 8, 4] are the int32-packed brick pair blocks the
    halo pieces gather from (Rows may exceed the own-row count R — the
    slab-sharded pack appends ghost-plane rows received over ppermute);
    ``own`` [R, 8, 8, 4] is the center piece; ``neighbor_slot(ox, oy, oz)``
    returns per-own-row indices into raw_ext (indices >= Rows fill with
    NAN_PAIR). Returns [R, 16, 16, 8] packed pairs."""
    B = 8
    R = own.shape[0]
    rows = raw_ext.shape[0]
    HP = HALO // 2  # halo extent in pairs

    def src_slice(o, pairs=False):
        h = HP if pairs else HALO
        n = B // 2 if pairs else B
        return (slice(n - h, n) if o < 0 else
                (slice(0, n) if o == 0 else slice(0, h)))

    xparts = []
    for ox in (-1, 0, 1):
        sx = src_slice(ox)
        yparts = []
        for oy in (-1, 0, 1):
            sy = src_slice(oy)
            zparts = []
            for oz in (-1, 0, 1):
                sz = src_slice(oz, pairs=True)
                if ox == oy == oz == 0:
                    zparts.append(own)
                    continue
                src = raw_ext[:, sx, sy, sz]
                ex = sx.stop - (sx.start or 0)
                ey = sy.stop - (sy.start or 0)
                ez = sz.stop - (sz.start or 0)
                piece = jnp.take(src.reshape(rows, -1),
                                 neighbor_slot(ox, oy, oz),
                                 axis=0, mode="fill", fill_value=NAN_PAIR)
                zparts.append(piece.reshape(R, ex, ey, ez))
            yparts.append(jnp.concatenate(zparts, 3))
        xparts.append(jnp.concatenate(yparts, 2))
    return jnp.concatenate(xparts, 1)


@partial(jax.jit, static_argnums=(1,))
def make_render_pack(vol, r_budget: int = 4096) -> RenderPack:
    """Assemble haloed per-brick SDF tables from a BrickVolume.

    Row r of `tables` holds slot r's 16^3 neighborhood (voxels
    [-HALO, B+HALO) per axis relative to the brick origin, z-fastest,
    int16-quantized z-pairs packed into int32 lanes; NAN_Q = unobserved/
    unallocated). Row r_budget-1 is reserved all-NaN (used by padding pairs).

    Build strategy (round 3): quantize+pack the raw volume ONCE into
    [C, 8, 8, 4] int32 pairs, then assemble each table as a concat tree of
    27 pair-aligned pieces row-gathered from the neighbors (the halo width 4
    is even, so every z slice lands on pair boundaries). The previous
    27x `.at[].set` into an [R,16,16,16] f32 intermediate forced repeated
    full-buffer rewrites in an awkward (16,16) tiling — the same pathology
    that cost the MC assembly 56 ms (bench/mc_probe2).
    """
    cfg = vol.config
    B = vol.brick_size
    assert B == 8, "render kernel assumes 8^3 bricks"
    nbx, nby, nbz = vol.bricks_per_axis
    C = vol.capacity
    # capacity's last row is the never-allocated kernel dump row, so clamping
    # to C keeps the R-1 reservation sound for small volumes
    R = min(r_budget, C)

    # quantize + pack only slot rows < R: live slots all sit below R after
    # the callers' budget growth (rows beyond R surface as `truncated`), and
    # the former full-capacity quantize streamed C*4 KB of sdf+weight per
    # pack build — 134 MB at the default 32k capacity for ~2k live bricks
    raw = quantize_pack_rows(cfg, vol.sdf[:R], vol.weight[:R])  # [R, 8, 8, 4]

    # liveness comes from coords alone (unallocated rows are -1): volumes from
    # merge_sharded have per-device slot GAPS, so n_active is not a bound.
    # Row R-1 stays reserved as the all-NaN padding table.
    coords = vol.coords[:R]
    used = (coords[:, 0] >= 0) & (jnp.arange(R) < R - 1)
    truncated = jnp.any(vol.coords[R - 1:, 0] >= 0)  # R <= capacity always
    bmap_flat = vol.brick_map.reshape(-1)

    def neighbor_slot(ox, oy, oz):
        nc = coords + jnp.asarray([ox, oy, oz])
        ok = used & (nc[:, 0] >= 0) & (nc[:, 0] < nbx) & (nc[:, 1] >= 0) \
            & (nc[:, 1] < nby) & (nc[:, 2] >= 0) & (nc[:, 2] < nbz)
        blin = (nc[:, 0] * nby + nc[:, 1]) * nbz + nc[:, 2]
        nslot = jnp.take(bmap_flat, jnp.clip(blin, 0, nbx * nby * nbz - 1),
                         mode="clip")
        # R -> fill (take mode="fill" pads any index >= R, which also covers
        # live neighbors beyond the budget on `truncated` volumes)
        return jnp.where(ok & (nslot >= 0), nslot, R)

    own = jnp.where(used[:, None], raw.reshape(R, -1),
                    NAN_PAIR).reshape(R, B, B, B // 2)
    tab = assemble_tables(raw, own, neighbor_slot)   # [R, 16, 16, 8] pairs

    return RenderPack(
        tables=tab.reshape(R, 1, PTABLE),
        coords=jnp.where(used[:, None], coords, -1),
        n_active=jnp.sum(used.astype(jnp.int32)),
        truncated=truncated,
        global_transform=vol.global_transform,
        color=vol.color,
        brick_map=vol.brick_map,
        config=cfg,
        brick_size=B,
        capacity=C,
    )


# ---------------------------------------------------------------------------
# pair list
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(2, 3))
def build_pairs(pack: RenderPack, pose, downsample_by: int, pair_budget: int):
    """(brick, image-tile) pairs sorted by tile. Returns (meta [P, 8] int32,
    tile_has_pairs [T] bool, overflow bool).

    meta rows: slot, tile_id, bx, by, bz, first_visit, valid, 0.
    Padding pairs carry slot = R-1 (the reserved NaN table row) and
    tile_id = T (the trash output block).
    """
    from ..geometry import rigid_inverse, transform_points

    cfg = pack.config
    B = pack.brick_size
    ds = downsample_by
    W, H = cfg.image_width // ds, cfg.image_height // ds
    fx, fy = cfg.focal_length_x / ds, cfg.focal_length_y / ds
    cx, cy = cfg.principal_point_x / ds, cfg.principal_point_y / ds
    TX, TY = -(-W // TILE_PX), -(-H // TILE_PX)
    T = TX * TY
    R = pack.tables.shape[0]
    P = pair_budget
    csx, csy, csz = cfg.cell_size

    pose_inv = rigid_inverse(jnp.asarray(pose, jnp.float32))
    coords = pack.coords
    used = coords[:, 0] >= 0

    # project the 8 brick corners (+ the march overlap margin) to bound the
    # pixel footprint
    pad = 1  # voxels of slack: winning hits lie within ~1 cell of the brick
    x0 = (coords[:, 0] * B - pad).astype(jnp.float32) * csx - cfg.xsize / 2
    y0 = (coords[:, 1] * B - pad).astype(jnp.float32) * csy - cfg.ysize / 2
    z0 = (coords[:, 2] * B - pad).astype(jnp.float32) * csz - cfg.zsize / 2
    ex, ey, ez = (B + 2 * pad) * csx, (B + 2 * pad) * csy, (B + 2 * pad) * csz

    u_min = jnp.full((R,), jnp.inf)
    u_max = jnp.full((R,), -jnp.inf)
    v_min = jnp.full((R,), jnp.inf)
    v_max = jnp.full((R,), -jnp.inf)
    z_min = jnp.full((R,), jnp.inf)
    z_max = jnp.full((R,), -jnp.inf)
    for dxc in (0.0, 1.0):
        for dyc in (0.0, 1.0):
            for dzc in (0.0, 1.0):
                px, py, pz = transform_points(
                    pose_inv, x0 + dxc * ex, y0 + dyc * ey, z0 + dzc * ez)
                zs = jnp.maximum(pz, 1e-3)
                u = px * fx / zs + cx
                v = py * fy / zs + cy
                u_min = jnp.minimum(u_min, u)
                u_max = jnp.maximum(u_max, u)
                v_min = jnp.minimum(v_min, v)
                v_max = jnp.maximum(v_max, v)
                z_min = jnp.minimum(z_min, pz)
                z_max = jnp.maximum(z_max, pz)
    # bricks straddling the camera plane: conservative full-image footprint
    straddle = z_min <= 1e-3
    u_min = jnp.where(straddle, 0.0, u_min)
    u_max = jnp.where(straddle, jnp.float32(W), u_max)
    v_min = jnp.where(straddle, 0.0, v_min)
    v_max = jnp.where(straddle, jnp.float32(H), v_max)

    vis = used & (z_max >= cfg.min_sensor_dist) & (z_min <= cfg.max_sensor_dist) \
        & (u_max >= -1.0) & (u_min <= W) & (v_max >= -1.0) & (v_min <= H)
    tx0 = jnp.clip(jnp.floor(u_min - 1).astype(jnp.int32) // TILE_PX, 0, TX - 1)
    tx1 = jnp.clip(jnp.floor(u_max + 1).astype(jnp.int32) // TILE_PX, 0, TX - 1)
    ty0 = jnp.clip(jnp.floor(v_min - 1).astype(jnp.int32) // TILE_PX, 0, TY - 1)
    ty1 = jnp.clip(jnp.floor(v_max + 1).astype(jnp.int32) // TILE_PX, 0, TY - 1)
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    count = jnp.where(vis, nx * ny, 0)
    # two distinct overflow causes: a per-brick tile footprint beyond
    # MAX_TILES_PER_BRICK cannot be fixed by a bigger pair list (fatal for
    # the kernel), while n_pairs > P is exactly what growing pair_budget
    # fixes — callers retry on the latter only
    ovf_tiles = jnp.any(count > MAX_TILES_PER_BRICK)
    count = jnp.minimum(count, MAX_TILES_PER_BRICK)
    offset = jnp.cumsum(count) - count
    n_pairs = jnp.sum(count)
    ovf_pairs = n_pairs > P

    pair_tile = jnp.full((P,), T, jnp.int32)
    pair_slot = jnp.full((P,), R - 1, jnp.int32)
    ridx = jnp.arange(R, dtype=jnp.int32)
    for j in range(MAX_TILES_PER_BRICK):
        ok = j < count
        tid = (ty0 + j // jnp.maximum(nx, 1)) * TX + (tx0 + j % jnp.maximum(nx, 1))
        tgt = jnp.where(ok & (offset + j < P), offset + j, P)
        pair_tile = pair_tile.at[tgt].set(jnp.where(ok, tid, T), mode="drop",
                                          unique_indices=True)
        pair_slot = pair_slot.at[tgt].set(jnp.where(ok, ridx, R - 1), mode="drop",
                                          unique_indices=True)

    order = jnp.argsort(pair_tile, stable=True)
    pair_tile = pair_tile[order]
    pair_slot = pair_slot[order]
    bc = pack.coords[pair_slot]
    meta = jnp.stack([
        pair_slot, pair_tile, jnp.maximum(bc[:, 0], 0), jnp.maximum(bc[:, 1], 0),
        # col 5 (first-visit) is recomputed PER CHUNK in raycast_pairs —
        # chunks re-seed their tiles from the carried buffer
        jnp.maximum(bc[:, 2], 0), jnp.zeros((P,), jnp.int32),
        (pair_tile < T).astype(jnp.int32), jnp.zeros((P,), jnp.int32)], -1)
    tile_hit = jnp.zeros((T + 1,), bool).at[pair_tile].set(True)[:T]
    return meta, tile_hit, ovf_tiles, ovf_pairs


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _make_pair_lookup(tab_ref):
    """Chunked lookup into the int16-PAIR-packed table.

    Mosaic's ``tpu.dynamic_gather`` only lowers lane-wise at (8, 128) and only
    runs at vector speed when the gathered data is a BROADCAST row (bisected:
    bench/pallas_probe*.py), so lookups scan PTABLE/128 broadcast-row chunks
    with a hi-bits select — table size is the per-lookup cost driver, which is
    why two z-adjacent voxels are packed per int32 lane (quantized to 1/32000
    of the SDF range: ~2e-5 value error, far below every parity tolerance).

    Returns (v_even, v_odd, bad_even, bad_odd) for a packed-pair flat index.
    """
    nchunks = PTABLE // 128
    chunks = [jnp.broadcast_to(tab_ref[0, 0, c * 128:(c + 1) * 128].reshape(1, 128),
                               (8, 128)) for c in range(nchunks)]

    def lookup_pair(fp):
        """Returns the two packed int16 values sign-extended to int32.

        Callers select between halves as INTEGERS and only then derive the
        float value / NaN flag — Mosaic cannot lower selects between i1
        vectors ("unsupported target bitwidth for truncation").
        """
        hi = fp >> 7
        lo = fp & 127
        acc = jnp.zeros((8, 128), jnp.int32)
        for c in range(nchunks):
            part = jnp.take_along_axis(chunks[c], lo, axis=1)
            acc = jnp.where(hi == c, part, acc)
        q0 = (acc << 16) >> 16          # arithmetic shifts sign-extend
        q1 = acc >> 16
        return q0, q1

    return lookup_pair


def _kernel(cfg: TSDFConfig, ds: int, TX: int, max_march: int, max_bt: int,
            meta_ref, pose_ref, tab_ref, out_in_ref, out_ref):
    B = 8
    W, H = cfg.image_width // ds, cfg.image_height // ds
    fx, fy = cfg.focal_length_x / ds, cfg.focal_length_y / ds
    pcx, pcy = cfg.principal_point_x / ds, cfg.principal_point_y / ds
    csx, csy, csz = cfg.cell_size
    cell_min = min(cfg.cell_size)
    half_cell = csz / 2.0
    mdn = cfg.max_dist_neg
    f32 = jnp.float32

    k = pl.program_id(0)
    slot = meta_ref[k, 0]
    tile = meta_ref[k, 1]
    bx = meta_ref[k, 2]
    by = meta_ref[k, 3]
    bz = meta_ref[k, 4]
    first = meta_ref[k, 5]
    pair_valid = meta_ref[k, 6]

    lookup_pair = _make_pair_lookup(tab_ref)

    inv_scale = 1.0 / _quant_scale(cfg)

    def nn_lookup(ix, iy, iz):
        """Nearest-voxel (value, unobserved) at table coords (clipped)."""
        tx = jnp.clip(ix + HALO, 0, TDIM - 1)
        ty = jnp.clip(iy + HALO, 0, TDIM - 1)
        tz = jnp.clip(iz + HALO, 0, TDIM - 1)
        fp = (((tx << 4) | ty) << 3) | (tz >> 1)
        q0, q1 = lookup_pair(fp)
        q = jnp.where((tz & 1) == 1, q1, q0)
        return q.astype(jnp.float32) * inv_scale, q == NAN_Q

    def column2(lx_, ly_, lz_):
        """Corner values at local z, z+1 for one (x, y) column (2 lookups)."""
        tx = jnp.clip(lx_ + HALO, 0, TDIM - 1)
        ty = jnp.clip(ly_ + HALO, 0, TDIM - 1)
        tz0 = jnp.clip(lz_ + HALO, 0, TDIM - 1)
        tz1 = jnp.clip(lz_ + 1 + HALO, 0, TDIM - 1)
        base = ((tx << 4) | ty) << 3
        q0 = tz0 >> 1
        a0_, a1_ = lookup_pair(base | q0)
        b0_, b1_ = lookup_pair(base | jnp.minimum(q0 + 1, TDIM // 2 - 1))
        odd0 = (tz0 & 1) == 1
        qc0 = jnp.where(odd0, a1_, a0_)
        from_a = (tz1 >> 1) == q0
        odd1 = (tz1 & 1) == 1
        qc1 = jnp.where(from_a, jnp.where(odd1, a1_, a0_), jnp.where(odd1, b1_, b0_))
        return ((qc0.astype(jnp.float32) * inv_scale,
                 qc1.astype(jnp.float32) * inv_scale),
                (qc0 == NAN_Q, qc1 == NAN_Q))

    def column4(lx_, ly_, lz_start):
        """Corner values at local z offsets 0..3 for one column (3 lookups)."""
        tx = jnp.clip(lx_ + HALO, 0, TDIM - 1)
        ty = jnp.clip(ly_ + HALO, 0, TDIM - 1)
        base = ((tx << 4) | ty) << 3
        tzs = [jnp.clip(lz_start + o + HALO, 0, TDIM - 1) for o in range(4)]
        qm = tzs[0] >> 1
        pairs = [lookup_pair(base | jnp.minimum(qm + d, TDIM // 2 - 1))
                 for d in range(3)]
        vals, bads = [], []
        for o in range(4):
            rel = tzs[o] - (qm << 1)
            pi = rel >> 1
            odd = (rel & 1) == 1
            sel = [jnp.where(odd, pr[1], pr[0]) for pr in pairs]
            q = jnp.where(pi == 0, sel[0], jnp.where(pi == 1, sel[1], sel[2]))
            vals.append(q.astype(jnp.float32) * inv_scale)
            bads.append(q == NAN_Q)
        return vals, bads

    p = lambda i: pose_ref[0, i]

    # ---- rays of this tile (pixel (u,v) -> unit dir in volume frame) ----
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    lpx = l_iota % TILE_PX
    lpy = s_iota * 4 + l_iota // TILE_PX
    u = (tile % TX) * TILE_PX + lpx
    v = (tile // TX) * TILE_PX + lpy
    ray_ok = (u < W) & (v < H) & (pair_valid > 0)
    dx0 = (u.astype(f32) - pcx) / fx
    dy0 = (v.astype(f32) - pcy) / fy
    dz0 = jnp.ones((8, 128), f32)
    inv_n = 1.0 / jnp.sqrt(dx0 * dx0 + dy0 * dy0 + dz0 * dz0)
    dx0, dy0, dz0 = dx0 * inv_n, dy0 * inv_n, dz0 * inv_n
    # rotate into the volume frame (pose = camera-to-volume, rotation rows)
    dxv = p(0) * dx0 + p(1) * dy0 + p(2) * dz0
    dyv = p(4) * dx0 + p(5) * dy0 + p(6) * dz0
    dzv = p(8) * dx0 + p(9) * dy0 + p(10) * dz0
    ox, oy, oz = p(3), p(7), p(11)

    # brick origin (world, volume frame)
    bwx = bx.astype(f32) * (B * csx) - cfg.xsize / 2
    bwy = by.astype(f32) * (B * csy) - cfg.ysize / 2
    bwz = bz.astype(f32) * (B * csz) - cfg.zsize / 2

    # ---- slab test: ray segment inside the brick AABB ----
    big = jnp.float32(1e9)
    t_in = jnp.full((8, 128), -big)
    t_out = jnp.full((8, 128), big)
    for dref, o_, lo_, sz_ in ((dxv, ox, bwx, B * csx), (dyv, oy, bwy, B * csy),
                               (dzv, oz, bwz, B * csz)):
        inv = 1.0 / jnp.where(jnp.abs(dref) < 1e-9, 1e-9, dref)
        ta = (lo_ - o_) * inv
        tb = (lo_ + sz_ - o_) * inv
        t_in = jnp.maximum(t_in, jnp.minimum(ta, tb))
        t_out = jnp.minimum(t_out, jnp.maximum(ta, tb))
    t0 = jnp.maximum(t_in - half_cell, cfg.min_sensor_dist)
    t_end = jnp.minimum(t_out + 2.0 * cell_min, cfg.max_sensor_dist)
    seg_ok = ray_ok & (t_in < t_out) & (t0 < t_end)

    def sample(t):
        """Nearest-voxel (d, w, inside_volume) at ray parameter t."""
        x = ox + t * dxv
        y = oy + t * dyv
        z = oz + t * dzv
        ix = jnp.floor((x - bwx) / csx).astype(jnp.int32)
        iy = jnp.floor((y - bwy) / csy).astype(jnp.int32)
        iz = jnp.floor((z - bwz) / csz).astype(jnp.int32)
        raw, bad = nn_lookup(ix, iy, iz)
        d = jnp.where(bad, -1.0, raw)
        w = jnp.where(bad, 0.0, 1.0)
        inside = (jnp.abs(x) <= cfg.xsize / 2) & (jnp.abs(y) <= cfg.ysize / 2) \
            & (jnp.abs(z) <= cfg.zsize / 2)
        return d, w, inside

    # ---- phase 1: adaptive march (cpp:318-371 semantics, pair-local grid) --
    one = jnp.ones((8, 128), f32)
    zero = jnp.zeros((8, 128), f32)
    st = dict(
        t=t0,
        step=jnp.full((8, 128), mdn * 0.75),
        d=zero, w=zero, last_d=zero, last_w=zero,
        found=zero,
        done=jnp.where(seg_ok, zero, one),
        i=jnp.int32(0),
    )

    def march_body(s):
        t = s["t"]
        d_new, w_new, inside = sample(t)
        active = s["done"] == 0
        crossing = (inside & ((d_new < 0) & (s["last_d"] > 0)
                              | (d_new > 0) & (s["last_d"] < 0))
                    & (s["last_w"] != 0) & (w_new != 0) & active)
        new_step = jnp.maximum(cell_min / 4.0, jnp.abs(d_new) * mdn)
        upd = active & inside & ~crossing
        s2 = dict(s)
        s2["last_d"] = jnp.where(upd, d_new, s["last_d"])
        s2["last_w"] = jnp.where(upd, w_new, s["last_w"])
        s2["d"] = jnp.where(crossing, d_new, s["d"])
        s2["w"] = jnp.where(crossing, w_new, s["w"])
        s2["step"] = jnp.where(upd, new_step, s["step"])
        s2["found"] = jnp.where(crossing, one, s["found"])
        advance = active & ~crossing
        t_next = t + jnp.where(advance, s2["step"], 0.0)
        s2["t"] = t_next
        done_now = crossing | (t_next > t_end) | (active & ~inside & (t > t_in))
        s2["done"] = jnp.where(done_now, one, s["done"])
        s2["i"] = s["i"] + 1
        return s2

    def march_cond(s):
        return (s["i"] < max_march) & (jnp.min(s["done"]) < 0.5)

    s = jax.lax.while_loop(march_cond, march_body, st)
    found = s["found"] > 0
    has_found = jnp.max(s["found"]) > 0.5

    # ---- seed the tile's output block on its first pair in this call ----
    # Consecutive pairs of the same tile accumulate in the VMEM-resident out
    # block (pairs are tile-sorted); the FIRST pair of a tile within this
    # pallas_call seeds it from the aliased input, which carries the state
    # across chunked calls.
    @pl.when(first == 1)
    def _():
        for ch in range(NCH):
            out_ref[0, ch] = out_in_ref[0, ch]

    # Phases 2+3 and the combine run only when some lane found a crossing
    # (back-surface and grazing pairs skip the expensive refinement).
    @pl.when(has_found)
    def _():
        # ---- phase 2: half-voxel backtrack (cpp:329-354) ----
        old_t = s["t"] - s["step"]
        bt = dict(t=s["t"], last_d=s["last_d"], last_w=s["last_w"],
                  done=jnp.where(found, zero, one), i=jnp.int32(0))

        def bt_body(b):
            active = b["done"] == 0
            exit_loop = active & (b["t"] < old_t)
            stepping = active & ~exit_loop
            t_new = b["t"] - half_cell
            d_new, w_new, inside = sample(t_new)
            same_sign = ((b["last_d"] > 0) & (d_new > 0)) \
                | ((b["last_d"] < 0) & (d_new < 0))
            hit = stepping & inside & same_sign
            brk_out = stepping & ~inside
            cont = stepping & inside & ~same_sign
            b2 = dict(b)
            b2["last_d"] = jnp.where(hit, d_new, b["last_d"])
            b2["last_w"] = jnp.where(hit, w_new, b["last_w"])
            b2["t"] = jnp.where(cont | brk_out, t_new, b["t"])
            b2["done"] = jnp.where(exit_loop | hit | brk_out, one, b["done"])
            b2["i"] = b["i"] + 1
            return b2

        def bt_cond(b):
            return (b["i"] < max_bt) & (jnp.min(b["done"]) < 0.5)

        b = jax.lax.while_loop(bt_cond, bt_body, bt)
        t_bt = b["t"]
        step_r = half_cell

        # ---- phase 3: trilinear refinement + normals (cpp:378-419) ----
        def trilinear(tq):
            x = ox + tq * dxv
            y = oy + tq * dyv
            z = oz + tq * dzv
            # corner base: floor index, step back below voxel center, interior
            # validity on the UN-adjusted index (interpolate.py:_corner_base)
            gx = jnp.floor((x + cfg.xsize / 2) / csx).astype(jnp.int32)
            gy = jnp.floor((y + cfg.ysize / 2) / csy).astype(jnp.int32)
            gz = jnp.floor((z + cfg.zsize / 2) / csz).astype(jnp.int32)
            ok = (gx > 0) & (gx < cfg.xres - 1) & (gy > 0) & (gy < cfg.yres - 1) \
                & (gz > 0) & (gz < cfg.zres - 1) \
                & (jnp.abs(x) <= cfg.xsize / 2) & (jnp.abs(y) <= cfg.ysize / 2) \
                & (jnp.abs(z) <= cfg.zsize / 2) & ~jnp.isnan(z)
            ccx = (gx.astype(f32) + 0.5) * csx - cfg.xsize / 2
            ccy = (gy.astype(f32) + 0.5) * csy - cfg.ysize / 2
            ccz = (gz.astype(f32) + 0.5) * csz - cfg.zsize / 2
            gx = jnp.clip(jnp.where(x < ccx, gx - 1, gx), 0, cfg.xres - 2)
            gy = jnp.clip(jnp.where(y < ccy, gy - 1, gy), 0, cfg.yres - 2)
            gz = jnp.clip(jnp.where(z < ccz, gz - 1, gz), 0, cfg.zres - 2)
            a = (x - ((gx.astype(f32) + 0.5) * csx - cfg.xsize / 2)) / csx
            bb = (y - ((gy.astype(f32) + 0.5) * csy - cfg.ysize / 2)) / csy
            c = (z - ((gz.astype(f32) + 0.5) * csz - cfg.zsize / 2)) / csz
            lx = gx - bx * B
            ly = gy - by * B
            lz = gz - bz * B
            val = jnp.zeros((8, 128), f32)
            vld = ok
            for ddx in (0, 1):
                for ddy in (0, 1):
                    (c0, c1), (n0, n1) = column2(lx + ddx, ly + ddy, lz)
                    wx = a if ddx else 1 - a
                    wy = bb if ddy else 1 - bb
                    vld &= ~n0 & ~n1
                    val = val + wx * wy * (jnp.where(n0, -1.0, c0) * (1 - c)
                                           + jnp.where(n1, -1.0, c1) * c)
            return val, vld

        tprev = t_bt - step_r
        last_d_tri, valid_prev = trilinear(tprev)
        d_tri, valid_curr = trilinear(t_bt)
        valid = found & valid_prev & valid_curr \
            & ~jnp.isnan(d_tri) & ~jnp.isnan(last_d_tri)
        denom = last_d_tri - d_tri
        denom = jnp.where(denom == 0, 1e-20, denom)
        t_star = t_bt + step_r * (-1.0 + jnp.abs(last_d_tri / denom))
        hx = ox + t_star * dxv
        hy = oy + t_star * dyv
        hz = oz + t_star * dzv

        nvalid = valid & (jnp.abs(hx) <= cfg.xsize / 2) \
            & (jnp.abs(hy) <= cfg.ysize / 2) & (jnp.abs(hz) <= cfg.zsize / 2)

        # ---- normals via one shared corner block ----
        # The 6 normal samples sit at hit +- exactly one cell, so their corner
        # bases are the hit's base shifted by one unit (identical fractional
        # coords). One 32-corner "plus" fetch serves all six trilinear
        # evaluations; only float-epsilon boundary wobble can differ from the
        # XLA path's independent floors.
        fx0 = jnp.floor((hx + cfg.xsize / 2) / csx).astype(jnp.int32)
        fy0 = jnp.floor((hy + cfg.ysize / 2) / csy).astype(jnp.int32)
        fz0 = jnp.floor((hz + cfg.zsize / 2) / csz).astype(jnp.int32)
        ccx0 = (fx0.astype(f32) + 0.5) * csx - cfg.xsize / 2
        ccy0 = (fy0.astype(f32) + 0.5) * csy - cfg.ysize / 2
        ccz0 = (fz0.astype(f32) + 0.5) * csz - cfg.zsize / 2
        gx0 = jnp.clip(jnp.where(hx < ccx0, fx0 - 1, fx0), 0, cfg.xres - 2)
        gy0 = jnp.clip(jnp.where(hy < ccy0, fy0 - 1, fy0), 0, cfg.yres - 2)
        gz0 = jnp.clip(jnp.where(hz < ccz0, fz0 - 1, fz0), 0, cfg.zres - 2)
        a0 = (hx - ((gx0.astype(f32) + 0.5) * csx - cfg.xsize / 2)) / csx
        b0_ = (hy - ((gy0.astype(f32) + 0.5) * csy - cfg.ysize / 2)) / csy
        c0_ = (hz - ((gz0.astype(f32) + 0.5) * csz - cfg.zsize / 2)) / csz
        lx0 = gx0 - bx * B
        ly0 = gy0 - by * B
        lz0 = gz0 - bz * B

        blk = {}
        blk_nan = {}
        # center columns (i, j in {0,1}) come from the column4 fetch below;
        # fetching them here too was 8 dead lookup scans per refinement
        for (i, j) in [(i, j) for i in (-1, 2) for j in (0, 1)] \
                + [(i, j) for i in (0, 1) for j in (-1, 2)]:
            (c0, c1), (n0, n1) = column2(lx0 + i, ly0 + j, lz0)
            blk[(i, j, 0)] = jnp.where(n0, -1.0, c0)
            blk[(i, j, 1)] = jnp.where(n1, -1.0, c1)
            blk_nan[(i, j, 0)] = n0
            blk_nan[(i, j, 1)] = n1
        for (i, j) in [(i, j) for i in (0, 1) for j in (0, 1)]:
            vals, bads = column4(lx0 + i, ly0 + j, lz0 - 1)
            for o in range(4):
                blk[(i, j, o - 1)] = jnp.where(bads[o], -1.0, vals[o])
                blk_nan[(i, j, o - 1)] = bads[o]

        def shifted_eval(sx_, sy_, sz_):
            val = jnp.zeros((8, 128), f32)
            bad = zero > one        # all-False as an i1 vector (Mosaic cannot
            for ddx in (0, 1):      # truncate an i8 bool buffer to i1)
                for ddy in (0, 1):
                    for ddz in (0, 1):
                        o = (sx_ + ddx, sy_ + ddy, sz_ + ddz)
                        bad |= blk_nan[o]
                        wx = a0 if ddx else 1 - a0
                        wy = b0_ if ddy else 1 - b0_
                        wz = c0_ if ddz else 1 - c0_
                        val = val + blk[o] * wx * wy * wz
            # interior-bounds on the UN-adjusted floor of the shifted point
            # (interpolate.py:_corner_base validity quirk) + in-volume
            qfx = fx0 + sx_
            qfy = fy0 + sy_
            qfz = fz0 + sz_
            qx = hx + sx_ * csx
            qy = hy + sy_ * csy
            qz = hz + sz_ * csz
            ok = (qfx > 0) & (qfx < cfg.xres - 1) & (qfy > 0) & (qfy < cfg.yres - 1) \
                & (qfz > 0) & (qfz < cfg.zres - 1) \
                & (jnp.abs(qx) <= cfg.xsize / 2) & (jnp.abs(qy) <= cfg.ysize / 2) \
                & (jnp.abs(qz) <= cfg.zsize / 2)
            return val, ok & ~bad

        d_xm, ok0 = shifted_eval(-1, 0, 0)
        d_xp, ok1 = shifted_eval(1, 0, 0)
        d_ym, ok2 = shifted_eval(0, -1, 0)
        d_yp, ok3 = shifted_eval(0, 1, 0)
        d_zm, ok4 = shifted_eval(0, 0, -1)
        d_zp, ok5 = shifted_eval(0, 0, 1)
        nvalid2 = nvalid & ok0 & ok1 & ok2 & ok3 & ok4 & ok5
        nx = (d_xp - d_xm) * mdn / (2 * csx)
        ny = (d_yp - d_ym) * mdn / (2 * csy)
        nz = (d_zp - d_zm) * mdn / (2 * csz)
        nn = jnp.sqrt(nx * nx + ny * ny + nz * nz)
        nn = jnp.where(nn == 0, 1.0, nn)

        # ---- min-combine into the tile's output block ----
        # The first-crossing rule is the min over pair keys (the
        # pre-refinement bracket position, matching cpp:318-371's
        # stop-at-first-crossing).
        key = jnp.where(found, t_bt, big)
        cur = out_ref[0, 0]
        win = key < cur
        out_ref[0, 0] = jnp.where(win, key, cur)
        out_ref[0, 1] = jnp.where(win, t_star, out_ref[0, 1])
        out_ref[0, 2] = jnp.where(win, valid.astype(f32), out_ref[0, 2])
        out_ref[0, 3] = jnp.where(win, nvalid2.astype(f32), out_ref[0, 3])
        out_ref[0, 4] = jnp.where(win, nx / nn, out_ref[0, 4])
        out_ref[0, 5] = jnp.where(win, ny / nn, out_ref[0, 5])
        out_ref[0, 6] = jnp.where(win, nz / nn, out_ref[0, 6])


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def raycast_pairs(pack: RenderPack, meta, pose, downsample_by: int,
                  pair_budget: int, interpret: bool = False, t_rows: int = 0):
    """Run the march kernel over the pair list. Returns out [T+1, NCH, 8, 128].

    ``t_rows`` > T pads the output tile rows (rows beyond the real tile grid
    stay at their initial no-crossing value) — the tile-sharded renderer
    slices a fixed Td-row window per device from the padded buffer
    (parallel/raycast.py), which must not wrap around the trash row."""
    cfg = pack.config
    ds = downsample_by
    W, H = cfg.image_width // ds, cfg.image_height // ds
    TX, TY = -(-W // TILE_PX), -(-H // TILE_PX)
    T = max(TX * TY, t_rows)
    cell_min = min(cfg.cell_size)
    # march budget: brick diagonal + overlap at >= cell/4 steps is the hard
    # bound (no lower cap: the loop exits early when all lanes are done, and a
    # capped budget could silently skip a crossing in a near-zero SDF brick)
    diag = math.sqrt(3.0) * 8 * max(cfg.cell_size) + 3 * cell_min
    max_march = int(diag / (cell_min / 4.0)) + 8
    # the pre-crossing step can be as large as max_dist_pos (|d| spans up
    # to max_dist_pos/max_dist_neg), so the backtrack budget must cover the
    # LARGER truncation bound — ops/raycast.py:172 uses the same max()
    max_bt = int(max(cfg.max_dist_pos, cfg.max_dist_neg)
                 / (cfg.cell_size[2] / 2.0)) + 3

    pose = jnp.asarray(pose, jnp.float32)
    pose_flat = pose[:3, :].reshape(1, 12)
    kern = partial(_kernel, cfg, ds, TX, max_march, max_bt)

    # initial output: no crossing anywhere (key = big)
    out = jnp.zeros((T + 1, NCH, 8, 128), jnp.float32).at[:, 0].set(1e9)

    out_spec = pl.BlockSpec((1, NCH, 8, 128), lambda k, m: (m[k, 1], 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def run_chunk(meta_c, out_c):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(meta_c.shape[0],),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),                   # pose
                pl.BlockSpec((1, 1, PTABLE), lambda k, m: (m[k, 0], 0, 0),
                             memory_space=pltpu.VMEM),                    # table
                out_spec,                                                 # prior out
            ],
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T + 1, NCH, 8, 128), jnp.float32),
            # flat input indices include the scalar-prefetch arg:
            # meta=0 pose=1 tables=2 out=3
            input_output_aliases={3: 0},
            interpret=interpret,
        )(meta_c, pose_flat, pack.tables, out_c)

    # the [P, 8] meta lives in SMEM (scalar prefetch); ~1024 rows per call is
    # the budget (same constraint as ops/pallas_fusion.MAX_BRICKS_PER_CALL)
    for s0 in range(0, meta.shape[0], MAX_PAIRS_PER_CALL):
        mc = meta[s0:s0 + MAX_PAIRS_PER_CALL]
        # first-visit flags are per-CHUNK (each chunk re-seeds its tiles
        # from the carried buffer)
        fc = jnp.concatenate([jnp.ones((1,), bool), mc[1:, 1] != mc[:-1, 1]])
        mc = mc.at[:, 5].set(fc.astype(jnp.int32))
        # pairs are tile-sorted with padding (tile = T) last: chunks that are
        # all padding skip the kernel
        out = jax.lax.cond(jnp.any(mc[:, 6] > 0),
                           lambda o, m=mc: run_chunk(m, o),
                           lambda o: o, out)
    return out


def _channels_from_out(cfg: TSDFConfig, downsample_by: int, out, tile_hit):
    """Un-tile the kernel's [>=T, NCH, 8, 128] output into flat per-ray
    channels (shared by the single-device and tile-sharded renderers; rows
    beyond the real T tiles are ignored)."""
    ds = downsample_by
    W, H = cfg.image_width // ds, cfg.image_height // ds
    TX, TY = -(-W // TILE_PX), -(-H // TILE_PX)
    T = TX * TY

    def untile(ch):
        t = out[:T, ch]                                   # [T, 8, 128]
        t = t.reshape(TY, TX, 8, 4, TILE_PX)              # s=(8), l=(4,32)
        t = t.transpose(0, 2, 3, 1, 4).reshape(TY, TILE_PX, TX * TILE_PX)
        return t.reshape(TY * TILE_PX, TX * TILE_PX)[:H, :W]

    tile_ok = jnp.repeat(jnp.repeat(tile_hit.reshape(TY, TX), TILE_PX, 0),
                         TILE_PX, 1)[:H, :W]
    ch = dict(
        t_bt=untile(0).reshape(-1),
        t_star=untile(1).reshape(-1),
        valid=(untile(2) > 0) & tile_ok,
        nvalid=(untile(3) > 0) & tile_ok,
        nx=untile(4).reshape(-1), ny=untile(5).reshape(-1),
        nz=untile(6).reshape(-1),
    )
    ch["valid"] = ch["valid"].reshape(-1)
    ch["nvalid"] = ch["nvalid"].reshape(-1)
    return ch


def _march_forward(pack: RenderPack, pose, downsample_by: int,
                   pair_budget: int, interpret: bool):
    """Kernel march -> flat per-ray channels (non-differentiable part)."""
    cfg = pack.config
    ds = downsample_by
    meta, tile_hit, ovf_tiles, ovf_pairs = build_pairs(pack, pose, ds,
                                                       pair_budget)
    # fatal: a bigger pair list cannot fix these (dropped bricks -> wrong
    # depths possible); fixable: retry with a larger pair_budget helps
    ovf_fatal = ovf_tiles | pack.truncated
    out = raycast_pairs(pack, meta, pose, ds, pair_budget, interpret)
    ch = _channels_from_out(cfg, ds, out, tile_hit)
    return ch, ovf_pairs, ovf_fatal


def _phase3_xla(vol, pose, downsample_by: int, t_bt, found):
    """Differentiable recomputation of the refinement + normals from the
    kernel's bracket positions — mirrors ops/raycast.py phase 3 exactly, so
    gradients through the Pallas renderer match the XLA renderer's."""
    from .interpolate import tsdf_value_vol
    from .raycast import camera_rays

    cfg = vol.config
    origins, dirs = camera_rays(cfg, pose, downsample_by)
    ox, oy, oz = origins[:, 0], origins[:, 1], origins[:, 2]
    dx, dy, dz = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    step = cfg.zsize / cfg.zres / 2.0
    # mask BEFORE computing positions: where() does not block NaN gradients,
    # and non-found rays carry the key sentinel (1e9) as t_bt
    t = jax.lax.stop_gradient(jnp.where(found, t_bt, 1.0))
    tprev = t - step

    def tri(tq):
        return tsdf_value_vol(vol, ox + tq * dx, oy + tq * dy, oz + tq * dz)

    last_d_tri, _ = tri(tprev)
    d_tri, _ = tri(t)
    denom = last_d_tri - d_tri
    # degenerate brackets would put ~1/denom^2 (inf in f32) into the
    # gradient; exclude them from the differentiable set entirely
    ok = found & (jnp.abs(denom) > 1e-6)
    denom = jnp.where(ok, denom, 1.0)
    t_star = t + step * (-1.0 + jnp.abs(last_d_tri / denom))
    t_star = jnp.where(ok, t_star, jax.lax.stop_gradient(t))
    hx = ox + t_star * dx
    hy = oy + t_star * dy
    hz = oz + t_star * dz
    csx, csy, csz = cfg.cell_size
    d_xm, _ = tsdf_value_vol(vol, hx - csx, hy, hz)
    d_xp, _ = tsdf_value_vol(vol, hx + csx, hy, hz)
    d_ym, _ = tsdf_value_vol(vol, hx, hy - csy, hz)
    d_yp, _ = tsdf_value_vol(vol, hx, hy + csy, hz)
    d_zm, _ = tsdf_value_vol(vol, hx, hy, hz - csz)
    d_zp, _ = tsdf_value_vol(vol, hx, hy, hz + csz)
    nx = (d_xp - d_xm) * cfg.max_dist_neg / (2 * csx)
    ny = (d_yp - d_ym) * cfg.max_dist_neg / (2 * csy)
    nz = (d_zp - d_zm) * cfg.max_dist_neg / (2 * csz)
    nn2 = nx * nx + ny * ny + nz * nz
    nn = jnp.sqrt(jnp.maximum(nn2, 1e-12))   # sqrt'(0) = inf otherwise
    zero = jnp.zeros_like(t_star)
    return dict(t_star=jnp.where(ok, t_star, zero),
                nx=jnp.where(ok, nx / nn, zero),
                ny=jnp.where(ok, ny / nn, zero),
                nz=jnp.where(ok, nz / nn, zero))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _march_diff(vol, pose, downsample_by, pair_budget, r_budget, interpret):
    """Differentiable march: Pallas kernel forward, XLA phase-3 backward.

    The crossing bracket is discrete (stop-gradient, like the XLA path); the
    refinement t* and normals are smooth functions of the SDF field and pose,
    recomputed differentiably in the backward pass from the saved brackets
    (the custom-VJP pattern for the north-star differentiability surface,
    SURVEY §7 M3/M4)."""
    pack = make_render_pack(vol, r_budget)
    ch, ovf_fix, ovf_fatal = _march_forward(pack, pose, downsample_by,
                                            pair_budget, interpret)
    return ch, ovf_fix | ovf_fatal


def _march_diff_fwd(vol, pose, downsample_by, pair_budget, r_budget, interpret):
    out = _march_diff(vol, pose, downsample_by, pair_budget, r_budget, interpret)
    ch, _ = out
    found = ch["t_bt"] < 1e8
    return out, (vol, pose, ch["t_bt"], found)


def _march_diff_bwd(downsample_by, pair_budget, r_budget, interpret, res, ct):
    vol, pose, t_bt, found = res
    ct_ch, _ = ct

    def f(vol_, pose_):
        return _phase3_xla(vol_, pose_, downsample_by, t_bt, found)

    _, vjp = jax.vjp(f, vol, pose)
    zero = jnp.zeros_like(t_bt)

    def g(name):
        c = ct_ch.get(name)
        return zero if c is None else jnp.where(found, c, 0.0)

    d_vol, d_pose = vjp(dict(t_star=g("t_star"), nx=g("nx"), ny=g("ny"),
                             nz=g("nz")))
    return d_vol, d_pose


_march_diff.defvjp(_march_diff_fwd, _march_diff_bwd)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _render_pallas_jit(pack: RenderPack, pose, downsample_by: int,
                       pair_budget: int, colored: bool, interpret: bool):
    pose = jnp.asarray(pose, jnp.float32)
    ch, ovf_fix, ovf_fatal = _march_forward(pack, pose, downsample_by,
                                            pair_budget, interpret)
    return (_assemble_from_channels(pack, pose, downsample_by, colored, ch),
            ovf_fix, ovf_fatal)


def _assemble_from_channels(pack, pose, downsample_by, colored, ch):
    from ..bricks import gather_color
    from ..geometry import voxel_index
    from .color import color_to_rgb
    from .raycast import assemble_view, camera_rays

    cfg = pack.config
    ds = downsample_by
    W, H = cfg.image_width // ds, cfg.image_height // ds
    origins, dirs = camera_rays(cfg, pose, ds)
    tsf = ch["t_star"]
    r = dict(
        hit_x=origins[:, 0] + tsf * dirs[:, 0],
        hit_y=origins[:, 1] + tsf * dirs[:, 1],
        hit_z=origins[:, 2] + tsf * dirs[:, 2],
        normal_x=ch["nx"], normal_y=ch["ny"], normal_z=ch["nz"],
        t_star=tsf, valid=ch["valid"], normal_valid=ch["nvalid"],
    )
    if colored and pack.color is not None:
        ix, iy, iz, okc = voxel_index(pack.config, r["hit_x"], r["hit_y"], r["hit_z"])
        vox_cols = gather_color(pack, ix, iy, iz)
        rr, gg, bb = color_to_rgb(cfg.color_mode, vox_cols)
        r["rgb_r"], r["rgb_g"], r["rgb_b"] = rr, gg, bb
        r["rgb_valid"] = okc & r["valid"]
    return assemble_view(cfg, pose, r, H, W)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def render_depth_pallas_diff(vol, pose, downsample_by: int = 1,
                             pair_budget: int = 16384, r_budget: int = 4096,
                             interpret: bool = False):
    """Differentiable Pallas render: (depth [H, W], valid [H, W], ok scalar)
    with gradients w.r.t. the brick volume's SDF/weights and the camera pose
    flowing through the custom VJP (kernel forward, XLA refinement backward).

    `ok` is False when the render is UNTRUSTWORTHY: live bricks were dropped
    beyond r_budget, or the pair list / tile footprint overflowed its budget.
    Callers must check it (the kernel cannot silently fall back inside jit)."""
    from ..geometry import rigid_inverse, transform_points
    from .raycast import camera_rays

    pose = jnp.asarray(pose, jnp.float32)
    ch, overflow = _march_diff(vol, pose, downsample_by, pair_budget,
                               r_budget, interpret)
    cfg = vol.config
    ds = downsample_by
    W, H = cfg.image_width // ds, cfg.image_height // ds
    origins, dirs = camera_rays(cfg, pose, ds)
    hx = origins[:, 0] + ch["t_star"] * dirs[:, 0]
    hy = origins[:, 1] + ch["t_star"] * dirs[:, 1]
    hz = origins[:, 2] + ch["t_star"] * dirs[:, 2]
    pose_inv = rigid_inverse(pose)
    _, _, depth_cam = transform_points(pose_inv, hx, hy, hz)
    return (jnp.where(ch["valid"], depth_cam, jnp.nan).reshape(H, W),
            ch["valid"].reshape(H, W), ~overflow)


def grow_r_budget(vol, r_budget: int = 4096) -> int:
    """Gap-aware pack-budget sizing: the highest LIVE row decides
    (merge_sharded volumes have per-device slot gaps, so n_active is not a
    bound). Volumes beyond r_budget GROW the budget (pow2) instead of
    falling back to the slow XLA march — tables live in HBM, so the kernel
    handles the 2048^3 working point's full active set directly. One host
    sync per doubling; shared by render_view_pallas and the bench."""
    while vol.capacity > r_budget and bool(
            jnp.any(vol.coords[r_budget - 1:, 0] >= 0)):
        r_budget *= 2
    return r_budget


def render_view_pallas(vol, pose, downsample_by: int = 1, colored: bool = False,
                       pack: Optional[RenderPack] = None, r_budget: int = 4096,
                       pair_budget: int = 16384, interpret: bool = False):
    """Render a BrickVolume with the Pallas march kernel.

    Falls back to the XLA renderer (ops.raycast.render_view) when the volume
    exceeds the kernel budgets (active bricks, pair list) or is not an 8^3
    brick volume. Pass a prebuilt `pack` to amortize table assembly across
    renders of the same volume state.
    """
    from ..bricks import BrickVolume
    from .raycast import render_view

    if not (isinstance(vol, BrickVolume) and vol.brick_size == 8):
        return render_view(vol, pose, downsample_by, colored=colored)
    if pack is None:
        pack = make_render_pack(vol, grow_r_budget(vol, r_budget))
    attempts = 0
    while True:
        res, ovf_fix, ovf_fatal = _render_pallas_jit(
            pack, jnp.asarray(pose, jnp.float32), downsample_by, pair_budget,
            colored, interpret)
        if bool(ovf_fatal):
            # tile-footprint / dropped-brick overflow: a bigger pair list
            # cannot fix it — fall back immediately instead of burning
            # guaranteed-to-overflow retries (each is a fresh jit trace)
            return render_view(vol, pose, downsample_by, colored=colored)
        if not bool(ovf_fix):
            return res
        attempts += 1
        if attempts > 2 or pair_budget >= (1 << 18):
            return render_view(vol, pose, downsample_by, colored=colored)
        # one generous jump (each budget value is a fresh jit trace)
        pair_budget = min(1 << 18, max(pair_budget * 8, 1 << 16))
