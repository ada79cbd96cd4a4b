"""Pallas TPU kernel for brick-batch projective TSDF fusion.

Why a kernel: XLA's arbitrary gather on this TPU runs at ~0.1 G elements/s
(measured), which makes the per-voxel depth-image lookup the dominant cost of
integration. This kernel keeps the WHOLE depth image resident in VMEM and
turns the lookup into MXU work. Per brick:

  1. dynamically slice a 128-row band of the depth image (sublane-dynamic
     slices are cheap on TPU; lane-dynamic are not, so rows only);
  2. column-select on the MXU: band [128, W] @ onehot(u) [W, V] -> [128, V];
  3. row-select on the VPU: sum over the 128 band rows masked by
     (row == v - v0), giving z_img [1, V];
  4. apply the exact reference fusion semantics (truncate -> normalize ->
     weighted average -> cap; hpp:146-214, octree.cpp:153-163).

NaN depth pixels are encoded as a large sentinel before the kernel (0 * NaN
would poison the one-hot matmul), and any z >= SENTINEL/2 invalidates the
observation.

Batch layout: one brick per grid step at block [1, 4, B^3/4]; brick data
rows are fetched/written BY SLOT ID through a scalar-prefetch-driven
index_map with input/output aliasing, so untouched rows carry over for free
(no XLA row gather/scatter around the batch). Bricks whose image footprint
exceeds one (band x window) tile (extremely close to the camera) run as
SEVERAL kernel passes — one per fixed tile of the image, each pass's
validity masked to its tile (meta col 7), continuation passes reading the
accumulated state from the resident OUT block. The former XLA fallback
cond is gone: its branches forced ~1.4 ms/frame of full-volume layout
copies around the kernel chain (bench/integrate_trace, round 4).

Color configs (octree.cpp:328-434 fuses color inside the same addObservation
as SDF): the three RGB channels are packed into ONE f32 image
(r*65536+g*256+b — 24 bits, exact in f32), looked up with a second one-hot
matmul over the same band, and emitted per batch-brick together with the
effective fused weight (sign-encoding validity). The caller applies the
mode-specific color transform (RGB/RGBNormalized/LAB) on those K rows in XLA
— image gathers (the 0.1 G elem/s bottleneck) never happen, and the color
storage keeps its [C, B, B, B, nc] layout.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TSDFConfig

BAND_ROWS = 128    # depth rows visible to one brick's footprint
# Column window for the depth lookup: the one-hot matmul contracts over the
# window width, so 256 instead of a 640-wide image cuts the kernel's MXU
# work 2.5x. Measured on v5e (bench/window_probe r4): 7.89 ms/frame vs 9.55
# without, bit-exact parity — ON by default (TSDF_FUSE_WINDOW=0 disables).
DEPTH_WINDOW_COLS = 256
# Callers read this at call time, so tests can monkeypatch it — the flag is
# a static jit arg, never baked into a cached executable under a stale value.
USE_DEPTH_WINDOW = os.environ.get("TSDF_FUSE_WINDOW", "1") == "1"
# Narrow row band: shrinks the one-hot matmul's OUTPUT rows (and the VPU
# row-mask reduce) from 128 to 64. Same fits-gating pattern as the column
# window. MEASURED ON v5e AND LOSES BADLY (53 ms/frame vs 9.55 — the 64-row
# kernel itself compiles to something pathological on this Mosaic
# toolchain, independent of fallback cost): stays OFF; the knob remains for
# re-measurement on future toolchains (TSDF_FUSE_BAND64=1).
DEPTH_BAND_NARROW = 64
USE_NARROW_BAND = os.environ.get("TSDF_FUSE_BAND64", "0") == "1"
# Multi-pass budget: bricks whose footprint exceeds one (band x window) tile
# run as SEVERAL kernel passes (one per tile, disjoint validity); this is the
# static number of extra pass rows per frame. Exceeding it (pathological
# near-camera frames) raises `overflowed`, never drops silently.
EXTRA_PASS_BUDGET = int(os.environ.get("TSDF_FUSE_EXTRA", "512"))
NAN_SENTINEL = 1e9




def pad_depth(depth, window: bool = False):
    """Pad to [>=BAND_ROWS rows, multiple-of-128 cols] and replace NaN with
    the sentinel (out-of-image / missing pixels read back >= SENTINEL and are
    rejected by the kernel's validity test). With `window`, one extra 128-col
    sentinel block is appended so bricks touching the image's right edge
    still fit a DEPTH_WINDOW_COLS window instead of falling back to XLA."""
    H, W = depth.shape
    Hp = max(BAND_ROWS, int(-(-H // 8) * 8))
    Wp = int(-(-W // 128) * 128) + (128 if window else 0)
    out = jnp.full((Hp, Wp), jnp.float32(NAN_SENTINEL))
    out = out.at[:H, :W].set(jnp.where(jnp.isnan(depth), NAN_SENTINEL, depth))
    return out


def pack_rgb(rgb, window: bool = False):
    """[H, W, 3] 0..255 -> one padded f32 image r*65536+g*256+b (24-bit
    exact); padding is 0 (those lanes are invalid in the kernel anyway).
    `window` mirrors :func:`pad_depth`'s extra column block."""
    H, W = rgb.shape[:2]
    Hp = max(BAND_ROWS, int(-(-H // 8) * 8))
    Wp = int(-(-W // 128) * 128) + (128 if window else 0)
    r, g, b = (jnp.trunc(rgb[..., i].astype(jnp.float32)) for i in range(3))
    p = r * 65536.0 + g * 256.0 + b
    return jnp.zeros((Hp, Wp), jnp.float32).at[:H, :W].set(p)


def unpack_rgb(p):
    """Inverse of :func:`pack_rgb` per element (exact for 0..255 ints)."""
    r = jnp.floor(p / 65536.0)
    rem = p - r * 65536.0
    g = jnp.floor(rem / 256.0)
    return r, g, rem - g * 256.0


# ---------------------------------------------------------------------------
# v2: in-place kernel — brick blocks are fetched/written by slot id directly
# (scalar-prefetch-driven index_map + input/output aliasing), eliminating the
# XLA row gather/scatter around the batch entirely.
# ---------------------------------------------------------------------------

def _padded_width(cfg: TSDFConfig, window: bool = False) -> int:
    # must mirror pad_depth/pack_rgb column padding (extra block with window)
    return int(-(-cfg.image_width // 128) * 128) + (128 if window else 0)


def _padded_height(cfg: TSDFConfig) -> int:
    # must mirror pad_depth/pack_rgb row padding
    return max(BAND_ROWS, int(-(-cfg.image_height // 8) * 8))


def _window_active(cfg: TSDFConfig, window: bool) -> bool:
    """Column windowing pays off only when the padded image is wider than
    the window itself (otherwise the full width IS the window)."""
    return bool(window) and _padded_width(cfg) > DEPTH_WINDOW_COLS


def resolve_band(pallas_band) -> int:
    """None -> the module/env default band height (read at call time, same
    monkeypatch-safe pattern as USE_DEPTH_WINDOW); an int passes through."""
    if pallas_band is None:
        return DEPTH_BAND_NARROW if USE_NARROW_BAND else BAND_ROWS
    return int(pallas_band)


def brick_meta(cfg: TSDFConfig, B: int, bx, by, bz, slot_ok, pose_inv,
               window: bool = False, band: int = BAND_ROWS,
               multipass: bool = False):
    """Per-brick kernel metadata: voxel base coords, depth band row origin,
    the footprint-fits flag, and (with `window`) the depth column-window
    index. Pure elementwise JAX. `band` is the kernel's depth-band height
    (rows).

    Corner projections bound every interior voxel's pixel coordinate:
    u = (fx·px + cx·pz)/pz is linear-fractional in the voxel position, so
    its extrema over the brick box lie at the 8 corners whenever zmin > 0
    (which `fits` requires).

    multipass=False (legacy/probe mode): footprints that don't fit one
    (band x window) tile are flagged NOT-ok; returns (meta, ok).

    multipass=True: EVERY brick with potentially-in-range voxels runs in the
    kernel — fitting bricks as today (one anchored pass), oversize or
    camera-plane-straddling bricks as one pass per fixed (band x window)
    tile of the image; each pass's validity is masked to its tile (meta
    col 7 packs the mask origins), so passes are disjoint and their
    accumulation is exact. The FIRST tile is this meta's row; the caller
    builds the remaining passes via :func:`expand_extra_meta`. Returns
    (meta, ok, (n_tiles, rt0, ct0, nct)) where ok = slot_ok minus bricks
    whose camera-z range proves no voxel can be in the sensor range
    (z is linear in position, so corner extrema bound all voxels)."""
    from ..geometry import transform_points

    base_x, base_y, base_z = bx * B, by * B, bz * B
    # project the 8 brick corners to bound the pixel footprint
    vmin = jnp.full(bx.shape, jnp.inf, jnp.float32)
    vmax = jnp.full(bx.shape, -jnp.inf, jnp.float32)
    umin = jnp.full(bx.shape, jnp.inf, jnp.float32)
    umax = jnp.full(bx.shape, -jnp.inf, jnp.float32)
    zmin = jnp.full(bx.shape, jnp.inf, jnp.float32)
    zmax = jnp.full(bx.shape, -jnp.inf, jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                cxx = ((base_x + dx * B).astype(jnp.float32)) * (cfg.xsize / cfg.xres) - cfg.xsize / 2
                cyy = ((base_y + dy * B).astype(jnp.float32)) * (cfg.ysize / cfg.yres) - cfg.ysize / 2
                czz = ((base_z + dz * B).astype(jnp.float32)) * (cfg.zsize / cfg.zres) - cfg.zsize / 2
                px, py, pz = transform_points(pose_inv, cxx, cyy, czz)
                zs = jnp.where(pz > 1e-6, pz, jnp.inf)
                vf = py * cfg.focal_length_y / zs + cfg.principal_point_y
                uf = px * cfg.focal_length_x / zs + cfg.principal_point_x
                vmin = jnp.minimum(vmin, vf)
                vmax = jnp.maximum(vmax, vf)
                umin = jnp.minimum(umin, uf)
                umax = jnp.maximum(umax, uf)
                zmin = jnp.minimum(zmin, pz)
                zmax = jnp.maximum(zmax, pz)
    rows_needed = vmax - jnp.maximum(vmin, 0.0)
    # Footprints straddling the camera plane (zmin <= 0) or taller than the
    # band can't be bounded by one tile; bricks fully behind/outside still
    # run through the kernel (their voxels simply fail proj_ok).
    # band start is aligned DOWN to a multiple of 8 (Mosaic sublane tiling),
    # so the usable band shrinks by up to 7 rows
    fits = (rows_needed < band - 10) & (zmin > 0)
    # clip against the PADDED height (pad rows hold the NaN sentinel, so a
    # band overhanging the image bottom is safe): clipping against the raw H
    # and then aligning down by 8 left rows [align8(H-band)+band, H)
    # uncovered whenever H % 8 != 0, silently fusing depth from the wrong
    # row for bricks at the image bottom. Hp and band are both multiples of
    # 8, so the top clip survives the alignment exactly.
    Hp = _padded_height(cfg)
    v0 = jnp.clip(jnp.floor(vmin).astype(jnp.int32) - 1, 0, max(Hp - band, 0))
    v0 = (v0 // 8) * 8
    wi = jnp.zeros_like(base_x)
    wact = _window_active(cfg, window)
    if wact:
        # depth column window [128*wi, 128*wi + DEPTH_WINDOW_COLS): every
        # in-image voxel u must land inside it. umin < 0 clips wi to 0 (u<0
        # voxels fail proj_ok); the top clip keeps the window inside the
        # padded image, which covers u >= 128*wi automatically.
        nw = (_padded_width(cfg, True) - DEPTH_WINDOW_COLS) // 128 + 1
        wi = jnp.clip(jnp.floor(umin).astype(jnp.int32) // 128, 0, nw - 1)
        fits &= umax < (wi * 128 + (DEPTH_WINDOW_COLS - 2)).astype(jnp.float32)
    zero = jnp.zeros_like(base_x)
    if not multipass:
        ok = slot_ok & fits
        meta = jnp.stack([base_x, base_y, base_z, v0 // 8,
                          ok.astype(jnp.int32), zero, wi,
                          (v0 // 8) + (wi << MASK_U_SHIFT)], -1
                         ).astype(jnp.int32)
        return meta, ok
    # ---- multipass: tile rect per brick --------------------------------
    # z is LINEAR in the voxel position, so [zmin, zmax] over the corners
    # bounds every voxel's camera depth: a brick entirely outside the
    # sensor range can't receive any valid observation -> identity update.
    reject = ((zmax < cfg.min_sensor_dist) | (zmin > cfg.max_sensor_dist))
    ok = slot_ok & ~reject
    RT, CT, WB, Wp = _tile_grid(cfg, window, band)
    # corner-derived pixel rect is only a valid bound when zmin > 0;
    # camera-plane straddlers cover the full tile grid.
    cb = zmin > 1e-6
    vlo = jnp.clip(jnp.floor(vmin).astype(jnp.int32), 0, cfg.image_height - 1)
    vhi = jnp.clip(jnp.floor(vmax).astype(jnp.int32), 0, cfg.image_height - 1)
    rt0 = jnp.where(cb, vlo // band, 0)
    rt1 = jnp.where(cb, vhi // band, RT - 1)
    if wact:
        ulo = jnp.clip(jnp.floor(umin).astype(jnp.int32), 0, cfg.image_width - 1)
        uhi = jnp.clip(jnp.floor(umax).astype(jnp.int32), 0, cfg.image_width - 1)
        ct0 = jnp.where(cb, ulo // WB, 0)
        ct1 = jnp.where(cb, uhi // WB, CT - 1)
    else:
        ct0 = zero
        ct1 = zero
    nct = ct1 - ct0 + 1
    n_tiles = jnp.where(ok & ~fits, (rt1 - rt0 + 1) * nct, 1)
    # main row = anchored single pass (fits) or the first tile (multipass)
    v0_m = jnp.where(fits, v0, jnp.minimum(rt0 * band, Hp - band))
    mv8 = jnp.where(fits, v0 // 8, rt0 * (band // 8))
    if wact:
        u0_m = jnp.where(fits, wi,
                         jnp.minimum(ct0 * (WB // 128), (Wp - WB) // 128))
        mu = jnp.where(fits, wi, ct0 * (WB // 128))
    else:
        u0_m, mu = wi, zero
    meta = jnp.stack([base_x, base_y, base_z, v0_m // 8,
                      ok.astype(jnp.int32), zero, u0_m,
                      mv8 + (mu << MASK_U_SHIFT)], -1).astype(jnp.int32)
    return meta, ok, (n_tiles, rt0, ct0, nct)


# meta col 7 packing: bits [0, MASK_U_SHIFT) = mask row origin / 8,
# bits [MASK_U_SHIFT, CONT_SHIFT) = mask col origin / 128, bit CONT_SHIFT =
# continuation pass (read state from the resident OUT block, not the input)
MASK_U_SHIFT = 12
CONT_SHIFT = 18


def _tile_grid(cfg: TSDFConfig, window: bool, band: int):
    """(RT, CT, WB, Wp): fixed tile grid of the padded image for multipass —
    row tiles at multiples of `band`, column tiles at multiples of the
    window width (1 column tile when windowing is off)."""
    Hp = _padded_height(cfg)
    Wp = _padded_width(cfg, window)
    RT = -(-Hp // band)
    if _window_active(cfg, window):
        WB = DEPTH_WINDOW_COLS
        CT = -(-Wp // WB)
    else:
        WB = Wp
        CT = 1
    return RT, CT, WB, Wp


def expand_extra_meta(cfg: TSDFConfig, C: int, meta, kern_slot, ok, tiles,
                      window: bool, band: int,
                      budget: int = None):
    """Pass rows 1..n-1 for every multipass brick, grouped per brick.

    meta/kern_slot/ok: the main-call rows from :func:`brick_meta`
    (multipass=True). tiles = (n_tiles, rt0, ct0, nct). Returns
    (meta_extra [E, 8], src [E] int32 — the source row in the main batch
    for aux merging, K for dead rows —, n_extra_total).

    Rows are ordered brick-major, so all passes of one brick are
    CONSECUTIVE grid steps in the extra kernel call: the first pass row of
    a brick reads state from HBM (updated by the main call), continuation
    rows read the slot block still resident in VMEM (cont bit in col 7).
    Dead rows (beyond the live total) trail the list and route to the dump
    row C-1."""
    n_tiles, rt0, ct0, nct = tiles
    E = EXTRA_PASS_BUDGET if budget is None else int(budget)
    K = meta.shape[0]
    n_extra = jnp.where(ok, n_tiles - 1, 0)
    off = jnp.cumsum(n_extra) - n_extra                       # exclusive
    total = off[-1] + n_extra[-1]
    r = jnp.arange(E, dtype=jnp.int32)
    le = off[None, :] <= r[:, None]                           # [E, K]
    blk = jnp.maximum(jnp.sum(le.astype(jnp.int32), axis=1) - 1, 0)
    # off[blk] gather-free (off non-decreasing, same trick as the MC
    # compaction); empty ranges share their successor's offset, so the
    # "last index with off <= r" lands on the covering brick
    off_r = jnp.max(jnp.where(le, off[None, :], 0), axis=1)
    p = r - off_r + 1                                         # pass index >= 1
    valid = r < total

    def g(a):
        return jnp.take(a, blk, axis=0)

    RT, CT, WB, Wp = _tile_grid(cfg, window, band)
    Hp = _padded_height(cfg)
    rt = g(rt0) + p // g(nct)
    ct = g(ct0) + p % g(nct)
    # slice origins clamped to the padded image so even dead rows carry
    # safe dynamic-slice starts; mask origins stay at the unclamped tile
    # (disjointness), which the clamped slice always covers
    rt = jnp.clip(rt, 0, RT - 1)   # dead rows can carry garbage p: keep the
    ct = jnp.clip(ct, 0, CT - 1)   # packed fields in their static bit ranges
    v0 = jnp.clip(rt * band, 0, max(Hp - band, 0))
    mv8 = rt * (band // 8)
    if _window_active(cfg, window):
        u0 = jnp.clip(ct * (WB // 128), 0, (Wp - WB) // 128)
        mu = ct * (WB // 128)
    else:
        u0 = jnp.zeros_like(rt)
        mu = jnp.zeros_like(rt)
    ok_e = valid & g(ok)
    cont = (p >= 2) & ok_e
    slot_e = jnp.where(ok_e, g(kern_slot), C - 1)
    meta_x = jnp.stack(
        [g(meta[:, 0]), g(meta[:, 1]), g(meta[:, 2]), v0 // 8,
         ok_e.astype(jnp.int32), slot_e, u0,
         mv8 + (mu << MASK_U_SHIFT)
         + (cont.astype(jnp.int32) << CONT_SHIFT)], -1).astype(jnp.int32)
    src = jnp.where(ok_e, blk, K)
    return meta_x, src, total


# Scalar-prefetch metadata lives in SMEM; more than ~1024 bricks of it per
# pallas_call overflows SMEM and crashes the Mosaic compiler (bisected), so
# larger batches run as a sequence of chunked calls.
MAX_BRICKS_PER_CALL = 1024


def _kernel_inplace(cfg: TSDFConfig, B: int, W: int, n_coarse: int,
                    want_color: bool, window: bool, band: int, multi: bool,
                    meta_ref, pose_ref, depth_ref, *refs):
    """One grid step = one brick at block [1, 4, V/4]; slot-indexed blocks.

    Without color: refs = (d0, w0, M0, n0, d1, w1, M1, n1).
    With color:    refs = (rgb, d0, w0, M0, n0, rgbp0, weff0,
                           d1, w1, M1, n1, rgbp1, weff1)
    where rgb is the packed color image and rgbp/weff are SLOT-INDEXED
    dense aux channels ([C, S, L], aliased in->out like the SoA state):
    the packed color observation and the effective fused weight (negative
    = no in-band observation). Slot indexing means the caller's XLA color
    transform runs as a full-array elementwise pass — the former
    per-batch-row aux forced a [K, 512]-row gather of old color + scatter
    of the update, ~2x 7M arbitrary-indexed elements per colored frame at
    this TPU's gather/scatter rates (the round-5 trajectory bench's
    dominant cost). With `window` the depth (and rgb) band is additionally
    column-sliced to the brick's DEPTH_WINDOW_COLS-wide window (meta col
    6).

    Validity is masked to the pass tile packed in meta col 7 (a no-op for
    anchored single-pass bricks, whose mask equals their band/window; exact
    disjoint coverage for multipass tiles). With `multi` (the extra-pass
    call), rows flagged cont read their state from the OUT block — still
    resident in VMEM, because a brick's passes are consecutive grid steps —
    so pass n accumulates on pass n-1 within the call."""
    import math as _math

    if want_color:
        rgb_ref, refs = refs[0], refs[1:]
        (d0_ref, w0_ref, M0_ref, n0_ref, rgbp0_ref, weff0_ref,
         d1_ref, w1_ref, M1_ref, n1_ref, rgbp1_ref, weff1_ref) = refs
    else:
        d0_ref, w0_ref, M0_ref, n0_ref = refs[:4]
        d1_ref, w1_ref, M1_ref, n1_ref = refs[4:8]

    V = B * B * B
    S, L = 4, V // 4
    k = pl.program_id(0)
    f32 = jnp.float32
    base_x = meta_ref[k, 0]
    base_y = meta_ref[k, 1]
    base_z = meta_ref[k, 2]
    v0 = pl.multiple_of(meta_ref[k, 3] * 8, 8)
    ok_brick = meta_ref[k, 4]
    q7 = meta_ref[k, 7]
    mask_v0 = (q7 & ((1 << MASK_U_SHIFT) - 1)) * 8
    mask_u0 = ((q7 >> MASK_U_SHIFT) & ((1 << (CONT_SHIFT - MASK_U_SHIFT)) - 1)) * 128

    vid = (jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) * L
           + jax.lax.broadcasted_iota(jnp.int32, (S, L), 1))
    lx = vid // (B * B)
    ly = (vid // B) % B
    lz = vid % B
    gx = base_x + lx
    gy = base_y + ly
    gz = base_z + lz
    cx = (gx.astype(f32) + 0.5) * (cfg.xsize / cfg.xres) - cfg.xsize / 2
    cy = (gy.astype(f32) + 0.5) * (cfg.ysize / cfg.yres) - cfg.ysize / 2
    cz = (gz.astype(f32) + 0.5) * (cfg.zsize / cfg.zres) - cfg.zsize / 2

    p = lambda i: pose_ref[0, i]
    vx = p(0) * cx + p(1) * cy + p(2) * cz + p(3)
    vy = p(4) * cx + p(5) * cy + p(6) * cz + p(7)
    vz = p(8) * cx + p(9) * cy + p(10) * cz + p(11)

    zsafe = jnp.where(vz > 0, vz, 1.0)
    uf = vx * cfg.focal_length_x / zsafe + cfg.principal_point_x
    vf = vy * cfg.focal_length_y / zsafe + cfg.principal_point_y
    u = jnp.trunc(uf).astype(jnp.int32)
    v = jnp.trunc(vf).astype(jnp.int32)
    in_range = (vz >= cfg.min_sensor_dist) & (vz <= cfg.max_sensor_dist)
    proj_ok = (vz > 0) & (u >= 0) & (u < cfg.image_width) & (v >= 0) & (v < cfg.image_height)

    # coarse-cell frustum culling, fully in-kernel (tsdf_volume_octree.cpp:619-652)
    if cfg.frustum_culling:
        tan_h = _math.tan(1.1 * _math.atan(0.5 * cfg.image_width / cfg.focal_length_x))
        tan_v = _math.tan(1.1 * _math.atan(0.5 * cfg.image_height / cfg.focal_length_y))
        ccx = (((gx * n_coarse) // cfg.xres).astype(f32) + 0.5) * (cfg.xsize / n_coarse) - cfg.xsize / 2
        ccy = (((gy * n_coarse) // cfg.yres).astype(f32) + 0.5) * (cfg.ysize / n_coarse) - cfg.ysize / 2
        ccz = (((gz * n_coarse) // cfg.zres).astype(f32) + 0.5) * (cfg.zsize / n_coarse) - cfg.zsize / 2
        fx_ = p(0) * ccx + p(1) * ccy + p(2) * ccz + p(3)
        fy_ = p(4) * ccx + p(5) * ccy + p(6) * ccz + p(7)
        fz_ = p(8) * ccx + p(9) * ccy + p(10) * ccz + p(11)
        frustum = ((fz_ >= cfg.min_sensor_dist) & (fz_ <= cfg.max_sensor_dist)
                   & (jnp.abs(fx_) <= tan_h * fz_) & (jnp.abs(fy_) <= tan_v * fz_))
    else:
        frustum = jnp.full((S, L), True)

    # depth lookup: per-sublane-chunk one-hot matmul + row-mask reduce.
    # The matmul contracts over the band width, so the window slice (column
    # origin from meta, lane-aligned to 128) divides the MXU work by
    # W / DEPTH_WINDOW_COLS.
    if window:
        ubase = meta_ref[k, 6] * 128
        u0 = pl.multiple_of(ubase, 128)
        WB = DEPTH_WINDOW_COLS
        dband = depth_ref[pl.ds(v0, band), pl.ds(u0, WB)]      # [band, WB]
        band_rgb = (rgb_ref[pl.ds(v0, band), pl.ds(u0, WB)]
                    if want_color else None)
    else:
        ubase = 0
        WB = W
        dband = depth_ref[pl.ds(v0, band), :]                  # [band, W]
        band_rgb = rgb_ref[pl.ds(v0, band), :] if want_color else None

    # Mosaic's f32 dot rounds each operand to bf16 (RN, 8 significant bits —
    # measured: bench/window_debug showed looked-up depth == bf16(depth),
    # a ~2^-9 relative quantization = 6 mm at 3 m, 20% of the default
    # truncation band). The one-hot operand is exact in bf16, so splitting
    # the band into three bf16-representable planes (their sum reconstructs
    # f32 bit-exactly; 8+8+8 = 24 mantissa bits) makes the three dots
    # collectively LOSSLESS.
    bf = jnp.bfloat16
    d_hi = dband.astype(bf).astype(f32)
    r1 = dband - d_hi
    d_md = r1.astype(bf).astype(f32)
    d_lo = (r1 - d_md).astype(bf).astype(f32)
    if want_color:
        # packed 24-bit color (r*65536+g*256+b) fares even worse under bf16
        # (g/b vanish); the per-channel planes are <= 255 = bf16-exact, so
        # three dots select them losslessly and the f32 recombination is
        # exact (<= 24 bits)
        c_r = jnp.floor(band_rgb * (1.0 / 65536.0))
        rem = band_rgb - c_r * 65536.0
        c_g = jnp.floor(rem * (1.0 / 256.0))
        c_b = rem - c_g * 256.0
    z_chunks = []
    p_chunks = []
    for c in range(S):
        u_c = u[c:c + 1, :] - ubase                            # [1, L]
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (WB, L), 0)
        onehot = (col_iota == jnp.clip(u_c, 0, WB - 1)).astype(f32)  # [WB, L]
        dot = lambda a: jnp.dot(a, onehot, preferred_element_type=f32)
        m1 = dot(d_hi) + dot(d_md) + dot(d_lo)                 # [band, L]
        vrel = jnp.clip(v[c:c + 1, :] - v0, 0, band - 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (band, L), 0)
        row_mask = (row_iota == vrel).astype(f32)
        z_chunks.append(jnp.sum(m1 * row_mask, axis=0, keepdims=True))
        if want_color:
            m2 = dot(c_r) * 65536.0 + dot(c_g) * 256.0 + dot(c_b)
            p_chunks.append(jnp.sum(m2 * row_mask, axis=0, keepdims=True))
    z_img = jnp.concatenate(z_chunks, axis=0)                  # [S, L]

    valid = (in_range & proj_ok & (z_img < NAN_SENTINEL / 2)
             & (ok_brick > 0) & frustum)
    # pass-tile mask: exact disjointness across a multipass brick's rows
    # (a no-op for anchored rows — their footprint fits the mask by
    # construction). Column mask only when windowing splits columns.
    valid &= (v >= mask_v0) & (v < mask_v0 + band)
    if window:
        valid &= (u >= mask_u0) & (u < mask_u0 + DEPTH_WINDOW_COLS)
    d_new = z_img - vz
    valid &= d_new >= -cfg.max_dist_neg
    d_new = jnp.minimum(d_new, cfg.max_dist_pos) / cfg.max_dist_neg

    w_new = jnp.ones_like(d_new)
    if cfg.weight_by_depth:
        w_new = w_new * (1.0 - jnp.minimum(z_img / 10.0, 1.0))

    if multi:
        # continuation pass: the slot's OUT block holds the previous pass's
        # accumulated state and is still resident (consecutive same-slot
        # grid steps); first-visit rows read the (aliased) HBM input
        cont = (q7 >> CONT_SHIFT) > 0
        d0 = jnp.where(cont, d1_ref[0], d0_ref[0])
        w0 = jnp.where(cont, w1_ref[0], w0_ref[0])
        M0 = jnp.where(cont, M1_ref[0], M0_ref[0])
        n0 = jnp.where(cont, n1_ref[0], n0_ref[0])
        if want_color:
            rp_prev = jnp.where(cont, rgbp1_ref[0], rgbp0_ref[0])
            wf_prev = jnp.where(cont, weff1_ref[0], weff0_ref[0])
    else:
        d0 = d0_ref[0]
        w0 = w0_ref[0]
        M0 = M0_ref[0]
        n0 = n0_ref[0]
        if want_color:
            rp_prev = rgbp0_ref[0]
            wf_prev = weff0_ref[0]

    if cfg.weight_by_variance:
        # reference getVariance's n/(n-1) factor is INT division == 1 for
        # n >= 5 (octree.h:165) — variance is exactly M/w
        var = M0 / jnp.where(w0 > 0, w0, 1.0)
        var = jnp.where(n0 < 5, jnp.inf, var)
        scale = jnp.exp(-((d_new - d0) ** 2) / (2.0 * var))
        w_new = w_new * jnp.where(n0 > 5, scale, 1.0)

    wsum = w0 + w_new
    d_upd = jnp.where(wsum > 0,
                      (d0 * w0 + d_new * w_new) / jnp.where(wsum > 0, wsum, 1.0),
                      d0)  # wsum == 0: keep old d (see ops/fusion.py)
    w_upd = jnp.minimum(wsum, cfg.max_weight)
    M_upd = M0 + w_new * (d_new - d_upd) * (d_new - d0)
    n_upd = n0 + 1

    d1_ref[0] = jnp.where(valid, d_upd, d0)
    w1_ref[0] = jnp.where(valid, w_upd, w0)
    M1_ref[0] = jnp.where(valid, M_upd, M0)
    n1_ref[0] = jnp.where(valid, n_upd, n0)
    if want_color:
        # slot-indexed aux accumulation: packed color observation +
        # effective weight, validity sign-encoded (w_eff >= 0 = "this voxel
        # received an in-band observation"). Multipass rows have DISJOINT
        # validity, so keeping prev where invalid folds the passes exactly
        # (the former caller-side scatter-max).
        rgbp1_ref[0] = jnp.where(valid, jnp.concatenate(p_chunks, axis=0),
                                 rp_prev)
        weff1_ref[0] = jnp.where(valid, w_new, wf_prev)


@partial(jax.jit, static_argnums=(0, 1, 8),
         static_argnames=("interpret", "window", "band"),
         donate_argnums=(4, 5, 6, 7))
def fuse_bricks_inplace(cfg: TSDFConfig, B: int, meta, pose_inv_flat, sdf,
                        weight, M, nsample, interpret: bool = False, depth=None,
                        rgb_packed=None, window: bool = False,
                        band: int = BAND_ROWS, meta_extra=None):
    """In-place brick fusion over the FULL volume arrays.

    meta: [K, 8] int32 (base_x/y/z, v0/8, ok, slot, u0/128, mask) — slot
    indexes the brick data row each grid step reads AND writes (the
    framework reserves the last row as a write-off dump for inactive
    steps). Volume arrays arrive in their native vreg-tiled [C, 4, B^3/4]
    storage (see bricks.BrickVolume) and are donated; outputs alias them,
    so untouched rows carry over for free AND the jit's entry layout
    matches the kernel's operand constraint exactly — no transpose copies
    anywhere in the chain (bench/hlo_copies r4).

    meta_extra ([E, 8], :func:`expand_extra_meta`): continuation passes for
    bricks whose footprint spans several (band x window) tiles, run as ONE
    additional kernel call AFTER the main chunks (the call boundary makes
    the main call's writes visible to the extra call's first-visit reads).

    With rgb_packed (see :func:`pack_rgb`) the return gains two [C, S, L]
    SLOT-INDEXED dense aux arrays: the packed color observation per voxel
    and the effective fused weight (negative = no observation), for the
    caller's full-array XLA color transform (no gathers/scatters).
    """
    K = meta.shape[0]
    V = B * B * B
    C, S, L = sdf.shape
    assert (S, L) == (4, V // 4), (sdf.shape, B)
    W = depth.shape[1]
    n_coarse = 1 << cfg.num_coarse_levels
    want_color = rgb_packed is not None
    kern = partial(_kernel_inplace, cfg, B, W, n_coarse, want_color,
                   _window_active(cfg, window), band, False)
    kern_multi = partial(_kernel_inplace, cfg, B, W, n_coarse, want_color,
                         _window_active(cfg, window), band, True)

    def run_chunk(meta_c, arrays, kern=kern):
        KC = meta_c.shape[0]
        slot_spec = pl.BlockSpec((1, S, L), lambda k, m: (m[k, 5], 0, 0),
                                 memory_space=pltpu.VMEM)
        n_state = 4 + 2 * want_color
        img_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + want_color)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(KC,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + img_specs
            + [slot_spec] * n_state,
            out_specs=[slot_spec] * n_state,
        )
        out_shape = [jax.ShapeDtypeStruct((C, S, L), a.dtype)
                     for a in arrays]
        # flat input indices INCLUDE the scalar-prefetch arg:
        # meta=0 pose=1 depth=2 [rgb=3] sdf/w/M/n [rgbp/weff] follow
        a0 = 3 + want_color
        imgs = (depth, rgb_packed) if want_color else (depth,)
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases={a0 + i: i for i in range(n_state)},
            interpret=interpret,
        )(meta_c, pose_inv_flat, *imgs, *arrays)
        return tuple(out)

    arrays = (sdf, weight, M, nsample)
    if want_color:
        # slot-indexed dense aux channels, aliased through the chunk chain
        # exactly like the SoA state (-1 weff = "no observation")
        arrays += (jnp.zeros((C, S, L), jnp.float32),
                   jnp.full((C, S, L), -1.0, jnp.float32))
    for s in range(0, K, MAX_BRICKS_PER_CALL):
        e = min(s + MAX_BRICKS_PER_CALL, K)
        mc = meta[s:e]

        # the active list is rank-compacted (actives form a prefix), so
        # trailing padding-only chunks skip the kernel entirely
        arrays = jax.lax.cond(jnp.any(mc[:, 4] > 0),
                              lambda a, m=mc: run_chunk(m, a),
                              lambda a: a, arrays)

    if meta_extra is not None:
        E = meta_extra.shape[0]
        assert E <= MAX_BRICKS_PER_CALL, E
        arrays = jax.lax.cond(
            jnp.any(meta_extra[:, 4] > 0),
            lambda a: run_chunk(meta_extra, a, kern_multi),
            lambda a: a, arrays)
    return arrays
