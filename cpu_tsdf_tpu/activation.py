"""Hierarchical gather-based brick activation.

Replaces the round-1 scatter-based band mask (`_band_brick_mask`): instead of
scattering millions of per-pixel band samples into a full brick-grid mask and
running a full-grid cumsum every frame (the 2048^3 bottleneck — 16.7M-entry
bookkeeping per frame), activation is brick-centric and hierarchical:

  1. depth min/max mip pyramids (NaN-aware) — one cheap reduction per frame;
  2. TILE pass: every tile (TB^3 bricks) projects its bounding sphere into the
     image; a 2x2 texel lookup at the matching mip level bounds the depth
     values under its footprint; the tile is band-active iff its camera-z
     range overlaps [dmin - margin, dmax + margin].  Tests ALL tiles but the
     tile grid is ~TB^3 x smaller than the brick grid;
  3. BRICK pass: bricks of the (budgeted, compacted) active tiles are tested
     arithmetically against their tile's depth bounds;
  4. TIGHTEN pass: surviving candidate bricks (budgeted list) re-test with
     their OWN footprint mip lookup, giving a near-minimal active set.

Every stage is conservative (a superset of the bricks whose voxels receive
in-band updates), which is the correctness contract of the brick path: the
per-voxel update math rejects out-of-band observations exactly like the dense
path, so extra bricks only store the same free-space observations the dense
volume has.

This is the TPU-native analog of the reference's pre-split pass + frustum
culling (/root/reference/include/cpu_tsdf/impl/tsdf_volume_octree.hpp:57-99,
/root/reference/src/lib/tsdf_volume_octree.cpp:619-652): the reference walks
every pixel and splits octree nodes; here the brick table IS the subdivision
and activation is a pure gather-free-ish test per brick, so the per-frame cost
scales with the SURFACE (active tiles/bricks), not the volume.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import TSDFConfig


def _pow2_ceil(n: int) -> int:
    return 1 << int(np.ceil(np.log2(max(n, 1))))


class DepthMips(NamedTuple):
    """NaN-aware min/max depth pyramids, all levels packed flat.

    Levels below ``base_level`` are not materialized: every consumer looks
    up through :func:`_footprint_depth_bounds`, whose level choice
    ``l = ceil(log2(span))`` is bounded below by the smallest possible
    footprint span (a brick-radius sphere at max sensor range —
    :func:`mip_base_level`), so finer levels can never be queried. Skipping
    them turns the pyramid build from ~10 full-resolution halvings into one
    block reduce + a tail of tiny halvings (the former cost ~0.9 ms/frame of
    the 512^3 integrate, bench/frame_budget r5)."""

    flat_min: jnp.ndarray   # [sum_{l>=base} Hl*Wl]
    flat_max: jnp.ndarray
    # 2x2-DILATED variants: texel t holds the min/max over texels {t, t+1}
    # per axis (edge-clamped), so a footprint rect spanning <= 2 texels per
    # axis needs ONE gather instead of the 2x2 four. Bounds are equal or
    # slightly looser (when the rect fits fewer than 2x2 texels), so these
    # serve the COARSE pre-filters only (tile pass / tile refine — their
    # accepts are re-tested downstream); the set-defining tighten and carve
    # lookups stay exact 2x2 (measured: dilating those grew the kernel
    # batch by more than the gathers saved, AND tighten/carve must share
    # one dmin definition for the band/carve partition to stay airtight).
    flat_min_d: jnp.ndarray
    flat_max_d: jnp.ndarray
    offsets: jnp.ndarray    # int32 [L-base]
    widths: jnp.ndarray     # int32 [L-base]  (level width Wp >> l)
    n_levels: int           # levels MATERIALIZED (after base_level)
    global_min: jnp.ndarray  # scalar
    global_max: jnp.ndarray
    base_level: int = 0


def mip_shapes(H: int, W: int) -> Sequence[Tuple[int, int]]:
    Hp, Wp = _pow2_ceil(H), _pow2_ceil(W)
    shapes = []
    h, w = Hp, Wp
    while True:
        shapes.append((h, w))
        if h == 1 and w == 1:
            break
        h, w = max(h // 2, 1), max(w // 2, 1)
    return shapes


def mip_base_level(cfg: TSDFConfig, brick_size: int) -> int:
    """Finest mip level any activation lookup can request.

    Every footprint bound is taken for a sphere of at least brick bounding
    radius (tile >= brick >= carve spheres all share the brick as the
    smallest unit), and _sphere_footprint pads the pixel rect by >= 3 px
    (floor-1/ceil+1 + inclusive span), so the span ``ceil(log2(...))``
    feeding the level choice is bounded below by the footprint of a
    brick-radius sphere at the FAR sensor plane. Underestimate the radius
    (0.5 * B * min cell) for a conservative (smaller) result."""
    r = 0.5 * brick_size * min(cfg.cell_size)
    z_far = cfg.max_sensor_dist + 2.0 * r
    span = 2.0 * r * min(cfg.focal_length_x, cfg.focal_length_y) / z_far + 3.0
    return max(0, int(np.ceil(np.log2(span))))


def depth_mips(depth: jnp.ndarray, base_level: int = 0) -> DepthMips:
    """Build min/max mip pyramids over a depth image (NaN = no data).

    ``base_level`` > 0 starts the pyramid at that level via one block
    reduce — bit-identical to the full pyramid's level (min/max are
    associative), just without materializing the unqueried fine levels
    (callers pass :func:`mip_base_level`)."""
    H, W = depth.shape
    shapes = mip_shapes(H, W)
    base_level = min(base_level, len(shapes) - 1)
    Hp, Wp = shapes[0]
    inf = jnp.float32(jnp.inf)
    if (Hp, Wp) == (H, W):
        # already pow2: the NaN masks fuse into the first reduce
        dmin = jnp.where(jnp.isnan(depth), inf, depth)
        dmax = jnp.where(jnp.isnan(depth), -inf, depth)
    else:
        # pad ONCE with NaN; the min/max pyramids derive their base level
        # with fused masks (two separate padded at[].set pairs cost ~0.9
        # ms/frame at [512,1024], bench/integrate_trace r4)
        dp = jnp.full((Hp, Wp), jnp.float32(jnp.nan)).at[:H, :W].set(depth)
        dmin = jnp.where(jnp.isnan(dp), inf, dp)
        dmax = jnp.where(jnp.isnan(dp), -inf, dp)

    def halve(a, h, w, red):
        # Split row/column reduction so the vreg minor dim stays wide.
        # reshape(h, 2, w, 2) + reduce((1, 3)) puts a 2-wide minor dim in
        # every vector op (64x lane padding): the whole 640x480 pyramid
        # pair measured 39 ms eager / ~1.7 ms traced vs 0.65 ms for this
        # form (bench/mips_probe r4). lax.reduce_window is worse still: a
        # >40 min pathological compile (round 3).
        ph, pw = a.shape
        if ph != h:
            a = red(a.reshape(h, ph // h, pw), axis=1)
        if pw != w:
            a = red(jnp.stack([a[:, 0::2], a[:, 1::2]], 0), axis=0)
        return a

    if base_level > 0:
        # one block reduce to the base level: rows in a single reshape
        # reduce, columns by repeated halving on the (now tiny) rows
        hb, wb = shapes[base_level]
        f = Hp // hb
        dmin = jnp.min(dmin.reshape(hb, f, Wp), axis=1)
        dmax = jnp.max(dmax.reshape(hb, f, Wp), axis=1)
        w = Wp
        while w > wb:
            w //= 2
            dmin = halve(dmin, hb, w, jnp.min)
            dmax = halve(dmax, hb, w, jnp.max)
    shapes = shapes[base_level:]

    mins, maxs = [dmin], [dmax]
    for (h, w) in shapes[1:]:
        mins.append(halve(mins[-1], h, w, jnp.min))
        maxs.append(halve(maxs[-1], h, w, jnp.max))

    def dilate(a, red):
        # texel t := red(t, t+1) per axis, edge-clamped (matches the 2x2
        # lookup's clip behavior at the right/bottom edges)
        a = red(a, jnp.concatenate([a[1:], a[-1:]], 0))
        return red(a, jnp.concatenate([a[:, 1:], a[:, -1:]], 1))

    mins_d = [dilate(m, jnp.minimum) for m in mins]
    maxs_d = [dilate(m, jnp.maximum) for m in maxs]
    offsets = np.cumsum([0] + [h * w for (h, w) in shapes[:-1]])
    return DepthMips(
        flat_min=jnp.concatenate([m.reshape(-1) for m in mins]),
        flat_max=jnp.concatenate([m.reshape(-1) for m in maxs]),
        flat_min_d=jnp.concatenate([m.reshape(-1) for m in mins_d]),
        flat_max_d=jnp.concatenate([m.reshape(-1) for m in maxs_d]),
        offsets=jnp.asarray(offsets, jnp.int32),
        widths=jnp.asarray([w for (_, w) in shapes], jnp.int32),
        n_levels=len(shapes),
        global_min=mins[-1].reshape(())[()],
        global_max=maxs[-1].reshape(())[()],
        base_level=base_level,
    )


def _footprint_depth_bounds(mips: DepthMips, u0, u1, v0, v1, need_max=True,
                            dilated=False):
    """Conservative (dmin, dmax) over pixel rect [u0,u1]x[v0,v1] (inclusive,
    already clamped to the padded image).

    Default: exact 2x2 texel lookup. ``dilated``: ONE texel of the
    2x2-dilated tables covers the whole rect (the rect spans <= 2 texels
    per axis at level l) — 4x fewer gathers, same-or-looser bounds; coarse
    pre-filters only (see DepthMips)."""
    span = jnp.maximum(jnp.maximum(u1 - u0, v1 - v0), 0) + 1
    # smallest l with 2^l >= span  ->  rect covers <= 2 texels per axis.
    # The base_level clamp can never bind (mip_base_level's span bound).
    l = jnp.ceil(jnp.log2(span.astype(jnp.float32))).astype(jnp.int32)
    l = jnp.clip(l, mips.base_level, mips.base_level + mips.n_levels - 1)
    off = jnp.take(mips.offsets, l - mips.base_level)
    wl = jnp.take(mips.widths, l - mips.base_level)
    tu0, tu1 = u0 >> l, u1 >> l
    tv0, tv1 = v0 >> l, v1 >> l

    if dilated:
        idx = off + tv0 * wl + tu0
        dmin = jnp.take(mips.flat_min_d, idx, mode="clip")
        if not need_max:
            return dmin, None
        return dmin, jnp.take(mips.flat_max_d, idx, mode="clip")

    def tex(flat, tv, tu):
        return jnp.take(flat, off + tv * wl + tu, mode="clip")

    dmin = jnp.minimum(
        jnp.minimum(tex(mips.flat_min, tv0, tu0), tex(mips.flat_min, tv0, tu1)),
        jnp.minimum(tex(mips.flat_min, tv1, tu0), tex(mips.flat_min, tv1, tu1)))
    if not need_max:
        # arbitrary gathers are the cost here (~0.3 G elem/s on this TPU);
        # the carve test only consumes dmin, so skip the 4 max lookups
        return dmin, None
    dmax = jnp.maximum(
        jnp.maximum(tex(mips.flat_max, tv0, tu0), tex(mips.flat_max, tv0, tu1)),
        jnp.maximum(tex(mips.flat_max, tv1, tu0), tex(mips.flat_max, tv1, tu1)))
    return dmin, dmax


def _band_margins(cfg: TSDFConfig):
    """(m_lo, m_hi): a voxel at camera depth vz receives an in-band update
    only if its depth pixel satisfies
      z_img - m_hi <= vz <= z_img + m_lo
    (hpp:189-198 drop/clamp rules, +-cell slack like the round-1 mask)."""
    cell = min(cfg.cell_size)
    return (cfg.max_dist_neg + cell,
            max(cfg.max_dist_neg, cfg.max_dist_pos) + cell)


def _sphere_footprint(cfg: TSDFConfig, mips: DepthMips, ccx, ccy, ccz, r,
                      need_max=True, dilated=False):
    """Depth bounds under a sphere's conservative image footprint.

    Returns (usable, dmin, dmax): `usable` is False when the sphere straddles
    the camera plane (footprint unbounded) — callers must fall back to the
    whole-image bounds; dmin/dmax are +-inf when the footprint misses the
    image entirely (no pixel can update the sphere's voxels)."""
    fx, fy = cfg.focal_length_x, cfg.focal_length_y
    pcx, pcy = cfg.principal_point_x, cfg.principal_point_y
    W, H = cfg.image_width, cfg.image_height
    z_lo, z_hi = ccz - r, ccz + r
    usable = z_lo > 1e-3
    zl = jnp.maximum(z_lo, 1e-3)
    zh = jnp.maximum(z_hi, 2e-3)
    x_lo, x_hi = ccx - r, ccx + r
    y_lo, y_hi = ccy - r, ccy + r
    # exact image-space bounds of the box [x_lo,x_hi]x[y_lo,y_hi]x[zl,zh]
    u_min = fx * jnp.where(x_lo >= 0, x_lo / zh, x_lo / zl) + pcx
    u_max = fx * jnp.where(x_hi >= 0, x_hi / zl, x_hi / zh) + pcx
    v_min = fy * jnp.where(y_lo >= 0, y_lo / zh, y_lo / zl) + pcy
    v_max = fy * jnp.where(y_hi >= 0, y_hi / zl, y_hi / zh) + pcy
    # pixel coords truncate toward zero (geometry.reproject_point): pad 1 px
    empty = (u_min > W) | (u_max < -1.0) | (v_min > H) | (v_max < -1.0)
    u0 = jnp.clip(jnp.floor(u_min).astype(jnp.int32) - 1, 0, W - 1)
    u1 = jnp.clip(jnp.ceil(u_max).astype(jnp.int32) + 1, 0, W - 1)
    v0 = jnp.clip(jnp.floor(v_min).astype(jnp.int32) - 1, 0, H - 1)
    v1 = jnp.clip(jnp.ceil(v_max).astype(jnp.int32) + 1, 0, H - 1)
    dmin, dmax = _footprint_depth_bounds(mips, u0, u1, v0, v1, need_max,
                                         dilated)
    inf = jnp.float32(jnp.inf)
    return (usable, jnp.where(empty, inf, dmin),
            None if dmax is None else jnp.where(empty, -inf, dmax))


def _band_test(cfg: TSDFConfig, mips: DepthMips, ccx, ccy, ccz, r,
               dilated=False):
    """Conservative band-intersection test for spheres (center camera-frame,
    radius r): True iff the sphere MAY contain voxels receiving in-band
    updates from this frame."""
    W, H = cfg.image_width, cfg.image_height
    fx, fy = cfg.focal_length_x, cfg.focal_length_y
    m_lo, m_hi = _band_margins(cfg)
    z_lo, z_hi = ccz - r, ccz + r
    in_sensor = (z_hi >= cfg.min_sensor_dist) & (z_lo <= cfg.max_sensor_dist)

    usable, dmin, dmax = _sphere_footprint(cfg, mips, ccx, ccy, ccz, r,
                                           dilated=dilated)
    bounded_act = (z_lo <= dmax + m_lo) & (z_hi >= dmin - m_hi)

    # Sphere straddles the camera plane: footprint unbounded. Conservative
    # cone test around the optical axis + whole-image depth bounds. Such
    # spheres sit within r of the camera — O(1) of them per frame.
    # The half-angle must cover the WIDER side of an off-center principal
    # point: a pixel's |x|/z reaches max(pcx, W-1-pcx)/fx, so the symmetric
    # 0.5*W/fx bound would cull genuinely visible bricks when
    # fx + pcx < W/2 (wide FOV, shifted center).
    tan_h = max(cfg.principal_point_x + 1.0, W - cfg.principal_point_x) / fx + 1.0
    tan_v = max(cfg.principal_point_y + 1.0, H - cfg.principal_point_y) / fy + 1.0
    zc = jnp.maximum(z_hi, 0.0)
    cone = ((jnp.abs(ccx) - r <= tan_h * zc) & (jnp.abs(ccy) - r <= tan_v * zc))
    glob = (z_lo <= mips.global_max + m_lo) & (z_hi >= mips.global_min - m_hi)
    unbounded_act = cone & glob

    return in_sensor & jnp.where(usable, bounded_act, unbounded_act)


def carve_candidate_slots(cfg: TSDFConfig, B: int, mips: DepthMips,
                          pose_inv, coords, live):
    """[C] bool mask of LIVE brick slots strictly in FRONT of every depth
    under their footprint — the band test's near-side reject.

    The reference fuses clamped free-space observations (d_new clamped to
    +max_dist_pos, hpp:189-198) into every visible voxel, so an allocated
    brick re-observed as free space (disocclusion, noise-spawned bricks)
    must keep receiving updates — "carving" stale surfaces toward d=+1.
    Band activation alone skips those bricks: its test requires the sphere
    to overlap the depth band. This mask is mutually exclusive with the
    band test (z_hi < dmin - m_hi is the negation of its far conjunct), so
    callers append carve slots to the band candidate list without dedup.

    Camera-plane-straddling spheres (unusable footprint) are left out: the
    band test's unbounded fallback already covers them whenever any depth
    is in range, and a straddling brick is by definition within r of the
    camera — inside min_sensor_dist at every practical working point.
    """
    from .geometry import transform_points

    csx, csy, csz = cfg.cell_size
    x0 = coords[:, 0].astype(jnp.float32) * (B * csx)
    y0 = coords[:, 1].astype(jnp.float32) * (B * csy)
    z0 = coords[:, 2].astype(jnp.float32) * (B * csz)
    cx = x0 + 0.5 * B * csx - cfg.xsize / 2
    cy = y0 + 0.5 * B * csy - cfg.ysize / 2
    cz = z0 + 0.5 * B * csz - cfg.zsize / 2
    r = 0.5 * float(np.sqrt((B * csx) ** 2 + (B * csy) ** 2 + (B * csz) ** 2))
    ccx, ccy, ccz = transform_points(pose_inv, cx, cy, cz)
    _, m_hi = _band_margins(cfg)
    in_sensor = (ccz + r >= cfg.min_sensor_dist) & (ccz - r <= cfg.max_sensor_dist)

    # The mip gathers are the cost here (~1.1 ms over a 32k-slot capacity,
    # bench/frame_budget r5) and slots allocate contiguously, so run the
    # footprint lookup in chunks gated on chunk liveness: dead-tail chunks
    # (capacity headroom) skip their gathers entirely. Bit-equal: skipped
    # rows have live=False, masking them regardless.
    C = coords.shape[0]
    CH = 4096
    parts = []
    for k in range(0, C, CH):
        lv = live[k:k + CH]
        cck = (ccx[k:k + CH], ccy[k:k + CH], ccz[k:k + CH])

        def do(cck=cck):
            usable, dmin, _ = _sphere_footprint(cfg, mips, *cck, r,
                                                need_max=False)
            # empty/NaN-only footprints give dmin = +inf: no pixel can
            # update the brick — NOT a carve candidate despite z_hi < inf
            return usable & jnp.isfinite(dmin) & (cck[2] + r < dmin - m_hi)

        parts.append(jax.lax.cond(
            jnp.any(lv), do, lambda n=lv.shape[0]: jnp.zeros((n,), bool)))
    infront = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return live & in_sensor & infront


def _compact(mask_flat, ids, budget: int):
    """Budgeted stream compaction: ids where mask, -1 padded. Returns
    (list [budget] int32, count)."""
    flat = mask_flat.astype(jnp.int32)
    rank = jnp.cumsum(flat) - 1
    n = jnp.sum(flat)
    tgt = jnp.where((flat > 0) & (rank < budget), rank, budget + 1)
    out = jnp.full((budget + 1,), -1, jnp.int32).at[tgt].set(
        ids, mode="drop", unique_indices=True)[:budget]
    return out, n


def _compact_chunked(mask_flat, ids, budget: int, chunk: int = 4096):
    """:func:`_compact` with chunk-gated work: per-chunk counts come from a
    cheap blocked reduce, then only chunks containing ANY selected element
    run their local cumsum + scatter (offset by the preceding chunks'
    counts). Bit-identical output; the input masks here are live-prefix
    lists over mostly-dead static budgets, so typically one chunk pays."""
    C = mask_flat.shape[0]
    if C <= 2 * chunk:
        return _compact(mask_flat, ids, budget)
    pad = (-C) % chunk
    flat = mask_flat.astype(jnp.int32)
    if pad:
        flat_p = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
    else:
        flat_p = flat
    nch = flat_p.shape[0] // chunk
    counts = jnp.sum(flat_p.reshape(nch, chunk), axis=1)
    offs = jnp.cumsum(counts) - counts
    n = jnp.sum(counts)
    out = jnp.full((budget + 1,), -1, jnp.int32)
    for k in range(nch):
        e = min((k + 1) * chunk, C)
        mk = flat[k * chunk:e]
        idk = ids[k * chunk:e]

        def do(o, mk=mk, idk=idk, k=k):
            rank = jnp.cumsum(mk) - 1 + offs[k]
            tgt = jnp.where((mk > 0) & (rank < budget), rank, budget + 1)
            return o.at[tgt].set(idk, mode="drop", unique_indices=True)

        out = jax.lax.cond(counts[k] > 0, do, lambda o: o, out)
    return out[:budget], n


def pick_tile_bricks(nb: Tuple[int, int, int]) -> int:
    """Tile size (bricks/axis) keeping the tile grid <= ~32^3."""
    tb = 4
    while max(nb) // tb > 32:
        tb *= 2
    return tb


def band_candidate_bricks(cfg: TSDFConfig, B: int, nb: Tuple[int, int, int],
                          mips: DepthMips, pose_inv, update_budget: int,
                          tile_budget: int = 1024, x_slab=None):
    """Budgeted list of bricks intersecting this frame's truncation band.

    Returns (cand [update_budget] int32 brick linear ids (-1 pad), n_band,
    overflow). `pose_inv` maps volume frame -> camera frame.

    x_slab=(bx_lo, nbw) restricts the result to bricks with
    ``bx in [bx_lo, bx_lo + nbw)`` — the sharded integrate path's per-device
    slab (parallel/bricks.py). bx_lo may be traced (it depends on
    ``axis_index``); nbw must be static. The restriction happens at the
    ITERATION level (only tile columns overlapping the slab are tested), so
    per-device activation cost scales with the slab, not the volume, while
    the per-brick tests are unchanged — the result is bit-equal to the
    global list filtered to the slab (same TILE-MAJOR order: ascending
    tile id, then local brick id within the tile — NOT ascending brick
    linear id; both paths share the traversal, which is what the
    bit-equality rests on).
    """
    nbx, nby, nbz = nb
    TB = pick_tile_bricks(nb)
    ntx, nty, ntz = -(-nbx // TB), -(-nby // TB), -(-nbz // TB)
    NT = ntx * nty * ntz
    if x_slab is None:
        NT_iter, tx_off = NT, 0
    else:
        bx_lo, nbw = x_slab
        # a [bx_lo, bx_lo+nbw) slab overlaps at most ceil(nbw/TB)+1 tile cols
        ncols = min(ntx, -(-nbw // TB) + 1)
        tx_off = jnp.minimum(jnp.asarray(bx_lo, jnp.int32) // TB, ntx - ncols)
        NT_iter = ncols * nty * ntz
    tile_budget = min(tile_budget, NT_iter)
    csx, csy, csz = cfg.cell_size

    def cam_center_radius(x0, y0, z0, x1, y1, z1):
        """World AABB -> camera-frame center + bounding radius."""
        from .geometry import transform_points

        cx = (x0 + x1) * 0.5 - cfg.xsize / 2
        cy = (y0 + y1) * 0.5 - cfg.ysize / 2
        cz = (z0 + z1) * 0.5 - cfg.zsize / 2
        r = 0.5 * jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2 + (z1 - z0) ** 2)
        ccx, ccy, ccz = transform_points(pose_inv, cx, cy, cz)
        return ccx, ccy, ccz, r

    # ---- tile pass -------------------------------------------------------
    ti = jnp.arange(NT_iter, dtype=jnp.int32) + tx_off * (nty * ntz)
    tx = ti // (nty * ntz)
    ty = (ti // ntz) % nty
    tz = ti % ntz
    x0 = tx.astype(jnp.float32) * (TB * B * csx)
    y0 = ty.astype(jnp.float32) * (TB * B * csy)
    z0 = tz.astype(jnp.float32) * (TB * B * csz)
    x1 = jnp.minimum(x0 + TB * B * csx, cfg.xsize)
    y1 = jnp.minimum(y0 + TB * B * csy, cfg.ysize)
    z1 = jnp.minimum(z0 + TB * B * csz, cfg.zsize)
    ccx, ccy, ccz, r = cam_center_radius(x0, y0, z0, x1, y1, z1)
    # coarse pre-filter: dilated single-gather bounds (accepts re-tested
    # by the brick refine + tighten)
    tile_act = _band_test(cfg, mips, ccx, ccy, ccz, r, dilated=True)
    tiles, n_tiles = _compact(tile_act, ti, tile_budget)
    overflow = n_tiles > tile_budget
    tile_ok = tiles >= 0
    tsafe = jnp.maximum(tiles, 0)

    # depth bounds of each selected tile's footprint (for the arith refine)
    ttx = tsafe // (nty * ntz)
    tty = (tsafe // ntz) % nty
    ttz = tsafe % ntz

    # ---- brick pass (arithmetic, tile-level depth bounds) ----------------
    TB3 = TB * TB * TB
    li = jnp.arange(TB3, dtype=jnp.int32)
    lx, ly, lz = li // (TB * TB), (li // TB) % TB, li % TB
    bx = ttx[:, None] * TB + lx[None, :]
    by = tty[:, None] * TB + ly[None, :]
    bz = ttz[:, None] * TB + lz[None, :]
    in_grid = (bx < nbx) & (by < nby) & (bz < nbz) & tile_ok[:, None]
    if x_slab is not None:
        # boundary tile columns may straddle the slab edge
        in_grid &= (bx >= bx_lo) & (bx < bx_lo + nbw)
    bx0 = bx.astype(jnp.float32) * (B * csx)
    by0 = by.astype(jnp.float32) * (B * csy)
    bz0 = bz.astype(jnp.float32) * (B * csz)
    bcx, bcy, bcz, br = cam_center_radius(bx0, by0, bz0,
                                          bx0 + B * csx, by0 + B * csy, bz0 + B * csz)
    m_lo, m_hi = _band_margins(cfg)
    # tile-level footprint depth bounds, shared by the tile's bricks: the
    # arithmetic refine — each brick's camera-z range against its tile's
    # [dmin, dmax] — needs no further image lookups.
    # recomputed from the tile's GLOBAL coords (under x_slab the position in
    # x0/x1 no longer matches the tile's linear id, so no take here)
    sx0 = ttx.astype(jnp.float32) * (TB * B * csx)
    sy0 = tty.astype(jnp.float32) * (TB * B * csy)
    sz0 = ttz.astype(jnp.float32) * (TB * B * csz)
    tccx, tccy, tccz, tr = cam_center_radius(
        sx0, sy0, sz0,
        jnp.minimum(sx0 + TB * B * csx, cfg.xsize),
        jnp.minimum(sy0 + TB * B * csy, cfg.ysize),
        jnp.minimum(sz0 + TB * B * csz, cfg.zsize))
    t_usable, t_dmin, t_dmax = _sphere_footprint(cfg, mips, tccx, tccy,
                                                 tccz, tr, dilated=True)
    zb_lo, zb_hi = bcz - br, bcz + br
    z_refine = ((zb_lo <= t_dmax[:, None] + m_lo) & (zb_hi >= t_dmin[:, None] - m_hi)) \
        | ~t_usable[:, None]
    brick_rough = in_grid & z_refine \
        & (zb_lo <= cfg.max_sensor_dist) & (zb_hi >= cfg.min_sensor_dist)

    U2 = min(2 * update_budget, tile_budget * TB3)
    blin = (bx * nby + by) * nbz + bz
    rough, n_rough = _compact_chunked(brick_rough.reshape(-1),
                                      blin.reshape(-1), U2)
    overflow |= n_rough > U2

    # ---- tighten pass (per-brick footprint mip lookup) -------------------
    rok = rough >= 0
    rsafe = jnp.maximum(rough, 0)
    rbx = rsafe // (nby * nbz)
    rby = (rsafe // nbz) % nby
    rbz = rsafe % nbz
    rx0 = rbx.astype(jnp.float32) * (B * csx)
    ry0 = rby.astype(jnp.float32) * (B * csy)
    rz0 = rbz.astype(jnp.float32) * (B * csz)
    rcx, rcy, rcz, rr = cam_center_radius(rx0, ry0, rz0,
                                          rx0 + B * csx, ry0 + B * csy, rz0 + B * csz)
    # chunk-gated like the carve pass: the compacted rough list is a valid
    # prefix + -1 padding, so tail chunks (budget slack) skip their mip
    # gathers; skipped rows have rok=False — bit-equal results
    TCH = 2048
    parts = []
    for k in range(0, rok.shape[0], TCH):
        rokk = rok[k:k + TCH]
        args = (rcx[k:k + TCH], rcy[k:k + TCH], rcz[k:k + TCH], rr[k:k + TCH])

        def do(rokk=rokk, args=args):
            return rokk & _band_test(cfg, mips, *args)

        parts.append(jax.lax.cond(
            jnp.any(rokk), do, lambda n=rokk.shape[0]: jnp.zeros((n,), bool)))
    tight = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    cand, n_band = _compact(tight, rsafe, update_budget)
    overflow |= n_band > update_budget
    return cand, n_band, overflow
