"""Multi-chip Pallas ray-march rendering.

The reference parallelizes raycasting with an OpenMP loop over pixels
(/root/reference/src/lib/tsdf_volume_octree.cpp:290); the TPU-native
equivalent shards RAY TILES over the device mesh and runs the tile-sorted
Pallas march kernel (ops/pallas_raycast.py) INSIDE the shard_map body —
the same pattern that made the sharded integrate run the fusion kernel
per-device (parallel/bricks.py).

Layout: the render pack (haloed per-brick SDF tables) replicates across the
mesh; the global (brick x image-tile) pair list is built once (replicated
math) and each device takes the contiguous, tile-sorted run of pairs whose
tile it owns (tiles are block-partitioned: device d owns tiles
[d*Td, (d+1)*Td)). Each device marches its pairs with a per-device pair
budget and returns its Td output tile rows — ZERO collectives in the march
itself; the only cross-device traffic is the pair-budget overflow pmax.

Because a tile's pairs all land on the tile's owner, each per-tile
min-combine sees exactly the same pair set as the single-device kernel, so
the sharded render is BIT-IDENTICAL to the single-device one
(tests/test_sharded_raycast.py asserts equality in interpret mode).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .sharding import AXIS


def _local_pair_budget(pair_budget: int, D: int) -> int:
    """Per-device pair-list size: slack x (global / D), multiple of 256.

    Same shape as the sharded integrate's per-device budgets
    (parallel/bricks.py): a uniform split underestimates hot devices (the
    near-field bricks bunch into few tiles), so keep 2x slack at D >= 4 and
    1.5x below."""
    num, den = (2, 1) if D >= 4 else (3, 2)
    return min(pair_budget,
               max(256, -(-num * pair_budget // (den * 256 * D)) * 256))


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _render_tile_sharded_jit(pack, pose, mesh: Mesh, ds: int,
                             pair_budget: int, pair_budget_local: int,
                             colored: bool, interpret: bool):
    from ..ops.pallas_raycast import (NCH, TILE_PX, _assemble_from_channels,
                                      _channels_from_out, build_pairs,
                                      raycast_pairs)

    cfg = pack.config
    W, H = cfg.image_width // ds, cfg.image_height // ds
    TX, TY = -(-W // TILE_PX), -(-H // TILE_PX)
    T = TX * TY
    D = int(mesh.shape[AXIS])
    Td = -(-T // D)
    Tpad = Td * D
    R = pack.tables.shape[0]

    pose = jnp.asarray(pose, jnp.float32)
    # global pair list: replicated math (inputs replicate, GSPMD keeps it
    # device-local), tile-sorted with padding (tile = T) last
    meta, tile_hit, ovf_tiles, ovf_pairs = build_pairs(pack, pose, ds,
                                                       pair_budget)
    # neutralized rows: the reserved NaN table row + the padded trash tile
    pad_row = jnp.asarray([R - 1, Tpad, 0, 0, 0, 0, 0, 0], jnp.int32)

    def body(meta_r, pose_r, pack_r):
        dev = jax.lax.axis_index(AXIS)
        t0 = dev * Td
        t1 = jnp.minimum(t0 + Td, T)
        tile_col = meta_r[:, 1]
        # pairs are tile-sorted, so this device's pairs are one contiguous
        # run; a fixed-size window + ownership mask keeps shapes static
        start = jnp.searchsorted(tile_col, t0).astype(jnp.int32)
        n_owned = jnp.searchsorted(tile_col, t1).astype(jnp.int32) - start
        ovf_local = n_owned > pair_budget_local
        local = jax.lax.dynamic_slice_in_dim(meta_r, start,
                                             pair_budget_local, 0)
        own = (local[:, 1] >= t0) & (local[:, 1] < t1)
        local = jnp.where(own[:, None], local, pad_row[None, :])
        out = raycast_pairs(pack_r, local, pose_r, ds, pair_budget_local,
                            interpret, Tpad)
        mine = jax.lax.dynamic_slice_in_dim(out, t0, Td, 0)
        ovf = jax.lax.pmax(ovf_local.astype(jnp.int32), AXIS)
        return mine, ovf

    pack_specs = jax.tree.map(lambda _: P(), pack)
    out_g, ovf_l = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), pack_specs),
        out_specs=(P(AXIS), P()),
        # same reason as the sharded integrate: pallas_call out_shapes carry
        # no varying-axis annotation; the specs above are explicit
        check_vma=False,
    )(meta, pose, pack)

    ch = _channels_from_out(cfg, ds, out_g, tile_hit)
    res = _assemble_from_channels(pack, pose, ds, colored, ch)
    return res, ovf_pairs | (ovf_l > 0), ovf_tiles | pack.truncated


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def _render_volume_sharded_jit(bv, pose, mesh: Mesh, ds: int,
                               r_budget_local: int, pair_budget_local: int,
                               colored: bool, interpret: bool):
    from ..ops.pallas_raycast import (PTABLE, RenderPack, _channels_from_out,
                                      assemble_tables, build_pairs,
                                      quantize_pack_rows, raycast_pairs,
                                      NAN_PAIR)
    from ..ops.raycast import assemble_view, camera_rays

    cfg = bv.config
    B = bv.brick_size
    D = int(mesh.shape[AXIS])
    C_local = bv.capacity // D
    nbx, nby, nbz = bv.bricks_per_axis
    nbx_local = nbx // D
    npl = nby * nbz
    R_local = min(r_budget_local, C_local)
    W, H = cfg.image_width // ds, cfg.image_height // ds
    pose = jnp.asarray(pose, jnp.float32)

    def body(bm_l, coords_l, sdf_l, w_l, pose_r, gt_r):
        dev = jax.lax.axis_index(AXIS)
        bx0 = dev * nbx_local

        # ---- halo exchange: one brick plane each way over ppermute --------
        # A brick's haloed 16^3 table reads 4 voxels into each neighbor
        # brick; only the +-x neighbors can live off-device (slab sharding),
        # so each device ships its boundary planes to its x-neighbors.
        # Absent bricks quantize to NAN_PAIR (w=0 -> NaN), which is exactly
        # the unallocated-neighbor fill — no separate validity mask needed.
        def plane_raw(px):
            gs = bm_l[px].reshape(-1)                 # [npl] global slot ids
            okp = gs >= 0
            ls = jnp.clip(gs - dev * C_local, 0, C_local - 1)
            # rows are vreg-tiled [4, 128]; flatten (same linear order)
            sd = jnp.take(sdf_l, ls, axis=0).reshape(npl, -1)
            wd = jnp.take(w_l, ls, axis=0).reshape(npl, -1) * okp[:, None]
            return quantize_pack_rows(cfg, sd, wd)    # [npl, 8, 8, 4]

        right_send = plane_raw(nbx_local - 1)
        left_send = plane_raw(0)
        ghost_left = jax.lax.ppermute(
            right_send, AXIS, [(d, d + 1) for d in range(D - 1)])
        ghost_right = jax.lax.ppermute(
            left_send, AXIS, [(d + 1, d) for d in range(D - 1)])
        # edge devices receive zeros from the unaddressed permute -> NaN fill
        ghost_left = jnp.where(dev > 0, ghost_left, NAN_PAIR)
        ghost_right = jnp.where(dev < D - 1, ghost_right, NAN_PAIR)

        # ---- local haloed tables (own rows + ghost planes) ----------------
        raw_own = quantize_pack_rows(cfg, sdf_l[:R_local], w_l[:R_local])
        raw_ext = jnp.concatenate([raw_own, ghost_left, ghost_right], 0)
        rows = raw_ext.shape[0]
        coords_r = coords_l[:R_local]
        used = (coords_r[:, 0] >= 0) & (jnp.arange(R_local) < R_local - 1)
        trunc_l = jnp.any(coords_l[R_local - 1:, 0] >= 0)
        bml_flat = bm_l.reshape(-1)
        nbtot_l = nbx_local * nby * nbz

        def neighbor_slot(ox, oy, oz):
            nc = coords_r + jnp.asarray([ox, oy, oz])
            ok = used & (nc[:, 0] >= 0) & (nc[:, 0] < nbx) & (nc[:, 1] >= 0) \
                & (nc[:, 1] < nby) & (nc[:, 2] >= 0) & (nc[:, 2] < nbz)
            in_slab = (nc[:, 0] >= bx0) & (nc[:, 0] < bx0 + nbx_local)
            llin = ((nc[:, 0] - bx0) * nby + nc[:, 1]) * nbz + nc[:, 2]
            gslot = jnp.take(bml_flat, jnp.clip(llin, 0, nbtot_l - 1),
                             mode="clip")
            lslot = gslot - dev * C_local
            own_idx = jnp.where((gslot >= 0) & (lslot < R_local), lslot, rows)
            pl_idx = nc[:, 1] * nbz + nc[:, 2]
            idx = jnp.where(
                in_slab, own_idx,
                jnp.where(nc[:, 0] == bx0 - 1, R_local + pl_idx,
                          jnp.where(nc[:, 0] == bx0 + nbx_local,
                                    R_local + npl + pl_idx, rows)))
            return jnp.where(ok, idx, rows)

        own = jnp.where(used[:, None], raw_own.reshape(R_local, -1),
                        NAN_PAIR).reshape(R_local, B, B, B // 2)
        tab = assemble_tables(raw_ext, own, neighbor_slot)
        pack_l = RenderPack(
            tables=tab.reshape(R_local, 1, PTABLE),
            coords=jnp.where(used[:, None], coords_r, -1),
            n_active=jnp.sum(used.astype(jnp.int32)),
            truncated=trunc_l,
            global_transform=gt_r, color=None, brick_map=None,
            config=cfg, brick_size=B, capacity=C_local)

        # ---- march the local bricks over the FULL image -------------------
        meta, tile_hit, ovf_tiles, ovf_pairs = build_pairs(
            pack_l, pose_r, ds, pair_budget_local)
        out = raycast_pairs(pack_l, meta, pose_r, ds, pair_budget_local,
                            interpret)

        # ---- cross-device first-crossing combine --------------------------
        # The single-device kernel min-combines pairs per tile keyed on the
        # bracket position; the cross-device reduction applies the same key
        # over the per-device partial results (winner device's channels win;
        # ties break to the lowest device id).
        key = out[:, 0]                               # [T+1, 8, 128]
        kmin = jax.lax.pmin(key, AXIS)
        isw = key == kmin
        devw = jax.lax.pmin(jnp.where(isw, dev, D), AXIS)
        win = isw & (dev == devw)
        out_g = jax.lax.psum(jnp.where(win[:, None], out, 0.0), AXIS)
        tile_hit_g = jax.lax.pmax(tile_hit.astype(jnp.int32), AXIS)
        ovf = jax.lax.pmax(
            (ovf_pairs | ovf_tiles | trunc_l).astype(jnp.int32), AXIS)
        return out_g, tile_hit_g, ovf

    out_g, tile_hit_g, ovf = shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(bv.brick_map, bv.coords, bv.sdf, bv.weight, pose, bv.global_transform)

    ch = _channels_from_out(cfg, ds, out_g, tile_hit_g > 0)
    origins, dirs = camera_rays(cfg, pose, ds)
    tsf = ch["t_star"]
    r = dict(
        hit_x=origins[:, 0] + tsf * dirs[:, 0],
        hit_y=origins[:, 1] + tsf * dirs[:, 1],
        hit_z=origins[:, 2] + tsf * dirs[:, 2],
        normal_x=ch["nx"], normal_y=ch["ny"], normal_z=ch["nz"],
        t_star=tsf, valid=ch["valid"], normal_valid=ch["nvalid"],
    )

    if colored and bv.color is not None:
        # renderColoredView on the sharded volume: each device gathers the
        # voxel colors for the hits landing in ITS slab (color rows are
        # slot-partitioned), zeros elsewhere; one psum replicates them
        from ..geometry import voxel_index
        from ..ops.color import color_to_rgb

        ix, iy, iz, okc = voxel_index(cfg, r["hit_x"], r["hit_y"], r["hit_z"])
        # bricks.gather_color semantics exactly: clipped indices, color 0.0
        # when the brick is unallocated, validity = okc alone
        ix = jnp.clip(ix, 0, cfg.xres - 1)
        iy = jnp.clip(iy, 0, cfg.yres - 1)
        iz = jnp.clip(iz, 0, cfg.zres - 1)
        nc = bv.color.shape[-1]

        def color_body(bm_l, col_l):
            dev = jax.lax.axis_index(AXIS)
            bx0 = dev * nbx_local
            bxi, byi, bzi = ix // B, iy // B, iz // B
            mine = (bxi >= bx0) & (bxi < bx0 + nbx_local)
            llin = ((bxi - bx0) * nby + byi) * nbz + bzi
            gslot = jnp.take(bm_l.reshape(-1),
                             jnp.clip(llin, 0, nbx_local * nby * nbz - 1),
                             mode="clip")
            lslot = gslot - dev * C_local
            mine &= gslot >= 0
            lx, ly, lz = ix % B, iy % B, iz % B
            lin = ((jnp.clip(lslot, 0, C_local - 1) * B + lx) * B + ly) * B + lz
            c = jnp.take(col_l.reshape(-1, nc), lin, axis=0, mode="clip")
            return jax.lax.psum(jnp.where(mine[:, None], c, 0.0), AXIS)

        vox_cols = shard_map(
            color_body, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
            out_specs=P(), check_vma=False,
        )(bv.brick_map, bv.color)
        rr, gg, bb = color_to_rgb(cfg.color_mode, vox_cols)
        r["rgb_r"], r["rgb_g"], r["rgb_b"] = rr, gg, bb
        r["rgb_valid"] = okc & r["valid"]

    return assemble_view(cfg, pose, r, H, W), ovf > 0


def render_view_volume_sharded(bv, pose, mesh: Mesh, downsample_by: int = 1,
                               colored: bool = False,
                               r_budget_local: int = 2048,
                               pair_budget_local: int = 8192,
                               interpret: bool = False):
    """Render a SLAB-SHARDED brick volume without replicating it: each
    device packs only its own slab's bricks (plus a one-brick-plane halo
    received over ppermute), marches the Pallas kernel against its partial
    volume, and the per-ray channels min-combine across the mesh — the
    beyond-one-HBM render path (SURVEY §5; VERDICT r4 item 2/7).

    ``bv`` must come from :func:`parallel.bricks.make_sharded_brick_volume`
    (slot-partitioned arrays, [D] n_active). With ``colored``, each device
    gathers voxel colors for the hits in its own slab (colors never
    replicate either) and one psum combines them — the sharded
    renderColoredView. Returns (view, overflow)."""
    D = int(mesh.shape[AXIS])
    if bv.brick_size != 8:
        raise ValueError("volume-sharded render needs 8^3 bricks")
    if getattr(bv.n_active, "shape", ())[0:1] != (D,):
        raise ValueError("bv is not slab-sharded for this mesh "
                         "(make_sharded_brick_volume)")
    if colored and bv.color is None:
        raise ValueError("colored render needs a color-carrying volume")
    return _render_volume_sharded_jit(bv, jnp.asarray(pose, jnp.float32),
                                      mesh, downsample_by, r_budget_local,
                                      pair_budget_local, colored, interpret)


def render_view_pallas_sharded(vol, pose, mesh: Mesh, downsample_by: int = 1,
                               colored: bool = False, pack=None,
                               r_budget: int = 4096, pair_budget: int = 32768,
                               pair_budget_local: Optional[int] = None,
                               interpret: bool = False):
    """Render with ray tiles sharded over the mesh, marching the Pallas
    kernel per device (the multi-chip ``renderView``).

    Accepts a :class:`BrickVolume` (8^3 bricks) or a prebuilt
    :class:`RenderPack`; the pack replicates to the mesh. Budgets grow on
    overflow exactly like :func:`ops.pallas_raycast.render_view_pallas`;
    fatal overflows (tile footprint, dropped bricks) raise — there is no
    silent XLA fallback on the sharded path (the fallback march is ~50x
    slower than the kernel, which would defeat scaling; VERDICT r4 item 1).
    """
    from ..bricks import BrickVolume
    from ..ops.pallas_raycast import RenderPack, grow_r_budget, make_render_pack

    if not isinstance(vol, RenderPack):
        if not (isinstance(vol, BrickVolume) and vol.brick_size == 8):
            raise ValueError("sharded kernel render needs an 8^3 BrickVolume "
                             "or a prebuilt RenderPack")
        if pack is None:
            pack = make_render_pack(vol, grow_r_budget(vol, r_budget))
    else:
        pack = vol
    # replicate onto the mesh (the source volume may be committed to one
    # device, e.g. a merge_sharded result)
    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())
    pack = jax.tree.map(lambda a: jax.device_put(a, rep), pack)
    D = int(mesh.shape[AXIS])

    attempts = 0
    while True:
        local = (pair_budget_local if pair_budget_local is not None
                 else _local_pair_budget(pair_budget, D))
        res, ovf_fix, ovf_fatal = _render_tile_sharded_jit(
            pack, jnp.asarray(pose, jnp.float32), mesh, downsample_by,
            pair_budget, local, colored, interpret)
        if bool(ovf_fatal):
            raise RuntimeError(
                "sharded render overflow: tile footprint beyond "
                "MAX_TILES_PER_BRICK or live bricks dropped beyond r_budget "
                "(grow r_budget / check the pack)")
        if not bool(ovf_fix):
            return res
        attempts += 1
        if attempts > 3 or pair_budget >= (1 << 19):
            raise RuntimeError("sharded render pair budget exhausted at "
                               f"pair_budget={pair_budget}, local={local}")
        # quadruple (no jump to 1<<16 like the single-device path): the
        # global pair list only feeds the replicated build_pairs, and its
        # 65536-row CPU compile has hit an XLA:CPU compiler segfault under
        # long-suite compiler state (round 5) — keep retries modest
        pair_budget = min(1 << 19, pair_budget * 4)
        if pair_budget_local is not None:
            pair_budget_local = min(1 << 19, pair_budget_local * 4)
