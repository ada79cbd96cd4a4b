"""Vectorized marching cubes over the dense TSDF grid.

TPU-native re-design of ``MarchingCubesTSDFOctree``
(``/root/reference/src/lib/marching_cubes_tsdf_octree.cpp:43-236``). The
reference recursively descends the octree and calls PCL's ``createSurface``
per occupied leaf. Here extraction is three static-shaped passes:

  1. corner values for ALL cubes via 8 shifted array views (no gathers),
     masked by the reference's cube filter: center voxel w >= w_min and
     |d| < 1 (cpp:190-193), interior indices only (cpp:199-202), all 8
     corners valid — corner value = d * max_dist_neg, invalid when
     w < w_min or |d| >= 1 (cpp:91-106);
  2. compaction of active cubes to a fixed budget (jnp.nonzero with a static
     size — the TPU-friendly dynamic-shape escape hatch);
  3. per-active-cube table lookup + edge interpolation + triangle emission
     into a fixed [budget * MAX_TRIS] buffer.

Output is a triangle soup (consecutive vertex triples), exactly like the
reference's ``performReconstruction`` (cpp:132-142); vertex positions are
``p1 + (0 - v1)/(v2 - v1) * (p2 - p1)`` on the voxel-center lattice, matching
PCL's interpolateEdge so vertex SETS are comparable 1:1. The global transform
is applied at the end (cpp:122,128).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TSDFConfig
from ..geometry import transform_points, voxel_center
from ..volume import TSDFVolume
from . import color as color_ops
from .mc_tables import CORNER_OFFSETS, EDGE_CORNERS, MAX_TRIS_PER_CUBE, TRI_COUNT, TRI_TABLE

# Default minimum weight to mesh a voxel (marching_cubes_tsdf_octree.h:58).
DEFAULT_MIN_WEIGHT = 2.5


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MeshSoup:
    """Fixed-budget triangle soup. triangles[i] valid iff i < num_triangles."""

    vertices: jnp.ndarray       # [budget*MAX_TRIS, 3, 3] f32 (tri, corner, xyz)
    colors: Optional[jnp.ndarray]  # [budget*MAX_TRIS, 3, 3] f32 or None
    tri_valid: jnp.ndarray      # [budget*MAX_TRIS] bool
    num_triangles: jnp.ndarray  # scalar int32
    overflowed: jnp.ndarray     # scalar bool: cube budget exceeded

    def to_numpy(self):
        """Compact to (V[N*3,3], F[N,3], C or None).

        Compaction happens ON DEVICE (cumsum-rank scatter) so only the real
        triangles cross the host link — the full fixed-budget buffers are
        tens of MB and device->host bandwidth through the TPU tunnel is the
        bottleneck of extraction otherwise."""
        n = int(self.num_triangles)
        if n == 0:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32),
                    None if self.colors is None else np.zeros((0, 3), np.float32))
        if self.vertices.shape[0] == n:  # already compact (extract_soup_bricks)
            v, c = self.vertices, self.colors
        else:
            budget = 1 << int(np.ceil(np.log2(n)))
            v, c = _compact_soup(self, budget)
        verts = np.asarray(v)[:n].reshape(-1, 3)
        faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
        cols = None if c is None else np.asarray(c)[:n].reshape(-1, 3)
        return verts, faces, cols


@partial(jax.jit, static_argnums=(1,))
def _compact_soup(soup: "MeshSoup", budget: int):
    """Rank-compact the soup: scatter only the 1-int-per-triangle source
    INDEX, then row-gather the 18-float rows (scatter runs ~15x slower than
    row gather on this TPU — BASELINE.md); rows beyond num_triangles are
    unspecified."""
    valid = soup.tri_valid.astype(jnp.int32)
    rank = jnp.cumsum(valid) - 1
    tgt = jnp.where((valid > 0) & (rank < budget), rank, budget)
    sel = jnp.zeros((budget + 1,), jnp.int32).at[tgt].set(
        jnp.arange(valid.shape[0], dtype=jnp.int32), mode="drop",
        unique_indices=True)[:budget]
    verts = jnp.take(soup.vertices, sel, axis=0)
    cols = None
    if soup.colors is not None:
        cols = jnp.take(soup.colors, sel, axis=0)
    return verts, cols


def _corner_grids(vol: TSDFVolume):
    """d and w at the 8 corners of every cube, as [8, X-1, Y-1, Z-1] views."""
    d, w = vol.sdf, vol.weight
    ds, ws = [], []
    for dx, dy, dz in np.asarray(CORNER_OFFSETS):
        sl = (slice(dx, d.shape[0] - 1 + dx),
              slice(dy, d.shape[1] - 1 + dy),
              slice(dz, d.shape[2] - 1 + dz))
        ds.append(d[sl])
        ws.append(w[sl])
    return jnp.stack(ds), jnp.stack(ws)


def active_cube_mask(vol: TSDFVolume, min_weight: float):
    """Reference cube filter; returns bool [X-1, Y-1, Z-1]."""
    cfg = vol.config
    dc, wc = _corner_grids(vol)
    corner_ok = (wc >= min_weight) & (jnp.abs(dc) < 1.0)
    all_corners = jnp.all(corner_ok, axis=0)
    # center voxel (== lower corner voxel) occupancy gate (cpp:190-193)
    center_ok = corner_ok[0]
    # interior: center index in [1, res-2] (cpp:199-202); cube grid index i
    # corresponds to center voxel i, so exclude i == 0 and i >= res-2+1.
    X, Y, Z = cfg.xres, cfg.yres, cfg.zres
    ii = jnp.arange(X - 1)[:, None, None]
    jj = jnp.arange(Y - 1)[None, :, None]
    kk = jnp.arange(Z - 1)[None, None, :]
    interior = (ii >= 1) & (ii < X - 2) & (jj >= 1) & (jj < Y - 2) & (kk >= 1) & (kk < Z - 2)
    sign_change = jnp.any(dc < 0, axis=0) & jnp.any(dc >= 0, axis=0)
    return all_corners & center_ok & interior & sign_change


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def marching_cubes(vol: TSDFVolume, min_weight: float = DEFAULT_MIN_WEIGHT,
                   max_cubes: int = 1 << 18, color_by_rgb: bool = False,
                   color_by_confidence: bool = False) -> MeshSoup:
    """Extract the isosurface as a fixed-budget triangle soup.

    max_cubes bounds the number of crossing cubes (surface area in voxel
    units); overflow is reported, not silently dropped.
    """
    cfg = vol.config
    mask = active_cube_mask(vol, min_weight)
    n_active = jnp.sum(mask)
    flat = mask.reshape(-1)
    (cube_idx,) = jnp.nonzero(flat, size=max_cubes, fill_value=-1)
    cube_ok = cube_idx >= 0
    cube_idx = jnp.maximum(cube_idx, 0)

    Y, Z = cfg.yres - 1, cfg.zres - 1
    ci = cube_idx // (Y * Z)
    cj = (cube_idx // Z) % Y
    ck = cube_idx % Z

    # Gather the 8 corner SDF values per active cube.
    offs = jnp.asarray(np.asarray(CORNER_OFFSETS))
    d_flat = vol.sdf.reshape(-1)
    lin = ((ci[:, None] + offs[None, :, 0]) * cfg.yres
           + (cj[:, None] + offs[None, :, 1])) * cfg.zres + (ck[:, None] + offs[None, :, 2])
    dcorn = jnp.take(d_flat, lin, mode="clip")  # [B, 8] normalized
    vals = dcorn * cfg.max_dist_neg             # meters (cpp:105)

    return _emit_soup(cfg, vol.global_transform, ci, cj, ck, vals, cube_ok,
                      _center_rgb(vol, (ci * cfg.yres + cj) * cfg.zres + ck,
                                  color_by_rgb, color_by_confidence),
                      n_active > max_cubes)




def _center_rgb(vol, lin_center, color_by_rgb, color_by_confidence):
    """Per-cube vertex color from the center voxel (cpp:216-230), or None."""
    cfg = vol.config
    if color_by_rgb and vol.color is not None:
        c_flat = vol.color.reshape(-1, vol.color.shape[-1])
        vox_col = jnp.take(c_flat, lin_center, axis=0, mode="clip")
        r, g, b = color_ops.color_to_rgb(cfg.color_mode, vox_col)
        return jnp.stack([r, g, b], -1)
    if color_by_confidence:
        w_flat = vol.weight.reshape(-1)
        wv = jnp.take(w_flat, lin_center, mode="clip")
        std_dev = (100.0 - wv) / 100.0
        r = jnp.clip((1.0 - std_dev) * 255.0, 0.0, 255.0)
        b = jnp.clip(std_dev * 255.0, 0.0, 255.0)
        return jnp.stack([r, jnp.zeros_like(r), b], -1)
    return None


def _emit_soup(cfg, global_transform, ci, cj, ck, vals, cube_ok, center_rgb,
               overflowed) -> MeshSoup:
    """Shared triangle-emission stage: table lookup + edge interpolation.

    ci/cj/ck: [N] lower-corner voxel indices; vals: [N, 8] corner values in
    meters; cube_ok: [N] mask; center_rgb: [N, 3] or None.

    Gather-free except the [N, 3*MAX] int table-row lookup: edge endpoints
    come from STATIC slicing (EDGE_CORNERS is compile-time), and per-slot
    edge selection is a 12-way select-accumulate that XLA fuses into one
    elementwise loop (arbitrary gathers run at ~0.1 G elem/s on this TPU —
    BASELINE.md — so `take_along_axis` was the extraction bottleneck).
    """
    offs = np.asarray(CORNER_OFFSETS)
    # cubeindex: bit i set iff corner value < iso(=0), PCL rule.
    bits = (vals < 0.0).astype(jnp.int32)
    cubeindex = jnp.sum(bits * (1 << jnp.arange(8, dtype=jnp.int32))[None, :], axis=1)

    # Interpolated vertex position on each of the 12 edges (static endpoints).
    cx, cy, cz = voxel_center(cfg, ci.astype(jnp.float32), cj.astype(jnp.float32),
                              ck.astype(jnp.float32))
    cell = np.asarray(cfg.cell_size, np.float32)
    e_a = [int(a) for a in EDGE_CORNERS[:, 0]]
    e_b = [int(b) for b in EDGE_CORNERS[:, 1]]

    def corner_xyz(c):
        return jnp.stack([cx + float(offs[c, 0] * cell[0]),
                          cy + float(offs[c, 1] * cell[1]),
                          cz + float(offs[c, 2] * cell[2])], -1)

    v1 = jnp.stack([vals[:, a] for a in e_a], -1)            # [N, 12]
    v2 = jnp.stack([vals[:, b] for b in e_b], -1)
    p1 = jnp.stack([corner_xyz(a) for a in e_a], 1)          # [N, 12, 3]
    p2 = jnp.stack([corner_xyz(b) for b in e_b], 1)
    denom = v2 - v1
    mu = jnp.where(denom == 0, 0.5, (0.0 - v1) / jnp.where(denom == 0, 1.0, denom))
    edge_pts = p1 + mu[..., None] * (p2 - p1)  # [N, 12, 3]

    # Triangle emission via table lookup.
    tri_tab = jnp.asarray(TRI_TABLE.astype(np.int32))       # [256, 3*MAX]
    tri_cnt = jnp.asarray(TRI_COUNT)                        # [256]
    entries = tri_tab[cubeindex]                            # [N, 3*MAX]
    ntris = jnp.where(cube_ok, tri_cnt[cubeindex], 0)       # [N]
    N = vals.shape[0]
    M = MAX_TRIS_PER_CUBE
    edge_ids = jnp.maximum(entries, 0).reshape(N, M, 3)     # [N, M, 3]
    # per-slot edge selection as a fused select-accumulate over the 12 edges
    tri_verts = jnp.zeros((N, M, 3, 3), jnp.float32)
    for e in range(12):
        sel = (edge_ids == e)[..., None]                     # [N, M, 3, 1]
        tri_verts = tri_verts + jnp.where(sel, edge_pts[:, e][:, None, None, :], 0.0)
    slot = jnp.arange(M, dtype=jnp.int32)[None, :]
    tri_valid = (slot < ntris[:, None]).reshape(N * M)
    vertices = tri_verts.reshape(N * M, 3, 3)

    # Apply the global transform (cpp:122,128).
    vx, vy, vz = transform_points(global_transform, vertices[..., 0],
                                  vertices[..., 1], vertices[..., 2])
    vertices = jnp.stack([vx, vy, vz], -1)

    colors = None
    if center_rgb is not None:
        colors = jnp.broadcast_to(center_rgb[:, None, None, :],
                                  (N, M, 3, 3)).reshape(N * M, 3, 3)

    return MeshSoup(
        vertices=vertices,
        colors=colors,
        tri_valid=tri_valid,
        num_triangles=jnp.sum(ntris),
        overflowed=overflowed,
    )



def count_active_cubes(vol: TSDFVolume, min_weight: float = DEFAULT_MIN_WEIGHT) -> int:
    """Host helper to pick a budget before calling marching_cubes."""
    return int(jnp.sum(active_cube_mask(vol, min_weight)))


def extract_mesh(vol: TSDFVolume, min_weight: float = DEFAULT_MIN_WEIGHT,
                 color_by_rgb: bool = False, color_by_confidence: bool = False,
                 max_cubes: Optional[int] = None):
    """Convenience host-level extraction with automatic budget sizing.

    Returns (vertices [N*3, 3], faces [N, 3], colors [N*3, 3] | None).
    """
    from ..bricks import BrickVolume

    if isinstance(vol, BrickVolume):
        return extract_mesh_bricks(vol, min_weight, color_by_rgb, color_by_confidence)
    if max_cubes is None:
        n = count_active_cubes(vol, min_weight)
        max_cubes = max(1024, 1 << int(np.ceil(np.log2(max(n, 1)))))
    soup = marching_cubes(vol, min_weight, max_cubes, color_by_rgb, color_by_confidence)
    if bool(soup.overflowed):
        raise RuntimeError(
            f"marching_cubes budget {max_cubes} overflowed; pass a larger max_cubes")
    return soup.to_numpy()


# ---------------------------------------------------------------------------
# brick-native extraction (no dense materialization — the 2048^3 path)
# ---------------------------------------------------------------------------
#
# Gather-free design (round 3): the old path fetched every cube corner with
# `gather_dw` (8 arbitrary gathers per cube at ~0.1 G elem/s — the extraction
# bottleneck, BENCH_r02: 12k tris/s). Now each chunk
#   1. assembles HALOED [K, B+1, B+1, B+1] d/w blocks with 8 sliced ROW
#     gathers over neighbor slots (the make_render_pack trick; row gathers
#     run ~15x faster than arbitrary ones);
#   2. computes corner stacks as shifted VIEWS of the blocks (zero gathers),
#     the cube filter, and the sign-change mask on the full chunk grid;
#   3. compacts crossing cubes to a budget and emits triangles only for them.


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def _marching_cubes_brick_chunk(bv, slot0, n_slots: int, cube_budget: int,
                                min_weight: float, color_by_rgb: bool,
                                color_by_confidence: bool) -> MeshSoup:
    """Triangles for cubes whose lower-corner voxel lies in bricks
    [slot0, slot0 + n_slots). Every voxel belongs to exactly one brick, so
    chunks never duplicate cubes."""
    from ..activation import _compact

    cfg = bv.config
    B = bv.brick_size
    V = B * B * B
    K = n_slots
    nbx, nby, nbz = bv.bricks_per_axis
    C = bv.capacity
    coords = jax.lax.dynamic_slice(bv.coords, (slot0, 0), (K, 3))
    # liveness comes from coords alone: sharded allocation leaves live slots
    # non-contiguous (per-device partitions), so n_active is not a bound
    slot_live = coords[:, 0] >= 0

    # ---- stage 1: haloed blocks [K, B+1, B+1, B+1] ------------------------
    d_pad = jnp.concatenate([bv.sdf, jnp.full((1, B, B, B), -1.0, bv.sdf.dtype)], 0)
    w_pad = jnp.concatenate([bv.weight, jnp.zeros((1, B, B, B), bv.weight.dtype)], 0)
    bmap_flat = bv.brick_map.reshape(-1)
    blkd = jnp.full((K, B + 1, B + 1, B + 1), -1.0, jnp.float32)
    blkw = jnp.zeros((K, B + 1, B + 1, B + 1), jnp.float32)
    own_d = jax.lax.dynamic_slice(bv.sdf, (slot0, 0, 0, 0), (K, B, B, B))
    own_w = jax.lax.dynamic_slice(bv.weight, (slot0, 0, 0, 0), (K, B, B, B))
    blkd = blkd.at[:, :B, :B, :B].set(jnp.where(slot_live[:, None, None, None],
                                                own_d, -1.0))
    blkw = blkw.at[:, :B, :B, :B].set(jnp.where(slot_live[:, None, None, None],
                                                own_w, 0.0))
    for ox in (0, 1):
        sx = slice(0, B) if ox == 0 else slice(0, 1)
        dx = slice(0, B) if ox == 0 else slice(B, B + 1)
        for oy in (0, 1):
            sy = slice(0, B) if oy == 0 else slice(0, 1)
            dy = slice(0, B) if oy == 0 else slice(B, B + 1)
            for oz in (0, 1):
                if ox == oy == oz == 0:
                    continue
                sz = slice(0, B) if oz == 0 else slice(0, 1)
                dz = slice(0, B) if oz == 0 else slice(B, B + 1)
                nc = coords + jnp.asarray([ox, oy, oz])
                ok = slot_live & (nc[:, 0] < nbx) & (nc[:, 1] < nby) & (nc[:, 2] < nbz)
                blin = (nc[:, 0] * nby + nc[:, 1]) * nbz + nc[:, 2]
                nslot = jnp.take(bmap_flat, jnp.clip(blin, 0, nbx * nby * nbz - 1),
                                 mode="clip")
                nslot = jnp.where(ok & (nslot >= 0), nslot, C)
                blkd = blkd.at[:, dx, dy, dz].set(d_pad[:, sx, sy, sz][nslot])
                blkw = blkw.at[:, dx, dy, dz].set(w_pad[:, sx, sy, sz][nslot])

    # ---- stage 2: corner stacks as shifted views + cube filter ------------
    offs = np.asarray(CORNER_OFFSETS)
    dcs = [blkd[:, ox:ox + B, oy:oy + B, oz:oz + B] for ox, oy, oz in offs]
    wcs = [blkw[:, ox:ox + B, oy:oy + B, oz:oz + B] for ox, oy, oz in offs]
    dcorn = jnp.stack(dcs, -1).reshape(K * V, 8)     # [K*V, 8] normalized
    corner_ok = jnp.ones((K, B, B, B), bool)
    for dc, wc in zip(dcs, wcs):
        corner_ok &= (wc >= min_weight) & (jnp.abs(dc) < 1.0)
    center_ok = (wcs[0] >= min_weight) & (jnp.abs(dcs[0]) < 1.0)
    neg = jnp.zeros((K, B, B, B), bool)
    pos = jnp.zeros((K, B, B, B), bool)
    for dc in dcs:
        neg |= dc < 0
        pos |= dc >= 0

    li = jnp.arange(B, dtype=jnp.int32)
    vx = coords[:, 0:1, None, None] * B + li[None, :, None, None]
    vy = coords[:, 1:2, None, None] * B + li[None, None, :, None]
    vz = coords[:, 2:3, None, None] * B + li[None, None, None, :]
    interior = ((vx >= 1) & (vx < cfg.xres - 2)
                & (vy >= 1) & (vy < cfg.yres - 2)
                & (vz >= 1) & (vz < cfg.zres - 2))
    cube_ok = (corner_ok & center_ok & neg & pos & interior
               & slot_live[:, None, None, None])

    # ---- stage 3: compact crossing cubes, then emit only those ------------
    idx, n_cubes = _compact(cube_ok.reshape(-1),
                            jnp.arange(K * V, dtype=jnp.int32), cube_budget)
    ok2 = idx >= 0
    idxs = jnp.maximum(idx, 0)
    vals = jnp.take(dcorn, idxs, axis=0) * cfg.max_dist_neg    # [Nc, 8] meters
    s = idxs // V
    within = idxs % V
    lx, ly, lz = within // (B * B), (within // B) % B, within % B
    cs = jnp.take(coords, s, axis=0)
    cvx = cs[:, 0] * B + lx
    cvy = cs[:, 1] * B + ly
    cvz = cs[:, 2] * B + lz

    center_rgb = None
    if color_by_rgb and bv.color is not None:
        cblk = jax.lax.dynamic_slice(
            bv.color, (slot0, 0, 0, 0, 0),
            (K, B, B, B, bv.color.shape[-1])).reshape(K * V, -1)
        vox_col = jnp.take(cblk, idxs, axis=0)
        r, g, bl = color_ops.color_to_rgb(cfg.color_mode, vox_col)
        center_rgb = jnp.stack([r, g, bl], -1)
    elif color_by_confidence:
        wv = jnp.take(blkw[:, :B, :B, :B].reshape(-1), idxs)
        std_dev = (100.0 - wv) / 100.0
        r = jnp.clip((1.0 - std_dev) * 255.0, 0.0, 255.0)
        bb = jnp.clip(std_dev * 255.0, 0.0, 255.0)
        center_rgb = jnp.stack([r, jnp.zeros_like(r), bb], -1)

    return _emit_soup(cfg, bv.global_transform, cvx, cvy, cvz, vals, ok2,
                      center_rgb, n_cubes > cube_budget)


def extract_mesh_bricks(bv, min_weight: float = DEFAULT_MIN_WEIGHT,
                        color_by_rgb: bool = False,
                        color_by_confidence: bool = False,
                        chunk_slots: int = 2048, cube_budget: int = 1 << 15):
    """Host-level brick-native extraction returning numpy (V, F, C | None)."""
    soup = extract_soup_bricks(bv, min_weight, color_by_rgb,
                               color_by_confidence, chunk_slots, cube_budget)
    return soup.to_numpy()


def extract_soup_bricks(bv, min_weight: float = DEFAULT_MIN_WEIGHT,
                        color_by_rgb: bool = False,
                        color_by_confidence: bool = False,
                        chunk_slots: int = 2048,
                        cube_budget: int = 1 << 15) -> MeshSoup:
    """Device-level brick-native extraction: chunks over allocated bricks,
    compacts each chunk's soup ON DEVICE (peak HBM stays ~one chunk budget,
    not live_chunks x budget), and returns one device-resident MeshSoup whose
    first `num_triangles` slots are the valid triangles in order.

    A chunk whose crossing-cube count exceeds `cube_budget` is automatically
    re-run with a doubled budget (recompile per new power-of-two budget).
    """
    chunk_slots = min(chunk_slots, bv.capacity)
    while bv.capacity % chunk_slots:  # chunks must tile the slot range exactly
        chunk_slots //= 2
    live = np.asarray(bv.coords[:, 0] >= 0)
    starts = [s0 for s0 in range(0, bv.capacity, chunk_slots)
              if live[s0:s0 + chunk_slots].any()] or [0]
    verts, cols, total = [], [], 0
    for s0 in starts:
        budget = cube_budget
        while True:
            soup = _marching_cubes_brick_chunk(
                bv, jnp.int32(s0), chunk_slots, budget, min_weight,
                color_by_rgb, color_by_confidence)
            if not bool(soup.overflowed):
                break
            budget *= 2
        n = int(soup.num_triangles)
        total += n
        if n == 0:
            continue
        cap = 1 << int(np.ceil(np.log2(n)))
        v, c = _compact_soup(soup, cap)
        verts.append(v[:n])
        if c is not None:
            cols.append(c[:n])
    if not verts:
        z = jnp.zeros((0, 3, 3), jnp.float32)
        return MeshSoup(vertices=z, colors=(z if color_by_rgb or color_by_confidence
                                            else None),
                        tri_valid=jnp.zeros((0,), bool),
                        num_triangles=jnp.int32(0), overflowed=jnp.asarray(False))
    v_all = verts[0] if len(verts) == 1 else jnp.concatenate(verts, 0)
    c_all = (None if not cols
             else (cols[0] if len(cols) == 1 else jnp.concatenate(cols, 0)))
    return MeshSoup(vertices=v_all, colors=c_all,
                    tri_valid=jnp.arange(v_all.shape[0]) < total,
                    num_triangles=jnp.int32(total),
                    overflowed=jnp.asarray(False))
