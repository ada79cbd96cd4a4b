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

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import TSDFConfig
from ..geometry import transform_points, voxel_center
from ..volume import TSDFVolume
from . import color as color_ops
from .mc_tables import CORNER_OFFSETS, EDGE_CORNERS, MAX_TRIS_PER_CUBE, TRI_COUNT, TRI_TABLE

# Default minimum weight to mesh a voxel (marching_cubes_tsdf_octree.h:58).
DEFAULT_MIN_WEIGHT = 2.5


@partial(jax.tree_util.register_dataclass,
         data_fields=("vertices", "colors", "tri_valid", "num_triangles",
                      "overflowed"),
         meta_fields=("live_chunks", "budget_hint"))
@dataclasses.dataclass
class MeshSoup:
    """Fixed-budget triangle soup. triangles[i] valid iff i < num_triangles."""

    vertices: jnp.ndarray       # [budget*MAX_TRIS, 3, 3] f32 (tri, corner, xyz)
    colors: Optional[jnp.ndarray]  # [budget*MAX_TRIS, 3, 3] f32 or None
    tri_valid: jnp.ndarray      # [budget*MAX_TRIS] bool
    num_triangles: jnp.ndarray  # scalar int32
    overflowed: jnp.ndarray     # scalar bool: cube budget exceeded
    # brick-path reuse hints (extract_soup_bricks): declared STATIC pytree
    # metadata so they survive jit/tree operations instead of silently
    # vanishing as ad-hoc attributes; tuples, to stay hashable in cache keys
    live_chunks: Optional[tuple] = None   # chunk start slots
    budget_hint: Optional[tuple] = None   # per-chunk (cube, brick, tri)

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
    # interior: center index in [1, res-2] INCLUSIVE (cpp:199-202 rejects
    # idx <= 0 and idx >= res-1); `< X - 2` dropped the last interior layer
    # of cubes on the +axis sides (its corners reach res-1, still in-bounds)
    X, Y, Z = cfg.xres, cfg.yres, cfg.zres
    ii = jnp.arange(X - 1)[:, None, None]
    jj = jnp.arange(Y - 1)[None, :, None]
    kk = jnp.arange(Z - 1)[None, None, :]
    interior = (ii >= 1) & (ii < X - 1) & (jj >= 1) & (jj < Y - 1) & (kk >= 1) & (kk < Z - 1)
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


def _table_rows_onehot(cubeindex, cube_ok):
    """Triangle-table rows via a one-hot MXU matmul (arbitrary gathers run
    at ~0.1 G elem/s on this TPU): (entries [N, 3*MAX] int32, ntris [N])."""
    M = MAX_TRIS_PER_CUBE
    table = np.concatenate([TRI_TABLE.astype(np.float32),
                            TRI_COUNT[:, None].astype(np.float32)], 1)
    onehot = (cubeindex[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]
              ).astype(jnp.float32)
    rows = jnp.dot(onehot, jnp.asarray(table),
                   preferred_element_type=jnp.float32)
    entries = rows[:, :3 * M].astype(jnp.int32)
    ntris = jnp.where(cube_ok, rows[:, 3 * M].astype(jnp.int32), 0)
    return entries, ntris


def _emit_soup_compacted(cfg, global_transform, ci, cj, ck, vals, cube_ok,
                         center_rgb, overflowed, tri_budget: int,
                         interpret: bool) -> MeshSoup:
    """Compact-then-emit triangle emission for the kernel path: triangles
    are compacted FIRST (pack-left kernel over the per-cube triangle-count
    mask), then vertices are interpolated only for the [tri_budget]
    survivors. Skips the [N, MAX, 3, 3] materialization chain the
    emit-then-compact order pays (~2.3 ms of reshape/broadcast/scatter at
    N=24576, bench/mc_trace); the resulting soup is already compacted
    (prefix tri_valid), in the same cube-major order as
    ``_emit_soup`` + ``_compact_soup``."""
    N = vals.shape[0]
    M = MAX_TRIS_PER_CUBE
    bits = (vals < 0.0).astype(jnp.int32)
    cubeindex = jnp.sum(bits * (1 << jnp.arange(8, dtype=jnp.int32))[None, :],
                        axis=1)
    cx, cy, cz = voxel_center(cfg, ci.astype(jnp.float32),
                              cj.astype(jnp.float32), ck.astype(jnp.float32))
    entries, ntris = _table_rows_onehot(cubeindex, cube_ok)  # [N, 3M], [N]

    slot = jnp.arange(M, dtype=jnp.int32)[None, :]
    mask2d = (slot < ntris[:, None]).astype(jnp.int32).reshape(-1, 512)
    loc = _pack_left_rows(mask2d, interpret)
    sel, n_tris = _compact_from_loc(mask2d, loc, tri_budget)  # flat tri ids
    ok_t = sel >= 0
    selv = jnp.maximum(sel, 0)
    c = selv // M
    m = selv % M

    # per-triangle data in SoA layout — the triangle index lives in LANES.
    # A [tb, 3]-shaped AoS emit lowers to 3-lane-minor vregs (97% of each
    # vector op padded away; the 12-edge select ran 1.8 ms, bench/mc_trace).
    # ONE combined row gather fetches everything per cube, then everything
    # is [*, tb] until the final stack.
    gmat = jnp.concatenate(
        [vals, cx[:, None], cy[:, None], cz[:, None],
         jnp.zeros((N, 1), jnp.float32)], 1)                 # [N, 12]
    gT = jnp.take(gmat, c, axis=0).T                          # [12, tb]
    erT = jnp.take(entries, c, axis=0).T                      # [3M, tb]

    # edge ids of this triangle's 3 vertices, then edge -> corner pair
    eidT = []
    for j in range(3):
        e = erT[j]
        for mi in range(1, M):
            e = jnp.where(m == mi, erT[3 * mi + j], e)
        eidT.append(e)                                        # [tb] each
    offs = np.asarray(CORNER_OFFSETS).astype(np.float32)
    cell = np.asarray(cfg.cell_size, np.float32)
    e_a = [int(a) for a in EDGE_CORNERS[:, 0]]
    e_b = [int(b) for b in EDGE_CORNERS[:, 1]]

    def vert_xyz(eid):
        """Interpolated vertex of edge `eid` [tb] as ([tb] x, y, z)."""
        v1 = v2 = jnp.zeros_like(gT[0])
        p1 = [jnp.zeros_like(gT[0]) for _ in range(3)]
        p2 = [jnp.zeros_like(gT[0]) for _ in range(3)]
        for e in range(12):
            is_e = eid == e
            v1 = jnp.where(is_e, gT[e_a[e]], v1)
            v2 = jnp.where(is_e, gT[e_b[e]], v2)
            for x in range(3):
                ctr = gT[8 + x]
                p1[x] = jnp.where(is_e, ctr + offs[e_a[e], x] * cell[x], p1[x])
                p2[x] = jnp.where(is_e, ctr + offs[e_b[e], x] * cell[x], p2[x])
        denom = v2 - v1
        mu = jnp.where(denom == 0, 0.5,
                       (0.0 - v1) / jnp.where(denom == 0, 1.0, denom))
        return [p1[x] + mu * (p2[x] - p1[x]) for x in range(3)]

    corners3 = [vert_xyz(eidT[j]) for j in range(3)]          # [3][3][tb]
    wx = jnp.stack([corners3[j][0] for j in range(3)], 0)     # [3, tb]
    wy = jnp.stack([corners3[j][1] for j in range(3)], 0)
    wz = jnp.stack([corners3[j][2] for j in range(3)], 0)
    vx, vy, vz = transform_points(global_transform, wx, wy, wz)
    verts = jnp.stack([vx, vy, vz], -1).transpose(1, 0, 2)    # [tb, 3, 3]

    colors = None
    if center_rgb is not None:
        colors = jnp.broadcast_to(jnp.take(center_rgb, c, axis=0)[:, None, :],
                                  (tri_budget, 3, 3))
    return MeshSoup(vertices=verts, colors=colors, tri_valid=ok_t,
                    num_triangles=n_tris, overflowed=overflowed)


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

    # Triangle emission via table lookup. For kernel-sized N the [N, 16] row
    # fetch goes through a one-hot MXU matmul (arbitrary gathers run at
    # ~0.1 G elem/s on this TPU; the matmul is sub-ms); the dense path's
    # larger budgets fall back to the gather to avoid a [N, 256] blow-up.
    N = vals.shape[0]
    M = MAX_TRIS_PER_CUBE
    if N <= (1 << 17):
        entries, ntris = _table_rows_onehot(cubeindex, cube_ok)
    else:
        tri_tab = jnp.asarray(TRI_TABLE.astype(np.int32))   # [256, 3*MAX]
        tri_cnt = jnp.asarray(TRI_COUNT)                    # [256]
        entries = tri_tab[cubeindex]                        # [N, 3*MAX]
        ntris = jnp.where(cube_ok, tri_cnt[cubeindex], 0)   # [N]
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

    max_cubes: on the dense CPU path, the exact cube budget (overflow
    raises). On the brick routes it seeds the per-chunk budget — overflow
    there re-runs with doubled budgets, so it only affects performance.
    """
    from ..bricks import BrickVolume, from_dense

    bargs = {} if max_cubes is None else {"cube_budget": int(max_cubes)}
    if isinstance(vol, BrickVolume):
        return extract_mesh_bricks(vol, min_weight, color_by_rgb,
                                   color_by_confidence, **bargs)
    if {d.platform for d in vol.sdf.devices()} - {"cpu"}:
        # on accelerators, dense volumes extract through the brick kernel
        # path (halo-roll corners + pack-left compaction); the dense path's
        # full-grid scatter compaction is ~4.6 ns/element — 0.6 s at 512^3
        bv = from_dense(vol, 8)
        if bool(bv.overflowed):  # cannot happen with auto-sized capacity
            raise RuntimeError("from_dense overflowed its brick capacity")
        return extract_mesh_bricks(bv, min_weight, color_by_rgb,
                                   color_by_confidence, **bargs)
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
#   1. pre-filters bricks with a per-brick valid-d min/max test combined over
#     the 7 (+1)-neighbors (`_brick_stats` + the candidate mask): a brick can
#     contain a crossing cube only if the combined range straddles 0 — a
#     provable superset, since every active cube's corners are valid voxels
#     of exactly those bricks (bench/mc_probe5: corner stacks over the full
#     2048-brick chunk were 3.7 of 11.2 ms; candidates are ~4x fewer);
#   2. assembles HALOED corner stacks for the CANDIDATE bricks only with 8
#     sliced ROW gathers over neighbor slots (the make_render_pack trick;
#     row gathers run ~15x faster than arbitrary ones), cube filter and
#     sign-change mask as shifted VIEWS of the blocks (zero gathers);
#   3. compacts crossing cubes to a budget and emits triangles only for them.


@partial(jax.jit, static_argnums=(2, 3))
def _brick_stats_scan(bv, starts, chunk_slots: int, min_weight: float):
    """Per-brick (min, max) of d over VALID voxels (w >= min_weight, |d| < 1)
    for every slot of the chunks at `starts` ([Nc] int32, TRACED); +inf/-inf
    where no valid voxel or never computed. Index C (the neighbor-fill
    sentinel) stays +inf/-inf. Duplicate starts are harmless (the update is
    idempotent), which lets the caller pad to a pow2 length so a changing
    live set reuses O(log) executables instead of recompiling per set."""
    B = bv.brick_size
    V = B * B * B
    C = bv.capacity
    sdf2 = bv.sdf.reshape(C, V)
    w2 = bv.weight.reshape(C, V)

    def body(carry, s0):
        dmin, dmax = carry
        d = jax.lax.dynamic_slice(sdf2, (s0, 0), (chunk_slots, V))
        w = jax.lax.dynamic_slice(w2, (s0, 0), (chunk_slots, V))
        valid = (w >= min_weight) & (jnp.abs(d) < 1.0)
        dmin = jax.lax.dynamic_update_slice(
            dmin, jnp.min(jnp.where(valid, d, jnp.inf), axis=1), (s0,))
        dmax = jax.lax.dynamic_update_slice(
            dmax, jnp.max(jnp.where(valid, d, -jnp.inf), axis=1), (s0,))
        return (dmin, dmax), None

    init = (jnp.full((C + 1,), jnp.inf), jnp.full((C + 1,), -jnp.inf))
    (dmin, dmax), _ = jax.lax.scan(body, init,
                                   jnp.asarray(starts, jnp.int32))
    return dmin, dmax


def _brick_stats(bv, live_chunks, chunk_slots: int, min_weight: float):
    """Pow2-padded wrapper over :func:`_brick_stats_scan` (pads by repeating
    the last start — idempotent)."""
    lc = list(live_chunks)
    npad = 1 << int(np.ceil(np.log2(max(len(lc), 1))))
    starts = np.asarray(lc + [lc[-1]] * (npad - len(lc)), np.int32)
    return _brick_stats_scan(bv, jnp.asarray(starts), chunk_slots, min_weight)


def _corner_stacks(bv, slots, min_weight: float):
    """The 8 corner-value stacks for every cube of the bricks at `slots`
    ([Kc] global slot ids; padding rows = capacity), assembled WITHOUT
    arbitrary gathers or awkward [K,9,9,9] intermediates (the round-3 first
    cut spent 56 of 70 ms on 16 in-place halo writes into that shape).

    Each corner stack dcorn[c] (voxel at local+CORNER_OFFSETS[c]) is a concat
    tree over up to 8 pieces: interior slices of the OWN block plus face/
    edge/corner slabs row-gathered from the +1 neighbor bricks. Returns
    (dstack [Kc * V, 8] normalized SDF — corners LAST so the downstream
    per-cube fetch is a fast row gather, not an arbitrary element gather —
    cube_ok [Kc, V] flat mask, coords, slot_live)."""
    cfg = bv.config
    B = bv.brick_size
    V = B * B * B
    K = slots.shape[0]
    nbx, nby, nbz = bv.bricks_per_axis
    C = bv.capacity
    coords = jnp.take(bv.coords, jnp.minimum(slots, C - 1), axis=0)
    # liveness comes from coords alone: sharded allocation leaves live slots
    # non-contiguous (per-device partitions), so n_active is not a bound
    slot_live = (slots < C) & (coords[:, 0] >= 0)
    bmap_flat = bv.brick_map.reshape(-1)

    def neighbor_slot(bits):
        nc = coords + jnp.asarray(bits, jnp.int32)
        ok = slot_live & (nc[:, 0] < nbx) & (nc[:, 1] < nby) & (nc[:, 2] < nbz)
        blin = (nc[:, 0] * nby + nc[:, 1]) * nbz + nc[:, 2]
        nslot = jnp.take(bmap_flat, jnp.clip(blin, 0, nbx * nby * nbz - 1),
                         mode="clip")
        return jnp.where(ok & (nslot >= 0), nslot, C)  # C = out of range

    nslots = {bits: neighbor_slot(bits)
              for bits in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0),
                           (1, 0, 1), (0, 1, 1), (1, 1, 1)]}

    def slabs_for(field, fill):
        """Source slabs per neighbor-bit combo; shape [K, dx, dy, dz]."""
        own = jnp.take(field.reshape(C, V), slots, axis=0, mode="fill",
                       fill_value=fill)
        own = jnp.where(slot_live[:, None], own, fill).reshape(K, B, B, B)
        # face/edge slab sources want 4D views (storage is the vreg-tiled
        # [C, 4, V/4] — same linear order, bricks.BrickVolume)
        field = field.reshape(C, B, B, B)

        def g(src2d, bits, shape):
            t = jnp.take(src2d, nslots[bits], axis=0, mode="fill",
                         fill_value=fill)
            return t.reshape((K,) + shape)

        return {
            (0, 0, 0): own,
            (1, 0, 0): g(field[:, 0].reshape(C, B * B), (1, 0, 0), (1, B, B)),
            (0, 1, 0): g(field[:, :, 0].reshape(C, B * B), (0, 1, 0), (B, 1, B)),
            (0, 0, 1): g(field[:, :, :, 0].reshape(C, B * B), (0, 0, 1), (B, B, 1)),
            (1, 1, 0): g(field[:, 0, 0].reshape(C, B), (1, 1, 0), (1, 1, B)),
            (1, 0, 1): g(field[:, 0, :, 0].reshape(C, B), (1, 0, 1), (1, B, 1)),
            (0, 1, 1): g(field[:, :, 0, 0].reshape(C, B), (0, 1, 1), (B, 1, 1)),
            (1, 1, 1): g(field[:, 0, 0, 0].reshape(C, 1), (1, 1, 1), (1, 1, 1)),
        }

    d_slabs = slabs_for(bv.sdf, -1.0)
    w_slabs = slabs_for(bv.weight, 0.0)

    def corner(slabs, ox, oy, oz):
        """[K, B, B, B] voxel values at local+(ox,oy,oz) via concat tree."""
        xparts = []
        for bx, xsl in ([(0, slice(0, B))] if ox == 0
                        else [(0, slice(1, B)), (1, slice(None))]):
            yparts = []
            for by, ysl in ([(0, slice(0, B))] if oy == 0
                            else [(0, slice(1, B)), (1, slice(None))]):
                zparts = []
                for bz, zsl in ([(0, slice(0, B))] if oz == 0
                                else [(0, slice(1, B)), (1, slice(None))]):
                    src = slabs[(bx, by, bz)]
                    piece = src[:,
                                xsl if bx == 0 else slice(None),
                                ysl if by == 0 else slice(None),
                                zsl if bz == 0 else slice(None)]
                    zparts.append(piece)
                yparts.append(zparts[0] if len(zparts) == 1
                              else jnp.concatenate(zparts, 3))
            xparts.append(yparts[0] if len(yparts) == 1
                          else jnp.concatenate(yparts, 2))
        out = xparts[0] if len(xparts) == 1 else jnp.concatenate(xparts, 1)
        return out.reshape(K, V)

    offs = np.asarray(CORNER_OFFSETS)
    dcs = [corner(d_slabs, *o) for o in offs]
    wcs = [corner(w_slabs, *o) for o in offs]
    dstack = jnp.stack(dcs, -1).reshape(K * V, 8)    # [K * V, 8]

    corner_ok = jnp.ones((K, V), bool)
    for dc, wc in zip(dcs, wcs):
        corner_ok &= (wc >= min_weight) & (jnp.abs(dc) < 1.0)
    neg = jnp.zeros((K, V), bool)
    pos = jnp.zeros((K, V), bool)
    for dc in dcs:
        neg |= dc < 0
        pos |= dc >= 0

    interior = _interior_mask(cfg, coords, B, V)
    cube_ok = corner_ok & neg & pos & interior & slot_live[:, None]
    return dstack, cube_ok, coords, slot_live


def _interior_mask(cfg, coords, B: int, V: int):
    """[K, V] mask of cubes whose lower corner is an interior voxel
    (marching_cubes_tsdf_octree.cpp:199-202)."""
    vid = jnp.arange(V, dtype=jnp.int32)[None, :]
    vx = coords[:, 0:1] * B + vid // (B * B)
    vy = coords[:, 1:2] * B + (vid // B) % B
    vz = coords[:, 2:3] * B + vid % B
    # [1, res-2] inclusive, matching active_cube_mask / the reference
    return ((vx >= 1) & (vx < cfg.xres - 1)
            & (vy >= 1) & (vy < cfg.yres - 1)
            & (vz >= 1) & (vz < cfg.zres - 1))


# Neighbor-brick directions, in the plane order fed to the halo kernel.
_NBR_BITS = ((1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0),
             (1, 0, 1), (0, 1, 1), (1, 1, 1))


def _compact_from_loc(mask2d, loc, budget: int):
    """Budgeted global compaction from per-row pack-left tables: returns
    (ids [budget] int32 flat indices in ascending order, -1 padded; count).

    Same contract and ordering as ``activation._compact`` over
    ``mask2d.reshape(-1)``, but built from block offsets + two gathers
    instead of a per-element scatter (~4.6 ns/elem on this TPU —
    bench/mc_trace measured the KB*V=393k-element scatter at 1.8 ms)."""
    NB, V = mask2d.shape
    cnt = jnp.sum(mask2d, axis=1).astype(jnp.int32)          # [NB]
    off = jnp.cumsum(cnt) - cnt                              # exclusive
    n = off[-1] + cnt[-1]
    r = jnp.arange(budget, dtype=jnp.int32)
    le = off[None, :] <= r[:, None]                          # [budget, NB]
    blk = jnp.sum(le.astype(jnp.int32), axis=1) - 1
    blk = jnp.maximum(blk, 0)
    # off[blk] gather-free: off is non-decreasing, so off[blk] is the max
    # off_k satisfying off_k <= r (one more reduce over the compare matrix
    # instead of a budget-sized element gather)
    off_r = jnp.max(jnp.where(le, off[None, :], 0), axis=1)
    rp = r - off_r
    lv = jnp.take(loc.reshape(-1), blk * V + jnp.minimum(rp, V - 1))
    ids = jnp.where((r < n) & (rp < V) & (lv >= 0), blk * V + lv, -1)
    return ids, n


def _pack_left_rows_kernel(RBLK: int, V: int, mask_ref, loc_ref):
    """Standalone pack-left over [RBLK, V] int32 mask blocks (see
    ``_pack_left``); used for triangle-soup compaction."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (RBLK, V), 1)
    loc_ref[...] = _pack_left(mask_ref[...] > 0, lane, V)


def _pack_left_rows(mask2d, interpret: bool):
    """Per-row pack-left tables for an [NB, 512] int32 mask (rows padded to
    the 64-row grid block in the caller's shape are fine: all-zero rows
    produce loc = -1 and count 0)."""
    NB, V = mask2d.shape
    RBLK = 64
    pad = (-NB) % RBLK
    if pad:
        mask2d = jnp.concatenate(
            [mask2d, jnp.zeros((pad, V), mask2d.dtype)], 0)
    loc = pl.pallas_call(
        partial(_pack_left_rows_kernel, RBLK, V),
        grid=((NB + pad) // RBLK,),
        in_specs=[pl.BlockSpec((RBLK, V), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((RBLK, V), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((NB + pad, V), jnp.int32),
        interpret=interpret,
    )(mask2d)
    return loc[:NB] if pad else loc


def _pack_left(ok, lane, V: int):
    """In-kernel stable stream compaction along lanes: returns loc where
    loc[k, r] = lane index of the r-th set lane of ok[k] (-1 padded).

    Butterfly pack: exclusive-prefix ranks give each active lane a
    displacement d = lane - rank (monotone non-decreasing over active
    lanes), which is retired one power of two per round, low bit first —
    monotonicity guarantees a mover never lands on a lane that still holds
    an element (the classic SIMD compaction; scatter-free, so it replaces
    XLA's per-element scatter, ~4.6 ns/elem on this TPU, bench/mc_trace)."""
    inc = ok.astype(jnp.int32)
    cs = inc
    sh = 1
    while sh < V:
        cs = cs + jnp.where(lane >= sh, pltpu.roll(cs, sh, 1), 0)
        sh *= 2
    d = lane - (cs - inc)                   # displacement of active lanes
    data = jnp.where(ok, lane, -1)
    act = inc
    j = 0
    while (1 << j) < V:
        s = 1 << j
        # circular wrap is benign: a wrapped source lane m = l+s-V has
        # d <= m < 2^j, whose bit j is necessarily clear
        data_r = pltpu.roll(data, V - s, 1)
        d_r = pltpu.roll(d, V - s, 1)
        act_r = pltpu.roll(act, V - s, 1)
        take = (act_r > 0) & (((d_r >> j) & 1) > 0)
        leave = (act > 0) & (((d >> j) & 1) > 0)
        data = jnp.where(take, data_r, jnp.where(leave, -1, data))
        d = jnp.where(take, d_r - s, d)
        act = jnp.where(take, 1, jnp.where(leave, 0, act))
        j += 1
    return jnp.where(act > 0, data, -1)


def _corner_halo_kernel(min_weight: float, KBLK: int, V: int, res: tuple,
                        coords_ref, dall_ref, wall_ref,
                        dstack_ref, ok_ref, loc_ref):
    """Per-block corner-stack assembly in VMEM via lane rolls.

    ``dall_ref``/``wall_ref``: [8, KBLK, V] — plane 0 is each brick's own
    block, planes 1..7 the +1-neighbor bricks per ``_NBR_BITS`` (pre-gathered
    rows; out-of-range neighbors filled with d=-1 / w=0). Lane index encodes
    (x, y, z) as x*64 + y*8 + z within the 8^3 brick, so the voxel at
    local+(0,0,1) is a lane roll by -1 with the z=7 boundary patched from the
    +z neighbor's z=0 face (roll by +7) — and corner offsets compose the
    x/y/z shifts, sourcing edge/corner neighbors for the far boundaries.
    Replaces the XLA concat-tree (≈190 reshape/copy dispatches ≈ 6.5 ms at
    KB=1024, bench/mc_trace) with one kernel pass.

    Outputs: ``dstack_ref`` [8, KBLK, V] — corner c's normalized d in PCL
    corner order; ``ok_ref`` [KBLK, V] int32: all 8 corners valid
    (w >= min_weight, |d| < 1), a sign change straddles the cube, AND the
    cube's lower corner is an interior voxel (``coords_ref`` [KBLK, 4]
    carries each brick's coords, -1 rows for dead slots); ``loc_ref``
    [KBLK, V] int32: per-brick pack-left of ok (r-th active cube's local
    voxel id, -1 padded) so the caller's global compaction is offsets +
    gathers instead of a 393k-element scatter."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (KBLK, V), 1)
    at_x = (lane // 64) == 7
    at_y = ((lane // 8) % 8) == 7
    at_z = (lane % 8) == 7

    # pltpu.roll(a, s)[i] = a[(i - s) mod V] and requires s >= 0, so the
    # "+1 voxel" reads are rolls by V - {1, 8, 64}
    def s_z(a, az):
        return jnp.where(at_z, pltpu.roll(az, 7, 1), pltpu.roll(a, V - 1, 1))

    def s_y(a, ay):
        return jnp.where(at_y, pltpu.roll(ay, 56, 1), pltpu.roll(a, V - 8, 1))

    def s_x(a, ax):
        return jnp.where(at_x, pltpu.roll(ax, 448, 1),
                         pltpu.roll(a, V - 64, 1))

    def corners(ref):
        own = ref[0]
        nx, ny, nz = ref[1], ref[2], ref[3]
        nxy, nxz, nyz, nxyz = ref[4], ref[5], ref[6], ref[7]
        sz_o, sz_x = s_z(own, nz), s_z(nx, nxz)
        sz_y, sz_xy = s_z(ny, nyz), s_z(nxy, nxyz)
        sy_o, sy_x = s_y(own, ny), s_y(nx, nxy)
        c011 = s_y(sz_o, sz_y)
        # CORNER_OFFSETS (PCL) order
        return [own, s_x(own, nx), s_x(sz_o, sz_x), sz_o,
                sy_o, s_x(sy_o, sy_x), s_x(c011, s_y(sz_x, sz_xy)), c011]

    dcs = corners(dall_ref)
    wcs = corners(wall_ref)
    corner_ok = (wcs[0] >= min_weight) & (jnp.abs(dcs[0]) < 1.0)
    for dc, wc in zip(dcs[1:], wcs[1:]):
        corner_ok &= (wc >= min_weight) & (jnp.abs(dc) < 1.0)
    neg = dcs[0] < 0.0
    pos = dcs[0] >= 0.0
    for dc in dcs[1:]:
        neg |= dc < 0.0
        pos |= dc >= 0.0
    for c in range(8):
        dstack_ref[c] = dcs[c]

    # interior filter (marching_cubes_tsdf_octree.cpp:199-202); dead slots
    # carry coords -1 so every cube fails vx >= 1
    xr, yr, zr = res
    vx = jnp.broadcast_to(coords_ref[:, 0:1] * 8, (KBLK, V)) + lane // 64
    vy = jnp.broadcast_to(coords_ref[:, 1:2] * 8, (KBLK, V)) + (lane // 8) % 8
    vz = jnp.broadcast_to(coords_ref[:, 2:3] * 8, (KBLK, V)) + lane % 8
    interior = ((vx >= 1) & (vx < xr - 1) & (vy >= 1) & (vy < yr - 1)
                & (vz >= 1) & (vz < zr - 1))
    ok = corner_ok & neg & pos & interior
    ok_ref[...] = ok.astype(jnp.int32)
    loc_ref[...] = _pack_left(ok, lane, V)


def _corner_stacks_pallas(bv, slots, min_weight: float, interpret: bool):
    """Pallas-kernel corner stacks: same contract as ``_corner_stacks`` plus
    a per-brick pack-left table, but the halo assembly runs on-chip
    (requires brick_size == 8 and the brick budget divisible by the
    64-brick block). Neighbor blocks are fetched with ONE row gather per
    field (8K rows) instead of 7 strided face slices of the full capacity
    array. Returns (dstack, cube_ok, loc [K, V], coords, slot_live)."""
    B = bv.brick_size
    V = B * B * B
    K = slots.shape[0]
    C = bv.capacity
    KBLK = 64
    cfg = bv.config
    coords = jnp.take(bv.coords, jnp.minimum(slots, C - 1), axis=0)
    slot_live = (slots < C) & (coords[:, 0] >= 0)
    nbx, nby, nbz = bv.bricks_per_axis
    bmap_flat = bv.brick_map.reshape(-1)

    planes = [slots]
    for bits in _NBR_BITS:
        nc = coords + jnp.asarray(bits, jnp.int32)
        ok = slot_live & (nc[:, 0] < nbx) & (nc[:, 1] < nby) & (nc[:, 2] < nbz)
        blin = (nc[:, 0] * nby + nc[:, 1]) * nbz + nc[:, 2]
        nslot = jnp.take(bmap_flat, jnp.clip(blin, 0, nbx * nby * nbz - 1),
                         mode="clip")
        planes.append(jnp.where(ok & (nslot >= 0), nslot, C))
    idx_all = jnp.stack(planes, 0).reshape(-1)               # [8K]
    dall = jnp.take(bv.sdf.reshape(C, V), idx_all, axis=0, mode="fill",
                    fill_value=-1.0).reshape(8, K, V)
    wall = jnp.take(bv.weight.reshape(C, V), idx_all, axis=0, mode="fill",
                    fill_value=0.0).reshape(8, K, V)
    coords_k = jnp.where(slot_live[:, None], coords, -1)
    coords4 = jnp.concatenate([coords_k,
                               jnp.zeros((K, 1), jnp.int32)], 1)  # lane pad

    dstack8, ok, loc = pl.pallas_call(
        partial(_corner_halo_kernel, min_weight, KBLK, V,
                (cfg.xres, cfg.yres, cfg.zres)),
        grid=(K // KBLK,),
        in_specs=[pl.BlockSpec((KBLK, 4), lambda i: (i, 0)),
                  pl.BlockSpec((8, KBLK, V), lambda i: (0, i, 0)),
                  pl.BlockSpec((8, KBLK, V), lambda i: (0, i, 0))],
        out_specs=[pl.BlockSpec((8, KBLK, V), lambda i: (0, i, 0)),
                   pl.BlockSpec((KBLK, V), lambda i: (i, 0)),
                   pl.BlockSpec((KBLK, V), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((8, K, V), jnp.float32),
                   jax.ShapeDtypeStruct((K, V), jnp.int32),
                   jax.ShapeDtypeStruct((K, V), jnp.int32)],
        interpret=interpret,
    )(coords4, dall, wall)
    dstack = dstack8.transpose(1, 2, 0).reshape(K * V, 8)
    return dstack, ok > 0, loc, coords, slot_live


def _uses_corner_kernel(corner_engine: str, brick_size: int,
                        brick_budget: int) -> bool:
    return (corner_engine != "xla" and brick_size == 8
            and brick_budget % 64 == 0)


def _uses_kernel_emit(corner_engine: str, brick_size: int, brick_budget: int,
                      cube_budget: int) -> bool:
    # the pack-left tri compaction reshapes the [cube_budget * MAX] mask to
    # 512 lanes; callers with odd custom budgets fall back to emit+compact
    return (_uses_corner_kernel(corner_engine, brick_size, brick_budget)
            and (cube_budget * MAX_TRIS_PER_CUBE) % 512 == 0)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _marching_cubes_brick_chunk(bv, stats, slot0, n_slots: int,
                                cube_budget: int, brick_budget: int,
                                min_weight: float, color_by_rgb: bool,
                                color_by_confidence: bool,
                                corner_engine: str = "xla",
                                tri_budget: int = 0):
    """Triangles for cubes whose lower-corner voxel lies in bricks
    [slot0, slot0 + n_slots). Every voxel belongs to exactly one brick, so
    chunks never duplicate cubes. `stats` is the `_brick_stats` pair.
    Returns (MeshSoup, brick_overflow, n_cubes, n_bricks).

    Compaction is two-level — CANDIDATE bricks first (per-brick valid-d range
    combined over the 7 (+1)-neighbors straddles 0: a provable superset of
    bricks containing active cubes, since every active cube's 8 corners are
    valid voxels of exactly those bricks), then the exact per-cube filter +
    compaction over only those bricks — so both the corner-stack assembly
    and the cumsum/scatter cost scale with the crossing SET, not the full
    chunk grid."""
    from ..activation import _compact

    cfg = bv.config
    B = bv.brick_size
    V = B * B * B
    K = n_slots
    C = bv.capacity
    dmin, dmax = stats

    # ---- candidate bricks (pre-filter on per-brick stats) ----------------
    slots_self = slot0 + jnp.arange(K, dtype=jnp.int32)
    coords_k = jax.lax.dynamic_slice(bv.coords, (slot0, 0), (K, 3))
    live_k = coords_k[:, 0] >= 0
    nbx, nby, nbz = bv.bricks_per_axis
    bmap_flat = bv.brick_map.reshape(-1)
    mn = jnp.take(dmin, slots_self)
    mx = jnp.take(dmax, slots_self)
    has_own = mn < jnp.inf  # the cube's lower corner lies in this brick
    for bits in [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0),
                 (1, 0, 1), (0, 1, 1), (1, 1, 1)]:
        nc = coords_k + jnp.asarray(bits, jnp.int32)
        ok = live_k & (nc[:, 0] < nbx) & (nc[:, 1] < nby) & (nc[:, 2] < nbz)
        blin = (nc[:, 0] * nby + nc[:, 1]) * nbz + nc[:, 2]
        nslot = jnp.take(bmap_flat, jnp.clip(blin, 0, nbx * nby * nbz - 1),
                         mode="clip")
        nslot = jnp.where(ok & (nslot >= 0), nslot, C)  # C row stays inf
        mn = jnp.minimum(mn, jnp.take(dmin, nslot))
        mx = jnp.maximum(mx, jnp.take(dmax, nslot))
    cand = live_k & has_own & (mn < 0.0) & (mx >= 0.0)

    KB = brick_budget
    bidx, n_bricks = _compact(cand, slots_self, KB)            # global slots
    brick_ovf = n_bricks > KB
    cand_slots = jnp.where(bidx >= 0, bidx, C)

    # ---- exact cube filter over candidates only --------------------------
    if _uses_corner_kernel(corner_engine, B, KB):
        dstack, cube_ok, loc, coords, slot_live = _corner_stacks_pallas(
            bv, cand_slots, min_weight, corner_engine == "interpret")
        idx2, n_cubes = _compact_from_loc(cube_ok, loc, cube_budget)
    else:
        dstack, cube_ok, coords, slot_live = _corner_stacks(bv, cand_slots,
                                                            min_weight)
        idx2, n_cubes = _compact(cube_ok.reshape(-1),
                                 jnp.arange(KB * V, dtype=jnp.int32),
                                 cube_budget)
    ok2 = idx2 >= 0
    i2 = jnp.maximum(idx2, 0)
    s = i2 // V                           # candidate row of each cube
    within = i2 % V

    vals = jnp.take(dstack, i2, axis=0) \
        * cfg.max_dist_neg                                     # [Nc, 8] meters
    lx, ly, lz = within // (B * B), (within // B) % B, within % B
    cs = jnp.take(coords, s, axis=0)
    cvx = cs[:, 0] * B + lx
    cvy = cs[:, 1] * B + ly
    cvz = cs[:, 2] * B + lz

    center_rgb = None
    if color_by_rgb and bv.color is not None:
        nch = bv.color.shape[-1]
        cblk = jnp.take(bv.color.reshape(C, V, nch), cand_slots, axis=0,
                        mode="fill", fill_value=0.0).reshape(KB * V, nch)
        vox_col = jnp.take(cblk, i2, axis=0)
        r, g, bl = color_ops.color_to_rgb(cfg.color_mode, vox_col)
        center_rgb = jnp.stack([r, g, bl], -1)
    elif color_by_confidence:
        wblk = jnp.take(bv.weight.reshape(C, V), cand_slots, axis=0,
                        mode="fill", fill_value=0.0).reshape(KB * V)
        wv = jnp.take(wblk, i2)
        std_dev = (100.0 - wv) / 100.0
        r = jnp.clip((1.0 - std_dev) * 255.0, 0.0, 255.0)
        bb = jnp.clip(std_dev * 255.0, 0.0, 255.0)
        center_rgb = jnp.stack([r, jnp.zeros_like(r), bb], -1)

    if tri_budget and _uses_kernel_emit(corner_engine, B, KB, cube_budget):
        soup = _emit_soup_compacted(cfg, bv.global_transform, cvx, cvy, cvz,
                                    vals, ok2, center_rgb,
                                    n_cubes > cube_budget, tri_budget,
                                    corner_engine == "interpret")
    else:
        soup = _emit_soup(cfg, bv.global_transform, cvx, cvy, cvz, vals, ok2,
                          center_rgb, n_cubes > cube_budget)
    return soup, brick_ovf, n_cubes, n_bricks


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def _extract_chunk_compact(bv, stats, slot0, n_slots: int, cube_budget: int,
                           brick_budget: int, tri_budget: int,
                           min_weight: float, color_by_rgb: bool,
                           color_by_confidence: bool,
                           corner_engine: str = "xla"):
    """One-dispatch chunk extraction: chunk + in-jit soup compaction to a
    fixed [tri_budget] buffer. Blocking host syncs cost ~30 ms each through
    the TPU tunnel (bench/mc_probe4) and even ASYNC per-op dispatch costs
    1-6 ms (bench/mc_probe8), so the whole chunk pipeline INCLUDING the
    MeshSoup field glue runs as a single dispatch; single-chunk unchecked
    extraction issues no further device ops.

    Returns (verts [T,3,3], cols [T,3,3] | None, tri_valid [T] bool,
    n_tris i32, any_ovf bool, out [6] int32: n_tris, cube_ovf, brick_ovf,
    tri_ovf, n_cubes, n_bricks)."""
    soup, brick_ovf, n_cubes, n_bricks = _marching_cubes_brick_chunk(
        bv, stats, slot0, n_slots, cube_budget, brick_budget, min_weight,
        color_by_rgb, color_by_confidence, corner_engine, tri_budget)
    if _uses_kernel_emit(corner_engine, bv.brick_size, brick_budget,
                         cube_budget):
        verts, cols = soup.vertices, soup.colors  # already compacted
    else:
        verts, cols = _compact_soup(soup, tri_budget)
    n = soup.num_triangles
    out = jnp.stack([n, soup.overflowed.astype(jnp.int32),
                     brick_ovf.astype(jnp.int32),
                     (n > tri_budget).astype(jnp.int32),
                     n_cubes.astype(jnp.int32), n_bricks.astype(jnp.int32)])
    tv = jnp.arange(verts.shape[0], dtype=jnp.int32) < n
    any_ovf = jnp.sum(out[1:4]) > 0
    return verts, cols, tv, n, any_ovf, out


@partial(jax.jit, static_argnums=(1,))
def _chunk_liveness(coords, nchunks: int):
    return jnp.any((coords[:, 0] >= 0).reshape(nchunks, -1), axis=1)


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
                        cube_budget: int = 1 << 15,
                        tri_budget: Optional[int] = None,
                        live_chunks: Optional[list] = None,
                        budget_hint: Optional[list] = None,
                        check: bool = True,
                        corner_engine: Optional[str] = None) -> MeshSoup:
    """Device-level brick-native extraction: chunks over allocated bricks,
    each chunk one async dispatch producing a device-compacted [tri_budget]
    soup; ONE final readback collects counts/overflow flags. Chunks whose
    crossing-brick/cube/triangle counts exceed their budgets are re-run with
    doubled budgets (recompile per new power-of-two, then cached).

    `live_chunks` (list of chunk start slots) skips the liveness readback —
    pass the previous extraction's `soup.live_chunks` when the active set is
    unchanged, or compute once per trajectory segment. `budget_hint` (the
    previous soup's `.budget_hint`, aligned with live_chunks) sizes each
    chunk's (cube, brick, tri) budgets to the measured counts — padding work
    scales with the actual crossing set instead of the default budgets.

    `check=False` skips the overflow-retry sync entirely (ZERO host
    round-trips — fully async): the soup keeps fixed per-chunk buffers,
    `tri_valid` is a (non-prefix) mask, and `num_triangles` / `overflowed`
    stay on device. Use after one checked call has established sufficient
    budgets; callers MUST check `overflowed` before trusting the result.
    """
    if corner_engine is None:
        # the halo kernel replaces the XLA concat-tree on real accelerators;
        # CPU keeps the XLA path (interpret-mode pallas is grid-serial slow).
        # Gate on where the volume actually lives — jax.devices() reports the
        # axon TPU even when placement is pinned to CPU (tests/conftest.py)
        plats = {d.platform for d in bv.sdf.devices()}
        corner_engine = "xla" if plats <= {"cpu"} else "pallas"
    chunk_slots = min(chunk_slots, bv.capacity)
    while bv.capacity % chunk_slots:  # chunks must tile the slot range exactly
        chunk_slots //= 2
    if tri_budget is None:
        tri_budget = cube_budget * 2
    if live_chunks is None:
        nchunks = bv.capacity // chunk_slots
        if nchunks == 1:
            live_chunks = [0]
        else:
            lv = np.asarray(_chunk_liveness(bv.coords, nchunks))
            live_chunks = [i * chunk_slots for i in range(nchunks) if lv[i]] or [0]

    bstats = _brick_stats(bv, tuple(live_chunks), chunk_slots, min_weight)
    kb0 = min(chunk_slots, max(256, cube_budget // 64))
    if budget_hint is not None and len(budget_hint) != len(live_chunks):
        # zip() would silently drop live chunks past the shorter list —
        # triangles would go missing with overflowed=False
        raise ValueError(
            f"budget_hint has {len(budget_hint)} entries for "
            f"{len(live_chunks)} live chunks; pass the live_chunks the hint "
            f"was measured on alongside it")
    budgets = (budget_hint if budget_hint is not None
               else [(cube_budget, kb0, tri_budget)] * len(live_chunks))
    if not check:
        outs = [_extract_chunk_compact(bv, bstats, jnp.int32(s0), chunk_slots,
                                       cb, kb, tb, min_weight, color_by_rgb,
                                       color_by_confidence, corner_engine)
                for s0, (cb, kb, tb) in zip(live_chunks, budgets)]
        # single-chunk: every MeshSoup field comes straight out of the one
        # chunk dispatch — no further device ops on the repeat path
        v_all = (outs[0][0] if len(outs) == 1
                 else jnp.concatenate([o[0] for o in outs], 0))
        c_all = (None if outs[0][1] is None else
                 (outs[0][1] if len(outs) == 1
                  else jnp.concatenate([o[1] for o in outs], 0)))
        tv = (outs[0][2] if len(outs) == 1
              else jnp.concatenate([o[2] for o in outs], 0))
        n_tot = outs[0][3] if len(outs) == 1 else sum(o[3] for o in outs)
        ovf = outs[0][4] if len(outs) == 1 else sum(
            o[4].astype(jnp.int32) for o in outs) > 0
        return MeshSoup(vertices=v_all, colors=c_all, tri_valid=tv,
                        num_triangles=n_tot, overflowed=ovf,
                        live_chunks=tuple(live_chunks),
                        budget_hint=tuple(budgets))

    def roundup(n, step, lo):
        # finer-than-pow2 budget grid: every stage's work scales with the
        # budget (bench/mc_probe7: 514 bricks padded to a pow2 1024 cost
        # +25% wall), so pad to `step` multiples; recompiles cache per size
        return max(lo, (int(n) + step - 1) // step * step)

    pending = [(s0, cb, kb, tb) for s0, (cb, kb, tb) in zip(live_chunks, budgets)]
    verts, cols, counts = [], [], []
    hints = {}
    while pending:
        batch = pending
        pending = []
        out = [(s0, cb, kb, tb,
                _extract_chunk_compact(bv, bstats, jnp.int32(s0), chunk_slots,
                                       cb, kb, tb, min_weight, color_by_rgb,
                                       color_by_confidence, corner_engine))
               for (s0, cb, kb, tb) in batch]
        # ONE sync for the whole batch
        stats = np.asarray(jnp.stack([o[4][5] for o in out]))
        for (s0, cb, kb, tb, (v, c, _, _n, _o, _st)), st in zip(out, stats):
            n, cube_ovf, brick_ovf, tri_ovf, n_cubes, n_bricks = (int(x) for x in st)
            if brick_ovf:
                pending.append((s0, cb, min(chunk_slots, kb * 2), tb))
            elif cube_ovf:
                pending.append((s0, cb * 2, kb, tb))
            elif tri_ovf:
                pending.append((s0, cb, kb, tb * 2))
            else:
                # tight budgets (25% headroom) for subsequent unchecked calls
                hints[s0] = (roundup(n_cubes * 5 // 4, 1 << 12, 1 << 10),
                             min(chunk_slots,
                                 roundup(n_bricks * 5 // 4, 128, 256)),
                             roundup(n * 5 // 4, 1 << 12, 1 << 11))
                if n:
                    verts.append(v[:n])
                    if c is not None:
                        cols.append(c[:n])
                    counts.append(n)
    total = int(sum(counts))
    if not verts:
        z = jnp.zeros((0, 3, 3), jnp.float32)
        return MeshSoup(vertices=z,
                        colors=(z if color_by_rgb or color_by_confidence
                                else None),
                        tri_valid=jnp.zeros((0,), bool),
                        num_triangles=jnp.int32(0),
                        overflowed=jnp.asarray(False),
                        live_chunks=tuple(live_chunks),
                        budget_hint=tuple(
                            hints.get(s0, (cube_budget, kb0, tri_budget))
                            for s0 in live_chunks))
    v_all = verts[0] if len(verts) == 1 else jnp.concatenate(verts, 0)
    c_all = (None if not cols
             else (cols[0] if len(cols) == 1 else jnp.concatenate(cols, 0)))
    return MeshSoup(vertices=v_all, colors=c_all,
                    tri_valid=jnp.arange(v_all.shape[0]) < total,
                    num_triangles=jnp.int32(total),
                    overflowed=jnp.asarray(False),
                    live_chunks=tuple(live_chunks),
                    budget_hint=tuple(
                        hints.get(s0, (cube_budget, kb0, tri_budget))
                        for s0 in live_chunks))
