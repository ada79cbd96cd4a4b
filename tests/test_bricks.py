"""Brick-sparse volume tests: allocation, integrate parity with dense,
rendering, conversion, field queries, overflow reporting."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import TSDFConfig, integrate, make_volume, render_view
from cpu_tsdf_tpu.bricks import (BrickVolume, from_dense, gather_dw, integrate_bricks,
                                 make_brick_volume, to_dense)
from cpu_tsdf_tpu.ops.interpolate import fxn_gradient_hessian_vol, tsdf_value_vol
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose


@pytest.fixture
def scene(small_cfg):
    cfg = small_cfg
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    return cfg, pose, depth


def test_brick_integrate_matches_dense_in_band(scene):
    """Allocated brick voxels must match the dense fusion exactly; every
    dense in-band update must land in an allocated brick."""
    cfg, pose, depth = scene
    dense = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    assert not bool(bv.overflowed)
    bd = to_dense(bv)

    w_dense = np.asarray(dense.weight)
    d_dense = np.asarray(dense.sdf)
    w_brick = np.asarray(bd.weight)
    d_brick = np.asarray(bd.sdf)

    # every in-band dense observation (|d|<1 strictly inside the truncation
    # band) must be reproduced bit-for-bit by the brick path
    band = (w_dense > 0) & (np.abs(d_dense) < 0.999)
    assert band.sum() > 500
    # identical math, but separate compilations may fuse f32 ops differently
    np.testing.assert_allclose(d_brick[band], d_dense[band], atol=2e-5)
    np.testing.assert_array_equal(w_brick[band], w_dense[band])
    # brick voxels never contain observations the dense path lacks
    extra = (w_brick > 0) & (w_dense == 0)
    assert extra.sum() == 0


def test_brick_multiframe(scene):
    cfg, pose, depth = scene
    pose2 = tilted_pose(tx=0.063, ty=0.041, tz=-0.88)
    dense = make_volume(cfg)
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    for p in (pose, pose2):
        dense = integrate(dense, jnp.asarray(depth), jnp.asarray(p, jnp.float32))
        bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(p, jnp.float32))
    bd = to_dense(bv)
    band = (np.asarray(dense.weight) > 0) & (np.abs(np.asarray(dense.sdf)) < 0.999)
    np.testing.assert_allclose(np.asarray(bd.sdf)[band], np.asarray(dense.sdf)[band],
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(bd.weight)[band], np.asarray(dense.weight)[band])


def test_brick_render_matches_dense(scene):
    """Rendering a brick volume reproduces the dense render wherever the
    pre-crossing approach stays inside allocated bricks."""
    cfg, pose, depth = scene
    dense = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    rd = render_view(dense, pose)
    rb = render_view(bv, pose)
    dd, db = np.asarray(rd.depth), np.asarray(rb.depth)
    both = ~np.isnan(dd) & ~np.isnan(db)
    assert both.sum() > 0.8 * (~np.isnan(dd)).sum()
    np.testing.assert_allclose(db[both], dd[both], atol=2e-3)


def test_roundtrip_from_dense(scene):
    cfg, pose, depth = scene
    dense = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    bv = from_dense(dense, brick_size=8)
    back = to_dense(bv)
    obs = np.asarray(dense.weight) > 0
    np.testing.assert_array_equal(np.asarray(back.sdf)[obs], np.asarray(dense.sdf)[obs])
    np.testing.assert_array_equal(np.asarray(back.weight), np.asarray(dense.weight))


def test_gather_dw_unallocated_is_unobserved(small_cfg):
    bv = make_brick_volume(small_cfg, brick_size=8, capacity=64)
    d, w = gather_dw(bv, jnp.asarray([5]), jnp.asarray([5]), jnp.asarray([5]))
    assert float(d[0]) == -1.0 and float(w[0]) == 0.0


def test_field_queries_on_bricks(scene):
    cfg, pose, depth = scene
    dense = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    bv = from_dense(dense, brick_size=8)
    rng = np.random.RandomState(0)
    # points near the sphere surface (volume frame): sphere center ~ (0,0,0)
    pts = rng.uniform(-0.25, 0.25, size=(50, 3)).astype(np.float32)
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True) * 0.3
    vd, okd = tsdf_value_vol(dense, pts[:, 0], pts[:, 1], pts[:, 2])
    vb, okb = tsdf_value_vol(bv, pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_array_equal(np.asarray(okd), np.asarray(okb))
    sel = np.asarray(okd)
    np.testing.assert_allclose(np.asarray(vd)[sel], np.asarray(vb)[sel], atol=1e-6)
    _, gd, _, _ = fxn_gradient_hessian_vol(dense, pts[:, 0], pts[:, 1], pts[:, 2])
    _, gb, _, _ = fxn_gradient_hessian_vol(bv, pts[:, 0], pts[:, 1], pts[:, 2])
    sel3 = sel[:, None] & np.isfinite(np.asarray(gd))
    np.testing.assert_allclose(np.asarray(gb)[sel3], np.asarray(gd)[sel3], atol=1e-4)


def test_capacity_overflow_flag(scene):
    cfg, pose, depth = scene
    bv = make_brick_volume(cfg, brick_size=8, capacity=8)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    assert bool(bv.overflowed)
    assert int(bv.n_active) <= 8


def test_update_budget_overflow(scene):
    cfg, pose, depth = scene
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32),
                          update_budget=4)
    assert bool(bv.overflowed)


def test_brick_count_reasonable(scene):
    """Active bricks ~ surface shell, far below the dense brick count."""
    cfg, pose, depth = scene
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    n = int(bv.n_active)
    total = (cfg.xres // 8) ** 3
    assert 0 < n < total // 2, (n, total)


def test_brick_marching_cubes_matches_dense(scene):
    """Brick-native MC (no dense materialization) == dense MC vertex sets."""
    from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh

    cfg, pose, depth = scene
    dense = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    bv = from_dense(dense, brick_size=8)
    v1, f1, _ = extract_mesh(dense, min_weight=0.5)
    v2, f2, _ = extract_mesh(bv, min_weight=0.5)
    assert len(f1) == len(f2)
    s1 = np.sort(np.round(v1, 5).reshape(-1))
    s2 = np.sort(np.round(v2, 5).reshape(-1))
    np.testing.assert_allclose(s1, s2, atol=1e-5)


def test_brick_mc_confidence_colors(scene):
    from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh

    cfg, pose, depth = scene
    dense = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    bv = from_dense(dense, brick_size=8)
    v2, f2, c2 = extract_mesh(bv, min_weight=0.5, color_by_confidence=True)
    assert c2 is not None and len(c2) == len(v2)
    assert (c2[:, 2] > 200).all()  # w=1 -> mostly blue


def test_num_random_splits_jitter(scene):
    """num_random_splits > 1 activates extra jittered bricks
    (hpp:69-88: per-pixel noise of magnitude <= 0.03 m), deterministically
    under a fixed key, as a superset of the un-jittered activation."""
    import jax

    cfg, pose, depth = scene
    cfgj = dataclasses.replace(cfg, num_random_splits=3)
    b1 = make_brick_volume(cfg, brick_size=8, capacity=2048)
    b1 = integrate_bricks(b1, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    bj = make_brick_volume(cfgj, brick_size=8, capacity=2048)
    bj = integrate_bricks(bj, jnp.asarray(depth), jnp.asarray(pose, jnp.float32),
                          split_key=jax.random.PRNGKey(7))
    m1 = np.asarray(b1.brick_map) >= 0
    mj = np.asarray(bj.brick_map) >= 0
    assert (m1 & ~mj).sum() == 0          # superset
    assert mj.sum() >= m1.sum()
    # deterministic under the same key
    bj2 = make_brick_volume(cfgj, brick_size=8, capacity=2048)
    bj2 = integrate_bricks(bj2, jnp.asarray(depth), jnp.asarray(pose, jnp.float32),
                           split_key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(bj.brick_map), np.asarray(bj2.brick_map))
    # fusion values on the original band are unchanged (jitter only splits)
    band1 = to_dense(b1)
    bandj = to_dense(bj)
    obs = np.asarray(band1.weight) > 0
    np.testing.assert_array_equal(np.asarray(bandj.sdf)[obs],
                                  np.asarray(band1.sdf)[obs])


def test_brick_extraction_budget_retry(scene):
    """A too-small cube budget triggers the automatic doubling retry and
    still produces the full mesh."""
    from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh_bricks

    cfg, pose, depth = scene
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    v1, f1, _ = extract_mesh_bricks(bv, min_weight=0.5)
    v2, f2, _ = extract_mesh_bricks(bv, min_weight=0.5, cube_budget=64)
    assert len(f1) == len(f2) > 100
    s1 = set(map(tuple, np.round(v1 * 1e6).astype(np.int64)))
    s2 = set(map(tuple, np.round(v2 * 1e6).astype(np.int64)))
    assert s1 == s2


def test_brick_extraction_budget_hint_unchecked(scene):
    """The checked pass returns tight per-chunk budget hints; an unchecked
    extraction with those hints yields the identical triangle set."""
    from cpu_tsdf_tpu.ops.marching_cubes import extract_soup_bricks

    cfg, pose, depth = scene
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    s1 = extract_soup_bricks(bv, min_weight=0.5)
    assert s1.budget_hint and all(len(b) == 3 for b in s1.budget_hint)
    s2 = extract_soup_bricks(bv, min_weight=0.5, live_chunks=s1.live_chunks,
                             budget_hint=s1.budget_hint, check=False)
    assert not bool(s2.overflowed)
    v1, f1, _ = s1.to_numpy()
    v2, f2, _ = s2.to_numpy()
    assert len(f1) == len(f2) > 100
    a = set(map(tuple, np.round(v1 * 1e6).astype(np.int64)))
    b = set(map(tuple, np.round(v2 * 1e6).astype(np.int64)))
    assert a == b


def test_brick_extraction_pallas_corner_parity(scene):
    """The Pallas halo corner + pack-left kernels (interpret mode on CPU)
    produce the same triangles, in the same cube-major order, as the XLA
    concat-tree + scatter-compaction path (1-ulp tolerance: the SoA
    compact-then-emit computes the identical interpolation through a
    differently-shaped graph, so FMA contraction may differ)."""
    from cpu_tsdf_tpu.ops.marching_cubes import extract_soup_bricks

    cfg, pose, depth = scene
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    sx = extract_soup_bricks(bv, min_weight=0.5, corner_engine="xla")
    sp = extract_soup_bricks(bv, min_weight=0.5, corner_engine="interpret")
    assert int(sx.num_triangles) == int(sp.num_triangles) > 100
    vx = np.asarray(sx.vertices)[np.asarray(sx.tri_valid)]
    vp = np.asarray(sp.vertices)[np.asarray(sp.tri_valid)]
    np.testing.assert_allclose(vx, vp, atol=1e-6)


def test_brick_extraction_kernel_emit_budget_retry(scene):
    """Triangle-budget overflow on the kernel (compact-then-emit) path must
    retry with doubled budgets and produce the full mesh."""
    from cpu_tsdf_tpu.ops.marching_cubes import extract_soup_bricks

    cfg, pose, depth = scene
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    sref = extract_soup_bricks(bv, min_weight=0.5, corner_engine="interpret")
    n = int(sref.num_triangles)
    assert n > 512
    stight = extract_soup_bricks(bv, min_weight=0.5, tri_budget=512,
                                 corner_engine="interpret")
    assert int(stight.num_triangles) == n
    assert not bool(stight.overflowed)
    va = np.asarray(sref.vertices)[np.asarray(sref.tri_valid)]
    vb = np.asarray(stight.vertices)[np.asarray(stight.tri_valid)]
    np.testing.assert_allclose(np.sort(va.reshape(-1, 9), axis=0),
                               np.sort(vb.reshape(-1, 9), axis=0), atol=1e-6)


def test_band_test_wide_fov_off_center_principal_point():
    """Camera-plane-straddling spheres take a cone fallback whose half-angle
    must cover the WIDER side of an off-center principal point: with
    fx + pcx < W/2, the old symmetric 0.5*W/fx bound culled spheres holding
    genuinely visible in-band voxels (silent observation loss in the brick
    engine). Crafted sphere: voxel at x/z = 2.65, inside the true FOV
    ((W-pcx)/fx = 2.7) but outside the symmetric bound (2.6)."""
    from cpu_tsdf_tpu.activation import _band_test, depth_mips

    cfg = TSDFConfig(
        xres=64, yres=64, zres=64, xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.06, max_dist_neg=0.06,
        min_sensor_dist=0.05, max_sensor_dist=3.0,
        image_width=640, image_height=480,
        focal_length_x=200.0, focal_length_y=200.0,
        principal_point_x=100.0, principal_point_y=240.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4)
    mips = depth_mips(jnp.full((480, 640), 0.1, jnp.float32))
    ok = _band_test(cfg, mips, jnp.asarray([0.4975]), jnp.asarray([0.0]),
                    jnp.asarray([0.05]), jnp.asarray([0.1]))
    assert bool(ok[0])


def test_carve_pass_matches_dense_on_disocclusion(small_cfg):
    """Allocated bricks re-observed as free space must keep receiving the
    reference's clamped d=+1 updates (hpp:189-196): frame 1 fuses a NEAR
    sphere (allocating its band bricks), frame 2 sees a FAR plane — the
    frame-1 bricks now sit in front of every depth, which band activation
    alone skips. Brick and dense volumes must agree exactly on every
    allocated voxel, including those carve updates."""
    from cpu_tsdf_tpu.synthetic import plane_depth

    cfg = small_cfg
    pose = jnp.asarray(tilted_pose(), jnp.float32)
    near = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.6),
                                    radius=0.2))
    far = jnp.asarray(plane_depth(cfg, z0=1.4))

    dense1 = integrate(make_volume(cfg), near, pose)
    f1 = np.asarray(dense1.weight) > 0  # voxels the near frame observed
    assert f1.sum() > 50

    dense = make_volume(cfg)
    bv = make_brick_volume(cfg, 8, 2048)
    for depth in (near, far):
        dense = integrate(dense, depth, pose)
        bv = integrate_bricks(bv, depth, pose, None, 1024)
    assert not bool(bv.overflowed)
    bd = to_dense(bv)
    alloc = np.asarray(bv.brick_map) >= 0
    B = bv.brick_size
    mask = np.repeat(np.repeat(np.repeat(alloc, B, 0), B, 1), B, 2)
    wd, wb = np.asarray(dense.weight), np.asarray(bd.weight)
    # frame 2 must have carved EVERY frame-1 voxel (they all sit in front of
    # the far plane and inside its frustum): w = 2 and sdf pushed toward +1
    np.testing.assert_array_equal(wd[f1], 2.0)
    np.testing.assert_array_equal(wb[f1], 2.0)
    assert (np.asarray(bd.sdf)[f1] > np.asarray(dense1.sdf)[f1] - 1e-6).all()
    # and the engines agree exactly on every allocated voxel
    np.testing.assert_array_equal(wb[mask], wd[mask])
    np.testing.assert_allclose(np.asarray(bd.sdf)[mask],
                               np.asarray(dense.sdf)[mask], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bd.nsample)[mask],
                                  np.asarray(dense.nsample)[mask])


def test_integrate_into_merged_sharded_volume():
    """Allocation is gap-aware: merge_sharded volumes have per-device slot
    gaps, where the old prefix assignment (slot = n_active + rank) mapped a
    new brick onto an already-occupied row, silently corrupting both."""
    import os
    import subprocess
    import sys

    script = r'''
import numpy as np, jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume, to_dense
from cpu_tsdf_tpu import TSDFConfig, integrate, make_volume
from cpu_tsdf_tpu.parallel import make_tsdf_mesh
from cpu_tsdf_tpu.parallel.bricks import integrate_bricks_sharded, make_sharded_brick_volume, merge_sharded
from cpu_tsdf_tpu.synthetic import sphere_depth

cfg = TSDFConfig(
    xres=64, yres=64, zres=64, xsize=1.6, ysize=1.6, zsize=1.6,
    max_dist_pos=0.06, max_dist_neg=0.06, min_sensor_dist=0.1,
    max_sensor_dist=3.0, image_width=40, image_height=30,
    focal_length_x=35.0, focal_length_y=35.0,
    principal_point_x=20.0, principal_point_y=15.0,
    max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4)
mesh = make_tsdf_mesh(jax.devices("cpu")[:2])
p1 = np.eye(4, dtype=np.float32); p1[:3, 3] = (0.013, 0.021, -0.9)
d1 = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
sb = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
sb = integrate_bricks_sharded(sb, d1, jnp.asarray(p1), mesh, update_budget=1024)
bv = merge_sharded(sb)
# second frame integrated into the MERGED (gapped) volume
p2 = np.eye(4, dtype=np.float32); p2[:3, 3] = (0.08, 0.0, -0.85)
d2 = jnp.asarray(sphere_depth(cfg, center=(-0.08, 0.0, 0.85), radius=0.3))
bv = integrate_bricks(bv, d2, jnp.asarray(p2), None, 1024)
assert not bool(bv.overflowed)
# every brick_map slot maps to a unique row whose coords match
bm = np.asarray(bv.brick_map)
slots = bm[bm >= 0]
assert len(slots) == len(np.unique(slots)), "row collision"
coords = np.asarray(bv.coords)
nb = bm.shape
for bidx in np.argwhere(bm >= 0)[:50]:
    s = bm[tuple(bidx)]
    assert (coords[s] == bidx).all(), (coords[s], bidx)
# field parity with a dense volume over both frames
dense = make_volume(cfg)
dense = integrate(dense, d1, jnp.asarray(p1))
dense = integrate(dense, d2, jnp.asarray(p2))
bd = to_dense(bv)
alloc = bm >= 0
mask = np.repeat(np.repeat(np.repeat(alloc, 8, 0), 8, 1), 8, 2)
np.testing.assert_array_equal(np.asarray(bd.weight)[mask],
                              np.asarray(dense.weight)[mask])
print("MERGED-INTEGRATE OK")
'''
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    r = subprocess.run([sys.executable, "-c", script], env=env, timeout=600,
                       capture_output=True, text=True,
                       cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert r.returncode == 0 and "MERGED-INTEGRATE OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])


def test_compact_chunked_matches_plain():
    """The chunk-gated two-level compaction must be BIT-identical to the
    plain budgeted compaction on every mask shape: empty, dense, live
    prefix (the production case), scattered, over-budget, and
    non-chunk-divisible lengths."""
    import numpy as np

    from cpu_tsdf_tpu.activation import _compact, _compact_chunked

    rng = np.random.default_rng(3)
    cases = []
    for C in (1000, 4096, 9000, 32768):
        cases.append(np.zeros(C, bool))
        cases.append(np.ones(C, bool))
        prefix = np.zeros(C, bool)
        prefix[: C // 7] = rng.uniform(size=C // 7) < 0.5
        cases.append(prefix)
        cases.append(rng.uniform(size=C) < 0.01)
    for mask in cases:
        C = mask.shape[0]
        ids = jnp.arange(C, dtype=jnp.int32) * 3 + 1
        for budget in (64, 512):
            a, na = _compact(jnp.asarray(mask), ids, budget)
            b, nb = _compact_chunked(jnp.asarray(mask), ids, budget,
                                     chunk=2048)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert int(na) == int(nb)


def test_integrate_sequence_matches_per_frame(small_cfg):
    """integrate_bricks_sequence (one compiled scan) must be BIT-equal to
    the per-frame loop, with and without color."""
    import numpy as np

    from cpu_tsdf_tpu.bricks import (integrate_bricks,
                                     integrate_bricks_sequence,
                                     make_brick_volume)
    from cpu_tsdf_tpu.synthetic import sphere_depth, sphere_rgb

    cfg = small_cfg.with_updates(integrate_color=True, color_mode="RGB")
    poses = []
    depths = []
    rgbs = []
    for i in range(3):
        p = np.eye(4, dtype=np.float32)
        p[0, 3] = 0.02 * i
        p[2, 3] = -0.9 - 0.03 * i
        d = np.asarray(sphere_depth(cfg, center=(-0.02 * i, 0.0, 0.9 + 0.03 * i),
                                    radius=0.3))
        poses.append(p)
        depths.append(d)
        rgbs.append(np.asarray(sphere_rgb(cfg, d)))
    depths = jnp.asarray(np.stack(depths))
    poses_j = jnp.asarray(np.stack(poses))
    rgbs_j = jnp.asarray(np.stack(rgbs))

    ref = make_brick_volume(cfg, 8, 256)
    for i in range(3):
        ref = integrate_bricks(ref, depths[i], poses_j[i], rgbs_j[i], 1024)
    seq = integrate_bricks_sequence(make_brick_volume(cfg, 8, 256),
                                    depths, poses_j, rgbs_j, 1024)
    np.testing.assert_array_equal(np.asarray(ref.sdf), np.asarray(seq.sdf))
    np.testing.assert_array_equal(np.asarray(ref.weight),
                                  np.asarray(seq.weight))
    np.testing.assert_array_equal(np.asarray(ref.color),
                                  np.asarray(seq.color))
    np.testing.assert_array_equal(np.asarray(ref.brick_map),
                                  np.asarray(seq.brick_map))
    assert int(seq.n_active) == int(ref.n_active)

    # uncolored path (None rgbs slot in the scan xs)
    cfg0 = small_cfg
    d0 = depths  # same depths work
    r0 = make_brick_volume(cfg0, 8, 256)
    for i in range(3):
        r0 = integrate_bricks(r0, d0[i], poses_j[i], None, 1024)
    s0 = integrate_bricks_sequence(make_brick_volume(cfg0, 8, 256),
                                   d0, poses_j, None, 1024)
    np.testing.assert_array_equal(np.asarray(r0.sdf), np.asarray(s0.sdf))
    np.testing.assert_array_equal(np.asarray(r0.weight),
                                  np.asarray(s0.weight))
