"""Slab-sharded brick integration on the 8-virtual-device CPU mesh:
zero-collective multi-chip fusion matching the single-device brick path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import integrate, make_volume
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume, to_dense
from cpu_tsdf_tpu.parallel import make_tsdf_mesh
from cpu_tsdf_tpu.parallel.bricks import (integrate_bricks_sharded,
                                          make_sharded_brick_volume, merge_sharded)
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    assert len(devs) >= 8
    return make_tsdf_mesh(devs[:8])


@pytest.fixture(scope="module")
def scene():
    from conftest import TSDFConfig

    cfg = TSDFConfig(xres=64, yres=64, zres=64, xsize=1.6, ysize=1.6, zsize=1.6,
                     max_dist_pos=0.06, max_dist_neg=0.06,
                     min_sensor_dist=0.1, max_sensor_dist=3.0,
                     image_width=40, image_height=30,
                     focal_length_x=35.0, focal_length_y=35.0,
                     principal_point_x=20.0, principal_point_y=15.0,
                     max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4)
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    return cfg, pose, depth


def test_sharded_bricks_match_dense_band(mesh, scene):
    cfg, pose, depth = scene
    dense = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    sb = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    sb = integrate_bricks_sharded(sb, depth, pose, mesh)
    assert not bool(np.asarray(sb.overflowed))
    merged = merge_sharded(sb)
    bd = to_dense(merged)
    w_dense = np.asarray(dense.weight)
    d_dense = np.asarray(dense.sdf)
    band = (w_dense > 0) & (np.abs(d_dense) < 0.999)
    assert band.sum() > 500
    np.testing.assert_allclose(np.asarray(bd.sdf)[band], d_dense[band], atol=2e-5)
    np.testing.assert_array_equal(np.asarray(bd.weight)[band], w_dense[band])
    # no observations the dense path lacks
    extra = (np.asarray(bd.weight) > 0) & (w_dense == 0)
    assert extra.sum() == 0


def test_sharded_bricks_match_single_device_bricks(mesh, scene):
    cfg, pose, depth = scene
    pose2 = tilted_pose(tx=0.063, ty=0.041, tz=-0.88)
    single = make_brick_volume(cfg, 8, 2048)
    sb = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    for p in (pose, pose2):
        single = integrate_bricks(single, jnp.asarray(depth), jnp.asarray(p, jnp.float32))
        sb = integrate_bricks_sharded(sb, depth, p, mesh)
    merged = merge_sharded(sb)
    ds = np.asarray(to_dense(single).sdf)
    dm = np.asarray(to_dense(merged).sdf)
    ws = np.asarray(to_dense(single).weight)
    wm = np.asarray(to_dense(merged).weight)
    obs = ws > 0
    # sharded activation == single-device activation (same dilation rules)
    np.testing.assert_array_equal(wm[obs], ws[obs])
    np.testing.assert_allclose(dm[obs], ds[obs], atol=2e-5)


def test_sharded_bricks_render_and_mesh(mesh, scene):
    """The merged sharded volume feeds every downstream op unchanged."""
    from cpu_tsdf_tpu import render_view
    from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh

    cfg, pose, depth = scene
    sb = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    sb = integrate_bricks_sharded(sb, depth, pose, mesh)
    merged = merge_sharded(sb)
    r = render_view(merged, pose)
    assert np.isfinite(np.asarray(r.depth)).sum() > 300
    v, f, _ = extract_mesh(merged, min_weight=0.5)
    assert len(f) > 200
    rr = np.linalg.norm(v - np.array([-0.0, -0.0, 0.0]), axis=1)
    # vertices near the fused sphere surface (r=0.3 around volume origin-ish)
    assert np.abs(np.median(rr) - 0.3) < 0.05
    # the kernel extraction engine handles the merged volume's per-device
    # slot GAPS (liveness from coords, not a prefix assumption)
    from cpu_tsdf_tpu.ops.marching_cubes import extract_soup_bricks

    sk = extract_soup_bricks(merged, min_weight=0.5,
                             corner_engine="interpret")
    sx = extract_soup_bricks(merged, min_weight=0.5, corner_engine="xla")
    assert int(sk.num_triangles) == int(sx.num_triangles) == len(f)
    vk = np.asarray(sk.vertices)[np.asarray(sk.tri_valid)]
    vx = np.asarray(sx.vertices)[np.asarray(sx.tri_valid)]
    np.testing.assert_allclose(vk, vx, atol=1e-6)


def test_sharded_pallas_kernel_matches_xla(mesh, scene):
    """The Pallas fusion kernel runs INSIDE the shard_map body (interpret
    mode on the CPU mesh) and matches the sharded XLA update."""
    cfg, pose, depth = scene
    sx = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    sp = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    sx = integrate_bricks_sharded(sx, depth, pose, mesh, update_budget=128)
    sp = integrate_bricks_sharded(sp, depth, pose, mesh, update_budget=128,
                                  use_pallas=True, pallas_interpret=True)
    assert not bool(np.asarray(sp.overflowed))
    mx, mp = merge_sharded(sx), merge_sharded(sp)
    np.testing.assert_array_equal(np.asarray(mp.weight), np.asarray(mx.weight))
    np.testing.assert_array_equal(np.asarray(mp.nsample), np.asarray(mx.nsample))
    np.testing.assert_allclose(np.asarray(mp.sdf), np.asarray(mx.sdf), atol=1e-5)


def test_sharded_color_fusion_matches_single_device(mesh, scene):
    """Color fuses in the sharded path (kernel + XLA) identically to the
    single-device brick path."""
    cfg, pose, depth = scene
    cfg = cfg.with_updates(integrate_color=True, color_mode="RGB")
    rng = np.random.default_rng(3)
    rgb = jnp.asarray(rng.integers(0, 256, np.asarray(depth).shape + (3,)),
                      jnp.float32)
    single = make_brick_volume(cfg, 8, 2048)
    single = integrate_bricks(single, jnp.asarray(depth),
                              jnp.asarray(pose, jnp.float32), rgb)
    for use_pallas in (False, True):
        sb = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
        sb = integrate_bricks_sharded(sb, depth, pose, mesh, update_budget=128,
                                      rgb=rgb, use_pallas=use_pallas,
                                      pallas_interpret=use_pallas)
        md = to_dense(merge_sharded(sb))
        sd = to_dense(single)
        obs = np.asarray(sd.weight) > 0
        np.testing.assert_array_equal(np.asarray(md.weight)[obs],
                                      np.asarray(sd.weight)[obs])
        np.testing.assert_array_equal(np.asarray(md.color)[obs],
                                      np.asarray(sd.color)[obs])


def test_sharded_budget_per_device_overflow_flag(mesh, scene):
    """A slab denser than budget_per_device must raise `overflowed`, never
    drop bricks silently; a sufficient per-device budget stays bit-equal to
    the global-budget result."""
    cfg, pose, depth = scene
    full = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    full = integrate_bricks_sharded(full, depth, pose, mesh,
                                    update_budget=4096)
    assert not bool(np.asarray(full.overflowed))

    tight = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    tight = integrate_bricks_sharded(tight, depth, pose, mesh,
                                     update_budget=4096, budget_per_device=8)
    assert bool(np.asarray(tight.overflowed))

    ok = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
    ok = integrate_bricks_sharded(ok, depth, pose, mesh, update_budget=4096,
                                  budget_per_device=512)
    assert not bool(np.asarray(ok.overflowed))
    mf, mo = merge_sharded(full), merge_sharded(ok)
    df, do = to_dense(mf), to_dense(mo)
    np.testing.assert_array_equal(np.asarray(do.weight), np.asarray(df.weight))
    np.testing.assert_array_equal(np.asarray(do.sdf), np.asarray(df.sdf))


def test_hybrid_mesh_matches_1d(scene):
    """A hybrid [dcn, shard] mesh (volume replicated across dcn, slab-sharded
    on the inner axis) must fuse the identical global field as the 1D mesh:
    the slab count comes from the SHARD axis extent, not the total device
    count. Single-process stand-in for the multi-host DCN x ICI layout
    (bench/multiprocess_demo.py runs the real jax.distributed version)."""
    from jax.sharding import Mesh

    from cpu_tsdf_tpu.parallel.distributed import DCN_AXIS
    from cpu_tsdf_tpu.parallel.sharding import AXIS

    cfg, pose, depth = scene
    devs = np.asarray(jax.devices("cpu")[:8])
    mesh1 = make_tsdf_mesh(devs[:4])
    meshh = Mesh(devs.reshape(2, 4), (DCN_AXIS, AXIS))

    def run(mesh):
        bv = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=512)
        bv = integrate_bricks_sharded(bv, jnp.asarray(depth),
                                      jnp.asarray(pose, jnp.float32), mesh,
                                      update_budget=1024)
        assert not bool(np.asarray(bv.overflowed))
        return merge_sharded(bv)

    b1 = run(mesh1)
    bh = run(meshh)
    assert int(b1.n_active) == int(bh.n_active) > 20
    d1 = to_dense(b1)
    dh = to_dense(bh)
    np.testing.assert_array_equal(np.asarray(dh.weight), np.asarray(d1.weight))
    np.testing.assert_allclose(np.asarray(dh.sdf), np.asarray(d1.sdf),
                               atol=1e-6)
