"""Multi-chip tests on the 8-device virtual CPU mesh (SURVEY §4 item 4):
the same pjit/GSPMD code paths as real TPU pods, asserting equality with the
single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import TSDFConfig, integrate, make_volume, render_view
from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh
from cpu_tsdf_tpu.parallel import (integrate_sharded, make_tsdf_mesh,
                                   render_view_sharded, shard_volume)
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices("cpu")
    assert len(devs) >= 8, "conftest must force 8 host devices"
    return make_tsdf_mesh(devs[:8])


@pytest.fixture(scope="module")
def scene():
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


def test_sharded_integrate_matches_single(mesh, scene):
    cfg, pose, depth = scene
    vol1 = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))

    vol8 = shard_volume(make_volume(cfg), mesh)
    vol8 = integrate_sharded(vol8, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    # output stays sharded
    assert len(vol8.sdf.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(vol8.sdf), np.asarray(vol1.sdf))
    np.testing.assert_array_equal(np.asarray(vol8.weight), np.asarray(vol1.weight))
    np.testing.assert_array_equal(np.asarray(vol8.nsample), np.asarray(vol1.nsample))


def test_sharded_multiframe(mesh, scene):
    cfg, pose, depth = scene
    pose2 = tilted_pose(tx=0.063, ty=0.041, tz=-0.88)
    vol1 = make_volume(cfg)
    vol8 = shard_volume(make_volume(cfg), mesh)
    for p in (pose, pose2):
        vol1 = integrate(vol1, jnp.asarray(depth), jnp.asarray(p, jnp.float32))
        vol8 = integrate_sharded(vol8, jnp.asarray(depth), jnp.asarray(p, jnp.float32))
    np.testing.assert_array_equal(np.asarray(vol8.sdf), np.asarray(vol1.sdf))


def test_sharded_render_matches_single(mesh, scene):
    cfg, pose, depth = scene
    vol = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    r1 = render_view(vol, pose)
    r8 = render_view_sharded(vol, pose, mesh)
    # partitioned compilation reorders f32 ops slightly
    d1, d8 = np.asarray(r1.depth), np.asarray(r8.depth)
    assert (np.isnan(d1) == np.isnan(d8)).all()
    np.testing.assert_allclose(d8, d1, atol=1e-4, equal_nan=True)
    np.testing.assert_allclose(np.asarray(r8.normals), np.asarray(r1.normals),
                               atol=1e-3, equal_nan=True)


def test_mc_on_sharded_volume(mesh, scene):
    """GSPMD partitions the shifted-view corner reads with halo exchange."""
    cfg, pose, depth = scene
    vol1 = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    v1, f1, _ = extract_mesh(vol1, min_weight=0.5)
    vol8 = shard_volume(vol1, mesh)
    v8, f8, _ = extract_mesh(vol8, min_weight=0.5)
    assert len(f1) == len(f8)
    np.testing.assert_allclose(np.sort(v1.reshape(-1)), np.sort(v8.reshape(-1)), atol=1e-6)


def test_gradient_allreduce_through_sharded_volume(mesh, scene):
    """Backward pass across the sharded volume: gradient w.r.t. the (replicated)
    pose requires a cross-shard reduction that GSPMD inserts as psum."""
    cfg, pose, depth = scene

    def loss(pose_t, vol0, d):
        v = integrate(vol0, d, pose_t)
        return jnp.sum(jnp.where(v.weight > 0, v.sdf, 0.0) ** 2)

    g1 = jax.grad(loss)(jnp.asarray(pose, jnp.float32), make_volume(cfg), jnp.asarray(depth))
    vol8 = shard_volume(make_volume(cfg), mesh)
    g8 = jax.grad(loss)(jnp.asarray(pose, jnp.float32), vol8, jnp.asarray(depth))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g8), rtol=1e-4, atol=1e-5)
