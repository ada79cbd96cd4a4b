"""Tile-sharded Pallas ray-march kernel vs the single-device kernel.

VERDICT r4 item 1: multi-chip render must drive the KERNEL, not the XLA
fallback. The pair list partitions by tile ownership, so each tile's
min-combine sees exactly the single-device pair set — the sharded render
must be BIT-identical to the single-device kernel render (same kernel, same
pairs, same combine order within a tile).

Interpret-mode kernel traces cost minutes, so the module shares one scene
and keeps the mesh cases minimal (2 and 8 devices).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.ops.pallas_raycast import render_view_pallas
from cpu_tsdf_tpu.parallel import make_tsdf_mesh, render_view_pallas_sharded

from test_fusion import tilted_pose


@pytest.fixture(scope="module")
def scene():
    from conftest import TSDFConfig

    from cpu_tsdf_tpu.synthetic import sphere_depth

    cfg = TSDFConfig(
        xres=128, yres=128, zres=128, xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.04, max_dist_neg=0.04,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=64, image_height=48,
        focal_length_x=56.0, focal_length_y=56.0,
        principal_point_x=32.0, principal_point_y=24.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4,
        integrate_color=True, color_mode="RGB")
    pose = tilted_pose()
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9),
                                    radius=0.3))
    rgb = np.broadcast_to(np.array([180.0, 90.0, 40.0], np.float32),
                          depth.shape + (3,)).copy()
    bv = make_brick_volume(cfg, 8, 2048)
    bv = integrate_bricks(bv, jnp.asarray(depth),
                          jnp.asarray(pose, jnp.float32), jnp.asarray(rgb))
    return cfg, bv, pose


@pytest.fixture(scope="module")
def single(scene):
    cfg, bv, pose = scene
    return render_view_pallas(bv, pose, colored=True, r_budget=1024,
                              pair_budget=4096, interpret=True)


def test_sharded_kernel_bitmatches_single(scene, single, cpu_devices):
    cfg, bv, pose = scene
    mesh = make_tsdf_mesh(cpu_devices[:8])
    rs = render_view_pallas_sharded(bv, pose, mesh, colored=True,
                                    r_budget=1024, pair_budget=4096,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(single.depth),
                                  np.asarray(rs.depth))
    np.testing.assert_array_equal(np.asarray(single.normals),
                                  np.asarray(rs.normals))
    np.testing.assert_array_equal(np.asarray(single.rgb), np.asarray(rs.rgb))
    assert np.isfinite(np.asarray(rs.depth)).sum() > 800


def test_sharded_kernel_2dev(scene, single, cpu_devices):
    """D=2 exercises the non-4x slack branch and an uneven tile split."""
    cfg, bv, pose = scene
    mesh = make_tsdf_mesh(cpu_devices[:2])
    rs = render_view_pallas_sharded(bv, pose, mesh, colored=True,
                                    r_budget=1024, pair_budget=4096,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(single.depth),
                                  np.asarray(rs.depth))


def test_sharded_kernel_local_budget_overflow_grows(scene, single, cpu_devices):
    """A too-small per-device pair budget must retry with a grown budget and
    still match (never silently drop pairs)."""
    cfg, bv, pose = scene
    mesh = make_tsdf_mesh(cpu_devices[:2])
    rs = render_view_pallas_sharded(bv, pose, mesh, colored=True,
                                    r_budget=1024, pair_budget=4096,
                                    pair_budget_local=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(single.depth),
                                  np.asarray(rs.depth))
