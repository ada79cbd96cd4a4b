"""Sharded Pallas ray-march kernel vs the single-device kernel.

VERDICT r4 items 1+7: multi-chip render must drive the KERNEL, not the XLA
fallback, and must also work when the volume itself is sharded (no device
holds the full table set).

  * tile-sharded: pack replicated, pair list partitioned by tile ownership —
    each tile's min-combine sees exactly the single-device pair set, so the
    render is BIT-identical.
  * volume-sharded: per-device slab packs + ppermute halo planes + cross-
    device first-crossing combine — bit-identical on this scene (cross-
    device key ties would break toward the lower device id, but brackets of
    distinct bricks never tie bit-for-bit here).

Interpret-mode kernel traces cost minutes, so the module shares one scene
(fused on the 8-device sharded volume, merged for the single-device
reference) and keeps the mesh cases minimal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu.ops.pallas_raycast import render_view_pallas
from cpu_tsdf_tpu.parallel import make_tsdf_mesh, render_view_pallas_sharded
from cpu_tsdf_tpu.parallel.bricks import (integrate_bricks_sharded,
                                          make_sharded_brick_volume,
                                          merge_sharded)
from cpu_tsdf_tpu.parallel.raycast import render_view_volume_sharded

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
    mesh8 = make_tsdf_mesh(jax.devices("cpu")[:8])
    sb = make_sharded_brick_volume(cfg, mesh8, 8, capacity_per_device=256)
    sb = integrate_bricks_sharded(sb, jnp.asarray(depth),
                                  jnp.asarray(pose, jnp.float32), mesh8,
                                  rgb=jnp.asarray(rgb))
    bv = merge_sharded(sb)
    return cfg, bv, sb, pose, mesh8


@pytest.fixture(scope="module")
def single(scene):
    cfg, bv, sb, pose, mesh8 = scene
    return render_view_pallas(bv, pose, colored=True, r_budget=2048,
                              pair_budget=4096, interpret=True)


def test_sharded_kernel_bitmatches_single(scene, single):
    cfg, bv, sb, pose, mesh8 = scene
    rs = render_view_pallas_sharded(bv, pose, mesh8, colored=True,
                                    r_budget=2048, pair_budget=4096,
                                    interpret=True)
    np.testing.assert_array_equal(np.asarray(single.depth),
                                  np.asarray(rs.depth))
    np.testing.assert_array_equal(np.asarray(single.normals),
                                  np.asarray(rs.normals))
    np.testing.assert_array_equal(np.asarray(single.rgb), np.asarray(rs.rgb))
    assert np.isfinite(np.asarray(rs.depth)).sum() > 800


def test_sharded_kernel_local_budget_overflow_grows(scene, single):
    """A too-small per-device pair budget must retry with a grown budget and
    still match (never silently drop pairs)."""
    cfg, bv, sb, pose, mesh8 = scene
    rs = render_view_pallas_sharded(bv, pose, mesh8, colored=True,
                                    r_budget=2048, pair_budget=4096,
                                    pair_budget_local=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(single.depth),
                                  np.asarray(rs.depth))


def test_volume_sharded_render_matches(scene, single):
    """Beyond-one-HBM path: each device packs only its slab (256 table rows
    < the live brick total), halo planes ride ppermute, channels min-combine
    across the mesh — output equals the replicated-volume kernel render."""
    cfg, bv, sb, pose, mesh8 = scene
    assert int(np.asarray(sb.n_active).sum()) > 256  # no device holds it all
    rs, ovf = render_view_volume_sharded(sb, pose, mesh8, r_budget_local=256,
                                         pair_budget_local=2048,
                                         interpret=True)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(single.depth),
                                  np.asarray(rs.depth))
    np.testing.assert_array_equal(np.asarray(single.normals),
                                  np.asarray(rs.normals))
