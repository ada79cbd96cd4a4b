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


def test_sharded_kernel_local_budget_overflow_grows():
    """A too-small per-device pair budget must retry with a grown budget and
    still match (never silently drop pairs).

    Runs in a SUBPROCESS: the retry's fresh jit trace deterministically
    segfaults XLA:CPU's LLVM compile when issued after the full suite's
    ~170 tests of accumulated compiler state (round 5; the identical
    sequence passes in a fresh process — an upstream compiler bug, not a
    framework one)."""
    import os
    import subprocess
    import sys

    script = r"""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_default_device", jax.devices("cpu")[0])
import jax.numpy as jnp
import numpy as np
from cpu_tsdf_tpu.config import TSDFConfig
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.parallel import make_tsdf_mesh, render_view_pallas_sharded
from cpu_tsdf_tpu.synthetic import sphere_depth

cfg = TSDFConfig(
    xres=64, yres=64, zres=64, xsize=1.6, ysize=1.6, zsize=1.6,
    max_dist_pos=0.06, max_dist_neg=0.06, min_sensor_dist=0.1,
    max_sensor_dist=3.0, image_width=32, image_height=24,
    focal_length_x=28.0, focal_length_y=28.0,
    principal_point_x=16.0, principal_point_y=12.0,
    max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4)
pose = np.eye(4, dtype=np.float32); pose[2, 3] = -0.9
depth = jnp.asarray(sphere_depth(cfg, center=(0.01, -0.02, 0.9), radius=0.3))
bv = make_brick_volume(cfg, 8, 512)
bv = integrate_bricks(bv, depth, jnp.asarray(pose))
mesh = make_tsdf_mesh(jax.devices("cpu")[:2])
ok = render_view_pallas_sharded(bv, pose, mesh, r_budget=512,
                                pair_budget=1024, interpret=True)
grown = render_view_pallas_sharded(bv, pose, mesh, r_budget=512,
                                   pair_budget=1024, pair_budget_local=16,
                                   interpret=True)
d0, d1 = np.asarray(ok.depth), np.asarray(grown.depth)
assert np.isfinite(d0).sum() > 50
np.testing.assert_array_equal(d0, d1)
print("OVERFLOW_GROW_OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, "-c", script], env=env, timeout=900,
                       capture_output=True, text=True,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0 and "OVERFLOW_GROW_OK" in r.stdout, (
        r.stdout[-1500:], r.stderr[-1500:])


def test_volume_sharded_render_matches(scene, single):
    """Beyond-one-HBM path: each device packs only its slab (256 table rows
    < the live brick total), halo planes ride ppermute, channels min-combine
    across the mesh — output equals the replicated-volume kernel render,
    including the slab-gathered colors (colors never replicate either)."""
    cfg, bv, sb, pose, mesh8 = scene
    assert int(np.asarray(sb.n_active).sum()) > 256  # no device holds it all
    rs, ovf = render_view_volume_sharded(sb, pose, mesh8, colored=True,
                                         r_budget_local=256,
                                         pair_budget_local=2048,
                                         interpret=True)
    assert not bool(ovf)
    np.testing.assert_array_equal(np.asarray(single.depth),
                                  np.asarray(rs.depth))
    np.testing.assert_array_equal(np.asarray(single.normals),
                                  np.asarray(rs.normals))
    np.testing.assert_array_equal(np.asarray(single.rgb), np.asarray(rs.rgb))
