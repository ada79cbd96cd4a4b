"""End-to-end coverage of the exotic color modes (RGBNormalized / LAB):
fusion -> colored render -> colored marching cubes. Numeric golden parity
with the compiled reference nodes lives in test_ref_extract.py; these check
the full pipeline surfaces round-trip colors through each mode's transform.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import integrate, make_volume, render_view
from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose

COLOR = np.array([180.0, 90.0, 40.0], np.float32)


@pytest.fixture(scope="module", params=["RGBNormalized", "LAB"])
def fused(request):
    from conftest import TSDFConfig

    cfg = TSDFConfig(
        xres=64, yres=64, zres=64, xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.06, max_dist_neg=0.06,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=40, image_height=30,
        focal_length_x=35.0, focal_length_y=35.0,
        principal_point_x=20.0, principal_point_y=15.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4,
        integrate_color=True, color_mode=request.param)
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    rgb = np.broadcast_to(COLOR, depth.shape + (3,)).copy()
    vol = integrate(make_volume(cfg), jnp.asarray(depth),
                    jnp.asarray(pose, jnp.float32), jnp.asarray(rgb))
    return cfg, vol, pose


def test_colored_render(fused):
    """renderColoredView analog for each mode: the per-voxel color read back
    at hits must round-trip the fused constant color through the mode's
    to/from transform (octree.cpp:379-434, 436-581)."""
    cfg, vol, pose = fused
    res = render_view(vol, pose, colored=True)
    c = np.asarray(res.rgb)
    ok = ~np.isnan(c[..., 0])
    assert ok.sum() > 100
    np.testing.assert_allclose(c[ok].mean(0), COLOR, atol=3.0)


def test_colored_marching_cubes(fused):
    """MC vertex coloring by voxel RGB (marching_cubes_tsdf_octree.cpp:208-233
    analog) through each color mode's back-conversion."""
    cfg, vol, pose = fused
    v, f, colors = extract_mesh(vol, min_weight=0.5, color_by_rgb=True)
    assert colors is not None and len(colors) == len(v) and len(f) > 100
    med = np.median(np.asarray(colors, np.float32), axis=0)
    np.testing.assert_allclose(med, COLOR, atol=3.0)
