"""Config defaults must mirror the reference constructor
(/root/reference/src/lib/tsdf_volume_octree.cpp:54-85)."""

import pytest

from cpu_tsdf_tpu.config import TSDFConfig, snap_resolution_pow2


def test_reference_defaults():
    c = TSDFConfig()
    assert c.resolution == (512, 512, 512)
    assert c.grid_size == (3.0, 3.0, 3.0)
    assert c.max_dist_pos == pytest.approx(0.03)
    assert c.max_dist_neg == pytest.approx(0.03)
    assert c.max_weight == 100.0
    assert c.min_sensor_dist == pytest.approx(0.3)
    assert c.max_sensor_dist == pytest.approx(3.0)
    assert (c.focal_length_x, c.focal_length_y) == (525.0, 525.0)
    assert (c.principal_point_x, c.principal_point_y) == (320.0, 240.0)
    assert (c.image_width, c.image_height) == (640, 480)
    assert c.max_cell_size_x == pytest.approx(0.5)
    assert not c.weight_by_depth and not c.weight_by_variance
    assert not c.integrate_color and c.color_mode == "RGB"
    assert c.use_trilinear_interpolation
    assert c.num_random_splits == 1


def test_snap_resolution():
    # CLI default: 12m volume, 0.006m cells -> 2000 -> snapped to 2048
    # (/root/reference/src/prog/integrate.cpp:477-494).
    assert snap_resolution_pow2(12.0, 0.006) == 2048
    assert snap_resolution_pow2(3.0, 0.006) == 512
    assert snap_resolution_pow2(1.0, 1.0) == 1
    assert snap_resolution_pow2(1.6, 0.025) == 64


def test_coarse_levels():
    # 3m volume, 0.5m max cell -> desired 6 -> ceil(log2(6)) = 3
    # (octree.cpp:594-599).
    c = TSDFConfig()
    assert c.num_coarse_levels == 3


def test_json_roundtrip():
    c = TSDFConfig(xres=64, integrate_color=True, color_mode="LAB")
    assert TSDFConfig.from_json(c.to_json()) == c


def test_invalid_color_mode():
    with pytest.raises(ValueError):
        TSDFConfig(color_mode="HSV")


def test_hashable_static():
    assert hash(TSDFConfig()) == hash(TSDFConfig())
