"""Voxel index math and projection parity
(/root/reference/src/lib/tsdf_volume_octree.cpp:553-617)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import geometry
from cpu_tsdf_tpu.config import TSDFConfig


@pytest.fixture
def cfg():
    return TSDFConfig(xres=64, yres=32, zres=16, xsize=3.2, ysize=1.6, zsize=0.8)


def test_center_index_roundtrip(cfg):
    ii = np.random.RandomState(0).randint(0, 16, size=(100, 3))
    ix, iy, iz = ii[:, 0], ii[:, 1], ii[:, 2]
    x, y, z = geometry.voxel_center(cfg, ix.astype(np.float32), iy.astype(np.float32), iz.astype(np.float32))
    jx, jy, jz, ok = geometry.voxel_index(cfg, x, y, z)
    assert np.all(np.asarray(ok))
    np.testing.assert_array_equal(np.asarray(jx), ix)
    np.testing.assert_array_equal(np.asarray(jy), iy)
    np.testing.assert_array_equal(np.asarray(jz), iz)


def test_voxel_center_values(cfg):
    # (i + 0.5) * size/res - size/2
    x, y, z = geometry.voxel_center(cfg, 0, 0, 0)
    assert float(x) == pytest.approx(-1.6 + 0.025)
    assert float(y) == pytest.approx(-0.8 + 0.025)
    assert float(z) == pytest.approx(-0.4 + 0.025)


def test_out_of_bounds_index(cfg):
    _, _, _, ok = geometry.voxel_index(cfg, jnp.float32(10.0), jnp.float32(0.0), jnp.float32(0.0))
    assert not bool(ok)


def test_in_volume_nan(cfg):
    assert not bool(geometry.in_volume(cfg, jnp.float32(0), jnp.float32(0), jnp.float32(jnp.nan)))
    assert bool(geometry.in_volume(cfg, jnp.float32(0), jnp.float32(0), jnp.float32(0)))


def test_reproject_truncation_quirk():
    """C++ (int) cast truncates toward zero: u in (-1, 0) lands on pixel 0 and
    counts as valid (tsdf_volume_octree.cpp:611-617)."""
    cfg = TSDFConfig()
    # Choose x so that u_f = -0.4: x*fx/z + 320 = -0.4 -> x = -320.4*z/fx
    z = 1.0
    x = (-0.4 - 320.0) * z / 525.0
    u, v, ok = geometry.reproject_point(cfg, jnp.float32(x), jnp.float32(0), jnp.float32(z))
    assert int(u) == 0 and bool(ok)
    # u_f = -1.5 -> truncates to -1 -> invalid
    x = (-1.5 - 320.0) * z / 525.0
    u, v, ok = geometry.reproject_point(cfg, jnp.float32(x), jnp.float32(0), jnp.float32(z))
    assert int(u) == -1 and not bool(ok)


def test_rigid_inverse():
    rng = np.random.RandomState(1)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = q
    m[:3, 3] = rng.randn(3)
    inv = np.asarray(geometry.rigid_inverse(m))
    np.testing.assert_allclose(inv @ m, np.eye(4), atol=1e-6)


def test_transform_points_matches_matmul():
    rng = np.random.RandomState(2)
    m = np.eye(4); m[:3, :] = rng.randn(3, 4)
    pts = rng.randn(50, 3).astype(np.float32)
    x, y, z = geometry.transform_points(m.astype(np.float32), pts[:, 0], pts[:, 1], pts[:, 2])
    ref = (m[:3, :3] @ pts.T + m[:3, 3:4]).T
    np.testing.assert_allclose(np.stack([x, y, z], -1), ref, rtol=1e-5, atol=1e-5)
