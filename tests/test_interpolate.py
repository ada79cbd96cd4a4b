"""Field query tests: trilinear sampling and tent-kernel value/grad/Hessian
(/root/reference/src/lib/tsdf_volume_octree.cpp:453-541,654-828)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu.config import TSDFConfig
from cpu_tsdf_tpu.ops import interpolate


@pytest.fixture
def cfg():
    return TSDFConfig(xres=16, yres=16, zres=16, xsize=1.6, ysize=1.6, zsize=1.6)


def linear_field(cfg, a=0.3, b=-0.2, c=0.1, d0=0.05):
    """d(x,y,z) = a x + b y + c z + d0 sampled at voxel centers."""
    i = np.arange(cfg.xres)
    x = (i + 0.5) * cfg.xsize / cfg.xres - cfg.xsize / 2
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return (a * X + b * Y + c * Z + d0).astype(np.float32)


def test_trilinear_reproduces_linear_field(cfg):
    """Trilinear interpolation is exact on a linear field."""
    sdf = jnp.asarray(linear_field(cfg))
    w = jnp.ones_like(sdf)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, size=(200, 3)).astype(np.float32)
    val, valid = interpolate.trilinear(cfg, sdf, w, pts[:, 0], pts[:, 1], pts[:, 2])
    expect = 0.3 * pts[:, 0] - 0.2 * pts[:, 1] + 0.1 * pts[:, 2] + 0.05
    assert np.all(np.asarray(valid))
    np.testing.assert_allclose(np.asarray(val), expect, atol=1e-5)


def test_trilinear_validity_requires_weights(cfg):
    sdf = jnp.asarray(linear_field(cfg))
    w = jnp.ones_like(sdf)
    w = w.at[8, 8, 8].set(0.0)
    # a point whose 8-corner neighborhood includes voxel (8,8,8)
    x = np.float32((8 + 0.9) * 0.1 - 0.8)
    y = np.float32((8 + 0.9) * 0.1 - 0.8)
    z = np.float32((8 + 0.9) * 0.1 - 0.8)
    val, valid = interpolate.trilinear(cfg, sdf, w, x, y, z)
    assert not bool(valid)
    assert np.isfinite(float(val))  # value still computed (reference semantics)


def test_trilinear_boundary_invalid(cfg):
    sdf = jnp.asarray(linear_field(cfg))
    w = jnp.ones_like(sdf)
    # point inside voxel 0 -> un-adjusted index 0 -> invalid (cpp:491)
    val, valid = interpolate.trilinear(cfg, sdf, w, jnp.float32(-0.79), jnp.float32(0.0), jnp.float32(0.0))
    assert not bool(valid)


def test_nearest_lookup(cfg):
    sdf = jnp.asarray(linear_field(cfg))
    w = jnp.ones_like(sdf)
    v, ok = interpolate.nearest(cfg, sdf, w, jnp.float32(0.05), jnp.float32(0.05), jnp.float32(0.05))
    # voxel containing (0.05,0.05,0.05) = index 8 -> center 0.05
    expect = 0.3 * 0.05 - 0.2 * 0.05 + 0.1 * 0.05 + 0.05
    assert bool(ok)
    assert float(v) == pytest.approx(expect, abs=1e-6)


def test_fxn_matches_trilinear_on_linear_field(cfg):
    """On a linear field the tent-kernel value equals the trilinear value."""
    sdf = jnp.asarray(linear_field(cfg))
    w = jnp.ones_like(sdf)
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.4, 0.4, size=(64, 3)).astype(np.float32)
    v1, ok1 = interpolate.trilinear(cfg, sdf, w, pts[:, 0], pts[:, 1], pts[:, 2])
    v2, ok2 = interpolate.fxn(cfg, sdf, pts[:, 0], pts[:, 1], pts[:, 2])
    assert np.all(np.asarray(ok1)) and np.all(np.asarray(ok2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-4)


def test_gradient_exact_on_linear_field(cfg):
    sdf = jnp.asarray(linear_field(cfg))
    rng = np.random.RandomState(2)
    pts = rng.uniform(-0.4, 0.4, size=(64, 3)).astype(np.float32)
    grad, ok = interpolate.gradient(cfg, sdf, pts[:, 0], pts[:, 1], pts[:, 2])
    assert np.all(np.asarray(ok))
    g = np.asarray(grad)
    np.testing.assert_allclose(g[:, 0], 0.3, atol=1e-3)
    np.testing.assert_allclose(g[:, 1], -0.2, atol=1e-3)
    np.testing.assert_allclose(g[:, 2], 0.1, atol=1e-3)


def test_gradient_matches_autodiff(cfg):
    """Analytic tent-kernel gradient == jax.grad of the tent-kernel value."""
    rng = np.random.RandomState(3)
    sdf = jnp.asarray(rng.randn(16, 16, 16).astype(np.float32))
    pts = rng.uniform(-0.4, 0.4, size=(32, 3)).astype(np.float32)
    # keep away from voxel-center discontinuities of the |.| kernel
    centers = (np.floor((pts + 0.8) / 0.1) + 0.5) * 0.1 - 0.8
    pts = np.where(np.abs(pts - centers) < 1e-3, pts + 5e-3, pts).astype(np.float32)
    grad, ok = interpolate.gradient(cfg, sdf, pts[:, 0], pts[:, 1], pts[:, 2])
    g_ad = interpolate.fxn_autodiff_gradient(cfg, sdf, pts[:, 0], pts[:, 1], pts[:, 2])
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ad), rtol=1e-3, atol=1e-3)


def test_gradient_matches_finite_difference(cfg):
    rng = np.random.RandomState(4)
    sdf = jnp.asarray(rng.randn(16, 16, 16).astype(np.float32))
    p = np.array([0.123, -0.217, 0.304], np.float32)
    grad, ok = interpolate.gradient(cfg, sdf, p[0], p[1], p[2])
    assert bool(ok)
    eps = 1e-3
    for ax in range(3):
        dp = np.zeros(3, np.float32); dp[ax] = eps
        vp, _ = interpolate.fxn(cfg, sdf, *(p + dp))
        vm, _ = interpolate.fxn(cfg, sdf, *(p - dp))
        fd = (float(vp) - float(vm)) / (2 * eps)
        assert float(grad[ax]) == pytest.approx(fd, abs=2e-2)


def test_hessian_symmetric_zero_diagonal(cfg):
    rng = np.random.RandomState(5)
    sdf = jnp.asarray(rng.randn(16, 16, 16).astype(np.float32))
    p = np.array([0.11, -0.22, 0.3], np.float32)
    hess, ok = interpolate.hessian(cfg, sdf, p[0], p[1], p[2])
    h = np.asarray(hess)
    assert bool(ok)
    np.testing.assert_allclose(h, h.T, atol=1e-6)
    np.testing.assert_allclose(np.diag(h), 0.0, atol=1e-6)


def test_value_differentiable_wrt_sdf(cfg):
    """d(value)/d(sdf) flows: sum of interpolation weights == 1."""
    sdf = jnp.asarray(linear_field(cfg))
    w = jnp.ones_like(sdf)

    def f(s):
        v, _ = interpolate.trilinear(cfg, s, w, jnp.float32(0.12), jnp.float32(-0.07), jnp.float32(0.23))
        return v

    g = jax.grad(f)(sdf)
    assert float(jnp.sum(g)) == pytest.approx(1.0, abs=1e-5)
    assert int(jnp.sum(g != 0)) == 8
