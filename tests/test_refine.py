"""Differentiable pose refinement: gradients through the raycast recover a
perturbed camera pose (the framework's north-star differentiability test)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import integrate, make_volume
from cpu_tsdf_tpu.refine import exp_se3, refine_pose
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose


def test_exp_se3_properties():
    np.testing.assert_allclose(np.asarray(exp_se3(jnp.zeros(6))), np.eye(4), atol=1e-6)
    tw = jnp.asarray([0.01, -0.02, 0.03, 0.05, -0.04, 0.02])
    m = np.asarray(exp_se3(tw))
    R = m[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)
    minv = np.asarray(exp_se3(-tw))
    np.testing.assert_allclose(minv @ m, np.eye(4), atol=1e-4)


@pytest.mark.slow
def test_pose_refinement_recovers_perturbation(small_cfg):
    cfg = small_cfg.with_updates(xres=128, yres=128, zres=128,
                                 max_dist_pos=0.04, max_dist_neg=0.04)
    pose_true = tilted_pose()
    # three non-collinear spheres: one sphere has orbit symmetry, two share a
    # rotation about their center line — three make the pose fully observable
    d1 = sphere_depth(cfg, center=(-0.1, -0.021, 0.95), radius=0.25)
    d2 = sphere_depth(cfg, center=(0.18, 0.1, 0.8), radius=0.15)
    d3 = sphere_depth(cfg, center=(0.05, -0.17, 0.7), radius=0.12)
    depth = np.nanmin(np.stack([np.where(np.isnan(d1), np.inf, d1),
                                np.where(np.isnan(d2), np.inf, d2),
                                np.where(np.isnan(d3), np.inf, d3)]), 0)
    depth = np.where(np.isinf(depth), np.nan, depth).astype(np.float32)
    vol = make_volume(cfg)
    vol = integrate(vol, jnp.asarray(depth), jnp.asarray(pose_true, jnp.float32))

    # perturb the pose by ~2.5 cm / ~2 deg — well above the projective-TSDF
    # bias floor of the alignment residual
    tw = jnp.asarray([0.024, -0.018, 0.015, 0.03, -0.024, 0.018])
    pose_bad = np.asarray(exp_se3(tw)) @ pose_true

    def pose_err(p):
        d = np.asarray(p) @ np.linalg.inv(pose_true)
        return float(np.linalg.norm(d[:3, 3]) +
                     np.linalg.norm(d[:3, :3] - np.eye(3)))

    e0 = pose_err(pose_bad)
    refined, losses = refine_pose(vol, pose_bad, depth, iters=15,
                                  downsample_by=1)
    e1 = pose_err(np.asarray(refined))
    # The Gauss-Newton alignment reliably drops the residual several-fold and
    # recovers a substantial part of the perturbation; the remaining offset
    # tracks the projective-TSDF discretization bias at this resolution
    # (documented; tightening is round-2 conditioning work).
    assert losses[-1] < losses[0] * 0.5, losses
    assert e1 < e0 * 0.75, (e0, e1)
