"""Differentiable camera-pose refinement against a fused TSDF volume.

The reference's differentiability surface is the analytic field-query API
(`getFxn/getGradient/getHessian`, SURVEY §3.5) — intended for downstream pose
optimization. Here the whole pipeline is differentiable, so pose refinement
is a first-class capability: render the volume from a pose estimate, compare
against the observed depth image, and descend the gradient through the
raycast's analytic zero-crossing refinement (ops/raycast.py phase 3).

The pose is parameterized in the se(3) tangent at the current estimate
(left-multiplied twist), so gradients are well-conditioned and the estimate
stays on SE(3).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def exp_se3(twist):
    """Exponential map se(3) -> SE(4x4). twist = (v[3], w[3]).

    Matmul precision is pinned to f32: XLA's DEFAULT f32 matmul on TPU
    computes in bf16 (measured 2.6e-3 error on a 3x3 product —
    bench/window_debug round 4), which would corrupt rotations by ~0.1
    degree per composition."""
    with jax.default_matmul_precision("float32"):
        return _exp_se3_inner(twist)


def _exp_se3_inner(twist):
    v, w = twist[:3], twist[3:]
    theta = jnp.sqrt(jnp.sum(w * w) + 1e-20)
    K = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ]) / theta
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    V = jnp.eye(3) + (1.0 - c) / theta * K + (theta - s) / theta * (K @ K)
    small = theta < 1e-6
    R = jnp.where(small, jnp.eye(3), R)
    V = jnp.where(small, jnp.eye(3), V)
    m = jnp.eye(4)
    m = m.at[:3, :3].set(R)
    m = m.at[:3, 3].set(V @ v)
    return m


def _compose(a, b):
    """4x4 pose composition at f32 matmul precision (TPU DEFAULT is bf16)."""
    with jax.default_matmul_precision("float32"):
        return a @ b


def depth_residual(vol, pose, depth_obs, downsample_by: int = 1,
                   max_steps: int = 256):
    """Point-to-TSDF alignment residual (KinectFusion-style).

    Backprojects the observed depth image to camera-frame points, transforms
    them by the pose estimate, and evaluates the (differentiable) trilinear
    TSDF — the fused surface is its zero level set, so |TSDF| measures the
    registration error. This is the differentiable counterpart of the
    reference's getFxn/getGradient pose-alignment surface (SURVEY §3.5).
    """
    r, valid = _alignment_residuals(vol, pose, depth_obs, downsample_by)
    delta = 0.01
    hub = jnp.where(jnp.abs(r) < delta, 0.5 * r * r,
                    delta * (jnp.abs(r) - 0.5 * delta))
    hub = jnp.where(valid, hub, 0.0)
    return jnp.sum(hub) / jnp.maximum(jnp.sum(valid), 1)


def _alignment_residuals(vol, pose, depth_obs, downsample_by: int):
    """Per-point TSDF residuals (meters) and validity for the alignment."""
    from .ops.interpolate import tsdf_value_vol

    cfg = vol.config
    obs = depth_obs[::downsample_by, ::downsample_by]
    H, W = obs.shape
    uu = jnp.arange(W, dtype=jnp.float32)[None, :] * downsample_by
    vv = jnp.arange(H, dtype=jnp.float32)[:, None] * downsample_by
    x = (uu - cfg.principal_point_x) / cfg.focal_length_x * obs
    y = (vv - cfg.principal_point_y) / cfg.focal_length_y * obs
    ok = ~jnp.isnan(obs)
    zs = jnp.where(ok, obs, 1.0)
    xs = jnp.where(ok, x, 0.0)
    ys = jnp.where(ok, y, 0.0)
    px = pose[0, 0] * xs + pose[0, 1] * ys + pose[0, 2] * zs + pose[0, 3]
    py = pose[1, 0] * xs + pose[1, 1] * ys + pose[1, 2] * zs + pose[1, 3]
    pz = pose[2, 0] * xs + pose[2, 1] * ys + pose[2, 2] * zs + pose[2, 3]
    val, valid = tsdf_value_vol(vol, px.reshape(-1), py.reshape(-1), pz.reshape(-1))
    valid &= ok.reshape(-1)
    return val * cfg.max_dist_neg, valid


@partial(jax.jit, static_argnums=(3, 4))
def refine_pose_step(vol, pose, depth_obs, downsample_by: int = 1,
                     max_steps: int = 256, lr=1.0):
    """One damped Gauss-Newton step on the se(3) tangent. Returns
    (new_pose, loss). `lr` acts as the step scale (1.0 = full GN step) and
    its inverse as Levenberg damping."""
    def res_fn(twist):
        r, valid = _alignment_residuals(vol, _compose(exp_se3(twist), pose),
                                        depth_obs, downsample_by)
        return jnp.where(valid, r, 0.0), valid

    twist0 = jnp.zeros(6)
    (r0, valid), = (res_fn(twist0),)
    # forward-mode: 6 jvp tangents (cheap for a 6-dim input, and avoids
    # rematerializing the residual graph 6x like jacrev would)
    J = jax.jacfwd(lambda t: res_fn(t)[0])(twist0)      # [N, 6]
    # f32 precision: the DEFAULT bf16 TPU matmul loses up to ~19% on
    # small JtJ entries (measured), wrecking the GN step's conditioning
    with jax.default_matmul_precision("float32"):
        JtJ = J.T @ J
        Jtr = J.T @ r0
    lam = (1.0 / jnp.maximum(lr, 1e-6) - 1.0) + 1e-3
    delta = -jnp.linalg.solve(JtJ + lam * jnp.trace(JtJ) / 6.0 * jnp.eye(6), Jtr)
    # trust region: cap the twist norm at 5 cm / 0.05 rad per step
    nrm = jnp.linalg.norm(delta)
    delta = jnp.where(nrm > 0.05, delta * (0.05 / nrm), delta)
    loss = jnp.sum(r0 * r0) / jnp.maximum(jnp.sum(valid), 1)
    return _compose(exp_se3(delta), pose), loss


_residual_jit = jax.jit(depth_residual, static_argnums=(3, 4))


def refine_pose(vol, pose_init, depth_obs, iters: int = 20,
                downsample_by: int = 2, max_steps: int = 256,
                lr: float = 1.0) -> Tuple[jnp.ndarray, list]:
    """Levenberg-style pose refinement: damped Gauss-Newton steps, accepted
    only when they lower the alignment residual (lr = 1.0 means undamped GN;
    rejected steps increase the damping)."""
    pose = jnp.asarray(pose_init, jnp.float32)
    depth_obs = jnp.asarray(depth_obs)
    best = float(_residual_jit(vol, pose, depth_obs, downsample_by, max_steps))
    losses = [best]
    step = lr
    for _ in range(iters):
        cand, _ = refine_pose_step(vol, pose, depth_obs,
                                   downsample_by, max_steps, step)
        cand_loss = float(_residual_jit(vol, cand, depth_obs,
                                        downsample_by, max_steps))
        if cand_loss < best:
            pose = cand
            best = cand_loss
            step = min(step * 2.0, lr)
        else:
            step *= 0.25
            if step < lr * 1e-4:
                break
        losses.append(best)
    return pose, losses
