"""Pallas ray-march kernel vs the XLA renderer (interpret mode on CPU).

The kernel marches per (brick, tile) pair with its own grid anchor, so
bracket positions can differ from the XLA path's global grid by up to half a
cell; on grazing rays that amplifies into mm-scale t* differences in BOTH
methods (the XLA path itself agrees with the numpy oracle only to ~90% at
2e-3 — test_raycast.py). Gates here: high validity agreement, tight bulk
agreement, and equal accuracy against the ground-truth input depth.

Interpret-mode tracing of the kernel takes minutes, so every test shares ONE
kernel invocation (same static config -> one trace); the real-TPU compiled
parity check runs in bench.py where a chip is present.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import render_view
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.ops.pallas_raycast import make_render_pack, render_view_pallas
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose


@pytest.fixture(scope="module")
def scene():
    from conftest import TSDFConfig

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
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
    rgb = np.broadcast_to(np.array([200.0, 64.0, 32.0], np.float32),
                          depth.shape + (3,)).copy()
    bv = make_brick_volume(cfg, 8, 2048)
    bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(pose, jnp.float32),
                          jnp.asarray(rgb))
    return cfg, bv, pose, depth


@pytest.fixture(scope="module")
def renders(scene):
    cfg, bv, pose, depth = scene
    rx = render_view(bv, pose, colored=True)
    rp = render_view_pallas(bv, pose, colored=True, r_budget=1024,
                            pair_budget=4096, interpret=True)
    return rx, rp


def test_kernel_matches_xla_march(scene, renders):
    cfg, bv, pose, depth = scene
    rx, rp = renders
    dx, dp = np.asarray(rx.depth), np.asarray(rp.depth)
    vx, vp = ~np.isnan(dx), ~np.isnan(dp)
    assert vx.sum() > 800
    assert (vx == vp).mean() > 0.97
    both = vx & vp
    err = np.abs(dx[both] - dp[both])
    assert np.median(err) < 1e-4
    assert (err < 2e-3).mean() > 0.8       # tail = grazing silhouette rays


def test_kernel_accuracy_matches_xla(scene, renders):
    """Against ground truth the kernel must be as accurate as the XLA path
    (the disagreement tail is method noise, not kernel error)."""
    cfg, bv, pose, depth = scene
    rx, rp = renders
    stats = {}
    for name, d in (("xla", np.asarray(rx.depth)), ("pallas", np.asarray(rp.depth))):
        both = ~np.isnan(depth) & ~np.isnan(d)
        err = np.abs(d[both] - depth[both])
        stats[name] = (np.median(err), err.mean())
    assert stats["pallas"][0] < stats["xla"][0] * 1.25
    assert stats["pallas"][1] < stats["xla"][1] * 1.25


def test_kernel_normals_match(scene, renders):
    rx, rp = renders
    nx, np_ = np.asarray(rx.normals), np.asarray(rp.normals)
    bn = ~np.isnan(nx[..., 0]) & ~np.isnan(np_[..., 0])
    assert bn.sum() > 600
    dots = np.clip((nx[bn] * np_[bn]).sum(-1), -1, 1)
    assert np.median(np.degrees(np.arccos(dots))) < 0.5
    assert (dots > 0.99).mean() > 0.9


def test_kernel_colored(scene, renders):
    """renderColoredView analog: voxel RGB at the hit (cpp:427-450)."""
    cfg, bv, pose, depth = scene
    rx, rp = renders
    c = np.asarray(rp.rgb)
    ok = ~np.isnan(c[..., 0])
    assert ok.sum() > 500
    np.testing.assert_allclose(c[ok].mean(0), [200, 64, 32], atol=2.0)


def test_kernel_prebuilt_pack_and_fallbacks(scene, renders):
    cfg, bv, pose, depth = scene
    rx, rp = renders
    # prebuilt pack produces the same thing without rebuilding tables
    pack = make_render_pack(bv, 1024)
    assert int(pack.n_active) == int(bv.n_active)
    assert np.isfinite(np.asarray(pack.tables)).any()
    # a non-8^3 brick volume cannot use the kernel -> exact XLA fallback
    from cpu_tsdf_tpu.bricks import from_dense, to_dense

    bv4 = from_dense(to_dense(bv), brick_size=4)
    rf = render_view_pallas(bv4, pose, colored=True, r_budget=1024,
                            pair_budget=4096, interpret=True)
    np.testing.assert_array_equal(np.asarray(render_view(bv4, pose, colored=True).depth),
                                  np.asarray(rf.depth))


def test_kernel_downsample(scene):
    cfg, bv, pose, depth = scene
    rp = render_view_pallas(bv, pose, downsample_by=2, r_budget=1024,
                            pair_budget=4096, interpret=True)
    assert rp.depth.shape == (cfg.image_height // 2, cfg.image_width // 2)
    assert np.isfinite(np.asarray(rp.depth)).sum() > 150


def test_kernel_custom_vjp_gradients(scene):
    """The Pallas render is differentiable via the custom VJP (kernel
    forward, XLA phase-3 backward): gradients w.r.t. the SDF field and the
    camera pose are finite, nonzero, and the pose-z directional derivative
    matches finite differences."""
    import dataclasses

    import jax

    from cpu_tsdf_tpu.ops.pallas_raycast import render_depth_pallas_diff

    cfg, bv, pose, depth = scene
    pose = jnp.asarray(pose, jnp.float32)

    def mean_depth(sdf, tz):
        v2 = dataclasses.replace(bv, sdf=sdf)
        p2 = pose.at[2, 3].add(tz)
        d, valid, _ok = render_depth_pallas_diff(v2, p2, 1, 4096, 1024, True)
        return jnp.sum(jnp.where(valid, d, 0.0)) / jnp.maximum(jnp.sum(valid), 1)

    (g_sdf, g_tz) = jax.grad(mean_depth, argnums=(0, 1))(bv.sdf, 0.0)
    gs = np.asarray(g_sdf)
    assert np.isfinite(gs).all()
    assert (gs != 0).sum() > 50
    assert np.isfinite(float(g_tz)) and float(g_tz) != 0.0
    # FD gate on the (smooth) pose-z derivative
    eps = 1e-4
    f0 = float(mean_depth(bv.sdf, -eps))
    f1 = float(mean_depth(bv.sdf, eps))
    fd = (f1 - f0) / (2 * eps)
    assert abs(fd - float(g_tz)) < 0.25 * max(abs(fd), abs(float(g_tz)), 1e-3), \
        (fd, float(g_tz))


def test_pack_handles_gapped_slots(scene):
    """make_render_pack must key liveness off coords, not a slot prefix:
    merge_sharded volumes carry per-device slot GAPS (global slot =
    dev * C_local + local). A gap-shifted clone must render identically."""
    import dataclasses

    cfg, bv, pose, depth = scene
    G = 7  # shift every live slot up by G, leaving a dead gap at the front

    def shift_rows(a):
        return jnp.concatenate([jnp.zeros((G,) + a.shape[1:], a.dtype),
                                a[:-G]], 0)

    gapped = dataclasses.replace(
        bv,
        brick_map=jnp.where(bv.brick_map >= 0, bv.brick_map + G, -1),
        coords=jnp.concatenate([jnp.full((G, 3), -1, jnp.int32),
                                bv.coords[:-G]], 0),
        sdf=shift_rows(bv.sdf), weight=shift_rows(bv.weight),
        M=shift_rows(bv.M), nsample=shift_rows(bv.nsample),
        color=None if bv.color is None else shift_rows(bv.color),
    )
    p0 = make_render_pack(bv, 1024)
    p1 = make_render_pack(gapped, 1024)
    # same table content, shifted by G rows
    t0 = np.asarray(p0.tables)
    t1 = np.asarray(p1.tables)
    n = int(bv.n_active)
    np.testing.assert_array_equal(t0[:n], t1[G:G + n])
    assert not bool(p0.truncated) and not bool(p1.truncated)
    # truncation flag trips when live bricks exceed the budget
    r_small = 16
    assert bool(make_render_pack(bv, r_small).truncated)


def test_diff_render_reports_overflow(scene):
    """render_depth_pallas_diff returns ok=False when bricks were dropped
    beyond r_budget (ADVICE r2: silent truncation made gradients wrong)."""
    cfg, bv, pose, depth = scene
    from cpu_tsdf_tpu.ops.pallas_raycast import render_depth_pallas_diff

    d, valid, ok = render_depth_pallas_diff(bv, jnp.asarray(pose, jnp.float32),
                                            4, 4096, 16, True)
    assert not bool(ok)


def test_kernel_asymmetric_truncation():
    """max_dist_pos > max_dist_neg was untested end-to-end: the pre-crossing
    march step reaches |d|*mdn ~ max_dist_pos, so the backtrack budget must
    cover the LARGER truncation bound (it used only max_dist_neg, stranding
    the backtrack mid-walk). Kernel must agree with the XLA march."""
    from conftest import TSDFConfig

    cfg = TSDFConfig(
        xres=128, yres=128, zres=128, xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.08, max_dist_neg=0.03,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=64, image_height=48,
        focal_length_x=56.0, focal_length_y=56.0,
        principal_point_x=32.0, principal_point_y=24.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4)
    pose = tilted_pose()
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9),
                                    radius=0.3))
    bv = make_brick_volume(cfg, 8, 2048)
    bv = integrate_bricks(bv, jnp.asarray(depth),
                          jnp.asarray(pose, jnp.float32))
    rx = render_view(bv, pose)
    rp = render_view_pallas(bv, pose, r_budget=1024, pair_budget=4096,
                            interpret=True)
    dx, dp = np.asarray(rx.depth), np.asarray(rp.depth)
    vx, vp = ~np.isnan(dx), ~np.isnan(dp)
    assert vx.sum() > 800
    assert (vx == vp).mean() > 0.97
    both = vx & vp
    err = np.abs(dx[both] - dp[both])
    assert np.median(err) < 2e-4, np.median(err)
