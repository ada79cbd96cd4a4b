"""Pallas brick-fusion kernel: interpret-mode parity with the XLA path."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import integrate, make_volume
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume, to_dense
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose


def _run(cfg, poses, depth, use_pallas, rgb=None):
    bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
    # small update budget: interpret-mode pallas executes the grid serially
    for p in poses:
        bv = integrate_bricks(bv, jnp.asarray(depth), jnp.asarray(p, jnp.float32),
                              rgb, 512, use_pallas, use_pallas)
    return bv


def test_pallas_kernel_matches_xla_path(small_cfg):
    cfg = small_cfg
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    bx = _run(cfg, [pose], depth, use_pallas=False)
    bp = _run(cfg, [pose], depth, use_pallas=True)
    assert not bool(bp.overflowed)
    assert int(bx.n_active) == int(bp.n_active)
    np.testing.assert_allclose(np.asarray(bp.sdf), np.asarray(bx.sdf), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bp.weight), np.asarray(bx.weight))
    np.testing.assert_array_equal(np.asarray(bp.nsample), np.asarray(bx.nsample))
    np.testing.assert_allclose(np.asarray(bp.M), np.asarray(bx.M), atol=1e-5)


def test_pallas_two_frames_matches_dense(small_cfg):
    cfg = small_cfg
    poses = [tilted_pose(), tilted_pose(tx=0.063, ty=0.041, tz=-0.88)]
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    dense = make_volume(cfg)
    for p in poses:
        dense = integrate(dense, jnp.asarray(depth), jnp.asarray(p, jnp.float32))
    bp = _run(cfg, poses, depth, use_pallas=True)
    bd = to_dense(bp)
    band = (np.asarray(dense.weight) > 0) & (np.abs(np.asarray(dense.sdf)) < 0.999)
    assert band.sum() > 500
    np.testing.assert_allclose(np.asarray(bd.sdf)[band], np.asarray(dense.sdf)[band],
                               atol=2e-5)
    np.testing.assert_array_equal(np.asarray(bd.weight)[band],
                                  np.asarray(dense.weight)[band])


@pytest.mark.parametrize("mode", ["RGB", "RGBNormalized", "LAB"])
def test_pallas_color_fusion_matches_xla(small_cfg, mode):
    """Color fused THROUGH the kernel (packed-image lookup + XLA transform on
    the kernel's aux observations) matches the pure-XLA color path exactly —
    same transform code consumes identical (r, g, b, w_eff) observations."""
    cfg = small_cfg.with_updates(integrate_color=True, color_mode=mode)
    poses = [tilted_pose(), tilted_pose(tx=0.063, ty=0.041, tz=-0.88)]
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    H, W = np.asarray(depth).shape
    rng = np.random.default_rng(7)
    rgb = jnp.asarray(rng.integers(0, 256, (H, W, 3)), jnp.float32)
    bx = _run(cfg, poses, depth, use_pallas=False, rgb=rgb)
    bp = _run(cfg, poses, depth, use_pallas=True, rgb=rgb)
    assert bx.color is not None and bp.color is not None
    np.testing.assert_array_equal(np.asarray(bp.weight), np.asarray(bx.weight))
    # weight is vreg-tiled [C, 4, V/4]; color is [C, B, B, B, nc] — align flat
    obs = np.asarray(bx.weight).reshape(-1) > 0
    cx = np.asarray(bx.color).reshape(obs.shape[0], -1)[obs]
    cp = np.asarray(bp.color).reshape(obs.shape[0], -1)[obs]
    if mode == "RGB":
        # trunc-after-update uint8 semantics round-trip exactly
        np.testing.assert_array_equal(cp, cx)
    else:
        np.testing.assert_allclose(cp, cx, atol=1e-4)


def test_pallas_weighting_options(small_cfg):
    cfg = small_cfg.with_updates(weight_by_depth=True, weight_by_variance=True)
    pose = tilted_pose()
    rng = np.random.default_rng(3)
    base = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9),
                                   radius=0.3))
    # several frames so the variance gate (nsample > 5) engages; per-frame
    # depth noise keeps M genuinely positive — identical frames make
    # exp(-(d-d0)^2/(2*M/w)) a 0/0 knife edge where the two engines' f32
    # rounding diverges chaotically (and the reference NaN-poisons)
    frames = [(base + rng.normal(0, 0.002, base.shape)).astype(np.float32)
              for _ in range(7)]

    def run(use_pallas):
        bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
        for dep in frames:
            bv = integrate_bricks(bv, jnp.asarray(dep),
                                  jnp.asarray(pose, jnp.float32), None, 512,
                                  use_pallas, use_pallas)
        return bv

    bx = run(False)
    bp = run(True)
    # the exp() in the variance gate amplifies f32 association differences
    np.testing.assert_allclose(np.asarray(bp.sdf), np.asarray(bx.sdf), atol=1e-3)
    np.testing.assert_allclose(np.asarray(bp.weight), np.asarray(bx.weight), atol=1e-3)


def test_pallas_window_matches_full_band(small_cfg):
    """The column-windowed depth lookup (a DEPTH_WINDOW_COLS-wide band slice
    per brick, meta col 6) must fuse identically to the full-width lookup —
    the matmul only drops all-zero terms. Uses a 640-px-wide image so the
    window is genuinely narrower than the padded width."""
    cfg = small_cfg.with_updates(
        image_width=640, image_height=480, focal_length_x=525.0,
        focal_length_y=525.0, principal_point_x=319.5, principal_point_y=239.5)
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)

    def run(window):
        bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
        return integrate_bricks(bv, jnp.asarray(depth),
                                jnp.asarray(pose, jnp.float32), None, 512,
                                True, True, pallas_window=window)

    bw = run(True)
    bf = run(False)
    assert not bool(bw.overflowed)
    assert int(bw.n_active) == int(bf.n_active) > 50
    np.testing.assert_array_equal(np.asarray(bw.weight), np.asarray(bf.weight))
    np.testing.assert_array_equal(np.asarray(bw.nsample), np.asarray(bf.nsample))
    np.testing.assert_allclose(np.asarray(bw.sdf), np.asarray(bf.sdf), atol=1e-6)


@pytest.mark.parametrize("window", [False, True])
def test_pallas_narrow_band_matches_full(small_cfg, window):
    """The 64-row depth band (DEPTH_BAND_NARROW) must fuse identically to the
    128-row band — fitting bricks see the same pixels, taller footprints take
    the XLA fallback, which is bit-identical by the existing parity tests.
    Runs both with and without the column window (the combined configuration
    is the hardware candidate)."""
    cfg = small_cfg.with_updates(
        image_width=640, image_height=480, focal_length_x=525.0,
        focal_length_y=525.0, principal_point_x=319.5, principal_point_y=239.5)
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)

    def run(band):
        bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
        return integrate_bricks(bv, jnp.asarray(depth),
                                jnp.asarray(pose, jnp.float32), None, 512,
                                True, True, pallas_window=window,
                                pallas_band=band)

    bn = run(64)
    bf = run(128)
    assert not bool(bn.overflowed)
    assert int(bn.n_active) == int(bf.n_active) > 50
    np.testing.assert_array_equal(np.asarray(bn.weight), np.asarray(bf.weight))
    np.testing.assert_array_equal(np.asarray(bn.nsample), np.asarray(bf.nsample))
    np.testing.assert_allclose(np.asarray(bn.sdf), np.asarray(bf.sdf), atol=1e-6)


def test_pallas_narrow_band_tall_footprint_fallback(small_cfg):
    """At a distance where brick footprints straddle the 64-row fits
    threshold, band=64 must route the tall bricks through the XLA fallback
    and still match the pure-XLA result bit-for-bit on weights."""
    from cpu_tsdf_tpu.geometry import rigid_inverse
    from cpu_tsdf_tpu.ops.pallas_fusion import brick_meta

    cfg = small_cfg.with_updates(
        image_width=640, image_height=480, focal_length_x=525.0,
        focal_length_y=525.0, principal_point_x=319.5, principal_point_y=239.5)
    # 20 cm bricks at ~2 m project to ~50-60 rows: some fit a 64-row band,
    # some exceed it (all fit 128)
    pose = tilted_pose(tz=-2.0)
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 2.0), radius=0.3)

    def run(use_pallas, band=None):
        bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
        return integrate_bricks(bv, jnp.asarray(depth),
                                jnp.asarray(pose, jnp.float32), None, 512,
                                use_pallas, use_pallas, pallas_band=band)

    bn = run(True, band=64)
    bx = run(False)
    assert int(bn.n_active) > 10
    np.testing.assert_array_equal(np.asarray(bn.weight), np.asarray(bx.weight))
    np.testing.assert_allclose(np.asarray(bn.sdf), np.asarray(bx.sdf), atol=1e-5)

    # prove the scene genuinely mixes fitting and falling-back bricks
    n = int(bn.n_active)
    coords = jnp.asarray(np.asarray(bn.coords)[:n])
    ok_all = jnp.ones((n,), bool)
    pinv = rigid_inverse(jnp.asarray(pose, jnp.float32))
    _, ok64 = brick_meta(cfg, 8, coords[:, 0], coords[:, 1], coords[:, 2],
                         ok_all, pinv, False, 64)
    _, ok128 = brick_meta(cfg, 8, coords[:, 0], coords[:, 1], coords[:, 2],
                          ok_all, pinv, False, 128)
    n64, n128 = int(ok64.sum()), int(ok128.sum())
    assert 0 < n64 < n, (n64, n)
    assert n128 > n64


@pytest.mark.parametrize("band", [64, 128])
def test_pallas_band_covers_bottom_rows_odd_height(small_cfg, band):
    """Regression: with image_height not a multiple of 8 (and > band), the
    band origin used to be clipped against the RAW height and then aligned
    down, leaving the last H % 8 image rows uncovered — bricks at the image
    bottom fused depth from the wrong row. The origin now clips against the
    padded height (pad rows hold the NaN sentinel, so overhang is safe)."""
    cfg = small_cfg.with_updates(
        image_width=256, image_height=130, focal_length_x=140.0,
        focal_length_y=140.0, principal_point_x=127.5, principal_point_y=64.5)
    pose = tilted_pose()
    # sphere low in the image: its silhouette reaches the bottom rows
    depth = sphere_depth(cfg, center=(-0.013, 0.27, 0.9), radius=0.3)
    d = np.asarray(depth)
    assert np.isfinite(d[125:130]).any(), "scene must cover the bottom rows"

    def run(use_pallas):
        bv = make_brick_volume(cfg, brick_size=8, capacity=2048)
        return integrate_bricks(bv, jnp.asarray(depth),
                                jnp.asarray(pose, jnp.float32), None, 512,
                                use_pallas, use_pallas, pallas_band=band)

    bp = run(True)
    bx = run(False)
    assert int(bp.n_active) > 20
    np.testing.assert_array_equal(np.asarray(bp.weight), np.asarray(bx.weight))
    np.testing.assert_allclose(np.asarray(bp.sdf), np.asarray(bx.sdf), atol=1e-5)


def test_module_flag_flip_retraces(small_cfg, monkeypatch):
    """Flipping USE_DEPTH_WINDOW / USE_NARROW_BAND between calls must reach
    the jitted core as a different static cache key (the wrapper resolves
    the module defaults at every call). Window/band variants fuse
    identically by construction, so the observable is the trace count."""
    from cpu_tsdf_tpu import bricks as bricks_mod
    from cpu_tsdf_tpu.ops import pallas_fusion as pf

    # image size + capacity unique to THIS test: the assertions count cache
    # entries, so sharing shapes with another test's executables (full-suite
    # order) would make the expected deltas zero
    cfg = small_cfg.with_updates(
        image_width=544, image_height=416, focal_length_x=470.0,
        focal_length_y=470.0, principal_point_x=271.5, principal_point_y=207.5)
    pose = jnp.asarray(tilted_pose(), jnp.float32)
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9),
                                     radius=0.3))

    def run():
        bv = make_brick_volume(cfg, brick_size=8, capacity=1280)
        return integrate_bricks(bv, depth, pose, None, 512, True, True)

    jit_core = bricks_mod._integrate_bricks_jit
    monkeypatch.setattr(pf, "USE_DEPTH_WINDOW", False)
    monkeypatch.setattr(pf, "USE_NARROW_BAND", False)
    b0 = run()
    n0 = jit_core._cache_size()
    b1 = run()  # same flags: cache hit
    assert jit_core._cache_size() == n0
    monkeypatch.setattr(pf, "USE_DEPTH_WINDOW", True)
    b2 = run()  # flipped flag: MUST retrace, not reuse the stale executable
    assert jit_core._cache_size() == n0 + 1
    monkeypatch.setattr(pf, "USE_NARROW_BAND", True)
    b3 = run()
    assert jit_core._cache_size() == n0 + 2
    for b in (b1, b2, b3):
        np.testing.assert_array_equal(np.asarray(b.weight),
                                      np.asarray(b0.weight))


def _near_patch_scene(small_cfg):
    """640x480 scene with a far sphere plus a small NEAR patch (z = 0.12 m):
    the bricks under the patch project to footprints spanning several
    (128-row x 256-col) kernel tiles, forcing the multipass path while the
    rest of the scene stays single-pass."""
    cfg = small_cfg.with_updates(
        image_width=640, image_height=480, focal_length_x=525.0,
        focal_length_y=525.0, principal_point_x=319.5,
        principal_point_y=239.5, min_sensor_dist=0.02)
    pose = tilted_pose()
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9),
                                    radius=0.3)).copy()
    depth[200:300, 280:380] = 0.12
    return cfg, pose, depth


def _multipass_count(cfg, bv, pose, window=True):
    """Number of extra kernel passes the active set needs this frame."""
    import jax.numpy as jnp_

    from cpu_tsdf_tpu.geometry import rigid_inverse
    from cpu_tsdf_tpu.ops import pallas_fusion as pf

    n = int(bv.n_active)
    coords = jnp_.asarray(np.asarray(bv.coords)[:n])
    ok = jnp_.ones((n,), bool)
    pinv = rigid_inverse(jnp_.asarray(pose, jnp_.float32))
    meta, okm, tiles = pf.brick_meta(cfg, 8, coords[:, 0], coords[:, 1],
                                     coords[:, 2], ok, pinv, window, 128,
                                     multipass=True)
    slots = jnp_.arange(n, dtype=jnp_.int32)
    _, _, total = pf.expand_extra_meta(cfg, n + 1, meta, slots, okm, tiles,
                                       window, 128)
    return int(total)


def test_pallas_multipass_near_camera(small_cfg, monkeypatch):
    """Bricks whose footprint spans several kernel tiles (near-camera patch)
    run as multiple disjoint-validity kernel passes and match the XLA
    engine: EXACT weights/nsample prove every voxel got exactly one
    observation (a double-counted pass would add weight)."""
    from cpu_tsdf_tpu.ops import pallas_fusion as pf

    monkeypatch.setattr(pf, "EXTRA_PASS_BUDGET", 256)  # interpret-mode speed;
    # the budget feeds the meta_extra SHAPE, so the jit cache key tracks it
    cfg, pose, depth = _near_patch_scene(small_cfg)
    bx = _run(cfg, [pose], depth, use_pallas=False)
    bp = _run(cfg, [pose], depth, use_pallas=True)
    assert not bool(bp.overflowed)
    n_extra = _multipass_count(cfg, bx, pose)
    assert n_extra > 0, "scene must genuinely need extra passes"
    assert int(bx.n_active) == int(bp.n_active)
    np.testing.assert_array_equal(np.asarray(bp.weight), np.asarray(bx.weight))
    np.testing.assert_array_equal(np.asarray(bp.nsample),
                                  np.asarray(bx.nsample))
    np.testing.assert_allclose(np.asarray(bp.sdf), np.asarray(bx.sdf),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(bp.M), np.asarray(bx.M), atol=1e-5)


def test_pallas_multipass_color(small_cfg, monkeypatch):
    """Multipass bricks fuse color exactly: the per-pass aux rows have
    disjoint validity and fold back into the main rows via scatter-max."""
    from cpu_tsdf_tpu.ops import pallas_fusion as pf

    monkeypatch.setattr(pf, "EXTRA_PASS_BUDGET", 256)
    cfg, pose, depth = _near_patch_scene(small_cfg)
    cfg = cfg.with_updates(integrate_color=True, color_mode="RGB")
    rng = np.random.default_rng(11)
    rgb = jnp.asarray(rng.integers(0, 256, depth.shape + (3,)), jnp.float32)
    bx = _run(cfg, [pose], depth, use_pallas=False, rgb=rgb)
    bp = _run(cfg, [pose], depth, use_pallas=True, rgb=rgb)
    assert not bool(bp.overflowed)
    np.testing.assert_array_equal(np.asarray(bp.weight), np.asarray(bx.weight))
    # weight is vreg-tiled [C, 4, V/4]; color is [C, B, B, B, nc] — align flat
    obs = np.asarray(bx.weight).reshape(-1) > 0
    cx = np.asarray(bx.color).reshape(obs.shape[0], -1)[obs]
    cp = np.asarray(bp.color).reshape(obs.shape[0], -1)[obs]
    np.testing.assert_array_equal(cp, cx)


def test_pallas_multipass_budget_overflow_flag(small_cfg, monkeypatch):
    """More extra passes than EXTRA_PASS_BUDGET must raise `overflowed`
    (missing passes are never silent)."""
    from cpu_tsdf_tpu.ops import pallas_fusion as pf

    cfg, pose, depth = _near_patch_scene(small_cfg)
    needed = None
    bx = _run(cfg, [pose], depth, use_pallas=False)
    needed = _multipass_count(cfg, bx, pose)
    assert needed > 2
    monkeypatch.setattr(pf, "EXTRA_PASS_BUDGET", 2)
    bp = _run(cfg, [pose], depth, use_pallas=True)
    assert bool(bp.overflowed)


def test_pallas_kernel_anisotropic_cells(small_cfg):
    """The fusion kernel's projection/fits math uses per-axis cell sizes;
    pin kernel-vs-XLA parity on a volume with three DIFFERENT cell sizes
    (the anisotropic e2e test only covers the XLA brick engine)."""
    cfg = small_cfg.with_updates(yres=48, zres=80)  # 2.5 / 3.33 / 2 cm cells
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    bx = _run(cfg, [pose], depth, use_pallas=False)
    bp = _run(cfg, [pose], depth, use_pallas=True)
    assert int(bp.n_active) == int(bx.n_active) > 20
    np.testing.assert_array_equal(np.asarray(bp.weight), np.asarray(bx.weight))
    np.testing.assert_allclose(np.asarray(bp.sdf), np.asarray(bx.sdf), atol=1e-5)
