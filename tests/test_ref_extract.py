"""Golden validation against the COMPILED reference octree.

bench/ref_extract builds /root/reference/src/lib/octree.cpp verbatim (PCL
console + boost stubbed) under a faithful driver restatement of
integrateCloud/updateVoxel. This closes the round-1 gap where every golden
gate compared against a Python re-statement written by the same author: the
fusion average, weight cap, Welford M/nsample, split topology and color
fusion here are genuine reference machine code.

Frustum culling is PCL-only and omitted in the harness, so the framework
runs with frustum_culling=False for these comparisons.
"""

import os
import struct
import subprocess

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import integrate, make_volume
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose

REF_DIR = os.path.join(os.path.dirname(__file__), "..", "bench", "ref_extract")
EXE = os.path.join(REF_DIR, "ref_fuse")


def _build():
    if os.path.exists(EXE):
        return True
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-I", os.path.join(REF_DIR, "stubs"),
             "-I", "/root/reference/include",
             os.path.join(REF_DIR, "ref_fuse.cpp"),
             "/root/reference/src/lib/octree.cpp", "-o", EXE],
            check=True, timeout=180, capture_output=True)
        return True
    except Exception:
        return False


def _run_reference(cfg, frames, rgbs=None, color_mode="RGB"):
    """Run the compiled reference fusion; returns dict voxel-index -> fields."""
    use_color = rgbs is not None
    buf = struct.pack(
        "<7i", cfg.xres, cfg.image_width, cfg.image_height, int(use_color),
        int(cfg.weight_by_depth), int(cfg.weight_by_variance), len(frames))
    buf += struct.pack(
        "<11f", cfg.xsize, cfg.max_dist_pos, cfg.max_dist_neg, cfg.max_weight,
        cfg.min_sensor_dist, cfg.max_sensor_dist, cfg.focal_length_x,
        cfg.focal_length_y, cfg.principal_point_x, cfg.principal_point_y,
        cfg.max_cell_size_x)
    for i, (pose, depth) in enumerate(frames):
        buf += np.asarray(pose, np.float32).reshape(16).tobytes()
        buf += np.asarray(depth, np.float32).tobytes()
        if use_color:
            buf += np.clip(np.asarray(rgbs[i]), 0, 255).astype(np.uint8).tobytes()
    out = subprocess.run([EXE, color_mode], input=buf, capture_output=True,
                         timeout=300, check=True).stdout
    (n,) = struct.unpack_from("<i", out, 0)
    rec = np.frombuffer(out[4:], dtype=np.dtype(
        [("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("d", "<f4"), ("w", "<f4"),
         ("M", "<f4"), ("ns", "<i4"), ("r", "u1"), ("g", "u1"), ("b", "u1")]),
        count=n)
    cell = cfg.xsize / cfg.xres
    ix = np.floor((rec["x"] + cfg.xsize / 2) / cell).astype(int)
    iy = np.floor((rec["y"] + cfg.ysize / 2) / cell).astype(int)
    iz = np.floor((rec["z"] + cfg.zsize / 2) / cell).astype(int)
    return {"idx": (ix, iy, iz), "rec": rec}


@pytest.fixture(scope="module")
def have_ref():
    if not os.path.isdir("/root/reference") or not _build():
        pytest.skip("reference sources / toolchain unavailable")
    return True


@pytest.mark.slow
def test_fusion_matches_compiled_reference(have_ref, small_cfg):
    cfg = small_cfg.with_updates(frustum_culling=False)
    pose = tilted_pose()
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
    ref = _run_reference(cfg, [(pose, depth)])
    vol = integrate(make_volume(cfg), jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    d = np.asarray(vol.sdf)
    w = np.asarray(vol.weight)
    M = np.asarray(vol.M)
    ns = np.asarray(vol.nsample)
    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    assert len(rec) > 1000
    np.testing.assert_allclose(d[ix, iy, iz], rec["d"], atol=2e-5)
    np.testing.assert_allclose(w[ix, iy, iz], rec["w"], atol=1e-5)
    np.testing.assert_allclose(M[ix, iy, iz], rec["M"], atol=2e-5)
    np.testing.assert_array_equal(ns[ix, iy, iz], rec["ns"])


@pytest.mark.slow
def test_multiframe_matches_compiled_reference(have_ref, small_cfg):
    """Two-frame fusion including the weight-cap-after-average path and the
    reference's split-on-demand topology."""
    cfg = small_cfg.with_updates(frustum_culling=False, max_weight=1.5)
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
    frames = [(tilted_pose(), depth),
              (tilted_pose(tx=0.063, ty=0.041, tz=-0.88), depth)]
    ref = _run_reference(cfg, frames)
    vol = make_volume(cfg)
    for pose, dep in frames:
        vol = integrate(vol, jnp.asarray(dep), jnp.asarray(pose, jnp.float32))
    d = np.asarray(vol.sdf)
    w = np.asarray(vol.weight)
    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    # voxels the octree split only in frame 2 miss frame 1's observation at
    # the fine level (children start fresh) while the dense grid keeps every
    # voxel at finest resolution from frame 1 on. Compare where the sample
    # counts agree — the shared-history voxels must match bit-for-bit-ish.
    same = np.asarray(vol.nsample)[ix, iy, iz] == rec["ns"]
    assert same.sum() > 600
    np.testing.assert_allclose(d[ix, iy, iz][same], rec["d"][same], atol=3e-5)
    np.testing.assert_allclose(w[ix, iy, iz][same], rec["w"][same], atol=2e-5)


@pytest.mark.slow
def test_color_fusion_matches_compiled_reference(have_ref, small_cfg):
    """RGB fusion through the genuine RGBNode::addObservation
    (octree.cpp:328-376), including the uint8 truncation quirk."""
    cfg = small_cfg.with_updates(frustum_culling=False, integrate_color=True,
                                 color_mode="RGB")
    pose = tilted_pose()
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
    H, W = depth.shape
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (H, W, 3)).astype(np.float32)
    ref = _run_reference(cfg, [(pose, depth)], rgbs=[rgb], color_mode="RGB")
    vol = integrate(make_volume(cfg), jnp.asarray(depth),
                    jnp.asarray(pose, jnp.float32), jnp.asarray(rgb))
    from cpu_tsdf_tpu.ops.color import color_to_rgb

    r_, g_, b_ = color_to_rgb("RGB", vol.color)
    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    obsd = np.asarray(vol.weight)[ix, iy, iz] > 0
    assert obsd.all()
    for ours, theirs in ((r_, rec["r"]), (g_, rec["g"]), (b_, rec["b"])):
        got = np.asarray(ours)[ix, iy, iz]
        np.testing.assert_allclose(got, theirs.astype(np.float32), atol=1.0)


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["RGBNormalized", "LAB"])
def test_exotic_color_modes_match_compiled_reference(have_ref, small_cfg, mode):
    """RGBNormalized (chromaticity + intensity, octree.cpp:379-434) and LAB
    (CIELAB-space averaging with the nonstandard conversion thresholds,
    octree.cpp:436-581) against the genuine compiled node classes."""
    cfg = small_cfg.with_updates(frustum_culling=False, integrate_color=True,
                                 color_mode=mode)
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
    H, W = depth.shape
    rng = np.random.RandomState(11)
    rgbs = [rng.randint(0, 256, (H, W, 3)).astype(np.float32) for _ in range(2)]
    frames = [(tilted_pose(), depth),
              (tilted_pose(tx=0.063, ty=0.041, tz=-0.88), depth)]
    ref = _run_reference(cfg, frames, rgbs=rgbs, color_mode=mode)
    vol = make_volume(cfg)
    for (pose, dep), rgb in zip(frames, rgbs):
        vol = integrate(vol, jnp.asarray(dep), jnp.asarray(pose, jnp.float32),
                        jnp.asarray(rgb))
    from cpu_tsdf_tpu.ops.color import color_to_rgb

    r_, g_, b_ = color_to_rgb(mode, vol.color)
    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    same = np.asarray(vol.nsample)[ix, iy, iz] == rec["ns"]
    assert same.sum() > 600
    for ours, theirs in ((r_, rec["r"]), (g_, rec["g"]), (b_, rec["b"])):
        got = np.asarray(ours)[ix, iy, iz][same]
        want = theirs.astype(np.float32)[same]
        # both sides truncate to uint8 through the same conversions; allow
        # one count of rounding wobble at the f32/f64 boundary
        assert (np.abs(got - want) <= 1.0).mean() > 0.99


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["RGB", "RGBNormalized", "LAB"])
def test_vol_codec_parses_genuine_reference_stream(have_ref, small_cfg, mode,
                                                   tmp_path):
    """Octree::serialize bytes from the COMPILED reference (octree.cpp:645-657
    + per-node-type color prefixes) parse through our .vol codec: node layout
    (prefix sizes!) must be exact or the stream misaligns, so matching
    d/w/M/nsample at every observed finest leaf proves byte-level interop for
    all three color node types."""
    import io

    cfg = small_cfg.with_updates(frustum_culling=False, integrate_color=True,
                                 color_mode=mode)
    pose = tilted_pose()
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
    H, W = depth.shape
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (H, W, 3)).astype(np.float32)

    stream_path = str(tmp_path / "ref_octree.bin")
    # re-run the oracle with the serialize dump argument
    buf = struct.pack(
        "<7i", cfg.xres, cfg.image_width, cfg.image_height, 1,
        int(cfg.weight_by_depth), int(cfg.weight_by_variance), 1)
    buf += struct.pack(
        "<11f", cfg.xsize, cfg.max_dist_pos, cfg.max_dist_neg, cfg.max_weight,
        cfg.min_sensor_dist, cfg.max_sensor_dist, cfg.focal_length_x,
        cfg.focal_length_y, cfg.principal_point_x, cfg.principal_point_y,
        cfg.max_cell_size_x)
    buf += np.asarray(pose, np.float32).reshape(16).tobytes()
    buf += depth.astype(np.float32).tobytes()
    buf += np.clip(rgb, 0, 255).astype(np.uint8).tobytes()
    out = subprocess.run([EXE, mode, stream_path], input=buf,
                         capture_output=True, timeout=300, check=True).stdout
    (n,) = struct.unpack_from("<i", out, 0)
    rec = np.frombuffer(out[4:], dtype=np.dtype(
        [("x", "<f4"), ("y", "<f4"), ("z", "<f4"), ("d", "<f4"), ("w", "<f4"),
         ("M", "<f4"), ("ns", "<i4"), ("r", "u1"), ("g", "u1"), ("b", "u1")]),
        count=n)
    assert n > 500

    # wrap the raw stream in a .vol meta header our loader expects (the
    # reference's TSDFVolumeOctree::save does the same around Octree::serialize)
    from cpu_tsdf_tpu.io import vol as volio

    with open(stream_path, "rb") as f:
        stream = f.read()
    hdr = [b"# TSDFVolumeOctree Meta Information\n",
           f"{cfg.xres} {cfg.yres} {cfg.zres}\n".encode(),
           f"{cfg.xsize} {cfg.ysize} {cfg.zsize}\n".encode(),
           f"{cfg.max_dist_pos}\n{cfg.max_dist_neg}\n{cfg.max_weight}\n".encode(),
           f"{cfg.min_sensor_dist}\n{cfg.max_sensor_dist}\n".encode(),
           f"{cfg.max_cell_size_x} {cfg.max_cell_size_y} {cfg.max_cell_size_z}\n".encode(),
           (f"{cfg.focal_length_x} {cfg.focal_length_y} "
            f"{cfg.principal_point_x} {cfg.principal_point_y}\n").encode(),
           f"{cfg.image_width} {cfg.image_height}\n0\n0\n0\n".encode(),
           b"% 4 4\n",
           b"1 0 0 0\n0 1 0 0\n0 0 1 0\n0 0 0 1\n"]
    p = str(tmp_path / "wrapped.vol")
    with open(p, "wb") as f:
        f.write(b"".join(hdr) + stream)
    cfg2, arrays, _ = volio.load_vol(p)
    assert cfg2.color_mode == mode

    cell = cfg.xsize / cfg.xres
    ix = np.floor((rec["x"] + cfg.xsize / 2) / cell).astype(int)
    iy = np.floor((rec["y"] + cfg.ysize / 2) / cell).astype(int)
    iz = np.floor((rec["z"] + cfg.zsize / 2) / cell).astype(int)
    np.testing.assert_array_equal(arrays["sdf"][ix, iy, iz], rec["d"])
    np.testing.assert_array_equal(arrays["weight"][ix, iy, iz], rec["w"])
    np.testing.assert_array_equal(arrays["M"][ix, iy, iz], rec["M"])
    np.testing.assert_array_equal(arrays["nsample"][ix, iy, iz], rec["ns"])
    col = arrays["color"][ix, iy, iz]
    if mode == "RGB":
        # genuine uint8 members round-trip exactly
        np.testing.assert_array_equal(col[:, 0], rec["r"].astype(np.float32))
        np.testing.assert_array_equal(col[:, 1], rec["g"].astype(np.float32))
        np.testing.assert_array_equal(col[:, 2], rec["b"].astype(np.float32))
    else:
        # float-as-byte truncation: reconstructed values are the denormals
        # the reference's own deserialize yields
        assert col.shape[1] == (4 if mode == "RGBNormalized" else 3)
        assert np.all(col >= 0) and np.all(col <= 256 * 1.5e-45)
        assert (col > 0).any()


@pytest.mark.slow
def test_render_matches_compiled_reference(have_ref, small_cfg):
    """Depth-image golden for renderView: the oracle restates the reference's
    per-pixel march + trilinear refinement (tsdf_volume_octree.cpp:278-424,
    453-541) over the GENUINELY fused reference octree; our renderer runs on
    the framework volume fused from the same frames. Bracket phases differ in
    never-subdivided free space (the reference strides coarse-node-sized
    steps), so gates are validity agreement + refined-depth tolerance."""
    import tempfile

    cfg = small_cfg.with_updates(frustum_culling=False)
    pose = tilted_pose()
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3))
    buf = struct.pack("<7i", cfg.xres, cfg.image_width, cfg.image_height, 0,
                      0, 0, 1)
    buf += struct.pack(
        "<11f", cfg.xsize, cfg.max_dist_pos, cfg.max_dist_neg, cfg.max_weight,
        cfg.min_sensor_dist, cfg.max_sensor_dist, cfg.focal_length_x,
        cfg.focal_length_y, cfg.principal_point_x, cfg.principal_point_y,
        cfg.max_cell_size_x)
    buf += np.asarray(pose, np.float32).reshape(16).tobytes()
    buf += depth.astype(np.float32).tobytes()
    with tempfile.TemporaryDirectory() as td:
        rp = os.path.join(td, "render.f32")
        subprocess.run([EXE, "RGB", "-", rp], input=buf, capture_output=True,
                       timeout=300, check=True)
        ref_img = np.fromfile(rp, np.float32).reshape(cfg.image_height,
                                                      cfg.image_width)
    from cpu_tsdf_tpu import render_view

    vol = integrate(make_volume(cfg), jnp.asarray(depth),
                    jnp.asarray(pose, jnp.float32))
    ours = np.asarray(render_view(vol, pose).depth)
    rv = np.isfinite(ref_img)
    ov = np.isfinite(ours)
    # the input depth image has only ~478 finite pixels (sphere disk at 0.9 m
    # with f=35); the reference march finds ~340 crossings of those
    assert rv.sum() > 300
    agree = (rv == ov).mean()
    assert agree > 0.95, agree
    both = rv & ov
    err = np.abs(ref_img[both] - ours[both])
    # measured: P50 44 um, P90 5 mm, P99 1.8 cm — the tail is bracket-phase
    # divergence (a different crossing bracket refines in a different lerp
    # segment); half a voxel (1.25 cm) is the natural bound for that
    assert np.median(err) < 1e-3, np.median(err)
    half_voxel = 0.5 * cfg.xsize / cfg.xres
    assert (err < half_voxel).mean() > 0.95, (err < half_voxel).mean()


def _orbit_pose_at(theta, orbit_r=1.0):
    """Camera on an x-z circle looking at the origin (y up)."""
    c = np.array([orbit_r * np.sin(theta), 0.0, -orbit_r * np.cos(theta)])
    zax = -c / np.linalg.norm(c)
    xax = np.cross([0.0, 1.0, 0.0], zax)
    xax /= np.linalg.norm(xax)
    yax = np.cross(zax, xax)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = xax, yax, zax, c
    return m


def _sphere_depth_at(pose, W, H, fx, fy, cx, cy, radius):
    """Analytic ray-traced depth of an origin-centered sphere."""
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    dirs = np.stack([(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu, float)], -1)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    d_w = dirs @ pose[:3, :3].T
    o = pose[:3, 3]
    b = 2.0 * d_w @ o
    disc = b * b - 4 * (o @ o - radius * radius)
    t = (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0
    hit = (disc > 0) & (t > 0.1)
    return np.where(hit, t * dirs[..., 2], np.nan).astype(np.float32)


@pytest.mark.slow
def test_256cubed_noisy_trajectory_matches_compiled_reference(have_ref):
    """SURVEY §4 config-2 class golden: a 256^3 volume fused from a 5-frame
    noisy orbit (1.5 mm gaussian depth noise, 5% dropouts, 160x120 frames,
    RGB color) diffed against the genuine compiled reference octree
    (octree.cpp / impl/tsdf_volume_octree.hpp:113-218). Voxels whose sample
    counts agree (identical observation history; the octree splits lazily so
    late-split leaves legitimately miss early frames) must match to f32
    tolerance in d/w and within one count in color."""
    from cpu_tsdf_tpu import TSDFConfig

    W, H, FX = 160, 120, 140.0
    cfg = TSDFConfig(
        xres=256, yres=256, zres=256,
        xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.03, max_dist_neg=0.03,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=W, image_height=H,
        focal_length_x=FX, focal_length_y=FX,
        principal_point_x=(W - 1) / 2.0, principal_point_y=(H - 1) / 2.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4,
        frustum_culling=False, integrate_color=True, color_mode="RGB",
    )
    rng = np.random.RandomState(7)
    frames, rgbs = [], []
    for i in range(5):
        pose = _orbit_pose_at(2.0 * np.pi * i / 5)
        depth = _sphere_depth_at(pose, W, H, FX, FX,
                                 cfg.principal_point_x, cfg.principal_point_y,
                                 radius=0.35)
        depth = depth + rng.normal(0.0, 0.0015, depth.shape).astype(np.float32)
        depth = np.where(rng.uniform(size=depth.shape) < 0.05, np.nan, depth)
        frames.append((pose, depth.astype(np.float32)))
        rgbs.append(rng.randint(0, 256, (H, W, 3)).astype(np.float32))

    ref = _run_reference(cfg, frames, rgbs=rgbs, color_mode="RGB")
    vol = make_volume(cfg)
    for (pose, depth), rgb in zip(frames, rgbs):
        vol = integrate(vol, jnp.asarray(depth), jnp.asarray(pose, jnp.float32),
                        jnp.asarray(rgb))

    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    assert len(rec) > 50_000, len(rec)
    same = np.asarray(vol.nsample)[ix, iy, iz] == rec["ns"]
    assert same.sum() > 30_000, same.sum()
    d = np.asarray(vol.sdf)[ix, iy, iz][same]
    w = np.asarray(vol.weight)[ix, iy, iz][same]
    np.testing.assert_allclose(d, rec["d"][same], atol=5e-5)
    np.testing.assert_allclose(w, rec["w"][same], atol=5e-5)
    from cpu_tsdf_tpu.ops.color import color_to_rgb

    r_, g_, b_ = color_to_rgb("RGB", vol.color)
    for ours, theirs in ((r_, rec["r"]), (g_, rec["g"]), (b_, rec["b"])):
        got = np.asarray(ours)[ix, iy, iz][same]
        assert (np.abs(got - theirs.astype(np.float32)[same]) <= 1.0).mean() > 0.99


def _room_depth(pose, W, H, fx, fy, cx, cy, rng=None):
    """Analytic depth of an ICL-NUIM-style room interior: the camera stands
    INSIDE an axis-aligned box room (walls/floor/ceiling = the box exit
    faces) containing two box obstacles. Optional sensor noise via rng."""
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    dirs = np.stack([(uu - cx) / fx, (vv - cy) / fy,
                     np.ones_like(uu, float)], -1)
    d_w = dirs @ pose[:3, :3].T
    o = pose[:3, 3]

    def box_exit(lo, hi):
        # camera inside: the hit is where the ray EXITS the box
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - o) / d_w
            t2 = (hi - o) / d_w
        tmax = np.minimum.reduce(list(np.maximum(t1, t2).transpose(2, 0, 1)))
        return np.where(tmax > 0, tmax, np.inf)

    def box_enter(lo, hi):
        with np.errstate(divide="ignore", invalid="ignore"):
            t1 = (lo - o) / d_w
            t2 = (hi - o) / d_w
        tmin = np.maximum.reduce(list(np.minimum(t1, t2).transpose(2, 0, 1)))
        tmax = np.minimum.reduce(list(np.maximum(t1, t2).transpose(2, 0, 1)))
        hit = (tmin <= tmax) & (tmin > 0)
        return np.where(hit, tmin, np.inf)

    t = box_exit(np.array([-0.7, -0.7, -0.7]), np.array([0.7, 0.7, 0.7]))
    # a "crate" on the floor and a thin "table top" slab
    t = np.minimum(t, box_enter(np.array([0.1, 0.15, 0.2]),
                                np.array([0.45, 0.7, 0.55])))
    t = np.minimum(t, box_enter(np.array([-0.55, -0.05, -0.1]),
                                np.array([-0.15, 0.05, 0.35])))
    z = np.where(np.isfinite(t), t * dirs[..., 2], np.nan)
    if rng is not None:
        z = z + rng.normal(0.0, 0.002, z.shape)
        z = np.where(rng.uniform(size=z.shape) < 0.03, np.nan, z)
    return z.astype(np.float32)


@pytest.mark.slow
def test_room_walkthrough_matches_compiled_reference(have_ref):
    """ICL-NUIM-class golden: a camera translating THROUGH a room (large
    translations — the orbit goldens keep the camera at constant radius)
    with walls at grazing incidence, box obstacles, occlusion boundaries,
    sensor noise and dropouts, fused at 256^3 and diffed against the genuine
    compiled reference octree (octree.cpp, impl/tsdf_volume_octree.hpp:
    113-218). Every wall of the room enters the truncation band at some
    frame, so this exercises fusion over the whole volume, not a band
    around one object."""
    from cpu_tsdf_tpu import TSDFConfig

    W, H, FX = 160, 120, 140.0
    cfg = TSDFConfig(
        xres=256, yres=256, zres=256,
        xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.03, max_dist_neg=0.03,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=W, image_height=H,
        focal_length_x=FX, focal_length_y=FX,
        principal_point_x=(W - 1) / 2.0, principal_point_y=(H - 1) / 2.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4,
        frustum_culling=False,
    )
    rng = np.random.RandomState(13)
    frames = []
    for i in range(6):
        # walk across the room on x while yawing: consecutive cameras are
        # 12 cm apart (~19 voxels), looking toward the +z wall then panning
        yaw = -0.5 + 0.2 * i
        c, s = np.cos(yaw), np.sin(yaw)
        pose = np.eye(4)
        pose[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pose[:3, 3] = (-0.3 + 0.12 * i, -0.1, -0.35)
        depth = _room_depth(pose, W, H, FX, FX, cfg.principal_point_x,
                            cfg.principal_point_y, rng=rng)
        frames.append((pose, depth))

    ref = _run_reference(cfg, frames)
    vol = make_volume(cfg)
    for pose, depth in frames:
        vol = integrate(vol, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))

    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    assert len(rec) > 100_000, len(rec)
    same = np.asarray(vol.nsample)[ix, iy, iz] == rec["ns"]
    assert same.sum() > 60_000, same.sum()
    np.testing.assert_allclose(np.asarray(vol.sdf)[ix, iy, iz][same],
                               rec["d"][same], atol=5e-5)
    np.testing.assert_allclose(np.asarray(vol.weight)[ix, iy, iz][same],
                               rec["w"][same], atol=5e-5)


@pytest.mark.slow
def test_multi_object_scene_matches_compiled_reference(have_ref, small_cfg):
    """Non-sphere geometry golden: a tilted plane behind a sphere (grazing
    incidence, a large flat truncation band, and occlusion boundaries in one
    frame) fused twice from different poses must match the compiled
    reference octree exactly where sample counts agree."""
    cfg = small_cfg.with_updates(frustum_culling=False)
    W, H = cfg.image_width, cfg.image_height
    fx, fy = cfg.focal_length_x, cfg.focal_length_y
    cx_, cy_ = cfg.principal_point_x, cfg.principal_point_y

    def scene_depth(pose):
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        dirs = np.stack([(uu - cx_) / fx, (vv - cy_) / fy,
                         np.ones_like(uu, float)], -1)
        d_w = dirs @ pose[:3, :3].T
        o = pose[:3, 3]
        # sphere at (−0.1, 0, 0.15), r=0.22 (volume frame)
        cs = np.array([-0.1, 0.0, 0.15])
        b = 2.0 * np.einsum("hwc,c->hw", d_w, o - cs)
        disc = b * b - 4 * (np.dot(o - cs, o - cs) - 0.22 ** 2)
        ts = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / 2, np.inf)
        ts = np.where(ts > 0.05, ts, np.inf)
        # tilted plane: n·x = c with n = normalize(0.25, 0.1, -1), c = -0.55
        n = np.array([0.25, 0.1, -1.0]); n /= np.linalg.norm(n)
        denom = np.einsum("hwc,c->hw", d_w, n)
        tp = (-0.55 - np.dot(o, n)) / np.where(np.abs(denom) < 1e-6, np.inf,
                                               denom)
        tp = np.where(tp > 0.05, tp, np.inf)
        t = np.minimum(ts, tp)
        z = np.where(np.isfinite(t), t * dirs[..., 2], np.nan)
        return z.astype(np.float32)

    frames = []
    for (tx, tz) in ((0.0, -0.95), (0.08, -0.9)):
        pose = tilted_pose(tx=tx, tz=tz)
        frames.append((pose, scene_depth(pose)))
    ref = _run_reference(cfg, frames)
    vol = make_volume(cfg)
    for pose, depth in frames:
        vol = integrate(vol, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    assert len(rec) > 3000, len(rec)
    # the octree splits lazily, so late-split leaves legitimately miss the
    # first frame; compare voxels with identical observation history
    same = np.asarray(vol.nsample)[ix, iy, iz] == rec["ns"]
    assert same.mean() > 0.85 and same.sum() > 3000, (same.mean(), same.sum())
    np.testing.assert_allclose(np.asarray(vol.sdf)[ix, iy, iz][same],
                               rec["d"][same], atol=2e-5)
    np.testing.assert_allclose(np.asarray(vol.weight)[ix, iy, iz][same],
                               rec["w"][same], atol=1e-5)


@pytest.mark.slow
def test_variance_weighting_matches_compiled_reference(have_ref, small_cfg):
    """weight_by_depth + weight_by_variance golden vs the COMPILED reference
    (updateVoxel hpp:200-204 + OctreeNode::getVariance octree.cpp:281-287).
    Seven frames so nsample exceeds the n > 5 variance gate. Note the
    reference's n/(n-1) Bessel factor is INT division (octree.h:165 declares
    int nsample_), i.e. exactly 1 — this test pins that quirk."""
    cfg = small_cfg.with_updates(frustum_culling=False, weight_by_depth=True,
                                 weight_by_variance=True)
    depth = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9),
                                    radius=0.3))
    frames = [(tilted_pose(tx=0.013 + 0.003 * i, ty=0.021 - 0.002 * i,
                           tz=-0.9 - 0.004 * i), depth) for i in range(7)]
    ref = _run_reference(cfg, frames)
    vol = make_volume(cfg)
    for pose, dep in frames:
        vol = integrate(vol, jnp.asarray(dep), jnp.asarray(pose, jnp.float32))
    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    same = np.asarray(vol.nsample)[ix, iy, iz] == rec["ns"]
    assert same.sum() > 1000, same.sum()
    d = np.asarray(vol.sdf)[ix, iy, iz][same]
    w = np.asarray(vol.weight)[ix, iy, iz][same]
    rd, rw = rec["d"][same], rec["w"][same]
    # the reference NaN-poisons voxels where var == 0 AND d_new == d_old
    # (its logNormal computes 0/0 — clamped d=1 voxels observed identically
    # every frame); keep that corruption out of the comparison but pin it
    # as the small degenerate set it is
    ref_nan = ~np.isfinite(rd)
    assert ref_nan.mean() < 0.03, ref_nan.mean()
    both = ~ref_nan
    # exp(logNormal) amplifies f32 association differences; 1e-3 still
    # catches the 1.2x Bessel-factor divergence this test exists to pin
    np.testing.assert_allclose(d[both], rd[both], atol=1e-3)
    np.testing.assert_allclose(w[both], rw[both], atol=1e-3)
    assert np.isfinite(d).all()  # ours must not propagate the 0/0


@pytest.mark.slow
def test_disocclusion_carving_matches_compiled_reference(have_ref, small_cfg):
    """Free-space carving golden: frame 1 fuses a NEAR sphere, frame 2 sees
    a FAR plane, so frame-1 voxels receive the reference's clamped d=+1
    free-space updates (hpp:189-196). Every frame-1 voxel must end at the
    reference's carved d/w exactly — this is the semantics the brick
    engines' carve pass mirrors (tests/test_bricks.py)."""
    import test_fusion as tf

    cfg = small_cfg.with_updates(frustum_culling=False)
    pose = tf.tilted_pose()
    near = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.6),
                                   radius=0.2))
    from cpu_tsdf_tpu.synthetic import plane_depth

    far = np.asarray(plane_depth(cfg, z0=1.4))
    frames = [(pose, near), (pose, far)]
    ref = _run_reference(cfg, frames)
    vol = make_volume(cfg)
    for p, dep in frames:
        vol = integrate(vol, jnp.asarray(dep), jnp.asarray(p, jnp.float32))
    ix, iy, iz = ref["idx"]
    rec = ref["rec"]
    same = np.asarray(vol.nsample)[ix, iy, iz] == rec["ns"]
    carved = same & (rec["ns"] == 2) & (rec["d"] > 0.5)
    assert carved.sum() > 30, carved.sum()  # genuinely double-observed voxels
    np.testing.assert_allclose(np.asarray(vol.sdf)[ix, iy, iz][same],
                               rec["d"][same], atol=3e-5)
    np.testing.assert_allclose(np.asarray(vol.weight)[ix, iy, iz][same],
                               rec["w"][same], atol=2e-5)
