"""I/O round-trip tests: PLY, PCD, poses, native checkpoints, .vol codec."""

import os
import struct

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import TSDFConfig, integrate, make_volume
from cpu_tsdf_tpu.io import pcd, ply, poses, vol as volio
from cpu_tsdf_tpu.io.checkpoint import load_any, load_checkpoint, save_checkpoint
from cpu_tsdf_tpu.synthetic import sphere_depth

from test_fusion import tilted_pose


def test_ply_roundtrip_binary(tmp_path):
    rng = np.random.RandomState(0)
    verts = rng.randn(30, 3).astype(np.float32)
    faces = np.arange(30, dtype=np.int32).reshape(10, 3)
    cols = rng.randint(0, 255, (30, 3)).astype(np.float32)
    p = str(tmp_path / "m.ply")
    ply.save_ply(p, verts, faces, colors=cols, binary=True)
    v2, f2, c2 = ply.load_ply(p)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_allclose(c2, np.clip(cols, 0, 255).astype(np.uint8))


def test_ply_roundtrip_ascii(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.ply")
    ply.save_ply(p, verts, faces, binary=False)
    v2, f2, c2 = ply.load_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    assert c2 is None


def _make_cloud(n=120, w=12, h=10, with_rgb=True):
    rng = np.random.RandomState(1)
    fields = {
        "x": rng.randn(n).astype(np.float32),
        "y": rng.randn(n).astype(np.float32),
        "z": (rng.rand(n) * 2 + 0.5).astype(np.float32),
    }
    if with_rgb:
        rgb = rng.randint(0, 255, (n, 3)).astype(np.float32)
        fields["rgb"] = pcd.pack_rgb(rgb)
    return pcd.PointCloud(fields, w, h)


@pytest.mark.parametrize("mode", ["ascii", "binary", "binary_compressed"])
def test_pcd_roundtrip(tmp_path, mode):
    c = _make_cloud()
    p = str(tmp_path / "c.pcd")
    pcd.save_pcd(p, c, mode=mode)
    c2 = pcd.load_pcd(p)
    assert (c2.width, c2.height) == (c.width, c.height)
    for k in ("x", "y", "z"):
        np.testing.assert_allclose(c2.fields[k], c.fields[k], rtol=1e-6)
    np.testing.assert_allclose(c2.rgb(), c.rgb())


def test_pcd_lzf_roundtrip():
    rng = np.random.RandomState(2)
    raw = rng.bytes(10000) + b"\x00" * 5000
    comp = pcd._lzf_compress(raw)
    assert pcd._lzf_decompress(comp, len(raw)) == raw


def test_pose_txt_and_binary(tmp_path):
    m = np.eye(4)
    m[:3, :] = np.arange(12, dtype=np.float64).reshape(3, 4)
    ptxt = str(tmp_path / "p0.txt")
    with open(ptxt, "w") as f:
        for row in m[:3]:
            f.write(" ".join(str(v) for v in row) + "\n")
    np.testing.assert_allclose(poses.load_pose(ptxt), m)
    pbin = str(tmp_path / "p0.transform")
    with open(pbin, "wb") as f:
        f.write(struct.pack("<12f", *m[:3].reshape(-1)))
    np.testing.assert_allclose(poses.load_pose(pbin), m, rtol=1e-6)


def test_shared_prefix():
    files = ["scan_0001.pcd", "scan_0002.pcd", "scan_0100.pcd"]
    assert poses.shared_prefix(sorted(files)) == "scan_"
    assert poses.shared_prefix(["a.pcd"]) == "a.pcd"[:poses.shared_prefix(["a.pcd"]).__len__()]


def test_scrape_directory(tmp_path):
    for i in range(3):
        (tmp_path / f"cloud_{i:04d}.pcd").write_bytes(b"")
        (tmp_path / f"pose_{i:04d}.txt").write_text("1 0 0 0\n0 1 0 0\n0 0 1 0\n")
    pcds, pose_files, binary = poses.scrape_directory(str(tmp_path))
    assert len(pcds) == 3 and len(pose_files) == 3 and not binary
    assert pose_files[0].endswith("pose_0000.txt")


def _fused_small(cfg_fixture):
    cfg = cfg_fixture
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    v = make_volume(cfg)
    return integrate(v, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))


def test_native_checkpoint_roundtrip(tmp_path, small_cfg):
    v = _fused_small(small_cfg)
    p = str(tmp_path / "ckpt.npz")
    save_checkpoint(p, v)
    v2 = load_checkpoint(p)
    assert v2.config == v.config
    np.testing.assert_array_equal(np.asarray(v2.sdf), np.asarray(v.sdf))
    np.testing.assert_array_equal(np.asarray(v2.weight), np.asarray(v.weight))
    np.testing.assert_array_equal(np.asarray(v2.nsample), np.asarray(v.nsample))


def test_vol_roundtrip(tmp_path, small_cfg):
    """save_vol -> load_vol reproduces the observed field exactly."""
    v = _fused_small(small_cfg)
    p = str(tmp_path / "volume.tsdf")
    sdf = np.asarray(v.sdf)
    w = np.asarray(v.weight)
    volio.save_vol(p, v.config, sdf, w, np.asarray(v.M), np.asarray(v.nsample))
    cfg2, arrays, transform = volio.load_vol(p)
    assert cfg2.resolution == v.config.resolution
    assert cfg2.max_dist_pos == pytest.approx(v.config.max_dist_pos)
    np.testing.assert_allclose(transform, np.eye(4))
    obs = w > 0
    np.testing.assert_allclose(arrays["sdf"][obs], sdf[obs], atol=1e-6)
    np.testing.assert_allclose(arrays["weight"][obs], w[obs], atol=1e-6)
    # unobserved regions collapse to coarse d=-1/w=0 leaves
    assert np.all(arrays["weight"][~obs] == 0)
    assert np.all(arrays["sdf"][~obs] == -1)


def test_vol_oracle_cross_validation(tmp_path, small_cfg):
    """The Python octree oracle serialized via the SAME byte layout the C++
    writer uses must parse with load_vol (byte-level codec gate)."""
    import oracle as O

    cfg = small_cfg
    pose = tilted_pose()
    depth = sphere_depth(cfg, center=(-0.013, -0.021, 0.9), radius=0.3)
    o = O.OracleTSDF(cfg)
    o.integrate(depth.astype(np.float64), pose)

    # serialize the oracle octree exactly as octree.cpp:289-304,645-657 does
    def node_bytes(n):
        rec = struct.pack("<7fi", n.d, n.w, n.cx, n.cy, n.cz, n.size, n.M, n.nsample)
        rec += struct.pack("<Q", len(n.children))
        for c in n.children:
            rec += node_bytes(c)
        return rec

    p = str(tmp_path / "oracle.vol")
    with open(p, "wb") as f:
        f.write(b"# TSDFVolumeOctree Meta Information\n")
        f.write(f"{cfg.xres} {cfg.yres} {cfg.zres}\n".encode())
        f.write(f"{cfg.xsize} {cfg.ysize} {cfg.zsize}\n".encode())
        for v_ in (cfg.max_dist_pos, cfg.max_dist_neg, cfg.max_weight,
                   cfg.min_sensor_dist, cfg.max_sensor_dist):
            f.write(f"{v_}\n".encode())
        f.write(f"{cfg.max_cell_size_x} {cfg.max_cell_size_y} {cfg.max_cell_size_z}\n".encode())
        f.write(f"{cfg.focal_length_x} {cfg.focal_length_y} "
                f"{cfg.principal_point_x} {cfg.principal_point_y}\n".encode())
        f.write(f"{cfg.image_width} {cfg.image_height}\n".encode())
        f.write(b"0\n0\n0\n")
        f.write(b"% 4 4\n")
        for row in np.eye(4):
            f.write((" ".join(f"{v:.16g}" for v in row) + "\n").encode())
        f.write(b"NOCOLOR\n#OCTREEBINARY\n")
        f.write(struct.pack("<3Q", cfg.xres, cfg.yres, cfg.zres))
        f.write(struct.pack("<3f", cfg.xsize, cfg.ysize, cfg.zsize))
        f.write(node_bytes(o.root))

    cfg2, arrays, _ = volio.load_vol(p)
    # values at finest oracle leaves must round-trip exactly
    for ix, iy, iz, n in o.finest_leaves():
        assert arrays["sdf"][ix, iy, iz] == pytest.approx(n.d, abs=1e-6)
        assert arrays["weight"][ix, iy, iz] == pytest.approx(n.w, abs=1e-6)
        assert arrays["finest_mask"][ix, iy, iz]


def test_load_any_dispatch(tmp_path, small_cfg):
    v = _fused_small(small_cfg)
    p1 = str(tmp_path / "ckpt.npz")
    save_checkpoint(p1, v)
    v1 = load_any(p1)
    assert v1.config.resolution == v.config.resolution
    p2 = str(tmp_path / "volume.tsdf")
    volio.save_vol(p2, v.config, np.asarray(v.sdf), np.asarray(v.weight))
    v2 = load_any(p2)
    assert v2.config.resolution == v.config.resolution
    obs = np.asarray(v.weight) > 0
    np.testing.assert_allclose(np.asarray(v2.sdf)[obs], np.asarray(v.sdf)[obs], atol=1e-6)


def test_checkpoint_atomic_and_meta(tmp_path, small_cfg):
    """save_checkpoint embeds extra meta in the npz (crash-atomic with the
    arrays — ADVICE r2) and leaves no temp files behind."""
    import os

    from cpu_tsdf_tpu.io.checkpoint import (checkpoint_meta, load_checkpoint,
                                            save_checkpoint)
    from cpu_tsdf_tpu.volume import make_volume

    vol = make_volume(small_cfg)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, vol, {"next_frame": 17})
    assert checkpoint_meta(path)["next_frame"] == 17
    assert [f for f in os.listdir(tmp_path) if "tmp" in f] == []
    v2 = load_checkpoint(path)
    assert v2.config == small_cfg
    # overwrite path keeps the old file intact until replace
    save_checkpoint(path, vol, {"next_frame": 18})
    assert checkpoint_meta(path)["next_frame"] == 18


@pytest.mark.parametrize("mode,nch", [("RGBNormalized", 4), ("LAB", 3)])
def test_vol_exotic_color_roundtrip(tmp_path, small_cfg, mode, nch):
    """RGBNormalized/LAB .vol color payloads: the writer emits the LOW BYTE
    of each float channel (the reference's broken serializer,
    octree.cpp:416-424,565-571) and the loader reconstructs exactly what the
    reference's own deserialize would hold in memory: that byte patched into
    a zero-initialized float (the denormal byte * 2^-149)."""
    cfg = small_cfg.with_updates(integrate_color=True, color_mode=mode)
    rng = np.random.RandomState(5)
    shape = (cfg.xres, cfg.yres, cfg.zres)
    sdf = np.clip(rng.randn(*shape).astype(np.float32), -1, 1)
    w = (rng.rand(*shape) < 0.1).astype(np.float32) * 3.0
    color = rng.rand(*shape, nch).astype(np.float32) * np.float32(100.0)
    p = str(tmp_path / "c.vol")
    volio.save_vol(p, cfg, sdf, w, rgb=color, color_mode=mode)
    cfg2, arrays, _ = volio.load_vol(p)
    assert cfg2.color_mode == mode and cfg2.integrate_color
    got = arrays["color"]
    assert got.shape == shape + (nch,)
    # expected = low byte of each float32, patched into zeroed float bits
    low = (color.view("<u4") & 0xFF).astype("<u4")
    expect = low.view("<f4")
    mask = arrays["finest_mask"]
    np.testing.assert_array_equal(got[mask], expect[mask])
    # every reconstructed value is the denormal the reference would hold
    assert np.all(got[mask] <= 256 * 1.5e-45)


def test_vol_truncated_file_raises(tmp_path, small_cfg):
    """A .vol truncated mid-header must raise a parse error, not spin forever
    (the EOF find() used to reset the reader to byte 0)."""
    from cpu_tsdf_tpu.io import vol as volio

    p = str(tmp_path / "full.vol")
    sdf = np.full((64, 64, 64), -1.0, np.float32)
    w = np.zeros((64, 64, 64), np.float32)
    w[30, 30, 30] = 1.0
    volio.save_vol(p, small_cfg, sdf, w)
    with open(p, "rb") as f:
        head = f.read(120)  # cuts inside the ASCII header
    t = str(tmp_path / "trunc.vol")
    with open(t, "wb") as f:
        f.write(head)
    with pytest.raises(ValueError):
        volio.load_vol(t)


def test_vol_anisotropic_raises(tmp_path, small_cfg):
    """.vol interop is defined only for cubic volumes (the reference octree
    subdivides cubically); anisotropic configs must fail LOUDLY instead of
    silently truncating the emitted octree to the first x-sized block."""
    from cpu_tsdf_tpu.io import vol as volio

    cfg = small_cfg.with_updates(yres=128, ysize=3.2)
    sdf = np.full((64, 128, 64), -1.0, np.float32)
    w = np.zeros((64, 128, 64), np.float32)
    w[10, 100, 10] = 1.0  # outside the first 64^3 block on y
    with pytest.raises(ValueError, match="cubic"):
        volio.save_vol(str(tmp_path / "aniso.vol"), cfg, sdf, w)


def test_vol_is_empty_from_weights(tmp_path, small_cfg):
    """save_vol without nsample must not mark a fused volume empty (the
    header flag used to come from the optional nsample argument alone)."""
    from cpu_tsdf_tpu.io import vol as volio

    p = str(tmp_path / "w.vol")
    sdf = np.full((64, 64, 64), -1.0, np.float32)
    w = np.zeros((64, 64, 64), np.float32)
    w[30, 30, 30] = 2.0
    volio.save_vol(p, small_cfg, sdf, w)
    with open(p, "rb") as f:
        lines = f.read(4096).split(b"\n")
    # header line 11 is is_empty (after title, res, size, 5 scalars, cells,
    # intrinsics, image size)
    assert lines[11] == b"0", lines[:13]
