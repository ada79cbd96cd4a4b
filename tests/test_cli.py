"""End-to-end CLI tests: the reference's primary validation path (SURVEY §4)
— run the full integrate pipeline on a synthetic sequence and inspect outputs."""

import os
import struct

import numpy as np
import pytest

from cpu_tsdf_tpu.cli import get_intrinsics_main, integrate_main, tsdf2mesh_main
from cpu_tsdf_tpu.config import TSDFConfig
from cpu_tsdf_tpu.io import pcd as pcd_io
from cpu_tsdf_tpu.io import ply as ply_io
from cpu_tsdf_tpu.synthetic import sphere_depth


W, H = 64, 48
FX = FY = 60.0
CX, CY = W / 2.0 - 0.5, H / 2.0 - 0.5


def _write_sequence(dirname, n_frames=2, color=False):
    cfg = TSDFConfig(image_width=W, image_height=H, focal_length_x=FX,
                     focal_length_y=FY, principal_point_x=CX, principal_point_y=CY)
    os.makedirs(dirname, exist_ok=True)
    for i in range(n_frames):
        # camera orbits slightly; sphere fixed at world origin, cameras at -z
        tz = -1.0 - 0.02 * i
        tx = 0.03 * i
        pose = np.eye(4)
        pose[:3, 3] = (tx, 0.0, tz)
        depth = sphere_depth(cfg, center=(-tx, 0.0, -tz), radius=0.35)
        uu, vv = np.meshgrid(np.arange(W), np.arange(H))
        x = (uu - CX) / FX * depth
        y = (vv - CY) / FY * depth
        pts = np.stack([x, y, depth], -1).reshape(-1, 3).astype(np.float32)
        fields = {"x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2]}
        if color:
            rgb = np.broadcast_to(np.array([200.0, 60.0, 30.0], np.float32),
                                  (len(pts), 3))
            fields["rgb"] = pcd_io.pack_rgb(rgb)
        cloud = pcd_io.PointCloud(fields, W, H)
        pcd_io.save_pcd(os.path.join(dirname, f"cloud_{i:04d}.pcd"), cloud, "binary")
        with open(os.path.join(dirname, f"pose_{i:04d}.txt"), "w") as f:
            for row in pose[:3]:
                f.write(" ".join(f"{v:.9g}" for v in row) + "\n")


def _common_args(in_dir, out_dir):
    return ["--in", in_dir, "--out", out_dir,
            "--volume-size", "1.6", "--cell-size", "0.0125",
            "--max-cell-size", "0.4",
            "--width", str(W), "--height", str(H),
            "--fx", str(FX), "--fy", str(FY), "--cx", str(CX), "--cy", str(CY),
            "--trunc-dist-pos", "0.05", "--trunc-dist-neg", "0.05",
            "--min-sensor-dist", "0.1"]


def test_integrate_end_to_end(tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=2)
    rc = integrate_main(_common_args(in_dir, out_dir) + ["--save-tsdf", "--flatten"])
    assert rc == 0
    verts, faces, _ = ply_io.load_ply(os.path.join(out_dir, "mesh.ply"))
    assert len(faces) > 200
    # first camera at origin of the volume frame (pose relative to frame 0);
    # sphere center in frame-0 camera coords = (0,0,1.0)
    r = np.linalg.norm(verts - np.array([0, 0, 1.0]), axis=1)
    assert np.abs(r - 0.35).mean() < 0.01
    assert os.path.exists(os.path.join(out_dir, "volume.npz"))


def test_tsdf2mesh_roundtrip(tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=1)
    rc = integrate_main(_common_args(in_dir, out_dir) + ["--save-tsdf"])
    assert rc == 0
    mesh2 = str(tmp_path / "remesh.ply")
    rc = tsdf2mesh_main([os.path.join(out_dir, "volume.npz"), mesh2])
    assert rc == 0
    v1, f1, _ = ply_io.load_ply(os.path.join(out_dir, "mesh.ply"))
    v2, f2, _ = ply_io.load_ply(mesh2)
    assert len(f1) == len(f2)
    np.testing.assert_allclose(np.sort(v1, axis=0), np.sort(v2, axis=0), atol=1e-6)


def test_integrate_vol_format_and_reload(tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=1)
    rc = integrate_main(_common_args(in_dir, out_dir)
                        + ["--save-tsdf", "--tsdf-format", "vol"])
    assert rc == 0
    vol_path = os.path.join(out_dir, "volume.tsdf")
    assert os.path.exists(vol_path)
    mesh2 = str(tmp_path / "remesh.ply")
    assert tsdf2mesh_main([vol_path, mesh2]) == 0
    v2, f2, _ = ply_io.load_ply(mesh2)
    assert len(f2) > 100


def test_integrate_cloud_only(tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=2)
    rc = integrate_main(_common_args(in_dir, out_dir) + ["--cloud-only"])
    assert rc == 0
    cloud = pcd_io.load_pcd(os.path.join(out_dir, "cloud.pcd"))
    xyz = cloud.xyz()
    assert len(xyz) > 500
    r = np.linalg.norm(xyz - np.array([0, 0, 1.0]), axis=1)
    assert np.abs(r - 0.35).mean() < 0.02


def test_integrate_color(tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=1, color=True)
    rc = integrate_main(_common_args(in_dir, out_dir) + ["--color"])
    assert rc == 0
    verts, faces, cols = ply_io.load_ply(os.path.join(out_dir, "mesh.ply"))
    assert cols is not None
    np.testing.assert_allclose(cols.mean(0), [200, 60, 30], atol=5)


def test_get_intrinsics_cli(tmp_path, capsys):
    cfg = TSDFConfig(image_width=W, image_height=H, focal_length_x=FX,
                     focal_length_y=FY, principal_point_x=CX, principal_point_y=CY)
    depth = sphere_depth(cfg, center=(0, 0, 1.0), radius=0.35)
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    x = ((uu - CX) / FX * depth).astype(np.float32)
    y = ((vv - CY) / FY * depth).astype(np.float32)
    pts = {"x": x.reshape(-1), "y": y.reshape(-1), "z": depth.reshape(-1)}
    p = str(tmp_path / "organized.pcd")
    pcd_io.save_pcd(p, pcd_io.PointCloud(pts, W, H), "binary")
    assert get_intrinsics_main([p]) == 0
    out = capsys.readouterr().out
    fx_line = [l for l in out.splitlines() if l.startswith("fx:")][0]
    assert abs(float(fx_line.split()[1]) - FX) < 0.5


def test_integrate_sparse(tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=2)
    rc = integrate_main(_common_args(in_dir, out_dir)
                        + ["--sparse", "--brick-capacity", "4096", "--save-tsdf"])
    assert rc == 0
    verts, faces, _ = ply_io.load_ply(os.path.join(out_dir, "mesh.ply"))
    assert len(faces) > 200
    r = np.linalg.norm(verts - np.array([0, 0, 1.0]), axis=1)
    assert np.abs(r - 0.35).mean() < 0.01
    # sparse checkpoint round-trips through the factory loader
    from cpu_tsdf_tpu.io.checkpoint import load_any
    vol = load_any(os.path.join(out_dir, "volume.npz"))
    assert int(vol.n_active) > 0


def test_resume_and_visualize(tmp_path):
    """--save-every + --resume continue an interrupted run to the same result;
    --visualize-every writes headless depth/normal PNG dumps."""
    in_dir, out_a, out_b = str(tmp_path / "in"), str(tmp_path / "a"), str(tmp_path / "b")
    _write_sequence(in_dir, n_frames=3)
    base = _common_args(in_dir, out_a)
    rc = integrate_main(base + ["--visualize-every", "2"])
    assert rc == 0
    assert os.path.exists(os.path.join(out_a, "viz_0001_depth.png"))
    assert os.path.exists(os.path.join(out_a, "viz_0001_normals.png"))
    with open(os.path.join(out_a, "viz_0001_depth.png"), "rb") as f:
        assert f.read(8) == b"\x89PNG\r\n\x1a\n"

    # run frames 1-2 with checkpointing, then resume for frame 3
    rc = integrate_main(_common_args(in_dir, out_b)
                        + ["--num-frames", "2", "--save-every", "1"])
    assert rc == 0
    rc = integrate_main(_common_args(in_dir, out_b) + ["--resume"])
    assert rc == 0
    va, _, _ = ply_io.load_ply(os.path.join(out_a, "mesh.ply"))
    vb, _, _ = ply_io.load_ply(os.path.join(out_b, "mesh.ply"))
    assert len(va) == len(vb)
    np.testing.assert_allclose(np.sort(va.reshape(-1)), np.sort(vb.reshape(-1)),
                               atol=1e-5)


def test_resume_without_frame_cursor_starts_fresh(tmp_path):
    """A checkpoint volume with NO recoverable frame cursor (no next_frame in
    the npz meta, no sidecar json — the legacy writer's crash window) must be
    ignored: loading it and integrating from frame 0 would fuse every frame a
    second time. The run must produce the same mesh as a fresh one."""
    in_dir, out_a, out_b = (str(tmp_path / "in"), str(tmp_path / "a"),
                            str(tmp_path / "b"))
    _write_sequence(in_dir, n_frames=2)
    rc = integrate_main(_common_args(in_dir, out_a) + ["--save-tsdf"])
    assert rc == 0

    # forge the pathological state in out_b: a cursor-less checkpoint of the
    # FULLY fused volume, json missing
    os.makedirs(out_b, exist_ok=True)
    from cpu_tsdf_tpu.io.checkpoint import load_any, save_checkpoint
    vol = load_any(os.path.join(out_a, "volume.npz"))
    save_checkpoint(os.path.join(out_b, "checkpoint.npz"), vol, {})
    assert not os.path.exists(os.path.join(out_b, "checkpoint.json"))

    rc = integrate_main(_common_args(in_dir, out_b) + ["--resume"])
    assert rc == 0
    va, _, _ = ply_io.load_ply(os.path.join(out_a, "mesh.ply"))
    vb, _, _ = ply_io.load_ply(os.path.join(out_b, "mesh.ply"))
    assert len(va) == len(vb)  # double-fusion would shift the isosurface
    np.testing.assert_allclose(np.sort(va.reshape(-1)),
                               np.sort(vb.reshape(-1)), atol=1e-5)


def test_sparse_resume_from_dense_checkpoint(tmp_path):
    """--sparse --resume with a DENSE checkpoint must resume densely (the
    checkpoint's volume kind wins): the sparse flag used to survive and send
    a TSDFVolume into integrate_bricks."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=3)
    rc = integrate_main(_common_args(in_dir, out_dir)
                        + ["--num-frames", "2", "--save-every", "1"])  # dense
    assert rc == 0
    rc = integrate_main(_common_args(in_dir, out_dir) + ["--sparse", "--resume"])
    assert rc == 0
    v, f, _ = ply_io.load_ply(os.path.join(out_dir, "mesh.ply"))
    assert len(f) > 200


def test_integrate_without_pose_files(tmp_path):
    """A directory with clouds but NO pose files integrates with identity
    poses (the per-frame fallback existed but poses[0] was still indexed)."""
    in_dir, out_dir = str(tmp_path / "in"), str(tmp_path / "out")
    _write_sequence(in_dir, n_frames=2)
    for p in os.listdir(in_dir):
        if p.endswith(".txt"):
            os.remove(os.path.join(in_dir, p))
    rc = integrate_main(_common_args(in_dir, out_dir))
    assert rc == 0
    v, f, _ = ply_io.load_ply(os.path.join(out_dir, "mesh.ply"))
    assert len(f) > 200


def test_load_pcd_rejects_non_pcd(tmp_path):
    """A stray non-PCD file must raise a clean error, not hang rescanning
    the buffer forever."""
    import pytest

    p = str(tmp_path / "junk.pcd")
    with open(p, "wb") as f:
        f.write(b"\x00\x01binary junk without DATA line")
    with pytest.raises(ValueError, match="DATA"):
        pcd_io.load_pcd(p)


def test_lzf_backreference_decompress():
    """The chunked back-reference copy must handle the overlapping case
    (dist < length: the run repeats the last dist bytes). Our own encoder
    emits literals only, so craft the stream by hand."""
    from cpu_tsdf_tpu.io.pcd import _lzf_decompress

    # literal "ab" (ctrl=1), then back-ref: length code 5 -> 7 bytes,
    # dist = 2 (ctrl low bits 0, next byte 1 -> dist 2): "ab" repeated
    stream = bytes([1]) + b"ab" + bytes([(5 << 5) | 0, 1])
    out = _lzf_decompress(stream, 9)
    assert out == b"ababababa", out
    # long literal + far back-ref with length extension (ctrl>>5 == 7)
    lit = bytes(range(32))
    stream2 = bytes([31]) + lit + bytes([(7 << 5) | 0, 3, 31])  # len 7+3+2=12, dist 32
    out2 = _lzf_decompress(stream2, 44)
    assert out2 == lit + lit[:12], (len(out2), out2[-12:])
