"""Pipeline-stage tests: organize-by-reprojection, flatten, cleanup, intrinsics."""

import numpy as np
import pytest

from cpu_tsdf_tpu.config import TSDFConfig
from cpu_tsdf_tpu.pipeline import (cleanup_mesh, estimate_intrinsics, flatten_vertices,
                                   organize_cloud, voxel_downsample)


@pytest.fixture
def cam_cfg():
    return TSDFConfig(image_width=64, image_height=48, focal_length_x=52.5,
                      focal_length_y=52.5, principal_point_x=31.5, principal_point_y=23.5)


def test_organize_scatter_min(cam_cfg):
    cfg = cam_cfg
    # two points projecting to the same pixel: nearest must win
    z_far, z_near = 2.0, 1.0
    u, v = 10, 20
    def backproj(z):
        return [(u - cfg.principal_point_x) / cfg.focal_length_x * z,
                (v - cfg.principal_point_y) / cfg.focal_length_y * z, z]
    pts = np.array([backproj(z_far), backproj(z_near)], np.float32)
    depth, _ = organize_cloud(cfg, pts)
    d = np.asarray(depth)
    assert d[v, u] == pytest.approx(z_near)
    assert np.isnan(d).sum() == d.size - 1


def test_organize_rgb_winner(cam_cfg):
    cfg = cam_cfg
    u, v = 5, 6
    def backproj(z):
        return [(u - cfg.principal_point_x) / cfg.focal_length_x * z,
                (v - cfg.principal_point_y) / cfg.focal_length_y * z, z]
    pts = np.array([backproj(2.0), backproj(0.8)], np.float32)
    rgb = np.array([[255, 0, 0], [0, 255, 0]], np.float32)
    depth, rgb_img = organize_cloud(cfg, pts, rgb)
    np.testing.assert_allclose(np.asarray(rgb_img)[v, u], [0, 255, 0])


def test_organize_roundtrip_full_image(cam_cfg):
    """Backproject every pixel of a synthetic depth image and re-organize."""
    cfg = cam_cfg
    H, W = cfg.image_height, cfg.image_width
    rng = np.random.RandomState(0)
    depth_in = (1.0 + rng.rand(H, W)).astype(np.float32)
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    x = (uu - cfg.principal_point_x) / cfg.focal_length_x * depth_in
    y = (vv - cfg.principal_point_y) / cfg.focal_length_y * depth_in
    pts = np.stack([x, y, depth_in], -1).reshape(-1, 3)
    depth, _ = organize_cloud(cfg, pts)
    np.testing.assert_allclose(np.asarray(depth), depth_in, rtol=1e-5)


def test_flatten_vertices():
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [0, 0, 0], [1, 0, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    v2, f2, _ = flatten_vertices(verts, faces)
    assert len(v2) == 4  # two duplicates welded
    assert len(f2) == 2
    # triangle 2 now references the welded vertices of triangle 1
    assert set(f2[0]) & set(f2[1])


def test_flatten_drops_degenerate():
    verts = np.array([[0, 0, 0], [1e-6, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    v2, f2, _ = flatten_vertices(verts, faces, min_dist=1e-4)
    assert len(f2) == 0  # vertices 0/1 weld -> degenerate face removed


def test_cleanup_removes_small_clusters():
    # big planar patch of faces + one far-away isolated triangle
    verts = []
    faces = []
    for i in range(10):
        base = len(verts)
        verts += [[i * 0.01, 0, 0], [i * 0.01 + 0.005, 0.01, 0], [i * 0.01 + 0.01, 0, 0]]
        faces.append([base, base + 1, base + 2])
    base = len(verts)
    verts += [[5, 5, 5], [5.01, 5, 5], [5, 5.01, 5]]
    faces.append([base, base + 1, base + 2])
    v2, f2, _ = cleanup_mesh(np.array(verts, np.float32), np.array(faces, np.int32),
                             face_dist=0.02, min_neighbors=5)
    assert len(f2) == 10  # isolated triangle culled
    assert len(v2) == 30


def test_estimate_intrinsics_recovers_pinhole():
    W, H = 64, 48
    fx, fy, cx, cy = 52.5, 53.1, 31.2, 23.9
    rng = np.random.RandomState(1)
    z = 1.0 + rng.rand(H, W)
    uu, vv = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    x = (uu - cx) / fx * z
    y = (vv - cy) / fy * z
    xyz = np.stack([x, y, z], -1)
    fx2, fy2, cx2, cy2, err = estimate_intrinsics(xyz, W, H)
    assert fx2 == pytest.approx(fx, rel=1e-6)
    assert fy2 == pytest.approx(fy, rel=1e-6)
    assert cx2 == pytest.approx(cx, rel=1e-5)
    assert cy2 == pytest.approx(cy, rel=1e-5)
    assert err < 1e-10


def test_voxel_downsample():
    pts = np.array([[0, 0, 0], [0.001, 0, 0], [1, 1, 1]], np.float64)
    out, _ = voxel_downsample(pts, None, leaf=0.01)
    assert len(out) == 2
    np.testing.assert_allclose(sorted(out[:, 0]), [0.0005, 1.0])
