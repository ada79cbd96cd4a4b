"""Marching-cubes tests: table integrity, watertightness, geometric accuracy
(/root/reference/src/lib/marching_cubes_tsdf_octree.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cpu_tsdf_tpu import TSDFConfig, integrate, make_volume
from cpu_tsdf_tpu.ops import mc_tables
from cpu_tsdf_tpu.ops.marching_cubes import count_active_cubes, extract_mesh, marching_cubes
from cpu_tsdf_tpu.synthetic import sphere_depth
from cpu_tsdf_tpu.volume import TSDFVolume

from test_fusion import tilted_pose


def test_edge_table_matches_sign_changes():
    for code in range(256):
        inside = [(code >> i) & 1 == 1 for i in range(8)]
        crossed = 0
        for e, (a, b) in enumerate(mc_tables.EDGE_CORNERS):
            if inside[a] != inside[b]:
                crossed |= 1 << e
        assert mc_tables.EDGE_TABLE[code] == crossed


def test_tri_table_edges_are_crossed():
    """Every edge a triangle references must be a sign-change edge."""
    for code in range(256):
        for e in mc_tables.TRI_TABLE[code]:
            if e >= 0:
                a, b = mc_tables.EDGE_CORNERS[e]
                assert ((code >> a) & 1) != ((code >> b) & 1)


def test_max_five_triangles():
    assert mc_tables.MAX_TRIS_PER_CUBE == 5
    assert mc_tables.TRI_COUNT[0] == 0 and mc_tables.TRI_COUNT[255] == 0


def _analytic_sphere_volume(res=48, radius=0.35, trunc=0.08):
    """Build a volume directly from the exact sphere SDF (bypasses fusion)."""
    cfg = TSDFConfig(xres=res, yres=res, zres=res, xsize=1.6, ysize=1.6, zsize=1.6,
                     max_dist_pos=trunc, max_dist_neg=trunc)
    i = np.arange(res)
    x = (i + 0.5) * cfg.xsize / res - cfg.xsize / 2
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    dist = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - radius
    d = np.clip(dist / trunc, -1.0, 1.0).astype(np.float32)
    vol = make_volume(cfg)
    return TSDFVolume(sdf=jnp.asarray(d), weight=jnp.full(d.shape, 10.0, jnp.float32),
                      M=vol.M, nsample=vol.nsample, color=None,
                      global_transform=vol.global_transform, config=cfg), radius


def test_sphere_mesh_watertight():
    """The strongest table validator: a closed surface must produce a closed
    2-manifold — every undirected edge shared by exactly two triangles, and
    Euler characteristic V - E + F == 2 (genus 0)."""
    vol, radius = _analytic_sphere_volume()
    verts, faces, _ = extract_mesh(vol, min_weight=0.5)
    assert len(faces) > 500
    # weld identical vertex positions
    keys = np.round(np.asarray(verts, np.float64) * 1e6).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    f = inv[faces]
    # drop degenerate faces (zero-length crossing edges welded together)
    good = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 2] != f[:, 0])
    f = f[good]
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    e_uniq, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2), f"non-manifold edges: {(counts != 2).sum()}"
    V = len(np.unique(f.reshape(-1)))
    E = len(e_uniq)
    F = len(f)
    assert V - E + F == 2, (V, E, F)


def test_sphere_mesh_accuracy():
    """Every vertex should lie on the analytic sphere within ~half a voxel."""
    vol, radius = _analytic_sphere_volume()
    verts, faces, _ = extract_mesh(vol, min_weight=0.5)
    r = np.linalg.norm(verts, axis=1)
    cell = vol.config.xsize / vol.config.xres
    assert np.abs(r - radius).max() < cell / 2
    assert np.abs(r - radius).mean() < cell / 10


def test_consistent_winding():
    """All triangle normals point outward (or all inward) on the sphere."""
    vol, radius = _analytic_sphere_volume()
    verts, faces, _ = extract_mesh(vol, min_weight=0.5)
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    ctr = tri.mean(1)
    area = np.linalg.norm(n, axis=1)
    keep = area > 1e-12
    dots = (n[keep] * ctr[keep]).sum(1)
    frac_out = (dots > 0).mean()
    assert frac_out > 0.999 or frac_out < 0.001, frac_out


def test_fused_sphere_mesh(small_cfg):
    """End-to-end: integrate a depth frame, mesh it, vertices near the sphere."""
    cfg = small_cfg.with_updates(xres=128, yres=128, zres=128,
                                 max_dist_pos=0.04, max_dist_neg=0.04)
    pose = tilted_pose()
    center_cam = np.array([-0.013, -0.021, 0.9])
    depth = sphere_depth(cfg, center=tuple(center_cam), radius=0.3)
    vol = make_volume(cfg)
    vol = integrate(vol, jnp.asarray(depth), jnp.asarray(pose, jnp.float32))
    verts, faces, _ = extract_mesh(vol, min_weight=0.5)
    assert len(faces) > 300
    center_vol = (pose @ np.array([*center_cam, 1.0]))[:3]
    r = np.linalg.norm(verts - center_vol, axis=1)
    # visible hemisphere only; all vertices near radius 0.3
    assert np.abs(r - 0.3).mean() < 0.01
    assert np.abs(r - 0.3).max() < 0.03


def test_min_weight_filter():
    vol, _ = _analytic_sphere_volume()
    # weights are 10 everywhere; min_weight above that yields nothing
    assert count_active_cubes(vol, min_weight=50.0) == 0
    n = count_active_cubes(vol, min_weight=0.5)
    assert n > 500


def test_overflow_flag():
    vol, _ = _analytic_sphere_volume()
    soup = marching_cubes(vol, 0.5, 16)
    assert bool(soup.overflowed)


def test_confidence_coloring():
    vol, _ = _analytic_sphere_volume()
    verts, faces, cols = extract_mesh(vol, min_weight=0.5, color_by_confidence=True)
    assert cols is not None and len(cols) == len(verts)
    # w=10 -> std_dev=0.9 -> red ~ 25.5, blue ~ 229.5
    np.testing.assert_allclose(cols[:, 0], 25.5, atol=0.5)
    np.testing.assert_allclose(cols[:, 2], 229.5, atol=0.5)
    np.testing.assert_allclose(cols[:, 1], 0.0, atol=0.1)


def test_pack_left_rows_random_masks():
    """The butterfly pack-left kernel (interpret mode) must list each row's
    set lanes in ascending order, -1 padded — property-checked against
    numpy on adversarial densities."""
    import numpy as np
    from cpu_tsdf_tpu.ops.marching_cubes import _pack_left_rows

    rng = np.random.RandomState(3)
    rows = []
    for dens in (0.0, 0.02, 0.5, 0.97, 1.0):
        rows.append((rng.uniform(size=(8, 512)) < dens).astype(np.int32))
    # adversarial single rows: one set bit at each end, alternating runs
    extra = np.zeros((4, 512), np.int32)
    extra[0, 0] = 1
    extra[1, 511] = 1
    extra[2, ::2] = 1
    extra[3, 300:310] = 1
    mask = np.concatenate(rows + [extra], 0)
    loc = np.asarray(_pack_left_rows(jnp.asarray(mask), interpret=True))
    for r in range(mask.shape[0]):
        want = np.flatnonzero(mask[r])
        np.testing.assert_array_equal(loc[r, :len(want)], want)
        assert (loc[r, len(want):] == -1).all()


def test_compact_from_loc_matches_scatter_compact():
    """_compact_from_loc (offsets + gathers) must reproduce the scatter
    compaction's ids and count exactly, including budget overflow."""
    import numpy as np
    from cpu_tsdf_tpu.activation import _compact
    from cpu_tsdf_tpu.ops.marching_cubes import (_compact_from_loc,
                                                 _pack_left_rows)

    rng = np.random.RandomState(11)
    mask = (rng.uniform(size=(24, 512)) < 0.07).astype(np.int32)
    loc = _pack_left_rows(jnp.asarray(mask), interpret=True)
    for budget in (64, 1024, 4096):
        ids, n = _compact_from_loc(jnp.asarray(mask), loc, budget)
        flat = mask.reshape(-1)
        ref_ids, ref_n = _compact(jnp.asarray(flat, bool),
                                  jnp.arange(flat.size, dtype=jnp.int32),
                                  budget)
        assert int(n) == int(ref_n)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(ref_ids))


def test_room_scene_brick_extraction_accuracy(small_cfg):
    """Structured-indoor-geometry extraction (ICL-NUIM-class): a camera walk
    through a box room with obstacles, fused into the BRICK volume and
    extracted brick-natively. Flat walls, corners and occlusion boundaries
    produce degenerate MC cases (whole faces in one truncation band) that the
    sphere fixtures never hit; every emitted vertex must lie on the analytic
    scene surface to within 1.5 voxels."""
    from test_ref_extract import _room_depth

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh_bricks

    W, H, FX = 160, 120, 140.0
    cfg = TSDFConfig(
        xres=128, yres=128, zres=128,
        xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.05, max_dist_neg=0.05,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=W, image_height=H,
        focal_length_x=FX, focal_length_y=FX,
        principal_point_x=(W - 1) / 2.0, principal_point_y=(H - 1) / 2.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4,
    )
    rng = np.random.RandomState(5)
    bv = make_brick_volume(cfg, 8, 1 << 12)
    for i in range(6):
        yaw = -0.5 + 0.2 * i
        c, s = np.cos(yaw), np.sin(yaw)
        pose = np.eye(4)
        pose[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pose[:3, 3] = (-0.3 + 0.12 * i, -0.1, -0.35)
        depth = _room_depth(pose, W, H, FX, FX, cfg.principal_point_x,
                            cfg.principal_point_y, rng=rng)
        bv = integrate_bricks(bv, jnp.asarray(depth),
                              jnp.asarray(pose, jnp.float32), None, 1 << 12)
    assert not bool(bv.overflowed)
    assert int(bv.n_active) > 800

    verts, faces, _ = extract_mesh_bricks(bv)
    assert len(faces) > 5_000, len(faces)

    def box_sdf(p, lo, hi):
        q = np.maximum(np.asarray(lo) - p, p - np.asarray(hi))
        outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
        inside = np.minimum(np.max(q, axis=-1), 0.0)
        return outside + inside

    dist = np.minimum.reduce([
        np.abs(box_sdf(verts, [-0.7, -0.7, -0.7], [0.7, 0.7, 0.7])),
        np.abs(box_sdf(verts, [0.1, 0.15, 0.2], [0.45, 0.7, 0.55])),
        np.abs(box_sdf(verts, [-0.55, -0.05, -0.1], [-0.15, 0.05, 0.35])),
    ])
    voxel = cfg.xsize / cfg.xres
    frac = (dist < 1.5 * voxel).mean()
    assert frac > 0.97, (frac, np.percentile(dist, 99) / voxel)


def test_anisotropic_volume_end_to_end():
    """SURVEY §2 quirk row: the reference's OctreeNode only stores a cubic
    cell size, so non-cubic volumes are approximate there; the new build
    supports true per-axis resolution/extent. Integrate + render + extract
    must work with distinct per-axis cell sizes, with the dense and brick
    engines producing identical meshes."""
    from cpu_tsdf_tpu import TSDFConfig, integrate, make_volume, render_view
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.marching_cubes import extract_mesh_bricks
    from cpu_tsdf_tpu.synthetic import sphere_depth

    # 2.5 cm x 3.33 cm x 2 cm cells: resolution AND cell size differ per axis
    cfg = TSDFConfig(
        xres=64, yres=48, zres=80, xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.08, max_dist_neg=0.08,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=40, image_height=30,
        focal_length_x=35.0, focal_length_y=35.0,
        principal_point_x=20.0, principal_point_y=15.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4)
    pose = jnp.asarray(tilted_pose(), jnp.float32)
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 0.9),
                                     radius=0.3))

    vol = integrate(make_volume(cfg), depth, pose)
    v, f, _ = extract_mesh(vol, min_weight=0.5)
    r = np.linalg.norm(v, axis=1)  # sphere center ~ volume origin
    assert len(f) > 400
    assert np.abs(r - 0.3).mean() < 0.012  # within half the coarsest cell

    rv = render_view(vol, pose)
    assert int(np.isfinite(np.asarray(rv.depth)).sum()) > 200

    bv = make_brick_volume(cfg, 8, 2048)
    bv = integrate_bricks(bv, depth, pose, None, 1024)
    assert not bool(bv.overflowed)
    vb, fb, _ = extract_mesh_bricks(bv, min_weight=0.5)
    assert len(fb) == len(f)  # engines agree exactly on the crossing set
    np.testing.assert_allclose(np.sort(vb.reshape(-1)), np.sort(v.reshape(-1)),
                               atol=1e-5)
