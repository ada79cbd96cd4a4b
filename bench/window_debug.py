"""Localize the column-window parity failure (bench/window_probe round 4).

Runs ONE fusion frame from an identical pre-fused state with the column
window off (baseline) and on, diffs the fields, and for every mismatching
brick prints its meta (window index, footprint bounds) plus a host-side
recomputation of the expected depth lookup for the worst voxel. A third run
uses the INTERPRET kernel with window=True to separate "meta/window logic
bug" (interpret differs too) from "Mosaic lane-ds lowering bug" (interpret
matches the baseline, hardware does not).

Usage: timeout 1800 python bench/window_debug.py [--interpret]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.pallas_fusion import brick_meta, DEPTH_WINDOW_COLS
    from cpu_tsdf_tpu.geometry import transform_points
    from cpu_tsdf_tpu.synthetic import sphere_depth

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4); m[:3, :3] = Ry @ Rx; m[:3, 3] = (0.013, 0.021, -1.0)
    pose = jnp.asarray(m.astype(np.float32))
    depth_h = np.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))
    depth = jnp.asarray(depth_h)

    def copy(bv):
        return jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if hasattr(x, "dtype") else x, bv)

    bv0 = make_brick_volume(cfg, 8, 1 << 15)
    bv0 = integrate_bricks(copy(bv0), depth, pose, None, 1 << 12, True, False,
                           pallas_window=False, pallas_band=128)
    s0 = np.asarray(bv0.sdf).reshape(bv0.sdf.shape[0], -1)
    w0_ = np.asarray(bv0.weight).reshape(bv0.sdf.shape[0], -1)
    runs = {"base": dict(pallas_window=False, pallas_band=128),
            "win": dict(pallas_window=True, pallas_band=128)}
    if "--interpret" in sys.argv:
        runs["win_interp"] = dict(pallas_window=True, pallas_band=128,
                                  pallas_interpret=True)
    out = {}
    for name, kw in runs.items():
        interp = kw.pop("pallas_interpret", False)
        bv = integrate_bricks(copy(bv0), depth, pose, None, 1 << 12, True,
                              interp, **kw)
        C = bv.sdf.shape[0]
        out[name] = (np.asarray(bv.sdf).reshape(C, -1),
                     np.asarray(bv.weight).reshape(C, -1),
                     np.asarray(bv.coords), np.asarray(bv.brick_map))
        print(f"{name}: done, active={int(bv.n_active)}", flush=True)

    sb, wb, coords, _ = out["base"]
    for name in [k for k in out if k != "base"]:
        s, w, c2, _ = out[name]
        assert (coords == c2).all(), "allocation diverged between runs!"
        dmask = (s != sb) | (w != wb)
        rows = np.unique(np.argwhere(dmask)[:, 0])
        print(f"\n=== {name}: {dmask.sum()} voxels differ in {len(rows)} bricks")
        pose_inv = np.linalg.inv(np.asarray(pose))
        B = 8
        for r in rows[:8]:
            bx, by, bz = coords[r]
            meta, ok = brick_meta(
                cfg, B, jnp.asarray([bx]), jnp.asarray([by]), jnp.asarray([bz]),
                jnp.asarray([True]), jnp.asarray(pose_inv, jnp.float32),
                window=True, band=128)
            meta = np.asarray(meta)[0]
            vids = np.argwhere(dmask[r])[:, 0]
            print(f"brick {r} coords=({bx},{by},{bz}) meta(v0/8={meta[3]}, "
                  f"ok={meta[4]}, wi={meta[6]}) nmismatch={len(vids)}")
            # host recompute for the first mismatching voxel
            vid = int(vids[0])
            lx, ly, lz = vid // (B * B), (vid // B) % B, vid % B
            gx, gy, gz = bx * B + lx, by * B + ly, bz * B + lz
            cx = (gx + 0.5) * (cfg.xsize / cfg.xres) - cfg.xsize / 2
            cy = (gy + 0.5) * (cfg.ysize / cfg.yres) - cfg.ysize / 2
            cz = (gz + 0.5) * (cfg.zsize / cfg.zres) - cfg.zsize / 2
            px, py, pz = transform_points(jnp.asarray(pose_inv, jnp.float32),
                                          jnp.asarray(cx), jnp.asarray(cy),
                                          jnp.asarray(cz))
            px, py, pz = float(px), float(py), float(pz)
            uf = px * cfg.focal_length_x / pz + cfg.principal_point_x
            vf = py * cfg.focal_length_y / pz + cfg.principal_point_y
            u, v = int(np.trunc(uf)), int(np.trunc(vf))
            zin = depth_h[v, u] if 0 <= v < depth_h.shape[0] and 0 <= u < depth_h.shape[1] else np.nan
            print(f"  voxel vid={vid} l=({lx},{ly},{lz}) uf={uf:.3f} vf={vf:.3f} "
                  f"u={u} v={v} depth={zin:.4f} vz={pz:.4f}")
            print(f"  window cols [{int(meta[6])*128}, {int(meta[6])*128+DEPTH_WINDOW_COLS})  "
                  f"band rows [{int(meta[3])*8}, {int(meta[3])*8+128})")
            print(f"  pre   d={s0[r, vid]:.6f} w={w0_[r, vid]:.2f}")
            print(f"  base  d={sb[r, vid]:.6f} w={wb[r, vid]:.2f}")
            print(f"  {name}  d={s[r, vid]:.6f} w={w[r, vid]:.2f}")
            # infer each engine's frame-2 observation from the averaging
            # (w_new = 1): d_upd = (d_pre*w_pre + d_new) / (w_pre + 1)
            wpre = w0_[r, vid]
            for label, dd in (("base", sb[r, vid]), (name, s[r, vid])):
                d_new = dd * (wpre + 1) - s0[r, vid] * wpre
                z_imp = d_new * cfg.max_dist_neg + pz
                print(f"  {label}: inferred d_new={d_new:.6f} -> z={z_imp:.6f}")
            # host-side f32 observation from the expected pixel
            d32 = (np.float32(zin) - np.float32(pz))
            d32 = min(d32, np.float32(cfg.max_dist_pos)) / np.float32(cfg.max_dist_neg)
            print(f"  host f32 expected d_new={d32:.6f} (z={zin:.6f}) "
                  f"neighbors z: u-1={depth_h[v, u-1]:.6f} u+1={depth_h[v, u+1]:.6f} "
                  f"v-1={depth_h[v-1, u]:.6f} v+1={depth_h[v+1, u]:.6f}")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
