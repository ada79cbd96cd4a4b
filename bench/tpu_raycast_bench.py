"""Compile + measure the Pallas ray-march kernel on TPU at the baseline
config (512^3, 640x480). Run detached with a generous timeout."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cpu_tsdf_tpu import TSDFConfig, render_view
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.ops.pallas_raycast import (build_pairs, make_render_pack,
                                             render_view_pallas, _render_pallas_jit)
from cpu_tsdf_tpu.synthetic import sphere_depth


def fence(x):
    return float(jnp.nansum(jnp.where(jnp.isnan(x), 0.0, x)))


def tilted_pose():
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4)
    m[:3, :3] = Ry @ Rx
    m[:3, 3] = (0.013, 0.021, -1.0)
    return m.astype(np.float32)


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    pose = jnp.asarray(tilted_pose())
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))
    bv = make_brick_volume(cfg, 8, 1 << 15)
    t0 = time.time()
    bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False)
    fence(bv.weight)
    print(f"integrate+compile {time.time()-t0:.1f}s n_active={int(bv.n_active)}",
          flush=True)

    n_rays = cfg.image_width * cfg.image_height

    # pack build cost
    t0 = time.time()
    pack = make_render_pack(bv, 4096)
    fence(pack.tables)
    print(f"pack compile+build {time.time()-t0:.1f}s", flush=True)
    for _ in range(2):
        t0 = time.time()
        pack = make_render_pack(bv, 4096)
        fence(pack.tables)
        print(f"pack build {1000*(time.time()-t0):.1f} ms", flush=True)

    meta, _, _ovt, _ovp = build_pairs(pack, pose, 1, 32768); ovf = _ovt | _ovp
    n_pairs = int(jnp.sum(meta[:, 6]))
    print(f"pairs: {n_pairs} overflow={bool(ovf)}", flush=True)

    t0 = time.time()
    res, _of, _ot = _render_pallas_jit(pack, pose, 1, 32768, False, False); ovf = _of | _ot
    fence(res.depth)
    print(f"kernel compile+first render {time.time()-t0:.1f}s", flush=True)

    for trial in range(3):
        t0 = time.time()
        n = 5
        for _ in range(n):
            res, _, _ = _render_pallas_jit(pack, pose, 1, 32768, False, False)
        fence(res.depth)
        per = (time.time() - t0) / n
        print(f"pallas render (prepacked): {per*1000:.1f} ms = "
              f"{n_rays/per/1e6:.2f} M rays/s", flush=True)

    # end-to-end including pack build
    t0 = time.time()
    n = 5
    for _ in range(n):
        pack2 = make_render_pack(bv, 4096)
        res, _, _ = _render_pallas_jit(pack2, pose, 1, 32768, False, False)
    fence(res.depth)
    per = (time.time() - t0) / n
    print(f"pallas render (incl pack): {per*1000:.1f} ms = "
          f"{n_rays/per/1e6:.2f} M rays/s", flush=True)

    d = np.asarray(res.depth)
    print(f"valid pixels: {np.isfinite(d).sum()} / {n_rays}", flush=True)

    # XLA renderer for comparison (downsampled to keep it quick)
    t0 = time.time()
    rx = render_view(bv, pose, downsample_by=4)
    fence(rx.depth)
    print(f"xla render ds=4 compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    rx = render_view(bv, pose, downsample_by=4)
    fence(rx.depth)
    per = time.time() - t0
    print(f"xla render ds=4: {per*1000:.1f} ms = {n_rays/16/per/1e6:.2f} M rays/s",
          flush=True)

    # correctness spot check vs XLA at ds=4
    rp4 = render_view_pallas(bv, pose, downsample_by=4, pack=pack)
    dx = np.asarray(rx.depth)
    dp = np.asarray(rp4.depth)
    both = np.isfinite(dx) & np.isfinite(dp)
    agree = (np.isfinite(dx) == np.isfinite(dp)).mean()
    err = np.abs(dx[both] - dp[both])
    print(f"vs xla ds=4: validity agree {agree:.4f}, median err {np.median(err)*1000:.3f} mm, "
          f"<2mm frac {(err < 2e-3).mean():.4f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
