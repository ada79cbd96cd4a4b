"""Measure brick-integrate throughput on TPU at 512^3 and 2048^3 (new
hierarchical activation). Run as a detached background job."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cpu_tsdf_tpu import TSDFConfig
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.synthetic import sphere_depth


def fence(x):
    return float(jnp.sum(x))


def tilted_pose():
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4)
    m[:3, :3] = Ry @ Rx
    m[:3, 3] = (0.013, 0.021, -1.0)
    return m.astype(np.float32)


def run(name, cfg, capacity, budget, use_pallas, frames=30):
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))
    pose = jnp.asarray(tilted_pose())
    bv = make_brick_volume(cfg, 8, capacity)
    t0 = time.time()
    bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
    fence(bv.weight)
    print(f"{name}: compile+first {time.time()-t0:.1f}s n_active={int(bv.n_active)} "
          f"overflow={bool(bv.overflowed)}", flush=True)
    for trial in range(3):
        t0 = time.time()
        for _ in range(frames):
            bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
        fence(bv.weight)
        per = (time.time() - t0) / frames
        print(f"{name}: trial {trial}: {per*1000:.2f} ms/frame = {1/per:.1f} fps",
              flush=True)


def main():
    print("device:", jax.devices()[0], flush=True)
    cfg512 = TSDFConfig().with_updates(min_sensor_dist=0.3)
    run("512 pallas", cfg512, 1 << 15, 1 << 12, True)
    run("512 xla", cfg512, 1 << 15, 1 << 12, False)
    # the reference CLI default working point: 12 m volume, 2048^3
    cfg2048 = TSDFConfig().with_updates(
        xres=2048, yres=2048, zres=2048, xsize=12.0, ysize=12.0, zsize=12.0,
        min_sensor_dist=0.3)
    run("2048 pallas", cfg2048, 1 << 15, 1 << 12, True, frames=20)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
