"""Benchmark the brick-integrate paths (Pallas kernel vs XLA) on the TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cpu_tsdf_tpu import TSDFConfig
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.synthetic import sphere_depth


def fence(x):
    return float(jnp.sum(x))


def main():
    budget = 1 << 12
    print("start", time.strftime("%H:%M:%S"), flush=True)
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    depth = jnp.asarray(sphere_depth(cfg, center=(0.0, 0.0, 1.0), radius=0.5))
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-1.0)

    for use_pallas in (True, False):
        bv = make_brick_volume(cfg, 8, 1 << 15)
        t0 = time.time()
        try:
            bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
            print(f"pallas={use_pallas}: compile+run {time.time()-t0:.1f}s "
                  f"n_active={int(bv.n_active)}", flush=True)
        except Exception as e:
            print(f"pallas={use_pallas} FAILED: {str(e)[:400]}", flush=True)
            continue
        w1 = fence(bv.weight)
        t0 = time.time()
        n = 20
        for _ in range(n):
            bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
        fence(bv.weight)
        per = (time.time() - t0) / n
        print(f"pallas={use_pallas}: steady {per*1000:.1f}ms -> {1/per:.1f} fps "
              f"(wsum {w1:.0f} -> {fence(bv.weight):.0f})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    sys.exit(main())
