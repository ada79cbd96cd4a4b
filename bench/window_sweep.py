"""DEPTH_WINDOW_COLS sweep on the real chip (VERDICT r4 'weak' item 1).

The fusion kernel's dominant matmul contracts over the depth column window;
halving it from 256 to 128 halves that contraction. This probe measures
integrate ms/frame at a given window width on the bench scene and checks
bit-exactness vs the XLA engine.

Usage: python bench/window_sweep.py [window_cols]   (default 256)
Prints one JSON line; compile cache shared with bench.py (.jax_cache).
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIN = int(sys.argv[1]) if len(sys.argv) > 1 else 256

import cpu_tsdf_tpu.ops.pallas_fusion as pf

pf.DEPTH_WINDOW_COLS = WIN  # before any trace: baked into the kernel HLO

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cpu_tsdf_tpu import TSDFConfig
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.synthetic import sphere_depth


def tilted_pose():
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4)
    m[:3, :3] = Ry @ Rx
    m[:3, 3] = (0.013, 0.021, -1.0)
    return m.astype(np.float32)


def main():
    out = {"window_cols": WIN, "device": str(jax.devices()[0])}
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    pose = jnp.asarray(tilted_pose())
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))
    budget = 1 << 12
    use_pallas = jax.devices()[0].platform not in ("cpu",)
    out["pallas"] = use_pallas

    @jax.jit
    def fence(w):
        return jnp.sum(jnp.where(jnp.isnan(w), 0.0, w))

    bv = make_brick_volume(cfg, 8, 1 << 15)
    t0 = time.time()
    bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
    _ = float(fence(bv.weight))
    out["compile_s"] = round(time.time() - t0, 1)
    for _ in range(10):
        bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
    _ = float(fence(bv.weight))
    rates = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(50):
            bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
        _ = float(fence(bv.weight))
        rates.append(50 / (time.time() - t0))
    out["fps"] = round(statistics.median(rates), 1)
    out["ms_per_frame"] = round(1000.0 / out["fps"], 3)
    out["overflow"] = bool(bv.overflowed)

    # engine parity at this window width (2 frames, fresh volumes)
    outs = {}
    for eng, use_p in (("kernel", use_pallas), ("xla", False)):
        bvp = make_brick_volume(cfg, 8, 1 << 13)
        for _ in range(2):
            bvp = integrate_bricks(bvp, depth, pose, None, budget, use_p, False)
        outs[eng] = (np.asarray(bvp.sdf), np.asarray(bvp.weight))
    dd = float(np.abs(outs["kernel"][0] - outs["xla"][0]).max())
    wd = float(np.abs(outs["kernel"][1] - outs["xla"][1]).max())
    out["parity_max_d"] = dd
    out["parity_max_w"] = wd
    out["parity_ok"] = dd < 1e-6 and wd == 0.0
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
