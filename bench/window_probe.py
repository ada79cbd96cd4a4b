"""Hardware probe for the column-windowed fusion-kernel depth lookup.

Run when the TPU tunnel is alive:
    timeout 1800 python bench/window_probe.py

Checks, in order:
  1. the windowed kernel COMPILES on the Mosaic toolchain (lane-dim pl.ds);
  2. on-chip parity: windowed == full-band fusion (weights exact, sdf 1e-5);
  3. frame timing both ways at the bench's 512^3 working point.
If all three pass and the speedup is real, flip
`cpu_tsdf_tpu.ops.pallas_fusion.USE_DEPTH_WINDOW` to default-on (or export
TSDF_FUSE_WINDOW=1) and re-run bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.synthetic import sphere_depth

    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4); m[:3, :3] = Ry @ Rx; m[:3, 3] = (0.013, 0.021, -1.0)
    pose = jnp.asarray(m.astype(np.float32))
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))

    @jax.jit
    def fence(w):
        return jnp.sum(jnp.where(jnp.isnan(w), 0.0, w))

    def build(window):
        bv = make_brick_volume(cfg, 8, 1 << 15)
        t0 = time.time()
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False,
                              pallas_window=window)
        _ = float(fence(bv.weight))
        print(f"window={window}: compile+first {time.time()-t0:.1f}s "
              f"active={int(bv.n_active)} overflow={bool(bv.overflowed)}",
              flush=True)
        for _ in range(11):
            bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False,
                                  pallas_window=window)
        _ = float(fence(bv.weight))
        return bv

    bw = build(True)      # 1. compiles?
    bf = build(False)

    # 2. parity on-chip
    wd = np.asarray(bw.weight); wf = np.asarray(bf.weight)
    sd = np.asarray(bw.sdf); sf = np.asarray(bf.sdf)
    exact_w = (wd == wf).mean()
    sdf_max = np.abs(sd - sf).max()
    print(f"parity: weights equal {exact_w:.6f}, max |sdf delta| {sdf_max:.2e}",
          flush=True)
    assert exact_w == 1.0 and sdf_max < 1e-5, "PARITY FAIL"

    # 3. timing
    for name, window, bv in (("windowed", True, bw), ("full-band", False, bf)):
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(50):
                bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True,
                                      False, pallas_window=window)
            _ = float(fence(bv.weight))
            ts.append((time.time() - t0) / 50 * 1000)
        print(f"{name}: min {min(ts):.2f} ms/frame = {1000/min(ts):.1f} fps",
              flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
