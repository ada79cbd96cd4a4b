"""Hardware probe for the fusion-kernel depth-lookup tuning knobs.

Two independent cuts to the kernel's per-brick lookup cost, both gated by
the same footprint-fits pattern (non-fitting bricks take the XLA fallback):
  - column window (pallas_window): the one-hot matmul contracts over a
    256-wide, 128-aligned window instead of the full padded image width
    (needs a lane-dim pl.ds — the unproven lowering this probe validates);
  - narrow band (pallas_band=64): the depth band is 64 rows instead of 128,
    shrinking the matmul output rows and the VPU row-mask reduce
    (sublane-dim pl.ds, same mechanism as the proven 128-row slice).

Run when the TPU tunnel is alive:
    timeout 3600 python bench/window_probe.py

Checks, in order, for each (window, band) combo:
  1. the kernel COMPILES on the Mosaic toolchain;
  2. on-chip parity vs the (False, 128) baseline (weights exact, sdf 1e-5);
  3. frame timing at the bench's 512^3 working point.
If a combo wins, flip USE_DEPTH_WINDOW / USE_NARROW_BAND defaults in
cpu_tsdf_tpu.ops.pallas_fusion (or export TSDF_FUSE_WINDOW=1 /
TSDF_FUSE_BAND64=1) and re-run bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = [  # (window, band) — baseline first, it anchors parity
    (False, 128),
    (True, 128),
    (False, 64),
    (True, 64),
]


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

    def build(window, band):
        bv = make_brick_volume(cfg, 8, 1 << 15)
        t0 = time.time()
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False,
                              pallas_window=window, pallas_band=band)
        _ = float(fence(bv.weight))
        print(f"window={window} band={band}: compile+first {time.time()-t0:.1f}s "
              f"active={int(bv.n_active)} overflow={bool(bv.overflowed)}",
              flush=True)
        for _ in range(11):
            bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False,
                                  pallas_window=window, pallas_band=band)
        _ = float(fence(bv.weight))
        return bv

    vols = {}
    for window, band in COMBOS:
        vols[(window, band)] = build(window, band)   # 1. compiles?

    # 2. parity on-chip vs the (False, 128) baseline
    ref = vols[COMBOS[0]]
    wr = np.asarray(ref.weight); sr = np.asarray(ref.sdf)
    for combo in COMBOS[1:]:
        wd = np.asarray(vols[combo].weight)
        sd = np.asarray(vols[combo].sdf)
        exact_w = (wd == wr).mean()
        sdf_max = np.abs(sd - sr).max()
        print(f"parity {combo}: weights equal {exact_w:.6f}, "
              f"max |sdf delta| {sdf_max:.2e}", flush=True)
        assert exact_w == 1.0 and sdf_max < 1e-5, f"PARITY FAIL {combo}"

    # 3. timing
    best = (None, float("inf"))
    for window, band in COMBOS:
        bv = vols[(window, band)]
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(50):
                bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True,
                                      False, pallas_window=window,
                                      pallas_band=band)
            _ = float(fence(bv.weight))
            ts.append((time.time() - t0) / 50 * 1000)
        ms = min(ts)
        print(f"window={window} band={band}: min {ms:.2f} ms/frame "
              f"= {1000/ms:.1f} fps", flush=True)
        if ms < best[1]:
            best = ((window, band), ms)
    print(f"BEST: window={best[0][0]} band={best[0][1]} {best[1]:.2f} ms/frame",
          flush=True)
    print("DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
