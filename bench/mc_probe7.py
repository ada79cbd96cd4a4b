"""Separate the tunnel-fence floor from device time for brick MC.

mc_probe5's per-rep numbers fold an unknown per-trial fence cost into each
stage; here the fence floor is measured directly and every stage runs at
REPS high enough that the floor is <0.5 ms/rep. Also prints the actual
n_cubes / n_bricks so budget hints can be judged, and times the real
extract_soup_bricks hint path exactly the way bench.py consumes it.
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
    from cpu_tsdf_tpu.ops.marching_cubes import (_brick_stats,
                                                 _extract_chunk_compact,
                                                 extract_soup_bricks)
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

    use_pallas = jax.devices()[0].platform not in ("cpu",)
    bv = make_brick_volume(cfg, 8, 1 << 15)
    for _ in range(12):
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, use_pallas, False)
    _ = float(fence(bv.weight))
    print(f"active {int(bv.n_active)}", flush=True)

    # ---- fence floor ------------------------------------------------------
    small = jnp.ones((8,), jnp.float32)
    _ = float(fence(small))
    for reps in (1, 10):
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = small
            for _ in range(reps):
                r = r * 1.000001
            _ = float(fence(r))
            ts.append((time.time() - t0) * 1000)
        print(f"fence floor ({reps} tiny ops): min {min(ts):.2f} ms", flush=True)

    # ---- counts -----------------------------------------------------------
    stats = _brick_stats(bv, (0,), 2048, 2.5)
    v, c, _tv, _n, _o, st = _extract_chunk_compact(
        bv, stats, jnp.int32(0), 2048, 1 << 15, 512, 1 << 16, 2.5, False,
        False)
    stn = np.asarray(st)
    print(f"n_tris {stn[0]} ovf {stn[1:4].tolist()} n_cubes {stn[4]} "
          f"n_bricks {stn[5]}", flush=True)

    # ---- full chunk at high REPS, default and hint budgets ---------------
    def timed(name, fn, reps):
        r = fn(); _ = float(fence(jnp.sum(r)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            rs = None
            for _ in range(reps):
                rs = fn()
            _ = float(fence(jnp.sum(rs)))
            ts.append((time.time() - t0) * 1000 / reps)
        print(f"{name}: min {min(ts):.2f} med {sorted(ts)[1]:.2f} ms/rep",
              flush=True)

    def pow2(n):
        return 1 << int(np.ceil(np.log2(max(int(n), 1))))

    cb_h = pow2(stn[4] * 5 // 4)
    kb_h = max(256, pow2(stn[5] * 5 // 4))
    tb_h = pow2(stn[0] * 5 // 4)
    print(f"hints: CB={cb_h} KB={kb_h} TB={tb_h}", flush=True)

    timed("full CB=32k KB=512 TB=64k",
          lambda: _extract_chunk_compact(bv, stats, jnp.int32(0), 2048,
                                         1 << 15, 512, 1 << 16, 2.5,
                                         False, False)[0], 40)
    timed("full hint budgets",
          lambda: _extract_chunk_compact(bv, stats, jnp.int32(0), 2048,
                                         cb_h, kb_h, tb_h, 2.5,
                                         False, False)[0], 40)

    # ---- the real bench path ---------------------------------------------
    s1 = extract_soup_bricks(bv, min_weight=2.5)
    print(f"checked soup: {int(s1.num_triangles)} tris, hints "
          f"{s1.budget_hint}", flush=True)
    lc, bh = s1.live_chunks, s1.budget_hint
    for reps in (5, 20):
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(reps):
                soup = extract_soup_bricks(bv, min_weight=2.5, live_chunks=lc,
                                           budget_hint=bh, check=False)
            _ = float(fence(soup.vertices))
            ts.append((time.time() - t0) * 1000 / reps)
        n = int(s1.num_triangles)
        best = min(ts)
        print(f"unchecked hint path reps={reps}: min {best:.2f} ms/rep "
              f"-> {n / best * 1000 / 1e6:.2f} M tris/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
