"""Where did the extract_soup_bricks wrapper's 20 ms/rep go? (round 4)

mc_probe7 r4 shows the raw chunk executable unchanged (9.65 ms full-budget
rep vs 9.71 in r3) but the bench-consumed hint path at 25 ms/rep vs 5.5 in
r3. This probe times each host-side component of one unchecked rep:
  a) N async dispatches of one tiny jitted op  (tunnel dispatch floor)
  b) N reps of _brick_stats alone
  c) N reps of _extract_chunk_compact alone (hint budgets)
  d) N reps of the full extract_soup_bricks(check=False)
  e) same as (d) but reusing a prebuilt bstats (patched) — isolates stats
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
    from cpu_tsdf_tpu.ops import marching_cubes as mc
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

    bv = make_brick_volume(cfg, 8, 1 << 15)
    for _ in range(12):
        bv = integrate_bricks(bv, depth, pose, use_pallas=True)
    float(fence(bv.weight))
    print(f"active {int(bv.n_active)}", flush=True)

    soup = mc.extract_soup_bricks(bv, min_weight=0.5)
    n_tris = int(soup.num_triangles)
    float(fence(soup.vertices))
    lc, bh = soup.live_chunks, soup.budget_hint
    print(f"n_tris {n_tris} live_chunks {lc} hints {bh}", flush=True)

    REPS = 40

    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128))
    tiny(x).block_until_ready()

    def timeit(name, fn, reps=REPS):
        best = 1e9
        for _ in range(3):
            t0 = time.time()
            r = None
            for _ in range(reps):
                r = fn()
            _ = float(fence(r if not isinstance(r, tuple) else r[0]))
            best = min(best, (time.time() - t0) / reps)
        print(f"{name}: {best*1e3:.2f} ms/rep", flush=True)
        return best

    timeit("a) tiny op dispatch", lambda: tiny(x))

    cs = min(2048, bv.capacity)
    timeit("b) _brick_stats", lambda: mc._brick_stats(bv, tuple(lc), cs, 0.5)[0])

    bstats = mc._brick_stats(bv, tuple(lc), cs, 0.5)
    cb, kb, tb = bh[0]
    s0 = jnp.int32(lc[0])
    timeit("c) chunk only", lambda: mc._extract_chunk_compact(
        bv, bstats, s0, cs, cb, kb, tb, 0.5, False, False, "pallas")[0])

    timeit("d) extract_soup_bricks unchecked", lambda: mc.extract_soup_bricks(
        bv, min_weight=0.5, live_chunks=lc, budget_hint=bh,
        check=False).vertices)

    orig = mc._brick_stats
    try:
        mc._brick_stats = lambda *a, **k: bstats
        timeit("e) unchecked, stats prebuilt", lambda: mc.extract_soup_bricks(
            bv, min_weight=0.5, live_chunks=lc, budget_hint=bh,
            check=False).vertices)
    finally:
        mc._brick_stats = orig
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
