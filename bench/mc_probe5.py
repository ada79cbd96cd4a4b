"""Async-pipelined stage ablation of brick MC extraction.

mc_probe4's per-call fences measured only the ~30 ms tunnel sync floor; here
every stage runs REPS times fully async with ONE fence, so per-rep numbers
reflect device compute + per-dispatch overhead (the same way bench.py
measures extraction).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REPS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.activation import _compact
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.marching_cubes import (_brick_stats, _compact_soup,
                                                 _corner_stacks, _emit_soup,
                                                 _extract_chunk_compact)
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
    stats = _brick_stats(bv, (0,), 2048, 2.5)

    K, B, V, C = 2048, 8, 512, bv.capacity
    CB, KB, TB = 1 << 15, 512, 1 << 16

    @jax.jit
    def s_stacks(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(bv, jnp.arange(K, dtype=jnp.int32), 2.5)
        return jnp.sum(dstack) + jnp.sum(cube_ok)

    @jax.jit
    def s_compact2(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(bv, jnp.arange(K, dtype=jnp.int32), 2.5)
        brick_any = jnp.any(cube_ok, axis=1)
        bidx, nb = _compact(brick_any, jnp.arange(K, dtype=jnp.int32), KB)
        bsafe = jnp.maximum(bidx, 0)
        sub_ok = jnp.take(cube_ok, bsafe, axis=0) & (bidx >= 0)[:, None]
        idx2, n2 = _compact(sub_ok.reshape(-1),
                            jnp.arange(KB * V, dtype=jnp.int32), CB)
        return jnp.sum(idx2) + jnp.sum(dstack)

    @jax.jit
    def s_vals(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(bv, jnp.arange(K, dtype=jnp.int32), 2.5)
        brick_any = jnp.any(cube_ok, axis=1)
        bidx, nb = _compact(brick_any, jnp.arange(K, dtype=jnp.int32), KB)
        bsafe = jnp.maximum(bidx, 0)
        sub_ok = jnp.take(cube_ok, bsafe, axis=0) & (bidx >= 0)[:, None]
        idx2, n2 = _compact(sub_ok.reshape(-1),
                            jnp.arange(KB * V, dtype=jnp.int32), CB)
        i2 = jnp.maximum(idx2, 0)
        s = jnp.take(bsafe, i2 // V)
        idxs = s * V + i2 % V
        vals = jnp.take(dstack, idxs, axis=0)  # dstack is [K*V, 8], corners last
        return jnp.sum(vals)

    @jax.jit
    def s_emit(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(bv, jnp.arange(K, dtype=jnp.int32), 2.5)
        brick_any = jnp.any(cube_ok, axis=1)
        bidx, nb = _compact(brick_any, jnp.arange(K, dtype=jnp.int32), KB)
        bsafe = jnp.maximum(bidx, 0)
        sub_ok = jnp.take(cube_ok, bsafe, axis=0) & (bidx >= 0)[:, None]
        idx2, n2 = _compact(sub_ok.reshape(-1),
                            jnp.arange(KB * V, dtype=jnp.int32), CB)
        ok2 = idx2 >= 0
        i2 = jnp.maximum(idx2, 0)
        s = jnp.take(bsafe, i2 // V)
        within = i2 % V
        idxs = s * V + within
        vals = jnp.take(dstack, idxs, axis=0) * cfg.max_dist_neg
        cs = jnp.take(coords, s, axis=0)
        lx, ly, lz = within // (B * B), (within // B) % B, within % B
        soup = _emit_soup(cfg, bv.global_transform, cs[:, 0] * B + lx,
                          cs[:, 1] * B + ly, cs[:, 2] * B + lz, vals, ok2,
                          None, n2 > CB)
        return jnp.sum(jnp.where(jnp.isnan(soup.vertices), 0.0, soup.vertices))

    @jax.jit
    def s_full(bv, slot0):
        v, c, _tv, _n, _o, st = _extract_chunk_compact(
            bv, stats, slot0, K, CB, KB, TB, 2.5, False, False)
        return jnp.sum(jnp.where(jnp.isnan(v), 0.0, v)) + jnp.sum(st)

    @jax.jit
    def s_stacks_small(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(
            bv, jnp.arange(512, dtype=jnp.int32), 2.5)
        return jnp.sum(dstack) + jnp.sum(cube_ok)

    @jax.jit
    def s_full_tight(bv, slot0):
        v, c, _tv, _n, _o, st = _extract_chunk_compact(
            bv, stats, slot0, K, 1 << 14, KB, 1 << 16, 2.5, False, False)
        return jnp.sum(jnp.where(jnp.isnan(v), 0.0, v)) + jnp.sum(st)

    for name, fn in (("corner stacks", s_stacks),
                     ("stacks 512 rows", s_stacks_small),
                     ("+2lvl compact", s_compact2),
                     ("+vals gather", s_vals),
                     ("+emit", s_emit),
                     ("full chunk (+soup compact)", s_full),
                     ("full chunk CB=16k", s_full_tight)):
        r = fn(bv, jnp.int32(0)); _ = float(fence(r * 1.0))
        ts = []
        for _ in range(3):
            t0 = time.time()
            rs = None
            for _ in range(REPS):
                rs = fn(bv, jnp.int32(0))
            _ = float(fence(rs * 1.0))
            ts.append((time.time() - t0) * 1000 / REPS)
        print(f"{name}: min {min(ts):.2f} med {sorted(ts)[1]:.2f} ms/rep", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
