"""Finer ablation of _corner_stacks to find the remaining cost."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.activation import _compact
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.marching_cubes import _corner_stacks
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

    K, B, V, C = 2048, 8, 512, bv.capacity

    @jax.jit
    def s_rowgather(bv, slot0):
        own = jax.lax.dynamic_slice(bv.sdf, (slot0, 0, 0, 0), (K, B, B, B))
        return jnp.sum(own)

    @jax.jit
    def s_elementwise(bv, slot0):
        own = jax.lax.dynamic_slice(bv.sdf, (slot0, 0, 0, 0), (K, B, B, B))
        return jnp.sum(jnp.abs(own) * 0.5 + own)

    @jax.jit
    def s_neighbor_gathers(bv, slot0):
        coords = jax.lax.dynamic_slice(bv.coords, (slot0, 0), (K, 3))
        slot_live = coords[:, 0] >= 0
        nbx, nby, nbz = bv.bricks_per_axis
        bmap_flat = bv.brick_map.reshape(-1)
        acc = jnp.float32(0)
        for bits in [(1, 0, 0), (0, 1, 0), (0, 0, 1)]:
            nc = coords + jnp.asarray(bits, jnp.int32)
            ok = slot_live & (nc[:, 0] < nbx) & (nc[:, 1] < nby) & (nc[:, 2] < nbz)
            blin = (nc[:, 0] * nby + nc[:, 1]) * nbz + nc[:, 2]
            nslot = jnp.take(bmap_flat, jnp.clip(blin, 0, nbx * nby * nbz - 1), mode="clip")
            nslot = jnp.where(ok & (nslot >= 0), nslot, C)
            if bits == (1, 0, 0):
                src = bv.sdf[:, 0].reshape(C, B * B)
            elif bits == (0, 1, 0):
                src = bv.sdf[:, :, 0].reshape(C, B * B)
            else:
                src = bv.sdf[:, :, :, 0].reshape(C, B * B)
            src = jax.lax.optimization_barrier(src)
            acc += jnp.sum(jnp.take(src, nslot, axis=0, mode="fill", fill_value=-1.0))
        return acc

    @jax.jit
    def s_stacks(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(bv, slot0, K, 0.5)
        return jnp.sum(dstack)

    @jax.jit
    def s_stacks_mask(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(bv, slot0, K, 0.5)
        return jnp.sum(dstack) + jnp.sum(cube_ok)

    @jax.jit
    def s_compact(bv, slot0):
        dstack, cube_ok, coords, live = _corner_stacks(bv, slot0, K, 0.5)
        brick_any = jnp.any(cube_ok, axis=1)
        bidx, nb = _compact(brick_any, jnp.arange(K, dtype=jnp.int32), 512)
        bsafe = jnp.maximum(bidx, 0)
        sub_ok = jnp.take(cube_ok, bsafe, axis=0) & (bidx >= 0)[:, None]
        idx2, n2 = _compact(sub_ok.reshape(-1), jnp.arange(512 * V, dtype=jnp.int32), 1 << 15)
        return jnp.sum(idx2) + jnp.sum(dstack)

    for name, fn in (("rowgather own", s_rowgather),
                     ("elementwise own", s_elementwise),
                     ("3 neighbor gathers", s_neighbor_gathers),
                     ("corner stacks", s_stacks),
                     ("stacks+mask", s_stacks_mask),
                     ("+2lvl compact", s_compact)):
        r = fn(bv, jnp.int32(0)); _ = float(fence(r * 1.0))
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = fn(bv, jnp.int32(0)); _ = float(fence(r * 1.0))
            ts.append((time.time() - t0) * 1000)
        print(f"{name}: min {min(ts):.1f} med {sorted(ts)[2]:.1f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
