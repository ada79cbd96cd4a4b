"""Isolate the 1-device-mesh sharded render overhead vs the plain kernel.

Both run the SAME kernel over the SAME prebuilt pack; the sharded path adds
build_pairs -> per-device slice -> shard_map -> out slice. Prints per-path
times so the gap can be attributed (bench extras showed ~3-4x)."""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cpu_tsdf_tpu import TSDFConfig
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.ops.pallas_raycast import (_render_pallas_jit,
                                             make_render_pack)
from cpu_tsdf_tpu.parallel import make_tsdf_mesh
from cpu_tsdf_tpu.parallel.raycast import (_local_pair_budget,
                                           _render_tile_sharded_jit)
from cpu_tsdf_tpu.synthetic import sphere_depth


def tilted_pose():
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4)
    m[:3, :3] = Ry @ Rx
    m[:3, 3] = (0.013, 0.021, -1.0)
    return m.astype(np.float32)


@jax.jit
def _fence(x):
    return jnp.sum(jnp.where(jnp.isnan(x), 0.0, x))


def timed(f, reps=10):
    """block_until_ready is unreliable through the axon tunnel — force with
    a host-pulled device reduction like bench.py's fence."""
    out = f()
    _ = float(_fence(out))
    ts = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = f()
        _ = float(_fence(out))
        ts.append((time.time() - t0) / reps)
    return statistics.median(ts)


def main():
    out = {}
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    pose = jnp.asarray(tilted_pose())
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))
    use_pallas = jax.devices()[0].platform not in ("cpu",)
    bv = make_brick_volume(cfg, 8, 1 << 15)
    for _ in range(3):
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, use_pallas, False)
    pack = make_render_pack(bv, 4096)
    jax.block_until_ready(pack.tables)
    n_rays = cfg.image_width * cfg.image_height

    t = timed(lambda: _render_pallas_jit(pack, pose, 1, 32768, False, False)[0].depth)
    out["plain_prepacked_ms"] = round(t * 1000, 2)
    out["plain_prepacked_mrays"] = round(n_rays / t / 1e6, 2)

    mesh1 = make_tsdf_mesh(jax.devices()[:1])
    for local in (32768, _local_pair_budget(32768, 1), 10240):
        t = timed(lambda l=local: _render_tile_sharded_jit(
            pack, pose, mesh1, 1, 32768, l, False, False)[0].depth)
        out[f"sharded_local{local}_ms"] = round(t * 1000, 2)
        out[f"sharded_local{local}_mrays"] = round(n_rays / t / 1e6, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
