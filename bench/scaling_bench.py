"""Multi-chip scaling harness (SURVEY §6 north star: scaling efficiency).

Real multi-chip hardware is unavailable in this environment (one v5e chip
behind a tunnel), so this measures the SPMD code paths on the standard
virtual-device mesh: N host devices share one physical CPU, so wall-clock
cannot show real speedup — what this DOES measure is the overhead the
sharded program adds over the single-device program at the same total work
(collective insertion, partitioned compilation, per-device bookkeeping).
On hardware, per-shard work shrinks ~1/N and the same programs ride ICI;
the closer the virtual-mesh total time stays to 1x, the less sharding
overhead stands between the framework and linear scaling.

Run via `python bench.py --scaling` (subprocess: needs its own XLA_FLAGS)
or directly:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench/scaling_bench.py

Prints one JSON dict on stdout.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import jax.numpy as jnp
import numpy as np

from cpu_tsdf_tpu import TSDFConfig
from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
from cpu_tsdf_tpu.parallel import make_tsdf_mesh, render_view_sharded, shard_volume
from cpu_tsdf_tpu.parallel.sharding import replicate_render_pack
from cpu_tsdf_tpu.parallel.bricks import (integrate_bricks_sharded,
                                          make_sharded_brick_volume)
from cpu_tsdf_tpu.synthetic import sphere_depth


def fence(x):
    return float(jnp.sum(jnp.where(jnp.isnan(x), 0.0, x)))


def main():
    cfg = TSDFConfig(
        xres=128, yres=128, zres=128, xsize=3.0, ysize=3.0, zsize=3.0,
        image_width=160, image_height=120,
        focal_length_x=131.25, focal_length_y=131.25,
        principal_point_x=80.0, principal_point_y=60.0,
        min_sensor_dist=0.3)
    pose = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(-1.0)
    depth = jnp.asarray(sphere_depth(cfg, center=(0.0, 0.0, 1.0), radius=0.5))
    devs = jax.devices("cpu")
    out = {"devices_available": len(devs), "config": "128^3 / 160x120"}

    # single-device reference points
    bv = make_brick_volume(cfg, 8, 4096)
    bv = integrate_bricks(bv, depth, pose, None, 1 << 11, False, False)
    fence(bv.weight)
    t0 = time.time()
    for _ in range(10):
        bv = integrate_bricks(bv, depth, pose, None, 1 << 11, False, False)
    fence(bv.weight)
    t_int_1 = (time.time() - t0) / 10

    from cpu_tsdf_tpu import integrate, make_volume, render_view

    vol1 = integrate(make_volume(cfg), depth, pose)
    r = render_view(vol1, pose)
    fence(r.depth)
    t0 = time.time()
    r = render_view(vol1, pose)
    fence(r.depth)
    t_ray_1 = time.time() - t0
    out["integrate_ms_1dev"] = round(t_int_1 * 1000, 2)
    out["render_ms_1dev"] = round(t_ray_1 * 1000, 2)

    for n in (2, 4, 8):
        if n > len(devs):
            continue
        mesh = make_tsdf_mesh(devs[:n])
        sb = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=4096 // n)
        sb = integrate_bricks_sharded(sb, depth, pose, mesh, update_budget=1 << 11)
        fence(sb.weight)
        t0 = time.time()
        for _ in range(10):
            sb = integrate_bricks_sharded(sb, depth, pose, mesh,
                                          update_budget=1 << 11)
        fence(sb.weight)
        t_int = (time.time() - t0) / 10
        assert not bool(np.asarray(sb.overflowed)), \
            f"slab budget overflow at {n} devices"

        vol8 = shard_volume(make_volume(cfg), mesh)
        vol8 = integrate(vol8, depth, pose)
        pk = replicate_render_pack(vol8, mesh)
        rs = render_view_sharded(pk, pose, mesh)
        fence(rs.depth)
        t0 = time.time()
        rs = render_view_sharded(pk, pose, mesh)
        fence(rs.depth)
        t_ray = time.time() - t0
        out[f"integrate_ms_{n}dev"] = round(t_int * 1000, 2)
        out[f"render_ms_{n}dev"] = round(t_ray * 1000, 2)
        # virtual devices share one CPU: total-time ratio ~1.0 means the
        # sharded program adds no overhead over the single-device program
        out[f"integrate_overhead_{n}dev"] = round(t_int / t_int_1, 3)
        out[f"render_overhead_{n}dev"] = round(t_ray / t_ray_1, 3)

    # ---- tile-sharded Pallas MARCH KERNEL (VERDICT r4 item 1) -------------
    # The kernel only runs in interpret mode on CPU, so wall-clock carries
    # python-interpreter cost — but BOTH sides run the same mode, and padded
    # pairs exit the march immediately, so the ratio still isolates the
    # sharding overhead (pair partitioning + per-device chunking).
    from cpu_tsdf_tpu.ops.pallas_raycast import render_view_pallas
    from cpu_tsdf_tpu.parallel import render_view_pallas_sharded

    rk = render_view_pallas(bv, pose, r_budget=1024, pair_budget=2048,
                            interpret=True)
    fence(rk.depth)
    t0 = time.time()
    rk = render_view_pallas(bv, pose, r_budget=1024, pair_budget=2048,
                            interpret=True)
    fence(rk.depth)
    t_k1 = time.time() - t0
    out["render_kernel_ms_1dev"] = round(t_k1 * 1000, 2)
    for n in (2, 8):
        if n > len(devs):
            continue
        mesh = make_tsdf_mesh(devs[:n])
        rs = render_view_pallas_sharded(bv, pose, mesh, r_budget=1024,
                                        pair_budget=2048, interpret=True)
        np.testing.assert_array_equal(np.asarray(rk.depth),
                                      np.asarray(rs.depth))
        t0 = time.time()
        rs = render_view_pallas_sharded(bv, pose, mesh, r_budget=1024,
                                        pair_budget=2048, interpret=True)
        fence(rs.depth)
        t_k = time.time() - t0
        out[f"render_kernel_ms_{n}dev"] = round(t_k * 1000, 2)
        out[f"render_kernel_overhead_{n}dev"] = round(t_k / t_k1, 3)

    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
