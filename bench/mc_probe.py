"""TPU probe: stage timings for the brick marching-cubes extraction.

Builds the bench.py 512^3 scene, then times extract_soup_bricks (device) and
the D2H transfer separately, plus isolated sub-stages to locate bottlenecks.
Run detached: timeout 1800 python bench/mc_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.marching_cubes import (extract_soup_bricks,
                                                 _marching_cubes_brick_chunk)
    from cpu_tsdf_tpu.synthetic import sphere_depth

    log(f"device: {jax.devices()[0]}")
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
    t0 = time.time()
    for _ in range(12):
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, use_pallas, False)
    _ = float(fence(bv.weight))
    log(f"integrate warm: {time.time()-t0:.1f}s, active {int(bv.n_active)}")

    # full extraction: first (compile) then repeated
    t0 = time.time()
    soup = extract_soup_bricks(bv, min_weight=0.5)
    n = int(soup.num_triangles)
    _ = float(fence(soup.vertices))
    log(f"extract first (compile): {time.time()-t0:.1f}s n_tris={n}")
    for rep in range(3):
        t0 = time.time()
        soup = extract_soup_bricks(bv, min_weight=0.5)
        _ = float(fence(soup.vertices))
        dt = time.time() - t0
        log(f"extract_soup: {dt*1000:.1f} ms = {n/dt/1e6:.3f} M tris/s")

    # pipelined unchecked extraction (the bench measurement mode)
    lc = soup.live_chunks
    n = int(soup.num_triangles)
    for rep in range(3):
        t0 = time.time()
        for _ in range(5):
            soup2 = extract_soup_bricks(bv, min_weight=0.5, live_chunks=lc,
                                        check=False)
        _ = float(fence(soup2.vertices))
        dt = (time.time() - t0) / 5
        log(f"pipelined unchecked: {dt*1000:.1f} ms = {n/dt/1e6:.2f} M tris/s")

    # D2H cost
    t0 = time.time()
    v = np.asarray(soup.vertices)
    log(f"D2H {v.nbytes/1e6:.1f} MB: {(time.time()-t0)*1000:.0f} ms")

    # chunk-stage isolation: time the jitted chunk alone (includes everything
    # but per-chunk Python/readbacks)
    t0 = time.time()
    s2, _bo = _marching_cubes_brick_chunk(bv, jnp.int32(0), 2048, 1 << 15, 512,
                                          0.5, False, False)
    _ = float(fence(s2.vertices))
    log(f"chunk call first: {time.time()-t0:.1f}s")
    for rep in range(3):
        t0 = time.time()
        s2, _bo = _marching_cubes_brick_chunk(bv, jnp.int32(0), 2048, 1 << 15,
                                              512, 0.5, False, False)
        _ = float(fence(s2.vertices))
        log(f"chunk call: {(time.time()-t0)*1000:.1f} ms")

    # profile one extraction
    jax.profiler.start_trace(os.path.join(REPO, ".profile_mc"))
    soup = extract_soup_bricks(bv, min_weight=0.5)
    _ = float(fence(soup.vertices))
    jax.profiler.stop_trace()
    log("trace written to .profile_mc")
    log("DONE")


if __name__ == "__main__":
    main()
