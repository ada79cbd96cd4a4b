"""Framework benchmark. Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline: depth-frame integration throughput at the reference's library
working point (512^3 voxels, 3m volume, 640x480 @ f=525 — SURVEY §6),
brick-sparse path with the Pallas fusion kernel on TPU.

Baseline: bench/baseline_octree.cpp — a faithful re-creation of the
reference's pointer-octree DESIGN (the reference itself needs PCL, which is
unavailable), same scene, measured on this machine's CPU. The result is
cached in bench/baseline_results.json.

Diagnostics go to stderr; stdout carries exactly the one JSON line.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench", "baseline_results.json")
# Measured on this machine's 4-core CPU (bench/baseline_octree 512 20) in case
# the C++ toolchain is unavailable at bench time.
FALLBACK_BASELINE_FPS = 72.5

FRAMES = 50


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    src = os.path.join(REPO, "bench", "baseline_octree.cpp")
    exe = os.path.join(REPO, "bench", "baseline_octree")
    result = {"integrate_fps": FALLBACK_BASELINE_FPS, "source": "recorded"}
    try:
        if not os.path.exists(exe):
            subprocess.run(["g++", "-O3", "-fopenmp", "-std=c++17", src, "-o", exe],
                           check=True, timeout=120, capture_output=True)
        out = subprocess.run([exe, "512", "20"], check=True, timeout=300,
                             capture_output=True, text=True).stdout
        for line in out.splitlines():
            if line.startswith("integrate:"):
                t = float(line.split("time=")[1].split("s")[0])
                result = {"integrate_fps": 20.0 / t, "source": "measured"}
            if line.startswith("raycast:"):
                result["raycast_rays_per_s"] = float(line.split("rays/s=")[1].split()[0])
        with open(BASELINE_CACHE, "w") as f:
            json.dump(result, f)
    except Exception as e:  # no toolchain -> recorded value
        log(f"baseline build/run failed ({e}); using recorded value")
    return result


def tilted_pose():
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4)
    m[:3, :3] = Ry @ Rx
    m[:3, 3] = (0.013, 0.021, -1.0)
    return m.astype(np.float32)


def main():
    baseline = measure_baseline()
    log(f"baseline: {baseline}")

    import jax

    # Persistent compilation cache: the remote TPU compile helper in this
    # environment takes minutes per kernel; cache across bench runs.
    cache_dir = os.path.join(REPO, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.synthetic import sphere_depth

    platform = jax.devices()[0].platform
    use_pallas = platform not in ("cpu",)
    log(f"device: {jax.devices()[0]} (pallas={use_pallas})")

    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    pose = jnp.asarray(tilted_pose())
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))
    budget = 1 << 12

    @jax.jit
    def fence(w):
        return jnp.sum(w)

    bv = make_brick_volume(cfg, 8, 1 << 15)
    t0 = time.time()
    bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
    _ = float(fence(bv.weight))
    log(f"compile+first frame: {time.time()-t0:.1f}s; active bricks {int(bv.n_active)}")

    t0 = time.time()
    _ = float(fence(bv.weight))
    fence_cost = time.time() - t0

    t0 = time.time()
    for _ in range(FRAMES):
        bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
    _ = float(fence(bv.weight))
    per_frame = (time.time() - t0 - fence_cost) / FRAMES
    fps = 1.0 / per_frame
    voxups = int(bv.n_active) * 512 / per_frame
    log(f"integrate: {per_frame*1000:.1f} ms/frame = {fps:.1f} fps "
        f"({voxups/1e6:.0f}M brick-voxel updates/s); overflow={bool(bv.overflowed)}")

    vs = fps / baseline["integrate_fps"]
    print(json.dumps({
        "metric": "integrate_frames_per_s_512cubed",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 3),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
