"""Capture a jax.profiler trace of brick MC extraction and print the top
device ops by total duration (parsed from the perfetto trace, no TensorBoard
needed). Ground truth for where the ~9 ms of device time goes.
"""

import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRACE_DIR = "/tmp/mc_trace"


def capture():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.marching_cubes import (_brick_stats,
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

    bv = make_brick_volume(cfg, 8, 1 << 15)
    for _ in range(12):
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False)
    _ = float(fence(bv.weight))
    stats = _brick_stats(bv, (0,), 2048, 2.5)

    def run():
        # hint-sized budgets + the pallas corner engine: the real bench path
        return _extract_chunk_compact(bv, stats, jnp.int32(0), 2048, 24576,
                                      768, 49152, 2.5, False, False,
                                      "pallas")[0]

    r = run(); _ = float(fence(jnp.sum(r)))  # warm
    with jax.profiler.trace(TRACE_DIR):
        rs = None
        for _ in range(8):
            rs = run()
        _ = float(fence(jnp.sum(rs)))
    print("trace captured", flush=True)


def analyze():
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found"); return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid/tid named via metadata; just bucket by
    # name over X events that look like XLA ops (have dur)
    tid_names = {}
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e["args"]["name"]
    tot = {}
    cnt = {}
    dev_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pn = pid_names.get(e.get("pid"), "")
        if "TPU" not in pn and "/device" not in pn.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] = tot.get(name, 0.0) + dur
        cnt[name] = cnt.get(name, 0) + 1
        dev_total += dur
    print(f"device total {dev_total:.2f} ms over 8 reps "
          f"= {dev_total / 8:.2f} ms/rep across {len(tot)} op names")
    for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {d / 8:7.3f} ms/rep x{cnt[name] // 8:4d}  {name[:110]}")


if __name__ == "__main__":
    if "--analyze-only" not in sys.argv:
        capture()
    analyze()
