"""Capture a jax.profiler trace of one brick-integrate frame (the bench's
512^3 working point, Pallas kernel) and print device ops by total duration.
Ground truth for where the ~9.8 ms/frame goes (hbm roofline says 0.43% of
peak, so nearly all of it is overhead of some kind).
"""

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRACE_DIR = "/tmp/integrate_trace"


def capture():
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

    bv = make_brick_volume(cfg, 8, 1 << 15)
    for _ in range(12):
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False)
    _ = float(fence(bv.weight))
    print(f"active {int(bv.n_active)}", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(8):
            bv = integrate_bricks(bv, depth, pose, None, 1 << 12, True, False)
        _ = float(fence(bv.weight))
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
    pid_names = {e.get("pid"): e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tot, cnt, src = {}, {}, {}
    dev_total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pn = pid_names.get(e.get("pid"), "")
        if "TPU" not in pn and "/device" not in pn.lower():
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue
        dur = e.get("dur", 0) / 1e3
        tot[name] = tot.get(name, 0.0) + dur
        cnt[name] = cnt.get(name, 0) + 1
        src.setdefault(name, e.get("args", {}).get("source", ""))
        dev_total += dur
    print(f"device op total {dev_total / 8:.2f} ms/frame across {len(tot)} names")
    for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {d / 8:7.3f} ms  x{cnt[name] // 8:3d}  {name[:40]:40s} {src[name]}")
    # grouped by op base type
    cat = {}
    for name, d in tot.items():
        base = re.sub(r"[.\d]+$", "", name)
        cat[base] = cat.get(base, 0.0) + d
    print("by category:")
    for k, v in sorted(cat.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {v / 8:7.3f} ms  {k}")


if __name__ == "__main__":
    if "--analyze-only" not in sys.argv:
        capture()
    analyze()
