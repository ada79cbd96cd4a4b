"""Dump the optimized-HLO copy ops of the bench-shape integrate step.

The round-4 trace shows ~1.4 ms/frame of full-volume `copy` ops surviving
the fallback-cond removal (bench/integrate_trace). This lowers the exact
bench integrate jit for TPU and prints every copy with its shape/layout so
the source of each copy is attributable (donation, cond branch, reshape).
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import _integrate_bricks_jit, make_brick_volume
    from cpu_tsdf_tpu.ops import pallas_fusion as pf
    from cpu_tsdf_tpu.synthetic import sphere_depth

    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    pose = jnp.eye(4)
    depth = jnp.asarray(sphere_depth(cfg, center=(0.0, 0.0, 1.0), radius=0.5))
    bv = make_brick_volume(cfg, 8, 1 << 15)
    window = pf.USE_DEPTH_WINDOW
    band = pf.resolve_band(None)
    extra = pf.EXTRA_PASS_BUDGET
    lowered = _integrate_bricks_jit.lower(
        bv, depth, pose, None, None, 1 << 12, True, False, window, band, extra)
    compiled = lowered.compile()
    txt = compiled.as_text()
    n_lines = txt.count("\n")
    total_bytes = 0
    counts = {}
    print(f"optimized HLO: {n_lines} lines")
    for line in txt.splitlines():
        if " = " not in line:
            continue
        m = re.search(r"= (f32|s32|u32|pred)\[([\d,]*)\][^ ]* copy\(", line)
        if not m:
            continue
        shape = m.group(2)
        elems = int(np.prod([int(x) for x in shape.split(",") if x])) if shape else 1
        nbytes = elems * 4
        total_bytes += nbytes
        counts[shape] = counts.get(shape, 0) + 1
        if nbytes >= 1 << 20:
            print(f"  COPY {m.group(1)}[{shape}] {nbytes/1e6:.1f} MB :: {line.strip()[:220]}")
    print("copy shape histogram:", counts)
    print(f"total copied: {total_bytes/1e6:.1f} MB "
          f"(~{total_bytes*2/8.19e11*1e3:.2f} ms at peak HBM r+w)")


if __name__ == "__main__":
    main()


def entry_layouts():
    # appended probe: print the ENTRY computation layout + root layout
    import jax
    import jax.numpy as jnp
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.bricks import _integrate_bricks_jit, make_brick_volume
    from cpu_tsdf_tpu.ops import pallas_fusion as pf
    from cpu_tsdf_tpu.synthetic import sphere_depth
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    pose = jnp.eye(4)
    depth = jnp.asarray(sphere_depth(cfg, center=(0.0, 0.0, 1.0), radius=0.5))
    bv = make_brick_volume(cfg, 8, 1 << 15)
    lowered = _integrate_bricks_jit.lower(
        bv, depth, pose, None, None, 1 << 12, True, False,
        pf.USE_DEPTH_WINDOW, pf.resolve_band(None), pf.EXTRA_PASS_BUDGET)
    txt = lowered.compile().as_text()
    for line in txt.splitlines():
        if "entry_computation_layout" in line:
            print(line.strip()[:2000])
            break
    # also grep the custom-call operand layouts (one chunk call)
    import re as _re
    for line in txt.splitlines():
        if "custom-call" in line and "tpu_custom_call" in line and "32768,4,128" in line:
            print(line.strip()[:500]); break


if __name__ == "__main__":
    pass
