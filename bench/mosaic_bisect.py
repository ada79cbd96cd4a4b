"""Bisect which Pallas/Mosaic features crash the remote TPU compiler.

Each candidate kernel runs in its own subprocess (a compile crash wedges the
process); results append to /tmp/mosaic_bisect.log.
"""

import subprocess
import sys
import time

CASES = {
    # 1: dynamic sublane slice from SMEM scalar
    "dynslice": """
def kern(meta_ref, img_ref, out_ref):
    v0 = meta_ref[0]
    out_ref[:] = img_ref[pl.ds(v0, 128), :]
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((128, 640), jnp.float32))
meta = jnp.asarray([7], jnp.int32)
img = jnp.ones((480, 640), jnp.float32)
r = f(meta, img); assert r.shape == (128, 640)
""",
    # 1b: dynamic sublane slice, 8-aligned start with multiple_of hint
    "dynslice8": """
def kern(meta_ref, img_ref, out_ref):
    v0 = pl.multiple_of(meta_ref[0] * 8, 8)
    out_ref[:] = img_ref[pl.ds(v0, 128), :]
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((128, 640), jnp.float32))
meta = jnp.asarray([2], jnp.int32)
img = jnp.ones((512, 640), jnp.float32)
r = f(meta, img); assert r.shape == (128, 640)
""",
    # 1c: full-VMEM image + in-kernel dynamic_slice via jax.lax
    "laxdynslice": """
def kern(meta_ref, img_ref, out_ref):
    v0 = meta_ref[0]
    out_ref[:] = jax.lax.dynamic_slice(img_ref[:], (v0, 0), (128, 640))
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((128, 640), jnp.float32))
meta = jnp.asarray([7], jnp.int32)
img = jnp.ones((512, 640), jnp.float32)
r = f(meta, img); assert r.shape == (128, 640)
""",
    # 2: big onehot iota + compare [640, 512]
    "onehot": """
def kern(u_ref, out_ref):
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (640, 512), 0)
    out_ref[:] = (col_iota == u_ref[:]).astype(jnp.float32)
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((640, 512), jnp.float32))
u = jnp.ones((1, 512), jnp.int32)
r = f(u); assert r.shape == (640, 512)
""",
    # 3: matmul [128,640] @ [640,512]
    "matmul": """
def kern(a_ref, b_ref, out_ref):
    out_ref[:] = jnp.dot(a_ref[:], b_ref[:], preferred_element_type=jnp.float32)
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32))
r = f(jnp.ones((128, 640)), jnp.ones((640, 512))); assert float(r[0,0]) == 640
""",
    # 4: concatenate of [1,V] rows
    "concat": """
def kern(x_ref, out_ref):
    rows = [x_ref[i:i+1, :] * (i + 1.0) for i in range(8)]
    out_ref[:] = jnp.concatenate(rows, axis=0)
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32))
r = f(jnp.ones((8, 512))); assert float(r[7,0]) == 8
""",
    # 5: jnp.full from SMEM scalar + stack
    "fullstack": """
def kern(meta_ref, out_ref):
    rows = [jnp.full((512,), meta_ref[i], jnp.int32) for i in range(8)]
    out_ref[:] = jnp.stack(rows, 0).astype(jnp.float32)
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,), in_specs=[],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32))
r = f(jnp.arange(8, dtype=jnp.int32)); assert float(r[3,0]) == 3
""",
    # 6: SMEM (1,12) float input
    "smemf32": """
def kern(pose_ref, x_ref, out_ref):
    out_ref[:] = x_ref[:] * pose_ref[0, 3] + pose_ref[0, 11]
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32))
r = f(jnp.arange(12, dtype=jnp.float32).reshape(1, 12), jnp.ones((8, 512)))
assert float(r[0,0]) == 14
""",
    # 7: dynamic slice + matmul + reduce combined per grid step
    "combined": """
def kern(meta_ref, img_ref, u_ref, out_ref):
    k = pl.program_id(0)
    v0 = meta_ref[k]
    band = img_ref[pl.ds(v0, 128), :]
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (640, 512), 0)
    onehot = (col_iota == u_ref[:]).astype(jnp.float32)
    m1 = jnp.dot(band, onehot, preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sum(m1, axis=0, keepdims=True)
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 512), lambda k, m: (k, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 512), lambda k, m: (k, 0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((4, 512), jnp.float32))
r = f(jnp.zeros(4, jnp.int32), jnp.ones((480, 640)), jnp.ones((4, 512), jnp.int32))
assert r.shape == (4, 512)
""",
}

PRELUDE = """
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np
"""


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        code = PRELUDE + CASES[name] + "\nprint('CASE_OK')\n"
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                               text=True, timeout=240)
            ok = "CASE_OK" in p.stdout
            err = ""
            if not ok:
                lines = [l for l in (p.stdout + p.stderr).splitlines()
                         if "Error" in l or "error" in l or "FAIL" in l]
                err = (lines[-1] if lines else (p.stderr[-200:] or "?"))[:200]
            print(f"{name}: {'OK' if ok else 'FAIL'} ({time.time()-t0:.0f}s) {err}",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)
        # let the backend settle after a failure
        time.sleep(10)


if __name__ == "__main__":
    main()
