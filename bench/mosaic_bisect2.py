"""Second-stage bisect: variants of the real fusion kernel body."""

import subprocess
import sys
import time

PRELUDE = """
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial

GROUP, V, W, BAND = 8, 512, 640, 128
K = 64

def build(kern, n_in_batch):
    batch_spec = pl.BlockSpec((GROUP, V), lambda k, m: (k, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // GROUP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)] + [batch_spec] * n_in_batch,
        out_specs=[batch_spec])
    return pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=[jax.ShapeDtypeStruct((K, V), jnp.float32)])

meta = jnp.zeros((K, 8), jnp.int32).at[:, 3].set(4).at[:, 4].set(1)
pose = jnp.arange(12, dtype=jnp.float32).reshape(1, 12) * 0.01
depth = jnp.ones((480, 640), jnp.float32)
d0 = jnp.zeros((K, V), jnp.float32)
"""

CASES = {
    # A: meta/pose/loop + per-voxel coordinate math, NO depth access
    "coords_only": """
def kern(meta_ref, pose_ref, depth_ref, d0_ref, out_ref):
    k = pl.program_id(0)
    l = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    lx = (l // 64).astype(jnp.float32)
    p = lambda i: pose_ref[0, i]
    rows = []
    for i in range(GROUP):
        bi = k * GROUP + i
        bx = meta_ref[bi, 0]
        cx = (jnp.asarray(bx, jnp.float32) + lx) * 0.1
        vz = p(8) * cx + p(11)
        u = jnp.trunc(cx * 10.0 / jnp.where(vz > 0, vz, 1.0)).astype(jnp.int32)
        rows.append((u + bi).astype(jnp.float32))
    out_ref[:] = jnp.concatenate(rows, 0)
f = build(kern, 1)
r = f(meta, pose, depth, d0)[0]; assert r.shape == (K, V)
""",
    # B: + static band slice + matmul per loop iteration (no dynamic v0)
    "static_band_matmul": """
def kern(meta_ref, pose_ref, depth_ref, d0_ref, out_ref):
    k = pl.program_id(0)
    l = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    rows = []
    for i in range(GROUP):
        band = depth_ref[0:BAND, :]
        u = jnp.clip(l + i, 0, W - 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (W, V), 0)
        onehot = (col_iota == u).astype(jnp.float32)
        m1 = jnp.dot(band, onehot, preferred_element_type=jnp.float32)
        rows.append(jnp.sum(m1, axis=0, keepdims=True))
    out_ref[:] = jnp.concatenate(rows, 0)
f = build(kern, 1)
r = f(meta, pose, depth, d0)[0]; assert r.shape == (K, V)
""",
    # C: + dynamic v0 band slice per loop iteration
    "dyn_band_matmul": """
def kern(meta_ref, pose_ref, depth_ref, d0_ref, out_ref):
    k = pl.program_id(0)
    l = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    rows = []
    for i in range(GROUP):
        bi = k * GROUP + i
        v0 = pl.multiple_of(meta_ref[bi, 3] * 8, 8)
        band = depth_ref[pl.ds(v0, BAND), :]
        u = jnp.clip(l + i, 0, W - 1)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (W, V), 0)
        onehot = (col_iota == u).astype(jnp.float32)
        m1 = jnp.dot(band, onehot, preferred_element_type=jnp.float32)
        rows.append(jnp.sum(m1, axis=0, keepdims=True))
    out_ref[:] = jnp.concatenate(rows, 0)
f = build(kern, 1)
r = f(meta, pose, depth, d0)[0]; assert r.shape == (K, V)
""",
    # D: + row_mask reduce (the full lookup) + jnp.full/stack for ok_brick
    "full_lookup": """
def kern(meta_ref, pose_ref, depth_ref, d0_ref, out_ref):
    k = pl.program_id(0)
    l = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    rows = []
    oks = []
    for i in range(GROUP):
        bi = k * GROUP + i
        v0 = pl.multiple_of(meta_ref[bi, 3] * 8, 8)
        band = depth_ref[pl.ds(v0, BAND), :]
        u = jnp.clip(l + i, 0, W - 1)
        v = jnp.clip(l - i, 0, 479)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (W, V), 0)
        onehot = (col_iota == u).astype(jnp.float32)
        m1 = jnp.dot(band, onehot, preferred_element_type=jnp.float32)
        vrel = jnp.clip(v - v0, 0, BAND - 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (BAND, V), 0)
        row_mask = (row_iota == vrel).astype(jnp.float32)
        rows.append(jnp.sum(m1 * row_mask, axis=0, keepdims=True))
        oks.append(jnp.full((V,), meta_ref[bi, 4], jnp.int32))
    z = jnp.concatenate(rows, 0)
    ok = jnp.stack(oks, 0)
    out_ref[:] = jnp.where(ok > 0, z, d0_ref[:])
f = build(kern, 1)
r = f(meta, pose, depth, d0)[0]; assert r.shape == (K, V)
""",
}


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        code = PRELUDE + CASES[name] + "\nprint('CASE_OK')\n"
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                               text=True, timeout=300)
            ok = "CASE_OK" in p.stdout
            err = ""
            if not ok:
                lines = [l for l in (p.stdout + p.stderr).splitlines()
                         if "rror" in l or "FAIL" in l]
                err = (lines[-1] if lines else (p.stderr[-300:] or "?"))[:300]
            print(f"{name}: {'OK' if ok else 'FAIL'} ({time.time()-t0:.0f}s) {err}",
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"{name}: TIMEOUT", flush=True)
        time.sleep(10)


if __name__ == "__main__":
    main()
