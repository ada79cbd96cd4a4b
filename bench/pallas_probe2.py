"""Probe round 2: wide-row dynamic_gather cost, 3D-block streaming/accum.

The ray-march kernel design needs:
  * taa_wide_*   take_along_axis on (8, W) rows for W in {128, 512, 1024, 3072}
                 — ONE op per table lookup if rows can span the whole table
  * speed_*      per-lookup cost at each width (fori loop of 512 lookups)
  * stream3d     scalar-prefetch index_map table fetch with [1, 8, W] blocks
  * accum3d      repeated out-block accumulation with [1, 8, 128] blocks
  * while2       lax.while_loop in-kernel (longer timeout; probe1 timed out)
"""

import subprocess
import sys
import time

PRELUDE = """
import jax, jax.numpy as jnp, numpy as np, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from functools import partial
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("device:", jax.devices()[0], flush=True)

def fence(x):
    return float(jnp.sum(x))

def taa_correct(Wd):
    def kern(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
    f = pl.pallas_call(kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Wd), jnp.float32))
    rng = np.random.RandomState(0)
    tab = rng.randn(8, Wd).astype(np.float32)
    idx = rng.randint(0, Wd, (8, Wd)).astype(np.int32)
    r = np.asarray(f(jnp.asarray(tab), jnp.asarray(idx)))
    exp = np.take_along_axis(tab, idx, axis=1)
    assert np.array_equal(r, exp), (Wd, r[0, :6], exp[0, :6])
    print(f"taa width={Wd} OK", flush=True)

def taa_speed(Wd, NIT=512):
    def kern(tab_ref, idx_ref, out_ref):
        idx0 = idx_ref[:, :128]
        tab = tab_ref[:]
        def body(i, acc):
            idx = (idx0 + i) & (Wd - 1)
            val = jnp.take_along_axis(tab, idx, axis=1)
            return acc + val
        out_ref[:] = jax.lax.fori_loop(0, NIT, body, jnp.zeros((8, 128), jnp.float32))
    f = jax.jit(pl.pallas_call(kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)))
    rng = np.random.RandomState(0)
    tab = jnp.asarray(rng.randn(8, Wd).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, Wd, (8, Wd)).astype(np.int32))
    fence(f(tab, idx))
    t0 = time.time(); REP = 50
    for _ in range(REP):
        r = f(tab, idx)
    fence(r)
    dt = (time.time() - t0) / REP
    print(f"taa_speed width={Wd}: {dt*1e9/NIT:.0f} ns/lookup-of-1024", flush=True)
"""

CASES = {
    "taa_wide": """
for Wd in (128, 512, 1024, 3072):
    taa_correct(Wd)
""",
    "speed128": "taa_speed(128)",
    "speed512": "taa_speed(512)",
    "speed1024": "taa_speed(1024)",
    "speed4096": "taa_speed(4096)",
    "stream3d": """
C, S, Wd = 64, 8, 384
def kern(meta_ref, tab_ref, out_ref):
    out_ref[:] = tab_ref[:] * 2.0
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(8,),
        in_specs=[pl.BlockSpec((1, S, Wd), lambda k, m: (m[k], 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, S, Wd), lambda k, m: (k, 0, 0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((8, S, Wd), jnp.float32))
rng = np.random.RandomState(0)
tab = rng.randn(C, S, Wd).astype(np.float32)
sel = np.asarray([3, 60, 1, 1, 17, 0, 63, 5], np.int32)
r = np.asarray(f(jnp.asarray(sel), jnp.asarray(tab)))
assert np.allclose(r, tab[sel] * 2.0)
print("stream3d OK", flush=True)
""",
    "accum3d": """
def kern(meta_ref, x_ref, out_ref):
    k = pl.program_id(0)
    first = meta_ref[k, 1]
    @pl.when(first == 1)
    def _():
        out_ref[:] = jnp.full_like(out_ref, 1e9)
    out_ref[:] = jnp.minimum(out_ref[:], x_ref[:])
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(6,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda k, m: (k, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda k, m: (m[k, 0], 0, 0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((3, 8, 128), jnp.float32))
meta = np.asarray([[0, 1], [0, 0], [1, 1], [2, 1], [2, 0], [2, 0]], np.int32)
x = np.arange(6 * 8 * 128, dtype=np.float32).reshape(6, 8, 128)
r = np.asarray(f(jnp.asarray(meta), jnp.asarray(x)))
exp = np.stack([np.minimum(x[0], x[1]), x[2], np.minimum(np.minimum(x[3], x[4]), x[5])])
assert np.allclose(r, exp)
print("accum3d OK", flush=True)
""",
    "while2": """
def kern(x_ref, out_ref):
    def cond(s):
        i, acc = s
        return (i < 100) & (jnp.max(acc) < 50.0)
    def body(s):
        i, acc = s
        return i + 1, acc + x_ref[:]
    i, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((8, 128), jnp.float32)))
    out_ref[:] = acc + jnp.float32(i)
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
x = np.ones((8, 128), np.float32)
r = np.asarray(f(jnp.asarray(x)))
assert np.allclose(r, 100.0), r[0, 0]
print("while2 OK", flush=True)
""",
}


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        code = PRELUDE + CASES[name]
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", code], timeout=900,
                               capture_output=True, text=True)
            out = (p.stdout + p.stderr).strip().splitlines()
            tail = "\n  ".join(out[-8:])
            print(f"[{name}] rc={p.returncode} ({time.time()-t0:.0f}s)\n  {tail}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"[{name}] TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
