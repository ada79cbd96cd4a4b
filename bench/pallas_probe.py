"""Probe Mosaic/TPU support + throughput for the ray-march kernel primitives.

Each case runs in its own subprocess (a Mosaic compile crash can wedge the
process / TPU tunnel). Results print to stdout.

Cases:
  gather_taa      take_along_axis lane gather (8,128), correctness
  gather_chunked  22-chunk composite lookup over a 2816-entry table, correctness
  gather_speed    chunked-lookup throughput (lookups/s) inside a fori loop
  stream_table    scalar-prefetch-driven BlockSpec index_map table fetch
  accum_out       repeated out-block accumulation across grid steps (sorted)
  kernel_while    lax.while_loop early exit inside a kernel
  xla_gather      XLA arbitrary-gather rate from 1MB and 128MB tables (re-measure)
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
dev = jax.devices()[0]
print("device:", dev, flush=True)

def fence(x):
    return float(jnp.sum(x))
"""

CASES = {
    "gather_taa": """
def kern(tab_ref, idx_ref, out_ref):
    tab = tab_ref[:]                      # (8,128) f32
    idx = idx_ref[:]                      # (8,128) i32 in [0,128)
    out_ref[:] = jnp.take_along_axis(tab, idx, axis=1)
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))
rng = np.random.RandomState(0)
tab = rng.randn(8,128).astype(np.float32)
idx = rng.randint(0,128,(8,128)).astype(np.int32)
r = np.asarray(f(jnp.asarray(tab), jnp.asarray(idx)))
exp = np.take_along_axis(tab, idx, axis=1)
assert np.array_equal(r, exp), (r[:2,:8], exp[:2,:8])
print("gather_taa OK", flush=True)
""",
    "gather_chunked": """
NCH = 22
def kern(tab_ref, idx_ref, out_ref):
    idx = idx_ref[:]
    hi = idx >> 7
    lo = idx & 127
    acc = jnp.zeros((8,128), jnp.float32)
    for c in range(NCH):
        chunk = tab_ref[c:c+1, :]                       # (1,128)
        chunk8 = jnp.broadcast_to(chunk, (8,128))
        part = jnp.take_along_axis(chunk8, lo, axis=1)
        acc = jnp.where(hi == c, part, acc)
    out_ref[:] = acc
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))
rng = np.random.RandomState(0)
tab = rng.randn(NCH,128).astype(np.float32)
idx = rng.randint(0, NCH*128, (8,128)).astype(np.int32)
r = np.asarray(f(jnp.asarray(tab), jnp.asarray(idx)))
exp = tab.reshape(-1)[idx]
assert np.array_equal(r, exp), (r[0,:8], exp[0,:8])
print("gather_chunked OK", flush=True)
""",
    "gather_speed": """
NCH = 22
NIT = 2000
def kern(tab_ref, idx_ref, out_ref):
    idx0 = idx_ref[:]
    def body(i, acc):
        idx = (idx0 + i) % (NCH*128)
        hi = idx >> 7
        lo = idx & 127
        val = jnp.zeros((8,128), jnp.float32)
        for c in range(NCH):
            chunk8 = jnp.broadcast_to(tab_ref[c:c+1, :], (8,128))
            part = jnp.take_along_axis(chunk8, lo, axis=1)
            val = jnp.where(hi == c, part, val)
        return acc + val
    out_ref[:] = jax.lax.fori_loop(0, NIT, body, jnp.zeros((8,128), jnp.float32))
f = jax.jit(pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32)))
rng = np.random.RandomState(0)
tab = jnp.asarray(rng.randn(NCH,128).astype(np.float32))
idx = jnp.asarray(rng.randint(0, NCH*128, (8,128)).astype(np.int32))
fence(f(tab, idx))
t0 = time.time()
REP = 20
for _ in range(REP):
    r = f(tab, idx)
fence(r)
dt = (time.time()-t0)/REP
lk = NIT
print(f"gather_speed: {dt*1e6/lk:.2f} us/lookup-of-1024  -> {1024*lk/dt/1e9:.2f} G elem/s", flush=True)
""",
    "stream_table": """
C, TW = 64, 2816
def kern(meta_ref, tab_ref, out_ref):
    out_ref[:] = tab_ref[:] * 2.0
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(8,),
        in_specs=[pl.BlockSpec((1, TW), lambda k, m: (m[k], 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TW), lambda k, m: (k, 0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((8, TW), jnp.float32))
rng = np.random.RandomState(0)
tab = rng.randn(C, TW).astype(np.float32)
sel = np.asarray([3, 60, 1, 1, 17, 0, 63, 5], np.int32)
r = np.asarray(f(jnp.asarray(sel), jnp.asarray(tab)))
assert np.allclose(r, tab[sel]*2.0)
print("stream_table OK", flush=True)
""",
    "accum_out": """
# pairs sorted by out tile; first-visit init via meta flag
def kern(meta_ref, x_ref, out_ref):
    k = pl.program_id(0)
    first = meta_ref[k, 1]
    @pl.when(first == 1)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)
    out_ref[:] = out_ref[:] + x_ref[:]
f = pl.pallas_call(kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(6,),
        in_specs=[pl.BlockSpec((1, 128), lambda k, m: (k, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128), lambda k, m: (m[k, 0], 0), memory_space=pltpu.VMEM)),
    out_shape=jax.ShapeDtypeStruct((3, 128), jnp.float32))
# pairs: tiles [0,0,1,2,2,2]
meta = np.asarray([[0,1],[0,0],[1,1],[2,1],[2,0],[2,0]], np.int32)
x = np.arange(6*128, dtype=np.float32).reshape(6,128)
r = np.asarray(f(jnp.asarray(meta), jnp.asarray(x)))
exp = np.stack([x[0]+x[1], x[2], x[3]+x[4]+x[5]])
assert np.allclose(r, exp), (r[:,0], exp[:,0])
print("accum_out OK", flush=True)
""",
    "kernel_while": """
def kern(x_ref, out_ref):
    def cond(s):
        i, acc = s
        return (i < 100) & (jnp.max(acc) < 50.0)
    def body(s):
        i, acc = s
        return i+1, acc + x_ref[:]
    i, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.zeros((8,128), jnp.float32)))
    out_ref[:] = acc + jnp.float32(i)
f = pl.pallas_call(kern,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32))
x = np.ones((8,128), np.float32)
r = np.asarray(f(jnp.asarray(x)))
assert np.allclose(r, 50.0 + 50.0), r[0,0]
print("kernel_while OK", flush=True)
""",
    "xla_gather": """
for size_mb, n_idx in ((1, 1<<20), (128, 1<<20)):
    n = size_mb * (1<<20) // 4
    tab = jnp.arange(n, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, n, n_idx).astype(np.int32))
    g = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i)))
    fence(g(tab, idx))
    t0 = time.time(); REP=10
    for _ in range(REP):
        r = g(tab, idx)
    fence(r)
    dt = (time.time()-t0)/REP
    print(f"xla_gather {size_mb}MB table: {n_idx/dt/1e9:.3f} G elem/s", flush=True)
# row gather: [N,128] rows
tab = jnp.ones((1<<17, 128), jnp.float32)
idx = jnp.asarray(np.random.RandomState(0).randint(0, 1<<17, 1<<15).astype(np.int32))
g = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i, axis=0)))
fence(g(tab, idx))
t0=time.time(); REP=10
for _ in range(REP):
    r = g(tab, idx)
fence(r)
dt=(time.time()-t0)/REP
print(f"xla_row_gather 128-wide: {(1<<15)*128/dt/1e9:.3f} G elem/s ({(1<<15)/dt/1e6:.2f} M rows/s)", flush=True)
""",
}


def main():
    names = sys.argv[1:] or list(CASES)
    for name in names:
        code = PRELUDE + CASES[name]
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", code], timeout=420,
                               capture_output=True, text=True)
            out = (p.stdout + p.stderr).strip().splitlines()
            tail = "\n  ".join(out[-6:])
            print(f"[{name}] rc={p.returncode} ({time.time()-t0:.0f}s)\n  {tail}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"[{name}] TIMEOUT", flush=True)


if __name__ == "__main__":
    main()
