"""Isolate the bf16-split lookup discrepancy: XLA-precomputed planes vs
in-kernel splits, both through the same Mosaic one-hot dot.

m1 = dot(hi) + dot(md) + dot(lo) with an identity one-hot must reproduce
the f32 depth column bit-exactly. Compares both plane sources on chip.
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_inkernel(d_ref, out_ref):
    d = d_ref[...]
    bf = jnp.bfloat16
    f32 = jnp.float32
    hi = d.astype(bf).astype(f32)
    r1 = d - hi
    md = r1.astype(bf).astype(f32)
    lo = (r1 - md).astype(bf).astype(f32)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    onehot = (iota_r == iota_c).astype(f32)
    dot = lambda a: jnp.dot(a, onehot, preferred_element_type=f32)
    out_ref[...] = dot(hi) + dot(md) + dot(lo)


def kernel_planes(hi_ref, md_ref, lo_ref, out_ref):
    f32 = jnp.float32
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    onehot = (iota_r == iota_c).astype(f32)
    dot = lambda a: jnp.dot(a, onehot, preferred_element_type=f32)
    out_ref[...] = dot(hi_ref[...]) + dot(md_ref[...]) + dot(lo_ref[...])


def main():
    rng = np.random.default_rng(0)
    d = (rng.uniform(0.3, 3.0, (128, 256)).astype(np.float32))
    dj = jnp.asarray(d)
    want = d[:, :128]

    out1 = pl.pallas_call(
        kernel_inkernel,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )(dj)
    bf = jnp.bfloat16
    hi = dj.astype(bf).astype(jnp.float32)
    r1 = dj - hi
    md = r1.astype(bf).astype(jnp.float32)
    lo = (r1 - md).astype(bf).astype(jnp.float32)
    # host-side check of the reconstruction itself
    rec = np.asarray(hi) + np.asarray(md) + np.asarray(lo)
    print("xla planes reconstruct:", np.abs(rec - d).max())
    out2 = pl.pallas_call(
        kernel_planes,
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    )(hi, md, lo)
    print("in-kernel split err:", np.abs(np.asarray(out1) - want).max())
    print("xla-plane err:     ", np.abs(np.asarray(out2) - want).max())


if __name__ == "__main__":
    main()
