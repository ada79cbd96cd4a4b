"""A/B depth_mips build variants on the TPU (640x480 bench image).

integrate_trace r4 attributes ~1.7 ms/frame to the mip build: the pad-copy
pair (2 full [512,1024] at[].set x 2 pyramids) plus level-0/1 reduces whose
reshape(h, 2, w, 2) puts a 2-wide minor dim in vregs (64x lane padding).
Variants keep EXACT output packing (flat pyramids, same offsets/widths):

  v0  current reshape(h,rh,w,rw) + min axis (1,3)
  v1  rows via reshape(h,2,w) (minor dim stays w), cols via ::2 strided
  v2  v1 + single NaN pad (pad depth once, NaN-aware masks fused in level 1)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from cpu_tsdf_tpu.activation import DepthMips, depth_mips, mip_shapes

    H, W = 480, 640
    rng = np.random.default_rng(0)
    d = rng.uniform(0.5, 3.0, (H, W)).astype(np.float32)
    d[rng.uniform(size=(H, W)) < 0.3] = np.nan
    depth = jnp.asarray(d)

    @jax.jit
    def fence(x):
        return jnp.sum(jnp.where(jnp.isnan(x), 0.0, x))

    shapes = mip_shapes(H, W)
    Hp, Wp = shapes[0]
    inf = jnp.float32(jnp.inf)

    def pack(mins, maxs):
        offsets = np.cumsum([0] + [h * w for (h, w) in shapes[:-1]])
        return DepthMips(
            flat_min=jnp.concatenate([m.reshape(-1) for m in mins]),
            flat_max=jnp.concatenate([m.reshape(-1) for m in maxs]),
            offsets=jnp.asarray(offsets, jnp.int32),
            widths=jnp.asarray([w for (_, w) in shapes], jnp.int32),
            n_levels=len(shapes),
            global_min=mins[-1].reshape(())[()],
            global_max=maxs[-1].reshape(())[()],
        )

    def halve(a, h, w, red):
        ph, pw = a.shape
        if ph != h:
            a = red(a.reshape(h, ph // h, w * 0 + pw), axis=1)
        if pw != w:
            a = red(jnp.stack([a[:, 0::2], a[:, 1::2]], 0), axis=0)
        return a

    @jax.jit
    def v1(depth):
        dmin = jnp.full((Hp, Wp), inf)
        dmin = dmin.at[:H, :W].set(jnp.where(jnp.isnan(depth), inf, depth))
        dmax = jnp.full((Hp, Wp), -inf)
        dmax = dmax.at[:H, :W].set(jnp.where(jnp.isnan(depth), -inf, depth))
        mins, maxs = [dmin], [dmax]
        for (h, w) in shapes[1:]:
            mins.append(halve(mins[-1], h, w, jnp.min))
            maxs.append(halve(maxs[-1], h, w, jnp.max))
        return pack(mins, maxs)

    @jax.jit
    def v2(depth):
        nan = jnp.float32(jnp.nan)
        dp = jnp.full((Hp, Wp), nan).at[:H, :W].set(depth)
        m1 = jnp.where(jnp.isnan(dp), inf, dp)
        x1 = jnp.where(jnp.isnan(dp), -inf, dp)
        mins, maxs = [m1], [x1]
        for (h, w) in shapes[1:]:
            mins.append(halve(mins[-1], h, w, jnp.min))
            maxs.append(halve(maxs[-1], h, w, jnp.max))
        return pack(mins, maxs)

    ref = depth_mips(depth)
    for name, fn in [("v0 current", depth_mips), ("v1 split", v1),
                     ("v2 nanpad", v2)]:
        out = fn(depth)
        ok = (np.array_equal(np.asarray(out.flat_min), np.asarray(ref.flat_min))
              and np.array_equal(np.asarray(out.flat_max),
                                 np.asarray(ref.flat_max)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(50):
                out = fn(depth)
            float(fence(out.flat_min))
            ts.append((time.time() - t0) / 50 * 1e3)
        print(f"{name}: min {min(ts):.3f} ms/build exact={ok}", flush=True)


if __name__ == "__main__":
    main()
