"""Integrate frame-budget attribution on the real chip (VERDICT r4 item 2).

Decomposes the ~5.4 ms/frame of the 512^3 headline into measured stages:

  act     depth mips + band activation + carve candidates + compaction
  kernel  the Pallas fusion kernel batch (fuse_brick_batch) alone,
          at window widths 256 and full-image (640) to expose the one-hot
          dot's marginal cost (flops scale with the window width)
  book    residual: allocation scatter, batch assembly, dispatch glue

Prints one JSON line with the stage times and the derived dot slope.
"""

import json
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cpu_tsdf_tpu import TSDFConfig
from cpu_tsdf_tpu.activation import (_compact_chunked as _compact,
                                     band_candidate_bricks,
                                     carve_candidate_slots, depth_mips,
                                     mip_base_level)
from cpu_tsdf_tpu.bricks import (carve_budget_for, fuse_brick_batch,
                                 integrate_bricks, make_brick_volume)
from cpu_tsdf_tpu.geometry import rigid_inverse
from cpu_tsdf_tpu.synthetic import sphere_depth


def tilted_pose():
    ax, ay = 0.03, -0.02
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    m = np.eye(4)
    m[:3, :3] = Ry @ Rx
    m[:3, 3] = (0.013, 0.021, -1.0)
    return m.astype(np.float32)


def timed(step, state, reps=50):
    """Median of 5 batches of `reps` calls of state = step(state) (threading
    the state supports stages that DONATE their inputs)."""
    state = step(state)
    jax.block_until_ready(state)
    rates = []
    for _ in range(5):
        t0 = time.time()
        for _ in range(reps):
            state = step(state)
        jax.block_until_ready(state)
        rates.append((time.time() - t0) / reps)
    return statistics.median(rates), state


def main():
    out = {"device": str(jax.devices()[0])}
    cfg = TSDFConfig().with_updates(min_sensor_dist=0.3)
    pose = jnp.asarray(tilted_pose())
    depth = jnp.asarray(sphere_depth(cfg, center=(-0.013, -0.021, 1.0), radius=0.5))
    budget = 1 << 12
    use_pallas = jax.devices()[0].platform not in ("cpu",)
    nb = tuple(r // 8 for r in (cfg.xres, cfg.yres, cfg.zres))

    # steady-state volume
    bv = make_brick_volume(cfg, 8, 1 << 15)
    for _ in range(10):
        bv = integrate_bricks(bv, depth, pose, None, budget, use_pallas, False)
    jax.block_until_ready(bv.weight)
    out["n_active"] = int(bv.n_active)

    # ---- full frame -------------------------------------------------------
    t_full, bv = timed(
        lambda v: integrate_bricks(v, depth, pose, None, budget, use_pallas,
                                   False), bv)
    out["full_ms"] = round(t_full * 1000, 3)

    # ---- activation stage -------------------------------------------------
    coords_c = bv.coords
    live_c = coords_c[:, 0] >= 0
    carve_budget = carve_budget_for(budget)

    @jax.jit
    def act(depth_, pose_):
        pose_inv = rigid_inverse(pose_)
        mips = depth_mips(depth_, mip_base_level(cfg, 8))
        bids, n_band, ovf = band_candidate_bricks(cfg, 8, nb, mips, pose_inv,
                                                  budget)
        cm = carve_candidate_slots(cfg, 8, mips, pose_inv, coords_c, live_c)
        cs, n_carve = _compact(cm, jnp.arange(coords_c.shape[0],
                                              dtype=jnp.int32), carve_budget)
        return bids, cs

    t_act, (bids, carve_slots) = timed(lambda s: act(depth, pose),
                                       (None, None))
    out["act_ms"] = round(t_act * 1000, 3)

    # ---- mips alone -------------------------------------------------------
    mips_j = jax.jit(depth_mips)
    t_mips, _ = timed(lambda s: mips_j(depth), None)
    out["mips_ms"] = round(t_mips * 1000, 3)
    base = mip_base_level(cfg, 8)
    out["mip_base_level"] = base
    mips_b = jax.jit(lambda d: depth_mips(d, base))
    t_mb, _ = timed(lambda s: mips_b(depth), None)
    out["mips_base_ms"] = round(t_mb * 1000, 3)

    # ---- activation sub-stages (band vs carve, mips held fixed) -----------
    mips_c = jax.jit(lambda d: depth_mips(d, mip_base_level(cfg, 8)))(depth)
    pose_inv_c = rigid_inverse(pose)

    @jax.jit
    def band_only(depth_):
        m = depth_mips(depth_, mip_base_level(cfg, 8))
        return band_candidate_bricks(cfg, 8, nb, m, pose_inv_c, budget)[0]

    t_band, _ = timed(lambda s: band_only(depth), None)
    out["mips_band_ms"] = round(t_band * 1000, 3)

    @jax.jit
    def carve_only():
        cm = carve_candidate_slots(cfg, 8, mips_c, pose_inv_c, coords_c,
                                   live_c)
        return _compact(cm, jnp.arange(coords_c.shape[0], dtype=jnp.int32),
                        carve_budget)[0]

    t_carve, _ = timed(lambda s: carve_only(), None)
    out["carve_ms"] = round(t_carve * 1000, 3)

    # ---- kernel stage alone (fixed batch, donated state) ------------------
    nby, nbz = nb[1], nb[2]
    bsafe = jnp.maximum(bids, 0)
    slots = jnp.take(bv.brick_map.reshape(-1), bsafe, mode="clip")
    ok = (bids >= 0) & (slots >= 0)
    bx = bsafe // (nby * nbz)
    by = (bsafe // nbz) % nby
    bz = bsafe % nbz
    cs_safe = jnp.clip(carve_slots, 0, bv.capacity - 1)
    cc = jnp.take(bv.coords, cs_safe, axis=0)
    bx = jnp.concatenate([bx, jnp.maximum(cc[:, 0], 0)])
    by = jnp.concatenate([by, jnp.maximum(cc[:, 1], 0)])
    bz = jnp.concatenate([bz, jnp.maximum(cc[:, 2], 0)])
    ok = jnp.concatenate([ok, carve_slots >= 0])
    slots = jnp.concatenate([slots, cs_safe])
    pose_inv = rigid_inverse(pose)

    for window, name in ((True, "kernel256_ms"), (False, "kernel640_ms")):
        @partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                 static_argnames=("win",))
        def kern(sdf, w, M, n, win):
            return fuse_brick_batch(cfg, 8, bx, by, bz, ok, slots,
                                    sdf, w, M, n, None, depth, pose_inv,
                                    None, use_pallas, False, win, 128, 512)

        state = (bv.sdf + 0, bv.weight + 0, bv.M + 0, bv.nsample + 0)
        t_k, state = timed(lambda s, w_=window: kern(*s, win=w_)[:4], state)
        out[name] = round(t_k * 1000, 3)

    k256, k640 = out["kernel256_ms"], out["kernel640_ms"]
    slope = (k640 - k256) / (640 - 256)          # ms per window column
    out["dot_ms_at_256"] = round(slope * 256, 3)
    out["kernel_fixed_ms"] = round(k256 - slope * 256, 3)
    out["book_ms"] = round(out["full_ms"] - out["act_ms"] - k256, 3)

    # ---- scan-amortized DEVICE times (the per-call numbers above carry a
    # fixed host->tunnel dispatch overhead that overstates small stages;
    # 20 iterations inside one executable isolate true device time; a
    # varying epsilon defeats CSE of the identical iterations) ------------
    NIT = 20

    @jax.jit
    def act_scan(depth_, pose_):
        def body(c, i):
            d = depth_ + i * 1e-7
            pose_inv = rigid_inverse(pose_)
            mips = depth_mips(d, mip_base_level(cfg, 8))
            bids, _, _ = band_candidate_bricks(cfg, 8, nb, mips, pose_inv,
                                               budget)
            cm = carve_candidate_slots(cfg, 8, mips, pose_inv, coords_c,
                                       live_c)
            cs, _ = _compact(cm, jnp.arange(coords_c.shape[0],
                                            dtype=jnp.int32), carve_budget)
            return c + jnp.sum(bids) + jnp.sum(cs), None

        return jax.lax.scan(body, jnp.int32(0),
                            jnp.arange(NIT, dtype=jnp.float32))[0]

    t_as, _ = timed(lambda s: act_scan(depth, pose), None, reps=5)
    out["act_scan_ms"] = round(t_as * 1000 / NIT, 3)

    @jax.jit
    def mips_scan(depth_):
        def body(c, i):
            m = depth_mips(depth_ + i * 1e-7, mip_base_level(cfg, 8))
            return c + m.global_min + jnp.sum(m.flat_min[:8]), None

        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(NIT, dtype=jnp.float32))[0]

    t_ms, _ = timed(lambda s: mips_scan(depth), None, reps=5)
    out["mips_scan_ms"] = round(t_ms * 1000 / NIT, 3)

    @jax.jit
    def carve_scan(depth_, pose_):
        pose_inv = rigid_inverse(pose_)

        def body(c, i):
            m = depth_mips(depth_ + i * 1e-7, mip_base_level(cfg, 8))
            cm = carve_candidate_slots(cfg, 8, m, pose_inv, coords_c, live_c)
            cs, _ = _compact(cm, jnp.arange(coords_c.shape[0],
                                            dtype=jnp.int32), carve_budget)
            return c + jnp.sum(cs), None

        return jax.lax.scan(body, jnp.int32(0),
                            jnp.arange(NIT, dtype=jnp.float32))[0]

    t_cs, _ = timed(lambda s: carve_scan(depth, pose), None, reps=5)
    out["mips_carve_scan_ms"] = round(t_cs * 1000 / NIT, 3)

    @partial(jax.jit, donate_argnums=(0,))
    def kern_scan(state):
        def body(c, _):
            r = fuse_brick_batch(cfg, 8, bx, by, bz, ok, slots,
                                 *c, None, depth, pose_inv, None,
                                 use_pallas, False, True, 128, 512)
            return r[:4], None

        return jax.lax.scan(body, state, None, length=NIT)[0]

    st = (bv.sdf + 0, bv.weight + 0, bv.M + 0, bv.nsample + 0)
    t_ks, st = timed(kern_scan, st, reps=5)
    out["kernel256_scan_ms"] = round(t_ks * 1000 / NIT, 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
