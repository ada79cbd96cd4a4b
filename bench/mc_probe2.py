"""Stage-level ablation of the brick MC chunk to find the 70ms."""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.activation import _compact
    from cpu_tsdf_tpu.bricks import integrate_bricks, make_brick_volume
    from cpu_tsdf_tpu.ops.mc_tables import CORNER_OFFSETS
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

    use_pallas = jax.devices()[0].platform not in ("cpu",)
    bv = make_brick_volume(cfg, 8, 1 << 15)
    for _ in range(12):
        bv = integrate_bricks(bv, depth, pose, None, 1 << 12, use_pallas, False)
    _ = float(fence(bv.weight))
    print(f"active {int(bv.n_active)}", flush=True)

    B = 8
    V = 512
    K = 2048
    min_weight = 0.5

    def assembly(bv, slot0):
        nbx, nby, nbz = bv.bricks_per_axis
        C = bv.capacity
        coords = jax.lax.dynamic_slice(bv.coords, (slot0, 0), (K, 3))
        slot_live = coords[:, 0] >= 0
        d_pad = jnp.concatenate([bv.sdf, jnp.full((1, B, B, B), -1.0)], 0)
        w_pad = jnp.concatenate([bv.weight, jnp.zeros((1, B, B, B))], 0)
        bmap_flat = bv.brick_map.reshape(-1)
        blkd = jnp.full((K, B + 1, B + 1, B + 1), -1.0, jnp.float32)
        blkw = jnp.zeros((K, B + 1, B + 1, B + 1), jnp.float32)
        own_d = jax.lax.dynamic_slice(bv.sdf, (slot0, 0, 0, 0), (K, B, B, B))
        own_w = jax.lax.dynamic_slice(bv.weight, (slot0, 0, 0, 0), (K, B, B, B))
        blkd = blkd.at[:, :B, :B, :B].set(jnp.where(slot_live[:, None, None, None], own_d, -1.0))
        blkw = blkw.at[:, :B, :B, :B].set(jnp.where(slot_live[:, None, None, None], own_w, 0.0))
        for ox in (0, 1):
            sx = slice(0, B) if ox == 0 else slice(0, 1)
            dx = slice(0, B) if ox == 0 else slice(B, B + 1)
            for oy in (0, 1):
                sy = slice(0, B) if oy == 0 else slice(0, 1)
                dy = slice(0, B) if oy == 0 else slice(B, B + 1)
                for oz in (0, 1):
                    if ox == oy == oz == 0:
                        continue
                    sz = slice(0, B) if oz == 0 else slice(0, 1)
                    dz = slice(0, B) if oz == 0 else slice(B, B + 1)
                    nc = coords + jnp.asarray([ox, oy, oz])
                    ok = slot_live & (nc[:, 0] < nbx) & (nc[:, 1] < nby) & (nc[:, 2] < nbz)
                    blin = (nc[:, 0] * nby + nc[:, 1]) * nbz + nc[:, 2]
                    nslot = jnp.take(bmap_flat, jnp.clip(blin, 0, nbx * nby * nbz - 1), mode="clip")
                    nslot = jnp.where(ok & (nslot >= 0), nslot, C)
                    blkd = blkd.at[:, dx, dy, dz].set(d_pad[:, sx, sy, sz][nslot])
                    blkw = blkw.at[:, dx, dy, dz].set(w_pad[:, sx, sy, sz][nslot])
        return blkd, blkw, coords, slot_live

    def masks(blkd, blkw, coords, slot_live):
        offs = np.asarray(CORNER_OFFSETS)
        dcs = [blkd[:, ox:ox + B, oy:oy + B, oz:oz + B] for ox, oy, oz in offs]
        wcs = [blkw[:, ox:ox + B, oy:oy + B, oz:oz + B] for ox, oy, oz in offs]
        dcorn = jnp.stack(dcs, -1).reshape(K * V, 8)
        corner_ok = jnp.ones((K, B, B, B), bool)
        for dc, wc in zip(dcs, wcs):
            corner_ok &= (wc >= min_weight) & (jnp.abs(dc) < 1.0)
        neg = jnp.zeros((K, B, B, B), bool)
        pos = jnp.zeros((K, B, B, B), bool)
        for dc in dcs:
            neg |= dc < 0
            pos |= dc >= 0
        li = jnp.arange(B, dtype=jnp.int32)
        vx = coords[:, 0:1, None, None] * B + li[None, :, None, None]
        vy = coords[:, 1:2, None, None] * B + li[None, None, :, None]
        vz = coords[:, 2:3, None, None] * B + li[None, None, None, :]
        interior = ((vx >= 1) & (vx < cfg.xres - 2)
                    & (vy >= 1) & (vy < cfg.yres - 2)
                    & (vz >= 1) & (vz < cfg.zres - 2))
        cube_ok = corner_ok & neg & pos & interior & slot_live[:, None, None, None]
        return dcorn, cube_ok

    @partial(jax.jit, donate_argnums=())
    def stageA(bv, slot0):
        blkd, blkw, coords, slot_live = assembly(bv, slot0)
        return jnp.sum(blkd) + jnp.sum(blkw)

    @jax.jit
    def stageB(bv, slot0):
        blkd, blkw, coords, slot_live = assembly(bv, slot0)
        dcorn, cube_ok = masks(blkd, blkw, coords, slot_live)
        return jnp.sum(dcorn) + jnp.sum(cube_ok)

    @jax.jit
    def stageC(bv, slot0):
        blkd, blkw, coords, slot_live = assembly(bv, slot0)
        dcorn, cube_ok = masks(blkd, blkw, coords, slot_live)
        idx, n = _compact(cube_ok.reshape(-1), jnp.arange(K * V, dtype=jnp.int32), 1 << 15)
        return jnp.sum(idx) + n

    @jax.jit
    def stageD(bv, slot0):
        blkd, blkw, coords, slot_live = assembly(bv, slot0)
        dcorn, cube_ok = masks(blkd, blkw, coords, slot_live)
        idx, n = _compact(cube_ok.reshape(-1), jnp.arange(K * V, dtype=jnp.int32), 1 << 15)
        idxs = jnp.maximum(idx, 0)
        vals = jnp.take(dcorn, idxs, axis=0)
        s = idxs // V
        cs = jnp.take(coords, s, axis=0)
        return jnp.sum(vals) + jnp.sum(cs)

    for name, fn in (("A assembly", stageA), ("B +masks", stageB),
                     ("C +compact", stageC), ("D +gather", stageD)):
        r = fn(bv, jnp.int32(0)); _ = float(fence(r * 1.0))
        ts = []
        for _ in range(5):
            t0 = time.time()
            r = fn(bv, jnp.int32(0)); _ = float(fence(r * 1.0))
            ts.append((time.time() - t0) * 1000)
        print(f"{name}: {min(ts):.1f} ms (med {sorted(ts)[2]:.1f})", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
