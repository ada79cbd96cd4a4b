"""Multi-process sharded integrate demo: real jax.distributed, CPU backend.

Coordinator mode (no args): spawns N worker copies of itself, waits, checks
that every process computed the identical global checksum.
Worker mode:  multiprocess_demo.py <proc_id> <nproc> <port>

Each worker initializes jax.distributed, builds a GLOBAL 1D mesh over every
process's CPU devices, integrates one synthetic frame into a slab-sharded
brick volume (zero collectives), and prints the replicated global checksum.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(proc_id: int, nproc: int, port: str) -> int:
    devs_per_proc = int(os.environ.get("DEVS", "2"))
    os.environ["XLA_FLAGS"] = \
        f"--xla_force_host_platform_device_count={devs_per_proc}"
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    # multi-process CPU needs the gloo collectives client; the axon TPU
    # plugin ignores JAX_PLATFORMS, so pin the default backend to cpu too
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from cpu_tsdf_tpu.parallel import distributed as dist

    assert dist.initialize(f"localhost:{port}", nproc, proc_id)
    assert jax.process_count(backend="cpu") == nproc, \
        jax.process_count(backend="cpu")
    cpus = jax.devices("cpu")
    assert len(cpus) == devs_per_proc * nproc, cpus
    jax.config.update("jax_default_device", [d for d in cpus
                                             if d.process_index == proc_id][0])
    mesh = dist.make_mesh(cpus)

    import jax.numpy as jnp
    import numpy as np

    from cpu_tsdf_tpu import TSDFConfig
    from cpu_tsdf_tpu.parallel.bricks import (integrate_bricks_sharded,
                                              make_sharded_brick_volume)
    from cpu_tsdf_tpu.synthetic import sphere_depth

    cfg = TSDFConfig(
        xres=64, yres=64, zres=64, xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.06, max_dist_neg=0.06, min_sensor_dist=0.1,
        image_width=40, image_height=30, focal_length_x=35.0,
        focal_length_y=35.0, principal_point_x=20.0, principal_point_y=15.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4)
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -1.0
    depth = np.asarray(sphere_depth(cfg, center=(0.0, 0.0, 1.0), radius=0.3))

    bv = make_sharded_brick_volume(cfg, mesh, 8, capacity_per_device=256)
    depth_g = dist.replicate_to_mesh(depth, mesh)
    pose_g = dist.replicate_to_mesh(pose, mesh)
    bv = integrate_bricks_sharded(bv, depth_g, pose_g, mesh, update_budget=1024)

    wsum = float(jnp.sum(bv.weight))
    dsum = float(jnp.sum(bv.sdf * bv.weight))
    n_act = int(jnp.sum(bv.n_active))
    ovf = bool(bv.overflowed.addressable_data(0)) if hasattr(
        bv.overflowed, "addressable_data") else bool(bv.overflowed)

    # hybrid [dcn, shard] mesh: the slab axis stays INSIDE each process
    # (stand-in for ICI), dcn crosses processes; the volume replicates over
    # dcn and slab-shards over the inner axis — integrate must produce the
    # same field as the 1D global mesh
    # the axon plugin ignores JAX_PLATFORMS, so the default backend may be a
    # single-process TPU — build the hybrid mesh from the gloo CPU devices
    hmesh = dist.make_hybrid_mesh(devices=cpus)
    assert hmesh.shape[dist.DCN_AXIS] == nproc, hmesh.shape
    bh = make_sharded_brick_volume(cfg, hmesh, 8, capacity_per_device=256)
    depth_h = dist.replicate_to_mesh(depth, hmesh)
    pose_h = dist.replicate_to_mesh(pose, hmesh)
    bh = integrate_bricks_sharded(bh, depth_h, pose_h, hmesh,
                                  update_budget=1024)
    # dcn replication is a sharding property: the GLOBAL array is the same
    # logical volume, so its sums must equal the 1D-mesh result exactly
    hsum = float(jnp.sum(bh.weight))
    hd = float(jnp.sum(bh.sdf * bh.weight))
    assert abs(hsum - wsum) < 1e-3 * max(1.0, abs(wsum)), (hsum, wsum)

    # ---- merge across the pod (VERDICT r4 item 6): reshard the hybrid
    # volume fully-replicated (ICI gather within a slice, DCN broadcast),
    # read the local replica as a plain single-device BrickVolume, and run a
    # single-device op (the XLA renderView) on it — every process must see
    # the identical merged render.
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from cpu_tsdf_tpu import render_view
    from cpu_tsdf_tpu.bricks import BrickVolume

    rep = NamedSharding(hmesh, P())
    rep_f = jax.jit(lambda t: t, out_shardings=rep)
    tree = rep_f((bh.brick_map, bh.coords, bh.sdf, bh.weight, bh.M,
                  bh.nsample))
    bm_h, co_h, sdf_h, w_h, M_h, ns_h = (
        np.asarray(t.addressable_data(0)) for t in tree)
    merged = BrickVolume(
        brick_map=jnp.asarray(bm_h), n_active=jnp.int32(n_act),
        coords=jnp.asarray(co_h), sdf=jnp.asarray(sdf_h),
        weight=jnp.asarray(w_h), M=jnp.asarray(M_h),
        nsample=jnp.asarray(ns_h), color=None,
        global_transform=jnp.eye(4, dtype=jnp.float32),
        overflowed=jnp.asarray(False), config=cfg, brick_size=8,
        capacity=bh.capacity)
    r = render_view(merged, pose)
    dep = np.asarray(r.depth)
    n_valid = int(np.isfinite(dep).sum())
    dsum_r = float(np.nansum(dep))

    print(f"CHECK proc={proc_id} wsum={wsum:.6f} dsum={dsum:.6f} "
          f"n_active={n_act} overflow={ovf} "
          f"hybrid_wsum={hsum:.6f} hybrid_dsum={hd:.6f} "
          f"merged_render_valid={n_valid} merged_render_sum={dsum_r:.4f}",
          flush=True)
    return 0


def _free_port() -> str:
    """OS-assigned free port: a FIXED port flaked when a prior run's
    coordinator socket lingered (coordination service 'has likely
    restarted' rendezvous failures, round 5)."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return str(p)


def coordinator(nproc: int = 2, port: str = None) -> int:
    if port is None:
        port = _free_port()
    procs = []
    for i in range(nproc):
        env = dict(os.environ)
        procs.append(subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i), str(nproc), port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    ok = True
    for i, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            ok = False
        outs.append((p.returncode, out, err))
        if p.returncode != 0:
            ok = False
    checks = []
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith("CHECK"):
                checks.append(line.split(" ", 2)[2])
        if rc != 0:
            sys.stderr.write(err[-2000:] + "\n")
    if not ok or len(checks) != nproc or len(set(checks)) != 1 \
            or "n_active=0" in checks[0] or "overflow=True" in checks[0] \
            or "merged_render_valid=0 " in checks[0]:
        print(f"MULTIPROCESS FAIL: {checks}", flush=True)
        return 1
    print(f"MULTIPROCESS OK: {nproc} processes agree: {checks[0]}", flush=True)
    return 0


if __name__ == "__main__":
    if len(sys.argv) >= 4:
        sys.exit(worker(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]))
    sys.exit(coordinator(int(os.environ.get("NPROC", "2")),
                         os.environ.get("PORT")))
