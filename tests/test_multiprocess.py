"""Real jax.distributed multi-process test (SURVEY §5 distributed backend).

Spawns 2 coordinator+worker processes (bench/multiprocess_demo.py), each with
its own jax runtime on the CPU backend, rendezvousing through
jax.distributed.initialize on localhost. The sharded brick integrate runs as
ONE SPMD program over the 4-device global mesh (2 per process); every process
must report the identical replicated checksum.
"""

import os
import subprocess
import sys

import pytest

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "bench",
                      "multiprocess_demo.py")


@pytest.mark.slow
def test_multiprocess_sharded_integrate():
    env = dict(os.environ, NPROC="2", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    r = subprocess.run([sys.executable, SCRIPT], env=env, timeout=900,
                       capture_output=True, text=True)
    assert r.returncode == 0 and "MULTIPROCESS OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])


@pytest.mark.slow
def test_multiprocess_hybrid_2x4():
    """2 processes x 4 devices: the pod-shaped DCN x ICI hybrid mesh runs the
    sharded integrate, and the cross-DCN merge renders identically on every
    process (VERDICT r4 item 6)."""
    env = dict(os.environ, NPROC="2", DEVS="4", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable, SCRIPT], env=env, timeout=900,
                       capture_output=True, text=True)
    assert r.returncode == 0 and "MULTIPROCESS OK" in r.stdout, (
        r.stdout[-2000:], r.stderr[-2000:])
