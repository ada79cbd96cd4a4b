"""Test harness configuration.

All tests run on the CPU backend with 8 virtual devices so that pjit/shard_map
multi-chip paths are exercised without TPU hardware (SURVEY.md §4 item 4).
NOTE: in this environment JAX_PLATFORMS=cpu is overridden by the axon TPU
plugin, so we pin placement via jax_default_device instead.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402

from cpu_tsdf_tpu.config import TSDFConfig  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches():
    """Reset jax's executable/trace caches between modules.

    After ~170 tests of accumulated compiles in one process, the NEXT large
    XLA:CPU compile deterministically segfaults/aborts inside LLVM (round 5;
    the identical test sequence passes in a fresh process — an upstream
    compiler-state bug, not a framework one). Clearing caches per module
    keeps the compiler state small; cross-module executable reuse is rare,
    so the runtime cost is minor."""
    yield
    jax.clear_caches()


@pytest.fixture
def small_cfg() -> TSDFConfig:
    """64^3 grid over 1.6m with a 40x30 image; cell (2.5cm) < trunc band (6cm)."""
    return TSDFConfig(
        xres=64, yres=64, zres=64,
        xsize=1.6, ysize=1.6, zsize=1.6,
        max_dist_pos=0.06, max_dist_neg=0.06,
        min_sensor_dist=0.1, max_sensor_dist=3.0,
        image_width=40, image_height=30,
        focal_length_x=35.0, focal_length_y=35.0,
        principal_point_x=20.0, principal_point_y=15.0,
        max_cell_size_x=0.4, max_cell_size_y=0.4, max_cell_size_z=0.4,
    )


@pytest.fixture
def cpu_devices():
    return jax.devices("cpu")
