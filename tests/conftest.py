"""Test harness: force CPU with 8 virtual devices so multi-chip sharding paths
are exercised without TPU hardware. Must run before the first jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def synthetic_camera():
    from azurekinect3dreconstruction_tpu.core.camera import Intrinsics
    from azurekinect3dreconstruction_tpu.io.synthetic import SyntheticCamera

    # Small image keeps CPU tests fast; geometry is resolution-independent.
    intr = Intrinsics.azure_kinect_depth_nfov().scaled(0.25)
    return SyntheticCamera(intrinsics=intr)
