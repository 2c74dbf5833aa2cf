"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path).  These env vars must be set before jax is imported.
"""
import os

# Force CPU: the session env may pin JAX_PLATFORMS to a TPU platform (e.g.
# "axon"), which would defeat the virtual 8-device mesh below.  A
# sitecustomize may have imported jax already (capturing the env at import
# time), so update the live jax config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

_BUNDLED = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "dataset", "brain", "64x64x64",
                        "brain-64_128-64_128-192_256.tif")
REFERENCE_FIXTURE = _BUNDLED if os.path.exists(_BUNDLED) else \
    "/root/reference/dataset/brain/64x64x64/brain-64_128-64_128-192_256.tif"


@pytest.fixture(scope="session")
def brain64():
    """The bundled 64^3 uint16 brain volume, (64,64,64,1)."""
    from brief_pytorch_tpu.io.image import read_img
    if not os.path.exists(REFERENCE_FIXTURE):
        pytest.skip("reference fixture not available")
    vol = read_img(REFERENCE_FIXTURE)
    assert vol.shape == (64, 64, 64, 1) and vol.dtype == np.uint16
    return vol


@pytest.fixture(scope="session")
def brain64_path():
    if not os.path.exists(REFERENCE_FIXTURE):
        pytest.skip("reference fixture not available")
    return REFERENCE_FIXTURE
