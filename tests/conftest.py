"""Test configuration: force CPU with a virtual 8-device mesh.

Must run before jax is imported anywhere (SURVEY.md §4: multi-host tests via
`xla_force_host_platform_device_count` on CPU devices).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force-override (env ships JAX_PLATFORMS=axon)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def reference_path():
    if not has_reference():
        pytest.skip("reference repo not available")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from tests import _diffusers_shim
    _diffusers_shim.install()
    return REFERENCE
