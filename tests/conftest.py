"""Test configuration: force a virtual 8-device CPU platform.

Must run before the first `import jax` anywhere in the test session so that
multi-chip sharding paths can be exercised without TPU hardware.
"""

import os

# Force CPU even if the environment preselects a TPU platform (e.g.
# JAX_PLATFORMS=axon): unit tests must be deterministic and must not contend
# for the single tunneled TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
# Zero-egress environment: never let transformers/huggingface probe the network.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is NOT enough: the container's sitecustomize registers
# (and pre-selects) the tunneled TPU platform before conftest runs, so the
# platform must be forced through jax.config after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)
