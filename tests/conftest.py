"""Test configuration: force CPU with a simulated 8-device mesh.

Multi-chip sharding is validated on a virtual CPU mesh
(``xla_force_host_platform_device_count``) — the reference never had
device-count-independent distributed tests; we get them for free from XLA.

Note: the TPU image's sitecustomize imports jax at interpreter start with
``JAX_PLATFORMS=axon``, so the env-var route is too late — we override via
``jax.config`` before any backend is initialized.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# parity tests compare against torch fp32; disable bf16 matmul shortcuts
jax.config.update("jax_default_matmul_precision", "highest")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = "/root/reference"


def reference_available():
    return os.path.isdir(REFERENCE_ROOT)
