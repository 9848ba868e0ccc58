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


def import_reference_speechbrain():
    """Import the reference speechbrain package for golden-parity tests.

    Its deps missing from this image (hyperpyyaml, torchaudio, ruamel) are
    stubbed — none of their functionality is exercised by the numeric
    modules the tests touch. Returns the imported package."""
    import importlib.machinery
    import types

    def stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    stub("hyperpyyaml", load_hyperpyyaml=lambda *a, **k: {},
         resolve_references=lambda *a, **k: None)
    stub("torchaudio", load=None, info=None,
         set_audio_backend=lambda *a, **k: None,
         get_audio_backend=lambda: "soundfile")
    ry = stub("ruamel")
    ry.yaml = stub("ruamel.yaml", YAML=object)
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import speechbrain

    return speechbrain
