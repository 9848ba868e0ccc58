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

# ---------------------------------------------------------------------------
# Test tiers (the full suite is ~40 min; tiers keep a usable fail-fast gate):
#   pytest -m core          — engine/recipe-smoke/parallel-equality (<~5 min)
#   pytest -m golden        — reference-exact / torch-parity tests
#   pytest -m doctest_tier  — runnable docstring examples of all modules
#   pytest -m "not golden and not doctest_tier"  — everything framework-own
# Markers are assigned from file names + the explicit lists below, so new
# golden files (named *_golden/*_parity) tier themselves automatically.

_CORE_FILES = {
    "test_parallel.py", "test_multiprocess.py", "test_inference.py",
    "test_losses.py", "test_dataloader_resume.py",
    "test_checkpoint_backends.py", "test_checkpoint_reshard.py",
    "test_amt_utils.py", "test_quant.py", "test_streaming_server.py",
    "test_linkprobe.py",
}
_CORE_TESTS = {  # recipe smoke: one end-to-end per family
    "test_recipe_end_to_end",
    "test_n20emv2_audio_recipe_end_to_end",
}
_GOLDEN_EXTRA_FILES = {  # parity tests whose names don't say so
    "test_wav2vec2.py", "test_convert_sb.py", "test_ckpt_manifests.py",
    "test_video_models.py", "test_rnn_decoders.py",
}
_CORE_EXCLUDE = {  # slow members of core files that other gates cover
    "test_avhubert_converter_name_coverage",   # manifest tier
    "test_driver_dryrun_entry_in_process",     # driver MULTICHIP artifact
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "core: fast engine/recipe-smoke/parallel gate")
    config.addinivalue_line(
        "markers", "golden: reference-exact / torch-parity tests")
    config.addinivalue_line(
        "markers", "doctest_tier: runnable docstring examples")
    config.addinivalue_line(
        "markers", "slow: multi-minute end-to-end tests (crash recovery)")


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        fname = os.path.basename(str(item.fspath))
        if fname == "test_doctests.py":
            item.add_marker(pytest.mark.doctest_tier)
        elif ("golden" in fname or "parity" in fname
              or fname in _GOLDEN_EXTRA_FILES):
            item.add_marker(pytest.mark.golden)
        base = item.name.split("[")[0]
        if ((fname in _CORE_FILES or base in _CORE_TESTS)
                and base not in _CORE_EXCLUDE):
            item.add_marker(pytest.mark.core)


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
