"""Shared harness for stub-importing the reference speechbrain + recipes.

Used by the golden-parity tests (``test_golden_recipe_parity*.py``,
``test_training_trajectory_parity.py``) AND by ``quality_bench.py`` — one
copy, so a dependency newly stubbed for the tests can't silently go
missing from the standing QUALITY artifact (or vice versa).

The reference package needs hyperpyyaml/torchaudio/ruamel/mir_eval, none
of which ship in this image; ``stub_reference_deps`` installs module stubs
(mir_eval's ``evaluate`` routes to our ``utils.transcription_eval``, itself
golden-tested against mir_eval semantics).
"""
import importlib.machinery
import importlib.util
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

# module names stub_reference_deps may install — callers that restore
# sys.modules afterwards snapshot exactly these (plus the reference's
# top-level "utils" package, which its recipes shadow)
STUBBED_MODULES = ("hyperpyyaml", "torchaudio", "ruamel", "ruamel.yaml",
                   "mir_eval", "mir_eval.transcription", "mir_eval.util")


def stub_module(name, **attrs):
    """Install a module stub with the given attributes."""
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def stub_reference_deps(evaluate_fn=None, stub=stub_module):
    """Stub every dependency of the reference that this image lacks.

    ``evaluate_fn`` overrides ``mir_eval.transcription.evaluate`` (tests
    pass a recording wrapper); default is our transcription_eval.evaluate.
    ``stub`` lets callers wrap stub_module (e.g. to track installs).
    """
    from svt_speechbrain_tpu.utils import transcription_eval

    if evaluate_fn is None:
        evaluate_fn = transcription_eval.evaluate
    stub("hyperpyyaml", load_hyperpyyaml=lambda *a, **k: {},
         resolve_references=lambda *a, **k: None)
    stub("torchaudio", load=None, info=None,
         set_audio_backend=lambda *a, **k: None,
         get_audio_backend=lambda: "soundfile")
    ry = stub("ruamel")
    ry.yaml = stub("ruamel.yaml", YAML=object)
    me = stub("mir_eval")
    me.transcription = stub("mir_eval.transcription", evaluate=evaluate_fn)
    me.util = stub("mir_eval.util",
                   midi_to_hz=transcription_eval.midi_to_hz)


def load_reference_module(path, name):
    """Exec a reference recipe file under ``name`` and return the module."""
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def import_reference_mir_recipe(evaluate_fn=None, stub=stub_module):
    """Stubs + sys.path + import: returns ``(sb, ref_recipe, ref_hi)`` for
    the MIR_ST500 recipe (``train_audio_ssl.py`` + its HF interface).
    Leaves the reference paths on sys.path — callers that need isolation
    remove them afterwards."""
    stub_reference_deps(evaluate_fn, stub)
    for p in (REFERENCE_ROOT, os.path.join(REFERENCE_ROOT, "MIR_ST500")):
        if p not in sys.path:
            sys.path.insert(0, p)
    import speechbrain as sb

    ref_recipe = load_reference_module(
        os.path.join(REFERENCE_ROOT, "MIR_ST500", "train_audio_ssl.py"),
        "_ref_amt_recipe")
    ref_hi = load_reference_module(
        os.path.join(REFERENCE_ROOT, "MIR_ST500",
                     "huggingface_interface.py"),
        "_ref_hf_iface")
    return sb, ref_recipe, ref_hi


def ref_amt_hparams(sb):
    """The hparams dict the reference AMT Brain reads (mirrors
    ``MIR_ST500/hparams/train_audio_ssl.yaml`` loss/metric wiring)."""
    import functools

    def masked(fn, **kw):
        return functools.partial(fn, reduction="mean", allowed_len_diff=3,
                                 label_smoothing=0.0, **kw)

    def stats(fn):
        return functools.partial(
            sb.utils.metric_stats.MetricStats,
            metric=functools.partial(fn, reduction="batch",
                                     allowed_len_diff=3,
                                     label_smoothing=0.0))

    L = sb.nnet.losses
    return dict(
        pitch_octave_num=4, pitch_class_num=12,
        onset_positive_weight=15.0, offset_positive_weight=1.0,
        onset_criterion=masked(L.bce_loss), offset_criterion=masked(L.bce_loss),
        octave_criterion=masked(L.nll_loss), pitch_criterion=masked(L.nll_loss),
        log_softmax=sb.nnet.activations.Softmax(apply_log=True),
        onset_threshold=0.4, offset_threshold=0.5, frame_rate=49.8,
        onset_tolerance=0.05, pitch_tolerance=50,
        onset_stats=stats(L.bce_loss), offset_stats=stats(L.bce_loss),
        octave_stats=stats(L.nll_loss), pitch_stats=stats(L.nll_loss),
    )


class RefBatch:
    """Duck-typed PaddedBatch for driving the reference Brain directly."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def to(self, device):
        return self
