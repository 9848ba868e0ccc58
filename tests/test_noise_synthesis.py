"""Noise-synthesis recipe script: the SNR sweeps it writes must actually
measure the requested SNR (the reference's amplitude-factor formula,
``N20EMv2/audio_visual/synthesis_noise.py:126-137``)."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

from tests.conftest import REPO_ROOT

SCRIPT = os.path.join(REPO_ROOT, "recipes", "N20EMv2", "audio_visual",
                      "synthesis_noise.py")


def _load():
    spec = importlib.util.spec_from_file_location("synth_noise", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["synth_noise"] = mod
    spec.loader.exec_module(mod)
    return mod


def _measure_snr(clean, noisy, snr_db):
    """Amplitude SNR per the reference formula: the clean component in the
    mixture is scaled by (1 - factor)."""
    factor = 1.0 / (10 ** (snr_db / 20) + 1.0)
    scaled = clean * (1.0 - factor)
    noise = noisy - scaled
    return 20 * np.log10(np.mean(np.abs(scaled))
                         / max(np.mean(np.abs(noise)), 1e-12))


@pytest.mark.parametrize("kind", ["white", "accomp"])
def test_snr_sweep_levels(tmp_path, kind):
    from svt_speechbrain_tpu.dataio.dataio import write_audio

    synth = _load()
    # NOT seed 0: synthesis_white draws its noise from seed 0, and
    # signal-correlated "noise" would degenerate the mixture
    rng = np.random.default_rng(42)
    folder = tmp_path / "n20em"
    d = folder / "data" / "song0"
    os.makedirs(d, exist_ok=True)
    vocals = (rng.normal(size=4 * 16000) * 0.1).astype(np.float32)
    write_audio(str(d / "vocals.wav"), vocals, 16000)
    with open(folder / "annotations.json", "w") as f:
        json.dump({"song0": {"midi": [], "split": "test"}}, f)
    if kind == "accomp":
        accomp = (rng.normal(size=4 * 16000) * 0.2).astype(np.float32)
        write_audio(str(d / "accomp.wav"), accomp, 16000)
        synth.synthesis_accomp(str(folder))
    else:
        synth.synthesis_white(str(folder))

    out = d / "noise_data" / kind
    for snr in (-10, -5, 0, 5, 10):
        path = out / f"SNR_{snr}dB.wav"
        assert path.exists(), sorted(os.listdir(out))
        from svt_speechbrain_tpu.dataio.dataio import read_audio

        noisy = np.asarray(read_audio(str(path)), np.float64)
        measured = _measure_snr(vocals.astype(np.float64), noisy, snr)
        assert abs(measured - snr) < 0.6, (snr, measured)
