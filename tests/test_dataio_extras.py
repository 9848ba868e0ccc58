"""Transducer joint, conv frontend, preprocess/wer/legacy dataio extras."""
import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_transducer_joint_sum_and_concat():
    from svt_speechbrain_tpu.nnet.transducer_joint import Transducer_joint
    from svt_speechbrain_tpu.nnet.linear import Linear

    b, t, u, h = 2, 5, 3, 8
    tn = jnp.asarray(np.random.default_rng(0).normal(size=(b, t, 1, h)), jnp.float32)
    pn = jnp.asarray(np.random.default_rng(1).normal(size=(b, 1, u, h)), jnp.float32)

    joint_sum = Transducer_joint(joint="sum")
    out = joint_sum({}, tn, pn)
    assert out.shape == (b, t, u, h)

    joint_cat = Transducer_joint(Linear(16, 2 * h), joint="concat")
    params = joint_cat.init(jax.random.PRNGKey(0))
    out = joint_cat(params, tn, pn)
    assert out.shape == (b, t, u, 16)


def test_transducer_joint_feeds_loss():
    """Joint network lattice → transducer loss end to end."""
    from svt_speechbrain_tpu.nnet.transducer_joint import Transducer_joint
    from svt_speechbrain_tpu.nnet.linear import Linear
    from svt_speechbrain_tpu.nnet.loss.transducer_loss import transducer_loss

    b, t, u, h, v = 2, 6, 4, 8, 5
    rng = np.random.default_rng(2)
    tn = jnp.asarray(rng.normal(size=(b, t, 1, h)), jnp.float32)
    pn = jnp.asarray(rng.normal(size=(b, 1, u + 1, h)), jnp.float32)
    joint = Transducer_joint(Linear(v, h), joint="sum")
    params = joint.init(jax.random.PRNGKey(0))
    logits = joint(params, tn, pn)  # (B, T, U+1, V)
    labels = jnp.asarray(rng.integers(1, v, size=(b, u)))
    loss = transducer_loss(logits, labels, jnp.ones(b), jnp.ones(b), blank_index=0)
    assert np.isfinite(float(loss))


def test_convolution_frontend():
    from svt_speechbrain_tpu.models.convolution import ConvolutionFrontEnd

    fe = ConvolutionFrontEnd(input_size=40, out_channels=(8, 16, 16),
                             strides=(2, 2, 1))
    params = fe.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 40)), jnp.float32)
    out = fe(params, x)
    assert out.shape == (2, 5, fe.output_dim())


def test_audio_normalizer():
    from svt_speechbrain_tpu.dataio.preprocess import AudioNormalizer

    norm = AudioNormalizer(sample_rate=16000)
    stereo = np.random.default_rng(0).normal(size=(32000, 2)).astype(np.float32)
    out = norm(stereo, 32000)
    assert out.ndim == 1
    assert abs(len(out) - 16000) <= 2


def test_wer_printing():
    from svt_speechbrain_tpu.utils import edit_distance
    from svt_speechbrain_tpu.dataio.wer import print_wer_summary, print_alignments

    details = edit_distance.wer_details_for_batch(
        ["u1"], [["a", "b", "c"]], [["a", "x", "c"]], compute_alignments=True)
    summary = edit_distance.wer_summary(details)
    buf = io.StringIO()
    print_wer_summary(summary, file=buf)
    print_alignments(details, file=buf)
    text = buf.getvalue()
    assert "%WER" in text and "u1" in text and "<eps>" not in text.split("\n")[0]


def test_extended_csv_sorting_matches_reference(tmp_path):
    """The reference's ``if sorting == "ascending" or "descending":``
    (legacy.py:97) is always truthy, so even sorting='original'
    duration-sorts — and AddNoise/AddReverb corpus order inherits this."""
    from tests.conftest import import_reference_speechbrain, \
        reference_available
    from svt_speechbrain_tpu.dataio.legacy import ExtendedCSVDataset

    if not reference_available():
        pytest.skip("reference checkout not present")
    import_reference_speechbrain()
    from speechbrain.dataio.legacy import ExtendedCSVDataset as RefDS

    csv_path = tmp_path / "d.csv"
    csv_path.write_text(
        "ID, duration, text, text_format, text_opts\n"
        "u1, 2.0, bb, string, \n"
        "u2, 1.0, aa, string, \n"
        "u3, 3.0, cc, string, \n")
    for sorting in ("original", "ascending", "descending"):
        ref = RefDS(str(csv_path), sorting=sorting)
        ours = ExtendedCSVDataset(str(csv_path), sorting=sorting)
        assert list(ours.data_ids) == list(ref.data_ids), sorting


def test_extended_csv_dataset(tmp_path):
    from svt_speechbrain_tpu.dataio.dataio import write_audio
    from svt_speechbrain_tpu.dataio.legacy import ExtendedCSVDataset

    wav_path = tmp_path / "a.wav"
    sig = np.random.default_rng(0).normal(size=1600).astype(np.float32) * 0.1
    write_audio(str(wav_path), sig, 16000)
    csv_path = tmp_path / "data.csv"
    csv_path.write_text(
        "ID,duration,wav,wav_format,wav_opts,txt,txt_format,txt_opts\n"
        f"utt1,0.1,{wav_path},wav,,hello,string,\n")
    ds = ExtendedCSVDataset(str(csv_path))
    item = ds[0]
    assert item["txt_data"] == "hello"
    assert item["wav_data"].shape[0] == 1600


def test_metricgan_u():
    from svt_speechbrain_tpu.models.enhancement import MetricGAN_U_Discriminator

    disc = MetricGAN_U_Discriminator(channels=8)
    params = disc.init(jax.random.PRNGKey(0))
    spec = jnp.asarray(np.random.default_rng(0).random((2, 30, 40)), jnp.float32)
    out = disc(params, spec)
    assert out.shape == (2, 1)
