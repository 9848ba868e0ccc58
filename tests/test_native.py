"""Native C++ WAV decoder vs the scipy path, and the small extra lobes."""
import os

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    from svt_speechbrain_tpu.dataio.dataio import write_audio

    path = tmp_path_factory.mktemp("native") / "test.wav"
    rng = np.random.default_rng(0)
    sig = (rng.normal(size=20000) * 0.2).astype(np.float32)
    write_audio(str(path), sig, 16000)
    return str(path), sig


def test_native_builds_and_matches_scipy(wav_file):
    from svt_speechbrain_tpu import native

    path, sig = wav_file
    lib = native.get_lib()
    assert lib is not None, "g++ is in the image; native build must succeed"

    info = native.wav_info(path)
    assert info is not None
    frames, sr, ch, bits, isf = info
    assert (frames, sr, ch, bits, isf) == (20000, 16000, 1, 16, False)

    got, sr = native.wav_read(path)
    from scipy.io import wavfile

    _, ref = wavfile.read(path)
    np.testing.assert_allclose(got[:, 0], ref.astype(np.float32) / 32768.0,
                               atol=1e-6)
    # sliced read
    got_slice, _ = native.wav_read(path, start=100, stop=300)
    np.testing.assert_allclose(got_slice[:, 0],
                               ref[100:300].astype(np.float32) / 32768.0,
                               atol=1e-6)
    # int16 mono read bit-exact
    pcm, _ = native.wav_read_int16(path, start=100, stop=300)
    np.testing.assert_array_equal(pcm, ref[100:300])


def test_read_audio_uses_native(wav_file):
    from svt_speechbrain_tpu.dataio.dataio import read_audio

    path, sig = wav_file
    a = read_audio(path)
    os.environ["SVT_NATIVE"] = "0"
    try:
        b = read_audio(path)
    finally:
        os.environ.pop("SVT_NATIVE")
    np.testing.assert_allclose(a, b, atol=1e-6)
    c = read_audio({"file": path, "start": 1000, "stop": 2000})
    np.testing.assert_allclose(c, a[1000:2000], atol=1e-6)


def test_transformer_se_st_imu():
    import jax.numpy as jnp

    from svt_speechbrain_tpu.models.transformer_se_st import (
        CNNTransformerSE, TransformerST, IMU_CRNN,
    )

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 20, 40)), jnp.float32)
    se = CNNTransformerSE(d_model=32, output_size=40, nhead=4, num_layers=2,
                          d_ffn=64, input_size=40)
    params = se.init(jax.random.PRNGKey(0))
    mask = se(params, x)
    assert mask.shape == (2, 20, 40)
    assert float(mask.min()) >= 0  # relu mask

    st = TransformerST(tgt_vocab=30, input_size=40, d_model=32, nhead=4,
                       num_encoder_layers=1, num_decoder_layers=1, d_ffn=64,
                       ctc_vocab=25)
    sp = st.init(jax.random.PRNGKey(1))
    tgt = jnp.asarray(np.random.default_rng(1).integers(1, 30, (2, 5)))
    enc, dec = st(sp, x, tgt)
    ctc = st.forward_asr_ctc(sp, enc)
    assert ctc.shape == (2, 20, 25)

    imu = IMU_CRNN(input_size=6, channels=(8, 16), rnn_neurons=16, outputs=4)
    ip = imu.init(jax.random.PRNGKey(2))
    y = imu(ip, jnp.asarray(np.random.default_rng(2).normal(size=(3, 40, 6)),
                            jnp.float32))
    assert y.shape == (3, 4)
