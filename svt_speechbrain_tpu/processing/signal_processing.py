"""Low-level signal processing (analogue of reference
``speechbrain/processing/signal_processing.py``).

Pure jnp functions — usable on host (small offline prep) and inside jitted
augmentation graphs on TPU. The SNR mixing pair
``compute_amplitude``/``dB_to_amplitude`` drives the noise-synthesis bench
(``N20EMv2/audio_visual/synthesis_noise.py:126-137``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_amplitude(waveforms, lengths=None, amp_type="avg", scale="linear"):
    """Average or peak amplitude per waveform (reference ``:15-76``).

    waveforms: [time], [batch, time] or [batch, time, channels]; returns
    [batch, 1(, channels)].

    Example
    -------
    >>> import jax.numpy as jnp
    >>> wav = jnp.asarray([[0.5, -0.5, 0.5, -0.5]])
    >>> float(compute_amplitude(wav)[0, 0])
    0.5
    >>> float(compute_amplitude(wav, amp_type="peak")[0, 0])
    0.5
    >>> round(float(compute_amplitude(wav, scale="dB")[0, 0]), 2)
    -6.02
    """
    waveforms = jnp.asarray(waveforms)
    if waveforms.ndim == 1:
        waveforms = waveforms[None]
    assert amp_type in ("avg", "peak")
    assert scale in ("linear", "dB")
    if amp_type == "avg":
        if lengths is None:
            out = jnp.mean(jnp.abs(waveforms), axis=1, keepdims=True)
        else:
            wav_sum = jnp.sum(jnp.abs(waveforms), axis=1, keepdims=True)
            out = wav_sum / jnp.asarray(lengths)
    else:
        out = jnp.max(jnp.abs(waveforms), axis=1, keepdims=True)
    if scale == "dB":
        out = jnp.clip(20 * jnp.log10(jnp.maximum(out, 1e-14)), min=-80)
    return out


def dB_to_amplitude(SNR):
    """10^(SNR/20) (reference ``:354``)."""
    return 10 ** (SNR / 20)


def normalize(waveforms, lengths=None, amp_type="avg", eps=1e-14):
    """Divide by average/peak amplitude (reference ``:81-104``)."""
    assert amp_type in ("avg", "peak")
    den = compute_amplitude(waveforms, lengths, amp_type) + eps
    if jnp.asarray(waveforms).ndim == 1:
        return jnp.asarray(waveforms) / den[0]
    return jnp.asarray(waveforms) / den


def rescale(waveforms, lengths, target_lvl, amp_type="avg", scale="linear"):
    """Normalize then scale to a target level (reference ``:106-154``)."""
    assert amp_type in ("peak", "avg")
    assert scale in ("linear", "dB")
    batch_added = False
    waveforms = jnp.asarray(waveforms)
    if waveforms.ndim == 1:
        batch_added = True
        waveforms = waveforms[None]
    out = normalize(waveforms, lengths, amp_type)
    if scale == "linear":
        out = target_lvl * out
    else:
        out = dB_to_amplitude(target_lvl) * out
    if batch_added:
        out = out[0]
    return out


def convolve1d(waveform, kernel, padding=0, pad_type="constant", stride=1,
               groups=1, use_fft=False, rotation_index=0):
    """Batched 1-D convolution over (batch, time, channels)
    (reference ``:156-276``). ``use_fft`` performs circular convolution with
    a rotated kernel (the reverberation path)."""
    waveform = jnp.asarray(waveform)
    kernel = jnp.asarray(kernel)
    if isinstance(padding, (tuple, list)):
        waveform = jnp.pad(waveform, ((0, 0), tuple(padding), (0, 0)), mode=pad_type)
        padding = 0

    if use_fft:
        # pad to the same final length then multiply spectra
        zero_length = waveform.shape[1] - kernel.shape[1]
        if zero_length < 0:
            kernel = kernel[:, :waveform.shape[1]]
            zero_length = 0
        zeros = jnp.zeros((kernel.shape[0], zero_length, kernel.shape[2]), kernel.dtype)
        after_index = kernel[:, rotation_index:]
        before_index = kernel[:, :rotation_index]
        kernel = jnp.concatenate([after_index, zeros, before_index], axis=1)
        result = jnp.fft.irfft(
            jnp.fft.rfft(waveform, axis=1) * jnp.fft.rfft(kernel, axis=1), axis=1,
            n=waveform.shape[1])
        return result

    # time-domain conv: (B, T, C) with kernel (O, K, I)
    dn = jax.lax.conv_dimension_numbers(
        waveform.shape, (kernel.shape[1], kernel.shape[2], kernel.shape[0]),
        ("NWC", "WIO", "NWC"))
    w = jnp.transpose(kernel, (1, 2, 0))  # (K, I, O)
    return jax.lax.conv_general_dilated(
        waveform, w, window_strides=(stride,), padding=[(padding, padding)],
        dimension_numbers=dn, feature_group_count=groups)


def reverberate(waveforms, rir_waveform, rescale_amp="avg"):
    """Convolve speech with a room impulse response (reference ``:279-351``)."""
    waveforms = jnp.asarray(waveforms)
    rir_waveform = jnp.asarray(rir_waveform)
    orig_shape = waveforms.shape
    if waveforms.ndim == 1:
        waveforms = waveforms[None, :, None]
    elif waveforms.ndim == 2:
        waveforms = waveforms[..., None]
    if rir_waveform.ndim == 1:
        rir_waveform = rir_waveform[None, :, None]
    elif rir_waveform.ndim == 2:
        rir_waveform = rir_waveform[..., None]

    orig_amplitude = compute_amplitude(waveforms, waveforms.shape[1], rescale_amp)
    value_max = jnp.argmax(jnp.abs(rir_waveform), axis=1)[0, 0]
    waveforms = convolve1d(waveforms, rir_waveform, use_fft=True,
                           rotation_index=int(value_max))
    waveforms = rescale(waveforms, waveforms.shape[1], orig_amplitude, rescale_amp)
    return waveforms.reshape(orig_shape)


def notch_filter(notch_freq, filter_width=101, notch_width=0.05):
    """FIR band-rejection filter kernel (1, width, 1) — reference-exact
    (``:372-427``): raw ``sin(x)/x`` sinc at ``3·f·n``, the PERIODIC
    Blackman window (torch's default), low-pass + spectrally-inverted
    high-pass summed into the notch."""
    assert 0 < notch_freq <= 1
    assert filter_width % 2 != 0
    pad = filter_width // 2
    inputs = (np.arange(filter_width) - pad).astype(np.float64)
    notch_freq += notch_width

    def sinc(x):
        out = np.ones_like(x)
        nz = x != 0
        out[nz] = np.sin(x[nz]) / x[nz]
        return out

    # torch.blackman_window defaults to periodic: symmetric N+1, drop last
    blackman = np.blackman(filter_width + 1)[:-1]

    hlpf = sinc(3 * (notch_freq - notch_width) * inputs) * blackman
    hlpf /= hlpf.sum()
    hhpf = sinc(3 * (notch_freq + notch_width) * inputs) * blackman
    hhpf /= -hhpf.sum()
    hhpf[pad] += 1
    return jnp.asarray((hlpf + hhpf)[None, :, None], jnp.float32)


def overlap_and_add(signal, frame_step):
    """Reconstruct from framed representation (reference ``:430-480``).
    signal: (..., frames, frame_length) → (..., output_size)."""
    signal = jnp.asarray(signal)
    outer = signal.shape[:-2]
    frames, frame_length = signal.shape[-2:]
    subframe_length = int(np.gcd(frame_length, frame_step))
    subframe_step = frame_step // subframe_length
    subframes_per_frame = frame_length // subframe_length
    output_size = frame_step * (frames - 1) + frame_length
    output_subframes = output_size // subframe_length

    subframe_signal = signal.reshape(*outer, -1, subframe_length)
    # one index row per FRAME (the reference unfolds output_subframes into
    # `frames` windows) — arange over output_subframes over-counted by
    # (frame_length/step - 1) rows for overlapping frames
    frame_idx = np.arange(frames) * subframe_step
    idx = (frame_idx[:, None] + np.arange(subframes_per_frame)[None, :]).reshape(-1)
    result = jnp.zeros((*outer, output_subframes, subframe_length), signal.dtype)
    result = result.at[..., idx, :].add(subframe_signal)
    return result.reshape(*outer, -1)


def mix_at_snr(clean, noise, snr_db, eps=1e-14):
    """Mix noise into clean at a given SNR using the reference's
    amplitude-factor formula (``synthesis_noise.py:126-137``):

    ``factor = 1 / (dB_to_amplitude(snr) + 1)``;
    ``out = clean * (1 - factor) + noise * factor * amp(clean) / amp(noise)``.
    """
    clean = jnp.asarray(clean)
    noise = jnp.asarray(noise)
    clean_amplitude = compute_amplitude(clean)
    noise_amplitude_factor = 1 / (dB_to_amplitude(snr_db) + 1)
    new_noise_amplitude = noise_amplitude_factor * clean_amplitude
    sig = clean * (1 - noise_amplitude_factor)
    noise_amplitude = compute_amplitude(noise)
    noise = noise * (new_noise_amplitude / (noise_amplitude + eps))
    if sig.ndim == 1:
        return sig + noise[0] if noise.ndim > 1 else sig + noise
    return sig + noise


def resynthesize(enhanced_mag, noisy_inputs, stft, istft, normalize_wavs=True):
    """Resynthesize waveforms from enhanced magnitudes using the noisy phase
    (reference ``signal_processing.py:483``): complex = mag·e^{i·∠noisy},
    inverse STFT, optional peak normalization."""
    noisy_feats = stft(None, noisy_inputs)
    phase = jnp.arctan2(noisy_feats[..., 1], noisy_feats[..., 0])
    complex_pred = enhanced_mag[..., None] * jnp.stack(
        [jnp.cos(phase), jnp.sin(phase)], axis=-1)
    pred_wavs = istft(None, complex_pred, sig_length=noisy_inputs.shape[1])
    if normalize_wavs:
        pred_wavs = normalize(pred_wavs, amp_type="peak")
    return pred_wavs
