"""RNN zoo parity vs torch; decoder/edit-distance behaviour."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _torch_to_params(torch_rnn, num_layers, bidirectional, gates):
    params = {}
    n_dir = 2 if bidirectional else 1
    for layer in range(num_layers):
        for d in range(n_dir):
            sfx = f"_l{layer}" + ("_reverse" if d else "")
            name = f"l{layer}" + ("_rev" if d else "")
            params[name] = {
                "w_ih": getattr(torch_rnn, f"weight_ih{sfx}").detach().numpy().T,
                "w_hh": getattr(torch_rnn, f"weight_hh{sfx}").detach().numpy().T,
                "b_ih": getattr(torch_rnn, f"bias_ih{sfx}").detach().numpy(),
                "b_hh": getattr(torch_rnn, f"bias_hh{sfx}").detach().numpy(),
            }
    return params


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_matches_torch(bidirectional):
    import torch

    from svt_speechbrain_tpu.nnet.rnn import LSTM

    torch.manual_seed(0)
    t_rnn = torch.nn.LSTM(12, 16, num_layers=2, batch_first=True,
                          bidirectional=bidirectional)
    x = np.random.default_rng(0).normal(size=(3, 9, 12)).astype(np.float32)
    with torch.no_grad():
        expected, _ = t_rnn(torch.tensor(x))
    mine = LSTM(hidden_size=16, input_size=12, num_layers=2,
                bidirectional=bidirectional)
    params = _torch_to_params(t_rnn, 2, bidirectional, 4)
    got, _ = mine(params, x)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)


def test_gru_matches_torch():
    import torch

    from svt_speechbrain_tpu.nnet.rnn import GRU

    torch.manual_seed(1)
    t_rnn = torch.nn.GRU(8, 10, num_layers=1, batch_first=True)
    x = np.random.default_rng(1).normal(size=(2, 7, 8)).astype(np.float32)
    with torch.no_grad():
        expected, _ = t_rnn(torch.tensor(x))
    mine = GRU(hidden_size=10, input_size=8)
    params = _torch_to_params(t_rnn, 1, False, 3)
    got, _ = mine(params, x)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-5)


def test_ligru_and_quasirnn_run():
    from svt_speechbrain_tpu.nnet.rnn import LiGRU, QuasiRNN

    x = np.random.default_rng(2).normal(size=(2, 6, 8)).astype(np.float32)
    for cls in (LiGRU, QuasiRNN):
        mod = cls(hidden_size=12, input_size=8, bidirectional=True)
        params = mod.init(jax.random.PRNGKey(0))
        out, _ = mod(params, x)
        assert out.shape == (2, 6, 24)


def test_edit_distance_known_values():
    from svt_speechbrain_tpu.utils import edit_distance

    ref = "a b c d".split()
    hyp = "a x c".split()  # 1 sub + 1 del
    stats = edit_distance.accumulatable_wer_stats([ref], [hyp])
    assert stats["substitutions"] == 1
    assert stats["deletions"] == 1
    assert stats["insertions"] == 0
    assert abs(stats["WER"] - 50.0) < 1e-9

    details = edit_distance.wer_details_for_batch(["u1"], [ref], [hyp], True)
    summary = edit_distance.wer_summary(details)
    assert summary["num_edits"] == 2


def test_error_rate_stats():
    from svt_speechbrain_tpu.utils.metric_stats import ErrorRateStats

    wer = ErrorRateStats()
    pred = np.array([[1, 2, 3, 0]])
    target = np.array([[1, 2, 4, 0]])
    wer.append(["utt1"], pred, target, predict_len=np.array([0.75]),
               target_len=np.array([0.75]))
    s = wer.summarize()
    assert abs(s["WER"] - 100.0 / 3) < 1e-6


def test_ctc_greedy_decode():
    from svt_speechbrain_tpu.decoders.ctc import ctc_greedy_decode

    # frames vote: [a a blank a b b] → a a b (repeat collapse + blank drop)
    v = 3  # tokens 0,1 + blank 2
    probs = np.zeros((1, 6, v))
    for t, tok in enumerate([0, 0, 2, 0, 1, 1]):
        probs[0, t, tok] = 1.0
    out = ctc_greedy_decode(probs, np.array([1.0]), blank_id=-1)
    assert out == [[0, 0, 1]]


def test_transducer_greedy_trivial():
    from svt_speechbrain_tpu.decoders.transducer import TransducerBeamSearcher

    # joint ignores decoder and emits argmax of a fixed per-frame table then blank
    table = np.array([[0.0, 5.0, 0.0],   # frame 0 → token 1
                      [5.0, 0.0, 0.0],   # frame 1 → blank (id 0)
                      [0.0, 0.0, 5.0]])  # frame 2 → token 2

    def decode_fn(tokens, state):
        count = 0 if state is None else state + 1
        return jnp.zeros((tokens.shape[0], 4)), jnp.asarray(count)

    emitted = {"n": 0}

    def joint_fn(enc_frame, dec_out):
        # after one emission per frame, prefer blank to avoid loops
        logits = jnp.asarray(enc_frame)
        return logits

    enc = jnp.asarray(table)[None]  # (1, 3, 3)

    # joint emits each frame's token once, then prefers blank for that frame
    seen = set()

    def joint_once(enc_frame, dec_out):
        base = np.asarray(enc_frame)
        key = base.tobytes()
        if key in seen:
            out = np.zeros_like(base)
            out[..., 0] = 5.0
            return jnp.asarray(out)
        seen.add(key)
        return jnp.asarray(base)

    searcher = TransducerBeamSearcher(decode_fn, joint_once, blank_id=0, beam_size=1)
    hyps = searcher(enc)[0]
    assert hyps[0] == [1, 2]
