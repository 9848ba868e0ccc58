"""Recurrent networks (analogue of reference ``speechbrain/nnet/RNN.py``).

Recurrences are ``lax.scan`` over time — XLA compiles the cell body into one
fused program per step; multi-layer/bidirectional stacks vectorize the batch
and feature math onto the MXU. Parameters follow torch layouts (w_ih, w_hh,
b_ih, b_hh per layer/direction) so converted checkpoints drop in.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from svt_speechbrain_tpu.nnet.core import Module, split_rngs, uniform_bias
from svt_speechbrain_tpu.nnet.linear import Linear


def _rnn_uniform(rng, shape, hidden_size):
    bound = 1.0 / np.sqrt(hidden_size)
    return jax.random.uniform(rng, shape, jnp.float32, -bound, bound)


class _RNNBase(Module):
    GATES = 1

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bias=True, dropout=0.0, bidirectional=False,
                 re_init=True):
        if input_size is None and input_shape is not None:
            input_size = int(np.prod(input_shape[2:]))
        self.hidden_size = hidden_size
        self.input_size = input_size
        self.num_layers = num_layers
        self.bias = bias
        self.dropout = dropout
        self.bidirectional = bidirectional

    def init(self, rng):
        params = {}
        n_dir = 2 if self.bidirectional else 1
        g = self.GATES
        keys = split_rngs(rng, self.num_layers * n_dir * 4)
        ki = 0
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size * n_dir
            for d in range(n_dir):
                name = f"l{layer}" + ("_rev" if d else "")
                p = {
                    "w_ih": _rnn_uniform(keys[ki], (in_size, g * self.hidden_size), self.hidden_size),
                    "w_hh": _rnn_uniform(keys[ki + 1], (self.hidden_size, g * self.hidden_size), self.hidden_size),
                }
                if self.bias:
                    p["b_ih"] = _rnn_uniform(keys[ki + 2], (g * self.hidden_size,), self.hidden_size)
                    p["b_hh"] = _rnn_uniform(keys[ki + 3], (g * self.hidden_size,), self.hidden_size)
                params[name] = p
                ki += 4
        return params

    def _cell(self, p, x_t, state):
        raise NotImplementedError

    def _init_state(self, batch):
        return jnp.zeros((batch, self.hidden_size))

    def _run_direction(self, p, x, reverse=False, h0=None):
        if reverse:
            x = jnp.flip(x, axis=1)
        state0 = self._init_state(x.shape[0]) if h0 is None else h0

        def step(state, x_t):
            new_state = self._cell(p, x_t, state)
            out = new_state[0] if isinstance(new_state, tuple) else new_state
            return new_state, out

        xs = jnp.moveaxis(x, 1, 0)  # (T, B, F)
        final, outs = jax.lax.scan(step, state0, xs)
        outs = jnp.moveaxis(outs, 0, 1)
        if reverse:
            outs = jnp.flip(outs, axis=1)
        return outs, final

    def __call__(self, params, x, hx=None, rng=None, train=False):
        """x: (batch, time, features) → (output, final_states)."""
        from svt_speechbrain_tpu.nnet.dropout import dropout as _drop

        if x.ndim == 4:  # (B, T, C, F) → flatten
            x = x.reshape(x.shape[0], x.shape[1], -1)
        finals = []
        for layer in range(self.num_layers):
            fwd, f_final = self._run_direction(params[f"l{layer}"], x)
            if self.bidirectional:
                bwd, b_final = self._run_direction(params[f"l{layer}_rev"], x, reverse=True)
                x = jnp.concatenate([fwd, bwd], axis=-1)
                finals.append((f_final, b_final))
            else:
                x = fwd
                finals.append(f_final)
            if train and rng is not None and self.dropout > 0 and layer < self.num_layers - 1:
                rng, sub = jax.random.split(rng)
                x = _drop(x, self.dropout, sub, True)
        return x, finals


class RNN(_RNNBase):
    """Vanilla tanh/relu RNN (reference ``RNN.py:54``)."""

    GATES = 1

    def __init__(self, *args, nonlinearity="tanh", **kwargs):
        super().__init__(*args, **kwargs)
        self.act = jnp.tanh if nonlinearity == "tanh" else jax.nn.relu

    def _cell(self, p, x_t, h):
        z = x_t @ p["w_ih"] + h @ p["w_hh"]
        if self.bias:
            z = z + p["b_ih"] + p["b_hh"]
        return self.act(z)


class LSTM(_RNNBase):
    """LSTM (reference ``RNN.py:156``); torch gate order i, f, g, o.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> lstm = LSTM(hidden_size=5, input_size=3, bidirectional=True)
    >>> params = lstm.init(jax.random.PRNGKey(0))
    >>> out, finals = lstm(params, jnp.ones((2, 7, 3)))
    >>> out.shape                    # fwd+bwd concat
    (2, 7, 10)
    """

    GATES = 4

    def _init_state(self, batch):
        return (jnp.zeros((batch, self.hidden_size)),
                jnp.zeros((batch, self.hidden_size)))

    def _cell(self, p, x_t, state):
        h, c = state
        z = x_t @ p["w_ih"] + h @ p["w_hh"]
        if self.bias:
            z = z + p["b_ih"] + p["b_hh"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new)

    def _run_direction(self, p, x, reverse=False, h0=None):
        if reverse:
            x = jnp.flip(x, axis=1)
        state0 = self._init_state(x.shape[0]) if h0 is None else h0

        def step(state, x_t):
            new_state = self._cell(p, x_t, state)
            return new_state, new_state[0]

        xs = jnp.moveaxis(x, 1, 0)
        final, outs = jax.lax.scan(step, state0, xs)
        outs = jnp.moveaxis(outs, 0, 1)
        if reverse:
            outs = jnp.flip(outs, axis=1)
        return outs, final


class GRU(_RNNBase):
    """GRU (reference ``RNN.py:272``); torch gate order r, z, n."""

    GATES = 3

    def _cell(self, p, x_t, h):
        gi = x_t @ p["w_ih"]
        gh = h @ p["w_hh"]
        if self.bias:
            gi = gi + p["b_ih"]
            gh = gh + p["b_hh"]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1 - z) * n + z * h


class LiGRU(Module):
    """Light GRU, reference-exact (``RNN.py:386`` LiGRU / ``:1125``
    LiGRU_Layer): per layer, bias-free W (in→2H) and U (H→2H) projections;
    the W projection of ALL timesteps is normalized at once over the
    flattened (batch·time, 2H) frames — per-layer BatchNorm with
    momentum 0.05 by default (running statistics live in the state tree),
    or LayerNorm — BEFORE the recurrence; gate order is (candidate at,
    update zt); a bidirectional layer shares W/U between directions (the
    reference concatenates the flipped sequence on the batch axis).

    Hoisting the W matmul + norm out of the scan also keeps the MXU busy:
    the scan body is two (B, H)×(H, 2H) matmuls and elementwise gates.

    Stateful API (batchnorm): ``init_state()`` → running stats;
    ``__call__(params, x, hx=None, state=state, train=...)`` returns
    ``(out, finals, new_state)``. Without ``state`` the call stays
    2-tuple-compatible — train mode uses batch statistics exactly like the
    reference, eval falls back to the untrained (0, 1) running stats.
    """

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, bias=True, dropout=0.0, bidirectional=False,
                 nonlinearity="relu", normalization="batchnorm",
                 re_init=True):
        del bias, re_init  # reference LiGRU projections are bias-free
        if input_size is None and input_shape is not None:
            input_size = int(np.prod(input_shape[2:]))
        self.hidden_size = hidden_size
        self.input_size = input_size
        self.num_layers = num_layers
        self.dropout = dropout
        self.bidirectional = bidirectional
        self.normalization = normalization
        if nonlinearity == "tanh":
            self.act = jnp.tanh
        elif nonlinearity == "sin":
            self.act = jnp.sin
        elif nonlinearity == "leaky_relu":
            self.act = jax.nn.leaky_relu
        else:
            self.act = jax.nn.relu

    def _norm_module(self):
        from svt_speechbrain_tpu.nnet.normalization import BatchNorm1d

        return BatchNorm1d(2 * self.hidden_size, momentum=0.05)

    def init(self, rng):
        params = {}
        n_dir = 2 if self.bidirectional else 1
        keys = split_rngs(rng, self.num_layers * 2)
        for layer in range(self.num_layers):
            in_size = (self.input_size if layer == 0
                       else self.hidden_size * n_dir)
            p = {
                "w": _rnn_uniform(keys[2 * layer],
                                  (in_size, 2 * self.hidden_size),
                                  self.hidden_size),
                "u": _rnn_uniform(keys[2 * layer + 1],
                                  (self.hidden_size, 2 * self.hidden_size),
                                  self.hidden_size),
            }
            # The reference's else-branch still instantiates (and applies)
            # LayerNorm for unknown normalization strings (RNN.py:1188-1191),
            # so every layer carries norm params regardless of the mode.
            p["norm"] = {
                "scale": jnp.ones((2 * self.hidden_size,), jnp.float32),
                "bias": jnp.zeros((2 * self.hidden_size,), jnp.float32),
            }
            params[f"l{layer}"] = p
        return params

    def init_state(self):
        if self.normalization != "batchnorm":
            return {}
        return {f"l{layer}": self._norm_module().init_state()
                for layer in range(self.num_layers)}

    def _layer(self, p, w_normed, h0, drop_mask):
        """Recurrence over pre-normalized w projections: (B', T, 2H).

        ``drop_mask`` is the reference's recurrent dropout (RNN.py:1257,
        1264): one (B', H) mask per forward, shared by every timestep,
        applied to the candidate activation inside the cell.
        """
        def step(h, w_t):
            gates = w_t + h @ p["u"]
            at, zt = jnp.split(gates, 2, axis=-1)
            z = jax.nn.sigmoid(zt)
            hcand = self.act(at) * drop_mask
            h_new = z * h + (1 - z) * hcand
            return h_new, h_new

        ws = jnp.moveaxis(w_normed, 1, 0)
        final, outs = jax.lax.scan(step, h0, ws)
        return jnp.moveaxis(outs, 0, 1), final

    def __call__(self, params, x, hx=None, state=None, train=False,
                 rng=None):
        from svt_speechbrain_tpu.nnet.dropout import dropout as _drop
        from svt_speechbrain_tpu.nnet.normalization import layer_norm

        if x.ndim == 4:
            x = x.reshape(x.shape[0], x.shape[1], -1)
        return_state = state is not None
        if state is None:
            state = self.init_state()
        new_state = {}
        finals = []
        b = x.shape[0]
        bp = 2 * b if self.bidirectional else b
        if hx is not None:
            # Reference semantics (RNN.py:1102-1111): hx arrives
            # (num_layers * n_dir, B, H) torch-style and is indexed per
            # layer; the bidirectional reshape folds direction into batch,
            # matching the [x, flip(x)] batch concat below. A single (B, H)
            # state is broadcast to every layer for convenience.
            hx = jnp.asarray(hx)
            if hx.ndim == 2:
                hx = jnp.broadcast_to(
                    hx, (self.num_layers,) + hx.shape)
                if self.bidirectional:
                    hx = jnp.concatenate([hx, hx], axis=1)
            elif self.bidirectional:
                hx = hx.reshape(self.num_layers, bp, self.hidden_size)
            if hx.shape != (self.num_layers, bp, self.hidden_size):
                raise ValueError(
                    f"hx shape {hx.shape} incompatible with "
                    f"({self.num_layers}[*n_dir], {b}, {self.hidden_size})")
        for layer in range(self.num_layers):
            p = params[f"l{layer}"]
            inp = x
            if self.bidirectional:  # flipped copy rides the batch axis
                inp = jnp.concatenate([x, jnp.flip(x, axis=1)], axis=0)
            w = inp @ p["w"]
            if self.normalization == "batchnorm":
                flat = w.reshape(-1, w.shape[-1])
                y, st = self._norm_module()(
                    p["norm"], state[f"l{layer}"], flat, train=train)
                w = y.reshape(w.shape)
                new_state[f"l{layer}"] = st
            else:
                # layernorm AND any unknown string: the reference's else
                # branch still applies LayerNorm (RNN.py:1188-1191).
                w = layer_norm(w, p["norm"]["scale"], p["norm"]["bias"])
            h0 = (jnp.zeros((inp.shape[0], self.hidden_size))
                  if hx is None else hx[layer])
            drop_mask = jnp.ones((1, self.hidden_size), x.dtype)
            if train and rng is not None and self.dropout > 0:
                rng, sub = jax.random.split(rng)
                drop_mask = _drop(
                    jnp.ones((inp.shape[0], self.hidden_size), x.dtype),
                    self.dropout, sub, True)
            outs, final = self._layer(p, w, h0, drop_mask)
            if self.bidirectional:
                outs = jnp.concatenate(
                    [outs[:b], jnp.flip(outs[b:], axis=1)], axis=-1)
            x = outs
            finals.append(final)
        if return_state:
            return x, finals, new_state
        return x, finals


class QuasiRNN(Module):
    """Quasi-RNN: conv gates + recurrent pooling (reference ``RNN.py:1126``)."""

    def __init__(self, hidden_size, input_shape=None, input_size=None,
                 num_layers=1, zoneout=0.0, bidirectional=False, **kwargs):
        if input_size is None and input_shape is not None:
            input_size = int(np.prod(input_shape[2:]))
        self.hidden_size = hidden_size
        self.input_size = input_size
        self.num_layers = num_layers
        self.bidirectional = bidirectional

    def init(self, rng):
        params = {}
        n_dir = 2 if self.bidirectional else 1
        keys = split_rngs(rng, self.num_layers)
        for layer in range(self.num_layers):
            in_size = self.input_size if layer == 0 else self.hidden_size * n_dir
            lin = Linear(3 * self.hidden_size * n_dir, in_size * 2)
            params[f"l{layer}"] = lin.init(keys[layer])
        return params

    def __call__(self, params, x, hx=None):
        n_dir = 2 if self.bidirectional else 1
        for layer in range(self.num_layers):
            # window-2 conv: concat current and previous frame
            prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
            source = jnp.concatenate([x, prev], axis=-1)
            y = jnp.matmul(source, params[f"l{layer}"]["w"]) + params[f"l{layer}"]["b"]
            z, f, o = jnp.split(y, 3, axis=-1)
            z, f, o = jnp.tanh(z), jax.nn.sigmoid(f), jax.nn.sigmoid(o)

            def pool(z, f):
                def step(c, zf):
                    z_t, f_t = zf
                    c_new = f_t * c + (1 - f_t) * z_t
                    return c_new, c_new

                c0 = jnp.zeros_like(z[:, 0])
                _, cs = jax.lax.scan(step, c0, (jnp.moveaxis(z, 1, 0), jnp.moveaxis(f, 1, 0)))
                return jnp.moveaxis(cs, 0, 1)

            if self.bidirectional:
                zf, zb = jnp.split(z, 2, axis=-1)
                ff, fb = jnp.split(f, 2, axis=-1)
                of, ob = jnp.split(o, 2, axis=-1)
                cf = pool(zf, ff)
                cb = jnp.flip(pool(jnp.flip(zb, 1), jnp.flip(fb, 1)), 1)
                x = jnp.concatenate([of * cf, ob * cb], axis=-1)
            else:
                x = o * pool(z, f)
        return x, None


class AttentionalRNNDecoder(Module):
    """RNN/GRU/LSTM decoder with content / location-aware / key-value
    attention, reference-exact (reference ``RNN.py:713``): the attention
    emits an ``attn_dim``-wide context through its output projection, the
    cell consumes ``input_size + attn_dim``, and the decoder output is
    ``proj(cat([c, cell_out]))``.

    Step-wise API for beam search:
    ``forward_step(params, inp_t, hs, c, enc_states, enc_len, attn_state)``
    → ``(dec_out, hs, c, w, attn_state)`` — ``attn_state`` threads the
    location-aware attention's previous weights (the reference keeps them
    as module state); it is None for the other attention types.

    Example
    -------
    >>> import jax, jax.numpy as jnp
    >>> dec = AttentionalRNNDecoder("gru", "content", hidden_size=7,
    ...                             attn_dim=5, num_layers=1, enc_dim=10,
    ...                             input_size=6)
    >>> params = dec.init(jax.random.PRNGKey(0))
    >>> out, w = dec(params, jnp.ones((2, 4, 6)), jnp.ones((2, 9, 10)),
    ...              jnp.ones((2,)))
    >>> out.shape
    (2, 4, 7)
    """

    def __init__(self, rnn_type, attn_type, hidden_size, attn_dim, num_layers,
                 enc_dim, input_size, nonlinearity="relu", re_init=True,
                 normalization="batchnorm", scaling=1.0, channels=None,
                 kernel_size=None, bias=True, dropout=0.0):
        from svt_speechbrain_tpu.nnet.attention import (
            ContentBasedAttention, KeyValueAttention, LocationAwareAttention)

        self.rnn_type = rnn_type.lower()
        self.attn_type = attn_type.lower()
        self.hidden_size = hidden_size
        self.attn_dim = attn_dim
        self.num_layers = num_layers
        self.dropout = dropout
        # reference RNN.py:815: proj(cat([c, cell_out])) → hidden
        self.proj = Linear(hidden_size, hidden_size + attn_dim, bias=True)
        if self.attn_type == "content":
            self.attn = ContentBasedAttention(
                enc_dim=enc_dim, dec_dim=hidden_size, attn_dim=attn_dim,
                output_dim=attn_dim, scaling=scaling)
        elif self.attn_type == "location":
            self.attn = LocationAwareAttention(
                enc_dim=enc_dim, dec_dim=hidden_size, attn_dim=attn_dim,
                output_dim=attn_dim, conv_channels=channels,
                kernel_size=kernel_size, scaling=scaling)
        elif self.attn_type == "keyvalue":
            self.attn = KeyValueAttention(
                enc_dim=enc_dim, dec_dim=hidden_size, attn_dim=attn_dim,
                output_dim=attn_dim)
        else:
            raise ValueError(f"{self.attn_type} is not implemented.")
        cell_cls = {"rnn": RNNCell, "gru": GRUCell, "lstm": LSTMCell}[
            self.rnn_type]
        kwargs = dict(hidden_size=hidden_size,
                      input_size=input_size + attn_dim,
                      num_layers=num_layers, bias=bias,
                      dropout=0.0 if num_layers == 1 else dropout)
        if self.rnn_type == "rnn":
            kwargs["nonlinearity"] = nonlinearity
        self.rnn = cell_cls(**kwargs)

    def init(self, rng):
        k1, k2, k3 = split_rngs(rng, 3)
        return {"rnn": self.rnn.init(k1), "attn": self.attn.init(k2),
                "proj": self.proj.init(k3)}

    def _attend(self, params, enc_states, enc_len, dec_state, attn_state):
        if self.attn_type == "location":
            c, w = self.attn(params["attn"], enc_states, enc_len, dec_state,
                             prev_attn=attn_state)
            return c, w, w  # new attn weights are the next prev_attn
        c, w = self.attn(params["attn"], enc_states, enc_len, dec_state)
        return c, w, None

    def forward_step(self, params, inp_t, hs, context, enc_states, enc_len,
                     attn_state=None, train=False, rng=None):
        """One decode step: input embedding (B, E) + previous context
        (B, attn_dim) (reference ``RNN.py:877`` forward_step)."""
        if hs is None:
            hs = self.rnn.init_states(inp_t.shape[0])
        cell_inp = jnp.concatenate([inp_t, context], axis=-1)
        if train and self.dropout > 0.0 and rng is not None:
            keep = 1.0 - self.dropout
            mask = jax.random.bernoulli(rng, keep, cell_inp.shape)
            cell_inp = cell_inp * mask.astype(cell_inp.dtype) / keep
        cell_out, hs = self.rnn(params["rnn"], cell_inp, hs)
        context, w, attn_state = self._attend(params, enc_states, enc_len,
                                              cell_out, attn_state)
        dec_out = jnp.concatenate([context, cell_out], axis=1)
        dec_out = self.proj(params["proj"], dec_out)
        return dec_out, hs, context, w, attn_state

    def __call__(self, params, inp, enc_states, wav_len, train=False,
                 rng=None):
        """Teacher-forced full-sequence decode: inp (B, U, E); ``wav_len``
        is the RELATIVE length, rounded to frames like the reference
        (``RNN.py:933``)."""
        enc_len = jnp.round(
            enc_states.shape[1] * jnp.asarray(wav_len)).astype(jnp.int32)
        context = jnp.zeros((inp.shape[0], self.attn_dim))
        hs, attn_state = None, None
        outs, attns = [], []
        for u in range(inp.shape[1]):  # U is small (labels); unrolls
            ukey = None if rng is None else jax.random.fold_in(rng, u)
            out, hs, context, w, attn_state = self.forward_step(
                params, inp[:, u], hs, context, enc_states, enc_len,
                attn_state, train=train, rng=ukey)
            outs.append(out)
            attns.append(w)
        return jnp.stack(outs, axis=1), jnp.stack(attns, axis=1)


class _CellBase(Module):
    """Step-wise stacked cells for autoregressive decoders
    (reference ``RNN.py`` RNNCell/GRUCell/LSTMCell): one timestep through
    ``num_layers`` layers; states are a list per layer."""

    INNER = None

    def __init__(self, hidden_size, input_size, num_layers=1, bias=True,
                 dropout=0.0, re_init=True, **inner_kwargs):
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.inner = self.INNER(hidden_size, input_size=input_size,
                                num_layers=num_layers, bias=bias,
                                dropout=dropout, **inner_kwargs)

    def init(self, rng):
        return self.inner.init(rng)

    def init_states(self, batch):
        return [self.inner._init_state(batch) for _ in range(self.num_layers)]

    def __call__(self, params, x_t, states=None):
        """x_t (B, F) one frame → (out (B, H), new per-layer states)."""
        if states is None:
            states = self.init_states(x_t.shape[0])
        new_states = []
        h = x_t
        for layer in range(self.num_layers):
            state = self.inner._cell(params[f"l{layer}"], h, states[layer])
            h = state[0] if isinstance(state, tuple) else state
            new_states.append(state)
        return h, new_states


class RNNCell(_CellBase):
    """Vanilla tanh/relu RNN cell stack (reference ``RNN.py:368``)."""
    INNER = RNN


class GRUCell(_CellBase):
    """GRU cell stack (reference ``RNN.py:476``)."""
    INNER = GRU


class LSTMCell(_CellBase):
    """LSTM cell stack (reference ``RNN.py:570``)."""
    INNER = LSTM


def rnn_init(params):
    """Orthogonalize the recurrent (hidden→hidden) weights of an RNN param
    pytree in place of torch's ``rnn_init`` module walker
    (reference ``RNN.py:1589``); returns a new pytree."""
    import numpy as np

    def orth(w):
        q, _ = np.linalg.qr(np.asarray(w, dtype=np.float64))
        return jnp.asarray(q[:, :w.shape[1]], jnp.float32)

    def walk(tree):
        if isinstance(tree, dict):
            return {k: (orth(v) if k == "w_hh" else walk(v))
                    for k, v in tree.items()}
        return tree

    return walk(params)


def pack_padded_sequence(inputs, lengths):
    """Reference ``RNN.py:1712`` packs to skip pad compute in cuDNN; XLA
    programs are static-shape, so this is the identity with the lengths
    carried alongside (masking happens in the losses/attention)."""
    return inputs, jnp.asarray(lengths)


def pad_packed_sequence(inputs):
    """Inverse of ``pack_padded_sequence`` (reference ``RNN.py:1737``)."""
    if isinstance(inputs, tuple):
        return inputs[0]
    return inputs


# Reference layer names (``RNN.py`` LiGRU_Layer/QuasiRNNLayer wrap one layer)
LiGRU_Layer = LiGRU
QuasiRNNLayer = QuasiRNN
