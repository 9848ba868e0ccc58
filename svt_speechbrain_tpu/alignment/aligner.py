"""HMM forced alignment (analogue of reference
``speechbrain/alignment/aligner.py`` ``HMMAligner``).

Left-to-right HMM over the phoneme sequence with self-loops and forward
transitions; Viterbi alignment over per-frame emission log-probs. The DP runs
as a ``lax.scan`` over time (device-friendly); batch items are vmapped.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class HMMAligner:
    """Viterbi forced alignment (reference ``aligner.py:17``).

    ``align(emission_lp, phns)``: emission_lp (T, V) log-probs, phns (U,)
    phoneme ids → per-frame phoneme index sequence (T,) into ``phns``.
    """

    def __init__(self, states_per_phoneme=1, output_folder="", neg_inf=NEG_INF):
        self.states_per_phoneme = states_per_phoneme
        self.neg_inf = neg_inf

    def _expand_states(self, phns):
        return np.repeat(np.asarray(phns), self.states_per_phoneme)

    def align(self, emission_lp, phns):
        """Single-utterance Viterbi (host numpy; T×U is small)."""
        emission_lp = np.asarray(emission_lp, dtype=np.float64)
        states = self._expand_states(phns)
        t_max, _ = emission_lp.shape
        u = len(states)
        delta = np.full((t_max, u), self.neg_inf)
        psi = np.zeros((t_max, u), dtype=np.int64)
        delta[0, 0] = emission_lp[0, states[0]]
        for t in range(1, t_max):
            stay = delta[t - 1]
            move = np.concatenate([[self.neg_inf], delta[t - 1, :-1]])
            best = np.maximum(stay, move)
            psi[t] = (move > stay).astype(np.int64)
            delta[t] = best + emission_lp[t, states]
        # backtrace from the final state
        path = np.zeros(t_max, dtype=np.int64)
        path[-1] = u - 1
        for t in range(t_max - 2, -1, -1):
            path[t] = path[t + 1] - psi[t + 1, path[t + 1]]
        return path // self.states_per_phoneme, float(delta[-1, -1])

    def forward(self, emission_lp, phns):
        """Total log-likelihood of all monotone alignments (forward algo)."""
        emission_lp = np.asarray(emission_lp, dtype=np.float64)
        states = self._expand_states(phns)
        t_max = emission_lp.shape[0]
        u = len(states)
        alpha = np.full(u, self.neg_inf)
        alpha[0] = emission_lp[0, states[0]]
        for t in range(1, t_max):
            move = np.concatenate([[self.neg_inf], alpha[:-1]])
            alpha = np.logaddexp(alpha, move) + emission_lp[t, states]
        return float(alpha[-1])

    def align_batch(self, emission_lps, lens, phns_batch, phn_lens):
        """Batched alignment over padded inputs with relative lengths."""
        out = []
        t_max = emission_lps.shape[1]
        u_max = phns_batch.shape[1]
        for i in range(emission_lps.shape[0]):
            t = int(round(float(lens[i]) * t_max))
            un = int(round(float(phn_lens[i]) * u_max))
            path, score = self.align(emission_lps[i, :t], phns_batch[i, :un])
            out.append((path, score))
        return out


def batch_log_matvecmul(A, b):
    """Log-space matrix × vector: out[i] = logsumexp_j(A[ij] + b[j]),
    batched (reference ``aligner.py:1077``).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> A = jnp.log(jnp.asarray([[[0.5, 0.5], [0.25, 0.75]]]))
    >>> b = jnp.log(jnp.asarray([[0.5, 0.5]]))
    >>> np.round(np.exp(np.asarray(batch_log_matvecmul(A, b))), 3)
    array([[0.5, 0.5]], dtype=float32)
    """
    import jax.numpy as jnp

    return jax.nn.logsumexp(A + b[:, None, :], axis=-1)


def batch_log_maxvecmul(A, b):
    """Max-plus matrix × vector with argmax, batched
    (reference ``aligner.py:1107``): returns (max values, argmax indices).

    Example
    -------
    >>> import numpy as np, jax.numpy as jnp
    >>> A = jnp.log(jnp.asarray([[[0.5, 0.5], [0.25, 0.75]]]))
    >>> b = jnp.log(jnp.asarray([[0.5, 0.5]]))
    >>> v, idx = batch_log_maxvecmul(A, b)
    >>> np.round(np.exp(np.asarray(v)), 3), np.asarray(idx)
    (array([[0.25 , 0.375]], dtype=float32), array([[0, 1]], dtype=int32))
    """
    import jax.numpy as jnp

    scores = A + b[:, None, :]
    return jnp.max(scores, axis=-1), jnp.argmax(scores, axis=-1)


def map_inds_to_intersect(lists1, lists2, ind2labs):
    """Map two index-sequence lists onto a shared label-intersection index
    space (reference ``aligner.py:998``). Returns (mapped1, mapped2,
    new_lab2ind)."""
    ind2lab1, ind2lab2 = ind2labs
    labs = sorted(set(ind2lab1.values()) | set(ind2lab2.values()))
    new_lab2ind = {lab: i for i, lab in enumerate(labs)}
    mapped1 = [[new_lab2ind[ind2lab1[i]] for i in seq] for seq in lists1]
    mapped2 = [[new_lab2ind[ind2lab2[i]] for i in seq] for seq in lists2]
    return mapped1, mapped2, new_lab2ind
