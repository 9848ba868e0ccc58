"""PLDA / LDA speaker modelling (analogue of reference
``speechbrain/processing/PLDA_LDA.py``).

Host-side numpy statistics modelling (these run on embedding sets after
device inference): statistics-object accumulation, LDA projection, EM-trained
PLDA with log-likelihood-ratio scoring.
"""
from __future__ import annotations

import numpy as np


class StatObject_SB:
    """Container for (modelset, segset, start, stop, stat0, stat1)
    (reference ``PLDA_LDA.py:32``)."""

    def __init__(self, modelset=None, segset=None, start=None, stop=None,
                 stat0=None, stat1=None):
        self.modelset = np.asarray(modelset) if modelset is not None else np.array([])
        self.segset = np.asarray(segset) if segset is not None else np.array([])
        self.start = start
        self.stop = stop
        self.stat0 = stat0
        self.stat1 = stat1

    def get_mean_stat1(self):
        return np.mean(self.stat1, axis=0)

    def get_total_covariance_stat1(self):
        c = self.stat1 - self.stat1.mean(axis=0)
        return c.T @ c / self.stat1.shape[0]

    def get_model_stat0(self, mod_id):
        return self.stat0[self.modelset == mod_id]

    def get_model_stat1(self, mod_id):
        return self.stat1[self.modelset == mod_id]

    def sum_stat_per_model(self):
        """Per-model summed stats (reference ``:224``)."""
        models = np.unique(self.modelset)
        sum_stat1 = np.array([self.get_model_stat1(m).sum(axis=0) for m in models])
        counts = np.array([(self.modelset == m).sum() for m in models])
        out = StatObject_SB(modelset=models, segset=models,
                            stat0=counts[:, None].astype(np.float64),
                            stat1=sum_stat1)
        return out, counts


class LDA:
    """Linear discriminant analysis projection (reference ``PLDA_LDA.py``
    ``do_lda``).

    Example
    -------
    >>> import numpy as np
    >>> rng = np.random.default_rng(0)
    >>> x = np.vstack([rng.normal(size=(20, 4)) * 0.1 + [3, 0, 0, 0],
    ...                rng.normal(size=(20, 4)) * 0.1 + [-3, 0, 0, 0]])
    >>> ids = np.array(["spkA"] * 20 + ["spkB"] * 20)
    >>> st = StatObject_SB(modelset=ids, segset=ids,
    ...                    stat0=np.ones((40, 1)), stat1=x)
    >>> proj = LDA(reduce_dim=1).do_lda(st)
    >>> proj.stat1.shape
    (40, 1)
    >>> bool(abs(proj.stat1[:20].mean() - proj.stat1[20:].mean()) > 4)
    True
    """

    def __init__(self, reduce_dim=2):
        self.reduce_dim = reduce_dim
        self.transform_mat = None

    def do_lda(self, stat_server):
        x = stat_server.stat1
        labels = stat_server.modelset
        classes = np.unique(labels)
        mean = x.mean(axis=0)
        sw = np.zeros((x.shape[1], x.shape[1]))
        sb = np.zeros_like(sw)
        for c in classes:
            xc = x[labels == c]
            mc = xc.mean(axis=0)
            sw += (xc - mc).T @ (xc - mc)
            sb += len(xc) * np.outer(mc - mean, mc - mean)
        evals, evecs = np.linalg.eig(np.linalg.pinv(sw) @ sb)
        order = np.argsort(-evals.real)
        self.transform_mat = evecs[:, order[: self.reduce_dim]].real
        out = StatObject_SB(modelset=stat_server.modelset, segset=stat_server.segset,
                            stat0=stat_server.stat0,
                            stat1=x @ self.transform_mat)
        return out


class PLDA:
    """Probabilistic LDA with EM training + LLR scoring
    (reference ``PLDA_LDA.py`` PLDA class).

    Example
    -------
    >>> import numpy as np
    >>> rng = np.random.default_rng(0)
    >>> x = np.vstack([rng.normal(size=(20, 4)) * 0.1 + [3, 0, 0, 0],
    ...                rng.normal(size=(20, 4)) * 0.1 + [-3, 0, 0, 0]])
    >>> ids = np.array(["spkA"] * 20 + ["spkB"] * 20)
    >>> st = StatObject_SB(modelset=ids, segset=ids,
    ...                    stat0=np.ones((40, 1)), stat1=x)
    >>> p = PLDA(rank_f=2, nb_iter=5)
    >>> _ = p.plda(st)
    >>> llr = _plda_llr_matrix(p, x[:1], x[[1, 21]])  # enroll A vs (A, B)
    >>> bool(llr[0, 0] > llr[0, 1])   # same-speaker scores higher
    True
    """

    def __init__(self, rank_f=100, nb_iter=10, scaling_factor=1.0):
        self.rank_f = rank_f
        self.nb_iter = nb_iter
        self.scaling_factor = scaling_factor
        self.mean = None
        self.F = None
        self.Sigma = None

    def plda(self, stat_server, rng=None):
        """EM training of the eigenvoice PLDA model (reference ``plda``)."""
        rng = rng or np.random.default_rng(0)
        x = stat_server.stat1.astype(np.float64)
        labels = stat_server.modelset
        dim = x.shape[1]
        rank = min(self.rank_f, dim)
        self.mean = x.mean(axis=0)
        xc = x - self.mean
        # init F from PCA of the total covariance, Sigma from residual
        cov = xc.T @ xc / len(xc)
        evals, evecs = np.linalg.eigh(cov)
        order = np.argsort(-evals)
        self.F = evecs[:, order[:rank]] * np.sqrt(np.maximum(evals[order[:rank]], 1e-8))
        self.Sigma = cov.copy()

        models = np.unique(labels)
        for _ in range(self.nb_iter):
            # E-step: posterior of latent speaker factors per model
            sig_inv = np.linalg.pinv(self.Sigma)
            FtSi = self.F.T @ sig_inv
            ey = np.zeros((len(models), rank))
            eyy = np.zeros((rank, rank))
            resid = np.zeros((dim, dim))
            sum_n = 0
            ff_acc = np.zeros((rank, rank))
            xy_acc = np.zeros((dim, rank))
            for mi, m in enumerate(models):
                xm = xc[labels == m]
                n = len(xm)
                prec = np.eye(rank) + n * FtSi @ self.F
                cov_y = np.linalg.pinv(prec)
                mean_y = cov_y @ FtSi @ xm.sum(axis=0)
                ey[mi] = mean_y
                second = cov_y + np.outer(mean_y, mean_y)
                eyy += n * second
                ff_acc += n * second
                xy_acc += xm.sum(axis=0)[:, None] @ mean_y[None, :]
                sum_n += n
            # M-step
            self.F = xy_acc @ np.linalg.pinv(ff_acc)
            resid = (xc.T @ xc - self.F @ xy_acc.T) / sum_n
            self.Sigma = resid
        return self

    def scoring(self, enroll, test):
        """LLR score matrix between enroll and test stat1 sets
        (reference ``fast_PLDA_scoring``)."""
        F, Sigma = self.F, self.Sigma
        dim = F.shape[0]
        phi = F @ F.T  # between-speaker covariance
        sigma_tot = phi + Sigma
        # two-covariance LLR: closed form
        st_inv = np.linalg.pinv(sigma_tot)
        lam = np.linalg.pinv(sigma_tot - phi @ st_inv @ phi)
        gamma = st_inv - lam
        q = lam @ phi @ st_inv
        e = enroll.stat1 - self.mean
        t = test.stat1 - self.mean
        scores = e @ q @ t.T
        scores = 2 * scores - (np.sum(e @ gamma * e, axis=1)[:, None]
                               + np.sum(t @ gamma * t, axis=1)[None, :])
        return Ndx(enroll.modelset, test.segset, scores / 2)


class Ndx:
    """Score container (reference ``PLDA_LDA.py`` ``Scores``/``Ndx``)."""

    def __init__(self, modelset, segset, scoremat):
        self.modelset = modelset
        self.segset = segset
        self.scoremat = scoremat


def ismember(list1, list2):
    """Elementwise membership mask (reference ``PLDA_LDA.py:31``)."""
    s = set(list2)
    return [item in s for item in list1]


def diff(list1, list2):
    """Set difference keeping order (reference ``PLDA_LDA.py:24``)."""
    s = set(list2)
    return [item for item in list1 if item not in s]


class Scores:
    """Score-matrix container (reference ``PLDA_LDA.py:Scores``):
    ``modelset`` × ``segset`` with a validity mask."""

    def __init__(self, scores=None, modelset=None, segset=None, scoremask=None):
        self.scoremat = np.array([]) if scores is None else np.asarray(scores)
        self.modelset = np.array([]) if modelset is None else np.asarray(modelset)
        self.segset = np.array([]) if segset is None else np.asarray(segset)
        self.scoremask = (np.ones_like(self.scoremat, dtype=bool)
                          if scoremask is None else scoremask)

    def __repr__(self):
        return (f"Scores(models={len(self.modelset)}, "
                f"segs={len(self.segset)})")


def fa_model_loop(batch_start, mini_batch_indices, factor_analyser,
                  stat0, stat1, e_h, e_hh):
    """Latent-factor E-step inner loop (reference ``PLDA_LDA.py:66``):
    fills per-session posterior means ``e_h`` and second moments ``e_hh``."""
    F = factor_analyser.F
    rank = F.shape[1]
    inv_sigma = np.linalg.pinv(factor_analyser.Sigma)
    FtSi = F.T @ inv_sigma
    prec_base = FtSi @ F
    for idx in mini_batch_indices:
        row = batch_start + idx
        n = stat0[row, 0] if stat0.ndim > 1 else stat0[row]
        prec = np.eye(rank) + n * prec_base
        cov = np.linalg.pinv(prec)
        mean = cov @ FtSi @ stat1[row]
        e_h[idx] = mean
        e_hh[idx] = cov + np.outer(mean, mean)


def fast_PLDA_scoring(enroll, test, ndx, mu, F, Sigma, p_known=0.0,
                      scaling_factor=1.0, check_missing=True):
    """LLR scoring of enroll vs test i-vectors under a trained PLDA model
    (reference ``PLDA_LDA.py:856``); returns a ``Scores`` object over the
    trial index ``ndx``."""
    del p_known, check_missing
    plda = PLDA(rank_f=F.shape[1])
    plda.mean, plda.F, plda.Sigma = np.asarray(mu), np.asarray(F), np.asarray(Sigma)
    enroll_x = np.asarray(enroll.stat1, dtype=np.float64) * scaling_factor
    test_x = np.asarray(test.stat1, dtype=np.float64) * scaling_factor
    scores = plda.scoring_matrix(enroll_x, test_x) if hasattr(plda, "scoring_matrix") \
        else _plda_llr_matrix(plda, enroll_x, test_x)
    return Scores(scores=scores, modelset=getattr(ndx, "modelset", enroll.modelset),
                  segset=getattr(ndx, "segset", test.modelset))


def _plda_llr_matrix(plda, enroll_x, test_x):
    """LLR under the two-covariance view of the eigenvoice PLDA model."""
    B = plda.F @ plda.F.T          # between-speaker covariance
    W = plda.Sigma                 # within-speaker covariance
    e = enroll_x - plda.mean
    t = test_x - plda.mean
    tot = B + W
    sig_ss = np.block([[tot, B], [B, tot]])
    sig_diff = np.block([[tot, np.zeros_like(B)], [np.zeros_like(B), tot]])
    iss = np.linalg.pinv(sig_ss)
    idf = np.linalg.pinv(sig_diff)
    _, ld_ss = np.linalg.slogdet(sig_ss)
    _, ld_df = np.linalg.slogdet(sig_diff)
    scores = np.zeros((len(e), len(t)))
    for i, ei in enumerate(e):
        for j, tj in enumerate(t):
            x = np.concatenate([ei, tj])
            scores[i, j] = -0.5 * (x @ iss @ x + ld_ss) + 0.5 * (x @ idf @ x + ld_df)
    return scores
