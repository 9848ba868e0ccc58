"""Speaker diarization clustering (analogue of reference
``speechbrain/processing/diarization.py``): cosine affinity, spectral
embedding with eigengap speaker-count estimation, k-means/agglomerative
assignment, and the RTTM segment post-processing chain. Host-side numpy
over device-extracted embeddings.

The clustering pipeline is numerically REFERENCE-EXACT (golden-tested in
``tests/test_diarization_golden.py``): ``Spec_Clust_unorm`` (raw-cosine
affinity, (1-p)-zeroing prune, |M| unnormalized Laplacian, eigengap over
``lambdas[1:max]`` with the min-speakers clamp), ``spectral_embedding_sb``
(normalized csgraph Laplacian, shift-invert ``eigsh``, deterministic sign
flip), and the segment chain (``merge_ssegs_same_speaker`` /
``distribute_overlap`` / ``write_rttm``). sklearn/scipy are used where the
reference uses them (gated; ``_kmeans`` is the dependency-free fallback).

One reference path is broken in this checkout and implemented as evident
intent instead: ``do_AHC`` requests ``AgglomerativeClustering(
affinity="cosine", linkage="ward")`` — ward REQUIRES euclidean in every
sklearn release (and ``affinity`` was removed in sklearn 1.4), so the
reference crashes at runtime; ours runs ward on the norm_stat1-normalized
embeddings (euclidean on unit vectors is monotone in cosine).
"""
from __future__ import annotations

import csv
import numbers
import warnings

import numpy as np


# ------------------------------------------------------------------ helpers

def get_oracle_num_spkrs(rec_id, spkr_info):
    """Oracle speaker count from RTTM speaker info (reference ``:498``).

    Example
    -------
    >>> info = ["SPKR-INFO rec1 0 <NA> <NA> <NA> unknown spk1",
    ...         "SPKR-INFO rec1 0 <NA> <NA> <NA> unknown spk2",
    ...         "SPKR-INFO rec2 0 <NA> <NA> <NA> unknown spk9"]
    >>> get_oracle_num_spkrs("rec1", info)
    2
    """
    return len({line.split()[7] for line in spkr_info
                if line.split()[1] == rec_id})


def cosine_affinity(emb):
    """[0, 1]-mapped cosine affinity (utility; ``Spec_Clust_unorm`` uses the
    reference's raw cosine via ``get_sim_mat``)."""
    emb = np.asarray(emb, dtype=np.float64)
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    sim = emb @ emb.T
    return (sim + 1.0) / 2.0


def _kmeans(x, k, n_iter=50, seed=0):
    """Dependency-free Lloyd k-means fallback (sklearn's ``k_means`` is used
    when available, like the reference)."""
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=k, replace=False)]
    labels = np.zeros(len(x), dtype=int)
    for _ in range(n_iter):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        new_labels = d.argmin(1)
        if (new_labels == labels).all():
            break
        labels = new_labels
        for c in range(k):
            pts = x[labels == c]
            if len(pts):
                centers[c] = pts.mean(0)
    return labels


def _k_means_labels(x, k, random_state=None, n_init=10):
    try:
        from sklearn.cluster import k_means
    except ImportError:
        return _kmeans(np.asarray(x, dtype=np.float64), k)
    _, labels, _ = k_means(x, k, random_state=random_state, n_init=n_init)
    return labels


def _check_random_state(seed):
    """None | int | RandomState → RandomState (reference ``:472``)."""
    if seed is None or seed is np.random:
        return np.random.mtrand._rand
    if isinstance(seed, numbers.Integral):
        return np.random.RandomState(seed)
    if isinstance(seed, np.random.RandomState):
        return seed
    raise ValueError(f"{seed!r} cannot seed a np.random.RandomState")


def _deterministic_vector_sign_flip(u):
    """Flip each row's sign so its absolute-max element is positive
    (reference ``:450``)."""
    max_abs_rows = np.argmax(np.abs(u), axis=1)
    signs = np.sign(u[range(u.shape[0]), max_abs_rows])
    u *= signs[:, np.newaxis]
    return u


# ------------------------------------------------- spectral embedding (nn)

def spectral_embedding_sb(adjacency, n_components=8, norm_laplacian=True,
                          drop_first=True):
    """Laplacian eigenmap embedding of an affinity matrix — reference-exact
    (``:535``): normalized csgraph Laplacian with unit diagonal,
    shift-invert ``eigsh`` around 1, degree rescaling, deterministic sign
    flip, optional first-eigenvector drop."""
    from scipy import sparse
    from scipy.sparse.csgraph import laplacian as csgraph_laplacian
    from scipy.sparse.linalg import eigsh

    if drop_first:
        n_components = n_components + 1

    laplacian, dd = csgraph_laplacian(adjacency, normed=norm_laplacian,
                                      return_diag=True)
    # unit diagonal + arpack-friendly format (reference _set_diag, :405)
    if not sparse.issparse(laplacian):
        if norm_laplacian:
            laplacian.flat[:: laplacian.shape[0] + 1] = 1.0
    else:
        laplacian = laplacian.tocoo()
        if norm_laplacian:
            laplacian.data[laplacian.row == laplacian.col] = 1.0
        laplacian = laplacian.tocsr()

    laplacian = laplacian * -1
    vals, diffusion_map = eigsh(laplacian, k=n_components, sigma=1.0,
                                which="LM")
    embedding = diffusion_map.T[n_components::-1]
    if norm_laplacian:
        embedding = embedding / dd
    embedding = _deterministic_vector_sign_flip(embedding)
    if drop_first:
        return embedding[1:n_components].T
    return embedding[:n_components].T


def spectral_clustering_sb(affinity, n_clusters=8, n_components=None,
                           random_state=None, n_init=10):
    """Spectral embedding + k-means labels (reference ``:620``)."""
    random_state = _check_random_state(random_state)
    n_components = n_clusters if n_components is None else n_components
    maps = spectral_embedding_sb(affinity, n_components=n_components,
                                 drop_first=False)
    return _k_means_labels(maps, n_clusters, random_state=random_state,
                           n_init=n_init)


try:
    from sklearn.cluster import SpectralClustering as _SpectralClustering

    class Spec_Cluster(_SpectralClustering):
        """Nearest-neighbor-affinity spectral clustering
        (reference ``:675``)."""

        def perform_sc(self, X, n_neighbors=10):
            from sklearn.neighbors import kneighbors_graph

            connectivity = kneighbors_graph(X, n_neighbors=n_neighbors,
                                            include_self=True)
            self.affinity_matrix_ = 0.5 * (connectivity + connectivity.T)
            self.labels_ = spectral_clustering_sb(
                self.affinity_matrix_, n_clusters=self.n_clusters)
            return self

except ImportError:  # pragma: no cover - sklearn is present in the image
    class Spec_Cluster:
        def __init__(self, *a, **k):
            raise ImportError("Spec_Cluster requires scikit-learn")


# ------------------------------------------------ unnormalized spectral

class Spec_Clust_unorm:
    """Spectral clustering with the unnormalized |M| Laplacian —
    reference-exact (``:708``). ``do_spec_clust`` stores ``labels_``.

    Example
    -------
    >>> import numpy as np
    >>> rng = np.random.default_rng(0)
    >>> a = rng.normal(size=(10, 8)) * 0.05 + np.eye(8)[0]  # speaker A
    >>> b = rng.normal(size=(10, 8)) * 0.05 + np.eye(8)[1]  # speaker B
    >>> clust = Spec_Clust_unorm(min_num_spkrs=2, max_num_spkrs=10)
    >>> clust.do_spec_clust(np.vstack([a, b]), k_oracle=2, p_val=0.3)
    >>> labels = clust.labels_
    >>> bool((labels[:10] == labels[0]).all()
    ...      and (labels[10:] == labels[10]).all()
    ...      and labels[0] != labels[10])
    True
    """

    def __init__(self, min_num_spkrs=2, max_num_spkrs=10):
        self.min_num_spkrs = min_num_spkrs
        self.max_num_spkrs = max_num_spkrs
        self.labels_ = None

    def do_spec_clust(self, X, k_oracle, p_val):
        """Affinity → prune → symmetrize → Laplacian → eigengap → k-means."""
        sim_mat = self.get_sim_mat(X)
        prunned_sim_mat = self.p_pruning(sim_mat, p_val)
        sym_prund_sim_mat = 0.5 * (prunned_sim_mat + prunned_sim_mat.T)
        laplacian = self.get_laplacian(sym_prund_sim_mat)
        emb, num_of_spk = self.get_spec_embs(laplacian, k_oracle)
        self.cluster_embs(emb, num_of_spk)

    def get_sim_mat(self, X):
        """Raw cosine similarity matrix (reference ``:813``)."""
        try:
            import sklearn.metrics.pairwise as skp

            return skp.cosine_similarity(X, X)
        except ImportError:
            X = np.asarray(X, dtype=np.float64)
            Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True),
                             1e-12, None)
            return Xn @ Xn.T

    def p_pruning(self, A, pval):
        """Zero the ``(1-pval)·n`` smallest entries of each row
        (reference ``:751``; mutates and returns ``A``)."""
        n_elems = int((1 - pval) * A.shape[0])
        for i in range(A.shape[0]):
            low_indexes = np.argsort(A[i, :])[:n_elems]
            A[i, low_indexes] = 0
        return A

    def get_laplacian(self, M):
        """Unnormalized Laplacian with |M| degrees, diag zeroed
        (reference ``:782``)."""
        M[np.diag_indices(M.shape[0])] = 0.0
        D = np.diag(np.sum(np.abs(M), axis=1))
        return D - M

    def get_spec_embs(self, L, k_oracle=4):
        """Eigenvectors + eigengap speaker-count estimate
        (reference ``:804``): gaps over ``lambdas[1:max_num_spkrs]``,
        argmax + 2, clamped below by ``min_num_spkrs``."""
        from scipy import linalg

        lambdas, eig_vecs = linalg.eigh(L)
        if k_oracle is not None:
            num_of_spk = k_oracle
        else:
            lambda_gap_list = self.getEigenGaps(
                lambdas[1: self.max_num_spkrs])
            num_of_spk = np.argmax(
                lambda_gap_list[: min(self.max_num_spkrs,
                                      len(lambda_gap_list))]) + 2
            num_of_spk = max(num_of_spk, self.min_num_spkrs)
        return eig_vecs[:, :num_of_spk], num_of_spk

    def cluster_embs(self, emb, k):
        """k-means labels into ``self.labels_`` (reference ``:927``)."""
        self.labels_ = _k_means_labels(emb, k)

    def getEigenGaps(self, eig_vals):
        """Adjacent eigenvalue differences (reference ``:946``)."""
        return [float(eig_vals[i + 1]) - float(eig_vals[i])
                for i in range(len(eig_vals) - 1)]


# ------------------------------------------------------- segment chain

def is_overlapped(end1, start2):
    """True when segment 2 starts before segment 1 ends (reference ``:139``)."""
    return start2 <= end1


def merge_ssegs_same_speaker(lol):
    """Merge adjacent same-speaker subsegments — reference-exact incl. its
    in-place end-time update and last-row handling (``:169``);
    rows: [rec_id, start, end, label]."""
    new_lol = []
    sseg = lol[0]
    flag = False
    for i in range(1, len(lol)):
        next_sseg = lol[i]
        if is_overlapped(sseg[2], next_sseg[1]) and sseg[3] == next_sseg[3]:
            sseg[2] = next_sseg[2]
            if i == len(lol) - 1:
                flag = True
                new_lol.append(sseg)
        else:
            new_lol.append(sseg)
            sseg = next_sseg
    if flag is False:
        new_lol.append(lol[-1])
    return new_lol


def distribute_overlap(lol):
    """Split the overlap between adjacent different-speaker segments at the
    midpoint — reference-exact duplicate-avoidance flow (``:222``)."""
    new_lol = []
    sseg = lol[0]
    next_sseg = sseg
    for i in range(1, len(lol)):
        next_sseg = lol[i]
        if is_overlapped(sseg[2], next_sseg[1]):
            overlap = sseg[2] - next_sseg[1]
            sseg[2] = sseg[2] - (overlap / 2.0)
            next_sseg[1] = next_sseg[1] + (overlap / 2.0)
            if len(new_lol) == 0 or new_lol[-1] != sseg:
                new_lol.append(sseg)
            sseg = next_sseg
        else:
            if len(new_lol) == 0 or new_lol[-1] != sseg:
                new_lol.append(sseg)
            sseg = next_sseg
    new_lol.append(next_sseg)
    return new_lol


def write_rttm(segs_list, out_rttm_file):
    """Write segments in NIST RTTM format — reference-exact field layout
    and 4-decimal rounding (``:301``)."""
    rec_id = segs_list[0][0]
    with open(out_rttm_file, "w") as f:
        for seg in segs_list:
            row = ["SPEAKER", rec_id, "0", str(round(seg[1], 4)),
                   str(round(seg[2] - seg[1], 4)), "<NA>", "<NA>",
                   str(seg[3]), "<NA>", "<NA>"]
            f.write(" ".join(row) + "\n")


def read_rttm(rttm_file_path):
    """Read an RTTM file as a list of lines (reference ``:54``)."""
    with open(rttm_file_path) as f:
        return [line.rstrip("\n") for line in f]


def write_ders_file(ref_rttm, DER, out_der_file):
    """Write per-recording DERs next to their ids (reference ``:76``)."""
    rttm = read_rttm(ref_rttm)
    spkr_info = list(filter(lambda x: x.startswith("SPKR-INFO"), rttm))
    rec_ids = []
    for line in spkr_info:
        rec_id = line.split()[1]
        if rec_id not in rec_ids:
            rec_ids.append(rec_id)
    with open(out_der_file, "w") as f:
        for i, rec_id in enumerate(rec_ids):
            if i < len(DER):
                f.write(f"{rec_id} {DER[i]:.4f}\n")
        f.write(f"OVERALL {DER[-1]:.4f}\n")


def prepare_subset_csv(full_diary_csv, rec_id, out_csv_file):
    """Write the rows of one recording into their own csv (reference ``:110``)."""
    with open(full_diary_csv) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    subset = [header] + [r for r in body if rec_id in r[0]]
    with open(out_csv_file, "w", newline="") as f:
        csv.writer(f).writerows(subset)


# ------------------------------------------------------ recipe entrypoints

def _labels_to_lol(diary_obj, labels, rec_id):
    """Reference label→segment conversion (``do_spec_clustering`` body):
    seg ids ``<rec>_<start>_<end>``, speaker ids ``<rec>_<label>``."""
    lol = []
    for i in range(len(labels)):
        spkr_id = rec_id + "_" + str(labels[i])
        splitted = str(diary_obj.segset[i]).rsplit("_", 2)
        lol.append([str(splitted[0]), float(splitted[1]), float(splitted[2]),
                    spkr_id])
    lol.sort(key=lambda x: float(x[1]))
    return lol


def _postprocess_and_write(lol, out_rttm_file):
    lol = merge_ssegs_same_speaker(lol)
    lol = distribute_overlap(lol)
    write_rttm(lol, out_rttm_file)


def do_spec_clustering(diary_obj, out_rttm_file, rec_id, k, pval,
                       affinity_type, n_neighbors=10):
    """Spectral diarization → RTTM (reference ``:973``): ``"cos"`` affinity
    runs ``Spec_Clust_unorm``; anything else the nearest-neighbors
    ``Spec_Cluster``. Returns the labels."""
    if affinity_type == "cos":
        clust_obj = Spec_Clust_unorm(min_num_spkrs=2, max_num_spkrs=10)
        clust_obj.do_spec_clust(diary_obj.stat1, k, pval)
        labels = clust_obj.labels_
    else:
        clust_obj = Spec_Cluster(n_clusters=k, assign_labels="kmeans",
                                 random_state=1234,
                                 affinity="nearest_neighbors")
        clust_obj.perform_sc(diary_obj.stat1, n_neighbors)
        labels = clust_obj.labels_
    lol = _labels_to_lol(diary_obj, labels, rec_id)
    _postprocess_and_write(lol, out_rttm_file)
    return labels


def do_kmeans_clustering(diary_obj, out_rttm_file, rec_id, k_oracle=4,
                         p_val=0.3):
    """K-means diarization → RTTM (reference ``:1042``); without an oracle
    count the eigengap estimate over the pruned cosine affinity is used."""
    if k_oracle is not None:
        num_of_spk = k_oracle
    else:
        clust_obj = Spec_Clust_unorm(min_num_spkrs=2, max_num_spkrs=10)
        sim_mat = clust_obj.get_sim_mat(diary_obj.stat1)
        prunned = clust_obj.p_pruning(sim_mat, p_val)
        laplacian = clust_obj.get_laplacian(0.5 * (prunned + prunned.T))
        _, num_of_spk = clust_obj.get_spec_embs(laplacian, None)
    labels = _k_means_labels(diary_obj.stat1, num_of_spk)
    lol = _labels_to_lol(diary_obj, labels, rec_id)
    _postprocess_and_write(lol, out_rttm_file)
    return labels


def do_AHC(diary_obj, out_rttm_file, rec_id, k_oracle=4, p_val=0.3):
    """Agglomerative diarization → RTTM (reference ``:1123``). The
    reference requests ward linkage with cosine affinity, which sklearn has
    always rejected at runtime (ward is euclidean-only; the ``affinity``
    kwarg is also gone since sklearn 1.4) — evident intent implemented:
    ward on the L2-normalized embeddings (reference ``norm_stat1``), where
    euclidean distance is monotone in cosine similarity."""
    from sklearn.cluster import AgglomerativeClustering

    diary_obj.norm_stat1()
    if k_oracle is not None:
        clustering = AgglomerativeClustering(
            n_clusters=k_oracle, linkage="ward").fit(diary_obj.stat1)
    else:
        clustering = AgglomerativeClustering(
            n_clusters=None, linkage="ward",
            distance_threshold=p_val).fit(diary_obj.stat1)
    labels = clustering.labels_
    lol = _labels_to_lol(diary_obj, labels, rec_id)
    _postprocess_and_write(lol, out_rttm_file)
    return labels
