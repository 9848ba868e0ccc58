"""Speaker diarization clustering (analogue of reference
``speechbrain/processing/diarization.py``): cosine affinity, spectral
embedding with eigengap speaker-count estimation, and k-means/agglomerative
assignment. Host-side numpy over device-extracted embeddings."""
from __future__ import annotations

import numpy as np


def get_oracle_num_spkrs(rec_id, spkr_info):
    """Oracle speaker count from RTTM speaker info (reference ``:42``).

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
    emb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    sim = emb @ emb.T
    return (sim + 1.0) / 2.0  # map to [0, 1]


def p_pruning(A, pval=0.3):
    """Keep top-p affinities per row (reference ``:612``)."""
    n = A.shape[0]
    keep = max(int(round(pval * n)), 1)
    out = np.zeros_like(A)
    for i in range(n):
        idx = np.argsort(-A[i])[:keep]
        out[i, idx] = A[i, idx]
    return (out + out.T) / 2


def get_laplacian(M):
    """Unnormalized graph Laplacian (reference ``:650``)."""
    M = M.copy()
    np.fill_diagonal(M, 0.0)
    D = np.diag(M.sum(axis=1))
    return D - M


def get_spec_embs(L, k_oracle=None, max_num_spkrs=10):
    """Eigenvectors of the Laplacian + eigengap speaker count
    (reference ``:668``)."""
    evals, evecs = np.linalg.eigh(L)
    if k_oracle is not None:
        k = k_oracle
    else:
        gaps = np.diff(evals[: max_num_spkrs + 1])
        k = int(np.argmax(gaps[1:])) + 2 if len(gaps) > 1 else 1
        k = max(1, min(k, max_num_spkrs))
    return evecs[:, :k], k


def _kmeans(x, k, n_iter=50, seed=0):
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


def do_spec_clustering(emb, k_oracle=None, pval=0.3, max_num_spkrs=10):
    """Full spectral-clustering pipeline embeddings → labels
    (reference ``Spec_Cluster.do_spec_clust``).

    Example
    -------
    >>> import numpy as np
    >>> rng = np.random.default_rng(0)
    >>> a = rng.normal(size=(10, 8)) * 0.05 + np.eye(8)[0]  # speaker A
    >>> b = rng.normal(size=(10, 8)) * 0.05 + np.eye(8)[1]  # speaker B
    >>> labels, k = do_spec_clustering(np.vstack([a, b]), k_oracle=2)
    >>> k
    2
    >>> bool((labels[:10] == labels[0]).all()
    ...      and (labels[10:] == labels[10]).all()
    ...      and labels[0] != labels[10])
    True
    """
    sim = cosine_affinity(np.asarray(emb))
    pruned = p_pruning(sim, pval)
    lap = get_laplacian(pruned)
    embs, k = get_spec_embs(lap, k_oracle, max_num_spkrs)
    return _kmeans(embs, k), k


def do_AHC(emb, k=2):
    """Agglomerative hierarchical clustering with average linkage
    (reference ``Agg_Hier_Clustering``)."""
    emb = np.asarray(emb, dtype=np.float64)
    clusters = [[i] for i in range(len(emb))]
    sims = cosine_affinity(emb)
    while len(clusters) > k:
        best = (-np.inf, None, None)
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                s = np.mean([sims[i, j] for i in clusters[a] for j in clusters[b]])
                if s > best[0]:
                    best = (s, a, b)
        _, a, b = best
        clusters[a].extend(clusters[b])
        clusters.pop(b)
    labels = np.zeros(len(emb), dtype=int)
    for ci, cluster in enumerate(clusters):
        for i in cluster:
            labels[i] = ci
    return labels


def merge_ssegs_same_speaker(lol):
    """Merge adjacent same-speaker subsegments (reference ``:167``);
    lol rows: [rec_id, start, end, label]."""
    if not lol:
        return []
    new_lol = [list(lol[0])]
    for seg in lol[1:]:
        prev = new_lol[-1]
        if seg[3] == prev[3] and seg[1] <= prev[2]:
            prev[2] = max(prev[2], seg[2])
        else:
            new_lol.append(list(seg))
    return new_lol


def write_rttm(segs_list, out_rttm_file):
    """Write diarization output in RTTM format (reference ``:292``)."""
    with open(out_rttm_file, "w") as f:
        for seg in segs_list:
            rec_id, start, end, label = seg[:4]
            f.write(f"SPEAKER {rec_id} 0 {start:.3f} {end - start:.3f} "
                    f"<NA> <NA> {label} <NA> <NA>\n")


# ------------------------------------------------------------------ public
# reference-named API (``processing/diarization.py``)

def is_overlapped(end1, start2):
    """True when segment 2 starts before segment 1 ends
    (reference ``diarization.py:78``)."""
    return start2 <= end1


def distribute_overlap(lol):
    """Split the overlap between adjacent segments at the midpoint
    (reference ``diarization.py:107``); rows [rec_id, start, end, label]."""
    if not lol:
        return []
    new_lol = [list(lol[0])]
    for seg in lol[1:]:
        seg = list(seg)
        prev = new_lol[-1]
        if is_overlapped(prev[2], seg[1]):
            overlap = prev[2] - seg[1]
            prev[2] -= overlap / 2.0
            seg[1] = prev[2]
        new_lol.append(seg)
    return new_lol


def read_rttm(rttm_file_path):
    """Read an RTTM file as a list of lines (reference
    ``diarization.py:201``)."""
    with open(rttm_file_path) as f:
        return [line.rstrip("\n") for line in f]


def write_ders_file(ref_rttm, DER, out_der_file):
    """Write per-recording DERs next to their ids
    (reference ``diarization.py:254``)."""
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
    """Write the rows of one recording into their own csv
    (reference ``diarization.py:282``)."""
    import csv

    with open(full_diary_csv) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    subset = [header] + [r for r in body if rec_id in r[0]]
    with open(out_csv_file, "w", newline="") as f:
        csv.writer(f).writerows(subset)


def do_kmeans_clustering(diary_obj, out_rttm_file, rec_id, k_oracle=4,
                         p_val=0.3):
    """K-means over embeddings → RTTM (reference ``diarization.py:500``);
    ``diary_obj`` needs ``.stat1`` embeddings and ``.segset`` segment ids."""
    labels = _kmeans(np.asarray(diary_obj.stat1), k_oracle)
    lol = _labels_to_lol(diary_obj, labels, rec_id)
    lol = merge_ssegs_same_speaker(distribute_overlap(lol))
    write_rttm(lol, out_rttm_file)
    return labels


def _labels_to_lol(diary_obj, labels, rec_id):
    lol = []
    for i, seg_id in enumerate(diary_obj.segset):
        parts = str(seg_id).rsplit("_", 2)
        start, end = float(parts[-2]) / 100.0, float(parts[-1]) / 100.0
        lol.append([rec_id, start, end, int(labels[i])])
    lol.sort(key=lambda x: x[1])
    return lol


def spectral_embedding_sb(adjacency, n_components=8):
    """Laplacian eigenmap embedding of an affinity matrix
    (reference ``diarization.py:720``)."""
    lap = get_laplacian(np.asarray(adjacency, dtype=np.float64))
    vals, vecs = np.linalg.eigh(lap)
    return vecs[:, :n_components]


def spectral_clustering_sb(affinity, n_clusters=8, n_components=None):
    """Spectral embedding + k-means labels (reference
    ``diarization.py:780``)."""
    n_components = n_components or n_clusters
    embs = spectral_embedding_sb(affinity, n_components)
    return _kmeans(embs, n_clusters)


class Spec_Cluster:
    """Spectral clustering front (reference ``diarization.py:846``):
    ``perform_sc(X)`` computes the cosine affinity, prunes it and stores
    ``labels_``."""

    def __init__(self, n_clusters=None, pval=0.3, max_num_spkrs=10):
        self.n_clusters = n_clusters
        self.pval = pval
        self.max_num_spkrs = max_num_spkrs
        self.labels_ = None

    def perform_sc(self, X, n_neighbors=10):
        del n_neighbors
        labels, k = do_spec_clustering(X, k_oracle=self.n_clusters,
                                       pval=self.pval,
                                       max_num_spkrs=self.max_num_spkrs)
        self.labels_ = labels
        return self


class Spec_Clust_unorm(Spec_Cluster):
    """Unnormalized-Laplacian variant with eigengap speaker-count estimation
    (reference ``diarization.py:898``); our pipeline's ``get_spec_embs``
    already estimates k by eigengap when no oracle count is given."""

    def do_spec_clust(self, X, k_oracle, p_val):
        self.n_clusters = k_oracle
        self.pval = p_val
        return self.perform_sc(X)
