"""Speaker diarization clustering (analogue of reference
``speechbrain/processing/diarization.py``): cosine affinity, spectral
embedding with eigengap speaker-count estimation, and k-means/agglomerative
assignment. Host-side numpy over device-extracted embeddings."""
from __future__ import annotations

import numpy as np


def get_oracle_num_spkrs(rec_id, spkr_info):
    """Oracle speaker count from RTTM speaker info (reference ``:42``)."""
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
    (reference ``Spec_Cluster.do_spec_clust``)."""
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
