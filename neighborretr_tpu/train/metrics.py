"""Retrieval metrics: R@K, Median/Mean rank, multi-sentence protocols.

Rebuilds utils/metrics.py:38-145 of the reference, including its exact
tie-handling (`np.where(sorted - diag == 0)` can emit multiple rank entries
per row when scores tie — faithful for parity).  A fast on-device rank path
(`device_ranks`, strictly-greater counting) is provided for the TPU eval
harness; for continuous float similarities the two agree.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def compute_metrics(similarity: np.ndarray) -> Dict[str, float]:
    """Rank-of-diagonal metrics on an [N, N] similarity matrix (rows = queries)."""
    sx = np.sort(-similarity, axis=1)
    d = np.diag(-similarity)[:, np.newaxis]
    ind = np.where(sx - d == 0)[1]

    metrics: Dict[str, float] = {}
    metrics["R1"] = float(np.sum(ind == 0)) * 100 / len(ind)
    metrics["R5"] = float(np.sum(ind < 5)) * 100 / len(ind)
    metrics["R10"] = float(np.sum(ind < 10)) * 100 / len(ind)
    metrics["R50"] = float(np.sum(ind < 50)) * 100 / len(ind)
    metrics["MR"] = float(np.median(ind)) + 1
    metrics["MedianR"] = metrics["MR"]
    metrics["MeanR"] = float(np.mean(ind)) + 1
    metrics["cols"] = [int(i) for i in list(ind)]
    return metrics


def device_ranks(similarity: jnp.ndarray) -> jnp.ndarray:
    """On-device diagonal ranks (0-based): count of strictly-greater entries
    per row.  Equal to the reference ranks in the absence of ties."""
    diag = jnp.diagonal(similarity)[:, None]
    return jnp.sum(similarity > diag, axis=1)


@jax.jit
def device_ranks_both(similarity: jnp.ndarray):
    """Both-direction diagonal ranks in ONE compiled dispatch (t2v rows,
    v2t columns) — a single kernel over the matrix, two [N] int vectors out.
    One dispatch matters on remote-device transports where each eager jnp
    op pays a round trip."""
    diag = jnp.diagonal(similarity)
    t2v = jnp.sum(similarity > diag[:, None], axis=1)
    v2t = jnp.sum(similarity > diag[None, :], axis=0)
    return t2v, v2t


@jax.jit
def device_ties_both(similarity: jnp.ndarray):
    """Rows whose diagonal score ties at least one other entry, both
    directions.  Where ties exist the strict-greater device rank can differ
    from the reference's host compute_metrics (which may emit multiple rank
    entries per tied row, utils/metrics.py:57-66 — kept for parity, see
    PARITY.md); eval logs these counts so the two are self-explaining."""
    diag = jnp.diagonal(similarity)
    t2v = jnp.sum(jnp.sum(similarity == diag[:, None], axis=1) > 1)
    v2t = jnp.sum(jnp.sum(similarity == diag[None, :], axis=0) > 1)
    return t2v, v2t


@jax.jit
def device_multi_sentence_ties(sim_3d: jnp.ndarray) -> jnp.ndarray:
    """Tie count for the [V, max_caps, V] caption-grouped tensor: valid
    caption rows whose own-video score ties another video's score."""
    V = sim_3d.shape[0]
    own = jnp.take_along_axis(
        sim_3d, jnp.arange(V, dtype=jnp.int32)[:, None, None], axis=2)
    tied = jnp.sum(sim_3d == own, axis=-1) > 1
    return jnp.sum(tied & jnp.isfinite(own[..., 0]))


@jax.jit
def device_video_to_text_ties(sim_3d: jnp.ndarray) -> jnp.ndarray:
    """v2t tie count for the caption-grouped tensor: rows of the SAME
    max-over-captions matrix device_video_to_text_ranks ranks whose
    diagonal ties another entry (strict-greater rank undercounts exactly
    these rows vs the reference's host path)."""
    m = jnp.max(sim_3d, axis=1).T
    diag = jnp.diagonal(m)
    return jnp.sum(jnp.sum(m == diag[:, None], axis=1) > 1)


def log_tie_counts(logger, ties_t2v: int, ties_v2t: int) -> None:
    """One observability line, only when ties exist (bf16 similarities tie
    ~0.2% of rows in practice): explains any device-rank vs reference-rank
    metric delta before a user has to diff the two implementations."""
    ties_t2v, ties_v2t = int(ties_t2v), int(ties_v2t)
    if logger is not None and (ties_t2v or ties_v2t):
        logger.info(
            "Eval score ties at the diagonal: %d t2v row(s), %d v2t row(s) — "
            "device strict ranks may differ from the reference's host "
            "compute_metrics on exactly these rows (PARITY.md tie semantics)",
            ties_t2v, ties_v2t)


@jax.jit
def device_multi_sentence_ranks(sim_3d: jnp.ndarray):
    """On-device t2v ranks for the [V, max_caps, V] caption-grouped tensor.

    Rank of caption (v, c) = count of videos scored strictly above its own
    video (equal to the reference's double-argsort diagonal, metrics.py:99-110,
    for continuous scores).  Returns (ranks [V, C], valid [V, C]) — padded
    caption slots carry a -inf diagonal and are masked out, mirroring the
    reference's isinf/isnan filter (metrics.py:112-116)."""
    V = sim_3d.shape[0]
    own = jnp.take_along_axis(
        sim_3d, jnp.arange(V, dtype=jnp.int32)[:, None, None], axis=2)
    ranks = jnp.sum(sim_3d > own, axis=-1)
    valid = jnp.isfinite(own[..., 0])
    return ranks, valid


@jax.jit
def device_video_to_text_ranks(sim_3d: jnp.ndarray) -> jnp.ndarray:
    """On-device v2t ranks: max-over-captions matrix transposed, then
    rank-of-diagonal (metrics.py:125-145 + compute_metrics)."""
    return device_ranks(jnp.max(sim_3d, axis=1).T)


def metrics_from_ranks(ranks: np.ndarray) -> Dict[str, float]:
    ranks = np.asarray(ranks)
    return {
        "R1": float(np.sum(ranks == 0)) * 100 / len(ranks),
        "R5": float(np.sum(ranks < 5)) * 100 / len(ranks),
        "R10": float(np.sum(ranks < 10)) * 100 / len(ranks),
        "R50": float(np.sum(ranks < 50)) * 100 / len(ranks),
        "MR": float(np.median(ranks)) + 1,
        "MedianR": float(np.median(ranks)) + 1,
        "MeanR": float(np.mean(ranks)) + 1,
    }


def tensor_text_to_video_metrics(
    sim_tensor: np.ndarray,
    top_k: Sequence[int] = (1, 5, 10, 50),
) -> Dict[str, float]:
    """Multi-sentence t2v metrics on [n_videos, max_caps_per_video, n_videos]
    (metrics.py:81-123: double argsort, -inf/nan entries filtered)."""
    sim = np.asarray(sim_tensor, dtype=np.float64)
    stacked = np.transpose(sim, (1, 0, 2))          # [P, V, V]
    first = np.argsort(-stacked, axis=-1, kind="stable")
    second = np.argsort(first, axis=-1, kind="stable")
    ranks = np.diagonal(second, axis1=1, axis2=2).flatten()  # diag over (V, V)

    original = np.diagonal(sim, axis1=0, axis2=2).flatten()
    valid = ~(np.isinf(original) | np.isnan(original))
    ranks = ranks[valid].astype(np.float64)

    results = {f"R{k}": float(np.sum(ranks < k) * 100 / len(ranks)) for k in top_k}
    results["MedianR"] = float(np.median(ranks + 1))
    results["MeanR"] = float(np.mean(ranks + 1))
    results["Std_Rank"] = float(np.std(ranks + 1))
    results["MR"] = results["MedianR"]
    return results


def tensor_video_to_text_sim(sim_tensor: np.ndarray) -> np.ndarray:
    """[V, P, V] (videos, captions-per-video, videos) → [V, V] max-over-
    captions matrix (metrics.py:125-145); axis 1 is the caption axis."""
    sim = np.asarray(sim_tensor, dtype=np.float64).copy()
    sim[np.isnan(sim)] = -np.inf
    return np.max(sim, axis=1).T


class BestMetricsTracker:
    """Per-direction monotone-max R@1 tracking (metrics.py:169-206)."""

    def __init__(self) -> None:
        self.best_mean_r1 = 1e-5
        self.best_t2v_r1 = 1e-5
        self.best_v2t_r1 = 1e-5
        self.best_t2v_metrics: Union[Dict[str, float], None] = None
        self.best_v2t_metrics: Union[Dict[str, float], None] = None

    def update(self, t2v: Dict[str, float], v2t: Dict[str, float]) -> bool:
        """Returns True when the mean R@1 improved (checkpoint trigger)."""
        improved = False
        mean_r1 = (t2v["R1"] + v2t["R1"]) / 2
        if mean_r1 > self.best_mean_r1:
            self.best_mean_r1 = mean_r1
            improved = True
        if t2v["R1"] > self.best_t2v_r1:
            self.best_t2v_r1 = t2v["R1"]
            self.best_t2v_metrics = dict(t2v)
        if v2t["R1"] > self.best_v2t_r1:
            self.best_v2t_r1 = v2t["R1"]
            self.best_v2t_metrics = dict(v2t)
        return improved

    # --- persistence (JSON round-trip so a resumed run cannot clobber
    # best.npz with params worse than the pre-preemption best) ---

    def to_dict(self) -> Dict:
        return {"best_mean_r1": self.best_mean_r1,
                "best_t2v_r1": self.best_t2v_r1,
                "best_v2t_r1": self.best_v2t_r1,
                "best_t2v_metrics": self.best_t2v_metrics,
                "best_v2t_metrics": self.best_v2t_metrics}

    def load_dict(self, d: Dict) -> None:
        self.best_mean_r1 = d.get("best_mean_r1", self.best_mean_r1)
        self.best_t2v_r1 = d.get("best_t2v_r1", self.best_t2v_r1)
        self.best_v2t_r1 = d.get("best_v2t_r1", self.best_v2t_r1)
        self.best_t2v_metrics = d.get("best_t2v_metrics")
        self.best_v2t_metrics = d.get("best_v2t_metrics")


def format_metrics(metrics: Dict[str, float], prefix: str = "") -> str:
    return (f"{prefix}R@1: {metrics['R1']:.1f} - R@5: {metrics['R5']:.1f} - "
            f"R@10: {metrics['R10']:.1f} - R@50: {metrics.get('R50', 0.0):.1f} - "
            f"Median R: {metrics['MR']:.1f} - Mean R: {metrics['MeanR']:.1f}")
