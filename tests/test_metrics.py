"""Retrieval metrics tests, including multi-sentence protocols."""

import jax.numpy as jnp
import numpy as np
import pytest

from neighborretr_tpu.train import metrics as M


def test_compute_metrics_hand_case():
    # ranks: row0 diag is best (rank 0), row1 rank 1, row2 rank 2
    sim = np.array([
        [9.0, 1.0, 0.0],
        [8.0, 5.0, 1.0],
        [7.0, 6.0, 2.0],
    ])
    m = M.compute_metrics(sim)
    assert m["cols"] == [0, 1, 2]
    assert m["R1"] == 100 / 3
    assert m["R5"] == 100.0
    assert m["MR"] == 2.0
    assert abs(m["MeanR"] - 2.0) < 1e-9


def test_device_ranks_match_reference(rng):
    sim = rng.normal(size=(20, 20)).astype(np.float32)
    ref = M.compute_metrics(sim)["cols"]
    dev = np.asarray(M.device_ranks(jnp.array(sim)))
    np.testing.assert_array_equal(sorted(ref), sorted(dev))
    m1 = M.metrics_from_ranks(dev)
    assert m1["R1"] == ref.count(0) * 100 / len(ref)


def test_multi_sentence_t2v_metrics():
    V, P = 3, 2
    sim = np.full((V, P, V), -np.inf)
    # video 0 has 2 captions; videos 1-2 have 1 caption each
    sim[0, 0] = [5.0, 1.0, 0.0]   # rank 0
    sim[0, 1] = [3.0, 4.0, 0.0]   # rank 1
    sim[1, 0] = [1.0, 6.0, 0.0]   # rank 0
    sim[2, 0] = [9.0, 8.0, 7.0]   # rank 2
    res = M.tensor_text_to_video_metrics(sim)
    # 4 valid captions: ranks 0,1,0,2 → R1 = 50%, R5 = 100%
    assert res["R1"] == 50.0
    assert res["R5"] == 100.0
    assert res["MedianR"] == 1.5


def test_video_to_text_sim_max_over_captions():
    V, P = 2, 2
    sim = np.full((V, P, V), np.nan)
    sim[0, 0] = [1.0, 2.0]
    sim[0, 1] = [3.0, 0.0]
    sim[1, 0] = [5.0, 4.0]
    out = M.tensor_video_to_text_sim(sim)
    # max over captions per (video_group, video): group0 → [3, 2]; group1 → [5, 4]
    np.testing.assert_allclose(out, np.array([[3.0, 5.0], [2.0, 4.0]]))


def test_best_tracker_monotone():
    tr = M.BestMetricsTracker()
    t2v = {"R1": 10.0, "R5": 1, "R10": 1, "MR": 1, "MeanR": 1}
    v2t = {"R1": 20.0, "R5": 1, "R10": 1, "MR": 1, "MeanR": 1}
    assert tr.update(t2v, v2t)
    assert tr.best_mean_r1 == 15.0
    worse = {"R1": 5.0, "R5": 1, "R10": 1, "MR": 1, "MeanR": 1}
    assert not tr.update(worse, worse)
    assert tr.best_t2v_r1 == 10.0 and tr.best_v2t_r1 == 20.0


def test_best_tracker_json_roundtrip():
    """Tracker persistence (loop.py best_metrics.json): a restored tracker
    rejects a worse eval, so a resumed run cannot clobber best.npz."""
    import json

    from neighborretr_tpu.train.metrics import BestMetricsTracker
    t = BestMetricsTracker()
    assert t.update({"R1": 44.0, "R5": 70.0}, {"R1": 42.0, "R5": 69.0})
    blob = json.dumps(t.to_dict())

    t2 = BestMetricsTracker()
    t2.load_dict(json.loads(blob))
    assert t2.best_mean_r1 == t.best_mean_r1
    # a worse eval after restore must NOT trigger a best-checkpoint save
    assert not t2.update({"R1": 41.0, "R5": 70.0}, {"R1": 40.0, "R5": 66.0})
    assert t2.update({"R1": 45.0, "R5": 71.0}, {"R1": 43.0, "R5": 70.0})


@pytest.mark.smoke
def test_device_ties_both_counts():
    # row 0: diagonal 5.0 ties column 2 -> t2v tie; row 1/2 tie-free.
    # column 1: diagonal 4.0 ties row 2 -> v2t tie.
    sim = np.array([
        [5.0, 1.0, 5.0],
        [0.0, 4.0, 1.0],
        [2.0, 4.0, 6.0],
    ], dtype=np.float32)
    t2v, v2t = M.device_ties_both(jnp.array(sim))
    assert int(t2v) == 1
    assert int(v2t) == 1
    # tie-free matrix reports zero in both directions
    t2v0, v2t0 = M.device_ties_both(jnp.array([[2.0, 1.0], [0.0, 3.0]]))
    assert int(t2v0) == 0 and int(v2t0) == 0


def test_device_multi_sentence_ties():
    V, P = 3, 2
    sim = np.full((V, P, V), -np.inf, dtype=np.float32)
    sim[0, 0] = [5.0, 5.0, 0.0]   # own score ties video 1
    sim[0, 1] = [3.0, 1.0, 0.0]   # tie-free
    sim[1, 0] = [1.0, 6.0, 0.0]
    sim[2, 0] = [9.0, 8.0, 7.0]
    # padded caption slots ([1,1], [2,1]) stay -inf and must not count even
    # though -inf == -inf across every video
    assert int(M.device_multi_sentence_ties(jnp.array(sim))) == 1


def test_device_video_to_text_ties():
    # v2t ranks come from max-over-captions transposed (device_video_to_text
    # _ranks); ties must be counted on that SAME matrix (ADVICE r3 #1 — the
    # multi-sentence eval branch used to hard-code v2t ties to 0).
    V, P = 3, 2
    sim = np.full((V, P, V), -np.inf, dtype=np.float32)
    # max-over-captions m[v, w] = best caption of video v against video w;
    # the ranked matrix is m.T.  Build one diagonal tie in m.T's row 1:
    # m.T[1] = m[:, 1] = [6.0, 6.0, 0.0] → diagonal 6.0 ties entry 0.
    sim[0, 0] = [5.0, 6.0, 0.0]
    sim[0, 1] = [3.0, 1.0, 0.0]
    sim[1, 0] = [1.0, 6.0, 0.0]
    sim[2, 0] = [9.0, 0.0, 7.0]
    assert int(M.device_video_to_text_ties(jnp.array(sim))) == 1
    # tie-free tensor counts zero
    sim[0, 0] = [5.0, 4.0, 0.0]
    assert int(M.device_video_to_text_ties(jnp.array(sim))) == 0


def test_log_tie_counts_one_line(caplog):
    import logging
    logger = logging.getLogger("test_tie_counts")
    with caplog.at_level(logging.INFO, logger="test_tie_counts"):
        M.log_tie_counts(logger, 0, 0)      # silent when tie-free
        assert caplog.records == []
        M.log_tie_counts(logger, 2, 1)
        assert len(caplog.records) == 1
        assert "2 t2v" in caplog.records[0].getMessage()
    M.log_tie_counts(None, 3, 3)            # no logger -> no crash
