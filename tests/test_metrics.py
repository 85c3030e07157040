"""Metric tests: cal_metrics against independently-derived values."""

import numpy as np
from sklearn.metrics import roc_auc_score

from unidefense_tpu.utils.metrics import aggregate_video, cal_metrics, merge_video_dicts

RNG = np.random.default_rng(7)


def _fake_scores(n=200):
    y = RNG.integers(0, 2, n)
    # score = P(real): make reals score high usually
    score = np.clip(0.7 - 0.4 * y + 0.25 * RNG.standard_normal(n), 0, 1)
    return y, score


def test_auc_matches_sklearn():
    y, score = _fake_scores()
    m = cal_metrics(y, score, threshold=0.5)
    # pos_label=0 AUC == roc_auc_score on inverted labels
    ref = roc_auc_score(1 - y, score)
    assert abs(m["AUC"] - ref) < 1e-9


def test_threshold_modes():
    y, score = _fake_scores()
    m_fixed = cal_metrics(y, score, threshold=0.5)
    m_auto = cal_metrics(y, score, threshold="auto")
    m_best = cal_metrics(y, score, threshold="best")
    assert 0 <= m_fixed["ACER"] <= 1
    # EER threshold mode: APCER ~= BPCER at the EER point
    assert abs(m_auto["APCER"] - m_auto["BPCER"]) < 0.1
    assert m_best["ACER"] <= m_fixed["ACER"] + 1e-9
    assert m_best["ACER"] <= m_auto["ACER"] + 1e-9


def test_confusion_counts():
    y = np.array([0, 0, 1, 1])
    score = np.array([0.9, 0.8, 0.1, 0.6])  # last fake misclassified as real
    m = cal_metrics(y, score, threshold=0.5)
    assert m["NumP"] == 2 and m["NumN"] == 2
    assert m["ACC"] == 0.75
    assert m["APCER"] == 0.5 and m["BPCER"] == 0.0
    assert m["ACER"] == 0.25


def test_video_aggregation():
    paths = ["a/v1/f1.png", "a/v1/f2.png", "a/v2/f1.png"]
    probs = [0.8, 0.6, 0.3]
    tgts = [0, 0, 1]
    out = aggregate_video(paths, probs, tgts)
    assert sorted(out["video_prob"]) == [0.3, 0.7]
    assert sorted(out["video_tgt"]) == [0.0, 1.0]
    assert len(out["frame_prob"]) == 3


def test_merge_video_dicts():
    pd0 = {"v1": [0.8], "v2": [0.2]}
    td0 = {"v1": [0.0], "v2": [1.0]}
    pd1 = {"v1": [0.6], "v3": [0.4]}
    td1 = {"v1": [0.0], "v3": [1.0]}
    out = merge_video_dicts([pd0, pd1], [td0, td1])
    assert len(out["video_prob"]) == 3
    assert any(abs(p - 0.7) < 1e-9 for p in out["video_prob"])  # v1 mean-pooled
    assert len(out["frame_prob"]) == 4
