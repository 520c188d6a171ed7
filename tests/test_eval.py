"""DTU metric and statistics tests against synthetic point sets."""

import numpy as np

from acmmp_tpu.eval.dtu import dtu_metrics, reduce_points
from acmmp_tpu.eval.stats import MetricTable, holm_correction, paired_tests


def test_perfect_reconstruction():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0, 100, size=(5000, 3))
    m = dtu_metrics(gt.copy(), gt, dst=0.0)
    assert m["acc_mean"] < 1e-9
    assert m["completeness_mean"] < 1e-9
    assert m["acc05"] == 1.0 and m["cmp05"] == 1.0


def test_noisy_reconstruction_metrics():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 50, size=(4000, 3))
    recon = gt + rng.normal(0, 0.3, size=gt.shape)
    m = dtu_metrics(recon, gt, dst=0.0)
    assert 0.1 < m["acc_mean"] < 1.0
    assert m["acc2"] > 0.95
    # half the points missing -> completeness degrades, accuracy does not
    m2 = dtu_metrics(recon[:2000], gt, dst=0.0)
    assert m2["completeness_mean"] > m["completeness_mean"]
    assert abs(m2["acc_mean"] - m["acc_mean"]) < 0.1


def test_reduce_points_spacing():
    pts = np.array([[0, 0, 0], [0.05, 0, 0], [1.0, 0, 0]], np.float64)
    out = reduce_points(pts, 0.2)
    assert len(out) == 2


def test_holm_correction_monotone():
    p = [0.01, 0.04, 0.03, 0.5]
    adj = holm_correction(p)
    assert np.all(adj >= np.asarray(p) - 1e-12)
    assert adj.max() <= 1.0


def test_paired_tests():
    rng = np.random.default_rng(2)
    table = MetricTable()
    for scan in range(8):
        base = {k: v for k, v in zip(
            ("acc05", "acc2", "acc5", "acc10", "cmp05", "cmp2", "cmp5",
             "cmp10", "acc_mean", "acc_median", "completeness_mean",
             "completeness_median"),
            rng.uniform(0, 1, 12))}
        better = dict(base)
        better["acc_mean"] = base["acc_mean"] - 0.5  # consistently better
        table.add("base", f"scan{scan}", 5, base)
        table.add("better", f"scan{scan}", 5, better)
    res = paired_tests(table, "acc_mean")
    assert len(res) == 1
    a, b, diff, p = res[0]
    assert {a, b} == {"base", "better"}
    assert abs(abs(diff) - 0.5) < 1e-9
    assert p < 0.01
