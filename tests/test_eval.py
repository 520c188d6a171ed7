"""DTU metric and statistics tests against synthetic point sets."""

import numpy as np

from acmmp_tpu.eval.dtu import dtu_metrics, reduce_points
from acmmp_tpu.eval.stats import MetricTable, holm_correction, paired_tests

import pytest

pytestmark = pytest.mark.fast


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


def test_reduce_points_min_spacing_across_cells():
    """The official reducePts invariant: NO two kept points closer than
    dst — including first-per-cell survivors in adjacent grid cells
    (0.199 and 0.201 straddle the 0.2 cell boundary at distance 0.002)."""
    from scipy.spatial import cKDTree

    dst = 0.2
    pts = np.array([[0.199, 0, 0], [0.201, 0, 0], [0.15, 0, 0],
                    [0.9, 0, 0]], np.float64)
    out = reduce_points(pts, dst)
    assert len(cKDTree(out).query_pairs(dst)) == 0
    # greedy keeps the EARLIER of the conflicting pair
    assert [0.199, 0, 0] in out.tolist()
    assert [0.201, 0, 0] not in out.tolist()
    assert [0.9, 0, 0] in out.tolist()

    # randomized cloud: invariant holds and coverage is preserved (every
    # input point has a kept point within dst)
    rng = np.random.default_rng(0)
    cloud = rng.uniform(0, 1, size=(4000, 3))
    red = reduce_points(cloud, dst)
    assert len(cKDTree(red).query_pairs(dst)) == 0
    d, _ = cKDTree(red).query(cloud, k=1)
    # every input point is near a kept one: its cell representative is
    # within sqrt(3)*dst; if that rep was rejected, its (kept) rejector
    # adds at most dst more
    assert d.max() < dst * (np.sqrt(3) + 1.0) + 1e-12


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


def test_obsmask_masks_both_directions(tmp_path):
    """Toy SampleSet: a 3-voxel-observable volume + a table plane. Points
    outside the observable voxels must not count against accuracy; GT below
    the plane must not count against completeness (BaseEvalMain_web.m /
    PointCompareMain.m semantics)."""
    import os

    import numpy as np
    from scipy.io import savemat

    from acmmp_tpu.eval.dtu import dtu_metrics
    from acmmp_tpu.eval.obsmask import DtuObsMask

    mdir = tmp_path / "ObsMask"
    os.makedirs(mdir)
    mask = np.zeros((4, 4, 4), np.uint8)
    mask[1, 1, 1] = 1        # only voxel around (1, 1, 1) observable
    bb = np.array([[0.0, 0.0, 0.0], [4.0, 4.0, 4.0]])
    savemat(str(mdir / "ObsMask7_10.mat"),
            {"ObsMask": mask, "BB": bb, "Res": 1.0})
    savemat(str(mdir / "Plane7.mat"),
            {"P": np.array([0.0, 0.0, 1.0, -0.5])})  # keeps z > 0.5
    obs = DtuObsMask.load(str(tmp_path), 7)

    assert obs.accuracy_mask(np.array([[1.1, 0.9, 1.0]]))[0]
    assert not obs.accuracy_mask(np.array([[3.0, 3.0, 3.0]]))[0]
    assert not obs.accuracy_mask(np.array([[-9.0, 0.0, 0.0]]))[0]
    assert obs.completeness_mask(np.array([[0, 0, 1.0]]))[0]
    assert not obs.completeness_mask(np.array([[0, 0, 0.0]]))[0]

    gt = np.array([[1.0, 1.0, 1.0],      # observable, above plane
                   [0.0, 0.0, 0.1]])     # below plane: completeness-masked
    # recon: one good point at the observable voxel + one far outlier
    # OUTSIDE the observable volume -> outlier must not hurt accuracy
    recon = np.array([[1.0, 1.0, 1.05], [3.5, 3.5, 3.5]])
    m = dtu_metrics(recon, gt, dst=0.0, obs_mask=obs)
    assert m["acc_mean"] < 0.1, m["acc_mean"]
    # completeness counts only the above-plane GT point (distance 0.05)
    assert m["completeness_mean"] < 0.1, m["completeness_mean"]
    # unmasked for contrast: the outlier and the below-plane GT hurt
    m0 = dtu_metrics(recon, gt, dst=0.0)
    assert m0["acc_mean"] > m["acc_mean"]
    assert m0["completeness_mean"] > m["completeness_mean"]
