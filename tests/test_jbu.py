"""JBU ops against a scalar transliteration of the reference kernels
(JBU_cu, src/ACMMP.cu:1458-1516; upscale_normal, :548-607)."""

import numpy as np
import jax.numpy as jnp

from acmmp_tpu.config import PatchMatchParams
from acmmp_tpu.ops.jbu import jbu_depth, jbu_normal_cost

PARAMS = PatchMatchParams()


def _oracle_jbu_pixel(fine, coarse, px, py, params):
    """Scalar JBU_cu transliteration for one fine pixel."""
    H, W = fine.shape
    Hc, Wc = coarse.shape
    imagescale = max(H // Hc, W // Wc)
    num_neighbors = (imagescale * imagescale + 1) // 2
    scale = Wc / W
    o_y, o_x = py * scale, px * scale
    ref_pix = fine[py, px]
    total = 0.0
    norm = 0.0
    for j in range(-num_neighbors, num_neighbors + 1):
        r_y = min(max(int(o_y) + j, 0), Hc - 1)
        r_ys = min(max(py + j, 0), H - 1)
        for i in range(-num_neighbors, num_neighbors + 1):
            r_x = min(max(int(o_x) + i, 0), Wc - 1)
            r_xs = min(max(px + i, 0), W - 1)
            src = coarse[r_y, r_x]
            neigh = fine[r_ys, r_xs]
            sg = np.exp(-((o_x - r_x) ** 2 + (o_y - r_y) ** 2)
                        / (2 * params.jbu_sigma_d ** 2))
            rg = np.exp(-abs(ref_pix - neigh) ** 2
                        / (2 * params.jbu_sigma_r ** 2))
            w = sg * rg
            norm += w
            total += src * w
    return total / norm


def _fixtures(scale=2, Hc=12, Wc=16, seed=0):
    rng = np.random.default_rng(seed)
    H, W = Hc * scale, Wc * scale
    fine = rng.uniform(0, 255, (H, W)).astype(np.float32)
    coarse = rng.uniform(2.0, 8.0, (Hc, Wc)).astype(np.float32)
    return fine, coarse


def test_jbu_depth_matches_scalar_oracle():
    fine, coarse = _fixtures()
    up = np.asarray(jbu_depth(jnp.asarray(fine), jnp.asarray(coarse), PARAMS))
    for (px, py) in [(0, 0), (7, 5), (31, 23), (16, 11)]:
        want = _oracle_jbu_pixel(fine, coarse, px, py, PARAMS)
        assert abs(up[py, px] - want) < 1e-4, (px, py, up[py, px], want)


def test_jbu_depth_window_scales_with_imagescale():
    # Imagescale 4 -> num_neighbors (16+1)//2 = 8: much wider support than
    # Imagescale 2's 2 (ACMMP.cu:1472-1476)
    fine, coarse = _fixtures(scale=4, Hc=8, Wc=8)
    up = np.asarray(jbu_depth(jnp.asarray(fine), jnp.asarray(coarse), PARAMS))
    for (px, py) in [(3, 3), (17, 9)]:
        want = _oracle_jbu_pixel(fine, coarse, px, py, PARAMS)
        assert abs(up[py, px] - want) < 1e-4, (px, py)


def test_jbu_normal_cost_matches_oracle():
    """Fused hierarchy-init upscale: same weights; normals averaged then
    re-normalized, costs averaged (upscale_normal, ACMMP.cu:548-607)."""
    rng = np.random.default_rng(1)
    Hc, Wc, s = 10, 12, 2
    H, W = Hc * s, Wc * s
    fine = rng.uniform(0, 255, (H, W)).astype(np.float32)
    nrm = rng.normal(size=(Hc, Wc, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    cost = rng.uniform(0, 2, (Hc, Wc)).astype(np.float32)
    normal_up, cost_up = jbu_normal_cost(
        jnp.asarray(fine), jnp.asarray(nrm), jnp.asarray(cost), PARAMS)
    normal_up, cost_up = np.asarray(normal_up), np.asarray(cost_up)
    assert np.allclose(np.linalg.norm(normal_up, axis=-1), 1.0, atol=1e-5)

    params = PARAMS
    imagescale = max(H // Hc, W // Wc)
    nn = (imagescale * imagescale + 1) // 2
    scale = Wc / W
    for (px, py) in [(5, 7), (20, 15)]:
        o_y, o_x = py * scale, px * scale
        ref_pix = fine[py, px]
        n_tot = np.zeros(3)
        c_tot = 0.0
        norm = 0.0
        for j in range(-nn, nn + 1):
            r_y = min(max(int(o_y) + j, 0), Hc - 1)
            r_ys = min(max(py + j, 0), H - 1)
            for i in range(-nn, nn + 1):
                r_x = min(max(int(o_x) + i, 0), Wc - 1)
                r_xs = min(max(px + i, 0), W - 1)
                sg = np.exp(-((o_x - r_x) ** 2 + (o_y - r_y) ** 2)
                            / (2 * params.jbu_sigma_d ** 2))
                rg = np.exp(-abs(ref_pix - fine[r_ys, r_xs]) ** 2
                            / (2 * params.jbu_sigma_r ** 2))
                w = sg * rg
                norm += w
                c_tot += cost[r_y, r_x] * w
                n_tot += nrm[r_y, r_x] * w
        n_want = n_tot / norm
        n_want /= np.linalg.norm(n_want)
        assert abs(cost_up[py, px] - c_tot / norm) < 1e-4
        assert np.allclose(normal_up[py, px], n_want, atol=1e-4)
