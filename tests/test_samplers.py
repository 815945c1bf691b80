"""Sampler strategy tests (pattern: samplers_test.cpp)."""
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models import samplers


def _gather(kind, n_pix=64, spp=64):
    pts = []
    pix = jnp.arange(n_pix, dtype=jnp.uint32)
    for s in range(spp):
        u1, u2, _ = samplers.film_sample(kind, pix, jnp.full((n_pix,), s, jnp.uint32), spp)
        pts.append(np.stack([np.asarray(u1), np.asarray(u2)], -1))
    return np.stack(pts, 1)  # (n_pix, spp, 2)


def test_all_in_unit_square():
    for kind in ("independent", "stratified", "sobol"):
        p = _gather(kind, 8, 16)
        assert p.min() >= 0.0 and p.max() < 1.0, kind


def test_stratified_covers_strata():
    spp = 16
    p = _gather("stratified", 4, spp)
    # each pixel's samples: exactly one per 4x4 stratum
    for i in range(4):
        cells = (p[i, :, 0] * 4).astype(int) + 4 * (p[i, :, 1] * 4).astype(int)
        assert len(set(cells.tolist())) == spp, cells


def test_sobol_stratification_beats_independent():
    """(0,2)-sequence: the first 2^k samples of each pixel land one per
    2^k stratum — discrepancy far below independent sampling."""
    spp = 64
    ps = _gather("sobol", 16, spp)
    pi = _gather("independent", 16, spp)

    def max_cell_count(p, g):
        cells = (p[..., 0] * g).astype(int) + g * (p[..., 1] * g).astype(int)
        worst = 0
        for i in range(p.shape[0]):
            worst = max(worst, np.bincount(cells[i], minlength=g * g).max())
        return worst

    # 8x8 grid, 64 samples: perfect (0,2) gives exactly 1 per cell
    assert max_cell_count(ps, 8) == 1
    assert max_cell_count(pi, 8) >= 3  # independent clumps


def test_pixels_decorrelated():
    p = _gather("sobol", 32, 16)
    # per-pixel scrambling: different pixels get different point sets
    assert not np.allclose(p[0], p[1])
