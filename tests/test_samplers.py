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


def test_new_kinds_in_unit_square():
    for kind in ("paddedsobol", "zsobol", "pmj02bn", "halton"):
        p = _gather(kind, 8, 16)
        assert p.min() >= 0.0 and p.max() < 1.0, kind


def test_halton_base3_stratification():
    """First 9 base-3 samples of dim 2 land one per 1/9 stratum."""
    p = _gather("halton", 8, 9)
    for i in range(8):
        cells = (p[i, :, 1] * 9).astype(int)
        assert len(set(cells.tolist())) == 9, cells


def test_zsobol_stratified_per_pixel():
    """The index permutation preserves (0,2) stratification within a pixel:
    the spp samples of one pixel cover every stratum exactly once."""
    spp = 16
    pix = jnp.asarray(np.stack([np.arange(16) % 4, np.arange(16) // 4], -1),
                      jnp.int32)
    pts = []
    for s in range(spp):
        u1, u2, _ = samplers.film_sample(
            "zsobol", jnp.arange(16, dtype=jnp.uint32),
            jnp.full((16,), s, jnp.uint32), spp, pix=pix)
        pts.append(np.stack([np.asarray(u1), np.asarray(u2)], -1))
    p = np.stack(pts, 1)
    for i in range(16):
        cells = (p[i, :, 0] * 4).astype(int) + 4 * (p[i, :, 1] * 4).astype(int)
        assert len(set(cells.tolist())) == spp, (i, sorted(cells.tolist()))


def test_paddedsobol_permutes_within_pixel():
    """Each pixel's spp samples are a permutation of indices [0, spp) —
    the same point SET as plain sobol with that scramble, shuffled."""
    spp = 16
    pix = jnp.arange(4, dtype=jnp.uint32)
    seen = [set() for _ in range(4)]
    for s in range(spp):
        u1, u2, _ = samplers.film_sample(
            "paddedsobol", pix, jnp.full((4,), s, jnp.uint32), spp)
        for i in range(4):
            seen[i].add((round(float(u1[i]), 6), round(float(u2[i]), 6)))
    for i in range(4):
        assert len(seen[i]) == spp  # no index collisions: a true permutation


# ---------------------------------------------------------------------------
# Path-interior dimensions (VERDICT r1 #30; samplers.h Get1D over all dims)
# ---------------------------------------------------------------------------

def test_path_dim_sample_stratified_every_dim():
    """Scrambled radical inverse in prime bases: the first b^k samples of
    any dim land in distinct 1/b^k bins (digit scrambles preserve
    elementary intervals)."""
    pix = jnp.zeros((16,), jnp.uint32)
    idx = jnp.arange(16, dtype=jnp.uint32)
    for dim, base, k in [(0, 2, 4), (1, 3, 2), (2, 5, 1), (3, 7, 1)]:
        n = base ** k
        u = np.asarray(samplers.path_dim_sample(
            "halton", pix[:n], idx[:n], 16, dim))
        bins = (u * n).astype(int)
        assert len(set(bins.tolist())) == n, (dim, sorted(bins.tolist()))


def test_path_dim_decorrelated_across_pixels_and_dims():
    idx = jnp.arange(64, dtype=jnp.uint32)
    a = np.asarray(samplers.path_dim_sample(
        "halton", jnp.zeros((64,), jnp.uint32), idx, 64, 0))
    b = np.asarray(samplers.path_dim_sample(
        "halton", jnp.full((64,), 9, jnp.uint32), idx, 64, 0))
    c = np.asarray(samplers.path_dim_sample(
        "halton", jnp.zeros((64,), jnp.uint32), idx, 64, 5))
    assert not np.allclose(a, b)
    assert not np.allclose(a, c)


def test_path_sampler_source_variance_reduction():
    """PathSampler integrates a smooth integrand with much lower error
    than white noise at the same spp (the point of stratifying interior
    dims)."""
    spp = 64
    pix = jnp.zeros((spp,), jnp.uint32)
    idx = jnp.arange(spp, dtype=jnp.uint32)
    src = samplers.PathSampler("halton", pix, idx, spp, seed=3)
    err_ld, err_wn = [], []
    rng = None
    from acceleratedvolrenderer_tpu.ops import dda
    rng = dda.seed_stream(pix, idx, salt=11)
    for dim in range(6):
        u = src.next()
        err_ld.append(abs(float(jnp.mean(u)) - 0.5))
        rng, uw = dda.pcg_uniform(rng)
        err_wn.append(abs(float(jnp.mean(uw)) - 0.5))
    assert np.mean(err_ld) < 0.5 * np.mean(err_wn), (err_ld, err_wn)


def test_path_sampler_falls_back_to_pcg_after_max_dims():
    spp = 4
    pix = jnp.zeros((4,), jnp.uint32)
    idx = jnp.arange(4, dtype=jnp.uint32)
    src = samplers.PathSampler("halton", pix, idx, spp, max_dims=2)
    for _ in range(5):
        u = np.asarray(src.next())
        assert ((0 <= u) & (u < 1)).all()
    assert src.dim == 2   # stopped consuming LD dims at the cap


def test_stratified_path_dims():
    spp = 16
    pix = jnp.zeros((spp,), jnp.uint32)
    idx = jnp.arange(spp, dtype=jnp.uint32)
    u = np.asarray(samplers.path_dim_sample("stratified", pix, idx, spp, 0))
    bins = sorted(((u * spp).astype(int)).tolist())
    assert bins == list(range(spp))   # every stratum hit exactly once


def test_pmj02_tables_valid():
    """Generated pmj02bn sets satisfy the progressive (0,2) property
    (samplers.h:367 PMJ02BNSampler's table contract)."""
    from acceleratedvolrenderer_tpu.models import pmj02

    tables, bn = pmj02.get_tables(0)
    assert tables.shape == (pmj02.N_SETS, pmj02.TABLE_SIZE, 2)
    for t in tables:
        assert pmj02.validate_pmj02(t)
    # blue-noise texture is a complete ranking (all values distinct)
    assert np.unique(bn[..., 0]).size == bn.shape[0] * bn.shape[1]


def test_pmj02_film_sample_stratified_convergence():
    """pmj02bn film samples integrate a smooth 2D function with lower
    error than white noise at power-of-two sample counts."""
    from acceleratedvolrenderer_tpu.models import samplers

    spp = 256
    pix = jnp.zeros((spp,), jnp.uint32)
    idx = jnp.arange(spp, dtype=jnp.uint32)
    u1, u2, _ = samplers.film_sample(
        "pmj02bn", pix, idx, spp, seed=1,
        pix=jnp.zeros((spp, 2), jnp.int32))
    f = np.sin(np.pi * np.asarray(u1)) * np.asarray(u2) ** 2
    exact = (2.0 / np.pi) * (1.0 / 3.0)
    err_ld = abs(float(f.mean()) - exact)

    ui, vi, _ = samplers.film_sample("independent", pix, idx, spp, seed=1)
    fi = np.sin(np.pi * np.asarray(ui)) * np.asarray(vi) ** 2
    err_wn = abs(float(fi.mean()) - exact)
    assert err_ld < max(err_wn, 0.01)
    # all samples in [0,1)
    assert ((np.asarray(u1) >= 0) & (np.asarray(u1) < 1)).all()


def test_pmj02_pixel_decorrelation():
    """Different pixels get toroidally shifted (different) sample sets."""
    from acceleratedvolrenderer_tpu.models import samplers

    idx = jnp.arange(16, dtype=jnp.uint32)
    a = samplers.film_sample("pmj02bn", jnp.zeros((16,), jnp.uint32), idx,
                             16, pix=jnp.zeros((16, 2), jnp.int32))[0]
    b = samplers.film_sample("pmj02bn", jnp.zeros((16,), jnp.uint32), idx,
                             16, pix=jnp.full((16, 2), 9, jnp.int32))[0]
    assert not np.allclose(np.asarray(a), np.asarray(b))
