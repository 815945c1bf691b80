"""LDR-FLIP metric sanity (the imgtool diff parity harness,
cmd/imgtool.cpp:129-146 + src/ext/flip)."""
import numpy as np

from acceleratedvolrenderer_tpu.utils.flip import flip_ldr, flip_mean


def _img(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w, 3)).astype(np.float32) * 0.8
    return base


def test_identical_images_zero():
    a = _img()
    e = flip_ldr(a, a)
    assert e.shape == a.shape[:2]
    assert float(e.max()) < 1e-6


def test_range_and_monotonicity():
    a = _img()
    small = np.clip(a + 0.02, 0, 1)
    big = np.clip(a + 0.3, 0, 1)
    e_small = flip_mean(a, small)
    e_big = flip_mean(a, big)
    assert 0.0 < e_small < e_big <= 1.0


def test_localized_error_localized_map():
    a = np.full((64, 64, 3), 0.5, np.float32)
    b = a.copy()
    b[28:36, 28:36] = 0.9
    e = flip_ldr(a, b)
    assert e[32, 32] > 0.2
    assert e[4, 4] < 0.02


def test_black_white_extreme():
    a = np.zeros((32, 32, 3), np.float32)
    b = np.ones((32, 32, 3), np.float32)
    assert flip_mean(a, b) > 0.8
