"""EXR I/O round trips (pattern: reference image_test.cpp) + PIZ decode of the
reference baselines."""
import os

import numpy as np
import pytest

from acceleratedvolrenderer_tpu.utils import image

REF = "/root/reference"


def test_zip_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = (rng.random((65, 97, 3)) * 4.0).astype(np.float32)
    p = str(tmp_path / "t.exr")
    md = image.ImageMetadata(render_time_seconds=2.5, samples_per_pixel=64, mse=0.125)
    image.write_exr(p, img, md)
    out, names, attrs = image.read_exr(p)
    np.testing.assert_array_equal(out, img)
    assert names == ["R", "G", "B"]
    assert attrs["renderTimeSeconds"] == 2.5
    assert attrs["samplesPerPixel"] == 64
    assert attrs["MSE"] == 0.125


def test_half_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((33, 40, 3)).astype(np.float32)
    p = str(tmp_path / "h.exr")
    image.write_exr(p, img, half=True)
    out, _, _ = image.read_exr(p)
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_single_channel(tmp_path):
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    p = str(tmp_path / "y.exr")
    image.write_exr(p, img, channel_names=("Y",))
    out, names, _ = image.read_exr(p)
    np.testing.assert_array_equal(out[:, :, 0], img)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_piz_read_reference_cube():
    img, names, attrs = image.read_exr(f"{REF}/cube.exr")
    assert img.shape == (1, 1, 3)
    assert attrs["samplesPerPixel"] == 128
    assert 0.0 < img.mean() < 1.0


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_piz_read_reference_cloud():
    img, names, attrs = image.read_exr(f"{REF}/disney-cloud.exr")
    assert img.shape[2] == 3
    assert attrs["samplesPerPixel"] == 64
    assert np.all(np.isfinite(img))
    assert img.min() >= 0.0


def test_metrics():
    a = np.ones((4, 4, 3))
    b = np.zeros((4, 4, 3))
    assert image.mse(a, b) == 1.0
    assert image.mae(a, b) == 1.0
    assert image.mse(a, a) == 0.0


def test_pfm_roundtrip(tmp_path):
    """PFM write/read (util/image.cpp ReadPFM/WritePFM): bitwise float
    round trip, bottom-up little-endian layout."""
    import numpy as np

    from acceleratedvolrenderer_tpu.utils import image as im

    rng = np.random.default_rng(0)
    a = rng.random((17, 23, 3)).astype(np.float32)
    p = tmp_path / "t.pfm"
    im.write_pfm(str(p), a)
    assert np.array_equal(im.read_pfm(str(p)), a)
    g = rng.random((9, 5)).astype(np.float32)    # greyscale Pf
    im.write_pfm(str(p), g)
    assert np.array_equal(im.read_pfm(str(p)), g)


def test_qoi_roundtrip(tmp_path):
    """QOI encode/decode (ext/qoi leg of Image::Read/Write): exact at the
    8-bit sRGB quantization level, exercising run/diff/luma/index ops."""
    import numpy as np

    from acceleratedvolrenderer_tpu.utils import image as im

    rng = np.random.default_rng(1)
    a = rng.random((13, 11, 3)).astype(np.float32)
    p = tmp_path / "t.qoi"
    im.write_qoi(str(p), a)
    b = im.read_qoi(str(p))
    assert b.shape == a.shape
    assert np.abs(b - a).max() < 0.005           # 8-bit srgb quantization
    g = np.zeros((16, 16, 3), np.float32)
    g[:8] = 0.5
    g[:, :4] += 0.01
    im.write_qoi(str(p), g)
    assert np.abs(im.read_qoi(str(p)) - g).max() < 0.005


def test_imgtool_convert_pfm_qoi(tmp_path):
    """imgtool convert round-trips through the PFM and QOI legs."""
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import imgtool
    from acceleratedvolrenderer_tpu.utils import image as im

    rng = np.random.default_rng(2)
    a = rng.random((8, 8, 3)).astype(np.float32)
    src = tmp_path / "a.exr"
    im.write_exr(str(src), a)
    for ext in ("pfm", "qoi"):
        out = tmp_path / f"b.{ext}"
        rc = imgtool.main(["convert", str(src), str(out)])
        assert rc == 0
        back, _ = imgtool._load(str(out))
        assert np.abs(back - a).max() < 0.005
