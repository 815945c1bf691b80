"""CLI tests: imgtool subcommands + pbrt/graph_maker wiring."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from acceleratedvolrenderer_tpu.cli import imgtool
from acceleratedvolrenderer_tpu.utils.image import read_exr, write_exr


@pytest.fixture
def imgs(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.random((16, 20, 3)).astype(np.float32)
    b = a + 0.1
    pa = str(tmp_path / "a.exr")
    pb = str(tmp_path / "b.exr")
    write_exr(pa, a)
    write_exr(pb, b)
    return pa, pb, a, b


def test_imgtool_diff(imgs, capsys):
    pa, pb, a, b = imgs
    rc = imgtool.main(["diff", pa, pb])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    np.testing.assert_allclose(out["MSE"], 0.01, rtol=1e-4)
    np.testing.assert_allclose(out["L1"], 0.1, rtol=1e-4)


def test_imgtool_diff_threshold(imgs, capsys):
    pa, pb, *_ = imgs
    assert imgtool.main(["diff", pa, pb, "--metric", "MSE", "--threshold", "0.02"]) == 0
    capsys.readouterr()
    assert imgtool.main(["diff", pa, pb, "--metric", "MSE", "--threshold", "0.001"]) == 1


def test_imgtool_info(imgs, capsys):
    pa, *_ = imgs
    assert imgtool.main(["info", pa]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["resolution"] == [20, 16]


def test_imgtool_convert_png(imgs, tmp_path, capsys):
    pa, *_ = imgs
    out = str(tmp_path / "o.png")
    assert imgtool.main(["convert", pa, out]) == 0
    assert os.path.exists(out)


def test_imgtool_falsecolor(imgs, tmp_path, capsys):
    pa, *_ = imgs
    out = str(tmp_path / "f.png")
    assert imgtool.main(["falsecolor", pa, out]) == 0
    assert os.path.exists(out)


def test_imgtool_average(imgs, tmp_path, capsys):
    pa, pb, a, b = imgs
    out = str(tmp_path / "avg.exr")
    assert imgtool.main(["average", pa, pb, "-o", out]) == 0
    avg, _, _ = read_exr(out)
    np.testing.assert_allclose(avg, (a + b) / 2, atol=1e-6)


def test_pbrt_cli_help():
    from acceleratedvolrenderer_tpu.cli import pbrt

    with pytest.raises(SystemExit) as e:
        pbrt.main(["--help"])
    assert e.value.code == 0


def test_graph_maker_cli_help():
    from acceleratedvolrenderer_tpu.cli import graph_maker

    with pytest.raises(SystemExit) as e:
        graph_maker.main(["--help"])
    assert e.value.code == 0


def test_pbrt_cli_render_scene_file(tmp_path, capsys):
    """Full CLI drive: parse a scene file, render, write EXR."""
    scene = tmp_path / "s.pbrt"
    scene.write_text(
        'LookAt 0.5 0.5 -3  0.5 0.5 0.5  0 1 0\n'
        'Camera "perspective" "float fov" [30]\n'
        'Film "rgb" "integer xresolution" [8] "integer yresolution" [8]\n'
        'Sampler "halton" "integer pixelsamples" [2]\n'
        'Integrator "volpath" "integer maxdepth" [3]\n'
        'WorldBegin\n'
        'LightSource "infinite" "rgb L" [0.5 0.5 0.5]\n'
    )
    out = str(tmp_path / "o.exr")
    from acceleratedvolrenderer_tpu.cli import pbrt

    rc = pbrt.main([str(scene), "-o", out, "--stats"])
    assert rc == 0
    img, _, attrs = read_exr(out)
    assert img.shape == (8, 8, 3)
    assert attrs["samplesPerPixel"] == 2
    assert img.mean() > 0.1


def test_nanovdb2pbrt_roundtrip(tmp_path):
    """Converter output parses back through the .pbrt parser into the same
    grid (the reference's VDB -> uniformgrid ingestion route)."""
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import nanovdb2pbrt as conv
    from acceleratedvolrenderer_tpu.scene import parser as parser_mod

    rng = np.random.default_rng(0)
    dens = rng.random((4, 3, 2)).astype(np.float32)
    src = tmp_path / "d.npz"
    np.savez(src, density=dens)
    out = tmp_path / "grid.txt"
    rc = conv.main([str(src), "--p0=-1,-1,-1", "--p1", "1,2,3",
                    "-o", str(out)])
    assert rc == 0
    scene_txt = (
        'Camera "perspective" "float fov" [40]\n'
        'Film "rgb" "integer xresolution" [8] "integer yresolution" [8]\n'
        "WorldBegin\n"
        'MakeNamedMedium "cl" "string type" "uniformgrid"\n'
        + out.read_text() +
        'AttributeBegin\n'
        'MediumInterface "cl" ""\n'
        'Shape "sphere" "float radius" [1]\n'
        'AttributeEnd\n'
    )
    sf = tmp_path / "s.pbrt"
    sf.write_text(scene_txt)
    scene = parser_mod.load_scene(str(sf))
    med = scene.medium
    assert med is not None
    assert med.density.shape == (4, 3, 2)
    assert np.allclose(med.density, dens, atol=1e-5)
    assert np.allclose(med.bounds_lo, [-1, -1, -1])


def test_nanovdb2pbrt_downsample(tmp_path):
    import numpy as np

    from acceleratedvolrenderer_tpu.cli.nanovdb2pbrt import downsample2

    a = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
    d = downsample2(a)
    assert d.shape == (1, 1, 1)
    assert abs(float(d.reshape(())) - a.mean()) < 1e-6


def test_plytool_roundtrip(tmp_path, capsys):
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import plytool
    from acceleratedvolrenderer_tpu.utils import ply

    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    path = tmp_path / "quad.ply"
    ply.write_ply(str(path), v, f)
    m = ply.read_ply(str(path))
    assert np.allclose(m["vertices"], v)
    assert np.array_equal(m["faces"], f)
    rc = plytool.main(["info", str(path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "4 vertices, 2 triangles" in out


def test_ply_ascii_fan_triangulation(tmp_path):
    from acceleratedvolrenderer_tpu.utils import ply

    txt = """ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
"""
    p = tmp_path / "a.ply"
    p.write_text(txt)
    m = ply.read_ply(str(p))
    assert m["faces"].shape == (2, 3)


def test_pspec_blue_noise_deficit():
    """zsobol's low-frequency power must sit below independent sampling's
    (the pspec capability, cmd/pspec.cpp)."""
    from acceleratedvolrenderer_tpu.cli.pspec import (power_spectrum,
                                                      radial_average)

    si = radial_average(power_spectrum("independent", 32, 32, 8), 8)
    sz = radial_average(power_spectrum("zsobol", 32, 32, 8), 8)
    # skip the DC bin; compare the next-lowest frequency bins
    assert sz[1:3].mean() < si[1:3].mean()


def test_imgtool_new_subcommands(tmp_path):
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import imgtool
    from acceleratedvolrenderer_tpu.utils.image import read_exr, write_exr

    img = np.zeros((16, 16, 3), np.float32)
    img[8, 8] = 5.0
    src = tmp_path / "a.exr"
    write_exr(str(src), img)
    out = tmp_path / "b.exr"
    assert imgtool.main(["bloom", str(src), str(out), "--level", "1"]) == 0
    bl, _, _ = read_exr(str(out))
    assert bl[7, 7].sum() > 0        # energy spread to neighbours
    assert imgtool.main(["whitebalance", str(src), str(out),
                         "--primaries", "0.4476,0.4074"]) == 0
    wb, _, _ = read_exr(str(out))
    assert np.isfinite(wb).all()
    assert imgtool.main(["splitn", str(src), "-n", "2"]) == 0
    c, _, _ = read_exr(str(tmp_path / "a-0-0.exr"))
    assert c.shape[:2] == (8, 8)


def test_makesky_and_mapping(tmp_path):
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import imgtool
    from acceleratedvolrenderer_tpu.utils.image import read_exr
    from acceleratedvolrenderer_tpu.utils.sky import (
        equal_area_sphere_to_square, equal_area_square_to_sphere)

    # mapping round trip + unit vectors
    rng = np.random.default_rng(0)
    uv = rng.random((256, 2))
    d = equal_area_square_to_sphere(uv)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)
    uv2 = equal_area_sphere_to_square(d)
    assert np.allclose(uv, uv2, atol=1e-5)

    out = tmp_path / "sky.exr"
    rc = imgtool.main(["makesky", "--outfile", str(out),
                       "--resolution", "64", "--elevation", "30"])
    assert rc == 0
    img, _, _ = read_exr(str(out))
    assert np.isfinite(img).all() and img.max() > 0
    # sky is brighter toward the sun's half and black below horizon
    d = equal_area_square_to_sphere(
        np.stack(np.meshgrid(*[(np.arange(64) + .5) / 64] * 2), -1))
    below = d[..., 2] < -0.1
    assert img[below].max() < 1e-6


def test_denoise_gbuffer_guided(tmp_path):
    """imgtool denoise (the denoise-optix equivalent, cmd/imgtool.cpp:2243):
    a-trous filter guided by Albedo/Ns channels must cut noise while keeping
    the albedo edge."""
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import imgtool
    from acceleratedvolrenderer_tpu.utils.image import read_exr, write_exr

    rng = np.random.default_rng(0)
    H = W = 64
    clean = np.zeros((H, W, 3), np.float32)
    clean[:, : W // 2] = [0.8, 0.4, 0.2]
    clean[:, W // 2:] = [0.1, 0.3, 0.7]
    noisy = np.clip(clean + rng.normal(0, 0.25, (H, W, 3)), 0,
                    None).astype(np.float32)
    normal = np.zeros((H, W, 3), np.float32)
    normal[..., 2] = 1.0
    src = tmp_path / "noisy.exr"
    write_exr(str(src), np.concatenate([noisy, clean, normal], -1),
              channel_names=("R", "G", "B", "Albedo.R", "Albedo.G",
                             "Albedo.B", "Ns.X", "Ns.Y", "Ns.Z"))
    out = tmp_path / "dn.exr"
    rc = imgtool.main(["denoise", str(src), "--outfile", str(out)])
    assert rc == 0
    dn, _, _ = read_exr(str(out))
    mse_before = ((noisy - clean) ** 2).mean()
    mse_after = ((dn[:, :, :3] - clean) ** 2).mean()
    assert mse_after < mse_before / 10


def test_scalenormalmap(tmp_path):
    """imgtool scalenormalmap (cmd/imgtool.cpp:693): xy scaled, z rebuilt
    to unit length, [0,1] encoding round-tripped."""
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import imgtool
    from acceleratedvolrenderer_tpu.utils.image import read_exr, write_exr

    rng = np.random.default_rng(1)
    nm = np.concatenate([rng.random((8, 8, 2)).astype(np.float32) * 0.4 + 0.3,
                         np.full((8, 8, 1), 0.9, np.float32)], -1)
    src = tmp_path / "nm.exr"
    write_exr(str(src), nm)
    out = tmp_path / "nm2.exr"
    rc = imgtool.main(["scalenormalmap", str(src), "--scale", "0.5",
                       "--outfile", str(out)])
    assert rc == 0
    res, _, _ = read_exr(str(out))
    dec = 2 * res - 1
    inp = 2 * nm - 1
    assert np.allclose(dec[..., :2], inp[..., :2] * 0.5, atol=1e-3)
    assert np.allclose((dec ** 2).sum(-1), 1.0, atol=1e-3)


def test_pbrt_quick_partial_pixelstats(tmp_path):
    """--quick / --write-partial-images / --pixelstats flags
    (cmd/pbrt.cpp option block + util/stats.h --pixelstats)."""
    import json
    import os

    from acceleratedvolrenderer_tpu.cli import pbrt as pbrt_cli

    out = tmp_path / "r.exr"
    rc = pbrt_cli.main(["preset:fog_box", "--res", "16x16", "--spp", "8",
                        "--quick", "--cpu", "--write-partial-images",
                        "-o", str(out)])
    assert rc in (0, None)
    assert out.exists()
    assert (tmp_path / "r_partial_s1.exr").exists()

    out2 = tmp_path / "p.exr"
    rc = pbrt_cli.main(["preset:fog_box", "--res", "16x16", "--spp", "2",
                        "--cpu", "--pixelstats", "-o", str(out2)])
    assert rc in (0, None)
    assert (tmp_path / "p_variance.exr").exists()
    assert (tmp_path / "p_relative_variance.exr").exists()


SCENE_TXT = (
    'LookAt 0.5 0.5 -3  0.5 0.5 0.5  0 1 0\n'
    'Camera "perspective" "float fov" [30]\n'
    'Film "rgb" "integer xresolution" [12] "integer yresolution" [8]\n'
    'Sampler "halton" "integer pixelsamples" [2]\n'
    'Integrator "volpath" "integer maxdepth" [3]\n'
    'WorldBegin\n'
    'LightSource "infinite" "rgb L" [0.5 0.5 0.5]\n'
    'AttributeBegin\n'
    'Shape "trianglemesh" "point3 P" [0 0 0  1 0 0  0 1 0]'
    ' "integer indices" [0 1 2]\n'
    'AttributeEnd\n'
)


def test_pbrt_format_and_toply(tmp_path):
    """pbrt --format reformats; --toply extracts inline meshes to PLY
    (cmd/pbrt.cpp format/toPly modes)."""
    import io
    from contextlib import redirect_stdout

    from acceleratedvolrenderer_tpu.cli import pbrt as pbrt_cli
    from acceleratedvolrenderer_tpu.scene.parser import load_scene

    scene = tmp_path / "s.pbrt"
    scene.write_text(SCENE_TXT)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = pbrt_cli.main([str(scene), "--format"])
    assert rc in (0, None)
    text = buf.getvalue()
    assert '"float fov" [ 30 ]' in text
    assert '    Shape "trianglemesh"' in text  # indented inside the block

    out = tmp_path / "t.pbrt"
    rc = pbrt_cli.main([str(scene), "--toply", str(out)])
    assert rc in (0, None)
    formatted = out.read_text()
    assert "plymesh" in formatted and "trianglemesh" not in formatted
    assert (tmp_path / "t_000.ply").exists()
    # the converted scene parses back with the same triangle
    s = load_scene(str(out))
    assert len(s.primitives) == 1


def test_pbrt_pixel_bounds_matches_full_frame(tmp_path):
    """--pixel renders ONLY that pixel, bit-equal to the full frame (RNG
    streams are keyed by flat pixel index, not work index)."""
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import pbrt as pbrt_cli
    from acceleratedvolrenderer_tpu.utils.image import read_exr

    scene = tmp_path / "s.pbrt"
    scene.write_text(SCENE_TXT)
    full = tmp_path / "full.exr"
    one = tmp_path / "one.exr"
    assert pbrt_cli.main([str(scene), "-o", str(full), "--cpu",
                          "--quiet"]) in (0, None)
    assert pbrt_cli.main([str(scene), "-o", str(one), "--cpu", "--quiet",
                          "--pixel", "5,5"]) in (0, None)
    a, _, _ = read_exr(str(full))
    b, _, _ = read_exr(str(one))
    assert np.array_equal(a[5, 5], b[5, 5])
    mask = np.ones((8, 12), bool)
    mask[5, 5] = False
    assert (b.sum(-1)[mask] == 0).all()


def test_pbrt_disable_jitter_flags(tmp_path):
    """--disable-pixel-jitter / --disable-wavelength-jitter make every spp
    sample identical -> 2-spp image equals 1-spp image."""
    import numpy as np

    from acceleratedvolrenderer_tpu.cli import pbrt as pbrt_cli
    from acceleratedvolrenderer_tpu.utils.image import read_exr

    scene = tmp_path / "s.pbrt"
    # env light only: with pixel+wavelength jitter disabled, every sample's
    # path is fully deterministic, so the 2-spp mean equals the 1-spp image
    txt = "\n".join(l for l in SCENE_TXT.splitlines()
                    if "trianglemesh" not in l and "Attribute" not in l)
    scene.write_text(txt.replace('"halton"', '"independent"'))
    outs = []
    for spp, name in ((1, "a.exr"), (2, "b.exr")):
        out = tmp_path / name
        assert pbrt_cli.main([str(scene), "-o", str(out), "--cpu", "--quiet",
                              "--spp", str(spp), "--disable-pixel-jitter",
                              "--disable-wavelength-jitter"]) in (0, None)
        outs.append(read_exr(str(out))[0])
    assert np.allclose(outs[0], outs[1], atol=1e-6)


def test_pbrt_pixel_bounds_clamped_and_empty(tmp_path):
    """Out-of-range pixel bounds are clamped to the film extent (with a
    warning); an empty intersection raises instead of ZeroDivisionError
    (reference film.cpp:114-118). ADVICE r1 regression test."""
    import warnings

    import pytest

    from acceleratedvolrenderer_tpu.cli import pbrt as pbrt_cli
    from acceleratedvolrenderer_tpu.utils.image import read_exr

    scene = tmp_path / "s.pbrt"
    scene.write_text(SCENE_TXT)   # 12x8 film
    out = tmp_path / "c.exr"
    # bounds straddling the right edge: clamped, renders, warns
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert pbrt_cli.main([str(scene), "-o", str(out), "--cpu", "--quiet",
                              "--pixelbounds", "10,20,5,6"]) in (0, None)
    assert any("clipped" in str(w.message) for w in rec)
    img, _, _ = read_exr(str(out))
    assert img.shape[:2] == (8, 12)
    # fully outside the film: clear error, not ZeroDivisionError
    with pytest.raises(ValueError, match="do not intersect"):
        pbrt_cli.main([str(scene), "-o", str(out), "--cpu", "--quiet",
                       "--pixel", "20,20"])
