"""Parser tests (pattern: reference parser_test.cpp tokenizer round trips)."""
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.scene.parser import PbrtParser, tokenize

MINI_SCENE = """
# test scene
LookAt 0.5 0.5 -3   0.5 0.5 0.5   0 1 0
Camera "perspective" "float fov" [30]
Film "rgb" "integer xresolution" [64] "integer yresolution" [48]
     "string filename" "mini.exr"
Sampler "halton" "integer pixelsamples" [8]
Integrator "volpath" "integer maxdepth" [7]
PixelFilter "gaussian" "float xradius" [1.5] "float sigma" [0.5]
WorldBegin
LightSource "distant" "rgb L" [2 2 2] "point3 from" [0 10 0] "point3 to" [0 0 0]
LightSource "infinite" "rgb L" [0.1 0.1 0.1]
AttributeBegin
  MakeNamedMedium "fog" "string type" "uniformgrid"
      "integer nx" [2] "integer ny" [2] "integer nz" [2]
      "point3 p0" [0 0 0] "point3 p1" [1 1 1]
      "float density" [1 1 1 1 2 2 2 2]
      "rgb sigma_a" [0.5 0.5 0.5] "rgb sigma_s" [1 1 1]
      "float g" [0.3] "float scale" [2.0]
  MediumInterface "fog" ""
  Material ""
  Shape "sphere" "float radius" [1]
AttributeEnd
"""


def test_tokenize():
    toks = tokenize('Foo "bar baz" [1 2 3] # comment\nQux')
    assert toks == ["Foo", '"bar baz"', "[", "1", "2", "3", "]", "Qux"]


def test_tokenize_string_with_brackets():
    toks = tokenize('"float x[2]" [0.5]')
    assert toks == ['"float x[2]"', "[", "0.5", "]"]


def test_parse_mini_scene():
    scene = PbrtParser().parse_string(MINI_SCENE)
    assert isinstance(scene.camera, PerspectiveCamera)
    assert scene.camera.width == 64 and scene.camera.height == 48
    assert scene.camera.fov_deg == 30.0
    assert scene.spp == 8
    assert scene.max_depth == 7
    assert len(scene.lights) == 2
    assert isinstance(scene.lights[0], lm.DistantLight)
    np.testing.assert_allclose(scene.lights[0].direction, [0, -1, 0], atol=1e-6)
    assert isinstance(scene.lights[1], lm.UniformInfiniteLight)
    med = scene.medium
    assert med is not None
    assert med.density.shape == (2, 2, 2)
    assert med.g == 0.3
    assert med.scale == 2.0
    np.testing.assert_allclose(med.bounds_hi, [1, 1, 1])


def test_camera_transform_matches_lookat():
    scene = PbrtParser().parse_string(MINI_SCENE)
    import jax.numpy as jnp

    # film point (32, 24) of 64x48 is the exact image center
    o, d = scene.camera.generate_rays(
        jnp.array([[32, 24]]), jnp.array([[0.0, 0.0]])
    )
    np.testing.assert_allclose(np.asarray(o[0]), [0.5, 0.5, -3.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, 1], atol=1e-3)


def test_parse_renders(tmp_path):
    """Parsed scene renders end-to-end."""
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    scene = PbrtParser().parse_string(MINI_SCENE)
    scene.spp = 2
    small = scene
    small.camera = PerspectiveCamera(
        c2w=scene.camera.c2w, fov_deg=30.0, width=8, height=8
    )
    img, _ = render_mod.render(small)
    assert img.shape == (8, 8, 3)
    assert np.isfinite(img).all()
    assert img.mean() > 0.0


def test_unknown_directive_warns():
    with pytest.warns(UserWarning):
        PbrtParser().parse_string(
            'Camera "perspective"\nWorldBegin\nAreaLightSource "diffuse" "rgb L" [1 1 1]\n'
        )


def test_include(tmp_path):
    inc = tmp_path / "inc.pbrt"
    inc.write_text('LightSource "infinite" "rgb L" [1 1 1]\n')
    main = tmp_path / "main.pbrt"
    main.write_text(
        'Camera "perspective" "float fov" [45]\nWorldBegin\nInclude "inc.pbrt"\n'
    )
    from acceleratedvolrenderer_tpu.scene.parser import load_scene

    scene = load_scene(str(main))
    assert len(scene.lights) == 1
