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
            'Camera "perspective"\nWorldBegin\n'
            'Shape "heightfield" "integer nu" [2]\n'
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


def test_parser_surface_scene(tmp_path):
    """Opaque shapes + materials + area lights now parse into primitives
    (BasicSceneBuilder surface path)."""
    import numpy as np

    from acceleratedvolrenderer_tpu.models import materials as mats
    from acceleratedvolrenderer_tpu.models import shapes as shp
    from acceleratedvolrenderer_tpu.scene.parser import load_scene

    txt = '''
Camera "perspective" "float fov" [45]
Film "rgb" "integer xresolution" [16] "integer yresolution" [16]
WorldBegin
LightSource "point" "rgb I" [10 10 10]
MakeNamedMaterial "red" "string type" "diffuse" "rgb reflectance" [.8 .1 .1]
AttributeBegin
Translate 0 0 5
Material "coateddiffuse" "float roughness" [0.1]
Shape "sphere" "float radius" [1.5]
AttributeEnd
AttributeBegin
NamedMaterial "red"
Translate 0 -2 5
Shape "trianglemesh"
  "point3 P" [-3 0 -3  3 0 -3  3 0 3  -3 0 3]
  "integer indices" [0 1 2 0 2 3]
AttributeEnd
AttributeBegin
AreaLightSource "diffuse" "rgb L" [4 4 4]
Translate 0 3 5
Shape "disk" "float radius" [0.7]
AttributeEnd
'''
    f = tmp_path / "s.pbrt"
    f.write_text(txt)
    sc = load_scene(str(f))
    kinds = [type(p).__name__ for p in sc.primitives]
    assert kinds == ["Sphere", "TriangleMesh", "Disk"]
    sph = sc.primitives[0]
    assert isinstance(sph.material, mats.CoatedDiffuseMaterial)
    assert np.allclose(sph.center, [0, 0, 5], atol=1e-5)
    assert abs(sph.radius - 1.5) < 1e-5
    tm = sc.primitives[1]
    assert isinstance(tm.material, mats.DiffuseMaterial)
    assert np.allclose(tm.vertices[0], [-3, -2, 2], atol=1e-4)
    disk = sc.primitives[2]
    assert disk.material.emissive
    assert len(sc.lights) == 1


def test_parser_renders_surface_scene(tmp_path):
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene.parser import load_scene
    import numpy as np

    txt = '''
Camera "perspective" "float fov" [50]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
Sampler "independent" "integer pixelsamples" [4]
Integrator "path" "integer maxdepth" [3]
WorldBegin
LightSource "point" "point3 from" [0 2 3] "rgb I" [20 20 20]
AttributeBegin
Translate 0 0 4
Shape "sphere" "float radius" [1]
AttributeEnd
'''
    f = tmp_path / "r.pbrt"
    f.write_text(txt)
    sc = load_scene(str(f))
    sc.integrator = "path"
    img, _ = render_mod.render(sc)
    assert np.isfinite(img).all()
    assert img.max() > 0.0


def test_format_scene_transform_roundtrip(tmp_path):
    """--format output must reparse: Transform/ConcatTransform brackets
    are preserved (reference FormattingParserTarget keeps them)."""
    from acceleratedvolrenderer_tpu.scene.parser import format_scene, load_scene

    txt = '''
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
AttributeBegin
Transform [ 1 0 0 0  0 1 0 0  0 0 1 0  0.5 0 4 1 ]
ConcatTransform [ 2 0 0 0  0 2 0 0  0 0 2 0  0 0 0 1 ]
Shape "sphere" "float radius" [1]
AttributeEnd
'''
    f = tmp_path / "t.pbrt"
    f.write_text(txt)
    formatted = format_scene(str(f))
    f2 = tmp_path / "t2.pbrt"
    f2.write_text(formatted)
    sc1 = load_scene(str(f))
    sc2 = load_scene(str(f2))   # must not raise
    assert len(sc1.primitives) == len(sc2.primitives) == 1
    import numpy as np
    c1 = np.asarray(sc1.primitives[0].center)
    c2 = np.asarray(sc2.primitives[0].center)
    assert np.allclose(c1, c2, atol=1e-5)


def test_unbracketed_transform_parses(tmp_path):
    from acceleratedvolrenderer_tpu.scene.parser import load_scene

    txt = '''
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Transform 1 0 0 0  0 1 0 0  0 0 1 0  0 0 4 1
Shape "sphere" "float radius" [1]
'''
    f = tmp_path / "u.pbrt"
    f.write_text(txt)
    sc = load_scene(str(f))
    assert len(sc.primitives) == 1


def test_named_textures_and_material_reference(tmp_path):
    """Texture statements build named textures; materials resolve
    "texture <param>" references (parser.cpp Texture ->
    materials.cpp factory)."""
    import numpy as np

    from acceleratedvolrenderer_tpu.models import textures as tx
    from acceleratedvolrenderer_tpu.scene.parser import PbrtParser

    txt = '''
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [8] "integer yresolution" [8]
WorldBegin
Texture "half" "float" "constant" "float value" [0.5]
Texture "chk" "spectrum" "checkerboard"
    "texture tex1" "half" "rgb tex2" [0.9 0.1 0.1]
    "float uscale" [4] "float vscale" [4]
Texture "sph" "float" "fbm" "integer octaves" [4]
Material "diffuse" "texture reflectance" "chk"
Shape "sphere" "float radius" [1]
'''
    f = tmp_path / "t.pbrt"
    f.write_text(txt)
    ps = PbrtParser()
    sc = ps.parse_file(str(f))
    assert set(ps.named_textures) == {"half", "chk", "sph"}
    mat = sc.primitives[0].material
    refl = mat.reflectance
    # the reflectance is the named checker (through the uv-scale mapping)
    assert isinstance(refl, tx.MappedTexture)
    uv = np.zeros((1, 2), np.float32)
    v = np.asarray(tx.eval_texture(refl, uv))
    assert v.shape[-1] == 3 or v.ndim == 1


def test_texture_scale_mix_directionmix(tmp_path):
    import numpy as np

    from acceleratedvolrenderer_tpu.models import textures as tx
    from acceleratedvolrenderer_tpu.scene.parser import PbrtParser

    txt = '''
WorldBegin
Texture "a" "float" "constant" "float value" [0.25]
Texture "b" "float" "scale" "texture tex" "a" "float scale" [2]
Texture "c" "float" "mix" "texture tex1" "a" "texture tex2" "b"
    "float amount" [1.0]
Texture "d" "spectrum" "directionmix" "texture tex1" "a"
    "texture tex2" "b" "vector dir" [0 0 1]
'''
    f = tmp_path / "t2.pbrt"
    f.write_text(txt)
    ps = PbrtParser()
    ps.parse_file(str(f))
    uv = np.zeros((2, 2), np.float32)
    assert np.allclose(np.asarray(ps.named_textures["b"].eval(uv)), 0.5)
    assert np.allclose(np.asarray(ps.named_textures["c"].eval(uv)), 0.5)
    n = np.asarray([[0, 0, 1.0], [1.0, 0, 0]], np.float32)
    v = np.asarray(tx.eval_texture(ps.named_textures["d"], uv, n=n))
    assert np.allclose(v, [0.25, 0.5], atol=1e-6)


def test_unknown_texture_class_warns(tmp_path):
    import warnings as _w

    from acceleratedvolrenderer_tpu.scene.parser import PbrtParser

    txt = '''
WorldBegin
Texture "p" "spectrum" "ptex" "string filename" ["x.ptx"]
'''
    f = tmp_path / "t3.pbrt"
    f.write_text(txt)
    ps = PbrtParser()
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        ps.parse_file(str(f))
    assert any("ptex" in str(r.message) for r in rec)
    assert "p" in ps.named_textures   # constant fallback keeps scene valid
