"""PixelSensor / white balance / SpectralFilm / G-buffer tests
(film.h:36 PixelSensor, film.h:319 GBufferFilm, film.h:401 SpectralFilm)."""
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models.film import (
    PixelSensor, SpectralFilm, white_balance_matrix)
from acceleratedvolrenderer_tpu.utils import spectrum as sp


def test_default_sensor_matches_to_xyz():
    """CreateDefault: CIE response + identity matrix == plain to_xyz."""
    sensor = PixelSensor()
    lam = jnp.asarray([[450.0, 550.0, 600.0, 650.0]])
    swl = sp.SampledWavelengths(lam, jnp.ones_like(lam))
    L = jnp.asarray([[1.0, 2.0, 0.5, 1.5]])
    assert np.allclose(np.asarray(sensor.to_xyz(L, swl)),
                       np.asarray(sp.to_xyz(L, swl)), atol=1e-6)


def test_white_balance_maps_whites():
    """Bradford adaptation maps the source white point to the target."""
    src, dst = (0.4476, 0.4074), (0.3127, 0.3290)   # illuminant A -> D65
    m = white_balance_matrix(src, dst)
    xyz_a = np.array([src[0] / src[1], 1.0, (1 - src[0] - src[1]) / src[1]])
    out = m @ xyz_a
    xy = out[:2] / out.sum()
    assert np.allclose(xy, dst, atol=1e-4)


def test_trained_sensor_near_identity_for_cie():
    s = PixelSensor(sensor_illum_xy=(0.3127, 0.3290))
    assert np.allclose(s.xyz_from_rgb, np.eye(3), atol=0.05)


def test_spectral_film_buckets():
    film = SpectralFilm.create(4, 4, n_buckets=8)
    pix = jnp.asarray([[1, 1], [2, 2]], jnp.int32)
    lam = jnp.asarray([[400.0, 500.0, 600.0, 700.0]] * 2)
    swl = sp.SampledWavelengths(lam, jnp.ones_like(lam))
    L = jnp.ones((2, 4))
    film = film.add_samples(pix, L, swl)
    b = np.asarray(film.bucket_images())
    # each of the 4 wavelengths landed in its bucket at the right pixel
    assert (b[1, 1] > 0).sum() == 4
    assert (b[0, 0] == 0).all()
    names = film.channel_names()
    assert len(names) == 8 and names[0].startswith("C01_")


def test_spectral_render_smoke():
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import presets

    sc = presets.emissive_volume(res=12, spp=2)
    film, stats = render_mod.render_spectral(sc, n_buckets=4)
    img = np.asarray(film.to_image())
    buckets = np.asarray(film.bucket_images())
    assert np.isfinite(img).all() and np.isfinite(buckets).all()
    assert buckets.max() > 0
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "spec.exr")
        film.write(p, spp=2)
        from acceleratedvolrenderer_tpu.utils.image import read_exr
        chans, names, _ = read_exr(p)
        assert chans.shape[-1] == 7  # RGB + 4 buckets


def test_gbuffer_pass():
    from acceleratedvolrenderer_tpu.models import lights as lm
    from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
    from acceleratedvolrenderer_tpu.models.film import BoxFilter
    from acceleratedvolrenderer_tpu.models.materials import DiffuseMaterial
    from acceleratedvolrenderer_tpu.models.shapes import Sphere
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import Scene
    from acceleratedvolrenderer_tpu.utils import vecmath as vm

    sph = Sphere(center=np.array([0.0, 0.0, 3.0]), radius=1.0,
                 material=DiffuseMaterial(
                     reflectance=sp.constant_spectrum(0.5)))
    cam = PerspectiveCamera(c2w=vm.look_at((0, 0, 0), (0, 0, 1), (0, 1, 0)),
                            fov_deg=45.0, width=16, height=16)
    sc = Scene(camera=cam, medium=None,
               lights=[lm.PointLight(position=np.zeros(3),
                                     spectrum=sp.constant_spectrum(1.0))],
               primitives=[sph], max_depth=2, filter=BoxFilter(), spp=1,
               scene_radius=10.0)
    aovs, _ = render_gbuffer = render_mod.render_gbuffer(sc)
    d = aovs["depth"]
    assert np.isfinite(d[8, 8]) and 1.5 < d[8, 8] < 2.5   # sphere front
    assert not np.isfinite(d[0, 0])                        # background
    n = aovs["N"][8, 8]
    assert n[2] < -0.9 or n[2] > 0.9   # normal facing camera along z
    assert aovs["albedo"][8, 8].mean() > 0.1
