"""Spectral representation tests (pattern: reference spectrum_test.cpp)."""
import jax
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import colorspace as cs


def test_cie_y_integral():
    lam = jnp.arange(sp.LAMBDA_MIN, sp.LAMBDA_MAX + 1.0, 1.0)
    integral = float(jnp.sum(sp.cie_y(lam)))
    # analytic fit: within ~1.5% of the tabulated CIE_Y_integral
    assert abs(integral - sp.CIE_Y_INTEGRAL) / sp.CIE_Y_INTEGRAL < 0.015


def test_sample_wavelengths_in_range():
    u = jnp.linspace(0.0, 0.999, 64)
    swl = sp.sample_wavelengths_uniform(u)
    assert swl.lam.shape == (64, sp.N_SPECTRUM_SAMPLES)
    assert float(swl.lam.min()) >= sp.LAMBDA_MIN
    assert float(swl.lam.max()) <= sp.LAMBDA_MAX
    np.testing.assert_allclose(
        np.asarray(swl.pdf), 1.0 / (sp.LAMBDA_MAX - sp.LAMBDA_MIN), rtol=1e-6
    )
    swl_v = sp.sample_wavelengths_visible(u)
    assert float(swl_v.lam.min()) >= sp.LAMBDA_MIN - 1.0
    assert float(swl_v.lam.max()) <= sp.LAMBDA_MAX + 1.0
    assert float(swl_v.pdf.min()) > 0.0


def test_visible_pdf_normalized():
    lam = jnp.arange(sp.LAMBDA_MIN, sp.LAMBDA_MAX + 1.0, 0.5)
    pdf = sp._visible_pdf(lam)
    integral = float(jnp.sum(pdf) * 0.5)
    assert abs(integral - 1.0) < 1e-2


def test_constant_spectrum_to_xyz_white():
    """A spectrally flat radiance of 1 should give Y == 1/CIE_Y_integral * integral(y)
    i.e. luminance ~1 after normalization; MC over many wavelength samples."""
    key = jax.random.PRNGKey(0)
    u = jax.random.uniform(key, (4096,))
    swl = sp.sample_wavelengths_visible(u)
    vals = jnp.ones_like(swl.lam)
    xyz = sp.to_xyz(vals, swl)
    mean_xyz = np.asarray(jnp.mean(xyz, axis=0))
    # equal-energy illuminant: X ~ Y ~ Z ~ 1.0 within fit tolerance + MC noise
    assert abs(mean_xyz[1] - 1.0) < 0.02, mean_xyz


def test_terminate_secondary():
    u = jnp.array([0.3])
    swl = sp.sample_wavelengths_uniform(u)
    t = swl.terminate_secondary()
    assert np.all(np.asarray(t.pdf[..., 1:]) == 0.0)
    np.testing.assert_allclose(
        np.asarray(t.pdf[..., 0]), np.asarray(swl.pdf[..., 0]) / sp.N_SPECTRUM_SAMPLES
    )
    # idempotent
    t2 = t.terminate_secondary()
    np.testing.assert_allclose(np.asarray(t2.pdf), np.asarray(t.pdf))


def test_rgb_albedo_roundtrip_gray():
    f = sp.rgb_albedo_spectrum([0.5, 0.5, 0.5])
    lam = jnp.linspace(420.0, 680.0, 64)
    vals = np.asarray(f(lam))
    assert np.all(vals > 0.4) and np.all(vals < 0.6)


def test_blackbody_wien_peak():
    bb = sp.blackbody_normalized(6000.0)
    lam = jnp.arange(sp.LAMBDA_MIN, sp.LAMBDA_MAX, 1.0)
    v = np.asarray(bb(lam))
    peak_lam = float(lam[np.argmax(v)])
    assert abs(peak_lam - 2.8977721e-3 / 6000.0 * 1e9) < 2.0
    assert abs(v.max() - 1.0) < 1e-3


def test_srgb_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(0).random((32, 3)), jnp.float32)
    back = cs.xyz_to_rgb(cs.rgb_to_xyz(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-4)


def test_sigmoid_polynomial_roundtrip():
    """Jakob-Hanika sigmoid-polynomial fit (rgb2spec_opt.cpp equivalent):
    fitted spectra must integrate back to the target RGB under D65 and stay
    bounded in [0, 1]."""
    import numpy as np
    import jax.numpy as jnp

    from acceleratedvolrenderer_tpu.utils import spectrum as sp

    rng = np.random.default_rng(42)
    rgb = rng.random((128, 3)).astype(np.float32)
    c = sp.fit_sigmoid_polynomial(rgb)
    _, basis = sp._sigmoid_fit_basis()
    lam_nm = np.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, 95)
    s = sp.sigmoid_polynomial_eval(
        np.asarray(c)[:, None, :], jnp.asarray(lam_nm, jnp.float32)[None, :])
    back = np.asarray(s @ basis)
    assert np.abs(back - rgb).max() < 1e-3
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0


def test_rgb2spec_table_cli(tmp_path):
    """rgb2spec_opt CLI writes a loadable coefficient lattice whose entries
    reproduce their lattice RGB."""
    import numpy as np
    import jax.numpy as jnp

    from acceleratedvolrenderer_tpu.cli import rgb2spec_opt
    from acceleratedvolrenderer_tpu.utils import spectrum as sp

    out = tmp_path / "t.npz"
    rc = rgb2spec_opt.main(["4", str(out), "--iters", "40"])
    assert rc == 0
    data = np.load(out)
    coeffs = data["coeffs"]
    assert coeffs.shape == (3, 4, 4, 4, 3)
    # spot-check one entry: l=0 (red max), z idx 3, y idx 1, x idx 2
    zs = (np.arange(4) + 0.5) / 4
    target = np.array([zs[3], zs[2] * zs[3], zs[1] * zs[3]], np.float32)
    _, basis = sp._sigmoid_fit_basis()
    lam_nm = np.linspace(sp.LAMBDA_MIN, sp.LAMBDA_MAX, 95)
    s = sp.sigmoid_polynomial_eval(
        jnp.asarray(coeffs[0, 3, 1, 2]), jnp.asarray(lam_nm, jnp.float32))
    back = np.asarray(s @ basis)
    assert np.abs(back - target).max() < 2e-3


# ---------------------------------------------------------------------------
# Named spectra (util/spectrum.cpp GetNamedSpectrum; Sellmeier + literature
# metal IOR fits instead of the vendored tables)
# ---------------------------------------------------------------------------

def test_named_glass_bk7_sellmeier():
    f = sp.named_spectrum("glass-BK7")
    n_d = float(f(jnp.asarray([587.6]))[0])   # helium d-line
    assert abs(n_d - 1.5168) < 2e-3, n_d      # BK7 datasheet n_d
    # normal dispersion: n decreases with wavelength
    n = np.asarray(f(jnp.asarray([400.0, 550.0, 700.0])))
    assert n[0] > n[1] > n[2]


def test_named_metal_gold():
    eta = sp.named_spectrum("metal-Au-eta")
    k = sp.named_spectrum("metal-Au-k")
    lam = jnp.asarray([450.0, 650.0])
    e = np.asarray(eta(lam)); kk = np.asarray(k(lam))
    # gold: blue strongly absorbed (high eta, moderate k), red reflective
    assert e[0] > 1.0 and e[1] < 0.2
    assert kk[1] > 3.0
    # normal-incidence reflectance is much higher in the red => gold color
    def R(n_, k_):
        return ((n_ - 1) ** 2 + k_ ** 2) / ((n_ + 1) ** 2 + k_ ** 2)
    assert R(e[1], kk[1]) > R(e[0], kk[0]) + 0.3


def test_named_illuminants_and_unknown():
    assert sp.named_spectrum("stdillum-A") is not None
    assert sp.named_spectrum("stdillum-D65") is not None
    assert sp.named_spectrum("no-such-spectrum") is None


def test_parser_named_spectrum_conductor(tmp_path):
    from acceleratedvolrenderer_tpu.scene.parser import PbrtParser

    txt = '''
WorldBegin
Material "conductor" "spectrum eta" ["metal-Au-eta"]
    "spectrum k" ["metal-Au-k"]
Shape "sphere" "float radius" [1]
'''
    f = tmp_path / "au.pbrt"
    f.write_text(txt)
    ps = PbrtParser()
    sc = ps.parse_file(str(f))
    m = sc.primitives[0].material
    e = np.asarray(m.eta(jnp.asarray([650.0])))
    assert e[0] < 0.2    # the named gold eta, not the constant-1 fallback
