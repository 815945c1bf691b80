"""Sampled spectra — the 4-wavelength point-sample representation.

Reference: src/pbrt/util/spectrum.h (SampledSpectrum, spectrum.h:91;
NSpectrumSamples = 4, spectrum.h:36; SampledWavelengths with secondary
termination).  TPU-native design: a spectrum sample is just a trailing
lane axis of size N_SPECTRUM_SAMPLES on a jnp array, so all spectral
arithmetic is elementwise VPU work and maps onto the 128-lane register
layout for free.

Instead of shipping the CIE 1931 tables verbatim, the color matching
functions use the multi-lobe piecewise-Gaussian analytic fits of
Wyman, Sloan & Shirley, "Simple Analytic Approximations to the CIE XYZ
Color Matching Functions", JCGT 2013 — accurate to well under the MC
noise floor of any rendered image, and cheap enough to evaluate per-ray
inside kernels (no table gathers).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

N_SPECTRUM_SAMPLES = 4
LAMBDA_MIN = 360.0
LAMBDA_MAX = 830.0

# integral of the CIE Y matching curve (standard constant; spectrum.h:ClassName)
CIE_Y_INTEGRAL = 106.856895


# ---------------------------------------------------------------------------
# CIE matching functions — analytic piecewise-Gaussian fits (Wyman et al. 2013)
# ---------------------------------------------------------------------------

def _pgauss(lam, mu, s1, s2):
    t = (lam - mu) * jnp.where(lam < mu, 1.0 / s1, 1.0 / s2)
    return jnp.exp(-0.5 * t * t)


def cie_x(lam):
    return (
        1.056 * _pgauss(lam, 599.8, 37.9, 31.0)
        + 0.362 * _pgauss(lam, 442.0, 16.0, 26.7)
        - 0.065 * _pgauss(lam, 501.1, 20.4, 26.2)
    )


def cie_y(lam):
    return 0.821 * _pgauss(lam, 568.8, 46.9, 40.5) + 0.286 * _pgauss(
        lam, 530.9, 16.3, 31.1
    )


def cie_z(lam):
    return 1.217 * _pgauss(lam, 437.0, 11.8, 36.0) + 0.681 * _pgauss(
        lam, 459.0, 26.0, 13.8
    )


def cie_xyz(lam):
    """Stacked (..., 3) XYZ matching values at wavelengths lam (...,)."""
    return jnp.stack([cie_x(lam), cie_y(lam), cie_z(lam)], axis=-1)


# ---------------------------------------------------------------------------
# wavelength sampling (SampledWavelengths, spectrum.h:137)
# ---------------------------------------------------------------------------

class SampledWavelengths:
    """Plain pytree-ish container: lam and pdf are (..., N) arrays."""

    __slots__ = ("lam", "pdf")

    def __init__(self, lam, pdf):
        self.lam = lam
        self.pdf = pdf

    def terminate_secondary(self):
        """Collapse to wavelength 0 only (hero wavelength): pdf of the other
        lanes goes to 0, lane-0 pdf divides by N.  Reference:
        SampledWavelengths::TerminateSecondary, spectrum.h:185."""
        already = jnp.all(self.pdf[..., 1:] == 0.0, axis=-1, keepdims=True)
        new_pdf = jnp.concatenate(
            [self.pdf[..., :1] / N_SPECTRUM_SAMPLES, jnp.zeros_like(self.pdf[..., 1:])],
            axis=-1,
        )
        pdf = jnp.where(already, self.pdf, new_pdf)
        return SampledWavelengths(self.lam, pdf)

    def tree_flatten(self):
        return (self.lam, self.pdf), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


import jax.tree_util  # noqa: E402

jax.tree_util.register_pytree_node(
    SampledWavelengths,
    SampledWavelengths.tree_flatten,
    SampledWavelengths.tree_unflatten,
)


def sample_wavelengths_uniform(u):
    """Stratified uniform wavelength sampling; u: (...,) in [0,1).

    Reference: SampledWavelengths::SampleUniform, spectrum.h:155."""
    lam0 = LAMBDA_MIN + u[..., None] * (LAMBDA_MAX - LAMBDA_MIN)
    delta = (LAMBDA_MAX - LAMBDA_MIN) / N_SPECTRUM_SAMPLES
    offs = jnp.arange(N_SPECTRUM_SAMPLES, dtype=lam0.dtype) * delta
    lam = lam0 + offs
    lam = jnp.where(lam > LAMBDA_MAX, LAMBDA_MIN + (lam - LAMBDA_MAX), lam)
    pdf = jnp.full_like(lam, 1.0 / (LAMBDA_MAX - LAMBDA_MIN))
    return SampledWavelengths(lam, pdf)


def _visible_pdf(lam):
    # pbrt's VisibleWavelengthsPDF: 0.0039398042f / cosh^2(0.0072f*(lam-538))
    c = jnp.cosh(0.0072 * (lam - 538.0))
    pdf = 0.0039398042 / (c * c)
    return jnp.where((lam >= LAMBDA_MIN) & (lam <= LAMBDA_MAX), pdf, 0.0)


def sample_wavelengths_visible(u):
    """Importance-sample wavelengths ~ photopic sensitivity; u: (...,).

    Reference: SampleVisibleWavelengths, spectrum.h:149 — inverse of the
    sech^2 pdf above, stratified over N lanes."""
    up = u[..., None] + jnp.arange(N_SPECTRUM_SAMPLES, dtype=u.dtype) / N_SPECTRUM_SAMPLES
    up = jnp.where(up > 1.0, up - 1.0, up)
    lam = 538.0 - 138.888889 * jnp.arctanh(0.85691062 - 1.82750197 * up)
    lam = jnp.clip(lam, LAMBDA_MIN, LAMBDA_MAX)
    return SampledWavelengths(lam, _visible_pdf(lam))


# ---------------------------------------------------------------------------
# spectrum distributions (host-side constructors -> per-lambda evaluation)
# ---------------------------------------------------------------------------

class DenselySampledSpectrum:
    """1nm-sampled spectrum over [LAMBDA_MIN, LAMBDA_MAX] held as a (471,)
    array; evaluation is a rounded gather.  Reference: spectrum.h
    DenselySampledSpectrum."""

    def __init__(self, values):
        self.values = jnp.asarray(values, jnp.float32)

    def __call__(self, lam):
        idx = jnp.clip(jnp.round(lam - LAMBDA_MIN).astype(jnp.int32), 0, self.values.shape[0] - 1)
        return self.values[idx]


def constant_spectrum(c):
    def f(lam):
        return jnp.full(jnp.shape(lam), jnp.float32(c))
    return f


def blackbody(lam_nm, T):
    """Planck's law, W/(m^2 sr m); lam in nm. Reference: spectrum.cpp
    Blackbody()."""
    lam = lam_nm * 1e-9
    c = 299792458.0
    h = 6.62606957e-34
    kb = 1.3806488e-23
    l5 = lam ** 5
    return (2.0 * h * c * c) / (l5 * (jnp.exp(jnp.minimum((h * c) / (lam * kb * T), 80.0)) - 1.0))


def blackbody_normalized(T):
    """Blackbody normalized so its max over the visible range is 1
    (reference BlackbodySpectrum: divides by value at Wien peak)."""
    lam_max_nm = 2.8977721e-3 / T * 1e9
    peak = blackbody(jnp.asarray(lam_max_nm), T)

    def f(lam):
        return blackbody(lam, T) / peak

    return f


def d_illuminant(T=6504.0):
    """Approximate daylight illuminant as a normalized blackbody at the
    correlated color temperature.  Stand-in for the reference's tabulated
    CIE D65 (spectrum.cpp); within a few percent across the visible range,
    indistinguishable under MC noise for the target scenes."""
    return blackbody_normalized(T)


# Smits-style smooth RGB->spectrum basis. Public method (Smits 1999,
# "An RGB to Spectrum Conversion for Reflectances"): express the RGB triple in
# a white/cyan/magenta/yellow/r/g/b box basis. The reference instead uses
# Jakob & Hanika 2019 sigmoid-polynomial tables (rgb2spec_opt.cpp); we trade
# a small amount of smoothness for having no fitted tables. Used only for
# textured RGB reflectances — the benchmark volumetric scenes use constant
# spectra.
_SMITS_LAMBDA = np.array([380.0, 417.8, 455.6, 493.3, 531.1, 568.9, 606.7, 644.4, 682.2, 720.0])
_SMITS_WHITE = np.array([1.0, 1.0, .9999, .9993, .9992, .9998, 1.0, 1.0, 1.0, 1.0])
_SMITS_CYAN = np.array([.9710, .9426, 1.0007, 1.0007, 1.0007, 1.0007, .1564, .0000, .0000, .0000])
_SMITS_MAGENTA = np.array([1.0, 1.0, .9685, .2229, .0000, .0458, .8369, 1.0, 1.0, .9959])
_SMITS_YELLOW = np.array([.0001, .0000, .1088, .6651, 1.0, 1.0, .9996, .9586, .9685, .9840])
_SMITS_RED = np.array([.1012, .0515, .0000, .0000, .0000, .0000, .8325, 1.0149, 1.0149, 1.0149])
_SMITS_GREEN = np.array([.0000, .0000, .0273, .7937, 1.0, .9418, .1719, .0000, .0000, .0025])
_SMITS_BLUE = np.array([1.0, 1.0, .8916, .3323, .0000, .0000, .0003, .0369, .0483, .0496])


def _smits_interp(table, lam):
    return jnp.interp(lam, jnp.asarray(_SMITS_LAMBDA, jnp.float32), jnp.asarray(table, jnp.float32))


def rgb_albedo_spectrum(rgb):
    """RGB reflectance -> smooth spectrum callable. rgb: python/np triple."""
    r, g, b = float(rgb[0]), float(rgb[1]), float(rgb[2])

    def f(lam):
        out = jnp.zeros(jnp.shape(lam), jnp.float32)
        if r <= g and r <= b:
            out = out + r * _smits_interp(_SMITS_WHITE, lam)
            if g <= b:
                out = out + (g - r) * _smits_interp(_SMITS_CYAN, lam)
                out = out + (b - g) * _smits_interp(_SMITS_BLUE, lam)
            else:
                out = out + (b - r) * _smits_interp(_SMITS_CYAN, lam)
                out = out + (g - b) * _smits_interp(_SMITS_GREEN, lam)
        elif g <= r and g <= b:
            out = out + g * _smits_interp(_SMITS_WHITE, lam)
            if r <= b:
                out = out + (r - g) * _smits_interp(_SMITS_MAGENTA, lam)
                out = out + (b - r) * _smits_interp(_SMITS_BLUE, lam)
            else:
                out = out + (b - g) * _smits_interp(_SMITS_MAGENTA, lam)
                out = out + (r - b) * _smits_interp(_SMITS_RED, lam)
        else:
            out = out + b * _smits_interp(_SMITS_WHITE, lam)
            if r <= g:
                out = out + (r - b) * _smits_interp(_SMITS_YELLOW, lam)
                out = out + (g - r) * _smits_interp(_SMITS_GREEN, lam)
            else:
                out = out + (g - b) * _smits_interp(_SMITS_YELLOW, lam)
                out = out + (r - g) * _smits_interp(_SMITS_RED, lam)
        return jnp.clip(out, 0.0, None)

    return f


# ---------------------------------------------------------------------------
# SampledSpectrum -> color
# ---------------------------------------------------------------------------

def to_xyz(values, swl: SampledWavelengths):
    """MC estimate of the XYZ tristimulus of a spectral radiance sample.

    values, swl.lam, swl.pdf: (..., N).  Returns (..., 3).
    Reference: SampledSpectrum::ToXYZ, spectrum.cpp."""
    xyz = cie_xyz(swl.lam)  # (..., N, 3)
    w = jnp.where(swl.pdf > 0.0, values / jnp.where(swl.pdf > 0.0, swl.pdf, 1.0), 0.0)
    return jnp.mean(w[..., None] * xyz, axis=-2) / CIE_Y_INTEGRAL


def y_luminance(values, swl: SampledWavelengths):
    yy = cie_y(swl.lam)
    w = jnp.where(swl.pdf > 0.0, values / jnp.where(swl.pdf > 0.0, swl.pdf, 1.0), 0.0)
    return jnp.mean(w * yy, axis=-1) / CIE_Y_INTEGRAL


def spectrum_to_photometric(spec_fn):
    """Luminous scale factor K such that K * integral(spec * V(lambda)) = 1
    photometric unit — reference SpectrumToPhotometric (spectrum.cpp) used to
    normalize light 'scale'/'power' parameters."""
    lam = np.arange(LAMBDA_MIN, LAMBDA_MAX + 1.0, 1.0, dtype=np.float32)
    v = np.asarray(spec_fn(jnp.asarray(lam)))
    y = np.asarray(cie_y(jnp.asarray(lam)))
    integ = float(np.sum(v * y))
    return 683.0 * integ / CIE_Y_INTEGRAL if integ > 0 else 0.0


def rgb_to_spectrum_smits_batched(rgb, lam):
    """Branch-free batched Smits RGB->spectrum evaluation.

    rgb: (..., 3) reflectance-scale values; lam: (..., L) wavelengths;
    returns (..., L).  Vectorized version of rgb_albedo_spectrum for
    per-voxel RGB media (RGBGridMedium, media.h:355): all three component
    orderings are evaluated and masked, so the whole batch stays on the VPU.
    """
    import jax.numpy as jnp

    r = rgb[..., 0:1]
    g = rgb[..., 1:2]
    b = rgb[..., 2:3]
    white = _smits_interp(_SMITS_WHITE, lam)
    cyan = _smits_interp(_SMITS_CYAN, lam)
    magenta = _smits_interp(_SMITS_MAGENTA, lam)
    yellow = _smits_interp(_SMITS_YELLOW, lam)
    red = _smits_interp(_SMITS_RED, lam)
    green = _smits_interp(_SMITS_GREEN, lam)
    blue = _smits_interp(_SMITS_BLUE, lam)

    # case r <= g, r <= b
    c1 = (r <= g) & (r <= b)
    c1a = g <= b
    out1 = r * white + jnp.where(
        c1a,
        (g - r) * cyan + (b - g) * blue,
        (b - r) * cyan + (g - b) * green,
    )
    # case g <= r, g <= b
    c2 = (g <= r) & (g <= b) & ~c1
    c2a = r <= b
    out2 = g * white + jnp.where(
        c2a,
        (r - g) * magenta + (b - r) * blue,
        (b - g) * magenta + (r - b) * red,
    )
    # case b smallest
    c3a = r <= g
    out3 = b * white + jnp.where(
        c3a,
        (r - b) * yellow + (g - r) * green,
        (g - b) * yellow + (r - g) * red,
    )
    out = jnp.where(c1, out1, jnp.where(c2, out2, out3))
    return jnp.clip(out, 0.0, None)


# ---------------------------------------------------------------------------
# Sigmoid-polynomial RGB -> spectrum (Jakob & Hanika 2019)
# ---------------------------------------------------------------------------
# Reference: RGBSigmoidPolynomial (util/spectrum.h) + the table generator
# cmd/rgb2spec_opt.cpp (915 LoC, Gauss-Newton per lattice point on CPU
# threads).  TPU reshape: the whole coefficient lattice is fit as ONE batched
# Levenberg-Marquardt in jax — every lattice point a lane, jacfwd for the
# 3x3 normal equations, ~60 vectorized iterations total instead of millions
# of scalar solver calls.  Error is minimized in linear sRGB (the reference
# uses CIELAB deltaE; both drive residuals to ~0 for in-gamut colors, where
# the parameterization is exact).

_SRGB_XYZ_TO_RGB = np.array([
    [3.2406, -1.5372, -0.4986],
    [-0.9689, 1.8758, 0.0415],
    [0.0557, -0.2040, 1.0570]], np.float64)


def sigmoid(x):
    """s(x) = 1/2 + x / (2 sqrt(1 + x^2))  (spectrum.h RGBSigmoidPolynomial::s)."""
    return 0.5 + x / (2.0 * jnp.sqrt(1.0 + x * x))


def sigmoid_polynomial_eval(coeffs, lam):
    """Evaluate the sigmoid-polynomial reflectance model.

    coeffs: (..., 3) = (c0, c1, c2) on wavelength in nm;
    lam: (...,) nm.  Returns reflectance in (0, 1)."""
    x = (coeffs[..., 0] * lam + coeffs[..., 1]) * lam + coeffs[..., 2]
    return sigmoid(x)


def _rgb_of_sigmoid_coeffs(c, lam_grid, basis_rgb):
    """Model RGB of normalized-domain coeffs c (..., 3) under D65.

    lam_grid: (Q,) normalized in [0,1]; basis_rgb: (Q, 3) =
    M_xyz2rgb . (x,y,z-bar * D65) quadrature weights, normalized so a unit
    reflectance maps to RGB (1,1,1)."""
    x = (c[..., 0:1] * lam_grid + c[..., 1:2]) * lam_grid + c[..., 2:3]
    s = sigmoid(x)                                     # (..., Q)
    return s @ basis_rgb                               # (..., 3)


def _sigmoid_fit_basis(q: int = 95):
    lam_nm = np.linspace(LAMBDA_MIN, LAMBDA_MAX, q)
    lam01 = (lam_nm - LAMBDA_MIN) / (LAMBDA_MAX - LAMBDA_MIN)
    import jax

    ill = np.asarray(d_illuminant()(jnp.asarray(lam_nm, jnp.float32)),
                     np.float64)
    xyz = np.asarray(cie_xyz(jnp.asarray(lam_nm, jnp.float32)), np.float64)
    w = xyz * ill[:, None]
    w /= (ill * xyz[:, 1]).sum()                       # white -> Y = 1
    basis = w @ _SRGB_XYZ_TO_RGB.T                     # (Q, 3)
    return (jnp.asarray(lam01, jnp.float32), jnp.asarray(basis, jnp.float32))


def fit_sigmoid_polynomial(rgb, iters: int = 60):
    """Batched LM fit of sigmoid-polynomial coefficients to linear-sRGB
    reflectances (the rgb2spec_opt.cpp optimization, one lane per color).

    rgb: (N, 3) in [0, 1].  Returns (N, 3) coefficients in the NM domain
    suitable for sigmoid_polynomial_eval."""
    import jax

    rgb = jnp.asarray(rgb, jnp.float32)
    lam01, basis = _sigmoid_fit_basis()

    def residual(c, target):
        return _rgb_of_sigmoid_coeffs(c, lam01, basis) - target

    jac = jax.jacfwd(residual)

    def step(carry, _):
        c, mu = carry
        r = residual(c, rgb)                           # (N, 3)
        J = jac(c, rgb) if c.ndim == 1 else jax.vmap(jac)(c, rgb)  # (N,3,3)
        JtJ = jnp.einsum("nij,nik->njk", J, J)
        Jtr = jnp.einsum("nij,ni->nj", J, r)
        A = JtJ + mu[:, None, None] * jnp.eye(3)
        dc = jnp.linalg.solve(A, Jtr[..., None])[..., 0]
        c_new = c - dc
        better = (jnp.sum(residual(c_new, rgb) ** 2, -1)
                  < jnp.sum(r ** 2, -1))
        c = jnp.where(better[:, None], c_new, c)
        mu = jnp.where(better, mu * 0.5, mu * 4.0)
        return (c, mu), None

    # init: flat spectrum at the mean reflectance -> c = (0, 0, logit)
    m = jnp.clip(rgb.mean(-1), 1e-3, 1 - 1e-3)
    z = (2 * m - 1) / (2.0 * jnp.sqrt(jnp.clip(m * (1 - m), 1e-6, None)))
    c0 = jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], -1)
    mu0 = jnp.full(rgb.shape[0], 1e-2)
    (c, _), _ = jax.lax.scan(step, (c0, mu0), None, length=iters)
    # normalized lam01 -> nm: x = a t^2 + b t + c, t = (lam - L0)/DL
    dl = LAMBDA_MAX - LAMBDA_MIN
    a, b, cc = c[..., 0], c[..., 1], c[..., 2]
    c0_nm = a / dl ** 2
    c1_nm = b / dl - 2 * a * LAMBDA_MIN / dl ** 2
    c2_nm = cc - b * LAMBDA_MIN / dl + a * (LAMBDA_MIN / dl) ** 2
    return jnp.stack([c0_nm, c1_nm, c2_nm], -1)


def make_rgb2spec_table(res: int = 32, iters: int = 60):
    """Generate an RGBToSpectrumTable-style coefficient lattice
    (rgb2spec_opt.cpp main loop): for each max-component axis l in {r,g,b}
    and lattice point (z = max value, x, y = other components / max), fit
    coefficients.  Returns (3, res, res, res, 3) float32 (l, z, y, x, c)."""
    import itertools

    zs = (np.arange(res) + 0.5) / res                  # max component
    xs = (np.arange(res) + 0.5) / res
    out = np.zeros((3, res, res, res, 3), np.float32)
    for l in range(3):
        zz, yy, xx = np.meshgrid(zs, xs, xs, indexing="ij")
        rgb = np.zeros(zz.shape + (3,), np.float32)
        rgb[..., l] = zz
        rgb[..., (l + 1) % 3] = xx * zz
        rgb[..., (l + 2) % 3] = yy * zz
        coeffs = fit_sigmoid_polynomial(rgb.reshape(-1, 3), iters=iters)
        out[l] = np.asarray(coeffs, np.float32).reshape(res, res, res, 3)
    return out


def rgb_albedo_spectrum_sigmoid(rgb, iters: int = 40):
    """RGB reflectance -> smooth sigmoid-polynomial spectrum callable
    (RGBAlbedoSpectrum, spectrum.h).  Direct per-color fit — no table
    needed when colors are known at scene-build time."""
    c = np.asarray(fit_sigmoid_polynomial(
        np.asarray(rgb, np.float32).reshape(1, 3), iters=iters))[0]
    cj = jnp.asarray(c)

    def f(lam):
        return sigmoid_polynomial_eval(cj, lam)

    return f


# ---------------------------------------------------------------------------
# Named spectra (util/spectrum.cpp GetNamedSpectrum) — deliberately NOT the
# reference's vendored measurement tables: optical glasses use the published
# Sellmeier dispersion coefficients (Schott datasheets), metals use coarse
# visible-range samples of the standard literature IOR measurements
# (Johnson & Christy 1972 for Au/Ag/Cu; Rakic 1995 for Al), and the standard
# illuminants reuse the analytic blackbody/daylight models above.
# ---------------------------------------------------------------------------

def _sellmeier(b, c):
    """n(lambda) from Sellmeier coefficients (lambda in nm -> um)."""
    b1, b2, b3 = b
    c1, c2, c3 = c

    def f(lam_nm):
        u2 = (lam_nm * 1e-3) ** 2
        n2 = 1.0 + b1 * u2 / (u2 - c1) + b2 * u2 / (u2 - c2) \
            + b3 * u2 / (u2 - c3)
        return jnp.sqrt(jnp.maximum(n2, 1.0))

    return f


_GLASS_SELLMEIER = {
    "glass-BK7": ((1.03961212, 0.231792344, 1.01046945),
                  (0.00600069867, 0.0200179144, 103.560653)),
    "glass-BAF10": ((1.5851495, 0.143559385, 1.08521269),
                    (0.00926681282, 0.0424489805, 105.613573)),
    "glass-FK51A": ((0.971247817, 0.216901417, 0.904651666),
                    (0.00472301995, 0.0153575612, 168.68133)),
    "glass-LASF9": ((2.00029547, 0.298926886, 1.80691843),
                    (0.0121426017, 0.0538736236, 156.530829)),
    "glass-F5": ((1.52481889, 0.187085527, 1.42729015),
                 (0.011254756, 0.0588995392, 129.141675)),
    "glass-F10": ((1.62153902, 0.256287842, 1.64447552),
                  (0.0122241457, 0.0595736775, 147.468793)),
    "glass-F11": ((1.73759695, 0.313747346, 1.89878101),
                  (0.013188707, 0.0623068142, 155.23629)),
}

# (lambda_nm, value) visible-range samples; linearly interpolated, clamped
_METAL_IOR = {
    "metal-Au-eta": ((400, 450, 500, 550, 600, 650, 700),
                     (1.658, 1.426, 0.855, 0.347, 0.180, 0.143, 0.131)),
    "metal-Au-k": ((400, 450, 500, 550, 600, 650, 700),
                   (1.956, 1.846, 1.895, 2.731, 3.068, 3.800, 4.103)),
    "metal-Ag-eta": ((400, 450, 500, 550, 600, 650, 700),
                     (0.054, 0.045, 0.050, 0.057, 0.059, 0.057, 0.041)),
    "metal-Ag-k": ((400, 450, 500, 550, 600, 650, 700),
                   (2.120, 2.568, 3.037, 3.464, 3.890, 4.296, 4.693)),
    "metal-Cu-eta": ((400, 450, 500, 550, 600, 650, 700),
                     (1.175, 1.150, 1.120, 1.041, 0.454, 0.221, 0.213)),
    "metal-Cu-k": ((400, 450, 500, 550, 600, 650, 700),
                   (2.163, 2.399, 2.598, 2.591, 3.010, 3.435, 3.808)),
    "metal-Al-eta": ((400, 450, 500, 550, 600, 650, 700),
                     (0.490, 0.618, 0.769, 0.958, 1.200, 1.468, 1.830)),
    "metal-Al-k": ((400, 450, 500, 550, 600, 650, 700),
                   (4.861, 5.471, 6.080, 6.690, 7.260, 7.790, 8.310)),
    # brass (CuZn) ~ Cu shifted toward yellow; MgO/TiO2 are dielectric-like
    "metal-CuZn-eta": ((400, 500, 600, 700),
                       (1.350, 0.960, 0.450, 0.440)),
    "metal-CuZn-k": ((400, 500, 600, 700),
                     (1.750, 2.050, 3.000, 3.650)),
    "metal-MgO-eta": ((400, 550, 700), (1.762, 1.737, 1.724)),
    "metal-MgO-k": ((400, 550, 700), (0.0, 0.0, 0.0)),
    "metal-TiO2-eta": ((400, 500, 600, 700),
                       (2.98, 2.73, 2.61, 2.55)),
    "metal-TiO2-k": ((400, 500, 600, 700), (0.0, 0.0, 0.0, 0.0)),
}


def named_spectrum(name):
    """Spectrum callable for a pbrt named spectrum, or None if unknown."""
    if name in _GLASS_SELLMEIER:
        return _sellmeier(*_GLASS_SELLMEIER[name])
    if name in _METAL_IOR:
        lam_t, v_t = _METAL_IOR[name]
        lam_a = jnp.asarray(lam_t, jnp.float32)
        v_a = jnp.asarray(v_t, jnp.float32)

        def f(lam_nm):
            return jnp.interp(jnp.asarray(lam_nm, jnp.float32), lam_a, v_a)

        return f
    if name == "stdillum-A":
        return blackbody_normalized(2856.0)
    if name == "stdillum-D50":
        return d_illuminant(5003.0)
    if name in ("stdillum-D65", "stdillum-dci", "canonical"):
        return d_illuminant(6504.0)
    if name == "illum-acesD60":
        return d_illuminant(6000.0)
    return None
