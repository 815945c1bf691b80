"""Fused-vs-staged estimator twin validation (VERDICT r1 #7).

`models/integrators/volpath.py` (staged: delta_track / ratio_track / HG
stages) and `volpath_fused.py` (program-counter megakernel) implement the
same null-scattering estimator (reference volpath_custom.cpp:280-728) and
consume per-ray RNG draws in the same order, so on shared streams their
radiance estimates must agree to float-reassociation tolerance.  This is the
regression gate for every future fused-kernel optimization.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.integrators import volpath as vp_staged
from acceleratedvolrenderer_tpu.models.integrators import volpath_fused as vp_fused
from acceleratedvolrenderer_tpu.models.media import MediumSpec, homogeneous_box
from acceleratedvolrenderer_tpu.ops import dda
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm


def flat(c):
    return sp.constant_spectrum(c)


def _rays(res=8, eye=(0.5, 0.5, -2.0)):
    cam = PerspectiveCamera(
        c2w=vm.look_at(eye, (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=30.0, width=res, height=res)
    ys, xs = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1)
                      .astype(np.int32))
    N = res * res
    off = jnp.full((N, 2), 0.5)
    o, d = cam.generate_rays(pix, off, None)
    rng = (jnp.arange(N, dtype=jnp.uint32) * jnp.uint32(2654435761)
           + jnp.uint32(12345))
    rng, ul = dda.pcg_uniform(rng)
    swl = sp.sample_wavelengths_visible(ul)
    return o, d, swl.lam, rng


def _arrays(med_spec, lam):
    sa = med_spec.sigma_a_spec(lam) * med_spec.scale
    ss = med_spec.sigma_s_spec(lam) * med_spec.scale
    Le = (med_spec.Le_spec(lam) * med_spec.Le_scale
          if med_spec.Le_spec is not None else jnp.zeros_like(lam))
    density = (jnp.asarray(med_spec.density, jnp.float32)
               if med_spec.density is not None
               else jnp.ones((1, 1, 1), jnp.float32))
    majorant = jnp.asarray(med_spec.build_majorant())
    return dda.MediumArrays(
        density=density, majorant=majorant,
        w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
        g=jnp.float32(med_spec.g), sigma_a=sa, sigma_s=ss, Le=Le)


def _both(med_spec, lights, max_depth=6):
    o, d, lam, rng = _rays()
    med = _arrays(med_spec, lam)
    kw = dict(maj_res=med_spec.maj_res(), homogeneous=med_spec.homogeneous,
              max_depth=max_depth)
    r1 = vp_staged.li(med, lights, o, d, lam, rng, **kw)
    r2 = vp_fused.li(med, lights, o, d, lam, rng, **kw)
    return np.asarray(r1.L), np.asarray(r2.L)


def test_twin_fog_box():
    """Homogeneous absorbing+scattering+emissive fog box under an env
    light: shared streams => allclose at float tolerance."""
    med = homogeneous_box(flat(0.3), flat(0.8), lo=(0, 0, 0), hi=(1, 1, 1),
                          g=0.4, Le_spec=flat(0.2))
    L1, L2 = _both(med, [lm.UniformInfiniteLight(spectrum=flat(1.0))])
    assert np.isfinite(L1).all() and np.isfinite(L2).all()
    assert L1.mean() > 0.1
    np.testing.assert_allclose(L1, L2, rtol=2e-4, atol=2e-5)


def test_twin_density_grid():
    """Heterogeneous density grid + distant light."""
    rs = np.random.RandomState(7)
    dens = rs.rand(12, 12, 12).astype(np.float32) * 2.0
    med = MediumSpec(
        sigma_a_spec=flat(0.4), sigma_s_spec=flat(1.2),
        density=dens, g=-0.2)
    lights = [lm.DistantLight(direction=(0.3, -1.0, 0.2),
                              spectrum=flat(3.0))]
    L1, L2 = _both(med, lights)
    assert np.isfinite(L1).all() and np.isfinite(L2).all()
    assert L1.mean() > 1e-3
    np.testing.assert_allclose(L1, L2, rtol=2e-4, atol=2e-5)


def test_twin_rgb_mode_statistical():
    """RGB-grid mode exists only in the fused kernel; for a grey RGB grid
    it is the same medium as a scalar grid with constant spectra, so the
    MC means must agree (the per-collision uplift changes RNG stream usage,
    so the check is statistical, not per-ray)."""
    rs = np.random.RandomState(3)
    dens = rs.rand(8, 8, 8).astype(np.float32) + 0.2
    sa_c, ss_c = 0.3, 1.0

    spec_med = MediumSpec(sigma_a_spec=flat(sa_c), sigma_s_spec=flat(ss_c),
                          density=dens, g=0.0)
    rgb_med = MediumSpec(
        sigma_a_spec=flat(sa_c), sigma_s_spec=flat(ss_c), g=0.0,
        sigma_a_rgb=np.repeat(dens[..., None] * sa_c, 3, -1),
        sigma_s_rgb=np.repeat(dens[..., None] * ss_c, 3, -1))

    lights = [lm.UniformInfiniteLight(spectrum=flat(1.0))]
    res, reps = 8, 24
    means = []
    for spec in (spec_med, rgb_med):
        o0, d0, _, _ = _rays(res)
        tot, cnt = 0.0, 0
        for rep in range(reps):
            rng = (jnp.arange(res * res, dtype=jnp.uint32)
                   * jnp.uint32(2654435761) + jnp.uint32(1000 + rep))
            rng, ul = dda.pcg_uniform(rng)
            swl = sp.sample_wavelengths_visible(ul)
            med = _arrays(spec, swl.lam)
            if spec.rgb:
                med = med._replace(
                    sigma_a_rgb=jnp.asarray(spec.sigma_a_rgb, jnp.float32),
                    sigma_s_rgb=jnp.asarray(spec.sigma_s_rgb, jnp.float32))
            r = vp_fused.li(med, lights, o0, d0, swl.lam, rng,
                            maj_res=spec.maj_res(), homogeneous=False,
                            max_depth=8, rgb_mode=spec.rgb)
            tot += float(jnp.mean(r.L))
            cnt += 1
        means.append(tot / cnt)
    assert abs(means[0] - means[1]) / means[0] < 0.05, means
