"""MLT tests: PSSMLT converges to the forward path-traced image
(cpu/integrators.cpp MLTIntegrator semantics; normalization via bootstrap)."""
import pytest
import numpy as np

from acceleratedvolrenderer_tpu.models import lights as lm
from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
from acceleratedvolrenderer_tpu.models.film import BoxFilter
from acceleratedvolrenderer_tpu.models.integrators import mlt as mlt_mod
from acceleratedvolrenderer_tpu.models.materials import DiffuseMaterial
from acceleratedvolrenderer_tpu.models.shapes import Quad, Sphere
from acceleratedvolrenderer_tpu.parallel import render as render_mod
from acceleratedvolrenderer_tpu.scene import Scene
from acceleratedvolrenderer_tpu.utils import spectrum as sp
from acceleratedvolrenderer_tpu.utils import vecmath as vm

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 #9 test tiering)


def flat(c):
    return sp.constant_spectrum(c)


def lum(img):
    return img @ np.array([0.2126, 0.7152, 0.0722])


def test_mlt_matches_path():
    floor = Quad(origin=np.array([-4.0, 0.0, -4.0]),
                 e1=np.array([8.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                 material=DiffuseMaterial(reflectance=flat(0.6)))
    ball = Sphere(center=np.array([0.0, 0.7, 0.5]), radius=0.7,
                  material=DiffuseMaterial(reflectance=flat(0.4)))
    lamp = Quad(origin=np.array([-1.0, 3.0, -0.5]),
                e1=np.array([2.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 2.0]),
                material=DiffuseMaterial(reflectance=flat(0.0),
                                         emission=flat(6.0)))
    cam = PerspectiveCamera(c2w=vm.look_at((0, 2.0, -5), (0, 0.5, 1), (0, 1, 0)),
                            fov_deg=55.0, width=10, height=10)
    scene = Scene(camera=cam, medium=None, lights=[], primitives=[floor, ball, lamp],
                  max_depth=4, filter=BoxFilter(), spp=256,
                  scene_radius=50.0, integrator="path")
    img_f, _ = render_mod.render(scene)
    img_m, stats = mlt_mod.render_mlt(scene, n_chains=2048, n_mutations=48,
                                      n_bootstrap=4096, seed=3)
    assert stats["b"] > 0
    a, b = lum(img_f).mean(), lum(img_m).mean()
    assert abs(a - b) / max(a, 1e-9) < 0.15, (a, b)
    # spatial agreement (coarse): correlation of pixel luminances
    fa = lum(img_f).reshape(-1)
    fb = lum(img_m).reshape(-1)
    corr = np.corrcoef(fa, fb)[0, 1]
    assert corr > 0.8, corr


def test_mlt_volumetric_converges_to_volpath():
    """Volumetric PSS-MLT (VERDICT r1 #6): on the fog box the MLT image
    mean must converge to the forward VolPath render (MLT is unbiased
    after the b normalization)."""
    import numpy as np

    from acceleratedvolrenderer_tpu.models import lights as lm
    from acceleratedvolrenderer_tpu.models.cameras import PerspectiveCamera
    from acceleratedvolrenderer_tpu.models.film import BoxFilter
    from acceleratedvolrenderer_tpu.models.integrators import mlt as mlt_mod
    from acceleratedvolrenderer_tpu.models.media import homogeneous_box
    from acceleratedvolrenderer_tpu.parallel import render as render_mod
    from acceleratedvolrenderer_tpu.scene import Scene
    from acceleratedvolrenderer_tpu.utils import spectrum as sp
    from acceleratedvolrenderer_tpu.utils import vecmath as vm

    def flat(c):
        return sp.constant_spectrum(c)

    med = homogeneous_box(flat(0.1), flat(0.9), lo=(0, 0, 0), hi=(1, 1, 1),
                          g=0.3)
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.5, 0.5, -3.0), (0.5, 0.5, 0.5), (0, 1, 0)),
        fov_deg=30.0, width=10, height=10)
    scene = Scene(
        camera=cam, medium=med,
        lights=[lm.DistantLight(direction=np.array([0.0, -1.0, 0.0]),
                                spectrum=flat(5.0), scene_radius=10.0)],
        max_depth=3, filter=BoxFilter(), spp=64, scene_radius=10.0)
    img_mlt, stats = mlt_mod.render_mlt(scene, n_chains=2048,
                                        n_mutations=48, n_bootstrap=8192,
                                        seed=3)
    img_ref, _ = render_mod.render(scene)
    assert stats["b"] > 0
    lum = np.array([0.2126, 0.7152, 0.0722])
    m_mlt = (img_mlt @ lum).mean()
    m_ref = (img_ref @ lum).mean()
    assert m_ref > 0 and m_mlt > 0
    assert abs(m_mlt - m_ref) / m_ref < 0.15, (m_mlt, m_ref)
    # bright region overlap: MLT concentrates samples where energy is
    bm = (img_mlt @ lum) > np.percentile(img_mlt @ lum, 60)
    br = (img_ref @ lum) > np.percentile(img_ref @ lum, 60)
    assert (bm & br).sum() / max(br.sum(), 1) > 0.5


def test_mlt_small_bright_light_occluder_stress():
    """MLT stress parity (VERDICT r3 #6): a SMALL bright area light with
    an occluder between the lamp and most of the floor — the transport
    class where PSS-MLT over unidirectional estimators is known to
    struggle (mode-locked chains, lost stratification vs the reference's
    multiplexed-BDPT-path mutations, cpu/integrators.cpp:3384+).  Gated
    against a dense forward path render; the accepted bounds are wider
    than the easy-scene test above and the residual gap is documented in
    docs/INVENTORY.md (MLT row)."""
    lamp = Quad(origin=np.array([-0.15, 2.5, 0.35]),
                e1=np.array([0.3, 0.0, 0.0]), e2=np.array([0.0, 0.0, 0.3]),
                material=DiffuseMaterial(reflectance=flat(0.0),
                                         emission=flat(300.0)))
    # occluder panel just below the lamp, leaving a slit on one side
    occ = Quad(origin=np.array([-1.4, 2.0, -0.3]),
               e1=np.array([1.8, 0.0, 0.0]), e2=np.array([0.0, 0.0, 1.6]),
               material=DiffuseMaterial(reflectance=flat(0.3)))
    floor = Quad(origin=np.array([-4.0, 0.0, -4.0]),
                 e1=np.array([8.0, 0.0, 0.0]), e2=np.array([0.0, 0.0, 8.0]),
                 material=DiffuseMaterial(reflectance=flat(0.6)))
    wall = Quad(origin=np.array([-4.0, 0.0, 3.0]),
                e1=np.array([8.0, 0.0, 0.0]), e2=np.array([0.0, 6.0, 0.0]),
                material=DiffuseMaterial(reflectance=flat(0.5)))
    cam = PerspectiveCamera(
        c2w=vm.look_at((0.0, 1.6, -4.5), (0.0, 0.8, 0.5), (0, 1, 0)),
        fov_deg=50.0, width=12, height=12)
    scene = Scene(camera=cam, medium=None, lights=[],
                  primitives=[floor, wall, occ, lamp],
                  max_depth=4, filter=BoxFilter(), spp=512,
                  scene_radius=50.0, integrator="path")
    img_f, _ = render_mod.render(scene)
    # r5 (VERDICT r4 weak #7): the r4 20%-energy budget was dominated by
    # normalization (b) variance on this spiky integrand.  Two mixing/
    # estimation improvements tightened it: every large-step proposal now
    # refines b (independent uniform samples, Kelemen §5), and the stress
    # config runs p_large=0.5 + a 2x bootstrap.  Measured over seeds
    # {5, 11, 23}: mean_err 2.2% / 10.1% / 5.3%, corr >= 0.97
    # (recorded in docs/INVENTORY.md MLT row); gate = 12% / 0.9.
    img_m, stats = mlt_mod.render_mlt(scene, n_chains=4096, n_mutations=64,
                                      n_bootstrap=32768, seed=5,
                                      p_large=0.5)
    assert stats["b"] > 0
    a, b = lum(img_f).mean(), lum(img_m).mean()
    assert a > 0 and b > 0
    assert abs(a - b) / a < 0.12, (a, b)
    # the indirectly-lit structure (floor gradient through the slit) must
    # correlate, not just the mean
    fa, fb = lum(img_f).reshape(-1), lum(img_m).reshape(-1)
    corr = np.corrcoef(fa, fb)[0, 1]
    assert corr > 0.9, corr
