"""Hair BxDF tests — the reference's bsdfs_test.cpp hair gates:
WhiteAlbedo (energy conservation at sigma_a = 0), sampling-weight
consistency E[f cos / pdf] finite and ~albedo, pdf normalization."""
import pytest
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.models import hair

pytestmark = pytest.mark.slow  # compile-heavy (VERDICT r1 #9 test tiering)


def _rand_wo(rng, n):
    v = rng.normal(size=(n, 3))
    return jnp.asarray(v / np.linalg.norm(v, axis=1, keepdims=True),
                       jnp.float32)


def test_white_albedo():
    """sigma_a = 0: all energy eventually leaves the fiber; the MC albedo
    estimate E[f |cos| / pdf] must be ~1 (bsdfs_test.cpp Hair WhiteAlbedo)."""
    rng = np.random.default_rng(0)
    prm = hair.HairParams(beta_m=0.4, beta_n=0.4)
    n = 4096
    wo = _rand_wo(rng, n)
    h = jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
    sigma_a = jnp.zeros((n, 3))
    u = jnp.asarray(rng.random((n, 4)), jnp.float32)
    wi, f, pdf = hair.hair_sample(wo, h, sigma_a, prm, u)
    w = np.asarray(f)[:, 0] * np.abs(np.asarray(wi)[:, 2]) \
        / np.maximum(np.asarray(pdf), 1e-9)
    ok = np.asarray(pdf) > 1e-7
    alb = w[ok].mean()
    assert 0.85 < alb < 1.15, alb


def test_absorption_reduces_albedo():
    rng = np.random.default_rng(1)
    prm = hair.HairParams(beta_m=0.3, beta_n=0.3)
    n = 4096
    wo = _rand_wo(rng, n)
    h = jnp.asarray(rng.uniform(-1, 1, n), jnp.float32)
    u = jnp.asarray(rng.random((n, 4)), jnp.float32)

    def albedo(sa):
        wi, f, pdf = hair.hair_sample(
            wo, h, jnp.full((n, 3), sa), prm, u)
        ok = np.asarray(pdf) > 1e-7
        w = (np.asarray(f)[:, 0] * np.abs(np.asarray(wi)[:, 2])
             / np.maximum(np.asarray(pdf), 1e-9))
        return w[ok].mean()

    assert albedo(2.0) < albedo(0.1) < 1.1


def test_pdf_normalizes():
    """Integral of pdf over the sphere ~ 1 (MC with uniform directions)."""
    rng = np.random.default_rng(2)
    prm = hair.HairParams(beta_m=0.5, beta_n=0.5)
    n = 8192
    wo = jnp.asarray([[0.3, 0.8, np.sqrt(1 - 0.09 - 0.64)]], jnp.float32)
    wo = jnp.tile(wo, (n, 1))
    wi = _rand_wo(rng, n)
    h = jnp.full((n,), 0.3)
    sigma_a = jnp.full((n, 3), 0.5)
    pdf = np.asarray(hair.hair_pdf(wo, wi, h, sigma_a, prm))
    integral = pdf.mean() * 4 * np.pi
    assert 0.8 < integral < 1.2, integral


def test_sigma_a_helpers():
    sa = hair.sigma_a_from_concentration(1.3, 0.0)
    assert sa.shape == (3,) and (sa > 0).all()
    sa2 = hair.sigma_a_from_reflectance([0.5, 0.3, 0.1], 0.3)
    assert (np.diff(sa2) > 0).all()   # darker channels absorb more


def test_cyhair_roundtrip(tmp_path):
    """Write a synthetic CyHair file, convert, parse the curves back."""
    import struct

    from acceleratedvolrenderer_tpu.cli import cyhair2pbrt
    from acceleratedvolrenderer_tpu.scene.parser import load_scene

    # two strands of 3 points each (2 segments each)
    pts = np.array([[0, 0, 0], [0, 1, 0], [0, 2, 0.3],
                    [1, 0, 0], [1, 1, 0.2], [1, 2, 0]], np.float32)
    path = tmp_path / "t.hair"
    with open(path, "wb") as f:
        f.write(b"HAIR")
        f.write(struct.pack("<IIII", 2, 6, 0b110, 0))  # points+thickness
        f.write(struct.pack("<ff", 0.1, 0.0))
        f.write(struct.pack("<fff", 0.2, 0.1, 0.05))
        f.write(b"\0" * 88)
        f.write(struct.pack("<2H", 2, 2))  # wait: segments flag off
    # rewrite with segments array included (flags bit0 too)
    with open(path, "wb") as f:
        f.write(b"HAIR")
        f.write(struct.pack("<IIII", 2, 6, 0b111, 0))
        f.write(struct.pack("<ff", 0.1, 0.0))
        f.write(struct.pack("<fff", 0.2, 0.1, 0.05))
        f.write(b"\0" * 88)
        f.write(struct.pack("<2H", 2, 2))
        f.write(pts.tobytes())
        f.write(np.full(6, 0.05, np.float32).tobytes())
    out = tmp_path / "hair.pbrt"
    rc = cyhair2pbrt.main([str(path), str(out)])
    assert rc == 0
    txt = out.read_text()
    assert txt.count('Shape "curve"') == 4  # 2 segments x 2 strands
    scene_txt = (
        'Camera "perspective" "float fov" [45]\n'
        'Film "rgb" "integer xresolution" [8] "integer yresolution" [8]\n'
        "WorldBegin\n"
        'LightSource "point" "rgb I" [5 5 5]\n' + txt)
    sf = tmp_path / "s.pbrt"
    sf.write_text(scene_txt)
    sc = load_scene(str(sf))
    assert len(sc.primitives) == 4
    assert type(sc.primitives[0]).__name__ == "Curve"
