"""Cloud-analog regression guards (scripts/parity.py cloud leg).

The r4 cloud photometric parity hinges on the artifact-masked analog:
voxels projected into the reference view through the EXR-header camera,
density modulated by the blurred occupancy mask.  These tests pin the
mask machinery (camera reconstruction, projection, mask carving) at a
tiny render so a regression is caught in the fast tier rather than in
the 320x180 spp-48 parity leg.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/disney-cloud-720p.exr"


@pytest.fixture(scope="module")
def ref():
    if not os.path.exists(REF):
        pytest.skip("reference artifact not available")
    from scripts import parity

    return parity.load_cloud_reference()


def test_reference_camera_reconstruction(ref):
    """Camera position/fov from the EXR transform headers (the r2/r3
    reconstruction the whole leg depends on)."""
    np.testing.assert_allclose(ref["c2w"][:3, 3],
                               [648.06, -82.47, -63.86], atol=0.5)
    assert abs(ref["fov"] - 31.07) < 0.1
    assert 0.2 < ref["coverage"] < 0.28
    assert ref["percentiles"][50] > 0.01


def test_masked_density_matches_silhouette(ref):
    """The carved density's own projected silhouette must track the
    artifact's: projecting every occupied voxel back into the reference
    view lands inside (a slight dilation of) the reference mask."""
    import jax.numpy as jnp

    from scripts import parity

    scene, (lo, hi) = parity.cloud_analog_scene(ref, W=64, H=36, spp=1)
    dens = np.asarray(scene.medium.density)
    assert dens.max() > 0
    # occupied fraction is in a sane band (the mask carves the blob)
    occ = (dens > 0).mean()
    assert 0.02 < occ < 0.6, occ
    nz, ny, nx = dens.shape
    zi, yi, xi = np.nonzero(dens > 0)
    pw = np.stack([lo[0] + xi / (nx - 1) * (hi[0] - lo[0]),
                   lo[1] + yi / (ny - 1) * (hi[1] - lo[1]),
                   lo[2] + zi / (nz - 1) * (hi[2] - lo[2])], -1)
    sel = np.random.default_rng(0).choice(len(pw), size=min(4000, len(pw)),
                                          replace=False)
    raster, _, inside = scene.camera.project(jnp.asarray(
        pw[sel], jnp.float32))
    raster = np.asarray(raster)
    inside = np.asarray(inside)
    assert inside.mean() > 0.95
    # dilated reference mask (the blur band widens the skirt)
    m = ref["mask"]
    md = m.copy()
    for _ in range(3):
        md[1:] |= md[:-1]; md[:-1] |= md[1:]
        md[:, 1:] |= md[:, :-1]; md[:, :-1] |= md[:, 1:]
    px = np.clip((raster[:, 0] / 64 * ref["W"]).astype(int), 0, ref["W"] - 1)
    py = np.clip((raster[:, 1] / 36 * ref["H"]).astype(int), 0, ref["H"] - 1)
    hit = md[py[inside], px[inside]]
    assert hit.mean() > 0.98, hit.mean()


def test_analog_tiny_render_coverage(ref):
    """End-to-end tiny render: silhouette coverage and centroid of the
    rendered analog track the artifact (loose bounds — the real gates
    run at 320x180 spp 48 in scripts/parity.py)."""
    from scripts import parity
    from acceleratedvolrenderer_tpu.parallel import render as render_mod

    scene, _ = parity.cloud_analog_scene(ref, W=48, H=27, spp=2)
    img, _ = render_mod.render_regen(scene, stochastic_filter=True)
    L = parity.lum(np.asarray(img))
    m = L > 1e-5
    assert m.any()
    cov = m.mean()
    assert abs(cov - ref["coverage"]) < 0.12, cov
    ys, xs = np.nonzero(m)
    cx, cy = xs.mean() / 48, ys.mean() / 27
    assert abs(cx - ref["centroid"][0]) < 0.1
    assert abs(cy - ref["centroid"][1]) < 0.1
