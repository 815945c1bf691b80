"""VoxelBoundary tests (graph/voxels.py — voxel_boundary.cpp reshaped)."""
import numpy as np

from acceleratedvolrenderer_tpu.graph import voxels


def _sphere_majorant(res=24):
    """Majorant grid: nonzero inside a centered sphere of radius 0.35."""
    c = (np.arange(res) + 0.5) / res
    zz, yy, xx = np.meshgrid(c, c, c, indexing="ij")
    r = np.sqrt((xx - 0.5) ** 2 + (yy - 0.5) ** 2 + (zz - 0.5) ** 2)
    return (r < 0.35).astype(np.float32)


def test_capture_boundary_on_sphere():
    """Captured entry points sit near the sphere surface (the first
    non-zero-majorant crossing along rays from outside)."""
    maj = _sphere_majorant()
    g = voxels.capture_boundary(maj, np.zeros(3), np.ones(3),
                                equator_step=0.6, num_steps=12)
    assert g.n_vertices > 100
    r = np.linalg.norm(g.positions - 0.5, axis=1)
    # entry points land in the surface shell (voxelization widens it)
    assert r.mean() < 0.42 and r.mean() > 0.30
    assert (r < 0.5).all()


def test_shrink_to_count_and_single_layer():
    """Binary-searched spacing hits <= the target count; the single-layer
    pass keeps a closed one-voxel shell (every cell touches the exterior)."""
    maj = _sphere_majorant()
    g = voxels.capture_boundary(maj, np.zeros(3), np.ones(3),
                                equator_step=0.6, num_steps=12)
    uni = voxels.shrink_to_count(g, wanted_vertices=400)
    # the reference loop returns the final bisection midpoint, which may
    # land slightly on either side of the target (voxel_boundary.cpp:79-89)
    assert 0 < uni.n_vertices <= 400 * 1.3
    layer = voxels.to_single_layer(uni, np.zeros(3), np.ones(3))
    assert layer.kind == "uniform" and layer.n_vertices > 0
    r = np.linalg.norm(layer.positions - 0.5, axis=1)
    assert r.mean() < 0.5


def test_full_pipeline():
    maj = _sphere_majorant()
    out = voxels.capture_boundary_uniform(maj, np.zeros(3), np.ones(3),
                                          wanted_vertices=300,
                                          equator_step=0.8, num_steps=10)
    assert out.kind == "uniform"
    assert 0 < out.n_vertices
