"""IntegrationAnalyzer — diagnostic pass for the graph radiance cache.

Reference: src/graph/analysis/integration_analyzer.{h,cpp} ("analyzer"
integrator, cpu/integrators.cpp:3699): for chosen pixels, camera rays are
delta-tracked through the medium and every real-scatter point is tested
against the cache — what fraction lands within the node (vertex) radius of
some vertex (:64-67), what fraction within some vertex's render search
range (:69-77), and the average distance to the in-range vertices (:80).

TPU-native: one batched trace (graph.builder.trace_scatter_paths) yields
all scatter points for all requested pixels at once; both radius tests are
27-cell voxel-hash gathers over the same ConnectIndex the GraphIntegrator
renders with, so the analyzer measures exactly the lookup structure used
at render time.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..models.integrators.graph import ConnectIndex, build_connect_index
from ..ops import dda
from . import builder as builder_mod
from .model import Graph


@dataclass
class AnalysisResult:
    total_scatters: int
    node_scatters: int       # within vertex radius of some vertex
    search_scatters: int     # within some vertex's render search range
    avg_in_range_dist: float

    @property
    def node_fraction(self) -> float:
        return self.node_scatters / max(self.total_scatters, 1)

    @property
    def search_fraction(self) -> float:
        return self.search_scatters / max(self.total_scatters, 1)

    def __str__(self):
        return (f"{self.node_scatters} / {self.total_scatters} "
                f"({self.node_fraction:.3f}) | "
                f"{self.search_scatters} / {self.total_scatters} "
                f"({self.search_fraction:.3f}), {self.avg_in_range_dist:.5f}")


def _candidate_d2(index: ConnectIndex, p, search_range):
    """27-cell candidate squared distances (N, 27K) + per-candidate search
    ranges; invalid candidates get inf distance."""
    N = p.shape[0]
    nx, ny, nz = index.dims
    K = index.table.shape[1]
    ci = jnp.floor((p - index.grid_lo) / index.cell_size).astype(jnp.int32)
    offs = jnp.asarray(
        [(dx, dy, dz) for dz in (-1, 0, 1) for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], jnp.int32)
    cells = ci[:, None, :] + offs[None, :, :]
    ok = jnp.all((cells >= 0) & (cells < jnp.asarray([nx, ny, nz])), axis=-1)
    flat = (cells[..., 2] * ny + cells[..., 1]) * nx + cells[..., 0]
    cand = index.table[jnp.where(ok, flat, 0)]
    cand = jnp.where(ok[..., None], cand, -1).reshape(N, 27 * K)
    valid = cand >= 0
    cpos = index.positions[jnp.maximum(cand, 0)]
    d2 = jnp.sum((cpos - p[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    sr = search_range[jnp.maximum(cand, 0)]
    return d2, sr


def analyze(scene, graph: Graph, pixels, spp: int = 4) -> AnalysisResult:
    """Run the analyzer over `pixels` ((M, 2) int array of (x, y))."""
    med_spec = scene.medium
    cam = scene.camera
    pixels = np.atleast_2d(np.asarray(pixels, np.int32))
    M = pixels.shape[0]

    density = jnp.asarray(med_spec.density, jnp.float32) \
        if med_spec.density is not None else jnp.ones((1, 1, 1))
    majorant = jnp.asarray(med_spec.build_majorant())
    lam = jnp.full((M * spp, 4), 550.0)
    sa = med_spec.sigma_a_spec(lam) * med_spec.scale
    ss = med_spec.sigma_s_spec(lam) * med_spec.scale
    med = dda.MediumArrays(
        density=density, majorant=majorant,
        w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
        g=jnp.float32(med_spec.g), sigma_a=sa, sigma_s=ss,
        Le=jnp.zeros_like(lam))

    pix_rep = jnp.asarray(np.repeat(pixels, spp, axis=0))
    o, d = cam.generate_rays(pix_rep, jnp.full((M * spp, 2), 0.5), None)
    rng = dda.seed_stream(jnp.arange(M * spp, dtype=jnp.uint32),
                          jnp.zeros((M * spp,), jnp.uint32),
                          salt=scene.seed + 99)
    pts, valid, _ = builder_mod.trace_scatter_paths(
        med, o, d, rng, med_spec.maj_res(), med_spec.homogeneous,
        max_depth=scene.max_depth)

    p = pts.reshape(-1, 3)
    v = np.asarray(valid).reshape(-1)
    total = int(v.sum())
    if total == 0 or graph.n_vertices == 0:
        return AnalysisResult(total, 0, 0, 0.0)

    index = build_connect_index(graph)
    sr = jnp.asarray(
        graph.search_range if graph.search_range is not None
        else np.full(graph.n_vertices, graph.vertex_radius * 4, np.float32))
    d2, cand_sr = _candidate_d2(index, jnp.asarray(p), sr)
    d2 = np.asarray(d2)
    cand_sr = np.asarray(cand_sr)

    in_node = (d2 <= index.vertex_radius ** 2).any(axis=1) & v
    in_range_mask = (d2 <= cand_sr ** 2) & v[:, None]
    in_range = in_range_mask.any(axis=1)
    dists = np.sqrt(d2[in_range_mask & np.isfinite(d2)]) \
        if in_range_mask.any() else np.zeros(0)
    return AnalysisResult(
        total_scatters=total,
        node_scatters=int(in_node.sum()),
        search_scatters=int(in_range.sum()),
        avg_in_range_dist=float(dists.mean()) if dists.size else 0.0,
    )
