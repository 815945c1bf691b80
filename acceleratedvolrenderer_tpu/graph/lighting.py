"""LightingCalculator — turn the graph into a radiance cache.

Reference: src/graph/lighting_calculator.{h,cpp} —
  GetLightVector (:84-155): per-vertex initial light = MC transmittance from
    the light disk to the vertex sphere, * Inv4Pi (:152), parallel over
    vertices;
  GetTransportMatrix (:61-82): sparse T[i->j] = edgeSamples/vertexSamples
    (Eigen SparseMatrix<float>);
  ComputeFinalLight (:23-59): total light = sum_k T^k * L0 for k bounces
    with NaN/Inf early-stop, written into vertex.data.lightScalar (:55-56).

TPU-native: the transport matrix is (rows, cols, vals) COO arrays and the
power iteration is `bounces` segment-sum matvecs; the per-vertex MC uses the
same batched ratio-tracking march as the renderer (one (vertex, sample)
lane per ray) instead of a parallel-for over vertices.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.media import MediumSpec
from ..ops import dda, transmittance
from ..utils.math import INV_4PI
from .builder import _next_pow2
from .config import LightingCalculatorConfig
from .model import Graph


def light_vector(
    graph: Graph,
    med_spec: MediumSpec,
    light_dir: np.ndarray,
    n_rays: int,
    seed: int = 0,
    batch: int = 262144,
) -> np.ndarray:
    """Per-vertex MC transmittance from the directional light
    (GetLightVector, lighting_calculator.cpp:84-155).

    For each vertex: n_rays rays from outside the medium along the light
    direction toward uniform samples on the vertex sphere; L0 =
    mean(ratio-tracking T) * Inv4Pi.
    """
    V = graph.n_vertices
    if V == 0:
        return np.zeros((0,), np.float32)
    radius = graph.vertex_radius
    med = med_spec.build_arrays(jnp.zeros((1, 4)))
    maj_res = med_spec.maj_res()
    homogeneous = med_spec.homogeneous
    d = np.asarray(light_dir, np.float64)
    d = (d / np.linalg.norm(d)).astype(np.float32)
    diag = float(np.linalg.norm(np.asarray(med_spec.bounds_hi)
                                - np.asarray(med_spec.bounds_lo)))

    from ..ops.warps import sample_uniform_sphere

    out = np.zeros(V, np.float64)
    total = V * n_rays
    batch = min(batch, _next_pow2(total))
    dirs = jnp.asarray(np.broadcast_to(d, (batch, 3)))
    tmax = jnp.full((batch,), diag * 2.0)
    for start in range(0, total, batch):
        n = min(batch, total - start)
        # fixed-size batches (padded) => one compiled executable
        idx = np.arange(start, start + batch) % total
        v_idx = idx // n_rays
        active = jnp.asarray(np.arange(batch) < n)
        rng = dda.seed_stream(jnp.asarray(idx, jnp.uint32),
                              jnp.zeros(batch, jnp.uint32), salt=seed + 7)
        rng, ua = dda.pcg_uniform(rng)
        rng, ub = dda.pcg_uniform(rng)
        sphere = sample_uniform_sphere(jnp.stack([ua, ub], -1)) * radius
        targets = jnp.asarray(graph.positions[v_idx]) + sphere
        o = targets - dirs * (diag * 2.0)
        t = np.asarray(_tr_core(med, o, dirs, tmax, rng, active, maj_res,
                                homogeneous))
        np.add.at(out, v_idx[:n], t[:n])
    return (out / n_rays * INV_4PI).astype(np.float32)


@partial(jax.jit, static_argnames=("maj_res", "homogeneous"))
def _tr_core(med, o, dirs, tmax, rng, active, maj_res, homogeneous):
    res = transmittance.ratio_track(
        med, o, dirs, tmax, rng, active, maj_res, homogeneous=homogeneous,
    )
    # delta-light estimator: T_ray / avg(r_l)  (SampleLd delta branch)
    return res.T_ray[:, 0] / jnp.maximum(jnp.mean(res.r_l, -1), 1e-24)


def transport_matrix(graph: Graph):
    """COO transport: T[i->j] = edge_samples(i->j) / vertex_samples(i)
    (GetTransportMatrix, lighting_calculator.cpp:61-82)."""
    if graph.n_edges == 0:
        return (np.zeros(0, np.int32), np.zeros(0, np.int32), np.zeros(0, np.float32))
    vs = (graph.vertex_samples if graph.vertex_samples is not None
          else np.ones(graph.n_vertices, np.int32)).astype(np.float64)
    es = (graph.edge_samples if graph.edge_samples is not None
          else np.ones(graph.n_edges, np.int32)).astype(np.float64)
    rows = graph.edges[:, 0].astype(np.int32)   # from
    cols = graph.edges[:, 1].astype(np.int32)   # to
    vals = (es / np.maximum(vs[rows], 1.0)).astype(np.float32)
    return rows, cols, vals


#: edge count above which the power iteration runs on device.  Measured at
#: V=1e5, E=8e5, 32 bounces: host np.add.at 0.19 s vs device segment-sum
#: 0.15 s on the 2-core CPU backend (1.3x; the margin is the accelerator's
#: on TPU where the gather/segment-sum are vectorized and the graph arrays
#: are already resident from the builder).  Below ~1e5 edges dispatch
#: overhead dominates and the host loop wins.
_DEVICE_EDGE_THRESHOLD = 100_000


def compute_final_light(graph: Graph, L0: np.ndarray, bounces: int,
                        device: bool | None = None):
    """total = sum_{k=0..bounces} T^k L0 with NaN/Inf early stop
    (ComputeFinalLight, lighting_calculator.cpp:23-59).

    The sparse matvec is a segment-sum; `device=None` auto-selects the
    jitted device path for reference-scale graphs (>= ~1e5 edges) and the
    host loop for small ones.  Both paths produce the same result (gated
    by tests/test_graph.py)."""
    rows, cols, vals = transport_matrix(graph)
    V = graph.n_vertices
    if device is None:
        device = rows.size >= _DEVICE_EDGE_THRESHOLD
    if device and rows.size:
        return np.asarray(_final_light_device(
            jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals),
            jnp.asarray(L0, jnp.float32), V, bounces))
    total = L0.astype(np.float64).copy()
    cur = L0.astype(np.float64).copy()
    for _ in range(bounces):
        nxt = np.zeros(V, np.float64)
        if rows.size:
            np.add.at(nxt, cols, vals * cur[rows])
        if not np.all(np.isfinite(nxt)):
            break
        total += nxt
        cur = nxt
        if cur.max(initial=0.0) == 0.0:
            break
    return total.astype(np.float32)


@partial(jax.jit, static_argnames=("V", "bounces"))
def _final_light_device(rows, cols, vals, L0, V, bounces):
    """Power iteration as `bounces` device segment-sum matvecs with the
    reference's NaN/Inf early stop (lighting_calculator.cpp:38-47)."""

    def body(carry):
        total, cur, k, _stop = carry
        nxt = jax.ops.segment_sum(vals * cur[rows], cols, num_segments=V)
        bad = ~jnp.all(jnp.isfinite(nxt))
        zero = jnp.max(nxt, initial=0.0) == 0.0
        total = jnp.where(bad, total, total + nxt)
        return (total, nxt, k + 1, bad | zero)

    def cond(carry):
        _total, _cur, k, stop = carry
        return (k < bounces) & ~stop

    total, _, _, _ = jax.lax.while_loop(
        cond, body, (L0, L0, jnp.int32(0), jnp.bool_(False)))
    return total


@dataclass
class LightingCalculator:
    graph: Graph
    med_spec: MediumSpec
    light_dir: np.ndarray
    config: LightingCalculatorConfig
    seed: int = 0

    def run(self) -> Graph:
        L0 = light_vector(self.graph, self.med_spec, self.light_dir,
                          self.config.light_rays, seed=self.seed)
        self.graph.light_scalar = compute_final_light(
            self.graph, L0, self.config.bounces
        )
        return self.graph
