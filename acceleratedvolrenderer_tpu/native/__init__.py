"""Native (C++) host-side runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; this package covers the host-side
pieces the reference implements natively: the graph builder's dynamic
KD-tree vertex merge (nanoflann, free_graph_builder.cpp:99-117) and the
kNN/radius queries behind render search ranges and the analyzer
(free_graph_builder.cpp:498-548, integration_analyzer.cpp:55+).

Compiled from kdtree.cpp with g++ on first use (no pybind11 in this image
— plain C ABI + ctypes); a cached .so lives next to the source.  Every
entry point has a pure-numpy fallback so the package works without a
toolchain (`is_available()` reports which path is active).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "kdtree.cpp"), os.path.join(_DIR, "lz4.cpp")]
_SO = os.path.join(_DIR, "_avrt_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < max(os.path.getmtime(s)
                                                   for s in _SRCS)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", *_SRCS, "-o", _SO + ".tmp"],
                    check=True, capture_output=True)
                os.replace(_SO + ".tmp", _SO)
            lib = ctypes.CDLL(_SO)
            lib.avrt_merge_points.restype = ctypes.c_int
            lib.avrt_merge_points.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_float,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
            lib.avrt_kd_build.restype = ctypes.c_void_p
            lib.avrt_kd_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
            lib.avrt_kd_free.argtypes = [ctypes.c_void_p]
            lib.avrt_kd_knn.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
            lib.avrt_kd_radius_stats.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p]
            lib.avrt_lz4_compress.restype = ctypes.c_int64
            lib.avrt_lz4_compress.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64]
            lib.avrt_lz4_decompress.restype = ctypes.c_int64
            lib.avrt_lz4_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def is_available() -> bool:
    return _load() is not None


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def merge_points(pts: np.ndarray, radius: float):
    """Sequential exact-radius merge (reference vertex-insertion
    semantics): returns (labels (n,), verts (V, 3), counts (V,)).

    Each point joins the nearest existing vertex within `radius` (in
    insertion order) or founds a new vertex at its own position."""
    pts = np.ascontiguousarray(pts, np.float32)
    n = len(pts)
    if n == 0:
        return (np.zeros(0, np.int32), np.zeros((0, 3), np.float32),
                np.zeros(0, np.int32))
    lib = _load()
    if lib is not None:
        labels = np.empty(n, np.int32)
        verts = np.empty((n, 3), np.float32)
        counts = np.zeros(n, np.int32)
        v = lib.avrt_merge_points(_ptr(pts), n, ctypes.c_float(radius),
                                  _ptr(labels), _ptr(verts), _ptr(counts))
        return labels, verts[:v].copy(), counts[:v].copy()
    # numpy fallback: same semantics, grid-hash accelerated
    cell = max(radius, 1e-6)
    r2 = radius * radius
    grid: dict = {}
    labels = np.empty(n, np.int32)
    verts: list = []
    counts: list = []
    keys = np.floor(pts / cell).astype(np.int64)
    for i in range(n):
        kx, ky, kz = keys[i]
        best, bestd2 = -1, r2
        for dz in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    for v in grid.get((kx + dx, ky + dy, kz + dz), ()):
                        d2 = float(np.sum((verts[v] - pts[i]) ** 2))
                        if d2 <= bestd2:
                            best, bestd2 = v, d2
        if best >= 0:
            labels[i] = best
            counts[best] += 1
        else:
            labels[i] = len(verts)
            grid.setdefault((kx, ky, kz), []).append(len(verts))
            verts.append(pts[i].copy())
            counts.append(1)
    return (labels, np.asarray(verts, np.float32),
            np.asarray(counts, np.int32))


class KDTree:
    """Static 3D KD-tree (nanoflann analogue) with kNN + radius stats."""

    def __init__(self, pts: np.ndarray):
        self.pts = np.ascontiguousarray(pts, np.float32)
        self.n = len(self.pts)
        self._lib = _load()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.avrt_kd_build(_ptr(self.pts), self.n)

    def __del__(self):
        if getattr(self, "_h", None) and self._lib is not None:
            self._lib.avrt_kd_free(self._h)
            self._h = None

    def knn(self, queries: np.ndarray, k: int):
        """Returns (idx (nq, k) int32 [-1 pad], d2 (nq, k) [inf pad])."""
        q = np.ascontiguousarray(queries, np.float32)
        nq = len(q)
        if self._h is not None:
            idx = np.empty((nq, k), np.int32)
            d2 = np.empty((nq, k), np.float32)
            self._lib.avrt_kd_knn(self._h, _ptr(q), nq, k, _ptr(idx), _ptr(d2))
            return idx, d2
        # numpy fallback (O(nq * n))
        d2f = ((q[:, None, :] - self.pts[None, :, :]) ** 2).sum(-1)
        kk = min(k, self.n)
        idx = np.argsort(d2f, axis=1)[:, :kk].astype(np.int32)
        d2 = np.take_along_axis(d2f, idx, axis=1).astype(np.float32)
        if kk < k:
            idx = np.pad(idx, ((0, 0), (0, k - kk)), constant_values=-1)
            d2 = np.pad(d2, ((0, 0), (0, k - kk)), constant_values=np.inf)
        return idx, d2

    def radius_stats(self, queries: np.ndarray, radius: float):
        """Returns (count (nq,), sum_d2 (nq,)) of points within radius."""
        q = np.ascontiguousarray(queries, np.float32)
        nq = len(q)
        if self._h is not None:
            counts = np.empty(nq, np.int32)
            sumd2 = np.empty(nq, np.float32)
            self._lib.avrt_kd_radius_stats(
                self._h, _ptr(q), nq, ctypes.c_float(radius * radius),
                _ptr(counts), _ptr(sumd2))
            return counts, sumd2
        d2f = ((q[:, None, :] - self.pts[None, :, :]) ** 2).sum(-1)
        m = d2f <= radius * radius
        return m.sum(1).astype(np.int32), np.where(m, d2f, 0).sum(1).astype(np.float32)


def lz4_compress_block(src: bytes):
    """Native LZ4 block encode; returns None when no toolchain is
    available (caller falls back to the pure-Python encoder)."""
    lib = _load()
    if lib is None:
        return None
    n = len(src)
    cap = n + n // 255 + 16
    dst = np.empty(cap, np.uint8)
    r = lib.avrt_lz4_compress(src, n, _ptr(dst), cap)
    if r < 0:
        raise ValueError("lz4: compress overflow")
    return dst[:r].tobytes()


def lz4_decompress_block(src: bytes, dst_size: int):
    """Native LZ4 block decode; returns None when unavailable."""
    lib = _load()
    if lib is None:
        return None
    dst = np.empty(max(dst_size, 1), np.uint8)
    r = lib.avrt_lz4_decompress(src, len(src), _ptr(dst), dst_size)
    if r != dst_size:
        raise ValueError(f"lz4: decoded {r} bytes, expected {dst_size}")
    return dst[:dst_size].tobytes()
