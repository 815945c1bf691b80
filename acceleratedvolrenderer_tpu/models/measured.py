"""Measured BRDFs — RGL (Dupuy & Jakob 2018) data-driven reflectance.

Reference: src/pbrt/bxdfs.{h,cpp} MeasuredBxDF (bxdfs.h:1021) +
MeasuredBxDFData (bxdfs.cpp:861) + the "tensor_file" binary reader
(bxdfs.cpp:577) and PiecewiseLinear2D warps (util/math.h).

The measured BRDF stores, per incident direction (theta_i, phi_i):
  - vndf:      visible-NDF warp over the half-vector unit square
  - luminance: a second warp correcting the sampled density toward the
               measured luminance
  - spectra:   5D interpolant of retro-transformed measurements
  - ndf/sigma: the fitted microfacet NDF and projected area
Evaluation (bxdfs.cpp MeasuredBxDF::f):
  f = spectra(R^-1(wm), phi_o, theta_o, lambda) * ndf(wm)
      / (4 * sigma(wo) * cos(theta_i))

TPU reshape: pbrt's PiecewiseLinear2D walks marginal/conditional CDF arrays
per thread with binary search and solves a per-cell linear equation.  Here
each warp is a pair of precomputed CDF tensors (numpy at load) and the
runtime Sample/Invert are fixed-iteration vectorized bisections over the
whole ray batch; the conditioning parameters (phi_i, theta_i[, lambda])
linearly blend the bracketing slices' CDFs inside the bisection (the same
interpolation the reference performs).  Densities are cell-averaged
(piecewise-constant) for the warps — Sample/Invert/pdf are mutually exact,
so MC estimates stay unbiased — while Evaluate (ndf/sigma/spectra) keeps
the reference's multilinear interpolation.
"""
from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# tensor_file I/O (bxdfs.cpp:577 Tensor)
# ---------------------------------------------------------------------------

_DTYPES = {
    1: np.uint8, 2: np.int8, 3: np.uint16, 4: np.int16, 5: np.uint32,
    6: np.int32, 7: np.uint64, 8: np.int64, 9: np.float16, 10: np.float32,
    11: np.float64,
}
_DTYPE_IDS = {np.dtype(v): k for k, v in _DTYPES.items()}


def read_tensor_file(path: str) -> dict:
    """Parse an RGL 'tensor_file' (the .bsdf container) -> {name: ndarray}."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:12] != b"tensor_file\x00":
        raise ValueError(f"{path}: invalid tensor file header")
    ver = (data[12], data[13])
    if ver != (1, 0):
        raise ValueError(f"{path}: unsupported tensor file version {ver}")
    (n_fields,) = struct.unpack_from("<I", data, 14)
    pos = 18
    out = {}
    for _ in range(n_fields):
        (name_len,) = struct.unpack_from("<H", data, pos)
        pos += 2
        name = data[pos:pos + name_len].decode()
        pos += name_len
        ndim, dtype = struct.unpack_from("<HB", data, pos)
        pos += 3
        (offset,) = struct.unpack_from("<Q", data, pos)
        pos += 8
        shape = struct.unpack_from("<" + "Q" * ndim, data, pos)
        pos += 8 * ndim
        np_dtype = _DTYPES[dtype]
        count = int(np.prod(shape)) if ndim else 1
        arr = np.frombuffer(data, np_dtype, count, offset).reshape(shape)
        out[name] = arr.copy()
    return out


def write_tensor_file(path: str, fields: dict):
    """Write {name: ndarray} in the RGL tensor_file layout (round-trips
    through read_tensor_file and the reference's Tensor reader)."""
    header = bytearray()
    header += b"tensor_file\x00" + bytes([1, 0])
    header += struct.pack("<I", len(fields))
    # compute directory size first
    dir_size = 18
    for name in fields:
        dir_size += 2 + len(name.encode()) + 3 + 8 + 8 * fields[name].ndim
    blobs = []
    offset = dir_size
    for name, arr in fields.items():
        arr = np.ascontiguousarray(arr)
        nb = name.encode()
        header += struct.pack("<H", len(nb)) + nb
        header += struct.pack("<HB", arr.ndim, _DTYPE_IDS[arr.dtype])
        header += struct.pack("<Q", offset)
        for s in arr.shape:
            header += struct.pack("<Q", s)
        blobs.append(arr.tobytes())
        offset += len(blobs[-1])
    with open(path, "wb") as f:
        f.write(bytes(header))
        for b in blobs:
            f.write(b)


# ---------------------------------------------------------------------------
# parameter-conditioned 2D warp
# ---------------------------------------------------------------------------

def _param_weights(values: np.ndarray, x):
    """Bracketing index + lerp weight for a conditioning parameter."""
    v = jnp.asarray(values, jnp.float32)
    n = v.shape[0]
    if n == 1:
        z = jnp.zeros(jnp.shape(x), jnp.int32)
        return z, jnp.zeros(jnp.shape(x), jnp.float32)
    i = jnp.clip(jnp.searchsorted(v, x, side="right") - 1, 0, n - 2)
    w = (x - v[i]) / jnp.maximum(v[i + 1] - v[i], 1e-9)
    return i, jnp.clip(w, 0.0, 1.0)


class PiecewiseLinear2D:
    """2D distribution over [0,1]^2 conditioned on up to 3 parameters.

    data: (*param_sizes, ny, nx) vertex values (pbrt stores size_x fastest).
    Evaluate = multilinear interpolation (params + xy), matching the
    reference; Sample/Invert use cell-averaged CDFs (see module docstring).
    """

    def __init__(self, data: np.ndarray, params: List[np.ndarray] = ()):
        data = np.asarray(data, np.float32)
        self.params = [np.asarray(p, np.float32) for p in params]
        psizes = tuple(p.shape[0] for p in self.params)
        assert data.shape[:len(psizes)] == psizes, (data.shape, psizes)
        self.ny, self.nx = data.shape[-2], data.shape[-1]
        S = int(np.prod(psizes)) if psizes else 1
        vals = data.reshape(S, self.ny, self.nx).astype(np.float64)
        self._vals = jnp.asarray(vals, jnp.float32)          # (S, ny, nx)
        # cell-averaged masses
        cell = 0.25 * (vals[:, :-1, :-1] + vals[:, :-1, 1:]
                       + vals[:, 1:, :-1] + vals[:, 1:, 1:])
        cell = np.maximum(cell, 0.0)
        row = cell.sum(-1)                                   # (S, ny-1)
        total = np.maximum(row.sum(-1), 1e-30)               # (S,)
        self._cell = jnp.asarray(cell, jnp.float32)
        self._row_cdf = jnp.asarray(np.cumsum(row, -1), jnp.float32)
        self._cond_cdf = jnp.asarray(np.cumsum(cell, -1), jnp.float32)
        self._total = jnp.asarray(total, jnp.float32)
        self._psizes = psizes

    # -- conditioning: bracketing slice ids + weights (K <= 8 slices) -----
    def _slices(self, pvals: Tuple):
        assert len(pvals) == len(self.params)
        if not self.params:
            n = jnp.shape(pvals[0])[0] if pvals else 1
            return [jnp.zeros((1,), jnp.int32)], [jnp.ones((1,), jnp.float32)]
        idxs, wts = [], []
        for p, x in zip(self.params, pvals):
            i, w = _param_weights(p, x)
            idxs.append(i)
            wts.append(w)
        # combine: slice id = sum_j i_j * stride_j
        strides = []
        s = 1
        for sz in reversed(self._psizes):
            strides.append(s)
            s *= sz
        strides = list(reversed(strides))
        sids, sws = [], []
        for bits in range(1 << len(self.params)):
            sid = 0
            w = 1.0
            for j in range(len(self.params)):
                hi = (bits >> j) & 1
                ij = jnp.minimum(idxs[j] + hi, self._psizes[j] - 1)
                sid = sid + ij * strides[j]
                w = w * jnp.where(hi, wts[j], 1.0 - wts[j])
            sids.append(sid)
            sws.append(w)
        return sids, sws

    def _gather(self, arr_flat, sids, sws, inner, idx):
        """Interpolated lookup arr[sid, idx] over bracketing slices."""
        out = 0.0
        for sid, w in zip(sids, sws):
            out = out + w * arr_flat[sid * inner + idx]
        return out

    def eval(self, u, pvals: Tuple = ()):  # multilinear, reference Evaluate
        sids, sws = self._slices(pvals)
        x = jnp.clip(u[..., 0], 0.0, 1.0) * (self.nx - 1)
        y = jnp.clip(u[..., 1], 0.0, 1.0) * (self.ny - 1)
        x0 = jnp.clip(x.astype(jnp.int32), 0, self.nx - 2)
        y0 = jnp.clip(y.astype(jnp.int32), 0, self.ny - 2)
        fx, fy = x - x0, y - y0
        flat = self._vals.reshape(-1)
        inner = self.ny * self.nx

        def at(dy, dx):
            return self._gather(flat, sids, sws, inner,
                                (y0 + dy) * self.nx + (x0 + dx))

        return ((1 - fx) * (1 - fy) * at(0, 0) + fx * (1 - fy) * at(0, 1)
                + (1 - fx) * fy * at(1, 0) + fx * fy * at(1, 1))

    def _bisect(self, cdf_flat, sids, sws, inner, n, lo_idx, target):
        """Largest count c in [0, n] with interp_cdf[c-1] <= target
        (c indexes cells; cdf entry i = mass of cells 0..i)."""
        lo = jnp.zeros_like(target, dtype=jnp.int32)
        hi = jnp.full_like(lo, n)

        def body(_, lh):
            lo, hi = lh
            mid = (lo + hi + 1) // 2
            v = self._gather(cdf_flat, sids, sws, inner,
                             lo_idx + jnp.maximum(mid - 1, 0))
            below = jnp.where(mid == 0, True, v <= target)
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid - 1)
            return lo, hi

        steps = int(np.ceil(np.log2(max(n, 2)))) + 1
        lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
        return jnp.clip(lo, 0, n - 1)

    def sample(self, u2, pvals: Tuple = ()):
        """Warp uniform u2 -> (p in [0,1]^2, pdf in unit-square measure)."""
        sids, sws = self._slices(pvals)
        ny1, nx1 = self.ny - 1, self.nx - 1
        rc_flat = self._row_cdf.reshape(-1)
        cc_flat = self._cond_cdf.reshape(-1)
        total = 0.0
        for sid, w in zip(sids, sws):
            total = total + w * self._total[sid]
        t_row = u2[..., 1] * total
        zero = jnp.zeros_like(t_row, dtype=jnp.int32)
        r = self._bisect(rc_flat, sids, sws, ny1, ny1, zero, t_row)
        cdf_lo = jnp.where(
            r > 0, self._gather(rc_flat, sids, sws, ny1,
                                jnp.maximum(r - 1, 0)), 0.0)
        row_mass = self._gather(rc_flat, sids, sws, ny1, r) - cdf_lo
        fy = jnp.clip((t_row - cdf_lo) / jnp.maximum(row_mass, 1e-20), 0, 1)
        y = (r + fy) / ny1

        t_col = u2[..., 0] * row_mass
        c = self._bisect(cc_flat, sids, sws, ny1 * nx1, nx1, r * nx1, t_col)
        ccdf_lo = jnp.where(
            c > 0, self._gather(cc_flat, sids, sws, ny1 * nx1,
                                r * nx1 + jnp.maximum(c - 1, 0)), 0.0)
        cell_mass = self._gather(cc_flat, sids, sws, ny1 * nx1,
                                 r * nx1 + c) - ccdf_lo
        fx = jnp.clip((t_col - ccdf_lo) / jnp.maximum(cell_mass, 1e-20), 0, 1)
        x = (c + fx) / nx1
        pdf = cell_mass * (ny1 * nx1) / jnp.maximum(total, 1e-20)
        return jnp.stack([x, y], -1), pdf

    def invert(self, p, pvals: Tuple = ()):
        """Inverse warp: position -> (uniform u2, pdf)."""
        sids, sws = self._slices(pvals)
        ny1, nx1 = self.ny - 1, self.nx - 1
        rc_flat = self._row_cdf.reshape(-1)
        cc_flat = self._cond_cdf.reshape(-1)
        total = 0.0
        for sid, w in zip(sids, sws):
            total = total + w * self._total[sid]
        y = jnp.clip(p[..., 1], 0.0, 1.0) * ny1
        x = jnp.clip(p[..., 0], 0.0, 1.0) * nx1
        r = jnp.clip(y.astype(jnp.int32), 0, ny1 - 1)
        c = jnp.clip(x.astype(jnp.int32), 0, nx1 - 1)
        fy, fx = y - r, x - c
        cdf_lo = jnp.where(
            r > 0, self._gather(rc_flat, sids, sws, ny1,
                                jnp.maximum(r - 1, 0)), 0.0)
        row_mass = self._gather(rc_flat, sids, sws, ny1, r) - cdf_lo
        u_y = (cdf_lo + fy * row_mass) / jnp.maximum(total, 1e-20)
        ccdf_lo = jnp.where(
            c > 0, self._gather(cc_flat, sids, sws, ny1 * nx1,
                                r * nx1 + jnp.maximum(c - 1, 0)), 0.0)
        cell_mass = self._gather(cc_flat, sids, sws, ny1 * nx1,
                                 r * nx1 + c) - ccdf_lo
        u_x = (ccdf_lo + fx * cell_mass) / jnp.maximum(row_mass, 1e-20)
        pdf = cell_mass * (ny1 * nx1) / jnp.maximum(total, 1e-20)
        return jnp.stack([jnp.clip(u_x, 0, 1), jnp.clip(u_y, 0, 1)], -1), pdf


# ---------------------------------------------------------------------------
# MeasuredBxDF
# ---------------------------------------------------------------------------

def _theta2u(theta):
    return jnp.sqrt(jnp.maximum(theta * (2.0 / jnp.pi), 0.0))


def _u2theta(u):
    return u * u * (jnp.pi / 2.0)


def _phi2u(phi):
    return phi * (1.0 / (2.0 * jnp.pi)) + 0.5


def _u2phi(u):
    return (2.0 * u - 1.0) * jnp.pi


@dataclass(frozen=True)
class MeasuredBRDF:
    """Loaded measured-BRDF tables (MeasuredBxDFData, bxdfs.cpp:861)."""
    wavelengths: np.ndarray
    ndf: PiecewiseLinear2D
    sigma: PiecewiseLinear2D
    vndf: PiecewiseLinear2D
    luminance: PiecewiseLinear2D
    spectra: PiecewiseLinear2D
    isotropic: bool

    @staticmethod
    def from_tensors(t: dict) -> "MeasuredBRDF":
        phi_i = np.asarray(t["phi_i"], np.float32)
        theta_i = np.asarray(t["theta_i"], np.float32)
        wav = np.asarray(t["wavelengths"], np.float32)
        return MeasuredBRDF(
            wavelengths=wav,
            ndf=PiecewiseLinear2D(t["ndf"]),
            sigma=PiecewiseLinear2D(t["sigma"]),
            vndf=PiecewiseLinear2D(t["vndf"], [phi_i, theta_i]),
            luminance=PiecewiseLinear2D(t["luminance"], [phi_i, theta_i]),
            spectra=PiecewiseLinear2D(t["spectra"], [phi_i, theta_i, wav]),
            isotropic=phi_i.shape[0] <= 2,
        )

    @staticmethod
    def from_file(path: str) -> "MeasuredBRDF":
        return MeasuredBRDF.from_tensors(read_tensor_file(path))


def _spherical(w):
    theta = jnp.arccos(jnp.clip(w[..., 2], -1.0, 1.0))
    phi = jnp.arctan2(w[..., 1], w[..., 0])
    return theta, phi


def _spectra_eval(brdf: MeasuredBRDF, u, phi_o, theta_o, lam):
    """Spectral 5D interpolant at the 4 wavelength lanes."""
    outs = []
    for i in range(lam.shape[-1]):
        outs.append(jnp.maximum(
            brdf.spectra.eval(u, (phi_o, theta_o, lam[..., i])), 0.0))
    return jnp.stack(outs, -1)


def measured_f(brdf: MeasuredBRDF, wo, wi, lam):
    """MeasuredBxDF::f (bxdfs.cpp): spectra(R^-1(wm)) * ndf / (4 sigma cos)."""
    same = wo[..., 2] * wi[..., 2] > 0
    flip = wo[..., 2] < 0
    wo = jnp.where(flip[..., None], -wo, wo)
    wi = jnp.where(flip[..., None], -wi, wi)
    wm = wi + wo
    wm_len = jnp.linalg.norm(wm, axis=-1, keepdims=True)
    wm = wm / jnp.maximum(wm_len, 1e-12)
    theta_o, phi_o = _spherical(wo)
    theta_m, phi_m = _spherical(wm)
    u_wo = jnp.stack([_theta2u(theta_o), _phi2u(phi_o)], -1)
    pm = phi_m - phi_o if brdf.isotropic else phi_m
    u_wm_y = _phi2u(pm)
    u_wm_y = u_wm_y - jnp.floor(u_wm_y)
    u_wm = jnp.stack([_theta2u(theta_m), u_wm_y], -1)
    ui, _ = brdf.vndf.invert(u_wm, (phi_o, theta_o))
    fr = _spectra_eval(brdf, ui, phi_o, theta_o, lam)
    scale = (brdf.ndf.eval(u_wm)
             / jnp.maximum(4.0 * brdf.sigma.eval(u_wo) * wi[..., 2], 1e-9))
    ok = same & (wm_len[..., 0] > 0)
    return jnp.where(ok[..., None], fr * scale[..., None], 0.0)


def measured_sample(brdf: MeasuredBRDF, wo, u2, lam):
    """MeasuredBxDF::Sample_f: luminance warp -> vndf warp -> reflect."""
    flip = wo[..., 2] <= 0
    wo = jnp.where(flip[..., None], -wo, wo)
    theta_o, phi_o = _spherical(wo)
    u_l, lum_pdf = brdf.luminance.sample(u2, (phi_o, theta_o))
    u_wm, pdf = brdf.vndf.sample(u_l, (phi_o, theta_o))
    phi_m = _u2phi(u_wm[..., 1])
    theta_m = _u2theta(u_wm[..., 0])
    phi_m = jnp.where(brdf.isotropic, phi_m + phi_o, phi_m)
    st, ct = jnp.sin(theta_m), jnp.cos(theta_m)
    wm = jnp.stack([st * jnp.cos(phi_m), st * jnp.sin(phi_m), ct], -1)
    wi = (-wo + 2.0 * jnp.sum(wo * wm, -1, keepdims=True) * wm)
    valid = wi[..., 2] > 0
    fr = _spectra_eval(brdf, u_l, phi_o, theta_o, lam)
    u_wo = jnp.stack([_theta2u(theta_o), _phi2u(phi_o)], -1)
    fr = fr * (brdf.ndf.eval(u_wm)
               / jnp.maximum(4.0 * brdf.sigma.eval(u_wo)
                             * jnp.abs(wi[..., 2]), 1e-9))[..., None]
    jac = 4.0 * jnp.sum(wo * wm, -1) * jnp.maximum(
        2.0 * jnp.pi ** 2 * u_wm[..., 0] * st, 1e-6)
    pdf_out = pdf * lum_pdf / jnp.maximum(jac, 1e-9)
    wi = jnp.where(flip[..., None], -wi, wi)
    return wi, jnp.where(valid[..., None], fr, 0.0), \
        jnp.where(valid, pdf_out, 0.0), valid


def measured_pdf(brdf: MeasuredBRDF, wo, wi):
    """MeasuredBxDF::PDF: vndf invert pdf * luminance density / jacobian."""
    same = wo[..., 2] * wi[..., 2] > 0
    flip = wo[..., 2] < 0
    wo = jnp.where(flip[..., None], -wo, wo)
    wi = jnp.where(flip[..., None], -wi, wi)
    wm = wi + wo
    wm_len = jnp.linalg.norm(wm, axis=-1, keepdims=True)
    wm = wm / jnp.maximum(wm_len, 1e-12)
    theta_o, phi_o = _spherical(wo)
    theta_m, phi_m = _spherical(wm)
    pm = phi_m - phi_o if brdf.isotropic else phi_m
    u_wm_y = _phi2u(pm)
    u_wm_y = u_wm_y - jnp.floor(u_wm_y)
    u_wm = jnp.stack([_theta2u(theta_m), u_wm_y], -1)
    ui, vndf_pdf = brdf.vndf.invert(u_wm, (phi_o, theta_o))
    # luminance density at the unwarped point (cell-based, matches sample)
    _, lum_pdf = brdf.luminance.invert(ui, (phi_o, theta_o))
    sin_tm = jnp.sqrt(jnp.maximum(wm[..., 0] ** 2 + wm[..., 1] ** 2, 0.0))
    jac = 4.0 * jnp.sum(wo * wm, -1) * jnp.maximum(
        2.0 * jnp.pi ** 2 * u_wm[..., 0] * sin_tm, 1e-6)
    pdf = vndf_pdf * lum_pdf / jnp.maximum(jac, 1e-9)
    return jnp.where(same & (wm_len[..., 0] > 0), pdf, 0.0)


# ---------------------------------------------------------------------------
# synthetic data (test + demo): GGX-derived measured tables
# ---------------------------------------------------------------------------

def synthesize_ggx(alpha: float = 0.3, res: int = 64, n_theta: int = 16,
                   reflectance: float = 1.0) -> MeasuredBRDF:
    """Build MeasuredBRDF tensors from an analytic GGX microfacet model —
    the same construction the RGL pipeline performs from measurements
    (Dupuy & Jakob 2018 §4), used for validation without binary data."""
    theta_i = np.linspace(0, np.pi / 2 * 0.98, n_theta).astype(np.float32)
    phi_i = np.zeros((1,), np.float32)
    wav = np.array([400.0, 550.0, 700.0], np.float32)

    ut = (np.arange(res) / (res - 1)).astype(np.float64)      # theta coord
    up = (np.arange(res) / (res - 1)).astype(np.float64)      # phi coord
    th_m = ut ** 2 * np.pi / 2
    ph_m = (2 * up - 1) * np.pi
    stm, ctm = np.sin(th_m), np.cos(th_m)

    def D(ct):  # GGX NDF
        ct2 = np.clip(ct, 0, 1) ** 2
        return np.where(ct > 0, alpha ** 2 / np.maximum(
            np.pi * (ct2 * (alpha ** 2 - 1) + 1) ** 2, 1e-12), 0.0)

    def Lambda(ct):
        ct = np.clip(ct, 1e-6, 1)
        t2 = (1 - ct ** 2) / ct ** 2
        return (np.sqrt(1 + alpha ** 2 * t2) - 1) / 2

    ndf = np.broadcast_to(D(ctm)[None, :], (res, res)).astype(np.float32)
    # sigma(wo) on the (u_theta, u_phi) grid of wo
    sig = np.zeros((res, res), np.float32)
    ct_o = np.cos(ut ** 2 * np.pi / 2)
    sig[:] = (ct_o / (1 + Lambda(ct_o)))[None, :]

    # vndf slices: density over (u_phi, u_theta) incl. warp jacobian
    vndf = np.zeros((1, n_theta, res, res), np.float32)
    lum = np.ones((1, n_theta, res, res), np.float32)
    spec = np.zeros((1, n_theta, len(wav), res, res), np.float32)
    jac = (2 * np.pi ** 2) * ut[None, :] * stm[None, :]       # du -> dw
    wm = np.stack([stm[None, :] * np.cos(ph_m[:, None]),
                   stm[None, :] * np.sin(ph_m[:, None]),
                   np.broadcast_to(ctm[None, :], (res, res))], -1)
    for k, t_o in enumerate(theta_i):
        wo = np.array([np.sin(t_o), 0.0, np.cos(t_o)])
        dot = np.clip(wm @ wo, 0.0, None)
        s = float(np.cos(t_o) / (1 + Lambda(np.cos(t_o))))
        dv = D(ctm)[None, :] * dot / max(s, 1e-9)
        vndf[0, k] = (dv * jac).astype(np.float32)
    brdf = MeasuredBRDF(
        wavelengths=wav,
        ndf=PiecewiseLinear2D(ndf),
        sigma=PiecewiseLinear2D(sig),
        vndf=PiecewiseLinear2D(vndf, [phi_i, theta_i]),
        luminance=PiecewiseLinear2D(lum, [phi_i, theta_i]),
        spectra=PiecewiseLinear2D(spec, [phi_i, theta_i, wav]),
        isotropic=True,
    )
    # fill spectra so that f == reflectance * D * G2 / (4 cos_o cos_i):
    # spectra(u) must equal reflectance * G2(wo, wi(u)) * sigma(wo)/cos_o
    for k, t_o in enumerate(theta_i):
        wo = np.array([np.sin(t_o), 0.0, np.cos(t_o)])
        uu = np.stack(np.meshgrid(ut, up, indexing="xy"), -1)  # (res,res,2)
        grid_u = jnp.asarray(uu.reshape(-1, 2), jnp.float32)
        po = jnp.full((res * res,), 0.0)
        to = jnp.full((res * res,), float(t_o))
        u_wm, _ = brdf.vndf.sample(grid_u, (po, to))
        u_wm = np.asarray(u_wm)
        th = u_wm[:, 0] ** 2 * np.pi / 2
        ph = (2 * u_wm[:, 1] - 1) * np.pi
        wm_s = np.stack([np.sin(th) * np.cos(ph), np.sin(th) * np.sin(ph),
                         np.cos(th)], -1)
        wi = -wo + 2 * (wm_s @ wo)[:, None] * wm_s
        g2 = 1.0 / (1 + Lambda(np.cos(t_o)) + Lambda(np.clip(wi[:, 2],
                                                             1e-6, 1)))
        g2 = np.where(wi[:, 2] > 0, g2, 0.0)
        s = float(np.cos(t_o) / (1 + Lambda(np.cos(t_o))))
        val = (reflectance * g2 * s / max(np.cos(t_o), 1e-6)).reshape(res,
                                                                      res)
        for wdx in range(len(wav)):
            spec[0, k, wdx] = val.astype(np.float32)
    object.__setattr__(brdf, "spectra",
                       PiecewiseLinear2D(spec, [phi_i, theta_i, wav]))
    return brdf


def to_tensors(brdf: MeasuredBRDF, theta_i, phi_i, ndf, sigma, vndf,
               luminance, spectra) -> dict:
    """Assemble the raw arrays into the tensor_file field dict (with the
    jacobian/description fields the reference validates)."""
    return {
        "description": np.frombuffer(b"avrt synthetic measured brdf",
                                     np.uint8),
        "theta_i": np.asarray(theta_i, np.float32),
        "phi_i": np.asarray(phi_i, np.float32),
        "wavelengths": np.asarray(brdf.wavelengths, np.float32),
        "ndf": np.asarray(ndf, np.float32),
        "sigma": np.asarray(sigma, np.float32),
        "vndf": np.asarray(vndf, np.float32),
        "luminance": np.asarray(luminance, np.float32),
        "spectra": np.asarray(spectra, np.float32),
        "jacobian": np.zeros((1,), np.uint8),
    }
