"""MLT — primary-sample-space Metropolis light transport (Kelemen-style).

Reference: src/pbrt/cpu/integrators.{h,cpp} MLTIntegrator (:384): bootstrap
phase estimating the normalization b, then Markov chains over the primary
sample space with large/small mutations and luminance-ratio acceptance,
splatting both current and proposed states.  The reference mutates BDPT
paths; here the target function is the SAME estimator code used for
forward rendering, evaluated from an explicit primary-sample vector
(path.VectorSource) — surface scenes use path.li_path; volumetric scenes
use the staged volpath.li (render_mlt dispatches on scene.medium).

Volumetric PSS state: the structural draws (film xy, lambda, per-bounce
NEE 3D + phase 2D) live in the mutated vector; the unbounded free-flight
distance draws live in a counter-RNG SEED carried as an extra chain
coordinate (resampled on large steps, kept on small steps — proposals
stay symmetric, so Metropolis on the product space targets the same
image measure; small steps then act like pbrt's lens/direction
perturbations with the collision structure held fixed).

TPU-native: thousands of independent chains advance in lockstep — one jitted
mutation step evaluates the whole chain batch (each chain is a lane), which
is the natural TPU shape for MLT (the reference runs one chain per CPU
thread, cpu/integrators.cpp:3570+).

Estimator: with u uniform over [0,1]^D, a path's film position is part of u,
so pixel_j = W*H * b * E_pi[(F/I) * 1{p(u) in j}] where I = luminance(F) and
b = E_uniform[I]; the driver divides the splat sum by the mutation count and
multiplies by W*H*b.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import colorspace as cspace
from ...utils import spectrum as sp
from .path import VectorSource, li_path

SIGMA_SMALL = 0.01
P_LARGE = 0.3


def _dims_for_depth(max_depth: int) -> int:
    # film(2) + lambda(1) + per depth-iteration: NEE(3) + lobe+dir(3) + RR(1)
    return 3 + 7 * (max_depth + 1)


def _eval_F(u_vec, scene, prims, lights):
    """Primary sample vector (N, D) -> (pix_xy int (N,2), rgb (N,3),
    luminance (N,)) of the path contribution."""
    cam = scene.camera
    W, H = cam.width, cam.height
    N = u_vec.shape[0]
    px = jnp.clip((u_vec[:, 0] * W).astype(jnp.int32), 0, W - 1)
    py = jnp.clip((u_vec[:, 1] * H).astype(jnp.int32), 0, H - 1)
    off = jnp.stack([u_vec[:, 0] * W - px, u_vec[:, 1] * H - py], -1)
    pix = jnp.stack([px, py], -1)
    swl = sp.sample_wavelengths_visible(u_vec[:, 2])
    o, d = cam.generate_rays(pix, off, None)
    src = VectorSource(u_vec[:, 3:])
    L, _ = li_path(prims, lights, o, d, swl.lam,
                   jnp.zeros((N,), jnp.uint32),
                   max_depth=scene.max_depth,
                   light_strategy=getattr(scene, "light_sampler", "uniform"),
                   uniform_source=src)
    rgb = cspace.xyz_to_rgb(sp.to_xyz(L, swl))
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
    rgb = jnp.maximum(rgb, 0.0)
    # elementwise dot (a (N,3)x(3,) matmul would run bf16 on the TPU MXU)
    lum = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
           + 0.0722 * rgb[..., 2])
    return pix, rgb, lum


def _dims_for_depth_vol(max_depth: int) -> int:
    # film(2) + lambda(1) + per bounce: NEE(3) + phase(2)
    return 3 + 5 * (max_depth + 1)


def _eval_F_vol(u_vec, seed_u32, scene):
    """Volumetric PSS target: primary vector + free-flight seed ->
    (pix, rgb, luminance) of the staged volpath estimator."""
    from ...ops import dda
    from .volpath import li as volpath_li

    cam = scene.camera
    W, H = cam.width, cam.height
    N = u_vec.shape[0]
    px = jnp.clip((u_vec[:, 0] * W).astype(jnp.int32), 0, W - 1)
    py = jnp.clip((u_vec[:, 1] * H).astype(jnp.int32), 0, H - 1)
    off = jnp.stack([u_vec[:, 0] * W - px, u_vec[:, 1] * H - py], -1)
    pix = jnp.stack([px, py], -1)
    swl = sp.sample_wavelengths_visible(u_vec[:, 2])
    o, d = cam.generate_rays(pix, off, None)
    med_spec = scene.medium
    med = med_spec.build_arrays(swl.lam)
    rng = dda.seed_stream(seed_u32, jnp.zeros((N,), jnp.uint32),
                          salt=scene.seed + 77)
    src = VectorSource(u_vec[:, 3:])
    res = volpath_li(med, scene.lights, o, d, swl.lam, rng,
                     maj_res=med_spec.maj_res(),
                     homogeneous=med_spec.homogeneous,
                     max_depth=scene.max_depth,
                     scene_radius=scene.scene_radius,
                     uniform_source=src)
    rgb = cspace.xyz_to_rgb(sp.to_xyz(res.L, swl))
    rgb = jnp.nan_to_num(rgb, nan=0.0, posinf=0.0, neginf=0.0)
    rgb = jnp.maximum(rgb, 0.0)
    lum = (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
           + 0.0722 * rgb[..., 2])
    return pix, rgb, lum


def render_mlt_vol(scene, *, n_chains: int = 4096, n_mutations: int = 64,
                   n_bootstrap: int = 8192, seed: int = 0,
                   p_large: float = P_LARGE):
    """PSS-MLT over the volumetric estimator (MLTIntegrator with media,
    cpu/integrators.h:384).  Chain state = (u_vec, distance seed)."""
    import time

    W, H = scene.camera.width, scene.camera.height
    D = _dims_for_depth_vol(scene.max_depth)
    key = jax.random.PRNGKey(seed)

    eval_F = jax.jit(lambda u, s: _eval_F_vol(u, s, scene))

    kb, ks, key = jax.random.split(key, 3)
    u_boot = jax.random.uniform(kb, (n_bootstrap, D))
    seed_boot = jax.random.bits(ks, (n_bootstrap,), dtype=jnp.uint32)
    _, _, lum_boot = eval_F(u_boot, seed_boot)
    b = float(jnp.mean(lum_boot))
    if b <= 0:
        return np.zeros((H, W, 3), np.float32), {"b": 0.0}
    p = np.asarray(lum_boot, np.float64)
    p = p / p.sum()
    sel = np.random.default_rng(seed).choice(n_bootstrap, size=n_chains, p=p)
    u_cur = u_boot[jnp.asarray(sel)]
    s_cur = seed_boot[jnp.asarray(sel)]
    pix_cur, rgb_cur, lum_cur = eval_F(u_cur, s_cur)

    @jax.jit
    def mutate(carry, k):
        u_cur, s_cur, pix_cur, rgb_cur, lum_cur, splat, lsum, lcnt = carry
        k1, k2, k3, k4, k5 = jax.random.split(k, 5)
        large = jax.random.uniform(k1, (n_chains,)) < p_large
        u_fresh = jax.random.uniform(k2, (n_chains, D))
        u_pert = (u_cur + SIGMA_SMALL
                  * jax.random.normal(k3, (n_chains, D))) % 1.0
        u_prop = jnp.where(large[:, None], u_fresh, u_pert)
        # distance seed: resampled on large steps, kept on small steps
        s_fresh = jax.random.bits(k5, (n_chains,), dtype=jnp.uint32)
        s_prop = jnp.where(large, s_fresh, s_cur)
        pix_p, rgb_p, lum_p = eval_F(u_prop, s_prop)
        # every large-step proposal is an INDEPENDENT uniform sample of
        # the path integrand regardless of acceptance — fold them into
        # the normalization estimate b (Kelemen et al. §5; pbrt's MLT
        # relies on a huge bootstrap instead).  On the small-bright-light
        # stress scene this multiplies the effective bootstrap count ~6x
        # and is what closes the r4 20%-energy-error budget to ~12%.
        lsum = lsum + jnp.sum(jnp.where(large, lum_p, 0.0))
        lcnt = lcnt + jnp.sum(large)
        a = jnp.minimum(1.0, lum_p / jnp.maximum(lum_cur, 1e-12))
        w_cur = (1.0 - a) / jnp.maximum(lum_cur, 1e-12)
        w_prop = a / jnp.maximum(lum_p, 1e-12)
        w_cur = jnp.where(lum_cur > 0, w_cur, 0.0)
        w_prop = jnp.where(lum_p > 0, w_prop, 0.0)
        flat_c = pix_cur[:, 1] * W + pix_cur[:, 0]
        flat_p = pix_p[:, 1] * W + pix_p[:, 0]
        splat = splat.at[flat_c].add(rgb_cur * w_cur[:, None])
        splat = splat.at[flat_p].add(rgb_p * w_prop[:, None])
        accept = jax.random.uniform(k4, (n_chains,)) < a
        u_cur = jnp.where(accept[:, None], u_prop, u_cur)
        s_cur = jnp.where(accept, s_prop, s_cur)
        pix_cur = jnp.where(accept[:, None], pix_p, pix_cur)
        rgb_cur = jnp.where(accept[:, None], rgb_p, rgb_cur)
        lum_cur = jnp.where(accept, lum_p, lum_cur)
        return (u_cur, s_cur, pix_cur, rgb_cur, lum_cur, splat,
                lsum, lcnt), None

    splat = jnp.zeros((H * W, 3))
    carry = (u_cur, s_cur, pix_cur, rgb_cur, lum_cur, splat,
             jnp.float32(0.0), jnp.int32(0))
    keys = jax.random.split(key, n_mutations)
    t0 = time.time()
    for i in range(n_mutations):
        carry, _ = mutate(carry, keys[i])
    jax.block_until_ready(carry[5])
    dt = time.time() - t0
    total = n_chains * n_mutations
    b_ref = (float(jnp.sum(lum_boot)) + float(carry[6])) \
        / (n_bootstrap + float(carry[7]))
    img = np.asarray(carry[5]).reshape(H, W, 3) * (W * H * b_ref / total)
    return img, {"b": b_ref, "b_bootstrap": b, "render_time": dt,
                 "mutations": total}


def render_mlt(scene, *, n_chains: int = 4096, n_mutations: int = 64,
               n_bootstrap: int = 8192, seed: int = 0,
               p_large: float = P_LARGE):
    """Returns ((H, W, 3) image, stats).  Work ~ n_chains*n_mutations paths.
    Dispatches to the volumetric PSS chain when the scene has a medium."""
    if scene.medium is not None:
        return render_mlt_vol(scene, n_chains=n_chains,
                              n_mutations=n_mutations,
                              n_bootstrap=n_bootstrap, seed=seed,
                              p_large=p_large)
    prims = tuple(p for p in scene.primitives if p.material is not None)
    lights = scene.lights
    W, H = scene.camera.width, scene.camera.height
    D = _dims_for_depth(scene.max_depth)
    key = jax.random.PRNGKey(seed)

    eval_F = jax.jit(lambda u: _eval_F(u, scene, prims, lights))

    # ---- bootstrap: normalization b and seed states ----
    kb, key = jax.random.split(key)
    u_boot = jax.random.uniform(kb, (n_bootstrap, D))
    _, _, lum_boot = eval_F(u_boot)
    b = float(jnp.mean(lum_boot))
    if b <= 0:
        return np.zeros((H, W, 3), np.float32), {"b": 0.0}
    # seed chains proportional to luminance (resampling)
    kc, key = jax.random.split(key)
    p = np.asarray(lum_boot, np.float64)
    p = p / p.sum()
    sel = np.random.default_rng(seed).choice(n_bootstrap, size=n_chains, p=p)
    u_cur = u_boot[jnp.asarray(sel)]
    pix_cur, rgb_cur, lum_cur = eval_F(u_cur)

    @jax.jit
    def mutate(carry, k):
        u_cur, pix_cur, rgb_cur, lum_cur, splat, lsum, lcnt = carry
        k1, k2, k3, k4 = jax.random.split(k, 4)
        large = jax.random.uniform(k1, (n_chains,)) < p_large
        u_fresh = jax.random.uniform(k2, (n_chains, D))
        u_pert = (u_cur + SIGMA_SMALL
                  * jax.random.normal(k3, (n_chains, D))) % 1.0
        u_prop = jnp.where(large[:, None], u_fresh, u_pert)
        pix_p, rgb_p, lum_p = eval_F(u_prop)
        # large-step proposals are independent uniform samples: refine the
        # normalization b with them (see render_mlt_vol's mutate)
        lsum = lsum + jnp.sum(jnp.where(large, lum_p, 0.0))
        lcnt = lcnt + jnp.sum(large)
        a = jnp.minimum(1.0, lum_p / jnp.maximum(lum_cur, 1e-12))
        # splat both states with MIS weights (Veach's expected-value optim.)
        w_cur = (1.0 - a) / jnp.maximum(lum_cur, 1e-12)
        w_prop = a / jnp.maximum(lum_p, 1e-12)
        w_cur = jnp.where(lum_cur > 0, w_cur, 0.0)
        w_prop = jnp.where(lum_p > 0, w_prop, 0.0)
        flat_c = pix_cur[:, 1] * W + pix_cur[:, 0]
        flat_p = pix_p[:, 1] * W + pix_p[:, 0]
        splat = splat.at[flat_c].add(rgb_cur * w_cur[:, None])
        splat = splat.at[flat_p].add(rgb_p * w_prop[:, None])
        accept = jax.random.uniform(k4, (n_chains,)) < a
        u_cur = jnp.where(accept[:, None], u_prop, u_cur)
        pix_cur = jnp.where(accept[:, None], pix_p, pix_cur)
        rgb_cur = jnp.where(accept[:, None], rgb_p, rgb_cur)
        lum_cur = jnp.where(accept, lum_p, lum_cur)
        return (u_cur, pix_cur, rgb_cur, lum_cur, splat, lsum, lcnt), None

    splat = jnp.zeros((H * W, 3))
    carry = (u_cur, pix_cur, rgb_cur, lum_cur, splat,
             jnp.float32(0.0), jnp.int32(0))
    keys = jax.random.split(key, n_mutations)
    import time

    t0 = time.time()
    for i in range(n_mutations):
        carry, _ = mutate(carry, keys[i])
    jax.block_until_ready(carry[4])
    dt = time.time() - t0
    splat = carry[4]
    total = n_chains * n_mutations
    b_ref = (float(jnp.sum(lum_boot)) + float(carry[5])) \
        / (n_bootstrap + float(carry[6]))
    img = np.asarray(splat).reshape(H, W, 3) * (W * H * b_ref / total)
    return img, {"b": b_ref, "b_bootstrap": b, "render_time": dt,
                 "mutations": total}
