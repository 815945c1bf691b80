"""Occupancy probe: alive-ray curve of the fused VolPath loop on the
disney-cloud analog.  Run on TPU:  python scripts/probe_occupancy.py"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
import numpy as np

from acceleratedvolrenderer_tpu.scene import presets
from acceleratedvolrenderer_tpu.models.integrators import volpath_fused as volpath
from acceleratedvolrenderer_tpu.ops import dda
from acceleratedvolrenderer_tpu.utils import spectrum as sp

W, H = 320, 180
scene = presets.cloud(width=W, height=H, spp=1, max_depth=16)
scene.max_march_steps = 4096
med_spec = scene.medium
maj_res = med_spec.maj_res()
density = jnp.asarray(med_spec.density, jnp.float32)
majorant = jnp.asarray(med_spec.build_majorant())

ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
pix = jnp.asarray(np.stack([xs.reshape(-1), ys.reshape(-1)], -1), np.int32)
N = H * W

from functools import partial
@partial(jax.jit, static_argnums=(2,))
def run(density, majorant, record):
    pixidx = jnp.arange(N, dtype=jnp.uint32)
    rng = dda.seed_stream(pixidx, jnp.zeros((N,), jnp.uint32), salt=0)
    rng, ul = dda.pcg_uniform(rng)
    swl = sp.sample_wavelengths_visible(ul)
    o, d = scene.camera.generate_rays(pix, jnp.full((N, 2), 0.5), None)
    sa = med_spec.sigma_a_spec(swl.lam) * med_spec.scale
    ss = med_spec.sigma_s_spec(swl.lam) * med_spec.scale
    med = dda.MediumArrays(
        density=density, majorant=majorant,
        w2m=jnp.asarray(med_spec.world_to_unit(), jnp.float32),
        g=jnp.float32(med_spec.g), sigma_a=sa, sigma_s=ss,
        Le=jnp.zeros_like(swl.lam))
    res = volpath.li(med, scene.lights, o, d, swl.lam, rng,
                     maj_res=maj_res, homogeneous=False,
                     max_depth=scene.max_depth,
                     scene_radius=scene.scene_radius,
                     max_march_steps=scene.max_march_steps,
                     record_alive=record)
    return res.L, res.alive_hist

# timing WITHOUT recording
Lp, _ = run(density, majorant, False)
jax.block_until_ready(Lp)
t0 = time.time(); Lp, _ = run(density, majorant, False); jax.block_until_ready(Lp)
dt = time.time() - t0
print(f"plain run: {dt:.3f}s  {N/dt/1e6:.4f} Mrays/s")

L, hist = run(density, majorant, True)
jax.block_until_ready(L)
h = np.asarray(hist)
iters = int((h > 0).sum())
print(f"loop iterations: {iters} (x{8} substeps)")
print(f"ray-iterations: {h.sum()}  vs  dense {iters * N}  occupancy={h.sum() / (iters * N):.4f}")
qs = [1.0, 0.5, 0.25, 0.1, 0.05, 0.01]
for q in qs:
    thresh = q * N
    print(f"  iters with alive > {q * 100:4.0f}%: {(h > thresh).sum():5d}")
# where does the area under the curve live?
cum = np.cumsum(h[:iters][::-1])[::-1]
print("alive at iter [0, 50, 100, 200, 400, 800, 1600, 3200]:",
      [int(h[min(i, iters - 1)]) for i in [0, 50, 100, 200, 400, 800, 1600, 3200]])
