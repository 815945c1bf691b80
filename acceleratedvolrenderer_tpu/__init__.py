"""acceleratedvolrenderer_tpu — a TPU-native differentiable volumetric path tracer.

A from-scratch JAX / Pallas / pjit reimplementation of the capability set of
tsvdh/AcceleratedVolRenderer (a pbrt-v4 fork with graph-based radiance caching
for volume rendering).  Nothing here is a translation of the C++ design: rays
are SoA jax arrays, polymorphism is static specialization / `lax.switch` over
small enums, samplers are counter-based RNG, the wavefront renderer's queue
stages become fused masked loops, and scale-out is `shard_map` over a device
mesh with XLA collectives.

Layer map (mirrors SURVEY.md §1 of the reference):
  utils/      -> reference src/pbrt/util (vecmath, spectrum, sampling, image, stats)
  ops/        -> compute kernels: grids, DDA, free-flight sampling, phase functions
  models/     -> media, cameras, film, lights, shapes, integrators
  scene/      -> .pbrt-subset parser + scene description
  parallel/   -> mesh construction, sharded render driver
  graph/      -> graph-based radiance caching precompute + cached integrator
                 (reference src/graph)
"""

__version__ = "0.1.0"
