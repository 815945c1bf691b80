"""Graph-based radiance caching — the fork's novel acceleration layer.

Reference: src/graph/ (SURVEY.md §2.1):
  model.py     <- graph.h/.cpp          (Vertex/Edge/Path containers, (de)serialization)
  builder.py   <- free/free_graph_builder.{h,cpp}  (light-path tracing precompute)
  lighting.py  <- lighting_calculator.{h,cpp}      (transport matrix power iteration)
  config.py    <- util.h:699-810        (JSON config schema)
  ../models/integrators/graph.py <- graph_integrator.{h,cpp}  (render-time cache lookup)
"""
from . import builder, config, lighting, model  # noqa: F401
