from . import warps, phase, grid, dda, transmittance  # noqa: F401
