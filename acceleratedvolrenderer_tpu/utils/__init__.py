"""Utility layer.  Submodules import lazily so numpy-only tools (image I/O,
imgtool) never pull in jax."""
import importlib

__all__ = ["math", "vecmath", "spectrum", "colorspace", "rng", "image", "piz"]


def __getattr__(name):
    if name in __all__:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
