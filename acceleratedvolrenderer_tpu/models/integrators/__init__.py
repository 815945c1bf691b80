from . import volpath, volpath_fused  # noqa: F401
