from .types import Scene  # noqa: F401
