from . import cameras, film, lights, media, shapes  # noqa: F401
