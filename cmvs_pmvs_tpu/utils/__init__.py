from .options import PMVSOptions  # noqa: F401
