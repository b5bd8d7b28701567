from . import native, sources, writers  # noqa: F401
