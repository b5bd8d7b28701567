from . import piconet  # noqa: F401
