from . import nputil  # noqa: F401
