from . import hfnet  # noqa: F401
