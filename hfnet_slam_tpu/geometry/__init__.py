from . import cameras, triangulation, twoview  # noqa: F401
