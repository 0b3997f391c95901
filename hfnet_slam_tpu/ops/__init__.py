from . import extract, matching  # noqa: F401
