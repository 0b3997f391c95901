from . import factors, pose_opt, ba  # noqa: F401
