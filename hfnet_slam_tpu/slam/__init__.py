from . import map as map_store  # noqa: F401
from . import tracking, local_mapping, system  # noqa: F401
