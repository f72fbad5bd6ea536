from . import lie, robust  # noqa: F401
