from .store import SlamMap  # noqa: F401
