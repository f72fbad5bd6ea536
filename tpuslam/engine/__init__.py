from .system import System, Sensor  # noqa: F401
