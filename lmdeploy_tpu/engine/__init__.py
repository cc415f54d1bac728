from .engine import Engine  # noqa: F401
from .engine_instance import EngineInstance  # noqa: F401
