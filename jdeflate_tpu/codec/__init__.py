from .deflate import RawDeflater
from .inflate import RawInflater
from .levels import LevelConfig, get_level

__all__ = ["RawDeflater", "RawInflater", "LevelConfig", "get_level"]
