from .config import enable_compilation_cache, select_device

__all__ = ["enable_compilation_cache", "select_device"]
