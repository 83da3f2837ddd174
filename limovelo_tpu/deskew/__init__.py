from .compensate import PathNodes, build_path, compensate

__all__ = ["PathNodes", "build_path", "compensate"]
