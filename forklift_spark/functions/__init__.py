from .mapping import MappingSpec, compile_mapping

__all__ = ["MappingSpec", "compile_mapping"]
