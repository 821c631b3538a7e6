from .merge import lww_dedupe, merge_into, MergeStats

__all__ = ["lww_dedupe", "merge_into", "MergeStats"]
