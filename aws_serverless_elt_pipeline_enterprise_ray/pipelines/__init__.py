from .cdc import apply_changes, read_table

__all__ = ["apply_changes", "read_table"]
