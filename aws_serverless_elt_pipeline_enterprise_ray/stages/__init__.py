from .merge import PartitionMerger, conform_to_schema

__all__ = ["PartitionMerger", "conform_to_schema"]
