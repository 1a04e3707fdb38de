from .changelog import discover_pending, read_changelog, read_changelog_jsonl

__all__ = ["discover_pending", "read_changelog", "read_changelog_jsonl"]
