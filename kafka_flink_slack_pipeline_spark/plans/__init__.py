from .registry import QuerySpec, all_queries  # noqa: F401
