from .limits import limit_distinct_ts

__all__ = ["limit_distinct_ts"]
