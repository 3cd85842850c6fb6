from .analyzer import interpret
from .parser import parse_query

__all__ = ["interpret", "parse_query"]
