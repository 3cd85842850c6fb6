from .context import Database, DBContext
from .manifest import BlockEntry, Manifest

__all__ = ["BlockEntry", "DBContext", "Database", "Manifest"]
