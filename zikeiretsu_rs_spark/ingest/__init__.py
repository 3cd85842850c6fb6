from .writable_store import PersistCondition, WritableStore

__all__ = ["PersistCondition", "WritableStore"]
