from .registry import TableRegistry, load_tables

__all__ = ["TableRegistry", "load_tables"]
