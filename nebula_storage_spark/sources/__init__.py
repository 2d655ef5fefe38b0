from .readers import read_table, write_table

__all__ = ["read_table", "write_table"]
