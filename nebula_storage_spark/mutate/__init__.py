from .add import add_edges, add_vertices
from .delete import delete_edges, delete_tags, delete_vertices
from .upsert import upsert, upsert_returning
from .ttl import ttl_purge

__all__ = ["add_vertices", "add_edges", "delete_vertices", "delete_tags",
           "delete_edges", "upsert", "upsert_returning", "ttl_purge"]
