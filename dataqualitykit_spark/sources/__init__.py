from .tableio import TableIO

__all__ = ["TableIO"]
