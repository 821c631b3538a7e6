from .table import LaketteTable, TableCommit

__all__ = ["LaketteTable", "TableCommit"]
