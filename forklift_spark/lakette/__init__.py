from .table import LaketteTable, TableCommit
from .txn import publish_transaction, recover_transactions

__all__ = [
    "LaketteTable",
    "TableCommit",
    "publish_transaction",
    "recover_transactions",
]
