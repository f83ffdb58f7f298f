from .scalar import (
    db_customer,
    db_name_col,
    db_timestamp,
    mib,
    split_labels,
    throughput,
)

__all__ = [
    "db_customer",
    "db_name_col",
    "db_timestamp",
    "mib",
    "split_labels",
    "throughput",
]
