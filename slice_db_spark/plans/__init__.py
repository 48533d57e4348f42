from .subset import SubsetResult, Subsetter
from .restore import (
    capture_sequences,
    restore_order,
    restore_sequences,
    restore_to_jdbc,
    restore_to_jdbc_deferred,
    restore_to_parquet,
)
from .scale import bucketize, salted_join

__all__ = [
    "SubsetResult",
    "Subsetter",
    "bucketize",
    "capture_sequences",
    "restore_order",
    "restore_sequences",
    "restore_to_jdbc",
    "restore_to_jdbc_deferred",
    "restore_to_parquet",
    "salted_join",
]
