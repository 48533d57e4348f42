from .subset import SubsetResult, Subsetter
from .restore import restore_order, restore_to_parquet

__all__ = ["SubsetResult", "Subsetter", "restore_order", "restore_to_parquet"]
