from .model import Reference, Root, SchemaConfig, Sequence, Table, TransformConfig
from .graph import check_cycles, filter_children

__all__ = [
    "Reference",
    "Root",
    "SchemaConfig",
    "Sequence",
    "Table",
    "TransformConfig",
    "check_cycles",
    "filter_children",
]
