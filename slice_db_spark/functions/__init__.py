from .transforms import (  # noqa: F401
    Transform,
    TransformContext,
    build_registry,
    transform_dataframe,
)
