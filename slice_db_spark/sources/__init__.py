from .slice import (  # noqa: F401
    SliceManifest,
    read_slice,
    read_slice_zip,
    write_slice,
    write_slice_zip,
)
from .sqlscript import write_sql_script  # noqa: F401
from .corpus import read_corpus, split_corrupt, write_corpus  # noqa: F401
