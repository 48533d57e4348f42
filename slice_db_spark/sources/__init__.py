from .slice import SliceManifest, read_slice, write_slice  # noqa: F401
from .sqlscript import write_sql_script  # noqa: F401
