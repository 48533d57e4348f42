from .slice import SliceManifest, read_slice, write_slice  # noqa: F401
