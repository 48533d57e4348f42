"""``python -m slice_db_spark`` — same entry point as the ``slicedb-spark``
console script (reference installs a ``slicedb`` script,
`/root/reference/setup.py:23-27`)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
