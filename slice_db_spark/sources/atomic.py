"""Crash-safe directory swap for rewrite-in-place maintenance.

The promote sequence (used by the streaming CDC dimension swap and the
compaction utilities) keeps a recoverable copy at every crash point:

1. write the new contents to ``<live>.staging`` (Spark marks completion
   with ``_SUCCESS``);
2. rename the live dir aside to ``<live>.old``;
3. promote staging to live;
4. delete ``.old``.

``recover_dir`` restores a missing live dir from ``.old`` (pre-rewrite
state — the caller's idempotent rewrite re-applies safely) or from a
``_SUCCESS``-complete staging copy; an INCOMPLETE staging is never
promoted.
"""

from __future__ import annotations

import os
import shutil


def recover_dir(live: str) -> None:
    """Restore ``live`` if a previous :func:`swap_dir` crashed mid-promote.
    No-op when the live dir exists (a dangling ``.old``/``.staging`` is
    cleaned up by the next swap)."""
    live = os.path.normpath(live)  # 'sink/' would put .old/.staging INSIDE
    if os.path.isdir(live):
        return
    old = live + ".old"
    staging = live + ".staging"
    if os.path.isdir(old):
        os.replace(old, live)
    elif os.path.isfile(os.path.join(staging, "_SUCCESS")):
        os.replace(staging, live)


def swap_dir(live: str) -> None:
    """Promote ``<live>.staging`` (already fully written) to ``live``,
    keeping the previous contents at ``.old`` until the new dir is in
    place so no crash point loses data (see module docstring)."""
    live = os.path.normpath(live)  # 'sink/' would rename into its own subtree
    staging = live + ".staging"
    old = live + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(live):
        os.replace(live, old)
    os.replace(staging, live)
    if os.path.isdir(old):
        shutil.rmtree(old)


def dir_lock(live: str, timeout: float = 600.0, stale: float = 3600.0):
    """Advisory inter-process lock coordinating writers of a sink dir
    (streaming appends vs. compaction rewrites): ``os.mkdir(<live>.lock)``
    is the atomic acquire.  Crash recovery: a lock older than ``stale``
    seconds is taken over (its holder died — the swap itself is already
    crash-safe, the lock only prevents LIVE interleavings like a
    compaction's read→swap racing an append).  Context manager."""
    import contextlib
    import time

    @contextlib.contextmanager
    def _cm():
        path = os.path.normpath(live)
        lock = path + ".lock"
        deadline = time.monotonic() + timeout
        while True:
            try:
                os.mkdir(lock)
                break
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(lock)
                except OSError:
                    continue  # raced with a release — retry immediately
                if age > stale:
                    with contextlib.suppress(OSError):
                        os.rmdir(lock)
                    continue
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"writer lock on {path} held for {age:.0f}s "
                        f"(> timeout {timeout}s)"
                    )
                time.sleep(0.1)
        try:
            yield
        finally:
            with contextlib.suppress(OSError):
                os.rmdir(lock)

    return _cm()
