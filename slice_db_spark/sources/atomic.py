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


class Lease:
    """Handle yielded by :func:`dir_lock`.  ``lost`` is set once the lease
    has been FENCED OUT: the heartbeat observed a wall-clock gap longer
    than ``stale`` (process suspend / VM pause — a contender may have
    legitimately taken the lock over in the meantime) or found the owner
    token gone (takeover already happened).  Call :meth:`check` before an
    irreversible step (the staging swap, a sink append): a fenced writer
    must abort rather than interleave with the new holder."""

    def __init__(self, lock_path: str, token_path: str) -> None:
        import threading

        self.lock_path = lock_path
        self.token_path = token_path
        self.lost = threading.Event()

    def check(self) -> None:
        """Raise ``TimeoutError`` if this lease no longer owns the lock."""
        if self.lost.is_set() or not os.path.exists(self.token_path):
            self.lost.set()
            raise TimeoutError(
                f"writer lock on {self.lock_path} lost: lease fenced out "
                "(heartbeat gap exceeded the stale window or the lock was "
                "taken over) — aborting before an unsafe write"
            )


def dir_lock(live: str, timeout: float = 600.0, stale: float = 3600.0):
    """Advisory inter-process lock coordinating writers of a sink dir
    (streaming appends vs. compaction rewrites): ``os.mkdir(<live>.lock)``
    is the atomic acquire.  Context manager yielding a :class:`Lease`.

    Liveness vs. crash recovery:

    * A daemon HEARTBEAT refreshes the held lock's mtime every
      ``stale/4`` seconds, so a legitimately long-running holder (a
      multi-hour compaction) is never mistaken for a dead one.
    * A lock whose mtime is older than ``stale`` seconds therefore means
      a crashed (or suspended) holder.  Takeover is an atomic RENAME of
      the stale lock dir to a unique name (exactly one contender's rename
      succeeds, the losers loop) — a plain rmdir could delete a DIFFERENT
      waiter's freshly acquired lock and let two writers into the
      critical section.
    * The lease is FENCED: acquire drops a unique owner-token file inside
      the lock dir.  If the holder stalls past ``stale`` (suspend also
      stops the heartbeat thread, so mtime goes stale and a contender
      takes over), the resumed heartbeat detects the gap / missing token
      and sets ``lease.lost`` instead of blindly re-touching a lock it no
      longer owns; release verifies the token before removing the lock
      dir, so a fenced ex-holder can never delete the NEW holder's lock
      and admit a third writer.  Critical sections call ``lease.check()``
      immediately before their irreversible step.
    """
    import contextlib
    import threading
    import time
    import uuid

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
                age = None
                try:
                    age = time.time() - os.path.getmtime(lock)
                except OSError:
                    pass  # raced with a release — fall through to wait
                if age is not None and age > stale:
                    # atomic takeover: only ONE contender's rename of the
                    # observed stale dir succeeds; the tomb is removed by
                    # the winner and the loop re-acquires via mkdir
                    tomb = f"{lock}.stale.{uuid.uuid4().hex}"
                    try:
                        os.rename(lock, tomb)
                    except OSError:
                        continue  # another contender won the takeover
                    shutil.rmtree(tomb, ignore_errors=True)
                    continue
                if time.monotonic() > deadline:
                    held = f"held for {age:.0f}s" if age is not None else "contended"
                    raise TimeoutError(
                        f"writer lock on {path} {held} (> timeout {timeout}s)"
                    )
                time.sleep(0.1)
        token = os.path.join(lock, f"owner-{uuid.uuid4().hex}")
        with open(token, "w"):
            pass
        lease = Lease(lock, token)
        stop = threading.Event()

        def _beat():
            interval = max(1.0, stale / 4)
            last = time.time()
            while not stop.wait(interval):
                now = time.time()
                # a gap past `stale` means our mtime went stale while we
                # were paused — a contender may hold the lock now; fence
                # ourselves instead of re-touching a lock we may not own
                if now - last > stale or not os.path.exists(token):
                    lease.lost.set()
                    return
                with contextlib.suppress(OSError):
                    os.utime(lock)
                last = now

        beat = threading.Thread(target=_beat, daemon=True)
        beat.start()
        try:
            yield lease
        finally:
            stop.set()
            beat.join(timeout=1.0)
            # fenced release: if the token is gone the lock dir belongs to
            # a NEW holder — removing it would admit a third writer
            if os.path.exists(token):
                with contextlib.suppress(OSError):
                    os.remove(token)
                    os.rmdir(lock)

    return _cm()
