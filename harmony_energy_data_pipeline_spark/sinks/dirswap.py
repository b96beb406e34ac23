"""Crash-safe whole-directory swap (shared by the JSONL-export
flatten and the z-order rewrite).

A two-rename swap (``path`` → old, staged → ``path``) has a window
where ``path`` does not exist; a crash there strands the only copy of
the data under a temp name with nothing recording the fact. Same
medicine as the partition-swap protocol (``sinks.partitioned``): a
durable intent marker written BEFORE the first rename makes every
crash state mechanically recognizable and rolled FORWARD:

* marker + staged + live   → crash before rename 1: redo both renames
* marker + staged, no live → crash between renames: finish rename 2
* marker, no staged        → crash after rename 2: clean up only

Single writer per target path (the swap itself is not concurrent-
writer-safe — same contract as the reference's one SQLite file).
"""

from __future__ import annotations

import json
import os
import shutil

from harmony_energy_data_pipeline_spark.sinks.pathnorm import normalizes_paths


def _marker(path: str) -> str:
    return path.rstrip("/") + ".__swap.json"


def _old(path: str) -> str:
    return path.rstrip("/") + ".__old_tmp"


@normalizes_paths('path', 'staged')
def swap_dir_commit(path: str, staged: str) -> None:
    """Atomically-recoverable replace of directory ``path`` with
    ``staged``: durable marker, rename current → ``.__old_tmp``,
    rename staged → live, remove marker, drop the old copy."""
    recover_dir_swap(path)  # finish any earlier interrupted swap first
    marker = _marker(path)
    tmp = marker + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"staged": staged}, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, marker)
    dfd = os.open(os.path.dirname(os.path.abspath(marker)), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    _roll_forward(path, staged)


def _roll_forward(path: str, staged: str) -> None:
    old = _old(path)
    try:
        if os.path.exists(staged):
            if os.path.exists(path):
                shutil.rmtree(old, ignore_errors=True)
                os.rename(path, old)
            os.rename(staged, path)
        elif not os.path.exists(path) and os.path.exists(old):
            # staged is gone (e.g. the writer's cleanup removed it after
            # a failed second rename) and live is gone too: the backup
            # is the ONLY surviving copy — restore, don't delete
            os.rename(old, path)
    except FileNotFoundError:
        # a concurrent recover (reader replaying the same marker, or
        # the writer itself) completed a rename between our existence
        # check and the call — fine as long as the final state below
        # holds; re-raising would turn a completed swap into a
        # spurious commit failure (ADVICE r3)
        pass
    if not os.path.exists(path):
        # never conclude a swap that would leave no table at `path`
        raise RuntimeError(
            f"dir swap at {path!r}: neither staged, live, nor backup "
            "copy exists — refusing to remove the marker"
        )
    # missing_ok: the concurrent completer may have removed the marker
    try:
        os.remove(_marker(path))
    except FileNotFoundError:
        pass
    shutil.rmtree(old, ignore_errors=True)


@normalizes_paths('path')
def recover_dir_swap(path: str) -> bool:
    """Replay an interrupted ``swap_dir_commit`` at ``path`` (called
    by writers before a new swap and by readers before listing).
    Returns True if a swap was rolled forward."""
    marker = _marker(path)
    if not os.path.exists(marker):
        return False
    with open(marker, encoding="utf-8") as fh:
        staged = json.load(fh)["staged"]
    _roll_forward(path, staged)
    return True


__all__ = ["swap_dir_commit", "recover_dir_swap"]
