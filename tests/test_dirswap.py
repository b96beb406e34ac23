"""Crash-state recovery for the shared directory-swap protocol."""
from __future__ import annotations

import json
import os

from harmony_energy_data_pipeline_spark.sinks.dirswap import (
    recover_dir_swap,
    swap_dir_commit,
)


def _mkdir_with(path, name, content):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        fh.write(content)


def _read(path):
    (f,) = os.listdir(path)
    return open(os.path.join(path, f)).read()


def test_swap_replaces_and_cleans(tmp_path):
    live, staged = str(tmp_path / "t"), str(tmp_path / "t.stage")
    _mkdir_with(live, "a", "old")
    _mkdir_with(staged, "a", "new")
    swap_dir_commit(live, staged)
    assert _read(live) == "new"
    assert not os.path.exists(staged)
    assert not os.path.exists(live + ".__swap.json")
    assert not os.path.exists(live + ".__old_tmp")


def test_swap_fresh_target(tmp_path):
    live, staged = str(tmp_path / "t"), str(tmp_path / "t.stage")
    _mkdir_with(staged, "a", "new")
    swap_dir_commit(live, staged)
    assert _read(live) == "new"


def _marker(live, staged):
    with open(live + ".__swap.json", "w") as fh:
        json.dump({"staged": staged}, fh)


def test_recover_crash_before_first_rename(tmp_path):
    live, staged = str(tmp_path / "t"), str(tmp_path / "t.stage")
    _mkdir_with(live, "a", "old")
    _mkdir_with(staged, "a", "new")
    _marker(live, staged)  # crashed right after writing the marker
    assert recover_dir_swap(live)
    assert _read(live) == "new"
    assert not os.path.exists(live + ".__swap.json")


def test_recover_crash_between_renames(tmp_path):
    live, staged = str(tmp_path / "t"), str(tmp_path / "t.stage")
    _mkdir_with(live + ".__old_tmp", "a", "old")  # live already moved away
    _mkdir_with(staged, "a", "new")
    _marker(live, staged)
    assert recover_dir_swap(live)
    assert _read(live) == "new"
    assert not os.path.exists(live + ".__old_tmp")


def test_recover_crash_after_second_rename(tmp_path):
    live, staged = str(tmp_path / "t"), str(tmp_path / "t.stage")
    _mkdir_with(live, "a", "new")  # swap done, cleanup didn't finish
    _mkdir_with(live + ".__old_tmp", "a", "old")
    _marker(live, staged)  # staged no longer exists
    assert recover_dir_swap(live)
    assert _read(live) == "new"
    assert not os.path.exists(live + ".__old_tmp")


def test_recover_noop_without_marker(tmp_path):
    live = str(tmp_path / "t")
    _mkdir_with(live, "a", "x")
    assert recover_dir_swap(live) is False
    assert _read(live) == "x"


def test_recover_restores_backup_when_staged_and_live_are_gone(tmp_path):
    """Crash state: marker present, staged cleaned up, live renamed
    away — the .__old_tmp backup is the ONLY copy and recovery must
    restore it, not delete it."""
    live = str(tmp_path / "t")
    _mkdir_with(live + ".__old_tmp", "a", "only-copy")
    _marker(live, str(tmp_path / "gone.stage"))
    assert recover_dir_swap(live)
    assert _read(live) == "only-copy"
    assert not os.path.exists(live + ".__old_tmp")
    assert not os.path.exists(live + ".__swap.json")


def test_recover_refuses_when_no_copy_survives(tmp_path):
    import pytest as _pytest

    live = str(tmp_path / "t")
    _marker(live, str(tmp_path / "gone.stage"))
    with _pytest.raises(RuntimeError, match="refusing"):
        recover_dir_swap(live)
    assert os.path.exists(live + ".__swap.json")  # marker kept for the operator
