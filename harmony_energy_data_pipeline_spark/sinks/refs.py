"""Named REFS on the snapshot log — TAGS pin versions, BRANCHES fork
the table (the Iceberg branching/tagging shape, VERDICT r9 gap #6).

**Tags** are retention-bearing pointers: a tiny JSON record in
``_snapshots/refs/`` naming one committed version. ``vacuum``
treats every tagged version as kept whatever ``keep_last`` /
``keep_newer_than_s`` say, so a tag pins a training run's EXACT
input table for as long as the tag exists — reproducibility that
survives routine maintenance. Reads resolve through
:func:`read_tag` / :func:`resolve_tag`.

**Branches** reuse the engine's zero-copy clone + borrow machinery:
``create_branch`` clones the table (one manifest write, no data
copied) into ``<table>/_branches/<name>``, registering a borrow so
the MAIN table's vacuum keeps every shared file alive while the
branch exists. The branch is a full native table — every operator
(appends, MERGE, row-level ops, audits, time travel) works on it
unchanged; its own new files land under its own root, invisible to
main's readers and main's orphan sweep (which walks only
``<table>/data``). ``merge_branch`` publishes the branch's current
live state (deletion vectors applied) back as ONE main commit;
``drop_branch`` discards it and releases the borrow.

**WAP parking**: ``snapshot_write_audited(park_branch="x")`` routes
a FAILED audit's staged batch onto a branch instead of orphaning it
— the audit still refuses the main publish (readers never see the
data), but the batch survives for inspection/repair on
``_branches/x`` rather than waiting for vacuum to sweep the
evidence. The raised :class:`AuditFailedError` carries
``parked_branch``.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

_REF_RE = re.compile(r"^[A-Za-z_][A-Za-z_0-9.-]*$")


def _refs_dir(path: str) -> str:
    # inside _snapshots but outside the "v*.json" glob, like borrows/
    return os.path.join(snap._snap_dir(path), "refs")


def _ref_file(path: str, name: str) -> str:
    return os.path.join(_refs_dir(path), f"{name}.json")


def _check_name(name: str) -> None:
    if not _REF_RE.match(name):
        raise ValueError(f"invalid ref name {name!r}")


# --- tags ---------------------------------------------------------------------------

def create_tag(
    path: str, name: str, version: int | None = None,
    replace: bool = False,
) -> int:
    """Pin ``version`` (default: latest) under ``name``. The tagged
    version becomes VACUUM-IMMORTAL until the tag is deleted.
    Returns the pinned version."""
    _check_name(name)
    v = snap.latest_version(path) if version is None else version
    if v is None or v not in snap._versions(path):
        raise ValueError(f"no snapshot v{version} at {path} to tag")
    os.makedirs(_refs_dir(path), exist_ok=True)
    rec = _ref_file(path, name)
    if os.path.exists(rec) and not replace:
        raise FileExistsError(
            f"tag {name!r} already exists at {path}; pass replace=True"
        )
    tmp = rec + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({
            "type": "tag", "name": name, "version": v,
            "created_at_unix": int(time.time()),
        }, fh)
    os.replace(tmp, rec)
    return v


def delete_tag(path: str, name: str) -> None:
    rec = _ref_file(path, name)
    if not os.path.exists(rec):
        raise KeyError(f"no tag {name!r} at {path}")
    os.remove(rec)


def list_tags(path: str) -> dict[str, dict]:
    d = _refs_dir(path)
    if not os.path.isdir(d):
        return {}
    out: dict[str, dict] = {}
    for n in sorted(os.listdir(d)):
        if not n.endswith(".json"):
            continue
        try:
            with open(os.path.join(d, n), encoding="utf-8") as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        if rec.get("type") == "tag":
            out[rec["name"]] = rec
    return out


def resolve_tag(path: str, name: str) -> int:
    tags = list_tags(path)
    if name not in tags:
        raise KeyError(f"no tag {name!r} at {path}")
    return tags[name]["version"]


def read_tag(
    spark: SparkSession, path: str, name: str,
    where: list | None = None,
) -> DataFrame:
    """Read the table exactly as it was when ``name`` was pinned."""
    return snap.read_snapshot(
        spark, path, version=resolve_tag(path, name), where=where
    )


# --- branches -----------------------------------------------------------------------

def branch_path(path: str, name: str) -> str:
    _check_name(name)
    return os.path.join(path, "_branches", name)


def create_branch(
    path: str, name: str, version: int | None = None
) -> str:
    """Fork the table at ``version`` (default: latest) into the
    zero-copy branch table ``<table>/_branches/<name>`` (one manifest
    write; shared files borrow-protected against main's vacuum).
    Returns the branch table path — use the FULL native op surface on
    it."""
    bp = branch_path(path, name)
    if snap.latest_version(bp) is not None:
        raise FileExistsError(f"branch {name!r} already exists at {path}")
    snap.snapshot_clone(path, bp, version=version)
    return bp


def list_branches(path: str) -> dict[str, dict]:
    d = os.path.join(path, "_branches")
    if not os.path.isdir(d):
        return {}
    out: dict[str, dict] = {}
    for n in sorted(os.listdir(d)):
        bp = os.path.join(d, n)
        v = snap.latest_version(bp)
        if v is None:
            continue
        m = snap._read_manifest_raw(bp, 0)
        out[n] = {
            "path": bp, "head_version": v,
            "forked_from_version": m.get("cloned_version"),
        }
    return out


def read_branch(
    spark: SparkSession, path: str, name: str,
    where: list | None = None,
) -> DataFrame:
    bp = branch_path(path, name)
    if snap.latest_version(bp) is None:
        raise KeyError(f"no branch {name!r} at {path}")
    return snap.read_snapshot(spark, bp, where=where)


def merge_branch(
    spark: SparkSession, path: str, name: str, drop: bool = False,
    protocol: str = "link",
) -> int:
    """Publish the branch's CURRENT live state (deletion vectors
    applied, union schema) back onto main as ONE overwrite commit —
    main's CHECK constraints validate the merged rows, main's readers
    flip atomically, and main's history keeps the pre-merge version
    for time travel. The state is MATERIALIZED into main's root (a
    cross-root file reference would tie the branch's lifetime to
    main's manifests — the borrow machinery protects clones from
    sources, not sources from clones). ``drop=True`` discards the
    branch after the merge. Returns main's new version."""
    bp = branch_path(path, name)
    if snap.latest_version(bp) is None:
        raise KeyError(f"no branch {name!r} at {path}")
    m = snap._read_manifest(path, snap.latest_version(path))
    df = snap.read_snapshot(spark, bp)
    stat_cols = sorted({
        c for s in m.get("stats", {}).values() for c in s
        if not c.startswith("#")
    })
    v = snap.snapshot_write(
        df, path, mode="overwrite", protocol=protocol,
        stats_cols=stat_cols or None,
        constraints=m.get("constraints"),
        extra={"merged_from_branch": name},
    )
    if drop:
        drop_branch(path, name)
    return v


def drop_branch(path: str, name: str) -> None:
    """Discard the branch: remove its directory and release the
    borrow so main's vacuum may reclaim files only the branch kept
    alive."""
    bp = branch_path(path, name)
    if snap.latest_version(bp) is None:
        raise KeyError(f"no branch {name!r} at {path}")
    shutil.rmtree(bp, ignore_errors=True)
    snap.snapshot_release_borrow(path, bp, force=True)


__all__ = [
    "create_tag", "delete_tag", "list_tags", "resolve_tag", "read_tag",
    "create_branch", "list_branches", "read_branch", "merge_branch",
    "drop_branch", "branch_path",
]
