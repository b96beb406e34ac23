"""Manifest-based snapshot log: atomic commits, time travel, vacuum.

The partition-swap protocol (``sinks.partitioned``) gives atomic
REPLACEMENT of partitions in place; this module adds the other table
guarantee a 100 TB lake table needs — MVCC-style snapshot isolation
the way Iceberg/Delta provide it, reduced to its load-bearing core:

* data files are IMMUTABLE — every commit writes new parquet files
  under ``<path>/data/<txid>/`` and never touches existing ones;
* a snapshot is a JSON manifest ``<path>/_snapshots/v<N>.json``
  listing exactly the live files of version N; publishing the
  manifest IS the commit, and it is a true compare-and-swap
  (``os.link`` of a fsync'd temp file — fails if v<N> already
  exists, so two racing writers cannot both claim a version);
* readers resolve a manifest ONCE and then read a frozen file list —
  a reader is never torn across a concurrent commit, and reading an
  old version (time travel) is the same code path;
* a crash before the manifest rename leaves only orphaned data files
  that no manifest references — invisible to every reader, swept by
  ``vacuum``.

Reference scope note: the reference keeps exactly one mutable SQLite
file with rollback-journal atomicity (src/serve/load.py:38-49,
src/db/client.py); snapshots are the parquet-at-scale equivalent of
that durability contract plus the audit trail its
``pipeline_run_history`` table approximates (src/db/models.py:48-58).
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _snap_dir(path: str) -> str:
    return os.path.join(path, "_snapshots")


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version:012d}.json")


def _versions(path: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(_snap_dir(path), "v*.json"))
    )


def latest_version(path: str) -> int | None:
    vs = _versions(path)
    return vs[-1] if vs else None


def _read_manifest(path: str, version: int) -> dict:
    mp = _manifest_path(path, version)
    if not os.path.exists(mp):
        raise FileNotFoundError(
            f"snapshot v{version} does not exist at {path} "
            f"(available: {_versions(path)})"
        )
    with open(mp, encoding="utf-8") as fh:
        return json.load(fh)


def _publish_manifest(path: str, version: int, payload: dict) -> None:
    """Durable compare-and-swap publish: fsync a temp file, then
    ``os.link`` it to the version name — link fails with EEXIST if
    another writer claimed the version first (unlike rename, which
    silently overwrites), then fsync the directory so the commit
    survives power loss."""
    os.makedirs(_snap_dir(path), exist_ok=True)
    tmp = os.path.join(_snap_dir(path), f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(payload, fh)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        os.link(tmp, _manifest_path(path, version))
    finally:
        os.unlink(tmp)
    dfd = os.open(_snap_dir(path), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _data_files(data_dir: str) -> list[str]:
    return sorted(
        os.path.join(dp, f)
        for dp, _dirs, files in os.walk(data_dir)
        for f in files
        if f.endswith(".parquet")
    )


def snapshot_write(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_retries: int = 10,
    extra: dict | None = None,
) -> int:
    """Commit ``df`` as a new snapshot of the table at ``path``.

    ``mode='overwrite'`` — the new version's live set is exactly this
    batch's files; ``mode='append'`` — the parent version's files
    plus this batch's. Either way no existing file is modified, so
    every concurrent reader keeps a consistent view. Returns the
    committed version number.

    On a CAS collision (another writer claimed the version) the
    commit retries against the new latest — the data files are
    already written and file-list reuse makes the retry metadata-only
    (optimistic concurrency, the Iceberg model).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    txid = uuid.uuid4().hex[:12]
    data_dir = os.path.join(path, "data", txid)
    df.write.mode("error").parquet(data_dir)
    new_files = _data_files(data_dir)
    for _ in range(max_retries):
        parent = latest_version(path)
        version = 0 if parent is None else parent + 1
        files = list(new_files)
        if mode == "append" and parent is not None:
            files = _read_manifest(path, parent)["files"] + files
        payload = {
            "version": version,
            "parent": parent,
            "operation": mode,
            "txid": txid,
            "committed_at_unix": int(time.time()),
            "files": files,
            **(extra or {}),
        }
        try:
            _publish_manifest(path, version, payload)
            return version
        except FileExistsError:
            continue  # lost the race; recompute against new latest
    raise RuntimeError(f"snapshot commit lost the CAS race {max_retries} times")


def read_snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: latest). The manifest
    is resolved once; the returned DataFrame scans a FROZEN file list,
    so concurrent commits (or vacuums of other versions) never tear
    this reader. Time travel = pass an older version number."""
    v = latest_version(path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no snapshots at {path}")
    files = _read_manifest(path, v)["files"]
    if not files:
        raise FileNotFoundError(f"snapshot v{v} at {path} lists no files")
    return spark.read.parquet(*files)


def read_snapshot_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int
) -> DataFrame:
    """Incremental (CDC-style) read: the rows ADDED between
    ``from_version`` (exclusive) and ``to_version`` (inclusive) —
    i.e. the files in ``to``'s manifest that ``from``'s lacks.
    Because data files are immutable, the file-set difference IS the
    row-level delta for append-only chains; the primitive an
    incremental consumer (downstream ETL, index builder, streaming
    backfill) uses to process each commit exactly once, resuming from
    the last version it recorded.

    Raises if any intermediate commit in the range was an OVERWRITE —
    file-set diffs can't represent deletions, so a consumer must
    detect the rewrite and fall back to a full re-read (the same
    contract Delta's CDF/Iceberg's incremental scan expose).
    """
    lo, hi = _read_manifest(path, from_version), _read_manifest(path, to_version)
    v = to_version
    while v is not None and v > from_version:
        m = _read_manifest(path, v)
        if m["operation"] != "append":
            raise ValueError(
                f"snapshot v{v} is an {m['operation']!r} commit; the "
                f"({from_version}, {to_version}] range is not append-only — "
                "incremental read undefined, re-read the full snapshot"
            )
        v = m["parent"]
    old_files = set(lo["files"])
    new_files = [f for f in hi["files"] if f not in old_files]
    if not new_files:
        return read_snapshot(spark, path, to_version).limit(0)
    return spark.read.parquet(*new_files)


def committed_marker_values(path: str, key: str) -> set:
    """All values of manifest field ``key`` across live snapshots —
    e.g. the stream batch ids already committed, for exactly-once
    foreachBatch sinks (``streaming.start_snapshot_append_sink``)."""
    out = set()
    for v in _versions(path):
        m = _read_manifest(path, v)
        if key in m:
            out.add(m[key])
    return out


def snapshot_history(path: str) -> list[dict]:
    """Commit log, oldest first: (version, parent, operation, n_files)
    per snapshot — the audit surface ``pipeline_run_history`` gives
    the reference, derived here from the manifests themselves."""
    out = []
    for v in _versions(path):
        m = _read_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "n_files": len(m["files"]),
            }
        )
    return out


def vacuum(path: str, keep_last: int = 1) -> int:
    """Expire all but the last ``keep_last`` snapshots: drop their
    manifests, then delete every data file (and empty txid dir) no
    surviving snapshot references — including orphans from crashed
    pre-publish writers. Returns the number of files deleted.

    Readers holding an already-resolved DataFrame for an expired
    version still stream their frozen file list until those files go;
    the single-writer-vacuum assumption matches the swap protocol's.
    """
    vs = _versions(path)
    keep = vs[-keep_last:] if keep_last > 0 else []
    # liveness compares ABSOLUTE paths: manifests may have been written
    # from a different cwd than this vacuum call — a raw string compare
    # would then mark every live file dead and delete the table
    live: set[str] = set()
    for v in keep:
        live.update(os.path.abspath(f) for f in _read_manifest(path, v)["files"])
    removed = 0
    for v in vs:
        if v not in keep:
            os.remove(_manifest_path(path, v))
    data_root = os.path.join(path, "data")
    for dp, _dirs, files in os.walk(data_root, topdown=False):
        dir_has_live = any(
            os.path.abspath(os.path.join(dp, g)) in live
            for g in files if g.endswith(".parquet")
        )
        for f in files:
            full = os.path.abspath(os.path.join(dp, f))
            if f.endswith(".parquet"):
                if full not in live:
                    os.remove(full)
                    removed += 1
            elif not dir_has_live:  # _SUCCESS/.crc of a fully-expired commit
                os.remove(full)
        if dp != data_root and not os.listdir(dp):
            os.rmdir(dp)
    return removed


__all__ = [
    "snapshot_write", "read_snapshot", "read_snapshot_changes",
    "snapshot_history", "latest_version", "vacuum",
    "committed_marker_values",
]
