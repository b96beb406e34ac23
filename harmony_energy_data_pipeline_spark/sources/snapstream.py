"""Streaming SOURCE over a snapshot table — the Delta streaming-source
shape: `spark.readStream.format("snapshot_table").option("path", p)`
turns a lakehouse table written by ``sinks.snapshots`` (batch commits
or the streaming append sink) into an exactly-once stream, so tables
chain into incremental pipelines table → transform → table.

Mechanics:

* **Offsets are version numbers.** The FIRST batch streams the
  table's resolved state at the stream-start version (the Delta
  "initial snapshot" semantic: existing data counts as inserts);
  every later batch covers the commit range ``(start, end]`` and
  streams exactly those versions' ADDED files, read from the raw
  delta manifests (O(range), never a table resolution — the
  log-structured format's CDC fast path).
  ``option("starting_version", N)`` skips the initial snapshot and
  tails commits strictly after version N instead.
* **Distributed reads.** This is a full ``DataSourceStreamReader``:
  the driver plans one partition per added file and executors read
  the parquet with pyarrow, yielding Arrow record batches — the data
  never funnels through the driver (the ``SimpleDataSourceStreamReader``
  prefetch path would).
* **Change-feed mode** (``option("read_changes", "true")``): the
  stream emits ROW-LEVEL changes with ``_change_type`` /
  ``_commit_version`` columns appended — the Delta
  ``readChangeFeed`` streaming shape. Appends stream as inserts;
  deletion-vector commits stream their deleted rows (each covered
  file's positions are taken executor-side, full row content
  recovered); merge-on-read updates stream as delete ⊕ insert; COW
  rewrites committed with ``record_cdf=True`` stream their staged
  change files verbatim. A downstream incremental consumer (signed
  aggregate, index maintainer) therefore follows deletes and updates
  without ever rescanning the source table.
* **Rewrites.** A non-append commit the stream cannot express
  (overwrite, compaction, COW rewrite without change files — or any
  of them in plain insert-only mode) FAILS the stream with a clear
  error (the Delta contract without ``ignoreChanges``).
  ``option("skip_rewrites", "true")`` instead skips those versions'
  file changes — consumers accept eventual re-materialization
  semantics.
* **Exactly-once.** Offsets live in the query checkpoint; a replayed
  batch re-reads the same immutable files. Vacuum caveat: keep the
  stream's lag within the table's retention window.
* **Admission control** (``option("max_files_per_trigger", N)`` /
  ``option("max_bytes_per_trigger", B)`` — the Delta
  ``maxFilesPerTrigger``/``maxBytesPerTrigger`` shapes, composable:
  whichever budget exhausts first caps the batch): each micro-batch
  admits at most N data files / ~B on-disk bytes. The initial snapshot splits into RESUMABLE chunks
  whose progress lives in the offsets (``{"snap_v": V, "idx": K}``),
  so on a huge table the first batch is bounded and a restart
  mid-snapshot resumes at file K instead of replaying everything.
  Tail batches admit whole versions until the budget is spent (at
  least one per batch). The Python DataSource API has no
  SupportsAdmissionControl callback handing latestOffset the start
  offset, so the cap rides a reader-tracked cursor: batch zero caps
  from the initial position (Spark asks latestOffset before
  initialOffset on a fresh stream), and on restart the WAL replay
  (partitions/commit) re-teaches the cursor before the next advance
  — both orderings verified against the processingTime and
  availableNow runners. If an unknown engine path ever planned a
  batch whose offsets cannot be consistent, partitions fails CLOSED
  (ValueError) instead of re-emitting delivered rows. Caveat: a
  ``Trigger.AvailableNow`` run executes ONE capped batch and stops
  (Python sources cannot implement SupportsTriggerAvailableNow's
  multi-batch drain) — under a cap, drive catch-up with a
  processingTime trigger or repeated availableNow runs, each of
  which resumes exactly where the last stopped.

Reference scope note: the reference re-polls its SQLite store and
recomputes dashboards per load (src/app/utils/data_loader.py); this
source is the push-based incremental upgrade of that consumption
path, expressed as a first-class Spark streaming relation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructType

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

#: Change-feed column names — identical to the batch
#: ``read_snapshot_changes_feed`` so consumers share code.
CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"


def _dbg(msg: str) -> None:
    """Append a line to ``$SNAPSTREAM_DEBUG_LOG`` if set — the reader
    runs in a separate Python worker where a debugger can't reach;
    this is the supported way to trace offset negotiation."""
    log = os.environ.get("SNAPSTREAM_DEBUG_LOG")
    if log:
        with open(log, "a", encoding="utf-8") as fh:
            fh.write(f"{os.getpid()} {msg}\n")


@dataclass
class SnapshotFilePartition(InputPartition):
    file: str
    schema_json: str  # TABLE StructType JSON — rebuilt executor-side
    #: change-feed fields; kind stays "plain" outside change mode
    kind: str = "plain"  # plain | insert | delete | cdf
    version: int = -1
    rel: str = ""  # table-root-relative path (DV position filtering)
    dv_files: list = field(default_factory=list)


class SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: StructType, options: dict):
        self.path = path
        self.schema = schema
        self.skip_rewrites = (
            str(options.get("skip_rewrites", "false")).lower() == "true"
        )
        self.read_changes = (
            str(options.get("read_changes", "false")).lower() == "true"
        )
        start = options.get("starting_version")
        start_ts = options.get("starting_timestamp")
        if start is not None and start_ts is not None:
            raise ValueError(
                "pass starting_version OR starting_timestamp, not both"
            )
        if start_ts is not None:
            # tail commits strictly AFTER the latest version committed
            # at or before this unix time (the Delta startingTimestamp
            # shape, resolved once at stream construction)
            start = snap.version_at_timestamp(path, float(start_ts))
        #: None = initial-snapshot mode (first batch streams the whole
        #: table state, marked by the ``"snapshot"`` flag on the
        #: offset); starting_version=N tails commits after version N.
        self.start_version = int(start) if start is not None else None
        #: Admission control (the Delta ``maxFilesPerTrigger`` shape):
        #: cap how many data files one micro-batch admits. The initial
        #: snapshot splits into resumable chunks — progress lives IN
        #: the offsets (``{"snap_v": V, "idx": K}`` = first K files of
        #: the resolved state at pinned version V already emitted), so
        #: a restart mid-snapshot resumes at K instead of replaying
        #: the whole table. Tail batches admit whole versions until
        #: the file budget is spent (always at least one version).
        self.max_files = int(options.get("max_files_per_trigger", 0) or 0)
        if self.max_files < 0:
            raise ValueError("max_files_per_trigger must be >= 0")
        #: Byte-budget analog (the Delta ``maxBytesPerTrigger`` shape):
        #: admit files until their on-disk bytes exceed the budget
        #: (always at least one file/version per batch). Sizes come
        #: from a driver ``os.path.getsize`` over only the CANDIDATE
        #: files of one advance — O(batch), not O(table). Composes
        #: with max_files_per_trigger (whichever budget exhausts
        #: first caps the batch).
        self.max_bytes = int(options.get("max_bytes_per_trigger", 0) or 0)
        if self.max_bytes < 0:
            raise ValueError("max_bytes_per_trigger must be >= 0")
        #: Last end offset this reader returned/observed. The Python
        #: DataSource API passes latestOffset no start offset (the
        #: Scala SupportsAdmissionControl callback has no Python
        #: equivalent), so the cap is applied against this
        #: self-tracked cursor; None means batch zero of a fresh
        #: stream — on restarts the WAL replay (partitions/commit)
        #: re-teaches it before any latestOffset advance.
        self._cursor: dict | None = None

    def initialOffset(self):
        if self.start_version is not None:
            off = {"version": self.start_version}
        else:
            off = {"version": -1, "snapshot": True}
        self._cursor = dict(off)
        _dbg(f"initialOffset -> {off}")
        return off

    def _n_files_at(self, version: int) -> int:
        return len(snap._read_manifest(self.path, version)["files"])

    def _added_files(self, version: int) -> list[str]:
        """Files a single version admits into the stream — raw-manifest
        adds for delta commits, the full file list as the conservative
        bound for legacy full manifests."""
        m = snap._read_manifest_raw(self.path, version)
        return m["adds"] if "adds" in m else m.get("files", [])

    def _file_bytes(self, rel: str) -> int:
        try:
            return os.path.getsize(snap._abs_file(self.path, rel))
        except OSError:
            return 0  # racing a vacuum of an old version: size-neutral

    def _chunk_end(self, files: list[str], lo: int) -> int:
        """First index past ``lo`` where either budget is exhausted —
        always admits at least one file so the stream makes progress."""
        max_f = self.max_files or float("inf")
        max_b = self.max_bytes or float("inf")
        k, b = lo, 0
        while k < len(files):
            if k - lo >= max_f:
                break
            if self.max_bytes:
                b += self._file_bytes(files[k])
            k += 1
            if b >= max_b:
                break
        return k

    def _advance(self, cur: dict, head: int) -> dict:
        """The next capped end offset after ``cur`` toward ``head``."""
        if cur.get("snapshot"):
            # pin the snapshot at the current head; chunk if needed
            files = snap._read_manifest(self.path, head)["files"]
            k = self._chunk_end(files, 0)
            if k >= len(files):
                return {"version": head}
            return {"snap_v": head, "idx": k}
        if "snap_v" in cur:
            hi, k0 = cur["snap_v"], cur["idx"]
            files = snap._read_manifest(self.path, hi)["files"]
            nk = self._chunk_end(files, k0)
            if nk >= len(files):
                return {"version": hi}  # snapshot complete: tail mode
            return {"snap_v": hi, "idx": nk}
        lo = cur["version"]
        v = lo
        budget_f = self.max_files or float("inf")
        budget_b = self.max_bytes or float("inf")
        while v < head:
            adds = self._added_files(v + 1)
            n = len(adds)
            nb = (
                sum(self._file_bytes(f) for f in adds)
                if self.max_bytes else 0
            )
            if v > lo and (n > budget_f or nb > budget_b):
                break  # next version would blow a budget
            v += 1
            budget_f -= n
            budget_b -= nb
            if budget_f <= 0 or budget_b <= 0:
                break
        return {"version": v} if v != lo else dict(cur)

    def latestOffset(self):
        v = snap.latest_version(self.path)
        if v is None:
            return self.initialOffset()
        if not (self.max_files or self.max_bytes):
            off = {"version": v}
        else:
            cur = self._cursor
            if cur is None:
                # First call of a FRESH stream: Spark asks for the
                # latest offset BEFORE initialOffset (verified against
                # both processingTime and availableNow runners). On a
                # RESTART the WAL replay teaches the cursor first —
                # partitions(start, end) and commit(end) both fire
                # before any latestOffset — so None here means batch
                # zero: cap from the stream's own initial position.
                cur = (
                    {"version": self.start_version}
                    if self.start_version is not None
                    else {"version": -1, "snapshot": True}
                )
            off = self._advance(cur, v)
        _dbg(f"latestOffset(cursor={self._cursor}) -> {off}")
        self._cursor = dict(off)
        return off

    def _table_schema_json(self) -> str:
        """The TABLE schema (change columns excluded) — what data
        files align to executor-side."""
        if not self.read_changes:
            return self.schema.json()
        base = StructType(
            [
                f for f in self.schema.fields
                if f.name not in (CHANGE_TYPE_COL, COMMIT_VERSION_COL)
            ]
        )
        return base.json()

    def partitions(self, start: dict, end: dict):
        schema_json = self._table_schema_json()
        out: list[SnapshotFilePartition] = []

        def _insert_parts(files, ver):
            kind = "insert" if self.read_changes else "plain"
            out.extend(
                SnapshotFilePartition(
                    snap._abs_file(self.path, f), schema_json,
                    kind=kind, version=ver,
                )
                for f in files
            )

        def _snapshot_parts(sv: int, lo_idx: int, hi_idx: int):
            # initial snapshot (possibly one CHUNK of it): the table's
            # RESOLVED state at pinned version `sv` streams as inserts
            # (existing rows count as new data — the Delta
            # table-as-stream-source semantic). The slice is a pure
            # function of the immutable version, so replays are exact.
            # Files a deletion vector covers subtract their positions
            # executor-side, so a merge-on-read table streams its LIVE
            # rows without waiting for a compaction.
            m = snap._read_manifest(self.path, sv)
            dvs = m.get("dvs") or {}
            kind = "insert" if self.read_changes else "plain"
            for f in m["files"][lo_idx:hi_idx]:
                dv_abs = [
                    snap._abs_file(self.path, d) for d in dvs.get(f, [])
                ]
                out.append(
                    SnapshotFilePartition(
                        snap._abs_file(self.path, f), schema_json,
                        kind=kind, version=sv,
                        rel=snap._dv_key(f) if dv_abs else "",
                        dv_files=dv_abs,
                    )
                )

        # partitions() sees the WAL's true start offset, which
        # latestOffset never does — keep the admission cursor honest
        # across a recovered (planned-but-uncommitted) batch replay
        _dbg(f"partitions start={start} end={end}")
        self._cursor = dict(end)
        if "snap_v" in end:  # this batch is one mid-snapshot chunk
            # fail CLOSED on offset pairs that cannot arise from a
            # consistent plan (an end positioned BEHIND the start
            # would re-emit delivered rows and break exactly-once)
            if "snap_v" in start and start["snap_v"] != end["snap_v"]:
                raise ValueError(
                    f"inconsistent stream offsets: snapshot pinned at "
                    f"v{start['snap_v']} but batch end pins "
                    f"v{end['snap_v']}; restart from a fresh checkpoint"
                )
            if "snap_v" not in start and not start.get("snapshot"):
                raise ValueError(
                    f"inconsistent stream offsets: start {start} is "
                    f"past the initial snapshot but end {end} is a "
                    "snapshot chunk; restart from a fresh checkpoint"
                )
            lo_idx = 0 if start.get("snapshot") else start["idx"]
            _snapshot_parts(end["snap_v"], lo_idx, end["idx"])
            return out
        hi = end["version"]
        if (
            "snap_v" not in start
            and not start.get("snapshot")
            and hi < start["version"]
        ):
            raise ValueError(
                f"inconsistent stream offsets: end {end} is behind "
                f"start {start}; restart from a fresh checkpoint"
            )
        if start.get("snapshot"):
            _snapshot_parts(hi, 0, self._n_files_at(hi))
            return out
        if "snap_v" in start:
            # a batch spanning the snapshot remainder plus the tail:
            # finish the pinned snapshot, then walk (snap_v, hi] below
            sv = start["snap_v"]
            if hi < sv:
                raise ValueError(
                    f"inconsistent stream offsets: end {end} is behind "
                    f"the pinned snapshot v{sv}; restart from a fresh "
                    "checkpoint"
                )
            _snapshot_parts(sv, start["idx"], self._n_files_at(sv))
            lo = sv
        else:
            lo = start["version"]
        v = hi
        while v is not None and v > lo:
            m = snap._read_manifest_raw(self.path, v)
            kind = m.get("rewrite", {}).get("kind")
            if m["operation"] == "append" and "adds" in m and not m.get(
                "removes"
            ):
                _insert_parts(m["adds"], v)
            elif m["operation"] == "append" and "files" in m:
                # metadata-only commits (stats backfill / DDL) carry a
                # marker and stream zero rows; an UNMARKED full-manifest
                # append is a legacy pre-log-structured append that DID
                # insert rows — stream its file diff vs parent (raises
                # if it also dropped files, like any rewrite would)
                if m.get("backfill") or m.get("ddl"):
                    pass
                else:
                    _insert_parts(
                        snap._legacy_append_adds(self.path, m), v
                    )
            elif self.read_changes and kind in (
                "delete_where_dv", "update_where_mor"
            ):
                # row-level expressible: each covered file's deleted
                # positions recover full row content executor-side;
                # an MOR update's adds stream as the post-image inserts
                dv_rel = sorted(
                    {d for ds in m["dv_adds"].values() for d in ds}
                )
                dv_abs = [snap._abs_file(self.path, d) for d in dv_rel]
                out.extend(
                    SnapshotFilePartition(
                        snap._abs_file(self.path, f), schema_json,
                        kind="delete", version=v,
                        # vector content is _dv_key-canonical
                        rel=snap._dv_key(f), dv_files=dv_abs,
                    )
                    for f in m["dv_adds"]
                )
                _insert_parts(m.get("adds", []), v)
            elif self.read_changes and m.get("cdf"):
                # a COW rewrite that staged change files: stream them
                # verbatim (the rewrite's adds are NOT inserts — they
                # contain carried rows)
                out.extend(
                    SnapshotFilePartition(
                        snap._abs_file(self.path, f), schema_json,
                        kind="cdf", version=v,
                    )
                    for f in m["cdf"]
                )
            elif m.get("compacted_from") is not None:
                # a compaction is provably row-preserving (it rewrote
                # the live rows it read): zero rows to stream, in BOTH
                # modes — routine maintenance no longer kills a strict
                # stream (Delta needs ignoreChanges here because it
                # cannot distinguish; the compacted_from marker can)
                pass
            elif self.skip_rewrites:
                # a rewrite's adds are REWRITTEN old rows, not new
                # data — skipping the whole version is the only
                # consistent reading under skip_rewrites
                pass
            else:
                hint = (
                    "set option('skip_rewrites', 'true')"
                    if not self.read_changes
                    else "commit rewrites with record_cdf=True or set "
                    "option('skip_rewrites', 'true')"
                )
                raise ValueError(
                    f"snapshot v{v} of {self.path} is an "
                    f"{m['operation']!r} commit; the stream cannot "
                    f"express it — restart from a fresh checkpoint "
                    f"(full refresh) or {hint}"
                )
            v = m["parent"]
        return out

    def read(self, partition: SnapshotFilePartition):
        import json

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType

        declared = StructType.fromJson(json.loads(partition.schema_json))
        tbl = pq.read_table(partition.file)
        if partition.dv_files:
            # positions of THIS file's deleted rows, from its vectors
            import pyarrow.compute as pc

            dv = pq.read_table(
                partition.dv_files, columns=["file", "pos"]
            )
            pos = sorted(set(
                dv.filter(
                    pc.equal(dv.column("file"), partition.rel)
                ).column("pos").to_pylist()
            ))
            if partition.kind == "delete":
                # a DV commit streams the deleted rows themselves
                tbl = tbl.take(pos)
            else:
                # an initial snapshot streams the LIVE rows: subtract
                import numpy as np

                mask = np.ones(len(tbl), dtype=bool)
                mask[pos] = False
                tbl = tbl.filter(pa.array(mask))
        names = set(tbl.schema.names)
        # project/align to the table schema: files from before an
        # add-column commit yield TYPED nulls for the new column; a
        # RENAMED column resolves under its full name lineage (one
        # name per file); a WIDENED column's narrower file type casts
        # up; a column absent from the data but present as a hive
        # path segment (…/col=value/…) is a PARTITION column — its
        # constant value reconstructs from the file path, exactly as
        # the batch reader does
        import re as _re
        from urllib.parse import unquote

        arrays = []
        for f in declared.fields:
            target = to_arrow_type(f.dataType)
            cands = [f.name] + list(
                (f.metadata or {}).get("aliases") or []
            )
            hit = next((n for n in cands if n in names), None)
            if hit is not None:
                col = tbl.column(hit)
                arrays.append(
                    col if col.type == target else col.cast(target)
                )
                continue
            raw = None
            for n in cands:
                seg = _re.search(
                    f"/{_re.escape(n)}=([^/]+)/", partition.file
                )
                if seg:
                    raw = unquote(seg.group(1))
                    break
            if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
                arrays.append(pa.nulls(len(tbl), type=target))
            else:
                arrays.append(
                    pa.array([raw] * len(tbl), pa.string()).cast(target)
                )
        out_names = [f.name for f in declared.fields]
        if partition.kind != "plain":
            n = len(tbl)
            if partition.kind == "cdf":
                # change files carry their own _change_type
                ct = tbl.column(CHANGE_TYPE_COL)
            else:
                label = "delete" if partition.kind == "delete" else "insert"
                ct = pa.array([label] * n, type=pa.string())
            arrays.append(ct)
            arrays.append(
                pa.array([partition.version] * n, type=pa.int64())
            )
            out_names = out_names + [CHANGE_TYPE_COL, COMMIT_VERSION_COL]
        yield from pa.table(dict(zip(out_names, arrays))).to_batches()

    def commit(self, end: dict) -> None:
        # offsets are version positions; nothing to clean up — but a
        # commit callback is also cursor knowledge (Spark replays the
        # last committed offset here on restart, which latestOffset
        # never sees), so record it for admission control
        _dbg(f"commit end={end}")
        self._cursor = dict(end)


class SnapshotTableDataSource(DataSource):
    """``spark.dataSource.register(SnapshotTableDataSource)`` then
    ``spark.readStream.format("snapshot_table").option("path", p)``.
    With ``option("read_changes", "true")`` the relation carries the
    two extra change-feed columns."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self):
        path = self.options["path"]
        v = snap.latest_version(path)
        if v is None:
            raise FileNotFoundError(f"no snapshots at {path}")
        m = snap._read_manifest_raw(path, v)
        if "schema" not in m:
            raise ValueError(
                f"snapshot table {path} records no schema; streaming "
                "requires schema-tracked tables (snapshot_write does "
                "this automatically)"
            )
        st = StructType.fromJson(m["schema"])
        if str(self.options.get("read_changes", "false")).lower() == "true":
            st = st.add(CHANGE_TYPE_COL, StringType(), False).add(
                COMMIT_VERSION_COL, LongType(), False
            )
        return st

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(
            self.options["path"], schema, dict(self.options)
        )


__all__ = ["SnapshotTableDataSource", "SnapshotStreamReader"]
