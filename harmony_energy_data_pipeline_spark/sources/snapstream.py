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

Reference scope note: the reference re-polls its SQLite store and
recomputes dashboards per load (src/app/utils/data_loader.py); this
source is the push-based incremental upgrade of that consumption
path, expressed as a first-class Spark streaming relation.
"""

from __future__ import annotations

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

    def initialOffset(self):
        if self.start_version is not None:
            return {"version": self.start_version}
        return {"version": -1, "snapshot": True}

    def latestOffset(self):
        v = snap.latest_version(self.path)
        if v is None:
            return self.initialOffset()
        return {"version": v}

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
        hi = end["version"]
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

        if start.get("snapshot"):
            # initial snapshot: the table's RESOLVED state at `hi`
            # streams as inserts (existing rows count as new data —
            # the Delta table-as-stream-source semantic). Files a
            # deletion vector covers subtract their positions
            # executor-side, so a merge-on-read table streams its
            # LIVE rows without waiting for a compaction.
            m = snap._read_manifest(self.path, hi)
            dvs = m.get("dvs") or {}
            kind = "insert" if self.read_changes else "plain"
            for f in m["files"]:
                dv_abs = [
                    snap._abs_file(self.path, d) for d in dvs.get(f, [])
                ]
                out.append(
                    SnapshotFilePartition(
                        snap._abs_file(self.path, f), schema_json,
                        kind=kind, version=hi,
                        rel=snap._dv_key(f) if dv_abs else "",
                        dv_files=dv_abs,
                    )
                )
            return out
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
                pass  # metadata-only append (stats backfill)
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
        # add-column commit yield TYPED nulls for the new column
        arrays = []
        for f in declared.fields:
            if f.name in names:
                arrays.append(tbl.column(f.name))
            else:
                arrays.append(
                    pa.nulls(len(tbl), type=to_arrow_type(f.dataType))
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
        pass  # offsets are version numbers; nothing to clean up


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
