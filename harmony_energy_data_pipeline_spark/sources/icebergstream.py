"""Streaming SOURCE over an Apache Iceberg table directory — the
Iceberg twin of ``deltastream.py``, closing the interop symmetry:
both wire formats now have read / zero-copy adopt / export / STREAM
/ CHANGELOG STREAM. ``spark.readStream.format("iceberg_table")
.option("path", p)`` tails a metadata tree ANY engine writes, no
iceberg-runtime dependency.

Mechanics (mirrors the Delta and native sources):

* **Offsets are SEQUENCE NUMBERS** (monotonic per commit — snapshot
  ids are random and unusable as offsets). The first batch streams
  the live state at the stream-start snapshot (initial-snapshot
  semantics: existing rows count as inserts, POSITION DELETES MASKED
  executor-side — the Delta stream's DV-masked shape);
  ``option("starting_sequence", N)`` skips it and tails snapshots
  with sequence number strictly greater than N.
* **Each later batch** covers the snapshot range ``(start, end]``:
  for every snapshot in range, exactly the data files it ADDED —
  O(range) Avro reads, never a full tree replay. ``replace``
  snapshots (compaction) are SKIPPED ENTIRELY: their adds carry no
  logical change, re-streaming them would duplicate every compacted
  row.
* **Distributed reads**: one input partition per data file;
  executors read the parquet with pyarrow (Iceberg data files store
  every column — nothing to attach), resolving RENAMED columns
  across their historical names.
* **Deletes (append mode)**: a snapshot that removes rows is not
  expressible as an append stream and FAILS with a clear error;
  ``option("ignore_deletes", "true")`` streams its adds and skips
  the rest (eventual re-materialization semantics);
  ``option("skip_change_commits", "true")`` skips such snapshots
  ENTIRELY.
* **Changelog.** ``option("read_change_feed", "true")`` streams
  ROW-LEVEL changes instead of appended rows — the streaming twin of
  :func:`iceberg.read_iceberg_changes`: the schema gains
  ``_change_type`` / ``_snapshot_id``; appends stream as inserts,
  a snapshot's added POSITION-DELETE files materialize the deleted
  rows (the delete parquet joins back against its referenced data
  files executor-side), files a snapshot REMOVES (COW rewrite, full
  overwrite) stream their previously-live rows as deletes, the
  single-snapshot MOR UPDATE expresses as delete+insert.
  EQUALITY deletes refuse (``skip_change_commits`` skips them).
* **Exactly-once**: offsets live in the query checkpoint; replayed
  batches re-read the same immutable files. Keep the stream's lag
  within metadata retention (a vanished snapshot raises).
"""

from __future__ import annotations

import json
import os
import re as _re
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.avrolite import read_avro

_CDF_COLS = ("_change_type", "_snapshot_id")


@dataclass
class IcebergFilePartition(InputPartition):
    file: str
    schema_json: str
    alts_json: str = "{}"      # current name -> historical names
    change_type: str = ""      # "" = plain append-stream row
    snapshot_id: int = 0
    delete_file: bool = False  # file is a position-delete parquet
    mask_json: str = "[]"      # delete parquets masking this data file
    table_root: str = ""


def _norm_path(p: str, root: str) -> str:
    """A delete file's ``file_path`` VALUE (URI / absolute /
    table-relative) → plain absolute path — the executor-side twin of
    ``iceberg._norm_content_path``."""
    p = _re.sub(r"^[a-zA-Z0-9]+:/+", "/", p)
    if not p.startswith("/"):
        p = os.path.join(root, p)
    return os.path.abspath(p)


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: StructType, options: dict):
        self.path = path
        self.schema = schema
        sv = options.get("starting_sequence")
        self.start_seq = int(sv) if sv is not None else None

        def _flag(name):
            return str(options.get(name, "false")).lower() == "true"

        self.ignore_deletes = _flag("ignore_deletes")
        self.skip_change_commits = _flag("skip_change_commits")
        self.read_change_feed = _flag("read_change_feed")

    def initialOffset(self):
        if self.start_seq is not None:
            return {"seq": self.start_seq}
        return {"seq": -1, "snapshot": True}

    def latestOffset(self):
        # the MAIN HEAD's sequence number, not last-sequence-number:
        # an unpublished branch (write-audit-publish) commit advances
        # the table-global sequence without changing main — using
        # last-seq would burn those offsets while the lineage filter
        # drops the data, and a later fast-forward publish (which
        # moves the pointer without allocating a new sequence) would
        # then never stream the published rows
        meta = ice.table_metadata(self.path)
        cur = meta.get("current-snapshot-id")
        for s in meta.get("snapshots") or []:
            if s["snapshot-id"] == cur:
                return {"seq": s.get("sequence-number", 0)}
        return {"seq": meta.get("last-sequence-number", 0)}

    def _snaps_in_range(self, meta: dict, lo: int, hi: int) -> list[dict]:
        lineage = ice._lineage_ids(
            meta, meta.get("current-snapshot-id")
        )
        out = [
            s for s in meta.get("snapshots") or []
            if lo < s.get("sequence-number", 0) <= hi
            and (lineage is None or s["snapshot-id"] in lineage)
        ]
        out.sort(key=lambda s: s.get("sequence-number", 0))
        return out

    def _added_files(self, snap: dict) -> list[str]:
        """APPEND MODE: data files added by exactly this snapshot;
        raises on any delete it would otherwise silently drop.
        ``replace`` (compaction) contributes NOTHING — logical
        content is unchanged, and with the old ``ignore_deletes``
        pass-through its adds would duplicate every compacted row."""
        op = (snap.get("summary") or {}).get("operation", "")
        if op == "replace":
            return []
        ml = ice._resolve_file_path(self.path, snap["manifest-list"])
        manifests, _ = read_avro(ml)
        adds: list[str] = []
        removed = False
        for m in manifests:
            if m.get("added_snapshot_id") != snap["snapshot-id"]:
                continue
            if (m.get("content") or 0) != 0:
                removed = True  # a new DELETE manifest = row removal
                continue
            entries, _ = read_avro(
                ice._resolve_file_path(self.path, m["manifest_path"])
            )
            for e in entries:
                if e.get("status") == 1:  # ADDED here
                    df_rec = e.get("data_file") or {}
                    if (df_rec.get("content") or 0) == 0:
                        adds.append(df_rec["file_path"])
                if e.get("status") == 2:
                    removed = True
        if op in ("overwrite", "delete"):
            removed = True
        if removed:
            if self.skip_change_commits:
                return []  # the whole snapshot is invisible
            if not self.ignore_deletes:
                raise ValueError(
                    f"Iceberg snapshot {snap['snapshot-id']} of "
                    f"{self.path} removes or deletes rows; an append "
                    "stream cannot express it — restart from a fresh "
                    "checkpoint (full refresh) or set "
                    "option('ignore_deletes', 'true') / "
                    "option('skip_change_commits', 'true')"
                )
        return adds

    # --- changelog mode ---------------------------------------------------

    def _snapshot_before(self, meta: dict, snap: dict):
        """The snapshot preceding ``snap`` on ITS LINEAGE: the
        recorded parent when present (an unpublished branch commit
        elsewhere in the history must not become the diff base),
        else the seq-previous snapshot (legacy linear history).
        None = table start."""
        pid = snap.get("parent-snapshot-id")
        if pid is not None:
            for s in meta.get("snapshots") or []:
                if s["snapshot-id"] == pid:
                    return s
            raise ValueError(
                f"snapshot {snap['snapshot-id']}'s parent {pid} was "
                "expired; its changelog diff base is gone — restart "
                "from a fresh checkpoint"
            )
        prev = None
        for s in meta.get("snapshots") or []:
            if s.get("sequence-number", 0) < snap.get(
                "sequence-number", 0
            ):
                if prev is None or s["sequence-number"] > \
                        prev["sequence-number"]:
                    prev = s
        return prev

    def _cdf_snapshot_parts(self, meta, snap, mk):
        """Changelog partitions for ONE snapshot: the live-set diff
        against its predecessor. Inserted files stream as inserts,
        files that LEFT the live set stream their previously-live
        rows as deletes (masked by the deletes that already applied
        to them), ADDED position-delete files materialize their
        deleted rows. Uniform across append / MOR delete+update /
        COW rewrite / full overwrite."""
        op = (snap.get("summary") or {}).get("operation", "append")
        if op == "replace":
            return []
        sid = snap["snapshot-id"]
        prev = self._snapshot_before(meta, snap)
        cur_data, cur_dels = ice.live_files(self.path, meta, sid)
        if prev is not None:
            prev_data, prev_dels = ice.live_files(
                self.path, meta, prev["snapshot-id"]
            )
        else:
            prev_data, prev_dels = [], []
        if any((d.get("content") or 0) == 2
               for d in cur_dels + prev_dels):
            if self.skip_change_commits:
                return []
            raise ValueError(
                "changelog over EQUALITY deletes is not expressible "
                "without a replay — compact first (iceberg_compact) "
                "or set option('skip_change_commits', 'true')"
            )
        cur_by_path = {d["file_path"]: d for d in cur_data}
        prev_by_path = {d["file_path"]: d for d in prev_data}
        prev_del_paths = sorted(
            d["file_path"] for d in prev_dels
            if (d.get("content") or 0) == 1
        )
        prev_mask = json.dumps([
            ice._resolve_file_path(self.path, p)
            for p in prev_del_paths
        ])
        added_del_paths = sorted(
            {d["file_path"] for d in cur_dels
             if (d.get("content") or 0) == 1}
            - set(prev_del_paths)
        )
        parts = []
        for p in sorted(set(cur_by_path) - set(prev_by_path)):
            parts.append(mk(p, change_type="insert", snapshot_id=sid))
        for p in sorted(set(prev_by_path) - set(cur_by_path)):
            # previously-live rows of a removed file = deletes
            parts.append(mk(p, change_type="delete", snapshot_id=sid,
                            mask_json=prev_mask))
        for p in added_del_paths:
            parts.append(mk(p, change_type="delete", snapshot_id=sid,
                            delete_file=True))
        return parts

    def partitions(self, start: dict, end: dict):
        meta = ice.table_metadata(self.path)
        schema = ice._current_schema(meta)
        spark_schema = ice._schema_to_spark(schema)
        if self.read_change_feed:
            spark_schema = StructType(
                list(spark_schema.fields)
                + [StructField("_change_type", StringType(), True),
                   StructField("_snapshot_id", LongType(), True)]
            )
        sj = json.dumps(spark_schema.jsonValue())
        aj = json.dumps(ice._rename_alternates(meta, schema) or {})
        root = os.path.abspath(self.path)

        def mk(file_rel, **kw):
            return IcebergFilePartition(
                file=ice._resolve_file_path(self.path, file_rel),
                schema_json=sj, alts_json=aj, table_root=root, **kw,
            )

        parts: list[IcebergFilePartition] = []
        if start.get("snapshot"):
            # initial snapshot: the live state at the END offset's
            # latest snapshot; position deletes MASK executor-side
            target = None
            for s in meta.get("snapshots") or []:
                if s.get("sequence-number", 0) <= end["seq"]:
                    if target is None or s["sequence-number"] > \
                            target["sequence-number"]:
                        target = s
            if target is not None:
                data, deletes = ice.live_files(
                    self.path, meta, target["snapshot-id"]
                )
                if any((d.get("content") or 0) == 2 for d in deletes):
                    raise ValueError(
                        "initial snapshot carries EQUALITY deletes; "
                        "compact the table first (iceberg_compact)"
                    )
                mask = json.dumps([
                    ice._resolve_file_path(self.path, d["file_path"])
                    for d in deletes
                    if (d.get("content") or 0) == 1
                ])
                kw = (
                    {"change_type": "insert",
                     "snapshot_id": target["snapshot-id"]}
                    if self.read_change_feed else {}
                )
                parts = [
                    mk(d["file_path"], mask_json=mask, **kw)
                    for d in data
                ]
        elif self.read_change_feed:
            for s in self._snaps_in_range(meta, start["seq"],
                                          end["seq"]):
                parts.extend(self._cdf_snapshot_parts(meta, s, mk))
        else:
            for s in self._snaps_in_range(meta, start["seq"],
                                          end["seq"]):
                parts.extend(mk(f) for f in self._added_files(s))
        return parts or [
            IcebergFilePartition(file="", schema_json=sj)
        ]

    def read(self, partition: IcebergFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType as _ST

        declared = _ST.fromJson(json.loads(partition.schema_json))
        alts = json.loads(partition.alts_json or "{}")
        data_fields = [f for f in declared.fields
                       if f.name not in _CDF_COLS]
        has_cdf = len(data_fields) != len(declared.fields)

        def _empty():
            yield from pa.table({
                f.name: pa.array([], to_arrow_type(f.dataType))
                for f in declared.fields
            }).to_batches()

        if not partition.file:
            yield from _empty()
            return

        def _project(tbl, fields):
            """Rename-aware column projection: a file written before
            a rename stores a historical name."""
            names = set(tbl.schema.names)
            arrays, out_names = [], []
            for f in fields:
                target = to_arrow_type(f.dataType)
                src = f.name if f.name in names else next(
                    (a for a in alts.get(f.name, []) if a in names),
                    None,
                )
                if src is not None:
                    col = tbl.column(src)
                    arrays.append(
                        col if col.type == target
                        else col.cast(target)
                    )
                else:
                    arrays.append(pa.nulls(len(tbl), type=target))
                out_names.append(f.name)
            return pa.table(dict(zip(out_names, arrays)))

        def _with_cdf(tbl):
            if not has_cdf:
                return tbl
            n = len(tbl)
            return tbl.append_column(
                "_change_type",
                pa.array([partition.change_type] * n, pa.string()),
            ).append_column(
                "_snapshot_id",
                pa.array([partition.snapshot_id] * n, pa.int64()),
            )

        if partition.delete_file:
            # a position-delete parquet: materialize the deleted
            # rows by reading the referenced data files' positions
            dv = pq.read_table(partition.file,
                               columns=["file_path", "pos"])
            by_file: dict[str, list[int]] = {}
            for fp, pos in zip(
                dv.column("file_path").to_pylist(),
                dv.column("pos").to_pylist(),
            ):
                by_file.setdefault(
                    _norm_path(fp, partition.table_root), []
                ).append(pos)
            for fp, positions in sorted(by_file.items()):
                tbl = _project(pq.read_table(fp), data_fields)
                taken = tbl.take(
                    pa.array(sorted(positions), type=pa.int64())
                )
                yield from _with_cdf(taken).to_batches()
            if not by_file:
                yield from _empty()
            return

        tbl = pq.read_table(partition.file)
        n = len(tbl)
        masked = _project(tbl, data_fields)
        mask_files = json.loads(partition.mask_json or "[]")
        if mask_files and n:
            me = os.path.abspath(partition.file)
            dead: set[int] = set()
            for mf in mask_files:
                dv = pq.read_table(mf, columns=["file_path", "pos"])
                for fp, pos in zip(
                    dv.column("file_path").to_pylist(),
                    dv.column("pos").to_pylist(),
                ):
                    if _norm_path(fp, partition.table_root) == me:
                        dead.add(pos)
            if dead:
                keep = [i for i in range(n) if i not in dead]
                masked = masked.take(pa.array(keep, type=pa.int64()))
        yield from _with_cdf(masked).to_batches()

    def commit(self, end: dict) -> None:
        pass  # offsets are sequence numbers; nothing to clean up


class IcebergTableDataSource(DataSource):
    """``spark.dataSource.register(IcebergTableDataSource)`` then
    ``spark.readStream.format("iceberg_table").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "iceberg_table"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "option('path', <iceberg table dir>) required"
            )
        meta = ice.table_metadata(path)
        out = ice._schema_to_spark(ice._current_schema(meta))
        if str(self.options.get("read_change_feed", "false")
               ).lower() == "true":
            out = StructType(
                list(out.fields)
                + [StructField("_change_type", StringType(), True),
                   StructField("_snapshot_id", LongType(), True)]
            )
        return out

    def streamReader(self, schema: StructType) -> IcebergStreamReader:
        return IcebergStreamReader(
            self.options["path"], schema, dict(self.options)
        )


__all__ = ["IcebergTableDataSource", "IcebergStreamReader"]
