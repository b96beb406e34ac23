"""Streaming SOURCE over an Apache Iceberg table directory — the
Iceberg twin of ``deltastream.py``, closing the interop symmetry:
both wire formats now have read / zero-copy adopt / export / STREAM.
``spark.readStream.format("iceberg_table").option("path", p)`` tails
a metadata tree ANY engine writes, no iceberg-runtime dependency.

Mechanics (mirrors the Delta and native sources):

* **Offsets are SEQUENCE NUMBERS** (monotonic per commit — snapshot
  ids are random and unusable as offsets). The first batch streams
  the live state at the stream-start snapshot (initial-snapshot
  semantics: existing rows count as inserts);
  ``option("starting_sequence", N)`` skips it and tails snapshots
  with sequence number strictly greater than N.
* **Each later batch** covers the snapshot range ``(start, end]``:
  for every snapshot in range, exactly the data files it ADDED
  (manifest-list entries it added, status=ADDED) — O(range) Avro
  reads, never a full tree replay.
* **Distributed reads**: one input partition per data file;
  executors read the parquet with pyarrow (Iceberg data files store
  every column — nothing to attach).
* **Deletes**: an overwrite/delete snapshot is not expressible as an
  append stream and FAILS with a clear error;
  ``option("ignore_deletes", "true")`` streams its adds and skips
  the rest (eventual re-materialization semantics). Position-delete
  snapshots count as deletes.
* **Exactly-once**: offsets live in the query checkpoint; replayed
  batches re-read the same immutable files. Keep the stream's lag
  within metadata retention (a vanished snapshot raises).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sources.avrolite import read_avro


@dataclass
class IcebergFilePartition(InputPartition):
    file: str
    schema_json: str


class IcebergStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: StructType, options: dict):
        self.path = path
        self.schema = schema
        sv = options.get("starting_sequence")
        self.start_seq = int(sv) if sv is not None else None
        self.ignore_deletes = (
            str(options.get("ignore_deletes", "false")).lower() == "true"
        )

    def initialOffset(self):
        if self.start_seq is not None:
            return {"seq": self.start_seq}
        return {"seq": -1, "snapshot": True}

    def latestOffset(self):
        meta = ice.table_metadata(self.path)
        return {"seq": meta.get("last-sequence-number", 0)}

    def _snaps_in_range(self, meta: dict, lo: int, hi: int) -> list[dict]:
        out = [
            s for s in meta.get("snapshots") or []
            if lo < s.get("sequence-number", 0) <= hi
        ]
        out.sort(key=lambda s: s.get("sequence-number", 0))
        return out

    def _added_files(self, snap: dict) -> list[str]:
        """Data files ADDED by exactly this snapshot; raises on any
        delete it would otherwise silently drop."""
        ml = ice._resolve_file_path(self.path, snap["manifest-list"])
        manifests, _ = read_avro(ml)
        op = (snap.get("summary") or {}).get("operation", "")
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
        if op in ("overwrite", "delete", "replace"):
            removed = True
        if removed and not self.ignore_deletes:
            raise ValueError(
                f"Iceberg snapshot {snap['snapshot-id']} of "
                f"{self.path} removes or deletes rows; an append "
                "stream cannot express it — restart from a fresh "
                "checkpoint (full refresh) or set "
                "option('ignore_deletes', 'true')"
            )
        return adds

    def partitions(self, start: dict, end: dict):
        meta = ice.table_metadata(self.path)
        schema = ice._current_schema(meta)
        sj = json.dumps(ice._schema_to_spark(schema).jsonValue())
        if start.get("snapshot"):
            # initial snapshot: the live state at the END offset's
            # latest snapshot (position deletes would need
            # merge-on-read the per-file partition shape can't
            # express: refuse unless ignored)
            target = None
            for s in meta.get("snapshots") or []:
                if s.get("sequence-number", 0) <= end["seq"]:
                    if target is None or s["sequence-number"] > \
                            target["sequence-number"]:
                        target = s
            if target is None:
                files: list[str] = []
            else:
                data, deletes = ice.live_files(
                    self.path, meta, target["snapshot-id"]
                )
                if deletes and not self.ignore_deletes:
                    raise ValueError(
                        "initial snapshot carries delete files "
                        "(position or equality); compact the table "
                        "first or set option('ignore_deletes', "
                        "'true') (deleted rows would then RESURFACE "
                        "in the stream)"
                    )
                files = [d["file_path"] for d in data]
        else:
            files = []
            for s in self._snaps_in_range(
                meta, start["seq"], end["seq"]
            ):
                files.extend(self._added_files(s))
        parts = [
            IcebergFilePartition(
                file=ice._resolve_file_path(self.path, f),
                schema_json=sj,
            )
            for f in files
        ]
        return parts or [IcebergFilePartition(file="", schema_json=sj)]

    def read(self, partition: IcebergFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType as _ST

        declared = _ST.fromJson(json.loads(partition.schema_json))
        if not partition.file:
            yield from pa.table({
                f.name: pa.array([], to_arrow_type(f.dataType))
                for f in declared.fields
            }).to_batches()
            return
        tbl = pq.read_table(partition.file)
        names = set(tbl.schema.names)
        arrays = []
        for f in declared.fields:
            target = to_arrow_type(f.dataType)
            if f.name in names:
                col = tbl.column(f.name)
                arrays.append(
                    col if col.type == target else col.cast(target)
                )
            else:
                arrays.append(pa.nulls(len(tbl), type=target))
        yield from pa.table(
            dict(zip([f.name for f in declared.fields], arrays))
        ).to_batches()

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
        return ice._schema_to_spark(ice._current_schema(meta))

    def streamReader(self, schema: StructType) -> IcebergStreamReader:
        return IcebergStreamReader(
            self.options["path"], schema, dict(self.options)
        )


__all__ = ["IcebergTableDataSource", "IcebergStreamReader"]
