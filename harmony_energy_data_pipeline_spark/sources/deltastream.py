"""Streaming SOURCE over a Delta Lake table directory — the interop
triangle's last edge: ``spark.readStream.format("delta_table")
.option("path", p)`` tails a ``_delta_log`` that ANY engine writes
(delta-spark, Trino, polars, our own writer) as an exactly-once
stream, no delta-spark dependency.

Mechanics (mirrors sources/snapstream.py, the native source):

* **Offsets are Delta versions.** The first batch streams the live
  state at the stream-start version (initial-snapshot semantics:
  existing rows count as inserts); each later batch covers the commit
  range ``(start, end]`` and streams exactly those versions' ADD
  actions — O(range) JSON reads, never a full log replay.
  ``option("starting_version", N)`` skips the initial snapshot and
  tails commits strictly after N.
* **Distributed reads.** Full ``DataSourceStreamReader``: one input
  partition per add action; executors read the parquet with pyarrow
  and attach the add's authoritative ``partitionValues`` as typed
  constant columns (the wire-format rule — partition columns are not
  in the data files). Data never funnels through the driver.
* **Removes.** A version carrying remove actions is not expressible
  as an append stream and FAILS with a clear error (the Delta
  contract without ``ignoreDeletes``);
  ``option("ignore_deletes", "true")`` streams such versions' adds
  and skips the removes (eventual re-materialization semantics).
* **Exactly-once.** Offsets live in the query checkpoint; replayed
  batches re-read the same immutable files. Keep the stream's lag
  within the log's retention (a checkpoint-cleaned range raises).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from harmony_energy_data_pipeline_spark.sources import deltalake as dl


@dataclass
class DeltaFilePartition(InputPartition):
    file: str
    schema_json: str
    pvals: dict = field(default_factory=dict)
    pcols: list = field(default_factory=list)


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: StructType, options: dict):
        self.path = path
        self.schema = schema
        sv = options.get("starting_version")
        self.start_version = int(sv) if sv is not None else None
        self.ignore_deletes = (
            str(options.get("ignore_deletes", "false")).lower() == "true"
        )

    def initialOffset(self):
        if self.start_version is not None:
            return {"version": self.start_version}
        return {"version": -1, "snapshot": True}

    def latestOffset(self):
        v = dl.delta_table_version(self.path)
        if v is None:
            raise FileNotFoundError(
                f"no Delta log at {self.path}/_delta_log"
            )
        return {"version": v}

    def _version_adds(self, v: int) -> list[dict]:
        lp = dl._log_path(self.path, v)
        if not os.path.exists(lp):
            raise FileNotFoundError(
                f"Delta commit {v} of {self.path} is gone (log "
                "retention passed the stream's lag); restart from a "
                "fresh checkpoint"
            )
        adds: list[dict] = []
        with open(lp, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "add" in act:
                    adds.append(act["add"])
                elif "remove" in act and not self.ignore_deletes:
                    raise ValueError(
                        f"Delta version {v} of {self.path} removes "
                        "files; an append stream cannot express it — "
                        "restart from a fresh checkpoint (full refresh) "
                        "or set option('ignore_deletes', 'true')"
                    )
        return adds

    def partitions(self, start: dict, end: dict):
        e = end["version"]
        adds, meta, _p, _v = dl._replay(self.path, e)
        pcols = list(meta.get("partitionColumns") or [])
        sj = meta["schemaString"]
        if not start.get("snapshot"):
            ranged: list[dict] = []
            for v in range(start["version"] + 1, e + 1):
                ranged.extend(self._version_adds(v))
            adds = ranged
        parts = [
            DeltaFilePartition(
                file=os.path.join(self.path, dl.unquote(a["path"])),
                schema_json=sj,
                pvals=dict(a.get("partitionValues") or {}),
                pcols=pcols,
            )
            for a in adds
        ]
        # Spark requires >= 1 partition per batch: an empty range
        # (pure-remove version under ignore_deletes) emits a zero-row
        # marker partition
        return parts or [
            DeltaFilePartition(file="", schema_json=sj, pcols=pcols)
        ]

    def read(self, partition: DeltaFilePartition):
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
            if f.name in partition.pcols:
                raw = partition.pvals.get(f.name)
                arrays.append(
                    pa.nulls(len(tbl), type=target) if raw is None
                    else pa.array([raw] * len(tbl), pa.string())
                    .cast(target)
                )
            elif f.name in names:
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
        pass  # offsets are versions; nothing to clean up


class DeltaTableDataSource(DataSource):
    """``spark.dataSource.register(DeltaTableDataSource)`` then
    ``spark.readStream.format("delta_table").option("path", p)``."""

    @classmethod
    def name(cls) -> str:
        return "delta_table"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("option('path', <delta table dir>) required")
        _adds, meta, _p, _v = dl._replay(path, None)
        return StructType.fromJson(json.loads(meta["schemaString"]))

    def streamReader(self, schema: StructType) -> DeltaStreamReader:
        return DeltaStreamReader(
            self.options["path"], schema, dict(self.options)
        )


__all__ = ["DeltaTableDataSource", "DeltaStreamReader"]
