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
  COLUMN-MAPPED tables (name/id mode) resolve physical names; adds
  carrying DELETION VECTORS stream only their live rows (the DV
  expands executor-side and masks positions).
* **Removes.** A version carrying remove actions is not expressible
  as an append stream and FAILS with a clear error (the Delta
  contract without ``ignoreDeletes``);
  ``option("ignore_deletes", "true")`` streams such versions' adds
  and skips the removes (eventual re-materialization — re-added
  DV'd files stream their live rows, so downstream sees duplicates
  exactly as Delta's own ``ignoreChanges`` documents);
  ``option("skip_change_commits", "true")`` skips such versions
  ENTIRELY (the modern Delta ``skipChangeCommits``).
* **Change feed.** ``option("read_change_feed", "true")`` streams
  ROW-LEVEL changes instead of appended rows — the Delta
  ``readChangeFeed`` shape: the schema gains ``_change_type`` /
  ``_commit_version``; a commit's spec ``cdc`` files are
  authoritative (insert/delete/update_preimage/update_postimage read
  verbatim), blind appends stream as inserts, a remove-carrying
  commit WITHOUT cdc raises (its row-level changes are not
  recoverable — enable CDF on the writer). The initial snapshot
  streams as inserts at the start version.
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
from pyspark.sql.types import LongType, StringType, StructField, StructType

from harmony_energy_data_pipeline_spark.sources import deltalake as dl

_CDF_COLS = ("_change_type", "_commit_version")


@dataclass
class DeltaFilePartition(InputPartition):
    file: str
    schema_json: str
    pvals: dict = field(default_factory=dict)
    pcols: list = field(default_factory=list)
    phys_json: str = "{}"       # logical → physical column names
    dv_json: str = ""           # deletionVector descriptor ("" = none)
    table_path: str = ""        # DV path resolution root
    change_type: str = ""       # constant _change_type (CDF mode)
    commit_version: int = -1    # _commit_version (CDF mode)
    cdc_file: bool = False      # file carries its own _change_type


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, schema: StructType, options: dict):
        self.path = path
        self.schema = schema
        sv = options.get("starting_version")
        self.start_version = int(sv) if sv is not None else None

        def _flag(name: str) -> bool:
            return str(options.get(name, "false")).lower() == "true"

        self.ignore_deletes = _flag("ignore_deletes")
        self.skip_change_commits = _flag("skip_change_commits")
        self.read_change_feed = _flag("read_change_feed")

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

    def _version_actions(self, v: int):
        """``(cdc, adds, removes)`` of one commit's log file."""
        lp = dl._log_path(self.path, v)
        if not os.path.exists(lp):
            raise FileNotFoundError(
                f"Delta commit {v} of {self.path} is gone (log "
                "retention passed the stream's lag); restart from a "
                "fresh checkpoint"
            )
        cdc: list[dict] = []
        adds: list[dict] = []
        removes: list[dict] = []
        with open(lp, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                act = json.loads(line)
                if "cdc" in act:
                    cdc.append(act["cdc"])
                elif "add" in act:
                    adds.append(act["add"])
                elif "remove" in act:
                    removes.append(act["remove"])
        return cdc, adds, removes

    def _version_adds(self, v: int) -> list[dict]:
        _cdc, adds, removes = self._version_actions(v)
        # dataChange=false commits (OPTIMIZE-style compaction) carry
        # no logical change: re-streaming their adds would duplicate
        # every compacted row, and their removes must not kill the
        # stream
        # dataChange is REQUIRED by the spec, but a writer that
        # omits it means a real data commit — default True so its
        # rows are not silently dropped
        adds = [a for a in adds if a.get("dataChange", True)]
        removes = [r for r in removes if r.get("dataChange", True)]
        if removes:
            if self.skip_change_commits:
                return []  # the whole commit is invisible
            if not self.ignore_deletes:
                raise ValueError(
                    f"Delta version {v} of {self.path} removes "
                    "files; an append stream cannot express it — "
                    "restart from a fresh checkpoint (full refresh), "
                    "set option('ignore_deletes', 'true'), or skip "
                    "such commits with "
                    "option('skip_change_commits', 'true')"
                )
        return adds

    def _mk_part(self, a: dict, sj: str, pcols: list, phys_j: str,
                 **kw) -> DeltaFilePartition:
        return DeltaFilePartition(
            file=os.path.join(self.path, dl.unquote(a["path"])),
            schema_json=sj,
            pvals=dict(a.get("partitionValues") or {}),
            pcols=pcols,
            phys_json=phys_j,
            dv_json=(json.dumps(a["deletionVector"])
                     if a.get("deletionVector") else ""),
            table_path=os.path.abspath(self.path),
            **kw,
        )

    def partitions(self, start: dict, end: dict):
        e = end["version"]
        adds, meta, _p, _v = dl._replay(self.path, e)
        pcols = list(meta.get("partitionColumns") or [])
        _cm, phys, _fids = dl._column_mapping(meta)
        phys_j = json.dumps(phys)
        sj = meta["schemaString"]
        parts: list[DeltaFilePartition] = []
        if self.read_change_feed:
            if start.get("snapshot"):
                parts = [
                    self._mk_part(a, sj, pcols, phys_j,
                                  change_type="insert",
                                  commit_version=e)
                    for a in adds
                ]
            else:
                for v in range(start["version"] + 1, e + 1):
                    cdc, vadds, removes = self._version_actions(v)
                    if cdc:
                        # authoritative row-level record; the commit's
                        # add/remove actions are ignored for CDF
                        parts.extend(
                            self._mk_part(c, sj, pcols, phys_j,
                                          commit_version=v,
                                          cdc_file=True)
                            for c in cdc
                        )
                        continue
                    changing = [a for a in vadds
                                if a.get("dataChange", True)]
                    removing = [r for r in removes
                                if r.get("dataChange", True)]
                    if not changing and not removing:
                        continue  # OPTIMIZE-style no-op commit
                    if removing or any(
                        a.get("deletionVector") for a in changing
                    ):
                        if self.skip_change_commits:
                            continue  # whole commit is invisible
                        raise ValueError(
                            f"Delta version {v} of {self.path} "
                            "rewrites/deletes rows without cdc "
                            "actions — its row-level changes are not "
                            "recoverable (enable CDF on the writer)"
                        )
                    parts.extend(
                        self._mk_part(a, sj, pcols, phys_j,
                                      change_type="insert",
                                      commit_version=v)
                        for a in changing
                    )
        else:
            if not start.get("snapshot"):
                ranged: list[dict] = []
                for v in range(start["version"] + 1, e + 1):
                    ranged.extend(self._version_adds(v))
                adds = ranged
            parts = [
                self._mk_part(a, sj, pcols, phys_j) for a in adds
            ]
        # Spark requires >= 1 partition per batch: an empty range
        # (pure-remove version under skip/ignore flags) emits a
        # zero-row marker partition
        return parts or [
            DeltaFilePartition(file="", schema_json=sj, pcols=pcols)
        ]

    def read(self, partition: DeltaFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_type
        from pyspark.sql.types import StructType as _ST

        declared = _ST.fromJson(json.loads(partition.schema_json))
        want_cdf = self.read_change_feed
        if not partition.file:
            cols = {
                f.name: pa.array([], to_arrow_type(f.dataType))
                for f in declared.fields
            }
            if want_cdf:
                cols["_change_type"] = pa.array([], pa.string())
                cols["_commit_version"] = pa.array([], pa.int64())
            yield from pa.table(cols).to_batches()
            return
        phys = json.loads(partition.phys_json or "{}")
        tbl = pq.read_table(partition.file)
        if partition.dv_json:
            from harmony_energy_data_pipeline_spark.sources import (
                deltadv as _dv,
            )

            dead = set(_dv.read_dv(
                partition.table_path, json.loads(partition.dv_json)
            ))
            if dead:
                mask = pa.array(
                    [i not in dead for i in range(len(tbl))],
                    pa.bool_(),
                )
                tbl = tbl.filter(mask)
        names = set(tbl.schema.names)
        arrays = []
        out_names = []
        for f in declared.fields:
            pname = phys.get(f.name, f.name)
            target = to_arrow_type(f.dataType)
            if f.name in partition.pcols:
                raw = partition.pvals.get(pname,
                                          partition.pvals.get(f.name))
                arrays.append(
                    pa.nulls(len(tbl), type=target) if raw is None
                    else pa.array([raw] * len(tbl), pa.string())
                    .cast(target)
                )
            elif pname in names:
                col = tbl.column(pname)
                arrays.append(
                    col if col.type == target else col.cast(target)
                )
            elif f.name in names:
                col = tbl.column(f.name)
                arrays.append(
                    col if col.type == target else col.cast(target)
                )
            else:
                arrays.append(pa.nulls(len(tbl), type=target))
            out_names.append(f.name)
        if want_cdf:
            if partition.cdc_file and "_change_type" in names:
                arrays.append(tbl.column("_change_type"))
            else:
                arrays.append(pa.array(
                    [partition.change_type or "insert"] * len(tbl),
                    pa.string(),
                ))
            out_names.append("_change_type")
            arrays.append(pa.array(
                [partition.commit_version] * len(tbl), pa.int64()
            ))
            out_names.append("_commit_version")
        yield from pa.table(dict(zip(out_names, arrays))).to_batches()

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
        base = StructType.fromJson(json.loads(meta["schemaString"]))
        if str(self.options.get("read_change_feed", "false")
               ).lower() == "true":
            return StructType(
                list(base.fields)
                + [StructField("_change_type", StringType()),
                   StructField("_commit_version", LongType())]
            )
        return base

    def streamReader(self, schema: StructType) -> DeltaStreamReader:
        return DeltaStreamReader(
            self.options["path"], schema, dict(self.options)
        )


__all__ = ["DeltaTableDataSource", "DeltaStreamReader"]
