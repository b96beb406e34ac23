"""Wire-format schema evolution: ADD COLUMN as each format's own
metadata-only commit, and MERGE WITH SCHEMA EVOLUTION composing with
the wire-format MOR merge.

* Delta: new fields append to schemaString (existing files read them
  as NULL); on a column-mapped table each new field takes the next
  ``delta.columnMapping.maxColumnId`` and a fresh physical name.
* Iceberg: a NEW schema appends under the next schema-id with field
  ids allocated past ``last-column-id`` (never reused); prior schemas
  stay listed.
* MERGE WITH SCHEMA EVOLUTION on a wire table adds the source's new
  columns first, then merges — the widening-CDC-source flow without
  adoption.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import Row

from harmony_energy_data_pipeline_spark.sources import deltalake as dl
from harmony_energy_data_pipeline_spark.sources import iceberg as ice
from harmony_energy_data_pipeline_spark.sql import snapshot_sql


def _tmp(prefix="we_"):
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


def _df(spark):
    return spark.createDataFrame(
        [Row(k=i, val=float(i)) for i in range(5)]
    )


def test_delta_add_columns_null_backfill(spark):
    t = _tmp("dac_")
    dl.write_delta(_df(spark), t)
    v = dl.delta_add_columns(t, {"note": "string", "score": "double"})
    out = dl.read_delta(spark, t)
    assert set(out.columns) == {"k", "val", "note", "score"}
    assert out.filter("note IS NULL AND score IS NULL").count() == 5
    # duplicate refusal
    try:
        dl.delta_add_columns(t, {"note": "string"})
        raise AssertionError("expected duplicate-column refusal")
    except ValueError:
        pass
    # the commit is metadata-only
    acts = [json.loads(line) for line in open(dl._log_path(t, v))]
    assert not any("add" in a or "remove" in a for a in acts)


def test_delta_add_columns_column_mapped_ids(spark):
    t = _tmp("dacm_")
    dl.write_delta(_df(spark), t)
    # flip on name-mode column mapping the foreign way
    _a, meta, _p, v0 = dl._replay(t, None)
    meta = dict(meta)
    schema = json.loads(meta["schemaString"])
    for i, f in enumerate(schema["fields"], start=1):
        f["metadata"] = {
            "delta.columnMapping.id": i,
            "delta.columnMapping.physicalName": f["name"],
        }
    meta["schemaString"] = json.dumps(schema)
    conf = dict(meta.get("configuration") or {})
    conf["delta.columnMapping.mode"] = "name"
    conf["delta.columnMapping.maxColumnId"] = "2"
    meta["configuration"] = conf
    with open(dl._log_path(t, v0 + 1), "w") as fh:
        fh.write(json.dumps({"metaData": meta}) + "\n")
    dl.delta_add_columns(t, {"note": "string"})
    _a2, meta2, _p2, _v2 = dl._replay(t, None)
    schema2 = json.loads(meta2["schemaString"])
    new = next(f for f in schema2["fields"] if f["name"] == "note")
    assert new["metadata"]["delta.columnMapping.id"] == 3
    assert new["metadata"]["delta.columnMapping.physicalName"] \
        .startswith("col-")
    assert meta2["configuration"][
        "delta.columnMapping.maxColumnId"] == "3"
    # the mapped table reads and takes DML on the new column
    out = dl.read_delta(spark, t)
    assert out.filter("note IS NULL").count() == 5
    v, n = dl.delta_update_where(spark, t, "k = 2", {"note": "'x'"})
    assert n == 1
    got = {r.k: r.note for r in dl.read_delta(spark, t).collect()}
    assert got[2] == "x" and got[1] is None


def test_iceberg_add_columns_ids_and_history(spark):
    t = _tmp("iac_")
    ice.write_iceberg(_df(spark), t, mode="overwrite")
    meta0 = ice.table_metadata(t)
    last0 = meta0["last-column-id"]
    sid0 = meta0.get("current-schema-id", 0)
    new_sid = ice.iceberg_add_columns(t, {"note": "string"})
    meta = ice.table_metadata(t)
    assert meta["current-schema-id"] == new_sid != sid0
    cur = next(s for s in meta["schemas"]
               if s["schema-id"] == new_sid)
    new = next(f for f in cur["fields"] if f["name"] == "note")
    assert new["id"] == last0 + 1
    assert meta["last-column-id"] == last0 + 1
    assert not new["required"]
    # prior schema stays listed under its id
    assert any(s["schema-id"] == sid0 for s in meta["schemas"])
    out = ice.read_iceberg(spark, t)
    assert "note" in out.columns
    assert out.filter("note IS NULL").count() == 5


def test_wire_merge_with_schema_evolution(spark):
    for fmt, writer, reader, merge in (
        ("delta", dl.write_delta, dl.read_delta, dl.delta_merge_when),
        ("iceberg",
         lambda df, p: ice.write_iceberg(df, p, mode="overwrite"),
         ice.read_iceberg, ice.iceberg_merge_when),
    ):
        t = _tmp(f"ev_{fmt}_")
        writer(_df(spark), t)
        src = spark.createDataFrame([
            Row(k=2, val=20.0, score=0.9),
            Row(k=77, val=77.0, score=0.1),
        ])
        _v, n = merge(
            spark, t, src, key="k",
            matched=[{"condition": None, "action": "update",
                      "set": None}],
            not_matched=[{"condition": None, "values": None}],
            evolve_schema=True,
        )
        assert n == 2, fmt
        rows = {r.k: (r.val, r.score)
                for r in reader(spark, t).collect()}
        assert rows[2] == (20.0, 0.9), (fmt, rows[2])
        assert rows[77] == (77.0, 0.1), (fmt, rows[77])
        assert rows[1] == (1.0, None), (fmt, rows[1])
        assert len(rows) == 6, fmt


def test_sql_alter_add_column_wire(spark):
    for fmt, writer, reader in (
        ("delta", dl.write_delta, dl.read_delta),
        ("iceberg",
         lambda df, p: ice.write_iceberg(df, p, mode="overwrite"),
         ice.read_iceberg),
    ):
        t = _tmp(f"sqlac_{fmt}_")
        writer(_df(spark), t)
        snapshot_sql(spark, "ALTER TABLE hot ADD COLUMN note STRING",
                     tables={"hot": t})
        out = reader(spark, t)
        assert "note" in out.columns, fmt
        assert out.filter("note IS NULL").count() == 5, fmt
        # DROP COLUMN routes to the wire formats too (round 12:
        # metadata-only — Delta via column mapping, Iceberg over
        # the immutable field id)
        snapshot_sql(spark, "ALTER TABLE hot DROP COLUMN note",
                     tables={"hot": t})
        assert "note" not in reader(spark, t).columns, fmt
