"""Round 10: vacuum's inventory path — orphan discovery without the
recursive walk (the object-store shape). Parity with the walking
sweep, one-sided safety under stale inventories."""

import os
import tempfile
import time

from harmony_energy_data_pipeline_spark.sinks import snapshots as snap


def _tmp():
    return os.path.join(tempfile.mkdtemp(), "t")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v"
    )


def _capture_inventory(path):
    inv = []
    for dp, _dirs, files in os.walk(os.path.join(path, "data")):
        for f in files:
            full = os.path.join(dp, f)
            inv.append((os.path.relpath(full, path),
                        os.path.getmtime(full)))
    return inv


def _seed_with_orphans(spark):
    t = _tmp()
    snap.snapshot_write(_df(spark, 0, 40), t)      # v0
    snap.snapshot_write(_df(spark, 0, 10), t)      # v1 overwrite
    snap.snapshot_write(_df(spark, 0, 12), t)      # v2 overwrite
    # a crashed writer's stage: never referenced
    orphan_dir = os.path.join(t, "data", "orphantx")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-000.parquet")
    with open(orphan, "wb"):
        pass
    old = time.time() - 10_000
    os.utime(orphan, (old, old))
    return t, orphan


def test_inventory_parity_with_walk(spark):
    t, orphan = _seed_with_orphans(spark)
    inv = _capture_inventory(t)
    walk_would = snap.vacuum(t, keep_last=1, orphan_grace_s=3600,
                             dry_run=True)
    inv_would = snap.vacuum(t, keep_last=1, orphan_grace_s=3600,
                            dry_run=True, inventory=inv)
    assert inv_would == walk_would > 0
    removed = snap.vacuum(t, keep_last=1, orphan_grace_s=3600,
                          inventory=inv)
    assert removed == walk_would
    assert not os.path.exists(orphan)
    assert snap.read_snapshot(spark, t).count() == 12


def test_inventory_mtimes_avoid_stat(spark):
    """Grace decisions come from inventory mtimes: a young-by-
    inventory orphan survives even though its disk mtime is old."""
    t, orphan = _seed_with_orphans(spark)
    inv = [
        (rel, time.time() if rel.startswith("data/orphantx") else mt)
        for rel, mt in _capture_inventory(t)
    ]
    snap.vacuum(t, keep_last=1, orphan_grace_s=3600, inventory=inv)
    assert os.path.exists(orphan)  # inventory said young → protected


def test_stale_inventory_rows_are_safe(spark):
    t, orphan = _seed_with_orphans(spark)
    inv = _capture_inventory(t)
    # a row whose file is already gone must not error
    inv.append(("data/ghost/part-zzz.parquet", 0.0))
    # a file created AFTER capture is absent from the inventory: the
    # sweep never touches it however the classification would go
    late_dir = os.path.join(t, "data", "latetx")
    os.makedirs(late_dir)
    late = os.path.join(late_dir, "part-001.parquet")
    with open(late, "wb"):
        pass
    old = time.time() - 99_999
    os.utime(late, (old, old))
    snap.vacuum(t, keep_last=1, orphan_grace_s=3600, inventory=inv)
    assert os.path.exists(late)
    assert not os.path.exists(orphan)
    assert snap.read_snapshot(spark, t).count() == 12


def test_inventory_ignores_foreign_rows(spark):
    """A bucket-wide inventory carries other tables' rows — only
    rows under THIS table's data/ root participate."""
    t, orphan = _seed_with_orphans(spark)
    inv = _capture_inventory(t)
    inv += [("/some/other/table/data/tx/part-0.parquet", 0.0),
            (os.path.join(t, "_snapshots", "v0.json"), 0.0)]
    removed = snap.vacuum(t, keep_last=1, orphan_grace_s=3600,
                          inventory=inv)
    assert removed > 0 and not os.path.exists(orphan)


def test_inventory_parquet_form(spark):
    import pyarrow as pa
    import pyarrow.parquet as pq

    t, orphan = _seed_with_orphans(spark)
    inv = _capture_inventory(t)
    inv_file = os.path.join(tempfile.mkdtemp(), "inventory.parquet")
    pq.write_table(
        pa.table({"path": [r for r, _ in inv],
                  "mtime": [m for _, m in inv]}),
        inv_file,
    )
    walk_would = snap.vacuum(t, keep_last=1, orphan_grace_s=3600,
                             dry_run=True)
    assert snap.vacuum(t, keep_last=1, orphan_grace_s=3600,
                       dry_run=True, inventory=inv_file) == walk_would
