"""Linked-export-at-metadata-scale measurement (round 10): at N live
files, time the ZERO-COPY hand-offs — ``snapshot_export_delta(
link_files=True)`` and ``snapshot_export_iceberg(link_files=True)`` —
against the file count. The claim under test: export cost is
O(metadata + hardlinks) with a small per-file constant (one link + one
add action / manifest entry), independent of the BYTES in the files —
the property that makes "hand a 100 TB table to a Delta/Iceberg
reader" a metadata operation.

No Spark session needed for the export itself (it is driver-only
manifest + link work); the synthetic tree reuses the vacuum
measurement's shape: real (tiny) parquet files so links, footers and
stats are the genuine article.

Usage:
    python tools/measure_export_scale.py [n_files ...]
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FILES_PER_DIR = 512


def build(path: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from harmony_energy_data_pipeline_spark.sinks import snapshots as snap

    os.makedirs(snap._snap_dir(path), exist_ok=True)
    # one real (tiny) parquet per DIRECTORY reused via hardlink (ext4
    # caps links/inode around 65k; 512/dir stays far under): footers
    # and row counts are genuine, disk cost stays bounded
    seed_bytes = None
    rels = []
    seeds: dict[str, str] = {}
    for i in range(n):
        d = f"data/tx{i // FILES_PER_DIR:05d}"
        rel = f"{d}/part-{i % FILES_PER_DIR:05d}.parquet"
        full = os.path.join(path, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        if d not in seeds:
            if seed_bytes is None:
                import io as _io
                buf = _io.BytesIO()
                pq.write_table(
                    pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                              "v": pa.array([1.0, 2.0, 3.0],
                                            pa.float64())}),
                    buf,
                )
                seed_bytes = buf.getvalue()
            with open(full, "wb") as fh:
                fh.write(seed_bytes)
            seeds[d] = full
        else:
            os.link(seeds[d], full)
        rels.append(rel)
    snap._publish_manifest(path, 0, {
        "version": 0, "parent": None, "operation": "overwrite",
        "txid": "seed", "committed_at_unix": 0,
        "files": rels, "n_live_files": len(rels),
        "schema": {"type": "struct", "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "double", "nullable": True,
             "metadata": {}},
        ]},
        "stats": {r: {"k": [1, 3], "#rows": 3} for r in rels},
    })


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [10_000, 100_000]
    from harmony_energy_data_pipeline_spark.sources import deltalake as dl
    from harmony_energy_data_pipeline_spark.sources import iceberg as ice

    out = []
    for n in sizes:
        tmp = tempfile.mkdtemp(prefix="export_scale_")
        nat = os.path.join(tmp, "nat")
        try:
            t0 = time.perf_counter()
            build(nat, n)
            built = time.perf_counter() - t0
            d = os.path.join(tmp, "delta")
            t0 = time.perf_counter()
            dl.snapshot_export_delta(None, nat, d, link_files=True)
            delta_s = time.perf_counter() - t0
            adds, _m, _p, _v = dl._replay(d, None)
            assert len(adds) == n
            i = os.path.join(tmp, "ice")
            t0 = time.perf_counter()
            ice.snapshot_export_iceberg(None, nat, i, link_files=True)
            ice_s = time.perf_counter() - t0
            data, _dels = ice.live_files(i)
            assert len(data) == n
            row = {"n_files": n, "build_s": round(built, 2),
                   "delta_linked_export_s": round(delta_s, 2),
                   "iceberg_linked_export_s": round(ice_s, 2),
                   "delta_us_per_file": round(delta_s / n * 1e6, 1),
                   "iceberg_us_per_file": round(ice_s / n * 1e6, 1)}
            print(json.dumps(row), flush=True)
            out.append(row)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"series": out}))


if __name__ == "__main__":
    main()
