"""SparkSession factory with the engine's semantic defaults.

Reference semantics require lenient coercion (malformed timestamps /
non-numeric strings become NULL, not errors — see
/root/reference/src/transform/transform.py:128,134), which maps to
``spark.sql.ansi.enabled=false`` (Spark 4 flipped the default to
true). Run timestamps are UTC (/root/reference/src/serve/run_history.py:21).
AQE stays on so skewed shuffles re-plan at runtime — essential at the
100 TB design point, harmless locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Engine-wide session defaults. Every knob here is chosen for the
# 100 TB design point but is safe at local scale:
#  - ANSI off: null-on-error casts (reference parity, see module doc)
#  - UTC session TZ: naive timestamps are interpreted consistently
#  - AQE + skew join: runtime re-planning for skewed keys
#  - Arrow: vectorized pandas_udf / toPandas transfer
ENGINE_CONF: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python DataSource filter pushdown (sources/pyds.py absorbs the
    # keyset cursor predicate to skip whole pages).
    "spark.sql.python.filterPushdown.enabled": "true",
    # The driver testdata parquet carries TIMESTAMP(NANOS) (written by
    # an Arrow-native writer); Spark has no nanos timestamp, so read
    # them as long and convert in io.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # No-zone parquet timestamps read as TIMESTAMP (not NTZ): the
    # session TZ is UTC so values are identical, and streaming
    # watermarks require TimestampType.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Write timestamps as INT64 micros, not the deprecated INT96:
    # INT96 columns carry NO parquet min/max statistics, which blinds
    # the snapshot log's zone-map file pruning (sinks/filestats.py)
    # and every other footer-stats consumer.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Fallback for non-AQE paths (e.g. streaming stateful ops, where
    # partition count is pinned by the state store layout) and the
    # parallelism floor AQE coalesces toward; env-overridable. The
    # AQE initialPartitionNum is sized from input VOLUME in
    # get_spark() — see auto_initial_partitions().
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # Quiet progress bars in test/bench output.
    "spark.ui.showConsoleProgress": "false",
    # max/min/count version probes (serve.VersionedCache) resolve from
    # parquet row-group statistics instead of scanning the column.
    "spark.sql.parquet.aggregatePushdown": "true",
    # Reliable-checkpoint files from iterative operators (PageRank,
    # connected components, K-means) are deleted once their DataFrame
    # is GC'd — without this, long-lived sessions accumulate
    # checkpoint data in the checkpoint dir unboundedly.
    "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
}


#: Parquet-bytes → shuffled-row-bytes growth factor for the initial
#: partition estimate: columnar compression undoes to roughly 3-5x in
#: row form, and a join can carry both sides. Deliberately coarse —
#: AQE coalescing absorbs overestimates; only the ORDER of magnitude
#: must be right so the map side does not start 30x too narrow.
_SHUFFLE_EXPLODE = 4

#: Spill-free sort-partition target (round-5 rule: ≲200 MB per sort;
#: 64 MB leaves headroom for AQE's advisory-size coalescing, which
#: also defaults to 64 MB).
_TARGET_PARTITION_BYTES = 64 << 20


def _dir_bytes(path: str) -> int:
    total = 0
    for dp, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dp, f))
            except OSError:
                pass
    return total


def auto_initial_partitions(
    data_dir: str | None = None, floor: int = 32, cap: int = 4096
) -> int:
    """VOLUME-derived AQE ``initialPartitionNum`` (round 6, closing
    round 5's top action item): round 5 proved a fixed partition dial
    spill-collapses exactly one decade after it is tuned (q21 at the
    300x fixture: 44-63 s at 32 partitions = 5.6M rows per SMJ sort,
    vs 17-22 s at 112-256), while starting every shuffle maximally
    wide costs real map-side bucket overhead at small scale (a flat
    1024 regressed the sf0.1 headline 27.8 -> 39.4 s, the iterative
    PageRank 6x). So the initial count TRACKS INPUT VOLUME:
    ``bytes(data_dir) * explode / 64 MB``, clamped to [floor, cap] —
    sf0.1 (17.5 MB parquet) lands on the floor (today's tuned 32) and
    the 300x fixture (4.9 GB) lands at ~300, inside the measured
    112-256-plus sweet band; AQE's coalescing then trims per-query, so
    a small query on a big corpus still runs at core-count
    partitions. ``$SPARK_GRAFT_INITIAL_PARTITIONS`` overrides (real
    clusters size this from planned shuffle volume / executor count);
    no ``data_dir`` (library embedders that never touch the fixture
    layout) keeps the floor and relies on the env knob.
    """
    env = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    if env:
        return int(env)
    if data_dir and os.path.isdir(data_dir):
        est = _dir_bytes(data_dir) * _SHUFFLE_EXPLODE // _TARGET_PARTITION_BYTES
        return max(floor, min(cap, int(est)))
    return floor


def get_spark(app_name: str = "harmony-energy-spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    ``master`` defaults to ``$SPARK_GRAFT_MASTER`` if set, else
    ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the caller passes
    the cluster master / lets spark-submit decide by passing
    ``master=""``. ``SPARK_GRAFT_MASTER=local-cluster[4,7,16384]``
    runs the multi-JVM rehearsal topology (4 separate worker
    processes, 7 cores / 16 GiB each) used by the SCALING.md
    horizontal-scaling evidence; executor heaps there come from
    ``$SPARK_GRAFT_EXECUTOR_MEM`` (default 14g, under the worker
    grant).
    """
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", "")
        if not master:
            cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
            master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    if master.startswith("local-cluster"):
        # separate executor JVMs: size their heaps explicitly (the
        # bracket's MiB figure is the WORKER grant; executors default
        # to 1g without this)
        builder = builder.config(
            "spark.executor.memory",
            os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "14g"),
        )
        # Executor PYTHON workers start in the worker's scratch dir,
        # so driver-side sys.path entries don't exist for them — any
        # pickled object referencing this package (a Python DataSource
        # partition, a pandas UDF closure over package helpers) then
        # dies with ModuleNotFoundError. Point them at the package's
        # own parent directory; a real cluster ships a wheel via
        # spark.submit.pyFiles instead (shared-FS assumption holds for
        # the local-cluster rehearsal topology).
        pkg_root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        extra = os.environ.get("PYTHONPATH", "")
        builder = builder.config(
            "spark.executorEnv.PYTHONPATH",
            f"{pkg_root}:{extra}" if extra else pkg_root,
        )
    if master.startswith("local"):
        # In local mode the driver JVM is also the executor; Spark's 1g
        # default heap starves 32 concurrent tasks (the 100x scale
        # fixture showed GCLocker retry pressure at 12g, hence 24g).
        # No effect when a JVM already exists (driver-harness sessions)
        # or on a real cluster (spark-submit sizes executors there).
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g")
        )
        # JVM unified-logging warnings (e.g. [warning][gc,alloc]
        # GCLocker retries under memory pressure) default to STDOUT and
        # would interleave with programs whose stdout is a machine-read
        # protocol (bench.py's one-line JSON contract); route them to
        # stderr.
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            "-Xlog:all=warning:stderr:uptime,level,tags",
        )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    # Volume-based shuffle sizing: the fixture dir (when the caller
    # works against one) gives the input-bytes estimate.
    initial = auto_initial_partitions(os.environ.get("SPARK_GRAFT_SF_DIR"))
    builder = builder.config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        str(initial),
    )
    spark = builder.getOrCreate()
    # getOrCreate may return a pre-existing session whose conf differs;
    # re-assert the semantic knobs that are runtime-settable.
    for k in ("spark.sql.ansi.enabled", "spark.sql.session.timeZone",
              "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions",
              "spark.sql.python.filterPushdown.enabled",
              "spark.sql.parquet.outputTimestampType"):
        spark.conf.set(k, ENGINE_CONF[k])
    spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        str(initial),
    )
    return spark
