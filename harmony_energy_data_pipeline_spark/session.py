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
    # Local default, overridable for deployment sizing. Round-5
    # finding (SCALING.md): the rule is VOLUME-based — size partitions
    # so each shuffle-sort partition stays spill-free (~<=2M rows /
    # ~200 MB). At sf0.1, 32+AQE wins (fixed per-task overhead); at
    # the 300x fixture the same 32 puts 5.6M rows in every SMJ sort
    # and q21 goes spill-bound (44-63s vs 17-22s at 112-256
    # partitions, both topologies). Real clusters set this to track
    # data volume and total cores via the env knob.
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
    spark = builder.getOrCreate()
    # getOrCreate may return a pre-existing session whose conf differs;
    # re-assert the semantic knobs that are runtime-settable.
    for k in ("spark.sql.ansi.enabled", "spark.sql.session.timeZone",
              "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions",
              "spark.sql.python.filterPushdown.enabled"):
        spark.conf.set(k, ENGINE_CONF[k])
    return spark
