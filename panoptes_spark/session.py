"""SparkSession factory tuned for this engine.

Local test runs use ``local[N]``; the same configuration scales to a real
cluster because nothing here is local-only: AQE, shuffle-partition sizing and
Arrow transfer apply identically on 1000 executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "panoptes_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults chosen for 100 TB-scale behavior:
    - AQE on (runtime coalesce, skew-join splitting)
    - UTC session timezone (oracle comparability; cluster-safe)
    - Arrow on (pandas UDF fast path)
    - shuffle partitions ~ cores locally; on a real cluster AQE coalesces
      from a higher initial number, so this knob is safe to raise.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune_runtime(spark)


def tune_runtime(spark: SparkSession) -> SparkSession:
    """Python-side tuning for sessions built elsewhere (the driver's).

    Disables PySpark's per-API-call user-call-site capture
    (``spark.python.sql.dataFrameDebugging.enabled``): plan construction in
    the DSL compiler issues thousands of DataFrame calls and the stack
    inspection costs ~5 ms each — error-message context only, no semantic
    effect. The conf is STATIC (rejected by ``spark.conf.set`` on a live
    session), so for sessions built elsewhere the python-side gate cache is
    the only reachable switch; guarded so a pyspark-internals change
    degrades to a no-op. ``get_spark`` also sets the conf properly at
    build time for sessions we own.
    """
    try:
        from pyspark.errors import utils as _eu

        _eu._enable_debugging_cache = False
    except Exception:
        pass
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver test tables from ``sf_dir`` and register temp views.

    Returns a dict name -> DataFrame.
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    out = {}
    for n in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{n}.parquet"))
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
