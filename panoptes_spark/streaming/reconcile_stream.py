"""Streaming resource reconciliation (§3.3 resource-manager pipeline).

The reference's resource manager is a Kafka consumer whose callback runs
the set-reconciliation merge per (plugin, site) batch
(``resources/manager.py:165-187`` -> ``handle_resources`` :46-142). In
Spark this is ``foreachBatch`` over the validated resource stream: each
micro-batch is one "incoming set" per (plugin, site), merged into the
store table with the same timestamp guards (operators/reconcile.py).

The store here is a parquet path rewritten per batch (works anywhere);
swap ``_load``/``_save`` for a Delta MERGE on a real deployment — the
reconciliation plan is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.reconcile import apply_reconciliation
from ..schemas import RESOURCE_IDENTITY_COLS


class ResourceStoreWriter:
    """foreachBatch callback maintaining the reconciled resource store."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        identity_cols: list[str] | None = None,
        ts_col: str = "resource_creation_timestamp",
        set_ts_col: str = "resource_set_creation_timestamp",
    ):
        self.spark = spark
        self.store_path = store_path
        self.identity = identity_cols or RESOURCE_IDENTITY_COLS
        self.ts_col = ts_col
        self.set_ts_col = set_ts_col

    def _load(self, like: DataFrame) -> DataFrame:
        try:
            return self.spark.read.parquet(self.store_path)
        except Exception:
            return self.spark.createDataFrame([], like.schema)

    def __call__(self, batch: DataFrame, epoch_id: int):
        # one driver action per micro-batch: emptiness + both candidate
        # set-timestamps come back in a single scalar agg row
        has_set_ts = self.set_ts_col in batch.columns
        stats = batch.agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.max(self.set_ts_col) if has_set_ts else F.lit(None)
            ).alias("set_ts"),
            F.max(self.ts_col).alias("row_ts"),
        ).collect()[0]
        if stats["n"] == 0:
            return
        incoming = batch.drop(self.set_ts_col) if has_set_ts else batch
        set_ts = stats["set_ts"]
        if set_ts is None:
            set_ts = stats["row_ts"] or 0.0
        current = self._load(incoming)
        merged = apply_reconciliation(
            current, incoming, float(set_ts), self.identity, self.ts_col
        )
        # write-then-swap: localized to the store path; Delta MERGE replaces
        # this whole dance in production
        tmp = self.store_path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.store_path)


def reconcile_stream(
    resources_stream: DataFrame,
    spark: SparkSession,
    store_path: str,
    checkpoint: str,
    **writer_kwargs,
):
    """Attach the reconciling writer to a validated resource stream."""
    writer = ResourceStoreWriter(spark, store_path, **writer_kwargs)
    return (
        resources_stream.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
