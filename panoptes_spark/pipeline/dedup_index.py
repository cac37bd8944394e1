"""Persisted near-dup artifact: build the MinHash pair set ONCE, share it.

The minhash chain (shingle → signature → banded LSH join → Jaccard
verify) is the single most expensive stage in the dedup family, and SIX
independent consumers need its output: the pair relation itself
(`dedup_minhash_pairs`), representative selection
(`dedup_representatives`), connected components (`dedup_components`),
leakage-safe split assignment (`leakage_safe_splits`), the post-split
leakage audit (`split_leakage`), and the cross-source duplication matrix
(`source_overlap`). Re-running the chain per consumer multiplies its
cost by the consumer count — the r7 bench measured exactly that (+106%
on `dedup_components` at sf0.1 from stacked re-materialization alone).

This module is the ``pipeline/ann_index.py`` build-once pattern applied
to dedup: one build materializes the verified pair set AND its
connected-component labels as parquet; every consumer is then a scan.

Layout under ``path``::

    MANIFEST.json        build params + row counts (integrity check)
    pairs.parquet        (a bigint, b bigint, jaccard double)  a < b
    components.parquet   (node bigint, component bigint)  — min-id label
                         per near-dup cluster, every corpus doc present

Build cost: ONE signature materialization (persisted, eagerly filled,
released after the writes), the banded candidate join, the verify join,
and the capped min-label propagation — the exact work any single
consumer already paid, paid once. At 100 TB the artifact is pair-sized
plus one (node, component) row per document: both tiny next to the
corpus, and both plain parquet any engine can read back.

Correctness: pair/component contents are partition-layout-independent
(gate-verified every round), so a parquet round-trip is value-exact;
``tests/test_pipeline.py::test_dedup_index_roundtrip`` asserts artifact
≡ inline chain on both relations.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup
from .components import connected_components

__all__ = ["build_dedup_index", "DedupIndex"]


def build_dedup_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
    max_bucket_size: int | None = dedup.DEFAULT_MAX_BUCKET_SIZE,
    max_iter: int = 10,
) -> "DedupIndex":
    """Materialize the verified pair set and component labels at ``path``.

    The signature frame is persisted once and feeds both the candidate
    join and the verify join; it is released before returning (the
    artifact replaces it). Components are computed over the universe of
    ``docs`` (isolated docs label themselves), matching
    ``connected_components(pairs, nodes=docs)``.
    """
    spark = docs.sparkSession
    os.makedirs(path, exist_ok=True)
    sig = dedup.materialize_once(
        dedup.minhash_signature(docs, text_col, k_shingle, num_hashes)
    )
    try:
        cand = dedup.lsh_candidates(
            sig, id_col, num_hashes, bands, max_bucket_size
        )
        pairs = dedup.jaccard_verify(cand, sig, id_col, threshold)
        pairs_path = os.path.join(path, "pairs.parquet")
        pairs.write.mode("overwrite").parquet(pairs_path)
    finally:
        sig.unpersist()

    pairs_back = spark.read.parquet(pairs_path)
    comps = connected_components(
        pairs_back, nodes=docs.select(id_col), max_iter=max_iter
    )
    comps.write.mode("overwrite").parquet(
        os.path.join(path, "components.parquet")
    )

    n_pairs = spark.read.parquet(pairs_path).count()
    n_nodes = spark.read.parquet(
        os.path.join(path, "components.parquet")
    ).count()
    manifest = {
        "format_version": 1,
        "id_col": id_col,
        "text_col": text_col,
        "k_shingle": int(k_shingle),
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "threshold": float(threshold),
        "max_bucket_size": max_bucket_size,
        "max_iter": int(max_iter),
        "n_pairs": int(n_pairs),
        "n_nodes": int(n_nodes),
    }
    # write-then-replace: a crashed build leaves no MANIFEST, so readers
    # (and the gate cache) treat the directory as absent and rebuild
    tmp = os.path.join(path, "MANIFEST.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, os.path.join(path, "MANIFEST.json"))
    return DedupIndex(spark, path)


class DedupIndex:
    """Handle over a built dedup artifact directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "MANIFEST.json")) as f:
            self.meta = json.load(f)

    @staticmethod
    def is_built(path: str) -> bool:
        return os.path.exists(os.path.join(path, "MANIFEST.json"))

    def pairs(self) -> DataFrame:
        """(a, b, jaccard) verified near-dup pairs, a < b."""
        return self.spark.read.parquet(os.path.join(self.path, "pairs.parquet"))

    def components(self) -> DataFrame:
        """(node, component) min-id cluster label per corpus doc."""
        return self.spark.read.parquet(
            os.path.join(self.path, "components.parquet")
        )

    def keep_representatives(self, docs: DataFrame) -> DataFrame:
        """Survivors after dropping the larger id of every pair — the
        artifact-backed twin of ``dedup.dedup_keep_representatives``."""
        id_col = self.meta["id_col"]
        losers = self.pairs().select(F.col("b").alias(id_col)).distinct()
        return docs.join(losers, id_col, "left_anti")
