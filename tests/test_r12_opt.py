"""Focused tests for the round-12 optimization changes: the byte-bounded
two-step ivf_topk probe must route to the identical plans (broadcast when
the set fits, cogroup when it doesn't) with bounded driver collects, and
source_is_wide must not run jobs on shuffle-bearing inputs."""

import pytest
from pyspark.sql import functions as F

from panoptes_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark(app_name="r12-opt-tests")


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_ivf_topk_chunked_probe_matches_default(spark, sf_dir, monkeypatch):
    """Forcing the probe chunk below the query-set size exercises the
    two-step collect (chunk overflow -> byte-capped re-collect) and must
    land on the broadcast plan with identical results."""
    from panoptes_spark.pipeline import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, n_cells=16)
    q = emb.where(F.col("vec_id") % 10 == 0)
    base = sorted(
        map(tuple, similarity.ivf_topk(emb, q, cents, k=5, nprobe=2).collect())
    )
    assert len(base) > 0
    monkeypatch.setattr(similarity, "PROBE_CHUNK_ROWS", 3)
    chunked = sorted(
        map(tuple, similarity.ivf_topk(emb, q, cents, k=5, nprobe=2).collect())
    )
    assert chunked == base


def test_ivf_topk_byte_budget_forces_cogroup(spark, sf_dir, monkeypatch):
    """A zero byte budget must route past-chunk probe sets to the
    distributed cogroup plan (no second full-width collect) and still
    return the identical ranking."""
    from panoptes_spark.pipeline import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.seed_centroids(emb, n_cells=16)
    q = emb.where(F.col("vec_id") % 10 == 0)
    base = sorted(
        map(tuple, similarity.ivf_topk(emb, q, cents, k=5, nprobe=2).collect())
    )
    monkeypatch.setattr(similarity, "PROBE_CHUNK_ROWS", 3)
    monkeypatch.setattr(similarity, "MAX_BROADCAST_QUERY_BYTES", 0)
    fallback = sorted(
        map(tuple, similarity.ivf_topk(emb, q, cents, k=5, nprobe=2).collect())
    )
    assert fallback == base and len(base) > 0


def test_source_is_wide_true_for_derived_frames(spark, sf_dir):
    """A shuffle-bearing frame answers wide (recompute is expensive)
    without materializing its query stages."""
    from panoptes_spark.pipeline.dedup import source_is_wide

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    derived = docs.groupBy("source").agg(F.count("*").alias("n"))
    assert source_is_wide(derived) is True
    # plain narrow scan still answers by split count (bench layout: one
    # row group -> narrow)
    assert source_is_wide(docs.coalesce(1)) is False
