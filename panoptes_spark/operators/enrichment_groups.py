"""Enrichment group assembly — GroupSet and MultiGroupSet (§2 U-family).

Reference shapes (``yahoo_panoptes/framework/enrichment.py``):

- ``PanoptesEnrichmentGroup`` (:178-350): namespace + {key -> value}, with
  replace-on-key-collision (discard+add, :277-278).
- ``PanoptesEnrichmentGroupSet`` (:353-454): per-resource set of groups,
  replace-on-namespace-collision (:420-421); identity is
  (resource_id, sorted namespace string) (:441-454).
- ``PanoptesEnrichmentMultiGroupSet`` (:457-494): a set of group sets
  across resources — the cross-resource grouping a fan-out enrichment
  plugin emits in one shot.

Spark-first: the flat enrichment relation
(resource_id, namespace, key, value) IS the multi-group-set content; these
operators assemble the nested wire shape with deterministic (sorted) array
order, flatten it back, and project the reference's identity/equality
semantics for oracle comparison. Assembly is two keyed aggregations —
(resource_id, namespace) then (resource_id) — i.e. one shuffle each, both
on keys that scale with the resource universe (no skew hot-spots).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_last_write(
    flat: DataFrame,
    order_col: str,
    keys: tuple[str, ...] = ("resource_id", "namespace", "key"),
) -> DataFrame:
    """Replace-on-collision (reference discard+add): keep, per
    (resource, namespace, key), the row with the greatest ``order_col``
    (ties broken by value for determinism)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), F.col("value").desc()
    )
    return (
        flat.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def assemble_group_sets(
    flat: DataFrame, order_col: str | None = None
) -> DataFrame:
    """(resource_id, namespace, key, value:string) -> one row per resource:

    (resource_id, enrichment: array<struct<namespace,
                               data: array<struct<key, value>>>>)

    Arrays sorted by key / namespace — the canonical order the reference
    gets from ``json.dumps(sort_keys=True)`` (:428). The set of output
    rows IS the MultiGroupSet; a single row is one GroupSet.
    """
    rows = flat.select("resource_id", "namespace", "key", "value")
    if order_col is not None:
        rows = dedup_last_write(
            flat.select("resource_id", "namespace", "key", "value", order_col),
            order_col,
        ).drop(order_col)
    else:
        rows = rows.dropDuplicates(["resource_id", "namespace", "key"])
    per_ns = rows.groupBy("resource_id", "namespace").agg(
        F.expr(
            "array_sort(collect_list(struct(key, value)),"
            " (a, b) -> CASE WHEN a.key < b.key THEN -1"
            " WHEN a.key > b.key THEN 1 ELSE 0 END)"
        ).alias("data")
    )
    return per_ns.groupBy("resource_id").agg(
        F.expr(
            "array_sort(collect_list(struct(namespace, data)),"
            " (a, b) -> CASE WHEN a.namespace < b.namespace THEN -1"
            " WHEN a.namespace > b.namespace THEN 1 ELSE 0 END)"
        ).alias("enrichment")
    )


def flatten_group_sets(nested: DataFrame) -> DataFrame:
    """Inverse of :func:`assemble_group_sets` — back to the flat
    relation (round-trip-exact)."""
    return (
        nested.select(
            "resource_id", F.explode("enrichment").alias("g")
        )
        .select("resource_id", "g.namespace", F.explode("g.data").alias("d"))
        .select(
            "resource_id",
            "namespace",
            F.col("d.key").alias("key"),
            F.col("d.value").alias("value"),
        )
    )


def multi_group_set_summary(nested: DataFrame) -> DataFrame:
    """Reference-identity projection of a MultiGroupSet, derived from the
    NESTED shape (so it exercises the assembly):

    - ``namespaces``: the sorted namespace string — the GroupSet
      hash/equality key (enrichment.py:441-454)
    - ``n_groups`` / ``n_entries``: set sizes (len semantics :438-439,:485)
    - ``digest``: md5 of the canonical serialization (sort_keys json twin)
    """
    return nested.select(
        "resource_id",
        F.expr(
            "array_join(transform(enrichment, g -> g.namespace), ',')"
        ).alias("namespaces"),
        F.expr("cast(size(enrichment) as bigint)").alias("n_groups"),
        F.expr(
            "cast(aggregate(enrichment, 0, (acc, g) -> acc + size(g.data))"
            " as bigint)"
        ).alias("n_entries"),
        F.md5(
            F.expr(
                "array_join(transform(enrichment, g -> concat(g.namespace,"
                " ':', array_join(transform(g.data,"
                " d -> concat(d.key, '=', d.value)), ','))), ';')"
            )
        ).alias("digest"),
    )
