"""Model ops: U1 union-dedup, canonicalization, integrity validation."""

from panoptes_spark.model import (
    canonicalize_metrics_groups,
    dedup_resources,
    union_metrics_group_sets,
    validate_metrics_groups,
)

GROUP_SCHEMA = (
    "resource struct<resource_id:string>,"
    " metrics_group_type string,"
    " metrics array<struct<metric_name:string,metric_value:double,"
    "metric_type:string,metric_creation_timestamp:double>>,"
    " dimensions array<struct<dimension_name:string,dimension_value:string>>"
)


def g(rid, gtype, metrics, dims):
    return ((rid,), gtype, metrics, dims)


def test_union_dedup_order_insensitive(spark):
    m1 = [("a", 1.0, "gauge", 1.0), ("b", 2.0, "gauge", 1.0)]
    m1_rev = [("b", 2.0, "gauge", 1.0), ("a", 1.0, "gauge", 1.0)]
    d1 = [("x", "1")]
    df1 = spark.createDataFrame([g("r1", "cpu", m1, d1)], GROUP_SCHEMA)
    df2 = spark.createDataFrame(
        [g("r1", "cpu", m1_rev, d1), g("r2", "cpu", m1, d1)], GROUP_SCHEMA
    )
    # U1: same content in different array order dedups to one row
    out = union_metrics_group_sets(df1, df2)
    assert out.count() == 2


def test_canonicalize_sorts_by_name_and_type(spark):
    m = [("b", 1.0, "gauge", 1.0), ("a", 2.0, "gauge", 1.0),
         ("a", 3.0, "counter", 1.0)]
    df = spark.createDataFrame([g("r1", "cpu", m, [])], GROUP_SCHEMA)
    row = canonicalize_metrics_groups(df).collect()[0]
    assert [(x.metric_name, x.metric_type) for x in row.metrics] == [
        ("a", "counter"), ("a", "gauge"), ("b", "gauge")]


def test_validate_rejects_dup_name_type(spark):
    ok = [("a", 1.0, "gauge", 1.0), ("a", 2.0, "counter", 1.0)]  # legal pair
    bad = [("a", 1.0, "gauge", 1.0), ("a", 2.0, "gauge", 1.0)]  # dup
    bad_dim = [("a", 1.0, "gauge", 1.0)]
    df = spark.createDataFrame(
        [g("r1", "cpu", ok, [("iface", "1")]),
         g("r2", "cpu", bad, [("iface", "1")]),
         g("r3", "cpu", bad_dim, [("9bad", "1")])],  # dim name not identifier
        GROUP_SCHEMA,
    )
    kept = validate_metrics_groups(df).collect()
    assert {r.resource.resource_id for r in kept} == {"r1"}


def test_dedup_resources_identity(spark):
    rows = [
        ("dc1", "network", "switch", "cisco", "sw1", "e1", 1.0),
        ("dc1", "network", "switch", "cisco", "sw1", "e2", 5.0),  # same identity
        ("dc2", "network", "switch", "cisco", "sw1", "e1", 1.0),  # diff site
    ]
    df = spark.createDataFrame(
        rows,
        "resource_site string, resource_class string, resource_subclass string,"
        " resource_type string, resource_id string, resource_endpoint string,"
        " resource_creation_timestamp double",
    )
    out = dedup_resources(df).collect()
    assert len(out) == 2
    kept = [r for r in out if r.resource_site == "dc1"][0]
    assert kept.resource_endpoint == "e2"  # newest wins


def test_enrichment_multigroupset_assembly(spark):
    """MultiGroupSet (reference enrichment.py:457-494): flat rows ->
    nested per-resource GroupSets; replace-on-collision keeps the last
    write; flatten round-trips exactly."""
    from panoptes_spark.operators.enrichment_groups import (
        assemble_group_sets,
        flatten_group_sets,
        multi_group_set_summary,
    )

    rows = [
        ("r1", "interface", "1", "old", 1),
        ("r1", "interface", "1", "new", 2),   # collision: last write wins
        ("r1", "interface", "2", "x", 1),
        ("r1", "operational", "model", "m1", 1),
        ("r2", "interface", "1", "y", 1),
    ]
    flat = spark.createDataFrame(
        rows,
        "resource_id string, namespace string, key string, value string,"
        " ord int",
    )
    nested = assemble_group_sets(flat, order_col="ord")
    byid = {r.resource_id: r for r in nested.collect()}
    assert set(byid) == {"r1", "r2"}
    r1 = byid["r1"]
    assert [g.namespace for g in r1.enrichment] == ["interface", "operational"]
    iface = {d.key: d.value for d in r1.enrichment[0].data}
    assert iface == {"1": "new", "2": "x"}  # replaced, sorted

    # round trip is exact (minus the replaced loser row)
    back = {tuple(r) for r in flatten_group_sets(nested).collect()}
    assert back == {
        ("r1", "interface", "1", "new"), ("r1", "interface", "2", "x"),
        ("r1", "operational", "model", "m1"), ("r2", "interface", "1", "y"),
    }

    # identity projection mirrors GroupSet hash/eq (resource + namespaces)
    summ = {r.resource_id: r for r in multi_group_set_summary(nested).collect()}
    assert summ["r1"].namespaces == "interface,operational"
    assert summ["r1"].n_groups == 2 and summ["r1"].n_entries == 3
    assert summ["r2"].n_groups == 1 and summ["r2"].n_entries == 1
    assert summ["r1"].digest != summ["r2"].digest
