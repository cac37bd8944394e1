"""DSL golden tests, modeled on the reference's
tests/test_framework.py:422-483 (re-targeted at result sets, not SQL strings).
"""

import pytest
from pyspark.sql import functions as F

from panoptes_spark.dsl.resource_filter import (
    ResourceFilter,
    ResourceFilterParseError,
)


@pytest.fixture(scope="module")
def resources(spark):
    rows = [
        # site, class, subclass, type, id, endpoint, ts, plugin, metadata
        ("dc1", "network", "switch", "arista", "sw1", "sw1.net", 1.0, "disc",
         {"make": "Arista", "model": "7050", "os_version": "4.20"}),
        ("dc1", "network", "router", "juniper", "rt1", "rt1.net", 2.0, "disc",
         {"make": "Juniper", "model": "MX104", "os_version": "15.1"}),
        ("dc2", "network", "switch", "cisco", "sw2", "sw2.net", 3.0, "disc",
         {"make": "Cisco", "model": "N9K", "os_version": "9.3"}),
        ("dc2", "system", "host", "generic", "h1", "h1.net", 4.0, "disc",
         {"os_name": "linux"}),  # no 'make' key
        ("dc3", "network", "switch", "arista", "sw3", "sw3.net", 5.0, "disc",
         {"make": "Arista", "os_version": "4.18"}),
    ]
    df = spark.createDataFrame(
        rows,
        "resource_site string, resource_class string, resource_subclass string,"
        " resource_type string, resource_id string, resource_endpoint string,"
        " resource_creation_timestamp double, resource_plugin string,"
        " resource_metadata map<string,string>",
    )
    df.cache().count()
    return df


def ids(df, rf):
    return {
        r.resource_id
        for r in df.where(F.expr(rf.to_spark_sql())).select("resource_id").collect()
    }


def test_simple_equality(spark, resources):
    assert ids(resources, ResourceFilter('resource_class = "network"')) == {
        "sw1", "rt1", "sw2", "sw3"}


def test_and(spark, resources):
    rf = ResourceFilter('resource_class = "network" AND resource_subclass = "switch"')
    assert ids(resources, rf) == {"sw1", "sw2", "sw3"}


def test_ne_and_word_ops(spark, resources):
    assert ids(resources, ResourceFilter('resource_type != "arista"')) == {
        "rt1", "sw2", "h1"}
    assert ids(resources, ResourceFilter('resource_type ne "arista"')) == {
        "rt1", "sw2", "h1"}
    assert ids(resources, ResourceFilter('resource_type eq "arista"')) == {
        "sw1", "sw3"}


def test_in_not_in(spark, resources):
    assert ids(resources, ResourceFilter('resource_endpoint IN ("sw1.net", "rt1.net")')) == {
        "sw1", "rt1"}
    assert ids(resources, ResourceFilter('resource_site NOT IN ("dc1", "dc2")')) == {"sw3"}


def test_metadata_like(spark, resources):
    rf = ResourceFilter('resource_metadata.make NOT LIKE "Arista%"')
    # h1 has no 'make' key -> NULL -> excluded (EAV-equivalent semantics)
    assert ids(resources, rf) == {"rt1", "sw2"}
    rf2 = ResourceFilter('resource_metadata.make LIKE "Arista%"')
    assert ids(resources, rf2) == {"sw1", "sw3"}


def test_mixed_or(spark, resources):
    rf = ResourceFilter(
        'resource_metadata.os_version LIKE "4%" OR resource_site NOT IN ("dc1", "dc2")'
    )
    assert ids(resources, rf) == {"sw1", "sw3"}


def test_precedence_and_over_or(spark, resources):
    # a OR b AND c  ==  a OR (b AND c)
    rf = ResourceFilter(
        'resource_id = "h1" OR resource_class = "network" AND resource_site = "dc1"'
    )
    assert ids(resources, rf) == {"h1", "sw1", "rt1"}


def test_case_insensitive_keywords(spark, resources):
    rf = ResourceFilter('RESOURCE_CLASS = "system" and resource_site in ("dc2")')
    assert ids(resources, rf) == {"h1"}


def test_escaped_quote():
    rf = ResourceFilter('resource_id = "a\\"b"')
    assert rf.ast.items[0].values == ['a"b']


def test_parse_errors():
    for bad in [
        '(resource_site = "dc1" OR resource_site = "dc2")',  # parens unsupported
        "resource_site = dc1",  # unquoted rvalue
        'resource_site == "dc1"',  # bad operator
        'bogus_field = "x"',  # unknown field
        'resource_site NOT = "x"',  # NOT only before LIKE/IN
        'resource_site = "dc1" AND',  # dangling connector
        "",
    ]:
        with pytest.raises(ResourceFilterParseError):
            ResourceFilter(bad)


def test_flat_sql_compilation():
    rf = ResourceFilter(
        'resource_class = "network" AND resource_metadata.make NOT LIKE "Arista%"'
    )
    assert rf.to_flat_sql() == (
        "(resource_class = 'network') AND (meta_make NOT LIKE 'Arista%')"
    )
    assert rf.metadata_keys() == ["make"]
