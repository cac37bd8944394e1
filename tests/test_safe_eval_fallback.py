"""Pandas-UDF fallback for DSL expressions the SQL translator rejects."""

import pytest

from panoptes_spark.dsl.metric_compiler import MetricDSLCompiler, flatten_groups
from panoptes_spark.dsl.safe_eval import SafeEvalError, safe_eval


def test_safe_eval_basics():
    assert safe_eval("1 + 2 * 3", {}) == 7
    assert safe_eval("len([x for x in t.values() if x == '2'])",
                     {"t": {"a": "2", "b": "1", "c": "2"}}) == 2
    assert safe_eval("sorted(t.keys())[0]", {"t": {"b": 1, "a": 2}}) == "a"
    assert safe_eval("'-'.join([str(x) for x in [1, 2]])", {}) == "1-2"


def test_safe_eval_blocks_dangerous():
    for bad in [
        "__import__('os')",
        "().__class__",
        "open('/etc/passwd')",
        "exec('x=1')",
        "(lambda: 1)()",
    ]:
        with pytest.raises((SafeEvalError, Exception)):
            safe_eval(bad, {})


def test_compiler_fallback_indexed(spark):
    # str.zfill is not SQL-translatable -> py fallback path
    program = {
        "oids": {"names": {"method": "bulk_walk", "oid": ".1"}},
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {"padded": {"value": "names.$index.zfill(6)"}},
                "metrics": {"v": {"value": "int(names.$index) * 2",
                                  "indices_from": "names"}},
            }
        ],
    }
    tables = spark.createDataFrame(
        [("d1", "names", "1", "42"), ("d1", "names", "2", "7")],
        "device_id string, table_name string, index string, value string",
    )
    out = flatten_groups(MetricDSLCompiler(spark, program, tables).compile())
    rows = {(r.dims_str, r.metric_name): r.metric_value for r in out.collect()}
    assert rows[("padded=000042", "v")] == 84.0
    assert rows[("padded=000007", "v")] == 14.0


def test_compiler_fallback_top_level(spark):
    # sum() over table values is not SQL-translatable -> py fallback
    program = {
        "oids": {"vals": {"method": "bulk_walk", "oid": ".1"}},
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {},
                "metrics": {
                    "total": {"value": "sum([int(x) for x in vals.values()])"}
                },
            }
        ],
    }
    tables = spark.createDataFrame(
        [("d1", "vals", "1", "10"), ("d1", "vals", "2", "32"),
         ("d2", "vals", "1", "5")],
        "device_id string, table_name string, index string, value string",
    )
    out = flatten_groups(MetricDSLCompiler(spark, program, tables).compile())
    rows = {(r.device_id, r.metric_name): r.metric_value for r in out.collect()}
    assert rows[("d1", "total")] == 42.0
    assert rows[("d2", "total")] == 5.0
