"""Golden tests for the metric-computation DSL compiler, mirroring the
examples in the reference's docs/Generic_SNMP_Polling_DSL.md:140-506."""

import pytest
from pyspark.sql import functions as F

from panoptes_spark.dsl.metric_compiler import MetricDSLCompiler, flatten_groups
from panoptes_spark.dsl.metric_expr import UnsupportedExpression, compile_value_expr


def make_tables(spark, rows):
    return spark.createDataFrame(
        rows, "device_id string, table_name string, index string, value string"
    )


def run(spark, program, rows, **kw):
    c = MetricDSLCompiler(spark, program, make_tables(spark, rows), **kw)
    return c.compile()


def points(df):
    out = {}
    for r in flatten_groups(df).collect():
        out[(r.device_id, r.metrics_group_type, r.dims_str, r.metric_name)] = (
            r.metric_value,
            r.metric_type,
        )
    return out


def test_top_level_literal_metric(spark):
    # doc "Top-level Metric": hard-coded fans_total = 1
    program = {
        "oids": {},
        "metrics_groups": [
            {
                "group_name": "environment",
                "dimensions": {},
                "metrics": {"fans_total": {"metric_type": "gauge", "type": "integer", "value": 1}},
            }
        ],
    }
    devices = spark.createDataFrame([("d1",), ("d2",)], "device_id string")
    c = MetricDSLCompiler(
        spark, program, make_tables(spark, []), static_devices=devices
    )
    p = points(c.compile())
    assert p[("d1", "environment", "", "fans_total")] == (1.0, "gauge")
    assert p[("d2", "environment", "", "fans_total")] == (1.0, "gauge")


def test_simple_table_lookup(spark):
    # doc "Simple Table Lookup": one group per index of the dimension table
    program = {
        "oids": {
            "memory_name": {"method": "static", "values": {"1": "Processor"}},
            "memory_total": {"method": "bulk_walk", "oid": ".1.2"},
            "memory_used": {"method": "bulk_walk", "oid": ".1.3"},
        },
        "metrics_groups": [
            {
                "group_name": "memory",
                "dimensions": {"memory_type": "memory_name.$index"},
                "metrics": {
                    "memory_total": {"metric_type": "gauge", "value": "int(memory_total.$index)"},
                    "memory_used": {"metric_type": "gauge", "value": "int(memory_used.$index)"},
                },
            }
        ],
    }
    rows = [
        ("d1", "memory_total", "1", "1002273800"),
        ("d1", "memory_used", "1", "190000700"),
    ]
    p = points(run(spark, program, rows))
    assert p[("d1", "memory", "memory_type=Processor", "memory_used")] == (
        190000700.0, "gauge")
    assert p[("d1", "memory", "memory_type=Processor", "memory_total")] == (
        1002273800.0, "gauge")
    assert len(p) == 2


def test_transform_and_indices(spark):
    # doc "Simple Transform" + "indices": C->F with zero-guard, restricted
    program = {
        "oids": {
            "temp_sensor_name": {
                "method": "static",
                "values": {"2.1.1.0": "Power Supply 0", "2.1.2.0": "Power Supply 1",
                           "4.1.1.0": "Fan Tray 0"},
            },
            "temp_sensor_values": {"method": "bulk_walk", "oid": ".1.7"},
        },
        "metrics_groups": [
            {
                "group_name": "environment",
                "dimensions": {"sensor": "temp_sensor_name.$index"},
                "metrics": {
                    "temperature_fahrenheit": {
                        "metric_type": "gauge",
                        "indices": ["2.1.1.0", "2.1.2.0"],
                        "transform": "lambda x: round((x * 1.8) + 32, 2) if x != 0 else 0.0",
                        "type": "float",
                        "value": "temp_sensor_values.$index",
                    }
                },
            }
        ],
    }
    rows = [
        ("d1", "temp_sensor_values", "2.1.1.0", "34"),
        ("d1", "temp_sensor_values", "2.1.2.0", "0"),
        ("d1", "temp_sensor_values", "4.1.1.0", "50"),
    ]
    p = points(run(spark, program, rows))
    # only the two power supplies, zero-guard applied to the second
    assert p[("d1", "environment", "sensor=Power Supply 0", "temperature_fahrenheit")] == (93.2, "gauge")
    assert p[("d1", "environment", "sensor=Power Supply 1", "temperature_fahrenheit")] == (0.0, "gauge")
    assert len(p) == 2


def test_indices_from_multi_table_join(spark):
    # doc "Evaluated Value"/"indices_from": value joins two tables on $index;
    # scales table indices are a strict subset
    program = {
        "oids": {
            "temp_sensor_name": {"method": "static",
                                 "values": {"1": "S1", "2": "S2", "3": "S3"}},
            "ent_sensor_values": {"method": "bulk_walk", "oid": ".1"},
            "temp_sensor_scales": {"method": "bulk_walk", "oid": ".2"},
        },
        "metrics_groups": [
            {
                "group_name": "environment",
                "dimensions": {"sensor": "temp_sensor_name.$index"},
                "metrics": {
                    "temperature_fahrenheit": {
                        "indices_from": "temp_sensor_scales",
                        "metric_type": "gauge",
                        "transform": "lambda x: round((x * 1.8) + 32, 2)",
                        "type": "float",
                        "value": "int(ent_sensor_values.$index) * int(temp_sensor_scales.$index)",
                    }
                },
            }
        ],
    }
    rows = [
        ("d1", "ent_sensor_values", "1", "30"),
        ("d1", "ent_sensor_values", "2", "20"),
        ("d1", "ent_sensor_values", "3", "10"),
        ("d1", "temp_sensor_scales", "1", "1"),
        ("d1", "temp_sensor_scales", "2", "2"),
    ]
    p = points(run(spark, program, rows))
    assert p[("d1", "environment", "sensor=S1", "temperature_fahrenheit")] == (86.0, "gauge")
    assert p[("d1", "environment", "sensor=S2", "temperature_fahrenheit")] == (104.0, "gauge")
    assert len(p) == 2  # index 3 not in scales -> no group


def test_index_transform_rekeying(spark):
    # doc "index_transform": cpu_util walks indices 0/1/10; transform maps
    # 1 -> 22 to match the static tables; extraneous indices ignored
    program = {
        "oids": {
            "cpu_name": {"method": "static", "values": {"22": "Supervisor"}},
            "cpu_no": {"method": "static", "values": {"22": "Module 1"}},
            "cpu_util": {
                "method": "bulk_walk",
                "oid": ".1.8",
                "index_transform": {"0": "26584", "1": "22", "10": "4959"},
            },
        },
        "metrics_groups": [
            {
                "group_name": "cpu",
                "dimensions": {
                    "cpu_name": "cpu_name.$index",
                    "cpu_no": "cpu_no.$index",
                    "cpu_type": {"value": "'ctrl'"},
                },
                "metrics": {
                    "cpu_utilization": {"metric_type": "gauge", "value": "int(cpu_util.$index)"}
                },
            }
        ],
    }
    rows = [
        ("d1", "cpu_util", "0", "3"),
        ("d1", "cpu_util", "1", "5"),
        ("d1", "cpu_util", "10", "7"),
    ]
    df = run(spark, program, rows)
    p = points(df)
    key = ("d1", "cpu", "cpu_name=Supervisor,cpu_no=Module 1,cpu_type=ctrl",
           "cpu_utilization")
    assert p[key] == (5.0, "gauge")
    # re-keyed-but-unmatched indices (26584, 4959) still emit groups whose
    # indexed dims are absent (no empty-string seen -> not suppressed)
    from panoptes_spark.dsl.metric_compiler import flatten_groups
    rows_out = flatten_groups(df).collect()
    assert len(rows_out) == 3
    unmatched = sorted(r.metric_value for r in rows_out
                       if r.dims_str == "cpu_type=ctrl")
    assert unmatched == [3.0, 7.0]


def test_conditional_count_aggregates(spark):
    # A1: len([x for x in t.values() if x == '2']) and items() + membership
    program = {
        "oids": {
            "fan_statuses": {"method": "bulk_walk", "oid": ".1"},
            "fans": {"method": "bulk_walk", "oid": ".2"},
            "oper_status": {"method": "bulk_walk", "oid": ".3"},
        },
        "metrics_groups": [
            {
                "group_name": "environment",
                "dimensions": {},
                "metrics": {
                    "fans_ok": {
                        "metric_type": "gauge",
                        "value": "len([x for x in fan_statuses.values() if x == '2'])",
                    },
                    "fans_down": {
                        "metric_type": "gauge",
                        "value": "len([(x,y) for (x,y) in oper_status.items() if x in fans and y not in ['6']])",
                    },
                },
            }
        ],
    }
    rows = [
        ("d1", "fan_statuses", "1", "2"),
        ("d1", "fan_statuses", "2", "2"),
        ("d1", "fan_statuses", "3", "1"),
        ("d1", "fans", "7", "Fan 7"),
        ("d1", "fans", "8", "Fan 8"),
        ("d1", "oper_status", "7", "6"),
        ("d1", "oper_status", "8", "2"),
        ("d1", "oper_status", "9", "2"),
    ]
    p = points(run(spark, program, rows))
    assert p[("d1", "environment", "", "fans_ok")] == (2.0, "gauge")
    # oper_status: idx 8 (in fans, value != '6') counts; idx 7 excluded by
    # value '6'; idx 9 not in fans
    assert p[("d1", "environment", "", "fans_down")] == (1.0, "gauge")


def test_empty_dimension_suppression(spark):
    program = {
        "oids": {
            "names": {"method": "bulk_walk", "oid": ".1"},
            "vals": {"method": "bulk_walk", "oid": ".2"},
        },
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {"name": "names.$index"},
                "metrics": {"v": {"value": "int(vals.$index)", "indices_from": "names"}},
            }
        ],
    }
    rows = [
        ("d1", "names", "1", "ok"),
        ("d1", "names", "2", ""),  # empty dimension value
        ("d1", "vals", "1", "10"),
        ("d1", "vals", "2", "20"),
    ]
    p = points(run(spark, program, rows))
    assert ("d1", "g", "name=ok", "v") in p
    assert len([k for k in p if k[1] == "g" and "v" == k[3]]) == 1  # idx 2 suppressed

    # with ignore_empty_dimensions the group survives, dim omitted
    program["metrics_groups"][0]["ignore_empty_dimensions"] = True
    p = points(run(spark, program, rows))
    assert ("d1", "g", "", "v") in p  # empty dim dropped, group kept
    assert len([k for k in p if k[1] == "g"]) == 2


def test_top_level_falsy_skip_and_merge_into_indexed(spark):
    # v0.2: top-level metrics merge into every indexed group; falsy skipped
    program = {
        "oids": {
            "names": {"method": "static", "values": {"1": "a", "2": "b"}},
            "vals": {"method": "bulk_walk", "oid": ".2"},
        },
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {"name": "names.$index"},
                "metrics": {
                    "v": {"value": "int(vals.$index)"},
                    "total": {"value": 5},
                    "zero_skipped": {"value": 0},
                },
            }
        ],
    }
    rows = [("d1", "vals", "1", "10"), ("d1", "vals", "2", "20")]
    p = points(run(spark, program, rows))
    assert p[("d1", "g", "name=a", "v")] == (10.0, "gauge")
    assert p[("d1", "g", "name=a", "total")] == (5.0, "gauge")
    assert ("d1", "g", "name=a", "zero_skipped") not in p
    assert p[("d1", "g", "name=b", "total")] == (5.0, "gauge")


def test_top_level_falsy_checked_before_cast_and_transform(spark):
    # reference order (plugin_polling_generic_snmp.py:508-521): falsy test
    # on the RAW eval result, THEN cast/transform. 0.4 with type integer
    # must keep metric 0; a transform yielding 0 must also be kept.
    program = {
        "oids": {"vals": {"method": "bulk_walk", "oid": ".2"}},
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {},
                "metrics": {
                    "v": {"value": "int(vals.$index)"},
                    "truncated": {"value": 0.4, "type": "integer"},
                    "transformed_zero": {
                        "value": 2, "transform": "lambda x: x - 2"},
                    "raw_zero": {"value": 0.0, "type": "integer"},
                },
            }
        ],
    }
    rows = [("d1", "vals", "1", "10")]
    p = points(run(spark, program, rows))
    assert p[("d1", "g", "", "truncated")] == (0.0, "gauge")
    assert p[("d1", "g", "", "transformed_zero")] == (0.0, "gauge")
    assert ("d1", "g", "", "raw_zero") not in p  # falsy raw still skipped


def test_boolop_short_circuit_hazard_scoping(spark):
    # python `a and b` never evaluates b when a is falsy: a missing table
    # key referenced only on the right must NOT poison the index. The
    # reference evals False -> int -> metric 0.
    program = {
        "oids": {
            "b": {"method": "bulk_walk", "oid": ".1"},
            "a": {"method": "bulk_walk", "oid": ".2"},
        },
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {},
                "metrics": {
                    "both_up": {
                        "value": "int(b.$index) > 0 and int(a.$index) > 0",
                        "indices_from": "b",
                    },
                },
            }
        ],
    }
    rows = [
        ("d1", "b", "1", "1"),
        ("d1", "b", "2", "0"),  # left falsy -> right's missing key unseen
        ("d1", "a", "1", "3"),
        # a has no index 2
    ]
    out = flatten_groups(run(spark, program, rows)).collect()
    by_idx = sorted(r.metric_value for r in out if r.metric_name == "both_up")
    assert by_idx == [0.0, 1.0]
    # when the left IS truthy, the missing right key still poisons
    rows_poisoned = [("d1", "b", "2", "7")]  # b.2 truthy, a.2 missing
    out = flatten_groups(run(spark, program, rows_poisoned)).collect()
    assert [r.metric_name for r in out if r.metric_name == "both_up"] == []


def test_bool_literal_value(spark):
    # reference: isinstance(True, int) -> type 'integer'; True -> 1,
    # False is falsy -> skipped at top level
    program = {
        "oids": {},
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {},
                "metrics": {"flag": {"value": True},
                            "off": {"value": False}},
            }
        ],
    }
    devices = spark.createDataFrame([("d1",)], "device_id string")
    c = MetricDSLCompiler(
        spark, program, make_tables(spark, []), static_devices=devices
    )
    p = points(c.compile())
    assert p[("d1", "g", "", "flag")] == (1.0, "gauge")
    assert ("d1", "g", "", "off") not in p


def test_multi_device_isolation(spark):
    program = {
        "oids": {"vals": {"method": "bulk_walk", "oid": ".2"}},
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {},
                "metrics": {"v": {"value": "int(vals.$index)"}},
            }
        ],
    }
    rows = [("d1", "vals", "1", "10"), ("d2", "vals", "1", "99")]
    p = points(run(spark, program, rows))
    assert p[("d1", "g", "", "v")] == (10.0, "gauge")
    assert p[("d2", "g", "", "v")] == (99.0, "gauge")


def test_unsupported_expression_raises():
    with pytest.raises(UnsupportedExpression):
        compile_value_expr("__import__('os').system('x')", set(), set())
    with pytest.raises(UnsupportedExpression):
        compile_value_expr("[x for x in range(10)]", set(), set())


def test_v01_schema_version_semantics(spark):
    # v0.1: top-level metrics form a SEPARATE group (not merged into the
    # indexed ones); bare 'ctrl' is a string literal; empty dims ignored
    program = {
        "oids": {
            "names": {"method": "bulk_walk", "oid": ".1"},
            "vals": {"method": "bulk_walk", "oid": ".2"},
        },
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {"name": "names.$index", "kind": {"value": "ctrl"}},
                "metrics": {
                    "v": {"value": "int(vals.$index)", "indices_from": "names"},
                    "total": {"value": 7},
                },
            }
        ],
    }
    rows = [
        ("d1", "names", "1", "a"),
        ("d1", "names", "2", ""),  # empty dim value: v0.1 always ignores
        ("d1", "vals", "1", "10"),
        ("d1", "vals", "2", "20"),
    ]
    df = run(spark, program, rows, schema_version="0.1")
    flat = flatten_groups(df).collect()
    by = {(r.dims_str, r.metric_name): r.metric_value for r in flat}
    # indexed groups: no 'total' merged in, top dim 'kind=ctrl' present
    assert by[("kind=ctrl,name=a", "v")] == 10.0
    assert ("kind=ctrl,name=a", "total") not in by
    # empty-name index kept (ignore_empty_dimensions), dim omitted
    assert by[("kind=ctrl", "v")] == 20.0
    # separate top-level group carrying 'total'
    assert by[("kind=ctrl", "total")] == 7.0


def test_scalar_get_oid(spark):
    # S2: a get-method oid used as a scalar in both indexed and top-level
    # expressions (reference _snmpget_oid_map substitution)
    program = {
        "oids": {
            "uptime": {"method": "get", "oid": ".1.3.6.1.2.1.1.3.0"},
            "vals": {"method": "bulk_walk", "oid": ".2"},
        },
        "metrics_groups": [
            {
                "group_name": "g",
                "dimensions": {},
                "metrics": {
                    "uptime_hours": {"value": "int(uptime) / 360000",
                                     "type": "float"},
                    "scaled": {"value": "int(vals.$index) * int(uptime)"},
                },
            }
        ],
    }
    rows = [
        ("d1", "uptime", "0", "7200000"),
        ("d1", "vals", "1", "2"),
        ("d2", "vals", "1", "5"),  # d2 has no uptime -> scalar missing
    ]
    tables = spark.createDataFrame(
        rows, "device_id string, table_name string, index string, value string"
    )
    out = flatten_groups(MetricDSLCompiler(spark, program, tables).compile())
    p = {(r.device_id, r.metric_name): r.metric_value for r in out.collect()}
    assert p[("d1", "uptime_hours")] == 20.0
    assert p[("d1", "scaled")] == 2 * 7200000.0
    # d2: missing scalar poisons both targets -> v0.2 still emits the
    # empty top-level group, with no metrics
    assert ("d2", "scaled") not in p
    assert ("d2", "uptime_hours") not in p
