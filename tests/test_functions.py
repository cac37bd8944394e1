"""Scalar function library tests (F2-F15) with values from the reference's
own helpers/tests where observable."""

from pyspark.sql import functions as F

from panoptes_spark.functions import scalar as s


def one(spark, col, value, schema="v string"):
    df = spark.createDataFrame([(value,)], schema)
    return df.select(col.alias("out")).collect()[0].out


def test_c_to_f(spark):
    assert one(spark, s.celsius_to_fahrenheit(F.col("v")), 34.0, "v double") == 93.2
    assert one(spark, s.celsius_to_fahrenheit(F.col("v"), zero_guard=True), 0.0,
               "v double") == 0.0


def test_unit_conversions(spark):
    assert one(spark, s.octets_to_bits(F.col("v")), 100, "v long") == 800
    assert one(spark, s.mb_to_bytes(F.col("v")), 2, "v long") == 2 * 2**20
    assert one(spark, s.mbps_to_bps(F.col("v")), 10, "v long") == 10_000_000
    assert one(spark, s.milli_scale(F.col("v")), 2500, "v long") == 2.5


def test_plausibility(spark):
    assert one(spark, s.temperature_plausible(F.col("v")), 25.0, "v double") is True
    assert one(spark, s.temperature_plausible(F.col("v")), 0.0, "v double") is False
    assert one(spark, s.temperature_plausible(F.col("v")), 1500.0, "v double") is False


def test_dotted_decimal_to_mac(spark):
    # reference returns UPPERCASE (helpers.py .upper(); tests/test_helpers.py:149)
    assert one(spark, s.dotted_decimal_to_mac("v"), "0.12.41.223.96.2") == \
        "00:0C:29:DF:60:02"
    # reference test vector incl. a 7th >255 part: hex '213' kept verbatim
    assert one(spark, s.dotted_decimal_to_mac("v"),
               "126.2.196.127.168.46.531") == "7E:02:C4:7F:A8:2E:213"


def test_octets_to_mac(spark):
    # reference test vector (tests/test_helpers.py:85), uppercase
    assert one(spark, s.octets_to_mac("v"), "\xe4\xc7\x22\xdbJ\x08") == \
        "E4:C7:22:DB:4A:08"


def test_netmask_to_cidr(spark):
    assert one(spark, s.netmask_to_cidr("v"), "255.255.255.0") == 24
    assert one(spark, s.netmask_to_cidr("v"), "255.255.255.255") == 32
    assert one(spark, s.netmask_to_cidr("v"), "255.240.0.0") == 12


def test_ipv6_index_transform(spark):
    # canonical compressed form via ipaddress in the reference
    out = one(spark, s.ipv6_index_transform("v"),
              "254.128.0.0.0.0.0.0.2.18.0.255.254.35.52.52")
    assert out == "fe80::212:ff:fe23:3434"
    # reference test vector (tests/test_helpers.py:79-82)
    out = one(spark, s.ipv6_index_transform("v"),
              "254.128.0.0.0.0.0.0.0.5.115.255.254.160.0.3")
    assert out == "fe80::5:73ff:fea0:3"
    # zero-run edge cases: run at end, single zero group never compressed
    out = one(spark, s.ipv6_index_transform("v"),
              "0.1.0.0.0.2.0.3.0.4.0.5.0.6.0.7")
    assert out == "1:0:2:3:4:5:6:7"
    out = one(spark, s.ipv6_index_transform("v"),
              "0.1.0.2.0.3.0.4.0.5.0.6.0.0.0.0")
    assert out == "1:2:3:4:5:6::"


def test_influx_escapes(spark):
    assert one(spark, s.sanitize_measurement(F.col("v")), "a b/c") == "a_b_c"
    assert one(spark, s.escape_tag_value(F.col("v")), "a b,c=d") == \
        "a\\ b\\,c\\=d"


def test_kv_codec_roundtrip(spark):
    df = spark.createDataFrame(
        [(12.5, {"b": "2", "a": "1"})],
        "resource_creation_timestamp double, resource_metadata map<string,string>",
    )
    kv = df.select(s.resource_to_kv_string().alias("kv")).collect()[0].kv
    assert kv == "timestamp|12.5|meta.a|1|meta.b|2"
    back = spark.createDataFrame([(kv,)], "kv string").select(
        s.kv_string_to_map("kv").alias("m")
    ).collect()[0].m
    assert back == {"timestamp": "12.5", "meta.a": "1", "meta.b": "2"}


def test_if_type_desc(spark):
    assert one(spark, s.if_type_desc(F.col("v")), 6, "v int") == "ethernetCsmacd"
    assert one(spark, s.if_type_desc(F.col("v")), 999, "v int") == "unknown"


# -- W6: murmur3 / uniform splay scheduling ---------------------------------

def test_murmur3_published_vectors():
    """Canonical MurmurHash3_x86_32 vectors (smhasher / public test suites)."""
    from panoptes_spark.operators.schedule import murmur3_x86_32 as mm

    assert mm(b"", 0) == 0
    assert mm(b"", 1) == 0x514E28B7
    assert mm(b"", 0xFFFFFFFF) == 0x81F16F39
    assert mm(b"\x00\x00\x00\x00", 0) == 0x2362F9DE
    assert mm(b"test", 0) == 0xBA6BD213
    assert mm(b"Hello, world!", 0) == 0xC0363E43
    assert mm(b"The quick brown fox jumps over the lazy dog", 0x9747B28C) == 0x2FA826CD
    # tail lengths 1-3
    assert mm(b"a", 0x9747B28C) == 0x7FA09EA6
    assert mm(b"aa", 0x9747B28C) == 0x5D211726
    assert mm(b"aaa", 0x9747B28C) == 0x283E0130
    assert mm(b"aaaa", 0x9747B28C) == 0x5A97808A
    # signed variant (mmh3.hash default)
    assert mm(b"test", 0, signed=True) == 0xBA6BD213 - (1 << 32)


def test_murmur3_sql_twins_match_python(spark):
    """The Spark SQL and DuckDB SQL murmur3 pipelines are byte-exact with
    the canonical implementation (empty string, all tail lengths, long)."""
    import random
    import string

    import duckdb

    from panoptes_spark.operators.schedule import (
        mmh3_cte_chain,
        mmh3_sql_steps,
        murmur3_x86_32,
    )

    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + ":._-#|"
    names = [""] + [
        "".join(rng.choice(alphabet) for _ in range(n)) for n in range(1, 18)
    ] + ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
         for _ in range(20)]

    df = spark.createDataFrame([(n,) for n in names], "nm string")
    for alias, expr in mmh3_sql_steps("nm", "spark"):
        df = df.withColumn(alias, F.expr(expr))
    from panoptes_spark.operators.schedule import mmh3_sql_expr

    df = df.withColumn("__let_hash", F.expr(mmh3_sql_expr("nm", "spark")))
    for r in df.select("nm", "__mm_hash", "__let_hash").collect():
        assert r["__mm_hash"] == murmur3_x86_32(r["nm"]), r["nm"]
        # the let-bound single-expression form is identical
        assert r["__let_hash"] == r["__mm_hash"], r["nm"]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE base AS SELECT * FROM (VALUES "
        + ",".join(f"('{n}')" for n in names)
        + ") t(nm)"
    )
    sql = "WITH " + mmh3_cte_chain("base", "nm", "duckdb") + \
        " SELECT nm, __mm_hash FROM mmh3"
    for nm, h in con.execute(sql).fetchall():
        assert h == murmur3_x86_32(nm), nm


def test_uniform_schedule_semantics(spark):
    """celery_manager.py:234-255: resume iff last+interval >= now > last,
    else splay = mmh3 % min(interval, 60)."""
    from panoptes_spark.operators.schedule import murmur3_x86_32, uniform_schedule

    now = 1000.0
    rows = [
        # never scheduled -> splay
        ("polling:r1", 120, None),
        # checkpoint inside window (last + 120 = 1060 >= 1000 > 940) -> resume
        ("polling:r2", 120, 940.0),
        # stale checkpoint (last + 120 = 900 < 1000) -> re-splay
        ("polling:r3", 120, 780.0),
        # sub-60 interval: splay cap is the interval itself
        ("polling:r4", 20, None),
    ]
    df = spark.createDataFrame(
        rows, "schedule_name string, interval_s int, last_uniformly_scheduled_at double"
    )
    out = {r["schedule_name"]: r for r in uniform_schedule(df, now).collect()}

    s1 = murmur3_x86_32("polling:r1") % 60
    assert not out["polling:r1"]["resumed"]
    assert out["polling:r1"]["splay_s"] == s1
    assert out["polling:r1"]["run_at"] == now + s1

    assert out["polling:r2"]["resumed"]
    assert out["polling:r2"]["run_at"] == 940.0 + 120

    assert not out["polling:r3"]["resumed"]
    assert out["polling:r3"]["run_at"] == now + murmur3_x86_32("polling:r3") % 60

    s4 = murmur3_x86_32("polling:r4") % 20
    assert out["polling:r4"]["splay_s"] == s4 < 20


# -- F14: hostname / IP helpers ---------------------------------------------

def test_ip_version(spark):
    cases = {
        "10.0.0.1": 4, "255.255.255.255": 4, "0.0.0.0": 4,
        "fe80::1": 6, "::1": 6, "::": 6,
        "2001:db8:0:0:0:0:2:1": 6, "2001:db8::2:1": 6,
        "999.1.2.3": None, "10.0.0": None, "host.example.com": None,
        "1:2:3:4:5:6:7:8:9": None,
    }
    for val, exp in cases.items():
        assert one(spark, s.ip_version(F.col("v")), val) == exp, val


def test_unknown_hostname(spark):
    # helpers.py:123-135
    assert one(spark, s.unknown_hostname(F.col("v")), "10.1.2.3") == "unknown-10-1-2-3"
    assert one(spark, s.unknown_hostname(F.col("v")), "fe80::1") == "unknown-fe80--1"


def test_resolve_joins(spark):
    from panoptes_spark.operators.resolve import get_hostnames, resolve_hostnames

    dns = spark.createDataFrame(
        [("a.example.com", "10.0.0.1"), ("b.example.com", "10.0.0.2"),
         ("UNKNOWN-stale", "10.0.0.3")],
        "hostname string, address string",
    )
    hosts = spark.createDataFrame(
        [("a.example.com",), ("missing.example.com",)], "hostname string"
    )
    got = {r["hostname"]: r["address"]
           for r in resolve_hostnames(hosts, dns).collect()}
    assert got == {"a.example.com": "10.0.0.1", "missing.example.com": None}

    ips = spark.createDataFrame(
        [("10.0.0.1",), ("10.0.0.3",), ("10.9.9.9",)], "ip string"
    )
    got = {r["ip"]: r["resolved_hostname"]
           for r in get_hostnames(ips, dns).collect()}
    # reverse-resolved; 'UNKNOWN'-prefixed and missing both fall back
    assert got == {
        "10.0.0.1": "a.example.com",
        "10.0.0.3": "unknown-10-0-0-3",
        "10.9.9.9": "unknown-10-9-9-9",
    }


# -- O2: DSL result ordering -------------------------------------------------

def test_query_resources_ordered(spark):
    from panoptes_spark.dsl.resource_filter import query_resources

    df = spark.createDataFrame(
        [("r3", "network"), ("r1", "network"), ("r2", "system"), ("r0", "network")],
        "resource_id string, resource_class string",
    )
    out = query_resources(df, 'resource_class = "network"')
    assert [r["resource_id"] for r in out.collect()] == ["r0", "r1", "r3"]
