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
