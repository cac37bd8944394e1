"""Scalar function library (SURVEY §2.8, F1-F15) — column-expression
factories, all JVM-side built-ins (no Python UDFs).

Reference cites (file:line into /root/reference):
- F2  celsius->fahrenheit: ``framework/utilities/helpers.py:361-374``,
      transform lambda ``plugin_enrichment_juniper_device_metrics.py:331``
- F3  octets->bits: ``plugin_polling_device_interface_metrics.py:121-134``
- F4  MB->bytes / Mbps->bps: ``plugin_enrichment_juniper_device_metrics.py:107-113``,
      ``plugin_enrichment_interface.py:132-139``
- F5  /1000 sensor scale: ``plugin_polling_asr_device_metrics.py:184``
- F6  octet-string->MAC: ``framework/utilities/helpers.py:418-449``
- F7  netmask->CIDR: ``helpers.py:451-460``
- F8  IPv6 index transform: ``helpers.py:394-416``
- F9  influx measurement sanitize + escape: ``consumers/influxdb/consumer.py:84-87,146-158``
- F10 KV codec: ``framework/resources.py:558-611``
- F13 ifType -> media type: ``framework/utilities/snmp/mibs/ifTable.py``
- F15 temperature plausibility: ``framework/const.py:119`` (0 < v < 1371)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col):
    return F.col(col) if isinstance(col, str) else col


# -- unit conversions -------------------------------------------------------

def celsius_to_fahrenheit(col, zero_guard: bool = False) -> Column:
    """F2: round(c*1.8 + 32, 2); optional x==0 -> 0.0 guard variant."""
    c = _c(col)
    f = F.round(c * 1.8 + 32, 2)
    return F.when(c == 0, F.lit(0.0)).otherwise(f) if zero_guard else f


def octets_to_bits(col) -> Column:
    return _c(col).cast("long") * 8


def mb_to_bytes(col) -> Column:
    return _c(col).cast("long") * (1 << 20)


def mbps_to_bps(col) -> Column:
    return _c(col).cast("long") * 1_000_000


def milli_scale(col) -> Column:
    """F5: sensor value / 1000."""
    return _c(col).cast("double") / 1000.0


def temperature_plausible(col) -> Column:
    """F15: 0 < v < 1371 ('melting point of steel' guard)."""
    c = _c(col).cast("double")
    return (c > 0) & (c < 1371)


# -- network codecs ---------------------------------------------------------

def octets_to_mac(col: str) -> Column:
    """F6: 6-char latin1 octet string -> colon-hex MAC (per-char codepoint),
    UPPERCASE like the reference (helpers.py transform_octet_to_mac
    ``.upper()``; test vector 'E4:C7:22:DB:4A:08')."""
    return F.upper(
        F.array_join(
            F.expr(
                f"transform(sequence(1, 6),"
                f" i -> lpad(hex(ascii(substring({col}, i, 1))), 2, '0'))"
            ),
            ":",
        )
    )


def dotted_decimal_to_mac(col: str) -> Column:
    """F6b: '0.12.41.223.96.2' -> '00:0C:29:DF:60:02' (uppercase per
    helpers.py transform_dotted_decimal_to_mac; handles >6 parts like the
    reference test vector '...168.46.531' -> '...A8:2E:213')."""
    # NB: python zfill never truncates but Spark lpad does — guard >2-digit
    # hex (parts over 255, which the reference keeps verbatim)
    return F.upper(
        F.array_join(
            F.expr(
                f"transform(split({col}, '\\\\.'), p -> CASE"
                f" WHEN length(hex(cast(p as int))) >= 2 THEN hex(cast(p as int))"
                f" ELSE lpad(hex(cast(p as int)), 2, '0') END)"
            ),
            ":",
        )
    )


def netmask_to_cidr(col: str) -> Column:
    """F7: '255.255.255.0' -> 24 (bit_count of the 32-bit mask)."""
    return F.expr(
        f"bit_count(aggregate(split({col}, '\\\\.'),"
        " cast(0 as bigint), (acc, p) -> acc * 256 + cast(p as bigint)))"
    ).cast("int")


def ipv6_index_transform(col: str) -> Column:
    """F8: dotted-decimal SNMP index octets -> CANONICAL compressed IPv6
    (helpers.py transform_index_ipv6_address routes through
    ``ipaddress.ip_address``; test vector '254.128.0.0....' ->
    'fe80::5:73ff:fea0:3'): per-group leading zeros stripped, the first
    longest run of >=2 zero groups collapsed to '::' (RFC 5952, matching
    python's ipaddress formatting)."""
    grp = (
        f"lower(concat("
        f" lpad(hex(cast(element_at(split({col}, '\\\\.'), 2*i+1) as int)), 2, '0'),"
        f" lpad(hex(cast(element_at(split({col}, '\\\\.'), 2*i+2) as int)), 2, '0')))"
    )
    # strip leading zeros but keep a lone '0'
    trimmed = (
        "CASE WHEN regexp_replace(g, '^0+', '') = '' THEN '0'"
        " ELSE regexp_replace(g, '^0+', '') END"
    )
    addr = (
        f"array_join(transform(transform(sequence(0, 7), i -> {grp}),"
        f" g -> {trimmed}), ':')"
    )
    # collapse the first longest zero-group run (k = 8..2); regexes anchor
    # on ^/: boundaries so '10:0:...' never matches inside '10'
    cases = []
    for k in range(8, 1, -1):
        run = f"(^|:)0(:0){{{k - 1}}}(:|$)"
        pat = f"^(.*?)(^|:)0(:0){{{k - 1}}}(:|$)(.*)$"
        cases.append(
            f"WHEN a RLIKE '{run}' THEN"
            f" concat(regexp_extract(a, '{pat}', 1), '::',"
            f" regexp_extract(a, '{pat}', 5))"
        )
    compress = f"CASE {' '.join(cases)} ELSE a END"
    # bind `a` once via a 1-element transform (no lateral subquery is
    # allowed inside a column expression)
    return F.expr(f"element_at(transform(array({addr}), a -> {compress}), 1)")


# -- influx line-protocol helpers (F9) -------------------------------------

def sanitize_measurement(col) -> Column:
    """``[^0-9a-zA-Z_]+`` -> '_' (consumer.py:84-87)."""
    return F.regexp_replace(_c(col), "[^0-9a-zA-Z_]+", "_")


def escape_tag_value(col) -> Column:
    """Escape ',', '=', and any whitespace with backslash — the reference
    regex is ``([,=\\s])`` (consumer.py:146-158)."""
    return F.regexp_replace(_c(col), "([,=\\s])", "\\\\$1")


# -- KV codec (F10) ---------------------------------------------------------

def resource_to_kv_string(ts_col: str = "resource_creation_timestamp",
                          meta_col: str = "resource_metadata") -> Column:
    """'timestamp|<ts>|meta.<k>|<v>|...' with keys sorted
    (resources.py:558-569 pipe-delimited store value)."""
    return F.concat_ws(
        "|",
        F.lit("timestamp"),
        F.col(ts_col).cast("string"),
        F.expr(
            f"array_join(flatten(transform(array_sort(map_keys({meta_col})),"
            f" k -> array(concat('meta.', k), element_at({meta_col}, k)))), '|')"
        ),
    )


def kv_string_to_map(col: str) -> Column:
    """Inverse of the pipe codec: pairwise split back into a map
    (helpers.py:316-359)."""
    return F.expr(
        f"map_from_entries(transform(sequence(0, int(size(split({col}, '\\\\|')) / 2) - 1),"
        f" i -> struct(element_at(split({col}, '\\\\|'), 2*i+1),"
        f" element_at(split({col}, '\\\\|'), 2*i+2))))"
    )


# -- F13: ifType -> media type description ----------------------------------

# Subset of the IANA ifType registry the reference's MIB decode table covers
# (framework/utilities/snmp/mibs/ifTable.py getIfTypeDesc); extend as needed.
IF_TYPE_DESC = {
    1: "other", 6: "ethernetCsmacd", 24: "softwareLoopback", 53: "propVirtual",
    131: "tunnel", 135: "l2vlan", 136: "l3ipvlan", 161: "ieee8023adLag",
}


def if_type_desc(col) -> Column:
    m = F.create_map(
        *[x for k, v in IF_TYPE_DESC.items() for x in (F.lit(k), F.lit(v))]
    )
    return F.coalesce(
        F.element_at(m, _c(col).cast("int")), F.lit("unknown")
    )


# -- F14: hostname / IP helpers (helpers.py:99-178) -------------------------

# Strict dotted-quad (each octet 0-255). The reference's get_ip_version uses
# socket.inet_aton, which also accepts short/octal forms ("127.1"); those
# legacy forms never appear in panoptes endpoints and are rejected here.
_IPV4_RE = (
    r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"
)
# Well-formed hex groups with at most one '::' compression (inet_pton
# equivalent for the canonical textual forms; no embedded-IPv4 tail).
_IPV6_FULL_RE = r"^[0-9A-Fa-f]{1,4}(:[0-9A-Fa-f]{1,4}){7}$"
_IPV6_COMP_RE = (
    r"^(([0-9A-Fa-f]{1,4})(:[0-9A-Fa-f]{1,4}){0,6})?"
    r"::(([0-9A-Fa-f]{1,4})(:[0-9A-Fa-f]{1,4}){0,6})?$"
)


def ip_version(col) -> Column:
    """F14: 4 / 6 / NULL (reference raises ValueError; a column maps the
    error case to NULL). ``helpers.py:164-176``."""
    c = _c(col)
    v6 = c.rlike(_IPV6_FULL_RE) | (
        c.rlike(_IPV6_COMP_RE) & (F.length(c) - F.length(F.regexp_replace(c, ":", "")) <= 7)
    )
    return (
        F.when(c.rlike(_IPV4_RE), F.lit(4))
        .when(v6, F.lit(6))
        .otherwise(F.lit(None).cast("int"))
    )


def unknown_hostname(col) -> Column:
    """F14: unresolvable IP -> 'unknown-x-x-x-x' (``helpers.py:123-135``:
    ``'unknown-' + re.sub(r'[.:]', '-', ip)``)."""
    return F.concat(F.lit("unknown-"), F.regexp_replace(_c(col), r"[.:]", "-"))
