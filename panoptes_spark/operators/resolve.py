"""F14: hostname/IP resolution as resolver-snapshot joins.

The reference resolves hostnames with parallel gevent DNS calls
(``framework/utilities/helpers.py:99-121`` ``resolve_hostnames``,
``:137-161`` ``get_hostnames``). Per-row network calls from executors are
the wrong shape at 100 TB: the scalable equivalent is a broadcast join
against a resolver snapshot table (the same move the enrichment pipeline
makes for every other lookup). Semantics preserved:

- ``resolve_hostnames``: hostname -> address, unresolved -> NULL
  (the reference returns ``None`` for ``gaierror``).
- ``get_hostnames``: ip -> hostname; unresolved, empty, or
  ``'UNKNOWN'``-prefixed results fall back to ``unknown_hostname(ip)``
  = ``'unknown-' + re.sub('[.:]', '-', ip)`` (``helpers.py:146-160``).

The ``dns`` side carries ``(hostname, address)`` rows — in production a
periodically refreshed snapshot (e.g. from a zone export or a resolver
cache dump); in tests a fixture DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from panoptes_spark.functions.scalar import unknown_hostname


def resolve_hostnames(
    df: DataFrame,
    dns: DataFrame,
    hostname_col: str = "hostname",
    out_col: str = "address",
) -> DataFrame:
    """helpers.py:99-121: hostname -> address, NULL when unresolvable."""
    lookup = (
        dns.select(
            F.col("hostname").alias("__dns_host"),
            F.col("address").alias(out_col),
        )
        .dropDuplicates(["__dns_host"])
    )
    return df.join(
        F.broadcast(lookup), df[hostname_col] == lookup["__dns_host"], "left"
    ).drop("__dns_host")


def get_hostnames(
    df: DataFrame,
    dns: DataFrame,
    ip_col: str = "ip",
    out_col: str = "resolved_hostname",
) -> DataFrame:
    """helpers.py:137-161: ip -> hostname with the unknown-x-x-x-x
    fallback for unresolved / empty / 'UNKNOWN'-prefixed answers."""
    lookup = (
        dns.select(
            F.col("address").alias("__dns_addr"),
            F.col("hostname").alias("__dns_host"),
        )
        .dropDuplicates(["__dns_addr"])
    )
    joined = df.join(
        F.broadcast(lookup), df[ip_col] == lookup["__dns_addr"], "left"
    )
    bad = (
        F.col("__dns_host").isNull()
        | (F.col("__dns_host") == "")
        | F.col("__dns_host").startswith("UNKNOWN")
    )
    return joined.withColumn(
        out_col,
        F.when(bad, unknown_hostname(F.col(ip_col))).otherwise(F.col("__dns_host")),
    ).drop("__dns_addr", "__dns_host")
