"""InfluxDB line-protocol projection (P8) and batched sink (S12/A6/W4).

Reference: ``/root/reference/yahoo_panoptes/consumers/influxdb/consumer.py``
- tags = dimensions + 5 resource fields, sorted by name, escaped
  (',', '=', ' ' -> backslash-escaped), :103-144,146-158
- fields = ``{metric_name}__{metric_type}=value`` sorted, :123-142
- measurement = sanitized group_type (``[^0-9a-zA-Z_]+`` -> '_'), :84-87
- timestamp = int seconds, :160-169
- sink batching: emit when >= batch_size points or >= max_emit_interval
  seconds (defaults 200 / 15 s, ``influxdb_consumer_configspec.ini:14-15``)

The projection is a pure column expression (P8) — usable in batch or
streaming. The sink wraps it in foreachBatch with the trigger interval
playing the reference's emit-interval role; per-batch retry with
one-by-one degradation mirrors :305-394.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WRITE_API_BATCH_SIZE = 200  # influxdb_consumer_configspec.ini:14
WRITE_API_MAX_EMIT_INTERVAL = 15  # :15

METRICS_TYPE_SUPPORTED = ("gauge", "counter")  # consumer.py:27


def _esc(e: str) -> str:
    """Backslash-escape ','/'='/whitespace in a SQL string expression
    (the reference escapes with ``re.compile(r'([,=\\s])')``,
    consumer.py:146-158 — tag VALUES only, never keys)."""
    return f"regexp_replace({e}, '([,=\\\\s])', '\\\\\\\\$1')"


def _repr_num(e: str) -> str:
    """python ``{!r}`` of a metric value: integral floats print without
    the trailing '.0' (reference metric values are JSON numbers — ints
    repr as '5', floats as '5.0'; metric_value is double here, so
    integral values are rendered int-style, consumer.py:142)."""
    return (
        f"CASE WHEN {e} = floor({e}) AND abs({e}) < 9.007199254740992E15"
        f" THEN cast(cast({e} as bigint) as string)"
        f" ELSE cast({e} as string) END"
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def to_line_protocol(
    groups: DataFrame, float_typed: "set[str] | frozenset[str] | None" = None
) -> DataFrame:
    """Nested metrics groups -> one line-protocol string per group.

    measurement,tag1=v1,... field1__gauge=1,... ts_seconds

    Tag set matches the reference consumer (consumer.py:113-125):
    dimensions + resource_class/subclass/type/endpoint/site, sorted by
    key; only tag values are escaped. Fields keep only supported metric
    types (gauge/counter, consumer.py:139-140).

    ``float_typed`` names metrics the DSL declares ``type: float``
    (``MetricDSLCompiler.float_typed_metrics()``). The reference keeps the
    python int/float distinction through JSON, so ``repr`` of a float-typed
    metric with an integral value is ``5.0`` while an integer-typed one is
    ``5`` (consumer.py:142). The all-double metrics schema loses that bit;
    this reinstates it per metric name. Remaining accepted divergence:
    doubles outside plain-decimal range render Java-style (``1.0E-5``) vs
    python ``1e-05``.
    """
    # The reference builds a tags *dict* (dims first, then the five
    # resource fields overwrite on key collision, consumer.py:113-121) and
    # sorts items by key alone (consumer.py:123). So: drop dimensions whose
    # name collides with a resource tag key, sort structs by key (keys are
    # unique after the drop, so struct sort == key sort), then render.
    resource_tag_keys = (
        "'resource_site','resource_class','resource_subclass',"
        "'resource_type','resource_endpoint'"
    )
    tags = F.expr(
        "array_join(transform(array_sort("
        " concat(transform(filter(dimensions,"
        f"                        d -> NOT d.dimension_name IN ({resource_tag_keys})),"
        "                  d -> struct(d.dimension_name as k, d.dimension_value as v)),"
        "        array(struct('resource_site' as k, resource.resource_site as v),"
        "              struct('resource_class' as k, resource.resource_class as v),"
        "              struct('resource_subclass' as k, resource.resource_subclass as v),"
        "              struct('resource_type' as k, resource.resource_type as v),"
        "              struct('resource_endpoint' as k, resource.resource_endpoint as v)))),"
        f" t -> concat(t.k, '=', {_esc('t.v')})), ',')"
    )
    supported = ", ".join(f"'{t}'" for t in METRICS_TYPE_SUPPORTED)
    if float_typed:
        names = ", ".join(_sql_str(n) for n in sorted(float_typed))
        # float-typed: Java's Double.toString keeps the '.0' on integral
        # values, matching python repr in the plain-decimal range
        value_sql = (
            f"CASE WHEN m.metric_name IN ({names})"
            " THEN cast(m.metric_value as string)"
            f" ELSE {_repr_num('m.metric_value')} END"
        )
    else:
        value_sql = _repr_num("m.metric_value")
    # fields dict is likewise sorted by key = '{name}__{type}' (consumer.py:142)
    fields = F.expr(
        "array_join(transform(array_sort(transform("
        f" filter(metrics, m -> m.metric_type IN ({supported})),"
        " m -> struct(concat(m.metric_name, '__', m.metric_type) as k,"
        f"            {value_sql} as v))),"
        " f -> concat(f.k, '=', f.v)), ',')"
    )
    measurement = F.regexp_replace(
        F.col("metrics_group_type"), "[^0-9a-zA-Z_]+", "_"
    )
    ts = F.col("metrics_group_creation_timestamp").cast("long")
    return groups.withColumn(
        "line",
        F.concat(
            measurement, F.lit(","), tags, F.lit(" "), fields, F.lit(" "),
            ts.cast("string"),
        ),
    )


class InfluxBatchWriter:
    """foreachBatch sink with the reference's retry-then-degrade policy.

    ``send`` is injected (an HTTP POST in production; a file-append in
    tests) and MUST be picklable: emission happens executor-side via
    ``foreachPartition`` — each partition batches its own lines, so no
    driver collect and no driver OOM at scale. Batch failure retries
    whole; on final failure falls back to per-line emission, dropping
    only poisoned lines (consumer.py:305-394).
    """

    def __init__(self, send, batch_size: int = WRITE_API_BATCH_SIZE, retries: int = 3):
        self.send = send
        self.batch_size = batch_size
        self.retries = retries

    def __call__(self, df: DataFrame, epoch_id: int):
        # `self` is cloudpickled to the executors; the per-partition
        # closure carries only (send, batch_size, retries).
        emit = self._emit_partition
        to_line_protocol(df).select("line").foreachPartition(emit)

    def _emit_partition(self, rows) -> None:
        buf = []
        for r in rows:
            buf.append(r.line)
            if len(buf) >= self.batch_size:
                self._flush(buf)
                buf = []
        if buf:
            self._flush(buf)

    def _flush(self, chunk) -> None:
        if not self._send_with_retry(chunk):
            for line in chunk:  # degrade to one-by-one
                self._send_with_retry([line])

    def _send_with_retry(self, chunk) -> bool:
        for _ in range(self.retries):
            try:
                self.send(chunk)
                return True
            except Exception:
                continue
        return False
