"""Compiler for the Generic metric-computation DSL (§2.9) — Spark-first.

Reference engine: ``/root/reference/yahoo_panoptes/plugins/polling/generic/
snmp/plugin_polling_generic_snmp.py:71-762`` (doc ``docs/
Generic_SNMP_Polling_DSL.md``). The reference evaluates a JSON "program"
per device with per-index ``eval``; here the program compiles ONCE into a
DataFrame plan that runs for ALL devices in one go — the per-device loop
becomes a (device_id, index) equi-join fabric, which is the shape that
scales: shuffles are keyed by (device_id, index) and reused across targets,
and small OID tables broadcast.

Semantics preserved (file:line cites into the reference engine):

- shorthand + defaults normalization (:378-449): bare value -> {value},
  type inferred from int/float literals; metrics default type=integer,
  metric_type=gauge; dimensions default type=string.
- driving-index choice (:329-349): explicit ``indices`` > ``indices_from``
  table > first table referenced in the value expression.
- ``_has_indices`` (:351-376, v0.2 path).
- per-(index,target) eval failure -> that target absent at that index
  (:489-503); NULL from TRY_CAST/try_divide reproduces the skip.
- index_transform re-keying applied at table build (:205-209): matching
  raw indices re-keyed, unmatched KEEP their raw index.
- top-level targets: falsy value (0, '', None) dropped (:508-519 — the
  ``if not value: continue`` quirk).
- v0.2 assembly (:586-678): one group per (device, index) with >=1 indexed
  metric; top-level metrics appended INTO each indexed group; devices with
  no surviving indexed metrics get a single top-level-only group.
- empty-dimension suppression (:524-541,567-584): dimension_value == ''
  is never added; the group is suppressed unless ignore_empty_dimensions.
  DEVIATION: the reference's ``dimension_was_empty`` flag is sticky across
  the index loop (dict-order dependent — later indices of an unrelated
  group get suppressed); we evaluate per (device, index), which is the
  deterministic reading of the documented behavior.

The eval-arbitrary-Python escape hatch is NOT reproduced; expressions the
:mod:`metric_expr` translator rejects raise ``UnsupportedExpression`` and
can be routed to a pandas-UDF fallback by the caller.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .metric_expr import (
    ExprInfo,
    UnsupportedExpression,
    cast_sql,
    compile_transform,
    compile_value_expr,
    table_col,
)

_METRIC_DEFAULT_TYPE = "integer"
_DIMENSION_DEFAULT_TYPE = "string"


def _py_int(x):
    return int(x)


_PY_CASTS = {
    # python twins of metric_expr.CAST_SQL (reference _TYPE_MAPPING)
    **{k: _py_int for k in (
        "Integer", "Integer32", "UInteger32", "Counter32", "Counter64",
        "Gauge32", "TimeTicks", "integer", "int", "long")},
    **{k: float for k in ("float", "double")},
    **{k: str for k in (
        "Octet String", "Object Identifier", "Bit String", "IpAddress",
        "Opaque", "NsapAddress", "string", "str")},
}


def normalize_program(program: dict, schema_version: str = "0.2") -> dict:
    """Shorthand + defaults pass (reference :255-274, :378-449)."""
    prog = {"oids": dict(program.get("oids", {})), "metrics_groups": []}
    for group in program["metrics_groups"]:
        g = {
            "group_name": group["group_name"],
            "metrics": {},
            "dimensions": {},
            "ignore_empty_dimensions": group.get(
                "ignore_empty_dimensions", schema_version == "0.1"
            ),
        }
        for targets_type, default_type in (
            ("metrics", _METRIC_DEFAULT_TYPE),
            ("dimensions", _DIMENSION_DEFAULT_TYPE),
        ):
            for name, raw in group.get(targets_type, {}).items():
                tmap = dict(raw) if isinstance(raw, dict) else {"value": raw}
                if "type" not in tmap:
                    v = tmap.get("value")
                    if isinstance(v, bool):
                        # reference: isinstance(True, int) -> 'integer'
                        tmap["type"] = "integer"
                    elif isinstance(v, int):
                        tmap["type"] = "integer"
                    elif isinstance(v, float):
                        tmap["type"] = "float"
                    else:
                        tmap["type"] = default_type
                if targets_type == "metrics" and "metric_type" not in tmap:
                    tmap["metric_type"] = "gauge"
                g[targets_type][name] = tmap
        prog["metrics_groups"].append(g)
    return prog


@dataclass
class _Target:
    name: str
    tmap: dict
    info: ExprInfo | None
    final_sql: str | None  # cast+transform applied OVER the __raw column
    indexed: bool
    is_metric: bool
    mode: str = "sql"  # 'sql' (translated) | 'py' (safe-interpreter fallback)
    # statically-known type of the raw value when the target is a python
    # literal — lets the falsy-skip filter avoid a per-target schema
    # analysis round-trip
    raw_kind: str | None = None  # 'boolean' | 'numeric' | None


class MetricDSLCompiler:
    """Compile one DSL program against long-format OID tables.

    Parameters
    ----------
    oid_tables:
        DataFrame (device_id, table_name, index, value:string) — S3/S4
        sources in long form. ``get``-method oids are rows whose index is
        arbitrary (first value per device wins).
    static_devices:
        DataFrame (device_id) giving the device universe for static-only
        programs; defaults to ``oid_tables.select(device_id).distinct()``.
    """

    def __init__(
        self,
        spark: SparkSession,
        program: dict,
        oid_tables: DataFrame,
        interval_sec: int = 60,
        schema_version: str = "0.2",
        static_devices: DataFrame | None = None,
    ):
        self.spark = spark
        self.program = normalize_program(program, schema_version)
        self.oids_spec = self.program["oids"]
        self.oid_tables = oid_tables
        self.interval = interval_sec
        self.schema_version = schema_version
        self.known_tables = set(self.oids_spec.keys())
        self.scalar_oids = {
            n for n, s in self.oids_spec.items() if s.get("method") == "get"
        }
        self._devices = (
            static_devices
            if static_devices is not None
            else oid_tables.select("device_id").distinct()
        ).persist()
        self._table_cache: dict[str, DataFrame] = {}
        self._wide_cache: DataFrame | None = None
        self._scalars_cache: DataFrame | None = None

    # -- OID table materialization ---------------------------------------

    def _pivotable(self) -> list[str]:
        """Bulk-walk tables eligible for the one-pivot wide frame:
        dynamic (non-static, non-get) and no ``index_transform``
        (re-keying can collide indices, where dict last-write-wins
        semantics need the per-table long path)."""
        return sorted(
            n
            for n, s in self.oids_spec.items()
            if s["method"] not in ("static", "get")
            and not s.get("index_transform")
        )

    def wide(self) -> DataFrame | None:
        """ONE shuffle of the walk per program: pivot every plain
        bulk-walk table into (device_id, index, __t_<table>, ...).

        The per-target fabric previously re-joined the same
        (device_id, index)-keyed walk slice once per referenced table
        per target (p7_empty_dimension_policy planned 40 Exchanges);
        every target whose references live in this frame now compiles
        to a map-only projection over it — the shape proven in
        operators/interface_enrichment.py's walk pivot. At 100 TB the
        walk shuffles once, not once per OID table."""
        if self._wide_cache is not None:
            return self._wide_cache
        names = self._pivotable()
        if not names:
            return None
        w = (
            self.oid_tables.where(F.col("table_name").isin(names))
            .groupBy("device_id", "index")
            .pivot("table_name", names)
            .agg(F.max("value"))
        )
        for n in names:
            w = w.withColumnRenamed(n, table_col(n))
        self._wide_cache = w.persist()
        return self._wide_cache

    def _scalars_wide(self) -> DataFrame | None:
        """All get-method oids pivoted per device in one pass:
        (device_id, __t_<scalar>, ...) — a single device-dim join per
        target that references any scalar, instead of one join per
        scalar."""
        if self._scalars_cache is not None:
            return self._scalars_cache
        names = sorted(self.scalar_oids)
        if not names:
            return None
        s = (
            self.oid_tables.where(F.col("table_name").isin(names))
            .groupBy("device_id")
            .pivot("table_name", names)
            .agg(F.min("value"))
        )
        for n in names:
            s = s.withColumnRenamed(n, table_col(n))
        self._scalars_cache = s.persist()
        return self._scalars_cache

    def _static_value_col(self, name: str) -> F.Column:
        """A static table referenced at the current row's index is a map
        literal lookup — projection, no join (all devices share the
        same values dict)."""
        spec = self.oids_spec[name]
        if not spec["values"]:
            # empty static (cisco 4900M): create_map() is map<void,void>
            # and a string lookup on it fails analysis — every lookup is
            # a KeyError, i.e. NULL
            return F.lit(None).cast("string")
        m = F.create_map(
            *[
                F.lit(s)
                for k, v in spec["values"].items()
                for s in (str(k), str(v))
            ]
        )
        return m[F.col("index")]

    def table(self, name: str) -> DataFrame:
        """(device_id, index, value) for one oid table, index_transform
        applied (matching indices re-keyed, others kept — reference
        ``_build_map_by_bulk_walk``)."""
        if name in self._table_cache:
            return self._table_cache[name]
        spec = self.oids_spec[name]
        if spec["method"] == "static":
            # literal rows per device as an exploded array — a pure
            # projection (no crossJoin / broadcast exchange per table).
            # An EMPTY values map (cisco 4900M polling fixture) must
            # build a typed empty array: F.array() of zero literals is
            # array<void> and exploding it breaks downstream field
            # extraction.
            if not spec["values"]:
                entries = F.expr(
                    "cast(array() as"
                    " array<struct<index:string,value:string>>)"
                )
            else:
                entries = F.array(
                    *[
                        F.struct(
                            F.lit(str(k)).alias("index"),
                            F.lit(str(v)).alias("value"),
                        )
                        for k, v in spec["values"].items()
                    ]
                )
            df = self._devices.select(
                "device_id", F.explode(entries).alias("e")
            ).select("device_id", "e.index", "e.value")
        else:
            df = self.oid_tables.where(F.col("table_name") == name).select(
                "device_id", "index", "value"
            )
            it = spec.get("index_transform")
            if it:
                # re-key through a map literal: unmatched indices keep their
                # raw value (reference _build_map_by_bulk_walk) — projection
                # only, no join
                m = F.create_map(
                    *[
                        F.lit(s)
                        for k, v in it.items()
                        for s in (str(k), str(v))
                    ]
                )
                df = df.select(
                    "device_id",
                    F.coalesce(m[F.col("index")], F.col("index")).alias("index"),
                    "value",
                )
        # OID tables are device-dim sized and re-joined by every target that
        # references them — persist so the upstream scan/groupBy runs once
        df = df.persist()
        self._table_cache[name] = df
        return df

    def unpersist(self) -> None:
        """Release every frame this compiler persisted (devices, the
        wide pivot, per-table frames). Long-running callers that build
        one compiler per unit of work — the streaming polling pipeline's
        per-micro-batch compile — must call this after consuming the
        output, or cached blocks from dead batches linger in executor
        storage until GC + ContextCleaner get around to them."""
        self._devices.unpersist()
        if self._wide_cache is not None:
            self._wide_cache.unpersist()
            self._wide_cache = None
        if self._scalars_cache is not None:
            self._scalars_cache.unpersist()
            self._scalars_cache = None
        for df in self._table_cache.values():
            df.unpersist()
        self._table_cache.clear()

    def _cell_frame(self, name: str) -> DataFrame:
        """(device_id, index, value) carved from the program-wide pivot
        when the table lives there: a filter+projection that KEEPS the
        pivot's (device_id, index) hash partitioning, so downstream
        equi-joins between two pivot-carved frames plan with no new
        Exchange. Falls back to the per-table frame for static /
        index_transform / get tables."""
        if self.wide() is not None and name in self._pivotable():
            c = table_col(name)
            return (
                self.wide()
                .where(F.col(c).isNotNull())
                .select("device_id", "index", F.col(c).alias("value"))
            )
        return self.table(name)

    def scalar(self, name: str) -> DataFrame:
        """(device_id, value) for a get-method oid (one value per device)."""
        cached = self._table_cache.get(f"__scalar_{name}")
        if cached is not None:
            return cached
        df = self.oid_tables.where(F.col("table_name") == name)
        out = df.groupBy("device_id").agg(F.min("value").alias(table_col(name)))
        self._table_cache[f"__scalar_{name}"] = out
        return out

    # -- per-target compilation ------------------------------------------

    # v0.1 configs wrote bare words for these string dim values; the
    # reference quotes them before eval (_V1_STRING_LITERALS, :481-483)
    _V1_STRING_LITERALS = ("data", "ctrl", "dram")

    def _compile_target(self, name: str, tmap: dict, is_metric: bool) -> _Target:
        if (
            self.schema_version == "0.1"
            and isinstance(tmap.get("value"), str)
            and tmap["value"] in self._V1_STRING_LITERALS
        ):
            tmap = dict(tmap, value="'" + tmap["value"] + "'")
        try:
            info = compile_value_expr(
                tmap["value"], self.known_tables, self.scalar_oids
            )
            # The raw expression is evaluated ONCE into a __raw column; the
            # cast+transform chain is built over that column so a transform
            # that references its argument k times doesn't inline (and
            # re-execute) the whole raw expression k times.
            sql = cast_sql("__raw", tmap["type"])
            info.hazards.append(sql)  # the final cast may itself fail
            if "transform" in tmap:
                sql = compile_transform(
                    tmap["transform"], sql, self.known_tables,
                    self.scalar_oids, info=info,
                )
            indexed = self._has_indices(tmap, info)
            v = tmap["value"]
            if isinstance(v, bool):
                raw_kind = "boolean"
            elif isinstance(v, (int, float)):
                raw_kind = "numeric"
            else:
                raw_kind = None
            return _Target(
                name, tmap, info, sql, indexed, is_metric, raw_kind=raw_kind
            )
        except UnsupportedExpression:
            # pandas-UDF fallback (safe AST interpreter — never eval)
            indexed = self._has_indices_raw(tmap)
            return _Target(name, tmap, None, None, indexed, is_metric, mode="py")

    def _has_indices_raw(self, tmap: dict) -> bool:
        """_has_indices for untranslatable expressions (raw-string check,
        mirrors reference :351-376)."""
        if "indices" in tmap or "indices_from" in tmap:
            return True
        if "$index" not in str(tmap["value"]):
            return False
        return self._first_table(str(tmap["value"])) is not None

    def _has_indices(self, tmap: dict, info: ExprInfo) -> bool:
        # reference :351-376
        if self.schema_version == "0.1":
            if "top_level" in tmap:
                return False
            if ("indices" in tmap and "evaluate" not in tmap) or "indices_from" in tmap:
                return True
        elif "indices" in tmap or "indices_from" in tmap:
            return True
        if not info.uses_index:
            return False
        first = self._first_table(str(tmap["value"]))
        return first is not None

    def _first_table(self, raw_value: str):
        import re

        for m in re.finditer(r"(\w+)\.\$index", raw_value):
            if m.group(1) in self.known_tables:
                return m.group(1)
        return None

    def _driving_frame(self, t: _Target) -> DataFrame:
        tmap = t.tmap
        if "indices" in tmap:
            idx = self.spark.createDataFrame(
                [(str(i),) for i in tmap["indices"]], "index string"
            )
            return self._devices.crossJoin(F.broadcast(idx))
        if "indices_from" in tmap:
            return self._cell_frame(tmap["indices_from"]).select(
                "device_id", "index"
            )
        first = self._first_table(str(tmap["value"]))
        return self._cell_frame(first).select("device_id", "index")

    def _indexed_values(self, t: _Target) -> DataFrame:
        """(device_id, index, value) for an indexed target; NULL values
        (eval failure equivalents) dropped.

        Plan shape: the driving rows and every plain bulk-walk reference
        come from the ONE program-wide pivot (:func:`wide`) — a filter +
        projection, no join. Only non-pivotable references still join:
        static tables become map-literal lookups (projection), transform
        tables keep their per-table frame, and all scalars arrive in a
        single device-dim join."""
        if t.mode == "py":
            return self._indexed_values_py(t)
        if t.info.is_aggregate:
            return self._indexed_aggregate_values(t)
        tmap = t.tmap
        pivot_set = set(self._pivotable())
        tables = sorted(t.info.tables)
        walk_refs = [x for x in tables if x in pivot_set]
        scalar_refs = [x for x in tables if x in self.scalar_oids]
        other_refs = [
            x for x in tables if x not in pivot_set and x not in self.scalar_oids
        ]

        def from_wide(driving: str | None) -> DataFrame:
            """Rows of the wide frame driven by ``driving``'s presence
            (a pivot cell is non-null iff the walk had that row)."""
            w = self.wide()
            if driving is not None:
                w = w.where(F.col(table_col(driving)).isNotNull())
            return w

        if "indices" in tmap:
            idx = self.spark.createDataFrame(
                [(str(i),) for i in tmap["indices"]], "index string"
            )
            df = self._devices.crossJoin(F.broadcast(idx))
            if walk_refs:
                df = df.join(self.wide(), ["device_id", "index"], "left")
        elif "indices_from" in tmap:
            src = tmap["indices_from"]
            if src in pivot_set:
                df = from_wide(src)
            else:
                df = self.table(src).select("device_id", "index")
                if walk_refs:
                    df = df.join(self.wide(), ["device_id", "index"], "left")
        else:
            first = self._first_table(str(tmap["value"]))
            if first in pivot_set:
                df = from_wide(first)
            else:
                df = self.table(first).select("device_id", "index")
                if walk_refs:
                    df = df.join(self.wide(), ["device_id", "index"], "left")

        for tbl in other_refs:
            if self.oids_spec[tbl]["method"] == "static":
                df = df.withColumn(table_col(tbl), self._static_value_col(tbl))
            else:  # index_transform table: per-table long frame
                tv = self.table(tbl).withColumnRenamed("value", table_col(tbl))
                df = df.join(tv, ["device_id", "index"], "left")
        if scalar_refs:
            df = df.join(self._scalars_wide(), "device_id", "left")
        df = self._join_subscripts(df, t.info)
        df = self._join_member_flags(df, t.info, key_scope="index")
        df = df.withColumn("__raw", F.expr(t.info.sql))  # single evaluation
        out = df.select(
            "device_id", "index", F.expr(self._guarded_sql(t)).alias("value")
        ).where(F.col("value").isNotNull())
        return out

    def _direct_cond(self, t: _Target) -> str | None:
        """Driving-presence SQL condition for a wide-direct target, or
        None when the target cannot be evaluated as a pure projection of
        :func:`wide` (literal index lists, py-mode fallbacks, transform
        tables, or membership tests keyed on anything but ``index``)."""
        if t.mode != "sql" or t.info is None:
            return None
        if t.info.is_aggregate or t.info.subscripts:
            return None  # these need the aggregate / subscript-join plans
        pivot = set(self._pivotable())
        tmap = t.tmap
        if "indices" in tmap:
            return None
        if "indices_from" in tmap:
            driving = tmap["indices_from"]
        else:
            driving = self._first_table(str(tmap["value"]))
        if driving not in pivot:
            return None
        for tbl in t.info.tables:
            if tbl in self.scalar_oids or tbl in pivot:
                continue
            if self.oids_spec[tbl]["method"] == "static":
                continue
            return None  # index_transform table: needs the long path
        for tbl, left_sql in t.info.member_tables:
            if left_sql != "index" or tbl not in pivot:
                return None
        return f"{table_col(driving)} IS NOT NULL"

    def _idx_groups_direct(
        self, idx_metrics: list, idx_dims: list
    ) -> DataFrame | None:
        """Every indexed target of a group as a projection of the ONE
        program-wide pivot: returns (device_id, index, _m, _d,
        _had_empty) with zero shuffles beyond the pivot itself (plus a
        single device-dim join when the program reads get-oids).

        Each target's driving frame becomes a presence condition on its
        driving table's pivot cell; membership flags keyed on ``index``
        become IS NOT NULL tests; static tables become map literals.
        Returns None when any target needs the legacy per-target
        union fabric (_union_long)."""
        targets = idx_metrics + idx_dims
        if self.wide() is None:
            return None
        conds = []
        for t in targets:
            c = self._direct_cond(t)
            if c is None:
                return None
            conds.append(c)

        pivot = set(self._pivotable())
        w = self.wide()
        statics = {
            tbl
            for t in targets
            for tbl in t.info.tables
            if tbl not in self.scalar_oids and tbl not in pivot
        }
        for tbl in sorted(statics):
            w = w.withColumn(table_col(tbl), self._static_value_col(tbl))
        if any(
            tbl in self.scalar_oids for t in targets for tbl in t.info.tables
        ):
            w = w.join(self._scalars_wide(), "device_id", "left")
        members = {tbl for t in targets for tbl, _ in t.info.member_tables}
        for tbl in sorted(members):
            w = w.withColumn(
                f"__in_{tbl}", F.col(table_col(tbl)).isNotNull()
            )

        m_entries, d_entries = [], []
        for i, (t, cond) in enumerate(zip(targets, conds)):
            raw_alias = f"__tr{i}"
            w = w.withColumn(raw_alias, F.expr(t.info.sql))
            guarded = self._guarded_sql(t).replace("__raw", raw_alias)
            val = F.when(F.expr(cond), F.expr(guarded))
            if t.is_metric:
                m_entries.append(
                    F.struct(
                        F.lit(t.name).alias("name"),
                        val.cast("double").alias("value"),
                    )
                )
            else:
                d_entries.append(
                    F.struct(
                        F.lit(t.name).alias("name"),
                        val.cast("string").alias("value"),
                    )
                )

        keep = lambda s: s["value"].isNotNull()  # noqa: E731
        d_arr = (
            F.filter(F.array(*d_entries), keep)
            if d_entries
            else F.expr(
                "cast(array() as array<struct<name:string,value:string>>)"
            )
        )
        return (
            w.select(
                "device_id",
                "index",
                F.filter(F.array(*m_entries), keep).alias("_m"),
                d_arr.alias("_d"),
            )
            .withColumn(
                "_had_empty", F.exists("_d", lambda s: s["value"] == "")
            )
            .where(F.size("_m") > 0)
        )

    def _join_subscripts(self, df: DataFrame, info) -> DataFrame:
        """Left-join one column per table SUBSCRIPT (``pmt[x]``): value
        of ``tname`` at the computed key; NULL = python KeyError (the
        translator hazard-scopes the lookup, so guarded lookups never
        poison)."""
        for i, ((tname, key_sql), col) in enumerate(
            sorted(info.subscripts.items())
        ):
            keycol = f"__skey_{i}"
            tv = self._cell_frame(tname).select(
                "device_id",
                F.col("index").alias(keycol),
                F.col("value").alias(col),
            )
            df = (
                df.withColumn(keycol, F.expr(key_sql))
                .join(tv, ["device_id", keycol], "left")
                .drop(keycol)
            )
        return df

    def _indexed_aggregate_values(self, t: _Target) -> DataFrame:
        """Indexed AGGREGATE target (juniper power_units_on): a
        count-comprehension whose filter references the DRIVING index
        (``indices_from``), re-evaluated per (device, index).

        Plan: driving frame × the (device-dim) aggregate table, filter
        per pair, count per (device, index). The cross product is
        dim × dim per device — bounded, never corpus-sized. Per-element
        hazards poison the (device, index) pair like python's raise
        aborting that index's evaluation."""
        info = t.info
        driving = self._driving_frame(t)
        base = self._cell_frame(info.agg_table).select(
            "device_id",
            F.col("index").alias("__agg_index"),
            F.col("value").alias("__agg_value"),
        )
        base = self._join_subscripts(base, info)
        base = self._join_member_flags(base, info, key_scope="agg")
        # driving and agg frames share the walk's lineage -> alias both
        # sides so the device-keyed cross join resolves unambiguously
        d = driving.alias("__drv")
        b = base.alias("__aggt")
        cross = d.join(
            b, F.col("__drv.device_id") == F.col("__aggt.device_id"), "left"
        ).select(
            F.col("__drv.device_id").alias("device_id"),
            F.col("__drv.index").alias("index"),
            *[
                F.col(f"__aggt.{c}")
                for c in base.columns
                if c != "device_id"
            ],
        )
        # row hazards may reference the DRIVING index ($index in the
        # filter) -> evaluate after the cross join
        if info.agg_row_hazards:
            row_poison = " OR ".join(
                f"({h}) IS NULL" for h in info.agg_row_hazards
            )
            cross = cross.withColumn("__row_hz", F.expr(row_poison))
        else:
            cross = cross.withColumn("__row_hz", F.lit(False))
        counted = (
            cross.groupBy("device_id", "index")
            .agg(
                F.sum(
                    F.when(F.expr(info.agg_filter_sql), 1).otherwise(0)
                ).alias("__agg_count"),
                F.max(F.coalesce("__row_hz", F.lit(False))).alias(
                    "__poisoned"
                ),
            )
            .where(~F.col("__poisoned"))
            .withColumn(
                "__agg_count", F.coalesce("__agg_count", F.lit(0))
            )
        )
        df = counted.withColumn("__raw", F.expr(info.sql))
        return df.select(
            "device_id", "index",
            F.expr(self._guarded_sql(t)).alias("value"),
        ).where(F.col("value").isNotNull())

    def _guarded_sql(self, t: _Target) -> str:
        """Wrap the value expression in the error-poison guard: a python
        error in any EVALUATED sub-expression (missing table key, failed
        cast, division by zero) skips the index — but laziness is
        honored: hazards inside un-taken ternary branches are absorbed by
        the translator's scoped CASE composition, so only root-scope
        hazards appear here."""
        poisons = [f"({h}) IS NULL" for h in t.info.hazards]
        if not poisons:
            return t.final_sql
        return (
            f"CASE WHEN {' OR '.join(poisons)} THEN NULL"
            f" ELSE ({t.final_sql}) END"
        )

    # -- pandas-UDF fallback paths ---------------------------------------

    def _ref_tables(self, raw_value: str) -> list[str]:
        import re

        found = []
        for m in re.finditer(r"(\w+)\.\$index", str(raw_value)):
            if m.group(1) in self.known_tables and m.group(1) not in found:
                found.append(m.group(1))
        return found

    def _indexed_values_py(self, t: _Target) -> DataFrame:
        """Fallback: join referenced tables then interpret the expression
        per row with the whitelist AST interpreter (Arrow-batched)."""
        import re
        from collections.abc import Iterator

        import pandas as pd

        from .safe_eval import compile_safe_lambda, safe_eval

        raw = str(t.tmap["value"])
        tables = self._ref_tables(raw)
        df = self._driving_frame(t)
        for tbl in tables:
            tv = self.table(tbl).withColumnRenamed("value", f"__v_{tbl}")
            df = df.join(tv, ["device_id", "index"], "left")

        py_expr = re.sub(r"(\w+)\.\$index", lambda m: f"__v_{m.group(1)}", raw)
        py_expr = py_expr.replace("$index", "__idx")
        caster = _PY_CASTS[t.tmap["type"]]
        transform = (
            compile_safe_lambda(t.tmap["transform"])
            if "transform" in t.tmap
            else (lambda x: x)
        )
        cols = [f"__v_{tbl}" for tbl in tables]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_vals = []
                for i in range(len(pdf)):
                    env = {"__idx": pdf["index"].iloc[i]}
                    for c in cols:
                        env[c] = pdf[c].iloc[i]
                    try:
                        v = transform(caster(safe_eval(py_expr, env)))
                    except Exception:
                        v = None
                    out_vals.append(None if v is None else str(v))
                yield pd.DataFrame(
                    {
                        "device_id": pdf["device_id"],
                        "index": pdf["index"],
                        "value": pd.Series(out_vals, dtype="object"),
                    }
                )

        out = df.mapInPandas(
            run, schema="device_id string, index string, value string"
        )
        return out.where(F.col("value").isNotNull())

    def _top_level_value_py(self, t: _Target) -> DataFrame:
        """Fallback top-level target: per-device table dicts -> interpreter."""
        import re
        from collections.abc import Iterator

        import pandas as pd

        from .safe_eval import compile_safe_lambda, safe_eval

        raw = str(t.tmap["value"])
        tables = [
            tbl
            for tbl in sorted(self.known_tables)
            if re.search(rf"\b{re.escape(tbl)}\b", raw)
        ]
        df = self._devices
        for tbl in tables:
            m = (
                self.table(tbl)
                .groupBy("device_id")
                .agg(
                    F.map_from_entries(
                        # sorted: .items() iteration in the interpreter
                        # must not depend on task scheduling order
                        F.array_sort(
                            F.collect_list(F.struct("index", "value"))
                        )
                    ).alias(f"__m_{tbl}")
                )
            )
            df = df.join(m, "device_id", "left")

        caster = _PY_CASTS[t.tmap["type"]]
        transform = (
            compile_safe_lambda(t.tmap["transform"])
            if "transform" in t.tmap
            else (lambda x: x)
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out_vals = []
                for i in range(len(pdf)):
                    env = {}
                    for tbl in tables:
                        v = pdf[f"__m_{tbl}"].iloc[i]
                        env[tbl] = dict(v) if v is not None else {}
                    try:
                        v = safe_eval(raw, env)
                        if not v:  # reference falsy skip
                            v = None
                        else:
                            v = transform(caster(v))
                    except Exception:
                        v = None
                    out_vals.append(None if v is None else str(v))
                yield pd.DataFrame(
                    {
                        "device_id": pdf["device_id"],
                        "value": pd.Series(out_vals, dtype="object"),
                    }
                )

        out = df.mapInPandas(run, schema="device_id string, value string")
        return out.where(F.col("value").isNotNull())

    def _member_keys(self, tbl: str) -> DataFrame:
        """(device_id, index) key set of a table for membership flags —
        carved out of the program-wide pivot when the table lives there
        (reuses the one walk shuffle) instead of re-scanning the walk."""
        if tbl in self._pivotable():
            return self.wide().where(
                F.col(table_col(tbl)).isNotNull()
            ).select("device_id", "index")
        return self.table(tbl).select("device_id", "index")

    def _join_member_flags(
        self, df: DataFrame, info: ExprInfo, key_scope: str
    ) -> DataFrame:
        for tbl, left_sql in sorted(info.member_tables):
            # The key frame shares the walk's lineage with ``df`` (both
            # derive from the same pivot), so drop-by-Column after a
            # self-join is a no-op and leaves a duplicate device_id that
            # poisons downstream aliases (AMBIGUOUS_REFERENCE). Rename
            # the lookup side's key BEFORE joining and drop it by name.
            keys = (
                self._member_keys(tbl)
                .select(
                    F.col("device_id").alias("__mk_dev"),
                    F.col("index").alias("__mk"),
                )
                .distinct()
                .withColumn(f"__in_{tbl}", F.lit(True))
            )
            df = df.join(
                keys,
                (F.col("device_id") == F.col("__mk_dev"))
                & (F.expr(left_sql) == F.col("__mk")),
                "left",
            ).drop("__mk_dev", "__mk")
            df = df.withColumn(
                f"__in_{tbl}", F.coalesce(F.col(f"__in_{tbl}"), F.lit(False))
            )
        return df

    def _top_level_value(self, t: _Target) -> DataFrame:
        """(device_id, value) for a top-level target; falsy values dropped
        (reference ``if not value: continue``)."""
        if t.mode == "py":
            return self._top_level_value_py(t)
        info = t.info
        if info.is_aggregate:
            base = self._cell_frame(info.agg_table).select(
                "device_id",
                F.col("index").alias("__agg_index"),
                F.col("value").alias("__agg_value"),
            )
            base = self._join_member_flags(base, info, key_scope="agg")
            # python evaluates the comprehension filter for EVERY element;
            # one raise aborts the whole aggregate for that device
            if info.agg_row_hazards:
                row_poison = " OR ".join(
                    f"({h}) IS NULL" for h in info.agg_row_hazards
                )
                base = base.withColumn("__row_hz", F.expr(row_poison))
            else:
                base = base.withColumn("__row_hz", F.lit(False))
            counted = (
                base.groupBy("device_id")
                .agg(
                    F.sum(
                        F.when(F.expr(info.agg_filter_sql), 1).otherwise(0)
                    ).alias("__agg_count"),
                    F.max("__row_hz").alias("__poisoned"),
                )
                .where(~F.col("__poisoned"))
            )
            # info.sql for an aggregate is the '__agg_count' placeholder
            df = counted.withColumn("__raw", F.expr(t.info.sql)).select(
                "device_id", F.expr(t.final_sql).alias("value"), "__raw"
            )
            raw_kind = "numeric"  # len([...]) is always an int
        else:
            df = self._devices
            for tbl in sorted(info.tables):
                if tbl in self.scalar_oids:
                    df = df.join(self.scalar(tbl), "device_id", "left")
                else:
                    raise UnsupportedExpression(
                        f"top-level target {t.name!r} references per-index "
                        f"table {tbl!r} without $index"
                    )
            # raw pre-cast/transform value, evaluated ONCE: the reference
            # applies the falsy skip to the eval result BEFORE cast/
            # transform (:508-519), so `0.4` with type integer keeps
            # metric 0 and a transform yielding 0 is kept
            df = df.withColumn("__raw", F.expr(t.info.sql)).select(
                "device_id", F.expr(self._guarded_sql(t)).alias("value"), "__raw"
            )
            raw_kind = t.raw_kind
        # falsy skip on the RAW value (python `if not value: continue`):
        # numeric 0/0.0 and '' are falsy; a non-empty string — including
        # '0' — is truthy. NULL raw means an evaluated sub-expression
        # raised -> dropped either way. The raw type is known statically
        # for literal/aggregate targets; only expression targets pay a
        # schema analysis.
        if raw_kind is None:
            raw_kind = {
                "boolean": "boolean", "string": "string"
            }.get(dict(df.dtypes)["__raw"], "numeric")
        raw = F.col("__raw")
        if raw_kind == "boolean":
            truthy = raw
        elif raw_kind == "string":
            truthy = raw != ""
        else:
            truthy = raw.cast("double") != 0.0
        return df.where(
            F.col("value").isNotNull() & raw.isNotNull() & truthy
        ).drop("__raw")

    # -- group assembly ---------------------------------------------------

    def compile_group(self, group: dict) -> DataFrame:
        """One metrics_group -> DataFrame of nested groups:
        (device_id, metrics_group_type, metrics array, dimensions array,
        metrics_group_interval)."""
        targets: list[_Target] = []
        for name, tmap in group["metrics"].items():
            targets.append(self._compile_target(name, tmap, True))
        for name, tmap in group["dimensions"].items():
            targets.append(self._compile_target(name, tmap, False))

        idx_metrics = [t for t in targets if t.is_metric and t.indexed]
        idx_dims = [t for t in targets if not t.is_metric and t.indexed]
        top_metrics = [t for t in targets if t.is_metric and not t.indexed]
        top_dims = [t for t in targets if not t.is_metric and not t.indexed]

        mtype = {
            t.name: t.tmap["metric_type"] for t in targets if t.is_metric
        }

        # ---- top-level per-device arrays — groups with NO top-level
        # targets (common: all-indexed vendor programs) take literal
        # empty arrays instead of joining empty frames (each empty join
        # still planned a 2-exchange SMJ)
        _EMPTY_M = (
            "cast(array() as array<struct<metric_name:string,"
            "metric_value:double,metric_type:string,"
            "metric_creation_timestamp:double>>)"
        )
        _EMPTY_D = (
            "cast(array() as array<struct<dimension_name:string,"
            "dimension_value:string>>)"
        )
        has_top = bool(top_metrics or top_dims)
        top = self._devices
        if top_metrics:
            top = top.join(
                self._collect_long(
                    top_metrics,
                    value_type="double",
                    mtype=mtype,
                    colname="top_metrics",
                ),
                "device_id",
                "left",
            ).withColumn(
                "top_metrics", F.coalesce("top_metrics", F.expr(_EMPTY_M))
            )
        else:
            top = top.withColumn("top_metrics", F.expr(_EMPTY_M))
        if top_dims:
            top = top.join(
                self._collect_long(
                    top_dims, value_type="string", mtype=None,
                    colname="top_dims",
                ),
                "device_id",
                "left",
            ).withColumn(
                "top_dims", F.coalesce("top_dims", F.expr(_EMPTY_D))
            )
        else:
            top = top.withColumn("top_dims", F.expr(_EMPTY_D))
        # empty-string dims never reach the arrays (skipped at _top_level_value)

        interval = F.lit(self.interval).cast("long")
        gname = F.lit(group["group_name"])

        if idx_metrics:
            base = self._idx_groups_direct(idx_metrics, idx_dims)
            if base is None:  # legacy per-target union fabric
                long_m = self._union_long(idx_metrics, "double")
                # array_sort: collect_list order is task-scheduling-
                # dependent, and MetricsGroupSet's dropDuplicates
                # compares these arrays order-sensitively
                groups_m = long_m.groupBy("device_id", "index").agg(
                    F.array_sort(
                        F.collect_list(F.struct("name", "value"))
                    ).alias("_m")
                )
                if idx_dims:
                    long_d = self._union_long(idx_dims, "string")
                    groups_d = long_d.groupBy("device_id", "index").agg(
                        F.array_sort(
                            F.collect_list(F.struct("name", "value"))
                        ).alias("_d"),
                        F.max(F.col("value") == "").alias("_had_empty"),
                    )
                    base = groups_m.join(
                        groups_d, ["device_id", "index"], "left"
                    )
                else:
                    base = groups_m.withColumn(
                        "_d",
                        F.expr(
                            "cast(array() as array<struct<name:string,value:string>>)"
                        ),
                    ).withColumn("_had_empty", F.lit(False))
            if has_top:
                idx_groups = base.join(top, "device_id", "left")
            else:  # nothing to merge: skip the device-keyed join
                idx_groups = base.withColumn(
                    "top_metrics", F.expr(_EMPTY_M)
                ).withColumn("top_dims", F.expr(_EMPTY_D))

            mtype_map = F.create_map(
                *[x for k, v in mtype.items() for x in (F.lit(k), F.lit(v))]
            ) if mtype else F.create_map()

            metrics_arr = F.expr(
                "transform(_m, s -> struct(s.name as metric_name,"
                " cast(s.value as double) as metric_value,"
                " element_at(_mtype, s.name) as metric_type,"
                " cast(0.0 as double) as metric_creation_timestamp))"
            )
            dims_arr = F.expr(
                "transform(filter(coalesce(_d, array()), s -> s.value != ''),"
                " s -> struct(s.name as dimension_name,"
                " s.value as dimension_value))"
            )
            # v0.2 merges top-level metrics into every indexed group
            # (:624-655); v0.1 emits them as a separate group instead
            merged_metrics = (
                F.concat(metrics_arr, F.col("top_metrics"))
                if self.schema_version != "0.1"
                else metrics_arr
            )
            out = (
                idx_groups.withColumn("_mtype", mtype_map)
                .withColumn("metrics", merged_metrics)
                .withColumn("dimensions", F.concat(dims_arr, F.col("top_dims")))
                .withColumn(
                    "_suppress",
                    F.coalesce("_had_empty", F.lit(False))
                    & F.lit(not group["ignore_empty_dimensions"]),
                )
                .where(~F.col("_suppress"))
                .select(
                    "device_id",
                    gname.alias("metrics_group_type"),
                    interval.alias("metrics_group_interval"),
                    "metrics",
                    "dimensions",
                )
            )
            if self.schema_version == "0.1":
                # v0.1: one separate top-level group per device with >=1
                # top metric (:644-655), alongside the indexed groups
                top_src = top.where(F.expr("size(top_metrics) > 0"))
            else:
                # v0.2: devices with no surviving indexed metrics get the
                # top-level-only group (reference else-branch :657-678)
                # the anti side is one distinct device_id column (dim-
                # sized even at fleet scale): broadcast it so the top
                # frame never shuffle-sorts for the fallback check
                top_src = top.join(
                    F.broadcast(base.select("device_id").distinct()),
                    "device_id",
                    "left_anti",
                )
            top_only = top_src.select(
                "device_id",
                gname.alias("metrics_group_type"),
                interval.alias("metrics_group_interval"),
                F.col("top_metrics").alias("metrics"),
                # the reference's fallback branch attaches top-level
                # dims ONLY when top-level metrics exist (:661-668);
                # a metric-less fallback group is fully empty
                F.when(
                    F.expr("size(top_metrics) > 0"), F.col("top_dims")
                ).otherwise(F.expr(_EMPTY_D)).alias("dimensions"),
            )
            return out.unionByName(top_only)

        # group with no indexed metric targets: one top-level group per
        # device (v0.1 additionally requires non-empty metrics)
        top_src = (
            top.where(F.expr("size(top_metrics) > 0"))
            if self.schema_version == "0.1"
            else top
        )
        return top_src.select(
            "device_id",
            gname.alias("metrics_group_type"),
            interval.alias("metrics_group_interval"),
            F.col("top_metrics").alias("metrics"),
            # same fallback rule as above: dims ride only with metrics
            F.when(
                F.expr("size(top_metrics) > 0"), F.col("top_dims")
            ).otherwise(F.expr(_EMPTY_D)).alias("dimensions"),
        )

    def _union_long(self, targets: list[_Target], value_type: str) -> DataFrame:
        dfs = []
        for t in targets:
            v = self._indexed_values(t)
            dfs.append(
                v.select(
                    "device_id",
                    "index",
                    F.lit(t.name).alias("name"),
                    F.col("value").cast(value_type).alias("value"),
                ).where(F.col("value").isNotNull())
            )
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def _collect_long(
        self, targets: list[_Target], value_type: str, mtype, colname: str
    ) -> DataFrame:
        """Per-device array of top-level targets (metrics get their type)."""
        if not targets:
            if value_type == "double":
                schema = (
                    "device_id string, "
                    f"{colname} array<struct<metric_name:string,"
                    "metric_value:double,metric_type:string,"
                    "metric_creation_timestamp:double>>"
                )
            else:
                schema = (
                    "device_id string, "
                    f"{colname} array<struct<dimension_name:string,"
                    "dimension_value:string>>"
                )
            return self.spark.createDataFrame([], schema)
        dfs = []
        for t in targets:
            v = self._top_level_value(t)
            if value_type == "double":
                row = F.struct(
                    F.lit(t.name).alias("metric_name"),
                    F.col("value").cast("double").alias("metric_value"),
                    F.lit(mtype[t.name]).alias("metric_type"),
                    F.lit(0.0).alias("metric_creation_timestamp"),
                )
            else:
                row = F.struct(
                    F.lit(t.name).alias("dimension_name"),
                    F.col("value").cast("string").alias("dimension_value"),
                )
            dfs.append(v.select("device_id", row.alias("entry")))
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        # sorted: entry structs lead with the name field, so array_sort
        # yields a deterministic order where collect_list alone follows
        # task scheduling — dropDuplicates set-collapse needs stability
        return out.groupBy("device_id").agg(
            F.array_sort(F.collect_list("entry")).alias(colname)
        )

    def float_typed_metrics(self) -> frozenset:
        """Metric names the program declares ``type: float`` — the set
        ``to_line_protocol`` needs to render python-``repr``-faithful
        field values (float-typed integral values keep their '.0',
        consumer.py:142; the all-double metrics schema otherwise loses
        the int/float distinction)."""
        return frozenset(
            name
            for g in self.program["metrics_groups"]
            for name, tmap in g["metrics"].items()
            if _PY_CASTS.get(tmap["type"]) is float
        )

    def compile(self) -> DataFrame:
        """All metrics_groups unioned, canonical array order applied."""
        outs = [
            self.compile_group(g).withColumn("__gpos", F.lit(i))
            for i, g in enumerate(self.program["metrics_groups"])
        ]
        df = outs[0]
        for o in outs[1:]:
            df = df.unionByName(o)
        # canonical order for deterministic comparison
        df = df.withColumn(
            "metrics",
            F.expr(
                "array_sort(metrics, (a, b) -> CASE"
                " WHEN a.metric_name < b.metric_name THEN -1"
                " WHEN a.metric_name > b.metric_name THEN 1 ELSE 0 END)"
            ),
        ).withColumn(
            "dimensions",
            F.expr(
                "array_sort(dimensions, (a, b) -> CASE"
                " WHEN a.dimension_name < b.dimension_name THEN -1"
                " WHEN a.dimension_name > b.dimension_name THEN 1 ELSE 0 END)"
            ),
        )
        # The reference accumulates groups into a python SET
        # (PanoptesMetricsGroupSet, framework/metrics.py:411-418) whose
        # __eq__/__hash__ compare (resource, metrics, dimensions) — NOT
        # group_type (:388-409). Identical (dims, metrics) groups
        # therefore collapse even ACROSS group types, and python set.add
        # keeps the FIRST inserted element: the surviving group carries
        # the name of the EARLIEST program group (the cisco nxos/4900M
        # goldens each hold exactly one fully-empty group named
        # 'environment' — the first group in those programs). Arrays are
        # canonically sorted, so a (metrics, dimensions)-keyed min over
        # (program position, name) models the set exactly.
        return (
            df.groupBy(
                "device_id",
                "metrics_group_interval",
                "metrics",
                "dimensions",
            )
            .agg(
                F.min(
                    F.struct(
                        F.col("__gpos"),
                        F.col("metrics_group_type").alias("gname"),
                    )
                ).alias("__w")
            )
            .select(
                "device_id",
                F.col("__w.gname").alias("metrics_group_type"),
                "metrics_group_interval",
                "metrics",
                "dimensions",
            )
        )


def flatten_groups(df: DataFrame) -> DataFrame:
    """Nested groups -> one row per metric with dims as sorted string
    (comparison-friendly flat projection)."""
    return (
        df.withColumn(
            "dims_str",
            F.expr(
                "array_join(transform(dimensions,"
                " d -> concat(d.dimension_name, '=', d.dimension_value)), ',')"
            ),
        )
        .select(
            "device_id",
            "metrics_group_type",
            "metrics_group_interval",
            "dims_str",
            F.explode_outer("metrics").alias("m"),
        )
        .select(
            "device_id",
            "metrics_group_type",
            "metrics_group_interval",
            "dims_str",
            F.col("m.metric_name").alias("metric_name"),
            F.col("m.metric_value").alias("metric_value"),
            F.col("m.metric_type").alias("metric_type"),
        )
    )
