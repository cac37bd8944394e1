"""Hand-written vendor polling plugin twins: Cisco ASR 1000 and Arista.

References:
- ``plugins/polling/asr/plugin_polling_asr_device_metrics.py`` (577 LoC):
  cpu (ctrl via CPM + data via Crypto-Asic entity perf counters), memory
  (enhanced-mempool DRAM + QFP resource pools), environment (entity
  sensors with scale exponents and the 33<F<200 plausibility window,
  FRU power modules), crypto packet counters, QFP processing load.
- ``plugins/polling/arista/plugin_polling_arista_device_metrics.py``
  (535 LoC): cpu per hrProcessorLoad core (core 1 = aggregate, skipped),
  memory from hrStorage (used minus cached), environment via
  ENTITY-SENSOR deci-degrees, power-supply current sensors
  (+102 offset rule), 'Fan 1 Sensor 1' universe.

Input is the raw walk frame (device_id, oid, value) — oids without the
leading dot, snmprec style. Every derived table is a prefix slice of the
one walk scan; "get" calls are equality filters on the same frame. All
joins are device-dimension sized. The polling-status state machine
(polling_status.py:144-205) is reproduced per device: family events
SUCCESS/PARTIAL/MISSING/INTERNAL fold into the device status with the
all-success -> 0 / any-success -> 4 / else most-common rule.

No reference goldens exist for these two plugins; they are verified by
differential tests against hand-computed fixture walks
(tests/test_vendor_polling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# --- MIB layout (plugin constants, asr :17-59 / arista :15-39) ----------
ENT_PHYSICAL_ENTRY = ".1.3.6.1.2.1.47.1.1.1.1"
CPM_CPU_1MIN = ".1.3.6.1.4.1.9.9.109.1.1.1.1.7"
CPM_CPU_5MIN = ".1.3.6.1.4.1.9.9.109.1.1.1.1.8"
CPM_CPU_MONINTERVAL = ".1.3.6.1.4.1.9.9.109.1.1.1.1.10"
CPM_CPU_PHYS_INDEX = ".1.3.6.1.4.1.9.9.109.1.1.1.1.2"
CEMP_MEM_HC_USED = ".1.3.6.1.4.1.9.9.221.1.1.1.1.18.7000.1"
CEMP_MEM_HC_FREE = ".1.3.6.1.4.1.9.9.221.1.1.1.1.20.7000.1"
CEFC_FRU_POWER_STATUS = ".1.3.6.1.4.1.9.9.117.1.1.2.1.2"
ENT_SENSOR_TYPE = ".1.3.6.1.4.1.9.9.91.1.1.1.1.1"
ENT_SENSOR_SCALE = ".1.3.6.1.4.1.9.9.91.1.1.1.1.2"
ENT_SENSOR_VALUE = ".1.3.6.1.4.1.9.9.91.1.1.1.1.4"
CEQFP_UTIL_LOAD = ".1.3.6.1.4.1.9.9.715.1.1.6.1.14"
CEQFP_MEM_INUSE = ".1.3.6.1.4.1.9.9.715.1.1.7.1.3"
CEQFP_MEM_FREE = ".1.3.6.1.4.1.9.9.715.1.1.7.1.4"
CEP_STATS = ".1.3.6.1.4.1.9.9.756.1.3.1.2"
HR_PROCESSOR_LOAD = ".1.3.6.1.2.1.25.3.3.1.2"
HR_DEVICE_DESCR = ".1.3.6.1.2.1.25.3.2.1.3"
HR_STORAGE_PREFIX = ".1.3.6.1.2.1.25.2.3.1"
ENT_PHY_SENSOR_SCALE = ".1.3.6.1.2.1.99.1.1.1.2"
ENT_PHY_SENSOR_VALUE = ".1.3.6.1.2.1.99.1.1.1.4"

ENT_PHYSICAL_CLASSES = {
    1: "other", 2: "unknown", 3: "chassis", 4: "backplane", 5: "container",
    6: "powerSupply", 7: "fan", 8: "sensor", 9: "module", 10: "port",
    11: "stack", 12: "cpu",
}
MILLI_ENT_STRINGS = [  # asr :76-79
    "subslot 0/0 transceiver 0 Temperature Sensor",
    "subslot 0/1 transceiver 0 Temperature Sensor",
    "subslot 0/2 transceiver 0 Temperature Sensor",
    "subslot 0/3 transceiver 0 Temperature Sensor",
]
INPUT_CURRENT_SENSOR_OFFSET = 102  # arista :56

# polling_status.py DEVICE_METRICS_STATES
SUCCESS, PARTIAL, INTERNAL, MISSING = 0, 4, 5, 6


def asr_cpu_interval_oid(freq: int) -> str:
    """asr :209-217."""
    if 5 <= freq < 60:
        return CPM_CPU_MONINTERVAL
    if 60 <= freq < 300:
        return CPM_CPU_1MIN
    if freq >= 300:
        return CPM_CPU_5MIN
    return CPM_CPU_1MIN


def asr_crypto_interval(freq: int) -> str:
    """asr :104-112 (note the strict '<' bounds — 60 exactly falls
    through to the default '2')."""
    if freq < 60:
        return "2"
    if 60 < freq < 300:
        return "3"
    if 300 < freq < 900:
        return "4"
    return "2"


def asr_qfp_interval(freq: int) -> str:
    """asr :114-123."""
    if 5 <= freq < 60:
        return "1"
    if 60 <= freq < 300:
        return "2"
    if 300 <= freq < 3600:
        return "3"
    if freq >= 3600:
        return "4"
    return "2"


def _slice(walk: DataFrame, base: str) -> DataFrame:
    p = base.lstrip(".") + "."
    return walk.where(F.col("oid").startswith(p)).select(
        "device_id",
        F.expr(f"substring(oid, {len(p) + 1})").alias("index"),
        "value",
    )


def _get(walk: DataFrame, oid: str, col: str) -> DataFrame:
    return walk.where(F.col("oid") == oid.lstrip(".")).select(
        "device_id", F.col("value").alias(col)
    )


def _last(colname: str = "index") -> F.Column:
    return F.element_at(F.split(colname, r"\."), -1)


def _contains_any(col: F.Column, strings: list[str]) -> F.Column:
    cond = None
    for s in strings:
        c = col.contains(s)
        cond = c if cond is None else (cond | c)
    return cond


class _EntityWalk:
    """The entPhysicalEntry universe of one walk frame, with the
    reference's quirky matcher (_get_entity_indices): EVERY walked row
    (any column) is tested, so an entity whose name AND description both
    match is counted twice — preserved because power_units_total counts
    matching ROWS (asr :300, arista :224)."""

    def __init__(self, walk: DataFrame):
        ent = _slice(walk, ENT_PHYSICAL_ENTRY).withColumn(
            "eidx", _last()
        )
        self.ent = ent.persist()
        cls_map = F.create_map(
            *[
                F.lit(x)
                for k, v in ENT_PHYSICAL_CLASSES.items()
                for x in (str(k), v)
            ]
        )
        self.classes = (
            ent.where(F.element_at(F.split("index", r"\."), 1) == "5")
            .select(
                "device_id", "eidx", cls_map[F.col("value")].alias("cls")
            )
            .persist()
        )
        self.names = ent.where(
            F.element_at(F.split("index", r"\."), 1) == "7"
        ).select("device_id", "eidx", F.col("value").alias("name"))
        self.descrs = ent.where(
            F.element_at(F.split("index", r"\."), 1) == "2"
        ).select("device_id", "eidx", F.col("value").alias("descr"))

    def indices(self, cls: str, strings: list[str]) -> DataFrame:
        """Matching rows (NOT deduplicated — reference list semantics):
        (device_id, index, eidx)."""
        return (
            self.ent.join(
                self.classes.where(F.col("cls") == cls),
                ["device_id", "eidx"],
            )
            .where(_contains_any(F.col("value"), strings))
            .select("device_id", "index", "eidx")
        )


def _metric(name: str, value: F.Column, mtype: str = "gauge") -> F.Column:
    return F.struct(
        F.lit(name).alias("metric_name"),
        value.cast("double").alias("metric_value"),
        F.lit(mtype).alias("metric_type"),
        F.lit(0.0).alias("metric_creation_timestamp"),
    )


def _dim(name: str, value: F.Column) -> F.Column:
    return F.struct(
        F.lit(name).alias("dimension_name"),
        value.cast("string").alias("dimension_value"),
    )


_EMPTY_DIMS = (
    "cast(array() as"
    " array<struct<dimension_name:string,dimension_value:string>>)"
)


def _group(
    df: DataFrame, gtype: str, interval: int,
    metrics: list[F.Column], dims: list[F.Column] | None = None,
) -> DataFrame:
    return df.select(
        "device_id",
        F.lit(gtype).alias("metrics_group_type"),
        F.lit(interval).cast("long").alias("metrics_group_interval"),
        F.array(*metrics).alias("metrics"),
        (F.array(*dims) if dims else F.expr(_EMPTY_DIMS)).alias("dimensions"),
    )


def device_status_groups(
    events: DataFrame, devices: DataFrame, interval: int,
    metric_name: str = "polling_status",
) -> DataFrame:
    """(device_id, family, code) -> one status metrics group per device,
    folding family codes with the reference rule
    (polling_status.py:192-205): all SUCCESS -> SUCCESS; any SUCCESS ->
    PARTIAL; else the most common failure code (ties -> smallest code,
    a deterministic stand-in for Counter insertion order)."""
    by_code = events.groupBy("device_id", "code").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    agg = by_code.groupBy("device_id").agg(
        F.sum("cnt").alias("n"),
        F.sum(F.when(F.col("code") == SUCCESS, F.col("cnt")).otherwise(0))
        .alias("ok"),
        # max count, then smallest code, read back out of the struct
        (-F.max(F.struct(F.col("cnt"), (-F.col("code")).alias("negcode")))
         .getField("negcode")).alias("common"),
    )
    status = devices.select("device_id").join(agg, "device_id", "left")
    code = (
        F.when(F.col("n").isNull() | (F.col("n") == 0), F.lit(SUCCESS))
        .when(F.col("ok") == F.col("n"), F.lit(SUCCESS))
        .when(F.col("ok") > 0, F.lit(PARTIAL))
        .otherwise(F.col("common"))
    )
    return _group(
        status.select("device_id", code.alias("__code")),
        "status",
        interval,
        [_metric(metric_name, F.col("__code"))],
    )


def _family_event(
    devices: DataFrame, family: str,
    present: DataFrame, complete: DataFrame | None = None,
    absent_ok: bool = False,
) -> DataFrame:
    """Family status per device from data presence: rows in ``present``
    -> the family was attempted; ``complete`` (subset of present
    devices) -> every row resolved. Present+complete -> SUCCESS,
    present+incomplete -> INTERNAL (the KeyError path), absent ->
    MISSING unless ``absent_ok`` (families that silently skip when the
    entity class is empty, e.g. crypto)."""
    p = present.select("device_id").distinct().withColumn("__p", F.lit(True))
    out = devices.select("device_id").join(p, "device_id", "left")
    if complete is not None:
        c = (
            complete.select("device_id").distinct()
            .withColumn("__c", F.lit(True))
        )
        out = out.join(c, "device_id", "left")
    else:
        out = out.withColumn("__c", F.col("__p"))
    code = (
        F.when(F.col("__p").isNull(),
               F.lit(None) if absent_ok else F.lit(MISSING))
        .when(F.coalesce("__c", F.lit(False)), F.lit(SUCCESS))
        .otherwise(F.lit(INTERNAL))
    )
    return (
        out.select("device_id", F.lit(family).alias("family"),
                   code.alias("code"))
        .where(F.col("code").isNotNull())
    )


def asr_device_metrics(
    spark: SparkSession,
    walk: DataFrame,
    devices: DataFrame,
    execute_frequency: int = 60,
) -> DataFrame:
    """Cisco ASR 1000 device-metrics twin (asr plugin :185-536).

    Returns nested metrics-group rows (cpu / memory / environment /
    crypto / load / status) per device.
    """
    ew = _EntityWalk(walk)
    iv = execute_frequency
    events = []
    out = []

    # ---- cpu 'ctrl' (:451-470): interval walk -> physical index ->
    # entity name; ANY unresolved row poisons the whole ctrl family
    cpus = _slice(walk, asr_cpu_interval_oid(iv)).withColumn(
        "temp_id", _last()
    )
    physidx = _slice(walk, CPM_CPU_PHYS_INDEX).select(
        "device_id",
        F.col("index").alias("temp_id"),
        F.col("value").alias("cpu_id"),
    )
    ctrl = (
        cpus.join(physidx, ["device_id", "temp_id"], "left")
        .join(
            ew.names.withColumnRenamed("eidx", "cpu_id"),
            ["device_id", "cpu_id"],
            "left",
        )
        .select(
            "device_id", "cpu_id", "name",
            F.col("value").cast("long").alias("util"),
        )
    )
    ctrl_ok = ctrl.groupBy("device_id").agg(
        (F.count(F.lit(1)) == F.sum(
            F.when(
                F.col("cpu_id").isNotNull()
                & F.col("name").isNotNull()
                & F.col("util").isNotNull(),
                1,
            ).otherwise(0)
        )).alias("__all"),
    ).where("__all").select("device_id")
    ctrl_rows = ctrl.join(ctrl_ok, "device_id", "left_semi")
    events.append(_family_event(devices, "cpu_ctrl", ctrl, ctrl_rows))
    out.append(
        _group(
            ctrl_rows, "cpu", iv,
            [_metric("cpu_utilization", F.col("util"))],
            [
                _dim("cpu_type", F.lit("ctrl")),
                _dim("cpu_no", F.col("cpu_id")),
                _dim("cpu_name", F.col("name")),
            ],
        )
    )

    # ---- cpu 'data' + crypto counters (:243-284, :472-487): Crypto
    # Asic entities, per-entity perf-measurement gets
    crypto_iv = asr_crypto_interval(iv)
    crypto_idx = ew.indices("cpu", ["Crypto Asic"]).select(
        "device_id", "eidx"
    ).distinct()
    cep = _slice(walk, CEP_STATS)

    def cep_join(df: DataFrame, suffix: str, col: str) -> DataFrame:
        keyed = df.withColumn(
            "__key", F.concat(F.col("eidx"), F.lit(f".{crypto_iv}{suffix}"))
        )
        vals = cep.select(
            "device_id",
            F.col("index").alias("__key"),
            F.col("value").cast("long").alias(col),
        )
        return keyed.join(vals, ["device_id", "__key"], "left").drop("__key")

    crypto = cep_join(crypto_idx, ".1", "util")
    crypto = cep_join(crypto, ".5", "pkts_in")
    crypto = cep_join(crypto, ".6", "pkts_out")
    crypto = crypto.join(ew.names, ["device_id", "eidx"], "left")
    crypto_full = crypto.where(
        F.col("util").isNotNull()
        & F.col("pkts_in").isNotNull()
        & F.col("pkts_out").isNotNull()
        & F.col("name").isNotNull()
    )
    crypto_ok = crypto.groupBy("device_id").agg(
        (F.count(F.lit(1)) == F.sum(
            F.when(
                F.col("util").isNotNull() & F.col("pkts_in").isNotNull()
                & F.col("pkts_out").isNotNull() & F.col("name").isNotNull(),
                1,
            ).otherwise(0)
        )).alias("__all")
    ).where("__all").select("device_id")
    crypto_rows = crypto_full.join(crypto_ok, "device_id", "left_semi")
    events.append(
        _family_event(devices, "cpu_data", crypto, crypto_rows,
                      absent_ok=True)
    )
    events.append(
        _family_event(devices, "crypto", crypto, crypto_rows,
                      absent_ok=True)
    )
    out.append(
        _group(
            crypto_rows, "cpu", iv,
            [_metric("cpu_utilization", F.col("util"))],
            [
                _dim("cpu_type", F.lit("data")),
                _dim("cpu_no", F.col("eidx")),
                _dim("cpu_name", F.col("name")),
            ],
        )
    )
    out.append(
        _group(
            crypto_rows, "crypto", iv,
            [
                _metric("packets_in", F.col("pkts_in"), "counter"),
                _metric("packets_out", F.col("pkts_out"), "counter"),
            ],
            [
                _dim("cpu_no", F.col("eidx")),
                _dim("cpu_name", F.col("name")),
            ],
        )
    )

    # ---- memory (:402-447): enhanced-mempool DRAM + QFP pools
    dram = _get(walk, CEMP_MEM_HC_USED, "used").join(
        _get(walk, CEMP_MEM_HC_FREE, "free"), "device_id"
    ).select(
        "device_id",
        F.lit("dram").alias("memory_type"),
        F.col("used").cast("long").alias("memory_used"),
        (F.col("used").cast("long") + F.col("free").cast("long")).alias(
            "memory_total"
        ),
    )
    qfp_idx = ew.indices("cpu", ["qfp", "QFP"]).select(
        "device_id", "eidx"
    ).distinct()
    def qfp_join(df: DataFrame, base: str, col: str) -> DataFrame:
        vals = _slice(walk, base).select(
            "device_id",
            F.col("index").alias("__key"),
            F.col("value").cast("long").alias(col),
        )
        keyed = df.withColumn(
            "__key", F.concat(F.col("eidx"), F.lit(".1"))
        )
        return keyed.join(vals, ["device_id", "__key"]).drop("__key")

    qfp = qfp_join(
        qfp_join(qfp_idx, CEQFP_MEM_INUSE, "used"), CEQFP_MEM_FREE, "free"
    ).select(
        "device_id",
        F.lit("qfp").alias("memory_type"),
        F.col("used").alias("memory_used"),
        (F.col("used") + F.col("free")).alias("memory_total"),
    )
    memory = dram.unionByName(qfp)
    events.append(_family_event(devices, "memory_dram", dram))
    events.append(
        _family_event(devices, "memory_qfp", qfp_idx, qfp, absent_ok=True)
    )
    out.append(
        _group(
            memory, "memory", iv,
            [
                _metric("memory_used", F.col("memory_used")),
                _metric("memory_total", F.col("memory_total")),
            ],
            [_dim("memory_type", F.col("memory_type"))],
        )
    )

    # ---- environment (:315-400): temperature sensors + power modules
    temp_idx = ew.indices("sensor", ["temp", "Temp"]).select(
        "device_id", "eidx"
    ).distinct()
    stype = _slice(walk, ENT_SENSOR_TYPE).select(
        "device_id", F.col("index").alias("eidx"),
        F.col("value").alias("stype"),
    )
    sval = _slice(walk, ENT_SENSOR_VALUE).select(
        "device_id", F.col("index").alias("eidx"),
        F.col("value").cast("long").alias("sval"),
    )
    sscale = _slice(walk, ENT_SENSOR_SCALE).select(
        "device_id", F.col("index").alias("eidx"),
        F.col("value").cast("int").alias("scale"),
    )
    milli = F.col("name").isin(MILLI_ENT_STRINGS)
    # peta/exa scale codes are flip-flopped in the MIB (:288-296)
    eff_scale = (
        F.when(F.col("scale") == 14, F.lit(15))
        .when(F.col("scale") == 15, F.lit(14))
        .otherwise(F.col("scale"))
    )
    temps = (
        temp_idx.join(ew.names, ["device_id", "eidx"], "left")
        .join(stype, ["device_id", "eidx"], "left")
        .join(sval, ["device_id", "eidx"], "left")
        .join(sscale, ["device_id", "eidx"], "left")
        .where(F.col("stype") == "8")  # celsius only (:194-198)
        .withColumn(
            "celsius_raw",
            F.when(milli, F.expr("sval div 1000")).otherwise(F.col("sval")),
        )
        .withColumn(
            "temp_f",
            F.round(
                F.col("celsius_raw")
                * F.pow(F.lit(10.0), eff_scale - F.lit(9)) * 1.8 + 32,
                2,
            ),
        )
        .where((F.col("temp_f") > 33) & (F.col("temp_f") < 200))
    )
    events.append(
        _family_event(devices, "environment_temp", temp_idx,
                      absent_ok=True)
    )
    out.append(
        _group(
            temps, "environment", iv,
            [_metric("temperature_fahrenheit", F.col("temp_f"))],
            [_dim("entity_name", F.col("name"))],
        )
    )

    power_rows = ew.indices("powerSupply", ["Power Supply Module"])
    fru = _slice(walk, CEFC_FRU_POWER_STATUS).select(
        "device_id", F.col("index").alias("eidx"),
        F.col("value").alias("fru"),
    )
    power_mods = (
        power_rows.select("device_id", "eidx").distinct()
        .join(fru, ["device_id", "eidx"], "left")
    )
    power = power_rows.groupBy("device_id").agg(
        F.count(F.lit(1)).alias("power_units_total")  # row count, dups kept
    ).join(
        power_mods.groupBy("device_id").agg(
            F.sum(F.when(F.col("fru") == "2", 1).otherwise(0)).alias(
                "power_units_on"
            )
        ),
        "device_id",
    )
    events.append(
        _family_event(devices, "environment_power", power_rows,
                      absent_ok=True)
    )
    out.append(
        _group(
            power, "environment", iv,
            [
                _metric("power_units_total", F.col("power_units_total")),
                _metric("power_units_on", F.col("power_units_on")),
            ],
        )
    )

    # ---- QFP processing load (:219-241): first qfp entity only
    qfp_one = qfp_idx.groupBy("device_id").agg(
        F.min(F.col("eidx").cast("long")).cast("string").alias("eidx")
    )
    load_vals = _slice(walk, CEQFP_UTIL_LOAD).select(
        "device_id",
        F.col("index").alias("__key"),
        F.col("value").cast("long").alias("processing_load"),
    )
    load = (
        qfp_one.withColumn(
            "__key",
            F.concat(F.col("eidx"), F.lit(f".{asr_qfp_interval(iv)}")),
        )
        .join(load_vals, ["device_id", "__key"])
        .select("device_id", "processing_load")
    )
    events.append(
        _family_event(devices, "load", qfp_one, load, absent_ok=True)
    )
    out.append(
        _group(
            load, "load", iv,
            [_metric("processing_load", F.col("processing_load"))],
        )
    )

    all_events = events[0]
    for e in events[1:]:
        all_events = all_events.unionByName(e)
    groups = out[0]
    for g in out[1:]:
        groups = groups.unionByName(g)
    return groups.unionByName(
        device_status_groups(all_events, devices, iv)
    )


def arista_device_metrics(
    spark: SparkSession,
    walk: DataFrame,
    devices: DataFrame,
    execute_frequency: int = 60,
) -> DataFrame:
    """Arista device-metrics twin (arista plugin :59-535): cpu per
    hrProcessorLoad core, DRAM from hrStorage (used minus cached, x
    allocation units), ENTITY-SENSOR deci-degree temperatures, power
    supplies judged on their input-current sensor (+102 offset), and the
    'Fan 1 Sensor 1' fan universe."""
    ew = _EntityWalk(walk)
    iv = execute_frequency
    events = []
    out = []

    # ---- cpu (:372-416): per-core loads; core index 1 is the aggregate
    # and skipped; name = '<host descr>/<core descr>'
    hrdescr = _slice(walk, HR_DEVICE_DESCR).select(
        "device_id", F.col("index").alias("did"), F.col("value").alias("d")
    )
    host_descr = hrdescr.where(F.col("did") == "1").select(
        "device_id", F.col("d").alias("host_d")
    )
    cpus = (
        _slice(walk, HR_PROCESSOR_LOAD)
        .withColumn("temp_id", _last())
        .where(F.col("temp_id").cast("long") != 1)
    )
    ctrl = (
        cpus.join(
            hrdescr.withColumnRenamed("did", "temp_id"),
            ["device_id", "temp_id"],
            "left",
        )
        .join(host_descr, "device_id", "left")
        .select(
            "device_id", "temp_id",
            F.concat_ws("/", "host_d", "d").alias("name"),
            F.col("d").isNotNull().alias("__named"),
            F.col("value").cast("long").alias("util"),
        )
    )
    ctrl_ok = ctrl.groupBy("device_id").agg(
        (F.count(F.lit(1)) == F.sum(
            F.when(F.col("__named") & F.col("util").isNotNull(), 1)
            .otherwise(0)
        )).alias("__all")
    ).where("__all").select("device_id")
    ctrl_rows = ctrl.join(ctrl_ok, "device_id", "left_semi")
    events.append(_family_event(devices, "cpu", cpus, ctrl_rows))
    out.append(
        _group(
            ctrl_rows, "cpu", iv,
            [_metric("cpu_utilization", F.col("util"))],
            [
                _dim("cpu_type", F.lit("ctrl")),
                _dim("cpu_no", F.concat(F.lit("1."), F.col("temp_id"))),
                _dim("cpu_name", F.col("name")),
            ],
        )
    )

    # ---- memory DRAM (:337-356): hrStorage .1 (ram) minus .3 (cached)
    hr = _slice(walk, HR_STORAGE_PREFIX)

    def hr_get(col_no: str, storage_idx: str, name: str) -> DataFrame:
        return hr.where(
            F.col("index") == f"{col_no}.{storage_idx}"
        ).select("device_id", F.col("value").cast("long").alias(name))

    dram = (
        hr_get("4", "1", "units")
        .join(hr_get("6", "1", "used_total"), "device_id")
        .join(hr_get("6", "3", "used_cached"), "device_id")
        .join(hr_get("5", "1", "size"), "device_id")
        .select(
            "device_id",
            F.lit("dram").alias("memory_type"),
            ((F.col("used_total") - F.col("used_cached")) * F.col("units"))
            .alias("memory_used"),
            (F.col("size") * F.col("units")).alias("memory_total"),
        )
    )
    events.append(_family_event(devices, "memory", dram))
    out.append(
        _group(
            dram, "memory", iv,
            [
                _metric("memory_used", F.col("memory_used")),
                _metric("memory_total", F.col("memory_total")),
            ],
            [_dim("memory_type", F.col("memory_type"))],
        )
    )

    # ---- environment temperatures (:187-214): RFC ENTITY-SENSOR MIB,
    # values in deci-degrees C, dimension = entity DESCRIPTION (names
    # are blank on Arista); no plausibility window here
    sval = _slice(walk, ENT_PHY_SENSOR_VALUE).select(
        "device_id", F.col("index").alias("eidx"),
        F.col("value").cast("long").alias("sval"),
    )
    sscale = _slice(walk, ENT_PHY_SENSOR_SCALE).select(
        "device_id", F.col("index").alias("eidx"),
        F.col("value").cast("int").alias("scale"),
    )
    eff_scale = (
        F.when(F.col("scale") == 14, F.lit(15))
        .when(F.col("scale") == 15, F.lit(14))
        .otherwise(F.col("scale"))
    )
    temp_idx = ew.indices("sensor", ["temp", "Temp"]).select(
        "device_id", "eidx"
    ).distinct()
    temps = (
        temp_idx.join(ew.descrs, ["device_id", "eidx"], "left")
        .join(sval, ["device_id", "eidx"], "left")
        .join(sscale, ["device_id", "eidx"], "left")
        .withColumn(
            "temp_f",
            F.round(
                (F.col("sval") / 10.0)
                * F.pow(F.lit(10.0), eff_scale - F.lit(9)) * 1.8 + 32,
                2,
            ),
        )
    )
    temps_full = temps.where(
        F.col("descr").isNotNull() & F.col("temp_f").isNotNull()
    )
    events.append(
        _family_event(devices, "environment_temp", temp_idx, temps_full,
                      absent_ok=True)
    )
    out.append(
        _group(
            temps_full, "environment", iv,
            [_metric("temperature_fahrenheit", F.col("temp_f"))],
            [_dim("sensor", F.col("descr"))],
        )
    )

    # ---- power supplies (:216-242): on iff input-current sensor
    # (entity index + 102) reads > 0
    power_rows = ew.indices("powerSupply", ["PowerSupply"])
    current = sval.select(
        "device_id",
        (F.col("eidx").cast("long") - INPUT_CURRENT_SENSOR_OFFSET)
        .cast("string").alias("eidx"),
        F.col("sval").alias("current"),
    )
    power_mods = (
        power_rows.select("device_id", "eidx").distinct()
        .join(current, ["device_id", "eidx"], "left")
    )
    power = power_rows.groupBy("device_id").agg(
        F.count(F.lit(1)).alias("power_units_total")
    ).join(
        power_mods.groupBy("device_id").agg(
            F.sum(F.when(F.col("current") > 0, 1).otherwise(0)).alias(
                "power_units_on"
            )
        ),
        "device_id",
    )
    events.append(
        _family_event(devices, "environment_power", power_rows,
                      absent_ok=True)
    )
    out.append(
        _group(
            power, "environment", iv,
            [
                _metric("power_units_total", F.col("power_units_total")),
                _metric("power_units_on", F.col("power_units_on")),
            ],
        )
    )

    # ---- fans (:244-257): 'Fan 1 Sensor 1' rows; ok iff sensor > 0.
    # Row duplicates (name+descr both matching) inflate BOTH totals,
    # exactly like the reference's list-append loop.
    fan_rows = ew.indices("sensor", ["Fan 1 Sensor 1"])
    fans = fan_rows.join(sval, ["device_id", "eidx"], "left").groupBy(
        "device_id"
    ).agg(
        F.count(F.lit(1)).alias("fans_total"),
        F.sum(F.when(F.col("sval") > 0, 1).otherwise(0)).alias("fans_ok"),
    )
    events.append(
        _family_event(devices, "environment_fans", fan_rows,
                      absent_ok=True)
    )
    out.append(
        _group(
            fans, "environment", iv,
            [
                _metric("fans_total", F.col("fans_total")),
                _metric("fans_ok", F.col("fans_ok")),
            ],
        )
    )

    all_events = events[0]
    for e in events[1:]:
        all_events = all_events.unionByName(e)
    groups = out[0]
    for g in out[1:]:
        groups = groups.unionByName(g)
    return groups.unionByName(
        device_status_groups(all_events, devices, iv)
    )
