"""End-to-end streaming polling pipeline: the reference's OWN corpus
fixtures (healthy walk + missing-cpu walk) delivered as two micro-batch
snapshots, each compiled by the DSL program inside foreachBatch and
captured through the sink — the streaming twin of the per-run polling
loop (`plugin_polling_generic_snmp.py:721-762`)."""

import json
import os

import pytest

from panoptes_spark.dsl import corpus
from panoptes_spark.streaming.polling_stream import run_polling_stream

DATA = "/root/reference/tests/plugins/polling/generic/snmp/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference corpus not available"
)


def _snapshot_rows(program, snmprec_path, device):
    rec = corpus.parse_snmprec(snmprec_path)
    oid_maps, _ = corpus.build_oid_fixture(program, rec, service_active=True)
    rows = []
    for table, m in oid_maps.items():
        for idx, val in m.items():
            rows.append((device, table, str(idx), str(val)))
    return rows


def test_polling_stream_two_batches(spark, tmp_path):
    program = corpus.load_program(f"{DATA}/enrichment_data")
    healthy = _snapshot_rows(
        program, f"{DATA}/recording/public.snmprec", "dev-a"
    )
    # degraded scenario: same program, but this poll's temperature walk
    # (operating_temp) came back empty — the reference's per-OID timeout
    # poisons the indexed temperature group, which then vanishes
    degraded = [r for r in healthy if r[1] != "operating_temp"]

    schema = (
        "device_id string, table_name string, index string, value string"
    )
    land = tmp_path / "land"
    land.mkdir()
    spark.createDataFrame(healthy, schema).coalesce(1).write.parquet(
        str(land / "batch1")
    )
    spark.createDataFrame(degraded, schema).coalesce(1).write.parquet(
        str(land / "batch2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land / "*"))
    )

    outdir = tmp_path / "out"
    outdir.mkdir()

    def sink(df, batch_id):
        rows = [
            {
                "device_id": r.device_id,
                "metrics_group_type": r.metrics_group_type,
                "dimensions": [
                    [d.dimension_name, d.dimension_value]
                    for d in r.dimensions
                ],
                "metrics": [
                    [m.metric_name, m.metric_type, float(m.metric_value)]
                    for m in r.metrics
                ],
            }
            for r in df.collect()
        ]
        with open(outdir / f"batch_{batch_id}.json", "w") as f:
            json.dump(rows, f)

    q = run_polling_stream(
        spark, stream, program, sink, schema_version="0.1",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    batches = sorted(os.listdir(outdir))
    assert len(batches) == 2

    def load(name):
        with open(outdir / name) as f:
            return json.load(f)

    per_batch = [load(b) for b in batches]

    def has_temp(batch):
        return any(
            m[0] == "temperature_fahrenheit"
            for g in batch for m in g["metrics"]
        )

    # file pickup order is timestamp-dependent: identify the batches by
    # content (only the healthy one carries temperature metrics)
    with_temp = [b for b in per_batch if has_temp(b)]
    assert len(with_temp) == 1
    healthy_out = with_temp[0]
    degraded_out = next(b for b in per_batch if b is not healthy_out)

    # batch 1 matches the healthy golden's compiler-produced groups
    # (status is appended outside the compiler, so compare the rest)
    expected = [
        g for g in json.load(open(f"{DATA}/results.json"))
        if g["metrics_group_type"] != "status"
    ]
    got = sorted(
        (g["metrics_group_type"],
         tuple(sorted(map(tuple, g["dimensions"]))),
         tuple(sorted(
             (m[0], m[1], round(m[2], 6)) for m in g["metrics"]
         )))
        for g in healthy_out
    )
    want = sorted(
        (g["metrics_group_type"],
         tuple(sorted(
             (d["dimension_name"], d["dimension_value"])
             for d in g["dimensions"]
         )),
         tuple(sorted(
             (m["metric_name"], m["metric_type"],
              round(float(m["metric_value"]), 6))
             for m in g["metrics"]
         )))
        for g in expected
    )
    assert got == want

    # degraded batch: the temperature walk absent -> the poisoned
    # indexed group vanishes while memory / fans keep their values
    assert not has_temp(degraded_out)
    types2 = {g["metrics_group_type"] for g in degraded_out}
    assert {"environment", "memory"} <= types2
    mems = [
        dict((m[0], m[2]) for m in g["metrics"])
        for g in degraded_out if g["metrics_group_type"] == "memory"
    ]
    want_mem = [
        dict(
            (m["metric_name"], float(m["metric_value"]))
            for m in g["metrics"]
        )
        for g in json.load(open(f"{DATA}/results.json"))
        if g["metrics_group_type"] == "memory"
    ]
    assert mems == want_mem
