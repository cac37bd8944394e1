from panoptes_spark.operators.sessions import session_stats, sessionize


def test_sessionize_gaps(spark):
    rows = [
        ("u1", 0), ("u1", 1000), ("u1", 2000),      # session 0
        ("u1", 100000), ("u1", 101000),             # session 1 (gap > 30s)
        ("u2", 0),                                   # separate key
    ]
    df = spark.createDataFrame(rows, "user string, ts_ms long")
    out = sessionize(df, ["user"], gap_ms=30000)
    got = {(r.user, r.ts_ms): r.session_id for r in out.collect()}
    assert got == {("u1", 0): 0, ("u1", 1000): 0, ("u1", 2000): 0,
                   ("u1", 100000): 1, ("u1", 101000): 1, ("u2", 0): 0}


def test_session_stats(spark):
    rows = [("u1", 0, 1.5), ("u1", 1000, 2.5), ("u1", 100000, 4.0)]
    df = spark.createDataFrame(rows, "user string, ts_ms long, value double")
    out = {
        (r.user, r.session_id): r
        for r in session_stats(df, ["user"], gap_ms=30000,
                               value_col="value").collect()
    }
    s0 = out[("u1", 0)]
    assert (s0.n_events, s0.duration_ms, s0.sum_value) == (2, 1000, 4.0)
    s1 = out[("u1", 1)]
    assert (s1.n_events, s1.duration_ms, s1.sum_value) == (1, 0, 4.0)


def test_single_exchange_plan(spark):
    df = spark.createDataFrame([("u1", 0)], "user string, ts_ms long")
    plan = sessionize(df, ["user"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # both windows share the partitioning


def test_salted_join_equivalence(spark):
    from panoptes_spark.operators.skew import salted_count, salted_join

    large = spark.createDataFrame(
        [("hot", i) for i in range(100)] + [("cold", i) for i in range(5)],
        "k string, v long",
    )
    small = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, tag string")
    plain = large.join(small, "k").groupBy("k", "tag").count()
    salted = salted_join(large, small, ["k"]).groupBy("k", "tag").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    counts = {r.k: r.n for r in salted_count(large, ["k"]).collect()}
    assert counts == {"hot": 100, "cold": 5}


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key pre-partitions the data so the
    join plan has no Exchange — the co-located-join strategy for repeated
    big-table joins at scale."""
    import uuid

    a = spark.createDataFrame([(i, i * 2) for i in range(1000)], "k long, va long")
    b = spark.createDataFrame([(i, i * 3) for i in range(1000)], "k long, vb long")
    ta, tb = f"ta_{uuid.uuid4().hex[:8]}", f"tb_{uuid.uuid4().hex[:8]}"
    try:
        # force the sort-merge path (tiny test tables would broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        a.write.bucketBy(8, "k").sortBy("k").saveAsTable(ta)
        b.write.bucketBy(8, "k").sortBy("k").saveAsTable(tb)
        joined = spark.table(ta).join(spark.table(tb), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketed SMJ: both sides pre-hashed
        assert joined.count() == 1000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_session_stats_stream_matches_batch(spark, tmp_path):
    """Replay a batch through session_window streaming; rows (sans
    session_id) must equal the batch operator's, including the exact
    gap-boundary cases (diff == gap stays, diff == gap+1 splits)."""
    from panoptes_spark.streaming.sessions_stream import session_stats_stream

    rows = [
        ("u1", 0, 1.0), ("u1", 1000, 2.0), ("u1", 31000, 3.0),   # == gap: same
        ("u1", 62001, 4.0),                                       # gap+1: split
        ("u2", 5000, 10.0), ("u2", 200000, 20.0),
    ]
    df = spark.createDataFrame(rows, "user string, ts_ms long, value double")
    src = str(tmp_path / "sess_src")
    df.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = session_stats_stream(
        stream, ["user"], gap_ms=30000, value_col="value"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    from panoptes_spark.operators.sessions import session_stats

    batch = {
        tuple(r)
        for r in session_stats(df, ["user"], gap_ms=30000, value_col="value")
        .drop("session_id")
        .collect()
    }
    streamed = {
        tuple(r) for r in spark.sql("SELECT * FROM sess_stream").collect()
    }
    assert streamed == batch
    assert len(streamed) == 4  # u1 x2 (boundary split), u2 x2
