"""Structured Streaming smoke tests: file source → windowed agg / stateful
EMA → memory sink, driven synchronously with processAllAvailable().

Also checks stream/batch parity: the streaming tumbling aggregation must
produce the same rows as the batch query the oracle validates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indicators_spark.sources.prices import load_table
from indicators_spark.streaming import (
    stateful_running_indicators,
    tumbling_counts_stream,
)

from conftest import SF_SMOKE


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    """Events re-written as µs-timestamp parquet, streamable by schema."""
    out = str(tmp_path / "events_us")
    load_table(spark, SF_SMOKE, "events").write.mode("overwrite").parquet(out)
    return out


def _run_stream(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_tumbling_stream_matches_batch(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    agg = tumbling_counts_stream(stream, "1 hour", "2 hours")
    _run_stream(agg, "tumbling_out")
    got = spark.sql(
        "SELECT window_start, event_type, n, sum_value FROM tumbling_out"
    )

    ev = spark.read.parquet(events_stream_dir)
    max_ts = ev.agg(F.max("ts")).first()[0]
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        # append mode only emits windows closed by the final watermark
        # (max event time - 2h); the trailing open windows are withheld.
        .filter(
            F.col("window_start") + F.expr("INTERVAL 3 HOURS")
            <= F.lit(max_ts)
        )
    )
    g = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert b <= g
    assert len(b) > 0
    # nothing extra beyond the full batch set
    full = {
        tuple(r)
        for r in ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        .collect()
    }
    assert g <= full


def test_stateful_running_ema_stream(spark, events_stream_dir):
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    out = stateful_running_indicators(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("ema_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM ema_out")
    n = got.count()
    assert n == spark.read.parquet(events_stream_dir).count()
    # EMA of first row per symbol equals its value (recurrence seed)
    first = (
        got.orderBy("ts")
        .filter(F.col("event_type") == "error")
        .select("value", "ema")
        .first()
    )
    assert first["ema"] == pytest.approx(first["value"])


def test_exactly_once_parquet_sink_replay(spark, events_stream_dir, tmp_path):
    """foreachBatch ledger sink: a replayed epoch must not duplicate rows."""
    from indicators_spark.streaming import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "out"))
    schema = spark.read.parquet(events_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = stream.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.processAllAvailable()
    q.stop()

    total = spark.read.parquet(events_stream_dir).count()
    assert sink.read(spark).count() == total
    epochs = sink.committed_epochs()
    assert epochs

    # simulate the at-least-once failure mode: re-deliver a committed epoch
    replay = spark.read.parquet(events_stream_dir).limit(50)
    sink(replay, epochs[0])
    assert sink.read(spark).count() == total  # unchanged: skipped by ledger

    # a NEW epoch still lands
    sink(replay, max(epochs) + 1)
    assert sink.read(spark).count() == total + 50


def test_upsert_sink_replay_and_merge(spark, tmp_path):
    """foreachBatch MERGE sink: replays are no-ops, new epochs upsert."""
    from indicators_spark.streaming import UpsertParquetSink

    sink = UpsertParquetSink(str(tmp_path / "store"), key="k", order_col="v")
    b0 = spark.createDataFrame([(1, 1, "a"), (2, 1, "b")], "k long, v long, s string")
    b1 = spark.createDataFrame([(2, 2, "B"), (3, 1, "c")], "k long, v long, s string")

    sink(b0, 0)
    sink(b1, 1)
    got = {tuple(r) for r in sink.read(spark).collect()}
    assert got == {(1, 1, "a"), (2, 2, "B"), (3, 1, "c")}

    # replay epoch 1: pointer skip, state unchanged
    sink(b1, 1)
    assert {tuple(r) for r in sink.read(spark).collect()} == got

    # stale update loses to latest-wins
    sink(spark.createDataFrame([(2, 1, "stale")], "k long, v long, s string"), 2)
    assert {tuple(r) for r in sink.read(spark).collect()} == got


def test_upsert_sink_rejects_null_keys(spark, tmp_path):
    """merge_upsert's MERGE-semantics NULL-key passthrough and the sink's
    replay-idempotence contract are mutually exclusive (a fresh-checkpoint
    replay would append NULL-key rows every time) — the sink must reject
    NULL keys up front (ADVICE r4)."""
    import pytest as _pytest

    from indicators_spark.streaming import UpsertParquetSink

    sink = UpsertParquetSink(str(tmp_path / "store"), key="k", order_col="v")
    good = spark.createDataFrame([(1, 1, "a")], "k long, v long, s string")
    bad = spark.createDataFrame(
        [(2, 1, "b"), (None, 1, "nullkey")], "k long, v long, s string"
    )
    sink(good, 0)
    with _pytest.raises(ValueError, match="NULL 'k'"):
        sink(bad, 1)
    # the rejected epoch never committed: store unchanged, pointer intact
    assert {tuple(r) for r in sink.read(spark).collect()} == {(1, 1, "a")}


def test_streaming_dedup_within_watermark(spark, events_stream_dir, tmp_path):
    """Streaming exact dedup: duplicated source rows collapse to one per
    event_id via dropDuplicates with a watermark bounding the state."""
    dup_dir = str(tmp_path / "dup")
    ev = spark.read.parquet(events_stream_dir)
    ev.unionAll(ev).write.mode("overwrite").parquet(dup_dir)

    stream = spark.readStream.schema(ev.schema).parquet(dup_dir)
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicates(
        ["event_id", "ts"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_out").first()
    assert got["n"] == ev.count()
    assert got["d"] == ev.select("event_id").distinct().count()


def test_late_data_dropped_past_watermark(spark, tmp_path):
    """A straggler arriving AFTER its window was emitted and its state
    evicted must be dropped — no resurrected or double-counted window; an
    on-time event from the same micro-batch lands.  Files feed
    one-per-trigger so the watermark advances between micro-batches.
    (The eviction must happen in an EARLIER batch: a late row landing in
    the same batch that closes its window is still merged — Spark's
    guarantee is one-directional.)"""
    import datetime as dt
    import glob
    import os
    import shutil

    base = dt.datetime(2024, 1, 1)

    def ev(eid, h, m):
        return (eid, base + dt.timedelta(hours=h, minutes=m), eid, "a", 1.0, "{}")

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    files = [
        [ev(1, 10, 0), ev(2, 14, 0)],   # watermark -> 13:00 after this batch
        [ev(3, 17, 0)],                 # [10,11) emits + evicts; wm -> 16:00
        [ev(4, 10, 15), ev(5, 16, 30)],  # 10:15 is LATE; 16:30 on time
        [ev(6, 23, 0)],                 # closes [16,17)
    ]
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    for i, rows in enumerate(files):
        tmp = str(tmp_path / f"w{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        dst = str(stream_dir / f"{i:03d}.parquet")
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (1700000000 + i * 100,) * 2)  # deterministic order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(stream_dir))
    )
    agg = tumbling_counts_stream(stream, "1 hour", "1 hour")
    _run_stream(agg, "late_out")
    rows = spark.sql("SELECT * FROM late_out").collect()
    hour10 = [r for r in rows if r["window_start"].hour == 10]
    assert len(hour10) == 1 and hour10[0]["n"] == 1  # straggler dropped, once
    hour16 = [r for r in rows if r["window_start"].hour == 16]
    assert len(hour16) == 1 and hour16[0]["n"] == 1  # on-time event landed


def test_transform_with_state_running_ema(spark, events_stream_dir):
    """The Spark 4 transformWithStateInPandas form of the running EMA
    produces exactly the same rows as the applyInPandasWithState form
    (RocksDB state store, per-key ValueState carry)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's Python driver worker needs protobuf, "
        "absent in this container (installs prohibited); the operator is "
        "exercised wherever protobuf exists",
    )
    from indicators_spark.streaming import stateful_running_indicators_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = spark.read.parquet(events_stream_dir).schema
        stream = spark.readStream.schema(schema).parquet(events_stream_dir)
        out = stateful_running_indicators_tws(stream)
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("ema_tws_out")
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.sql("SELECT * FROM ema_tws_out")
        ev = spark.read.parquet(events_stream_dir)
        assert got.count() == ev.count()
        # batch replay of the same recurrence, per symbol, as ground truth
        import pandas as pd

        pdf = ev.orderBy("ts", "event_id").toPandas()
        want = {}
        for sym, g in pdf.groupby("event_type"):
            ema, n = 0.0, 0
            for _, row in g.iterrows():
                ema = row["value"] if n == 0 else 0.9 * ema + 0.1 * row["value"]
                n += 1
            want[sym] = (ema, n)
        g2 = got.orderBy("ts").toPandas()
        for sym, grp in g2.groupby("event_type"):
            assert len(grp) == want[sym][1]
            assert abs(grp["ema"].iloc[-1] - want[sym][0]) < 1e-9, sym
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_interval_join_stream_matches_batch(spark, events_stream_dir):
    """Stream-stream interval join (purchases ⋈ clicks within the prior
    hour per user) must emit exactly the batch join's matched pairs once
    the final watermark passes."""
    from indicators_spark.streaming import interval_join_stream

    schema = spark.read.parquet(events_stream_dir).schema

    def side(df, etype):
        return df.filter(F.col("event_type") == etype)

    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    joined = interval_join_stream(
        side(stream, "click"), side(stream, "purchase"),
        key="user_id", watermark="2 hours", upper="1 hour",
    )
    _run_stream(joined, "ij_out")
    got = spark.sql("SELECT * FROM ij_out")

    ev = spark.read.parquet(events_stream_dir)
    l = side(ev, "click").alias("l")
    r = side(ev, "purchase").alias("r")
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.ts") <= F.col("r.ts"))
        & (F.col("l.ts") >= F.col("r.ts") - F.expr("INTERVAL 1 HOUR"))
    )
    batch = l.join(r, cond).select(
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("left_ts"),
        F.col("l.event_id").alias("left_id"),
        F.col("r.ts").alias("right_ts"),
        F.col("r.event_id").alias("right_id"),
    )
    # availableNow + processAllAvailable advances the watermark past every
    # event, so all pairs are emitted; compare as sets of id pairs.
    got_pairs = {(x["left_id"], x["right_id"]) for x in got.collect()}
    want_pairs = {(x["left_id"], x["right_id"]) for x in batch.collect()}
    assert got_pairs == want_pairs
    assert len(want_pairs) > 0


def test_stream_static_enrichment_matches_batch(spark, events_stream_dir):
    """Stream-static join parity: enriching the event stream with a static
    per-user dimension must emit exactly the batch join's rows (the join
    is stateless — every micro-batch sees the full static side)."""
    from indicators_spark.streaming import enrich_stream

    ev = spark.read.parquet(events_stream_dir)
    dim = (
        ev.select("user_id").distinct()
        .withColumn("segment", (F.col("user_id") % 3).cast("string"))
    )
    dim_dir = events_stream_dir + "_dim"
    dim.write.mode("overwrite").parquet(dim_dir)
    static_dim = spark.read.parquet(dim_dir)

    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    out = enrich_stream(stream, static_dim, on="user_id").select(
        "event_id", "user_id", "segment"
    )
    _run_stream(out, "enriched_out")
    got = {tuple(r) for r in spark.sql("SELECT * FROM enriched_out").collect()}
    batch = {
        tuple(r)
        for r in ev.join(static_dim, "user_id", "left")
        .select("event_id", "user_id", "segment")
        .collect()
    }
    assert got == batch
    assert len(got) > 0


def test_stream_dedup_against_corpus_matches_batch(spark, tmp_path):
    """Streaming ingest-dedup parity: the stream-static anti join +
    in-stream dropDuplicates must keep exactly one survivor for exactly
    the CONTENT the batch operator keeps (fingerprint sets match; the
    representative id may differ — arrival order vs min-id)."""
    from indicators_spark.functions.dedup import dedup_against_corpus
    from indicators_spark.streaming import dedup_stream_against_corpus

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 3 == 0)
    batch = docs.filter(F.col("doc_id") % 3 != 0)
    corpus_fps = corpus.select(F.md5("text").alias("fp")).distinct()

    corpus_dir = str(tmp_path / "corpus_fps")
    batch_dir = str(tmp_path / "batch_docs")
    corpus_fps.write.mode("overwrite").parquet(corpus_dir)
    batch.write.mode("overwrite").parquet(batch_dir)

    stream = spark.readStream.schema(batch.schema).parquet(batch_dir)
    out = dedup_stream_against_corpus(
        stream, spark.read.parquet(corpus_dir)
    ).select("doc_id", "fp")
    _run_stream(out, "stream_dedup_out")
    rows = spark.sql("SELECT * FROM stream_dedup_out").collect()
    got_fps = {r.fp for r in rows}
    assert len(rows) == len(got_fps)  # exactly one survivor per content

    kept = dedup_against_corpus(batch, spark.read.parquet(corpus_dir))
    batch_fps = {r.fp for r in kept.select(F.md5("text").alias("fp")).collect()}
    assert got_fps == batch_fps
    assert len(got_fps) > 0


def test_ema_frontier_keeps_equal_timestamp_later_batch(spark):
    """An on-time event that shares its timestamp with the carried
    frontier but arrives in the NEXT micro-batch must be processed, not
    silently dropped (the frontier tie-breaks on event_id)."""
    import pandas as pd

    from indicators_spark.streaming.windows import _FRONTIER_INIT, _ema_advance

    t = pd.Timestamp("2024-01-01 10:00:00")
    batch1 = pd.DataFrame(
        {"event_id": [7], "ts": [t], "event_type": ["x"], "value": [10.0]}
    )
    out1, carry = _ema_advance(batch1, (0.0, 0, _FRONTIER_INIT, _FRONTIER_INIT))
    assert len(out1) == 1 and carry[1] == 1
    batch2 = pd.DataFrame(
        {"event_id": [8], "ts": [t], "event_type": ["x"], "value": [20.0]}
    )
    out2, carry = _ema_advance(batch2, carry)
    assert len(out2) == 1  # equal ts, higher id: on time
    assert carry[1] == 2
    assert out2["ema"].iloc[0] == 0.9 * 10.0 + 0.1 * 20.0
    # a true straggler (same (ts, id) replayed, or lower id) IS dropped
    out3, carry3 = _ema_advance(batch2, carry)
    assert len(out3) == 0 and carry3 == carry


def test_sinks_new_run_restarting_epochs_not_skipped(spark, tmp_path):
    """Epoch ids are checkpoint-scoped: a NEW run whose epochs restart at
    0 must not be mistaken for a replay of the old run's epoch 0 (the
    silent-data-loss mode of an epoch-only ledger)."""
    from indicators_spark.streaming import ExactlyOnceParquetSink, UpsertParquetSink

    df1 = spark.createDataFrame([(1, 10.0)], "k long, v double")
    df2 = spark.createDataFrame([(2, 20.0)], "k long, v double")

    out = str(tmp_path / "eo")
    ExactlyOnceParquetSink(out, run_id="ckpt-A")(df1, 0)
    ExactlyOnceParquetSink(out, run_id="ckpt-B")(df2, 0)  # new checkpoint
    got = {
        (r["k"], r["v"])
        for r in ExactlyOnceParquetSink(out, run_id="ckpt-B").read(spark).collect()
    }
    assert got == {(1, 10.0), (2, 20.0)}
    # replay of the SAME run's epoch is still skipped
    ExactlyOnceParquetSink(out, run_id="ckpt-B")(df2, 0)
    assert len(ExactlyOnceParquetSink(out, run_id="ckpt-B").read(spark).collect()) == 2

    store = str(tmp_path / "up")
    UpsertParquetSink(store, key="k", order_col="v", run_id="ckpt-A")(df1, 0)
    sink_b = UpsertParquetSink(store, key="k", order_col="v", run_id="ckpt-B")
    sink_b(df2, 0)
    got = {(r["k"], r["v"]) for r in sink_b.read(spark).collect()}
    assert got == {(1, 10.0), (2, 20.0)}
    # same-run replay is a no-op
    sink_b(df2, 0)
    assert len(sink_b.read(spark).collect()) == 2


def test_sinks_skip_empty_batches(spark, tmp_path):
    """Empty triggers must not commit footer-less epoch dirs or pay a full
    copy-on-write pass."""
    from indicators_spark.streaming import ExactlyOnceParquetSink, UpsertParquetSink

    empty = spark.createDataFrame([], "k long, v double")
    data = spark.createDataFrame([(1, 1.0)], "k long, v double")

    eo = ExactlyOnceParquetSink(str(tmp_path / "eo"))
    eo(empty, 0)
    assert eo.committed_epochs() == []
    eo(data, 1)
    assert eo.committed_epochs() == [1]
    assert eo.read(spark).count() == 1

    up = UpsertParquetSink(str(tmp_path / "up"), key="k", order_col="v")
    up(empty, 0)
    up(data, 1)
    assert up.read(spark).count() == 1


def test_upsert_sink_first_epoch_deterministic_tiebreak(spark, tmp_path):
    """Epoch 0 must resolve duplicate (key, order_col) rows with
    merge_upsert's deterministic whole-row tie-break, so a crash-replay of
    the first epoch stores the identical survivor."""
    from indicators_spark.streaming import UpsertParquetSink

    dup = spark.createDataFrame(
        [(1, 1.0, "a"), (1, 1.0, "b")], "k long, v double, s string"
    )
    rows = []
    for attempt in range(2):
        store = str(tmp_path / f"s{attempt}")
        sink = UpsertParquetSink(store, key="k", order_col="v")
        sink(dup, 0)
        rows.append(tuple(sink.read(spark).collect()[0]))
    assert rows[0] == rows[1]


def test_dedup_stream_rejects_fp_collision(spark):
    from indicators_spark.streaming.windows import dedup_stream_against_corpus
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "t", "x")], "doc_id long, text string, fp string")
    corpus = spark.createDataFrame([("aa",)], "fp string")
    with _pytest.raises(ValueError, match="already has"):
        dedup_stream_against_corpus(docs, corpus)


def test_substring_ingest_sink_incremental_policy(spark, tmp_path):
    """foreachBatch ExactSubstr ingest: epoch 0's passages are canonical;
    a later epoch re-shipping the same passage gets it cut, one copy
    survives across the whole ingest history, and a replayed epoch is an
    exactly-once no-op (cleaned docs AND gram store unchanged)."""
    from indicators_spark.streaming import SubstringDedupIngestSink

    shared = " ".join(f"p{i}" for i in range(12))
    sink = SubstringDedupIngestSink(str(tmp_path / "ingest"), n=10)

    b0 = spark.createDataFrame(
        [(0, "intro " + shared + " outro"),
         (1, "novel first epoch words " + " ".join(f"a{i}" for i in range(8)))],
        "doc_id long, text string",
    )
    # epoch 1: the shared passage again (cut), a batch-internal repeat
    # (later copy cut), and fresh text (kept)
    rep = " ".join(f"b{i}" for i in range(10))
    b1 = spark.createDataFrame(
        [(10, "x y " + shared + " z"),
         (11, rep + " " + rep),
         (12, "completely fresh " + " ".join(f"c{i}" for i in range(10)))],
        "doc_id long, text string",
    )
    sink(b0, 0)
    sink(b1, 1)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in sink.read_clean(spark).collect()
    }
    assert got[0][1] == 0 and shared in got[0][0]      # canonical survives
    assert got[10] == ("x y z", 12)                    # history wins
    assert got[11] == (rep, 10)                        # keep-first in batch
    assert got[12][1] == 0
    survivors = [t for t, _ in got.values() if shared in t]
    assert len(survivors) == 1

    # replay epoch 1: ledger skip; nothing changes
    before = {tuple(r) for r in sink.read_clean(spark).collect()}
    n_grams_before = spark.read.parquet(
        *sink._store_paths()
    ).count()
    sink(b1, 1)
    assert {tuple(r) for r in sink.read_clean(spark).collect()} == before
    assert spark.read.parquet(*sink._store_paths()).count() == n_grams_before


def test_substring_ingest_sink_matches_batch_operator(spark, tmp_path):
    """Epoch 1's spans equal the batch operator's incremental policy run
    against epoch 0 as the corpus (stream/batch parity for the substring
    family)."""
    from indicators_spark.functions.dedup import (
        batch_gram_hashes,
        cut_spans,
        substring_dedup_incremental_policy,
    )
    from indicators_spark.streaming import SubstringDedupIngestSink

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    e0 = docs.filter(F.col("doc_id") < 250)
    e1 = docs.filter(F.col("doc_id") >= 250)

    sink = SubstringDedupIngestSink(str(tmp_path / "ingest"), n=10)
    sink(e0, 0)
    sink(e1, 1)
    got = {
        tuple(r)
        for r in sink.read_clean(spark)
        .join(e1.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }

    spans = substring_dedup_incremental_policy(e1, batch_gram_hashes(e0), n=10)
    want = {tuple(r) for r in cut_spans(e1, spans).collect()}
    assert got == want and len(got) > 0


def test_line_dedup_ingest_sink_incremental(spark, tmp_path):
    """foreachBatch line-dedup ingest: history is append-only (epoch 0's
    copy of a line survives), later occurrences are removed once the
    combined count reaches min_df, batch-internal repeats count too, and
    a replayed epoch is an exactly-once no-op."""
    from indicators_spark.streaming import LineDedupIngestSink

    sink = LineDedupIngestSink(str(tmp_path / "ingest"), min_df=2)
    b0 = spark.createDataFrame(
        [(0, "accept cookies\nunique zero"), (1, "only here")],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(10, "accept cookies\nfresh text"),       # history copy → removed
         (11, "twice in batch\nmid\ntwice in batch"),  # batch-internal
         (12, None)],                                  # NULL passthrough
        "doc_id long, text string",
    )
    sink(b0, 0)
    sink(b1, 1)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in sink.read_clean(spark).collect()
    }
    assert got[0] == ("accept cookies\nunique zero", 0)  # landed copy kept
    assert got[10] == ("fresh text", 1)                  # history wins
    assert got[11] == ("mid", 2)                         # min_df within batch
    assert got[12] == (None, 0)

    # replay epoch 1: ledger skip; cleaned docs and count store unchanged
    before = {tuple(r) for r in sink.read_clean(spark).collect()}
    n_cells = spark.read.parquet(*sink._store_paths()).count()
    sink(b1, 1)
    assert {tuple(r) for r in sink.read_clean(spark).collect()} == before
    assert spark.read.parquet(*sink._store_paths()).count() == n_cells


def test_line_dedup_ingest_sink_matches_batch_operator(spark, tmp_path):
    """Epoch 1's cleaned docs equal the batch incremental operator run
    against epoch 0's counts (stream/batch parity for the line family)."""
    from indicators_spark.functions.dedup import (
        batch_line_counts,
        line_dedup_incremental,
    )
    from indicators_spark.streaming import LineDedupIngestSink

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    )
    e0 = docs.filter(F.col("doc_id") < 250)
    e1 = docs.filter(F.col("doc_id") >= 250)

    sink = LineDedupIngestSink(str(tmp_path / "ingest"), min_df=2)
    sink(e0, 0)
    sink(e1, 1)
    got = {
        tuple(r)
        for r in sink.read_clean(spark)
        .join(e1.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    want = {
        tuple(r)
        for r in line_dedup_incremental(e1, batch_line_counts(e0)).collect()
    }
    assert got == want and len(got) > 0


def test_quality_filters_stream_matches_batch(spark, tmp_path):
    """The r7 quality filters (Gopher rules, C4 cleaning) are row-local
    projections, so the SAME operator code runs unchanged on a stream —
    stream output must equal the batch twin row-for-row."""
    from indicators_spark.functions.text import c4_rules, gopher_rules

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    doc_dir = str(tmp_path / "docs")
    docs.write.parquet(doc_dir)

    stream = spark.readStream.schema(docs.schema).parquet(doc_dir)
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        c4_rules(gopher_rules(stream).select("doc_id", "text", F.col("keep").alias("gopher_keep")))
        .select("doc_id", "gopher_keep", "n_kept", "keep")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r) for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        tuple(r)
        for r in c4_rules(
            gopher_rules(docs).select(
                "doc_id", "text", F.col("keep").alias("gopher_keep")
            )
        )
        .select("doc_id", "gopher_keep", "n_kept", "keep")
        .collect()
    }
    assert got == want and len(got) > 0


def test_cms_counters_stream_matches_batch(spark, tmp_path):
    """The CMS counter matrix is a plain groupBy-count, so it streams in
    complete mode unchanged — final counters equal the batch sketch
    cell-for-cell (the mergeability the sketch is built on)."""
    from indicators_spark.functions.sketches import cms_counters

    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.col("text"), " ")).alias("v"))
    )
    tok_dir = str(tmp_path / "toks")
    toks.write.parquet(tok_dir)

    stream = spark.readStream.schema(toks.schema).parquet(tok_dir)
    q = (
        cms_counters(stream, "v")
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.j, r.b): r.cnt for r in spark.sql("SELECT * FROM cms_stream").collect()}
    want = {(r.j, r.b): r.cnt for r in cms_counters(toks, "v").collect()}
    assert got == want and len(got) > 0


def test_mixture_plan_sink_stream_matches_batch(spark, tmp_path):
    """MixturePlanSink executing the r7 water-fill plan over 3 arriving
    epochs samples EXACTLY the documents the batch filter picks over the
    concatenated corpus (membership is a pure function of doc id), and
    the cumulative achieved-vs-planned audit matches the batch
    mixture_plan_execute accounting."""
    from indicators_spark.queries import QUERIES
    from indicators_spark.streaming import MixturePlanSink

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).filter(F.col("text").isNotNull())
    plan = QUERIES["mixture_token_budget"].spark(spark, SF_SMOKE)
    rates = {r["source"]: r["sample_rate"] for r in plan.collect()}

    sink = MixturePlanSink(str(tmp_path / "mix"), rates)
    # epoch split deliberately slices WITHIN sources (doc_id stripes) so
    # parity can only hold if membership ignores epoch boundaries
    sink(docs.filter(F.col("doc_id") % 3 == 0), 0)
    sink(docs.filter(F.col("doc_id") % 3 == 1), 1)
    sink(docs.filter(F.col("doc_id") % 3 == 2), 2)

    got = {r["doc_id"] for r in sink.read_sampled(spark).collect()}
    want = {r["doc_id"] for r in sink.sample(docs).collect()}
    assert got == want and len(got) > 0
    assert got != {r["doc_id"] for r in docs.collect()}  # rates actually cut

    audit = {
        r["source"]: r
        for r in sink.achieved_vs_planned(spark).collect()
    }
    base = {
        r["source"]: r["total"]
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("total")
        ).collect()
    }
    samp = {
        r["source"]: r["s"]
        for r in sink.read_sampled(spark)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("s"))
        .collect()
    }
    for src, row in audit.items():
        assert row["total_docs"] == base[src]
        assert row["sampled_docs"] == samp.get(src, 0)
        # a capped source samples everything; the audit must say so
        if rates[src] >= 1.0:
            assert row["sampled_docs"] == row["total_docs"]


def test_mixture_plan_sink_replay_idempotent(spark, tmp_path):
    """A replayed epoch is an exactly-once no-op for BOTH the sampled
    data and the accounting ledger; unplanned sources are counted in
    totals with planned_rate 0 and zero samples."""
    from indicators_spark.streaming import MixturePlanSink

    sink = MixturePlanSink(str(tmp_path / "mix"), {"web": 0.5, "books": 1.0})
    b0 = spark.createDataFrame(
        [(i, "web" if i % 2 else "books", f"doc {i} words here")
         for i in range(40)]
        + [(100, "unplanned", "stray source doc")],
        "doc_id long, source string, text string",
    )
    sink(b0, 0)
    sampled0 = {tuple(r) for r in sink.read_sampled(spark).collect()}
    acct0 = {tuple(r) for r in sink.read_accounting(spark).collect()}
    sink(b0, 0)  # replay
    assert {tuple(r) for r in sink.read_sampled(spark).collect()} == sampled0
    assert {tuple(r) for r in sink.read_accounting(spark).collect()} == acct0

    audit = {r["source"]: r for r in sink.achieved_vs_planned(spark).collect()}
    assert audit["books"]["sampled_docs"] == audit["books"]["total_docs"] == 20
    assert audit["unplanned"]["total_docs"] == 1
    assert audit["unplanned"]["sampled_docs"] == 0
    assert audit["unplanned"]["planned_rate"] == 0.0
    # empty epoch: skipped entirely (no commit, no footer-less dirs)
    sink(b0.filter(F.lit(False)), 1)
    assert len(sink._committed()) == 1


def test_mixture_plan_sink_null_text_matches_batch_contract(spark, tmp_path):
    """NULL-text docs are excluded before sampling AND from accounting
    totals by default — the identical upstream filter the batch
    mixture_plan_execute query applies, so stream/batch parity holds on
    dirty corpora too."""
    from indicators_spark.streaming import MixturePlanSink

    sink = MixturePlanSink(str(tmp_path / "mix"), {"web": 1.0})
    b0 = spark.createDataFrame(
        [(1, "web", "real doc"), (2, "web", None), (3, "web", "another")],
        "doc_id long, source string, text string",
    )
    sink(b0, 0)
    assert {r["doc_id"] for r in sink.read_sampled(spark).collect()} == {1, 3}
    audit = sink.achieved_vs_planned(spark).collect()[0]
    assert audit["total_docs"] == 2 and audit["sampled_docs"] == 2


def test_mixture_plan_sink_audit_matches_batch_query(spark, tmp_path):
    """CROSS-IMPLEMENTATION pin: the sink's cumulative audit must equal
    the independently-written batch mixture_plan_execute query on the
    same corpus and plan — this is what actually enforces the bit-parity
    claim (seed, threshold rounding, token split, NULL-text filter all
    have two copies; a drift in either one fails here, where a
    sink-vs-its-own-sample compare cannot)."""
    from indicators_spark.queries import QUERIES
    from indicators_spark.streaming import MixturePlanSink

    sf = SF_SMOKE
    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    plan = QUERIES["mixture_token_budget"].spark(spark, sf)
    rates = {r["source"]: r["sample_rate"] for r in plan.collect()}

    sink = MixturePlanSink(str(tmp_path / "mix"), rates)
    sink(docs.filter(F.col("doc_id") % 2 == 0), 0)
    sink(docs.filter(F.col("doc_id") % 2 == 1), 1)

    got = {
        r["source"]: (
            r["total_docs"], r["planned_rate"],
            r["sampled_docs"], r["sampled_tokens"],
        )
        for r in sink.achieved_vs_planned(spark).collect()
    }
    want = {
        r["source"]: (
            r["total_docs"], r["planned_rate"],
            r["sampled_docs"], r["sampled_tokens"],
        )
        for r in QUERIES["mixture_plan_execute"].spark(spark, sf).collect()
    }
    assert got == want and len(got) > 0


def test_minhash_ingest_sink_incremental_and_replay(spark, tmp_path):
    """foreachBatch MinHash near-dup ingest: epoch 1's flags equal the
    batch operator run against epoch 0's band-key store (stream/batch
    parity), landed epochs are never re-flagged, and a replayed epoch is
    an exactly-once no-op for both the flagged data and the store."""
    from indicators_spark.functions.dedup import (
        batch_band_keys,
        minhash_dedup_against_corpus,
    )
    from indicators_spark.streaming import MinHashDedupIngestSink

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    e0 = docs.filter(F.col("doc_id") < 250)
    e1 = docs.filter(F.col("doc_id") >= 250)

    sink = MinHashDedupIngestSink(str(tmp_path / "ingest"))
    sink(e0, 0)
    sink(e1, 1)

    got = {
        tuple(r)
        for r in sink.read_flagged(spark)
        .join(e1.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    want = {
        tuple(r)
        for r in minhash_dedup_against_corpus(e1, batch_band_keys(e0)).collect()
    }
    assert got == want and len(got) > 0
    # NOT vacuous: the fixture must actually exercise the store-probe
    # and the flag decision (r8 review: got==want holds trivially if no
    # near-dups cross the split)
    assert any(r[1] > 0 for r in got), "no store hits — fixture degenerate"
    assert any(not r[3] for r in got), "nothing flagged — fixture degenerate"
    # epoch 0 was flagged with NO history (store side empty at the time)
    e0_rows = sink.read_flagged(spark).join(
        e0.select("doc_id"), "doc_id", "left_semi"
    )
    assert e0_rows.filter(F.col("n_store_bands") > 0).count() == 0

    # replay epoch 1: ledger skip; flagged rows and band store unchanged
    before = sink.read_flagged(spark).count()
    n_bands = spark.read.parquet(*sink._store_paths()).count()
    sink(e1, 1)
    assert sink.read_flagged(spark).count() == before
    assert spark.read.parquet(*sink._store_paths()).count() == n_bands


def test_minhash_ingest_sink_config_guards(spark, tmp_path):
    """Misconfiguration fails at construction, not inside the running
    stream: min_bands > bands is a silent no-op deduper, a bands value
    not dividing the signature length only errors on the first batch,
    and a store written with different bands has an incompatible
    key-struct schema."""
    from indicators_spark.streaming import MinHashDedupIngestSink

    with pytest.raises(ValueError, match="must be in"):
        MinHashDedupIngestSink(str(tmp_path / "a"), bands=4, min_bands=5)
    with pytest.raises(ValueError, match="must divide"):
        MinHashDedupIngestSink(str(tmp_path / "b"), bands=3)
    MinHashDedupIngestSink(str(tmp_path / "c"), bands=4)
    with pytest.raises(ValueError, match="refusing to mix"):
        MinHashDedupIngestSink(str(tmp_path / "c"), bands=2)


def test_run_ns_lossy_sanitization_disambiguated():
    """Distinct run ids that sanitize to the same string must get
    distinct namespaces (else the ledger silently skips the second
    run's real epochs)."""
    from indicators_spark.streaming.sinks import _run_ns

    assert _run_ns("a/1") != _run_ns("a_1")
    assert _run_ns("a_1") == "run-a_1"          # clean ids unchanged
    assert _run_ns(None) == "run-default"


def test_legacy_unsuffixed_markers_still_skip_epochs(spark, tmp_path):
    """Ledger-format migration (r9, ADVICE r8): commit markers written
    before the lossy-id md5 suffix existed use the bare sanitized tag;
    a post-suffix sink restarting the same run on such a PRE-SUFFIX
    store (no ``_format`` stamp, markers present) must treat those
    epochs as committed (else every legacy epoch re-ingests and
    duplicates), while writing only the new suffixed form for fresh
    epochs."""
    import os

    from indicators_spark.streaming import LineDedupIngestSink
    from indicators_spark.streaming.sinks import (
        ExactlyOnceParquetSink,
        _legacy_run_ns,
        _run_ns,
    )

    assert _legacy_run_ns("a_1") is None            # lossless: no legacy
    assert _legacy_run_ns(None) is None
    assert _legacy_run_ns("a/1") == "run-a_1"       # pre-suffix form

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    ).filter(F.col("doc_id") < 60)

    # simulate the pre-suffix store BEFORE constructing the sink: a
    # ledger that already holds a legacy marker and no _format stamp
    ledger = tmp_path / "a" / "_commits"
    os.makedirs(ledger)
    (ledger / "run-a_1-0").write_text("0")
    # the active legacy path is collision-prone (two lossy ids with one
    # sanitization share markers) — it must announce itself (ADVICE r9)
    with pytest.warns(UserWarning, match="sanitizes lossily"):
        sink = LineDedupIngestSink(str(tmp_path / "a"), run_id="a/1")
    assert sink._is_committed(0)
    sink(docs, 0)                                   # replay: must skip
    assert sink._store_paths() == []                # nothing ingested
    sink(docs, 1)                                   # fresh epoch ingests
    assert sink._is_committed(1)
    assert os.path.exists(
        os.path.join(sink.commit_dir, f"{_run_ns('a/1')}-1")
    )

    eo_ledger = tmp_path / "b" / "_commits"
    os.makedirs(eo_ledger / "run-a_1")
    (eo_ledger / "run-a_1" / "0").write_text("0")
    with pytest.warns(UserWarning, match="sanitizes lossily"):
        eo = ExactlyOnceParquetSink(str(tmp_path / "b"), run_id="a/1")
    assert eo._is_committed(0)
    assert eo.committed_epochs() == [0]             # listing agrees w/ skip
    eo(docs, 0)                                     # replay: must skip
    assert not os.path.exists(
        os.path.join(eo.data_dir, eo.run_ns, "epoch=0")
    )


def test_legacy_markers_ignored_on_current_format_stores(spark, tmp_path):
    """The collision the md5 suffix exists to prevent (r9 review): on a
    store CREATED by current code (``_format`` stamped), a lossy run id
    must never adopt a DIFFERENT lossless run's markers — run 'a/1'
    restarting at epoch 0 ingests its own epochs even though run 'a_1'
    committed the same epoch numbers."""
    import os

    from indicators_spark.streaming import LineDedupIngestSink
    from indicators_spark.streaming.sinks import ExactlyOnceParquetSink

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    ).filter(F.col("doc_id") < 60)

    first = LineDedupIngestSink(str(tmp_path / "a"), run_id="a_1")
    first(docs, 0)
    assert os.path.exists(str(tmp_path / "a" / "_commits" / "_format"))
    second = LineDedupIngestSink(str(tmp_path / "a"), run_id="a/1")
    assert second._legacy_ns is None
    assert not second._is_committed(0)              # a_1's marker ≠ a/1's
    second(docs, 0)                                 # really ingests
    assert second._is_committed(0)

    eo1 = ExactlyOnceParquetSink(str(tmp_path / "b"), run_id="a_1")
    eo1(docs, 0)
    eo2 = ExactlyOnceParquetSink(str(tmp_path / "b"), run_id="a/1")
    assert not eo2._is_committed(0)
    assert eo2.committed_epochs() == []             # THIS run: nothing yet


def test_compact_stages_then_renames(spark, tmp_path):
    """compact_store writes the merged base into a process-unique
    staging dir and renames it into place (no parquet write straight
    into the final name — two racing compactors can't interleave inside
    one directory), and a crash-leftover staging dir is swept by the
    next call's vacuum."""
    import os

    from indicators_spark.streaming import LineDedupIngestSink

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    )
    sink = LineDedupIngestSink(str(tmp_path / "a"), min_df=2)
    sink(docs.filter(F.col("doc_id") < 100), 0)
    root = sink.count_dir
    # crash leftover from a hypothetical earlier compactor
    stale = os.path.join(root, "compact-9.tmp-123-deadbeef")
    os.makedirs(stale)
    assert sink.compact_store(spark) == 1
    listing = os.listdir(root)
    assert not os.path.exists(stale)                # vacuumed
    assert not any(".tmp-" in d for d in listing)   # no staging residue
    assert len(sink._store_paths()) == 1


def test_line_sink_store_compaction_semantics(spark, tmp_path):
    """compact_store folds the per-epoch count dirs into one re-summed
    base WITHOUT changing any future dedup decision: a compacted sink
    and an uncompacted twin produce identical epoch-3 output, the
    compacted store holds the same lh→count totals in fewer (or equal)
    rows and ONE directory, and a replayed covered epoch is still
    skipped by the untouched ledger."""
    from indicators_spark.streaming import LineDedupIngestSink

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", F.regexp_replace("text", " ", "\n").alias("text")
    )
    epochs = [
        docs.filter(F.col("doc_id") % 3 == i).filter(F.col("doc_id") < 300)
        for i in range(3)
    ]
    a = LineDedupIngestSink(str(tmp_path / "a"), min_df=2)
    b = LineDedupIngestSink(str(tmp_path / "b"), min_df=2)
    for i in range(2):
        a(epochs[i], i)
        b(epochs[i], i)

    totals_before = {
        (r["lh"], r["c"])
        for r in spark.read.parquet(*a._store_paths())
        .groupBy("lh").agg(F.sum("c").cast("long").alias("c")).collect()
    }
    n_dirs_before = len(a._store_paths())
    folded = a.compact_store(spark)
    assert folded == 2 and len(a._store_paths()) == 1 < n_dirs_before
    totals_after = {
        (r["lh"], r["c"])
        for r in spark.read.parquet(*a._store_paths())
        .groupBy("lh").agg(F.sum("c").cast("long").alias("c")).collect()
    }
    assert totals_after == totals_before

    a(epochs[2], 2)
    b(epochs[2], 2)
    got = {
        tuple(r)
        for r in a.read_clean(spark)
        .join(epochs[2].select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    want = {
        tuple(r)
        for r in b.read_clean(spark)
        .join(epochs[2].select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    assert got == want and len(got) > 0

    # covered-epoch replay: markers survived compaction, nothing changes
    before = a.read_clean(spark).count()
    a(epochs[1], 1)
    assert a.read_clean(spark).count() == before
    # compaction is re-runnable: folds the new epoch into the base
    assert a.compact_store(spark) == 1
    assert len(a._store_paths()) == 1
    # idempotent when nothing is fresh
    assert a.compact_store(spark) == 0


def test_minhash_sink_store_compaction_semantics(spark, tmp_path):
    """Same contract for the band-key store (set combinator)."""
    from indicators_spark.streaming import MinHashDedupIngestSink

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    e0 = docs.filter(F.col("doc_id") < 150)
    e1 = docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
    e2 = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 450))

    a = MinHashDedupIngestSink(str(tmp_path / "a"))
    b = MinHashDedupIngestSink(str(tmp_path / "b"))
    a(e0, 0); b(e0, 0)
    a(e1, 1); b(e1, 1)
    assert a.compact_store(spark) == 2
    a(e2, 2); b(e2, 2)
    got = {
        tuple(r)
        for r in a.read_flagged(spark)
        .join(e2.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    want = {
        tuple(r)
        for r in b.read_flagged(spark)
        .join(e2.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    assert got == want and len(got) > 0


def test_substring_sink_store_compaction_semantics(spark, tmp_path):
    """Same contract for the gram store (distinct combinator): the
    compacted sink's next-epoch output equals the uncompacted twin's,
    and superseded dirs survive one generation (reader retention) before
    the next compaction's vacuum sweeps them."""
    import os

    from indicators_spark.streaming import SubstringDedupIngestSink

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    e0 = docs.filter(F.col("doc_id") < 120)
    e1 = docs.filter((F.col("doc_id") >= 120) & (F.col("doc_id") < 240))
    e2 = docs.filter((F.col("doc_id") >= 240) & (F.col("doc_id") < 360))

    a = SubstringDedupIngestSink(str(tmp_path / "a"), n=10)
    b = SubstringDedupIngestSink(str(tmp_path / "b"), n=10)
    a(e0, 0); b(e0, 0)
    a(e1, 1); b(e1, 1)
    assert a.compact_store(spark) == 2
    # one-generation retention: superseded epoch dirs still on disk,
    # already invisible to the reader
    on_disk = set(os.listdir(a.gram_dir))
    assert any(d.startswith("run-default-") for d in on_disk)
    assert len(a._store_paths()) == 1
    a(e2, 2); b(e2, 2)
    got = {
        tuple(r)
        for r in a.read_clean(spark)
        .join(e2.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    want = {
        tuple(r)
        for r in b.read_clean(spark)
        .join(e2.select("doc_id"), "doc_id", "left_semi")
        .collect()
    }
    assert got == want and len(got) > 0
    # the next compaction's START-of-run vacuum sweeps generation N-1
    # (run-default-0/1 were superseded by compact-1 and die here), while
    # the dirs THIS flip supersedes (compact-1, run-default-2) get their
    # own one-generation retention
    assert a.compact_store(spark) == 1
    after = set(os.listdir(a.gram_dir))
    assert not any(d.startswith("run-default-0") for d in after)
    assert not any(d.startswith("run-default-1") for d in after)
    assert {"compact-1", "compact-2", "run-default-2"} <= after
    # a no-op call is still the vacuum opportunity: nothing fresh, but
    # the superseded generation is swept
    assert a.compact_store(spark) == 0
    final = set(os.listdir(a.gram_dir))
    assert "compact-1" not in final and "run-default-2" not in final
    assert "compact-2" in final


# --------------------------------------------------------------------- #
# DriftMonitorSink (round 10): frozen-profile PSI per micro-batch
# --------------------------------------------------------------------- #


def _drift_ref(spark):
    # reference: uniform-ish 1..100
    return spark.createDataFrame(
        [(float(v),) for v in range(1, 101)], "x double"
    )


def test_psi_vs_reference_matches_python_replay(spark):
    """The frozen-profile PSI equals a pure-Python replay of the same
    conventions (full bin grid, Laplace smoothing over bins, 1e-9
    integer term snap) — including mass in a band the reference never
    populated."""
    import math

    from indicators_spark.functions.drift import (
        psi_reference_profile,
        psi_vs_reference_by_group,
    )

    ref = _drift_ref(spark)
    edges, counts = psi_reference_profile(ref, "x", bins=4)
    assert len(edges) == 3 and sum(counts) == 100
    rows = [("ok", float(v)) for v in range(1, 101)] + [
        ("hot", 1e6),
        ("hot", 2e6),
        ("hot", 3e6),
    ]
    df = spark.createDataFrame(rows, "src string, x double")
    got = {
        r["src"]: (r["n"], r["psi"], r["drifted"])
        for r in psi_vs_reference_by_group(
            df, "x", "src", edges, counts
        ).collect()
    }
    bins = len(counts)
    n_ref = sum(counts)
    for g in ("ok", "hot"):
        vs = [v for s, v in rows if s == g]
        cg = {}
        for v in vs:
            b = sum(1 for e in edges if v > e)
            cg[b] = cg.get(b, 0) + 1
        psi_int = 0
        for b in range(bins):
            pg = (cg.get(b, 0) + 1) / (len(vs) + bins)
            pr = (counts[b] + 1) / (n_ref + bins)
            psi_int += math.floor(
                (pg - pr) * math.log(pg / pr) * 1e9 + 0.500000001
            )
        psi = psi_int / 1e9
        want = (
            len(vs),
            math.floor(psi * 1e4 + 0.500000001) / 1e4,
            psi > 0.2,
        )
        assert got[g] == want, (g, got[g], want)
    # the in-distribution group must NOT alarm; the far-out one must
    assert not got["ok"][2] and got["hot"][2]


def test_drift_monitor_sink_replay_and_compaction(spark, tmp_path):
    from indicators_spark.functions.drift import psi_vs_reference_by_group
    from indicators_spark.streaming.sinks import DriftMonitorSink

    ref = _drift_ref(spark)
    sink = DriftMonitorSink(str(tmp_path / "mon"), ref, "x", "src", bins=4)

    def batch(shift):
        # group 'a' spans the reference's full range (2,4,..,100) —
        # in-distribution at shift 0; 'b' is a genuine subrange shift
        return spark.createDataFrame(
            [("a", float(2 * v + shift)) for v in range(1, 51)]
            + [("b", float(v)) for v in range(1, 21)],
            "src string, x double",
        )

    sink(batch(0), 0)
    sink(batch(500), 1)
    sink(batch(0), 1)  # replay: must be skipped by the ledger
    out = sink.read_monitor(spark)
    rows = {(r["epoch"], r["src"]): (r["psi"], r["drifted"]) for r in out.collect()}
    assert len(rows) == 4  # 2 epochs x 2 groups, replay not duplicated
    # epoch 1 kept its ORIGINAL (shifted) scores despite the replay
    direct = {
        r["src"]: (r["psi"], r["drifted"])
        for r in psi_vs_reference_by_group(
            batch(500), "x", "src", sink.edges, sink.ref_counts
        ).collect()
    }
    assert rows[(1, "a")] == direct["a"] and rows[(1, "b")] == direct["b"]
    assert rows[(1, "a")][1]  # the +500 shift alarms
    assert not rows[(0, "a")][1]
    # compaction folds the epoch dirs and preserves the row set
    before = sorted(tuple(r) for r in out.collect())
    assert sink.compact_store(spark) == 2
    after = sorted(tuple(r) for r in sink.read_monitor(spark).collect())
    assert before == after
    assert sink.compact_store(spark) == 0  # nothing fresh: no-op
    # a post-compaction epoch lands next to the compacted base
    sink(batch(0), 2)
    assert (
        sink.read_monitor(spark).select("epoch").distinct().count() == 3
    )


def test_drift_monitor_sink_through_foreachbatch(spark, tmp_path):
    """End-to-end through a real availableNow stream: the sink scores
    each micro-batch and the store holds one row set per epoch."""
    src_dir = tmp_path / "in"
    for i, shift in enumerate((0, 900)):
        spark.createDataFrame(
            [("a", float(3 * v + shift)) for v in range(1, 31)],
            "src string, x double",
        ).coalesce(1).write.parquet(str(src_dir / f"b{i}"))
    stream = (
        spark.readStream.schema("src string, x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    from indicators_spark.streaming.sinks import DriftMonitorSink

    sink = DriftMonitorSink(
        str(tmp_path / "mon"), _drift_ref(spark), "x", "src", bins=4
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = sink.read_monitor(spark)
    assert out.count() == 2  # one 'a' row per micro-batch
    assert {r["drifted"] for r in out.collect()} == {True, False}


def test_drift_monitor_sink_multi_run_availablenow(spark, tmp_path):
    """VERDICT r10 #7: a ≥2-epoch lifecycle ACROSS availableNow runs —
    run 1 (two micro-batches) → compaction (identity merge) → run 2
    appends fresh epochs next to the compacted base → a FULL REPLAY
    from a fresh checkpoint re-offers every epoch id and the ledger
    skips them all, leaving the store byte-identical."""
    from indicators_spark.streaming.sinks import DriftMonitorSink

    src_dir = tmp_path / "in"
    shifts = [0, 900]

    def add_files(new_shifts, start):
        for i, shift in enumerate(new_shifts, start=start):
            spark.createDataFrame(
                [("a", float(3 * v + shift)) for v in range(1, 31)],
                "src string, x double",
            ).coalesce(1).write.parquet(str(src_dir / f"b{i}"))

    def run(ckpt):
        stream = (
            spark.readStream.schema("src string, x double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir / "*"))
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .start()
        )
        q.awaitTermination(120)

    sink = DriftMonitorSink(
        str(tmp_path / "mon"), _drift_ref(spark), "x", "src", bins=4
    )
    add_files(shifts, 0)
    run("ckpt")
    assert sink.read_monitor(spark).count() == 2
    assert sink.compact_store(spark) == 2  # fold run 1 into the base

    # run 2 on the SAME checkpoint: only the new files become epochs,
    # appended next to the compacted base
    add_files([0, 900], 2)
    run("ckpt")
    out = {
        (r["epoch"], r["drifted"])
        for r in sink.read_monitor(spark).collect()
    }
    assert len(out) == 4
    assert {d for _, d in out} == {True, False}

    # full replay from a FRESH checkpoint: every epoch id re-offered,
    # every one skipped by the ledger — store unchanged through the
    # compacted-base + fresh-epoch mix
    before = sorted(
        tuple(r) for r in sink.read_monitor(spark).collect()
    )
    run("ckpt_replay")
    after = sorted(
        tuple(r) for r in sink.read_monitor(spark).collect()
    )
    assert before == after
