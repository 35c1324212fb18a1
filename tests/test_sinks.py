"""Source/sink round-trips: partitioned parquet write → read-back, and the
CSV/JSON read paths (schema-pinned, no inference in prod)."""

from __future__ import annotations

from pyspark.sql import functions as F

from indicators_spark import Indicators
from indicators_spark.sources.prices import prices_from_events

from conftest import SF_SMOKE


def test_partitioned_parquet_roundtrip(spark, tmp_path):
    out = str(tmp_path / "prices_by_symbol")
    p = prices_from_events(spark, SF_SMOKE)
    enriched = Indicators(p, order_by=("timestamp", "seq")).sma(["close"], 5).collect()
    enriched.write.mode("overwrite").partitionBy("symbol").parquet(out)

    back = spark.read.parquet(out)
    assert back.count() == enriched.count()
    # partition pruning: a symbol filter must prune directories
    plan = back.filter(F.col("symbol") == "click")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(symbol" in plan, plan
    # values survive the round trip
    a = sorted(enriched.select("seq", "close_sma_5").collect())
    b = sorted(back.select("seq", "close_sma_5").collect())
    assert a == b


def test_csv_json_roundtrip(spark, tmp_path):
    # deterministic subset (limit() without order can differ between actions)
    p = prices_from_events(spark, SF_SMOKE).filter(F.col("seq") < 100)
    csv_dir, json_dir = str(tmp_path / "csv"), str(tmp_path / "json")
    p.write.mode("overwrite").option("header", True).csv(csv_dir)
    p.write.mode("overwrite").json(json_dir)

    csv_back = spark.read.schema(p.schema).option("header", True).csv(csv_dir)
    json_back = spark.read.schema(p.schema).json(json_dir)
    assert csv_back.count() == 100
    assert json_back.count() == 100
    # nullability flags differ through file formats; names+types must hold
    assert [(f.name, f.dataType) for f in csv_back.schema.fields] == [
        (f.name, f.dataType) for f in p.schema.fields
    ]
    assert {r["seq"] for r in json_back.select("seq").collect()} == {
        r["seq"] for r in p.select("seq").collect()
    }


def test_write_clustered_layout_and_pruning(spark, tmp_path):
    from indicators_spark.sources.io import read_batch, write_clustered

    out = str(tmp_path / "clustered")
    p = prices_from_events(spark, SF_SMOKE)
    write_clustered(
        p,
        out,
        partition_by=("symbol",),
        cluster_by=("timestamp", "seq"),
        max_records_per_file=100,
    )
    back = read_batch(spark, out)
    assert back.count() == p.count()
    # maxRecordsPerFile bounds file sizes: >= ceil(rows/100) data files
    assert len(back.inputFiles()) >= back.count() // 100
    # row-group clustering: within every (symbol, file) the seq column
    # arrives sorted, so min/max stats are disjoint and prunable
    import pyspark.sql.functions as SF

    rows = (
        back.withColumn("_file", SF.input_file_name())
        .groupBy("_file")
        .agg(
            SF.min_by("seq", "timestamp").alias("first_seq"),
            SF.expr("bool_and(seq is not null)").alias("ok"),
        )
    )
    assert rows.filter(~SF.col("ok")).count() == 0


def test_compact_reduces_file_count(spark, tmp_path):
    from indicators_spark.sources.io import compact, read_batch

    src = str(tmp_path / "fragmented")
    p = prices_from_events(spark, SF_SMOKE)
    p.repartition(24).write.parquet(src)  # 24 small files
    n_in = compact(spark, src, target_files=2)
    assert n_in == 24
    back = read_batch(spark, src + "_compacted")
    assert len(back.inputFiles()) == 2
    assert back.count() == p.count()


def test_read_batch_requires_schema_for_text_formats(spark, tmp_path):
    import pytest

    from indicators_spark.sources.io import read_batch

    with pytest.raises(ValueError, match="explicit schema"):
        read_batch(spark, str(tmp_path), fmt="csv")
    with pytest.raises(ValueError, match="unsupported format"):
        read_batch(spark, str(tmp_path), fmt="avro")


def test_file_stream_source_matches_batch(spark, tmp_path):
    """The file-discovery stream over a static directory produces exactly
    the batch result (one file per micro-batch)."""
    from indicators_spark.sources.io import stream_source

    src = str(tmp_path / "jsonl")
    p = prices_from_events(spark, SF_SMOKE).filter(F.col("seq") < 60)
    p.repartition(3).write.json(src)
    stream = stream_source(spark, src, p.schema, fmt="json")
    assert stream.isStreaming
    agg = stream.groupBy("symbol").count()
    q = (
        agg.writeStream.format("memory")
        .queryName("io_stream_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["symbol"]: r["count"]
        for r in spark.sql("SELECT * FROM io_stream_counts").collect()
    }
    want = {r["symbol"]: r["count"] for r in p.groupBy("symbol").count().collect()}
    assert got == want


def test_zordered_write_localizes_all_dimensions(spark, tmp_path):
    """Z-order layout: after write_zordered on (user_id, value), EVERY
    file's parquet min/max range must be narrow on BOTH columns — the
    multi-dimensional data-skipping property a single-column sort can't
    give (its second column spans the full range in every file)."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from indicators_spark.sources.io import write_zordered
    from indicators_spark.sources.prices import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    out = str(tmp_path / "zordered")
    write_zordered(ev, out, zorder_by=("user_id", "value"), n_files=16)

    def mean_range_frac(path, col):
        lo, hi = ev.agg(F.min(col), F.max(col)).first()
        span = float(hi) - float(lo)
        fracs = []
        for f in Path(path).glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            idx = md.schema.names.index(col)
            mn = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            mx = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            fracs.append((float(mx) - float(mn)) / span)
        assert fracs, "no files written"
        return sum(fracs) / len(fracs)

    # 16 files over a 2-D z-curve → each dim localizes to ~1/4 of its
    # range per file; allow generous slack for bucket-boundary files.
    assert mean_range_frac(out, "user_id") < 0.6
    assert mean_range_frac(out, "value") < 0.6

    # contrast: a plain single-column clustered write leaves the OTHER
    # column substantially less localized than the z-order layout does
    naive = str(tmp_path / "naive")
    ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id").write.parquet(naive)
    assert mean_range_frac(naive, "value") > 1.5 * mean_range_frac(out, "value")


def test_python_datasource_ticks(spark):
    """Custom Python DataSource V2: partition count honors the option,
    rows follow the integer-exact formula, and symbol-equality predicates
    push into the source (consumed by pushFilters, not a post-scan
    Filter)."""
    from indicators_spark.sources.pysource import (
        register_ticks_source,
        tick_row,
    )

    register_ticks_source(spark)
    df = (
        spark.read.format("synthetic_ticks")
        .option("rows", 400)
        .option("symbols", 4)
        .option("partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 400
    got = sorted(tuple(r) for r in df.limit(5).collect())
    assert got == sorted(tick_row(i, 4) for i in range(5))

    flt = df.filter(df.symbol == "S2")
    assert flt.count() == 100
    plan = flt._jdf.queryExecution().executedPlan().toString()
    # the equality predicate was consumed by the source; only the
    # isnotnull guard may remain in a post-scan Filter
    assert "S2" not in plan


def test_python_datasource_stream_matches_batch(spark):
    """The connector's micro-batch stream must emit exactly the batch
    reader's rows (same formula, offsets are row ranges)."""
    from indicators_spark.sources.pysource import register_ticks_source

    register_ticks_source(spark)
    stream = (
        spark.readStream.format("synthetic_ticks")
        .option("symbols", 4)
        .option("batchRows", 700)
        .option("maxRows", 3000)
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("ticks_stream_out")
        .start()
    )
    # the simple stream advances one batchRows window per poll, so drain
    # until the offset stops moving (bounded by maxRows), then stop
    import time as _time

    deadline = _time.time() + 120
    while _time.time() < deadline:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) c FROM ticks_stream_out").first().c
        if n >= 3000:
            break
        _time.sleep(0.3)
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM ticks_stream_out").collect()}
    batch = {
        tuple(r)
        for r in spark.read.format("synthetic_ticks")
        .option("rows", 3000)
        .option("symbols", 4)
        .load()
        .collect()
    }
    assert got == batch
    assert len(got) == 3000


def test_python_datasource_conjunctive_filters_and_degenerate_options(spark):
    """Pushed filters are a CONJUNCTION: two different symbol equalities
    must yield zero rows (not the union).  rows=0 must plan an empty
    DataFrame, not crash."""
    from indicators_spark.sources.pysource import register_ticks_source

    register_ticks_source(spark)
    df = (
        spark.read.format("synthetic_ticks")
        .option("rows", 200)
        .option("symbols", 4)
        .load()
    )
    assert df.filter((df.symbol == "S0") & (df.symbol == "S1")).count() == 0
    assert df.filter(df.symbol == "S0").count() == 50
    empty = spark.read.format("synthetic_ticks").option("rows", 0).load()
    assert empty.count() == 0


def test_write_read_csv_roundtrip_via_module(spark, tmp_path):
    """write_clustered + read_batch must round-trip CSV exactly: the
    writer emits the header the reader is contracted to skip (a headerless
    file under header=true silently loses its first data row)."""
    from indicators_spark.sources.io import read_batch, write_clustered

    p = prices_from_events(spark, SF_SMOKE).filter(F.col("seq") < 50)
    d = str(tmp_path / "csv_rt")
    write_clustered(p, d, fmt="csv")
    back = read_batch(spark, d, fmt="csv", schema=p.schema)
    assert back.count() == 50
    assert {r["seq"] for r in back.select("seq").collect()} == set(range(50))


def test_compact_requires_schema_for_text_and_keeps_partitions(spark, tmp_path):
    """compact reads through read_batch (schema discipline holds) and a
    partitioned source keeps its directory layout when partition_by is
    passed."""
    import pytest as _pytest

    from indicators_spark.sources.io import compact, read_batch, write_clustered

    p = prices_from_events(spark, SF_SMOKE).filter(F.col("seq") < 60)
    with _pytest.raises(ValueError, match="schema"):
        compact(spark, str(tmp_path / "nope"), 2, fmt="csv")

    src = str(tmp_path / "part")
    write_clustered(p.repartition(4), src, partition_by=("symbol",))
    compact(spark, src, 2, partition_by=("symbol",))
    import os

    out = src + "_compacted"
    assert any(d.startswith("symbol=") for d in os.listdir(out)), os.listdir(out)
    assert read_batch(spark, out).count() == 60


def test_zorder_empty_input_clear_error(spark, tmp_path):
    import pytest as _pytest

    from indicators_spark.sources.io import write_zordered

    p = prices_from_events(spark, SF_SMOKE).filter(F.col("seq") < 0)
    with _pytest.raises(ValueError, match="no non-null values"):
        write_zordered(p, str(tmp_path / "z"), zorder_by=("seq", "close"))


def test_ticks_stream_clamps_degenerate_batch_rows(spark):
    """batchRows <= 0 must not stall the stream with a never-advancing
    offset; the reader clamps to 1 like the batch reader."""
    from indicators_spark.sources.pysource import TicksStreamReader

    r = TicksStreamReader({"batchRows": "0", "maxRows": "3", "symbols": "2"})
    rows, off = r.read({"seq": 0})
    assert off == {"seq": 1} and len(list(rows)) == 1
    r2 = TicksStreamReader({"batchRows": "-5", "maxRows": "3"})
    _, off2 = r2.read({"seq": 0})
    assert off2["seq"] > 0
