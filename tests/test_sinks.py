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
