"""IVF index-maintenance ingest sink (streaming complement of
similarity.knn_ivf): stream/batch assignment parity, earlier-wins,
replay idempotence, compaction, configuration guards, and end-to-end
search equality through knn_ivf_from_index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from indicators_spark.functions.similarity import (
    ivf_assign_cells,
    ivf_centroids,
    knn_ivf,
    knn_ivf_from_index,
)
from indicators_spark.streaming.sinks import IvfIndexIngestSink


def _vecs(spark, n=120, dim=8, start=0):
    rows = [
        (
            i,
            [
                float(((i * 31 + j * 17) % 23) - 11) / 7.0
                for j in range(dim)
            ],
        )
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _run(spark, src_dir, sink, ckpt):
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    q.awaitTermination(120)


def test_ivf_sink_matches_batch_assignment_and_search(spark, tmp_path):
    """Two availableNow epochs; the maintained index's assignments must
    equal ivf_assign_cells over the concatenated corpus, and searching
    THROUGH the index (knn_ivf_from_index) must be bit-identical to
    knn_ivf recomputing assignment from scratch."""
    full = _vecs(spark, n=120)
    cents = ivf_centroids(full, 8)
    src = tmp_path / "in"
    _vecs(spark, n=60, start=0).coalesce(1).write.parquet(str(src / "b0"))
    _vecs(spark, n=60, start=60).coalesce(1).write.parquet(str(src / "b1"))
    sink = IvfIndexIngestSink(str(tmp_path / "ivf"), cents)
    _run(spark, src, sink, tmp_path / "ckpt")

    idx = sink.read_index(spark)
    got = {(r["vec_id"], r["cid"]) for r in idx.collect()}
    want = {
        (r["nid"], r["cid"])
        for r in ivf_assign_cells(full, cents).collect()
    }
    assert got == want and len(got) == 120

    queries = _vecs(spark, n=6, start=200)
    via_index = knn_ivf_from_index(
        full, idx, queries, cents, k=3, nprobe=2
    )
    fresh = knn_ivf(full, queries, k=3, nprobe=2, n_centroids=8)
    assert sorted(map(tuple, via_index.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_ivf_sink_replay_earlier_wins_and_compaction(spark, tmp_path):
    """Full replay from a fresh checkpoint is a ledger-skipped no-op;
    an id re-ingested in a later epoch keeps its first committed row;
    compaction preserves the earlier-wins view byte-for-byte."""
    cents = ivf_centroids(_vecs(spark, n=40), 4)
    src = tmp_path / "in"
    _vecs(spark, n=40, start=0).coalesce(1).write.parquet(str(src / "b0"))
    sink = IvfIndexIngestSink(str(tmp_path / "ivf"), cents)
    _run(spark, src, sink, tmp_path / "ckpt")
    first = {
        r["vec_id"]: (r["cid"], r["epoch"])
        for r in sink.read_index(spark).collect()
    }

    # epoch 2: ids 20..59 — 20 overlap (must keep their epoch-0 rows),
    # 20 new
    _vecs(spark, n=40, start=20).coalesce(1).write.parquet(str(src / "b1"))
    _run(spark, src, sink, tmp_path / "ckpt")
    rows = {
        r["vec_id"]: (r["cid"], r["epoch"])
        for r in sink.read_index(spark).collect()
    }
    assert len(rows) == 60
    for i in range(40):
        assert rows[i] == first[i]  # earlier row survived, epoch 0
    assert all(rows[i][1] == 1 for i in range(40, 60))

    before = sorted(tuple(r) for r in sink.read_index(spark).collect())
    assert sink.compact_store(spark) == 2
    assert sorted(tuple(r) for r in sink.read_index(spark).collect()) == before

    # full replay from a fresh checkpoint: every epoch re-offered,
    # every one skipped — index unchanged through the compacted base
    _run(spark, src, sink, tmp_path / "ckpt_replay")
    assert sorted(tuple(r) for r in sink.read_index(spark).collect()) == before


def test_ivf_sink_guards(spark, tmp_path):
    cents = ivf_centroids(_vecs(spark, n=20), 4)
    with pytest.raises(ValueError, match="empty centroid"):
        IvfIndexIngestSink(str(tmp_path / "a"), [])
    with pytest.raises(ValueError, match="ragged"):
        IvfIndexIngestSink(
            str(tmp_path / "b"), [(0, [1.0, 2.0]), (1, [1.0])]
        )
    with pytest.raises(ValueError, match="duplicate centroid"):
        IvfIndexIngestSink(
            str(tmp_path / "c"), [(0, [1.0]), (0, [2.0])]
        )
    # quantizer pin: a second sink with different centroids on the same
    # store is refused
    IvfIndexIngestSink(str(tmp_path / "d"), cents)
    with pytest.raises(ValueError, match="different coarse quantizer"):
        IvfIndexIngestSink(str(tmp_path / "d"), cents[:-1])
    # duplicate ids within one batch fail the epoch loudly
    sink = IvfIndexIngestSink(str(tmp_path / "e"), cents)
    dup = _vecs(spark, n=10).withColumn(
        "vec_id", F.col("vec_id") % 5
    )
    with pytest.raises(ValueError, match="duplicate vec_id"):
        sink(dup, 0)
    # the failed epoch is not committed: a clean retry with fixed data
    # lands it
    sink(_vecs(spark, n=10), 0)
    assert sink.read_index(spark).count() == 10
