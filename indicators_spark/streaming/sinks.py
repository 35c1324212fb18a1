"""Exactly-once streaming sinks via ``foreachBatch``.

Structured Streaming delivers ``(batch_df, epoch_id)`` to ``foreachBatch``
at-least-once: after a failure the SAME epoch can be replayed.  Exactly-once
therefore means *idempotent writes keyed by epoch_id*.  Two standard shapes:

* :class:`ExactlyOnceParquetSink` — the transactional-directory (commit
  ledger) pattern: each epoch's data lands in its own directory, then the
  epoch id is recorded atomically in a ``_commits/`` ledger.  A replayed
  epoch is detected in the ledger and skipped; a crash between data write
  and ledger write leaves an uncommitted directory that readers (which
  trust only the ledger) never see, and the replay simply overwrites it.
  This is the same commit-protocol idea that table formats implement
  natively (Delta's ``_delta_log``, Iceberg snapshots) — reproduced here
  because no lakehouse jars ship in this environment.
* :func:`upsert_batch` — keyed idempotence: routing each micro-batch
  through ``merge_upsert`` (latest-wins by key+version) makes replays
  no-ops without any ledger, at the cost of rewriting the keyed store.

Scale: the ledger write is a driver-side O(1) rename per epoch; data
writes are fully parallel. Reads list the ledger (tiny) and plan a normal
multi-path parquet scan over committed epochs only, so partition pruning
and pushdown behave exactly as for any static table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class ExactlyOnceParquetSink:
    """Idempotent ``foreachBatch`` target: parquet-per-epoch + commit ledger.

    Usage::

        sink = ExactlyOnceParquetSink("/data/out")
        stream.writeStream.foreachBatch(sink).start()
        ...
        committed = sink.read(spark)   # sees only committed epochs
    """

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.commit_dir = os.path.join(out_dir, "_commits")
        os.makedirs(self.commit_dir, exist_ok=True)

    def _commit_path(self, epoch_id: int) -> str:
        return os.path.join(self.commit_dir, str(epoch_id))

    def committed_epochs(self) -> list[int]:
        return sorted(
            int(f) for f in os.listdir(self.commit_dir) if f.isdigit()
        )

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if os.path.exists(self._commit_path(epoch_id)):
            return  # replayed epoch: already committed, exactly-once skip
        path = os.path.join(self.data_dir, f"epoch={epoch_id}")
        # overwrite: a half-written directory from a pre-commit crash is
        # harmless (not in the ledger) and replaced wholesale on replay
        batch_df.write.mode("overwrite").parquet(path)
        # atomic commit: tmp file + rename is atomic on POSIX; on object
        # stores this would be a conditional PUT / metastore transaction
        tmp = self._commit_path(epoch_id) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(epoch_id))
        os.rename(tmp, self._commit_path(epoch_id))

    def read(self, spark: SparkSession) -> DataFrame:
        """Read ONLY committed epochs (ledger-trusting reader)."""
        paths = [
            os.path.join(self.data_dir, f"epoch={e}")
            for e in self.committed_epochs()
        ]
        if not paths:
            raise ValueError("no committed epochs yet")
        return spark.read.parquet(*paths)


class UpsertParquetSink:
    """``foreachBatch`` target that MERGEs each micro-batch into a keyed
    parquet store via latest-wins ``merge_upsert``.

    Copy-on-write with an atomic pointer swap: each epoch reads the current
    version directory, merges the batch distributed (one shuffle on the
    key), writes a NEW version directory, then flips a ``_latest`` pointer
    file by atomic rename — never a driver-side collect, never overwriting
    a directory being read.  Idempotent under epoch replay twice over: a
    replayed epoch is skipped by the pointer (named by epoch), and even a
    re-merge of the same rows is a no-op because latest-wins by
    (key, order_col) is idempotent.  This is exactly Delta/Iceberg's MERGE
    commit protocol minus the manifest format.
    """

    def __init__(self, store_dir: str, key: str, order_col: str) -> None:
        self.store_dir = store_dir
        self.key = key
        self.order_col = order_col
        os.makedirs(store_dir, exist_ok=True)
        self._pointer = os.path.join(store_dir, "_latest")

    def _current_version(self) -> str | None:
        if not os.path.exists(self._pointer):
            return None
        with open(self._pointer) as f:
            return f.read().strip()

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..functions.merge import merge_upsert

        version = f"v{epoch_id}"
        cur = self._current_version()
        if cur is not None and int(cur[1:]) >= epoch_id:
            return  # replayed epoch already merged: exactly-once skip
        spark = batch_df.sparkSession
        if cur is None:
            # First epoch still applies latest-wins WITHIN the batch: an
            # intra-batch duplicate key must not seed the store with two
            # rows (the per-key contract holds from epoch 0).
            from pyspark.sql import Window as _W
            from pyspark.sql import functions as _F

            w = _W.partitionBy(self.key).orderBy(
                _F.col(self.order_col).desc()
            )
            merged = (
                batch_df.withColumn("_rn", _F.row_number().over(w))
                .filter(_F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            target = spark.read.parquet(os.path.join(self.store_dir, cur))
            merged = merge_upsert(target, batch_df, self.key, self.order_col)
        merged.write.mode("overwrite").parquet(
            os.path.join(self.store_dir, version)
        )
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(version)
        os.rename(tmp, self._pointer)
        # Vacuum: superseded versions are dead after the pointer flip;
        # retain ONE prior version for readers that resolved the pointer
        # just before the flip, delete anything older (without this the
        # copy-on-write store grows by a full copy per epoch).
        import shutil

        keep = {version, cur} if cur is not None else {version}
        for d in os.listdir(self.store_dir):
            if (
                d.startswith("v")
                and d[1:].isdigit()
                and d not in keep
            ):
                shutil.rmtree(os.path.join(self.store_dir, d), ignore_errors=True)

    def read(self, spark: SparkSession) -> DataFrame:
        cur = self._current_version()
        if cur is None:
            raise ValueError("store is empty")
        return spark.read.parquet(os.path.join(self.store_dir, cur))
