"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake dims / NotImplementedError for real codecs), but the
Spark-side plumbing — schema, batch shape, partition behavior — is real and
tested: this is exactly the pipeline shape a 100 TB multimodal corpus
needs (binary payloads never leave the executor; Arrow batches bound
memory; metadata stays columnar for pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema appended by decode_image_meta.
IMAGE_META_SCHEMA = (
    "width int, height int, n_bytes long, format string"
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a binary payload column (here: utf-8 bytes of the text — the
    test corpus has no real media; the pipeline treats it as opaque)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_type", F.lit("application/octet-stream")
    )


def fake_decode_dims(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for an image decoder: derives fake dims from
    the payload length.  Swap for PIL/libvips in a real deployment."""
    n = len(payload)
    return (n % 640 + 1, n % 480 + 1, "FAKE")


def decode_image_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode: payload → (width, height, n_bytes, format).

    Real Arrow plumbing: batches arrive as pandas DataFrames with a bytes
    column; per-batch vectorized metadata extraction; output schema is the
    input plus IMAGE_META_SCHEMA fields.  A real decoder would replace
    ``fake_decode_dims`` only."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [IMAGE_META_SCHEMA]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(fake_decode_dims)
            pdf = pdf.assign(
                width=dims.map(lambda d: d[0]),
                height=dims.map(lambda d: d[1]),
                n_bytes=pdf[payload_col].map(len),
                format=dims.map(lambda d: d[2]),
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample(df: DataFrame, every_n: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 1-in-n sampling by id (video frame-sampling stand-in):
    pure filter, fully pushed down."""
    return df.filter(F.col(id_col) % every_n == 0)


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode requires codecs absent from this container."""
    raise NotImplementedError(
        "audio codecs not available in this environment; plug a decoder "
        "into decode_image_meta's mapInPandas shape"
    )
