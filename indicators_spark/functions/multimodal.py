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


def _append_schema(df: DataFrame, extra: str) -> str:
    """Input schema + appended DDL fields, rejecting collisions — a
    second application (or an input that already carries an output
    column) would otherwise yield duplicate names that are unresolvable
    downstream."""
    extra_names = [p.strip().split()[0] for p in extra.split(",")]
    clash = set(extra_names) & set(df.columns)
    if clash:
        raise ValueError(
            f"output columns already present on the input: {sorted(clash)} "
            "— drop/rename them before reapplying this operator"
        )
    return ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [extra]
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
    ``fake_decode_dims`` only.  NULL payloads yield NULL metadata (the
    row survives — one undecodable asset must not kill the job)."""
    out_schema = _append_schema(df, IMAGE_META_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(
                lambda p: fake_decode_dims(p) if p is not None else (None,) * 3
            )
            pdf = pdf.assign(
                width=dims.map(lambda d: d[0]),
                height=dims.map(lambda d: d[1]),
                n_bytes=pdf[payload_col].map(
                    lambda p: len(p) if p is not None else None
                ),
                format=dims.map(lambda d: d[2]),
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def frame_sample(df: DataFrame, every_n: int = 10, id_col: str = "doc_id") -> DataFrame:
    """Deterministic 1-in-n sampling by id (video frame-sampling stand-in):
    pure filter, fully pushed down."""
    return df.filter(F.col(id_col) % every_n == 0)


#: One output row per audio frame (hop of a framed PCM stream).
AUDIO_FRAME_SCHEMA = (
    "frame_idx int, frame_start long, rms double, zero_crossings int, "
    "peak double"
)


def fake_decode_pcm(payload: bytes) -> "np.ndarray":
    """Deterministic stand-in for an audio codec: interpret the payload
    bytes as centered int8 samples in [-1, 1).  Swap for soundfile/ffmpeg
    in a real deployment — only this function changes; the framing and
    feature math below already operate on a PCM float array."""
    import numpy as np

    return (
        np.frombuffer(payload, dtype=np.uint8).astype(np.float64) - 128.0
    ) / 128.0


def audio_frame_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 256,
    hop: int = 128,
) -> DataFrame:
    """Decode → frame → per-frame features, one output row per frame.

    The 1:N exploding ``mapInPandas`` shape for audio: each input row
    (one clip) yields ``floor((n-frame_len)/hop)+1`` frame rows (the
    trailing partial hop is not emitted; clips shorter than one frame
    are zero-padded to exactly one) carrying
    (rms, zero_crossings, peak) — the standard VAD/silence-trim features.
    All math is vectorized numpy over a strided frame matrix; the payload
    bytes never leave the executor, and the output is narrow columnar
    metadata (ints/doubles) that downstream aggregations prune and push
    down like any other table.

    Scale: state is one batch at a time (Arrow-bounded); frames-per-clip
    is bounded by clip length, so output skew follows input clip-length
    skew — repartition on ``id_col`` first if clips vary wildly.
    """
    import numpy as np

    out_schema = f"{id_col} long, " + AUDIO_FRAME_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Output assembly is batched: one pandas DataFrame per ARROW BATCH,
        # not per clip.  The per-clip frame math is a handful of numpy
        # reductions, but a per-clip pd.DataFrame + pd.concat costs ~100 µs
        # of pandas overhead per clip — the dominant term for short clips
        # (measured ~2/3 of this kernel's runtime on the bench corpus).
        for pdf in batches:
            o_id, o_fi, o_fs, o_rms, o_zc, o_pk = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # undecodable asset: no frames, job survives
                pcm = fake_decode_pcm(payload)
                if len(pcm) < frame_len:
                    pcm = np.pad(pcm, (0, frame_len - len(pcm)))
                n_frames = (len(pcm) - frame_len) // hop + 1
                idx = (
                    np.arange(frame_len)[None, :]
                    + hop * np.arange(n_frames)[:, None]
                )
                frames = pcm[idx]  # (n_frames, frame_len)
                o_id.append(np.full(n_frames, doc_id, dtype=np.int64))
                o_fi.append(np.arange(n_frames, dtype=np.int32))
                o_fs.append(hop * np.arange(n_frames))
                o_rms.append(np.sqrt((frames**2).mean(axis=1)))
                o_zc.append(
                    (np.diff(np.signbit(frames), axis=1) != 0)
                    .sum(axis=1)
                    .astype(np.int32)
                )
                o_pk.append(np.abs(frames).max(axis=1))
            if o_id:
                yield pd.DataFrame(
                    {
                        id_col: np.concatenate(o_id),
                        "frame_idx": np.concatenate(o_fi),
                        "frame_start": np.concatenate(o_fs),
                        "rms": np.concatenate(o_rms),
                        "zero_crossings": np.concatenate(o_zc),
                        "peak": np.concatenate(o_pk),
                    }
                )

    return df.mapInPandas(run, out_schema)


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real audio decode requires codecs absent from this container; see
    ``audio_frame_features`` for the full framing pipeline over the
    deterministic fake decoder."""
    raise NotImplementedError(
        "audio codecs not available in this environment; plug a decoder "
        "into fake_decode_pcm — framing/features in audio_frame_features "
        "are codec-agnostic"
    )


#: One output row per sampled video frame.
VIDEO_FRAME_SCHEMA = "frame_idx int, pts_ms long, byte_offset long"

#: Fake container parameters: fixed per-frame byte size and frame rate.
VIDEO_FRAME_BYTES, VIDEO_FPS = 32, 25


def video_frame_sample(
    df: DataFrame,
    stride: int = 5,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-clip video frame sampling — the 1:N ``mapInPandas`` shape for
    video: each clip row explodes into one row per ``stride``-th frame with
    its presentation timestamp and byte offset.  The *container parse*
    (frame count = payload bytes / frame size, fixed fps) is a
    deterministic stand-in — a real demuxer (PyAV/ffmpeg) would replace
    only ``_frames_of``; the Spark plumbing (Arrow batches in, exploded
    narrow rows out, payload never leaves the executor) is the real thing.

    Scale shape: zero shuffles; output is narrow frame metadata, so the
    1:N fan-out (bounded by clip length / stride) never amplifies payload
    bytes.  Skew follows clip-length skew — repartition on clip id first
    for mixed-length corpora.
    """
    out_schema = f"{id_col} long, {VIDEO_FRAME_SCHEMA}"

    def _frames_of(payload: bytes) -> int:
        return max(1, len(payload) // VIDEO_FRAME_BYTES)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, pts, off = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # undecodable asset: no frames, job survives
                n = _frames_of(payload)
                for f in range(0, n, stride):
                    ids.append(i)
                    fidx.append(f)
                    pts.append(f * 1000 // VIDEO_FPS)
                    off.append(f * VIDEO_FRAME_BYTES)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "pts_ms": pts, "byte_offset": off}
            )

    return df.select(id_col, payload_col).mapInPandas(run, out_schema)


#: Output schema appended by resize_image.
RESIZE_META_SCHEMA = "out_width int, out_height int, out_bytes long"


def resize_image(
    df: DataFrame,
    target_width: int = 64,
    target_height: int = 64,
    payload_col: str = "payload",
) -> DataFrame:
    """Image resize plumbing — the payload-to-payload ``mapInPandas``
    shape (decode → transform → re-encode).  The pixel work is a
    deterministic stand-in (output byte budget = w·h·3 — swap in
    PIL/libvips inside ``_resize_bytes`` for real images); the Spark side
    is real: Arrow batches in, transformed binary + metadata out, payloads
    stay on executors, and the narrow metadata columns remain available
    for pruning/filter pushdown downstream.

    Scale shape: zero shuffles, compute-bound map — the ideal 100 TB
    operator; batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``)
    bounds executor memory for large payloads.
    """
    budget = target_width * target_height * 3

    def _resize_bytes(payload: bytes | None) -> bytes | None:
        if payload is None:
            return None  # NULL asset passes through as NULL
        reps = -(-budget // max(len(payload), 1))  # ceil
        return (payload * reps)[:budget]

    out_schema = _append_schema(df, RESIZE_META_SCHEMA)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.assign(**{payload_col: pdf[payload_col].map(_resize_bytes)})
            pdf = pdf.assign(
                out_width=target_width,
                out_height=target_height,
                out_bytes=pdf[payload_col].map(
                    lambda p: len(p) if p is not None else None
                ),
            )
            yield pdf

    return df.mapInPandas(run, out_schema)


def phash64(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual average-hash (aHash) over decoded payload bytes: the
    byte stream is partitioned into 64 contiguous blocks (byte i → block
    ``i·64/n``), and bit b is set iff block b's mean exceeds the overall
    byte mean — compared ENTIRELY in integer arithmetic
    (``sum_b·n > total·size_b``), so the hash is bit-reproducible on any
    engine with no float-ordering hazard at all.  Payloads shorter than
    64 bytes are skipped (no full block partition exists).

    This is the image near-dup primitive: identical-looking media collide
    even when bytes differ slightly (real deployments decode pixels first
    — swap the byte source exactly like the other fake-codec ops).
    Zero shuffle; one Arrow map stage."""
    import numpy as np

    schema = f"{id_col} long, phash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue  # undecodable asset: no hash, job survives
                b = np.frombuffer(payload, dtype=np.uint8)
                n = len(b)
                if n < 64:
                    continue
                blocks = (np.arange(n, dtype=np.int64) * 64) // n
                sums = np.bincount(blocks, weights=b, minlength=64).astype(
                    np.int64
                )
                sizes = np.bincount(blocks, minlength=64).astype(np.int64)
                total = int(b.sum(dtype=np.int64))
                # arbitrary-precision Python ints: sums*n / total*sizes
                # overflow int64 around ~1.5 GB payloads, which would
                # silently corrupt bits under numpy's wrapping arithmetic
                sums_l, sizes_l = sums.tolist(), sizes.tolist()
                h = 0
                for j in range(64):
                    if sums_l[j] * n > total * sizes_l[j]:
                        h |= 1 << j
                # store as signed int64 (Spark long)
                if h >= 1 << 63:
                    h -= 1 << 64
                ids.append(rid)
                hashes.append(h)
            yield pd.DataFrame({id_col: ids, "phash": hashes})

    return df.select(id_col, payload_col).mapInPandas(run, schema)
