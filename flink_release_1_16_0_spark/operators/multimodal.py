"""Multimodal (binary media) column plumbing for training-data pipelines.

Treats image/audio/video payloads as opaque `binary` columns with a
typed metadata struct, processed by Arrow-batched pandas functions via
mapInPandas — the Spark-side pattern a real decoder (PIL/ffmpeg/torch)
slots into. This container ships no media libraries, so `decode_media`
is a clearly-marked stub: the REAL parts — schema, batch iteration,
Arrow transfer, partition-parallel execution — are what these operators
exercise and test.

At 100 TB: binary payloads stay columnar in parquet, mapInPandas
processes them partition-parallel with zero shuffle; metadata-only
queries prune the binary column entirely (columnar reader never touches
the bytes — check ReadSchema in .explain).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id bigint, byte_len bigint, content_hash string, "
    "fake_width int, fake_height int"
)


def with_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Derive a deterministic binary payload column from text (the
    fixtures carry no real media; UTF-8 bytes stand in for an encoded
    image). Schema: (media_id, payload binary)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_media(real_decode: bool = False):
    """Returns a mapInPandas function extracting per-payload metadata.

    With real_decode=True this is where PIL/ffmpeg would run — stubbed
    with NotImplementedError in this container. The deterministic fake
    path derives metadata purely from the bytes (length + md5 + a
    pseudo width/height from the length) so results are reproducible
    and oracle-checkable.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        if real_decode:
            raise NotImplementedError(
                "media decoding libraries (PIL/ffmpeg) are not available in "
                "this environment; plug the real decoder in here"
            )
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(len)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": n.astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "fake_width": (n % 640 + 16).astype("int32"),
                    "fake_height": (n % 480 + 16).astype("int32"),
                }
            )

    return fn


def extract_media_metadata(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Partition-parallel metadata extraction over the binary column."""
    return media.mapInPandas(decode_media(real_decode), schema=MEDIA_META_SCHEMA)


FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_len bigint, frame_hash string"


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one binary payload -> up to ``n_frames`` rows
    (the 1->N mapInPandas shape a video pipeline uses — ffmpeg keyframe
    extraction slots in where the byte slicing sits). Frames are the
    evenly-spaced contiguous chunks [i*step, (i+1)*step) with
    step = max(len // n_frames, 1); deterministic, so frame lengths and
    content hashes are oracle-checkable.

    At 100 TB: partition-parallel, zero shuffle, output rows carry no
    payload unless the caller asks — downstream feature extraction
    reads frames without re-decoding the source.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out: list[tuple] = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                size = len(b)
                if size == 0:
                    continue
                step = max(size // n_frames, 1)
                for i in range(n_frames):
                    start = i * step
                    if start >= size:
                        break
                    chunk = b[start : start + step]
                    out.append(
                        (mid, i, len(chunk), hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_len", "frame_hash"]
            )

    return media.mapInPandas(fn, schema=FRAME_SCHEMA)
