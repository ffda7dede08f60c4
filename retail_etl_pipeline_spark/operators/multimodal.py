"""Multimodal column plumbing (SURVEY.md §2.10).

Image/audio/video content rides as opaque ``binary`` columns with a typed
metadata struct; per-item processing (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched Pandas functions over
``mapInPandas`` — the schema, partitioning, UDF signature, and batch shape
are real and tested. The actual media decode is STUBBED (the image/audio
libraries are not in this container): ``decode_image`` raises
``NotImplementedError``; ``extract_features`` uses a deterministic
byte-level feature (length + md5) so the full pipeline is verifiable
end-to-end — including against the DuckDB oracle, since md5 over the same
bytes is engine-independent.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata carried next to every binary payload
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_binary(docs: DataFrame, mime: str = "text/plain") -> DataFrame:
    """Lift a text column into the opaque-binary layout (in production the
    binary comes straight from the source — S3 objects, tar shards, ...)."""
    content = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image(content: bytes) -> "object":
    """STUB: media decode needs PIL/ffmpeg, not present in this container.
    The Spark-side plumbing (binary column -> Arrow batch -> per-item call)
    is exercised by :func:`extract_features` with a byte-level feature."""
    raise NotImplementedError(
        "media decode requires an image/audio library not available here; "
        "plug a real decoder into extract_features' per-batch loop"
    )


def extract_features(media: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each partition arrives as an iterator of pandas
    DataFrames (Arrow record batches); the loop is where a real decoder
    would run. Deterministic byte features stand in for the decode so the
    batch shape and schema are testable."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_md5": pdf["content"].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURES_SCHEMA)


#: oracle equivalent — md5 over the SAME bytes (utf-8 text) in DuckDB
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# grouped-map (applyInPandas): per-group feature normalization — the batch
# twin of applyInPandasWithState. Each group arrives as ONE pandas frame.
# ---------------------------------------------------------------------------

ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


def zscore_per_user(events: DataFrame) -> DataFrame:
    """Per-user z-score of event values via applyInPandas: the grouped-map
    path for feature engineering that needs the whole group in memory
    (population std, ddof=0). Groups shuffle once on the key; each group
    must fit an executor — for heavy-tailed group sizes prefer the
    two-pass aggregate+join form."""

    def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["value"].mean()
        sd = pdf["value"].std(ddof=0)
        z = (pdf["value"] - mu) / sd if sd > 0 else pdf["value"] * 0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
        )

    # project to the three columns the kernel reads BEFORE the grouped
    # shuffle: groupBy().applyInPandas ships whole rows through the
    # exchange AND the Arrow boundary, and Spark cannot see which
    # columns the Python function touches (guide §2.3/§4.1) — without
    # this, ts/event_type ride both hops for nothing
    return (
        events.select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(_norm, schema=ZSCORE_SCHEMA)
    )


# ---------------------------------------------------------------------------
# resize / frame-sample plumbing: the 1->1 and 1->many mapInPandas shapes.
# Kernels are deterministic byte-level fakes (no media libs here); a real
# implementation swaps ONLY the ndarray line inside the batch loop.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Fixed-size "resize" of every binary payload (1 row -> 1 row).

    The fake kernel cyclically repeats/truncates the source bytes to
    width*height (``np.resize``) — deterministic, so tests can assert
    exact output. Batch shape is the real one: Arrow batches in, uniform
    (width*height)-byte buffers out, no Python per-row overhead beyond
    the kernel itself."""
    import numpy as np

    n_out = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "pixels": pdf["content"].map(
                        lambda b: np.resize(
                            np.frombuffer(bytes(b), dtype=np.uint8), n_out
                        ).tobytes()
                    ),
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

#: fake fixed frame size for the byte-slicing stand-in decoder
FRAME_BYTES = 64


def sample_frames(videos: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling (1 row -> many rows): emit every ``every_n``-th
    fixed-size frame of each payload.

    The fan-out happens INSIDE the Arrow batch loop — one output frame per
    input video row group, never a driver-side explode. The stand-in
    decoder slices the byte stream into FRAME_BYTES chunks; a real one
    would hand ffmpeg the buffer and yield decoded frames at the same
    (doc_id, frame_idx, frame) grain. Partial trailing frames are kept
    (a real decoder's short last GOP)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = bytes(content)
                n_frames = (len(buf) + FRAME_BYTES - 1) // FRAME_BYTES
                for k in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(k)
                    frames.append(buf[k * FRAME_BYTES:(k + 1) * FRAME_BYTES])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype=object),
                }
            )

    return videos.mapInPandas(_frames, schema=FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# DuckDB oracles for the resize / frame-sample kernels. DuckDB 1.0 has no
# md5/substring over BLOB, so both engines hash the UPPERCASE HEX encoding
# of the bytes (2 chars per byte keeps every byte boundary at an even
# offset, so cyclic repeat + truncate on the hex string is byte-exact):
# Spark md5(hex(bin)) == DuckDB md5(substring(repeat(hex(encode(text)) ...).
# ---------------------------------------------------------------------------

#: default resize target used by the registered query
RESIZE_W = 32
RESIZE_H = 32


def multimodal_resize_sql(width: int = RESIZE_W, height: int = RESIZE_H) -> str:
    n_out = width * height
    return f"""
SELECT doc_id,
       CAST({width} AS INTEGER) AS width,
       CAST({height} AS INTEGER) AS height,
       md5(substring(
             repeat(hex(encode(text)),
                    CAST((({n_out} + octet_length(encode(text)) - 1)
                          // octet_length(encode(text))) AS INTEGER)),
             1, {2 * n_out})) AS pixels_md5
FROM documents
"""


def multimodal_frames_sql(every_n: int = 2, frame_bytes: int = FRAME_BYTES) -> str:
    # unnest(range(...)) instead of generate_series: DuckDB 1.0 rejects
    # lateral column parameters in table functions
    return f"""
WITH f AS (
  SELECT doc_id,
         hex(encode(text)) AS hx,
         unnest(range(0, (octet_length(encode(text)) + {frame_bytes - 1})
                         // {frame_bytes}, {every_n})) AS k
  FROM documents
)
SELECT doc_id,
       CAST(k AS INTEGER) AS frame_idx,
       md5(substring(hx, CAST(k AS BIGINT) * {2 * frame_bytes} + 1,
                     {2 * frame_bytes})) AS frame_md5
FROM f
"""
