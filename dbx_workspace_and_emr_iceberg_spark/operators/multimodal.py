"""Multimodal column operators (SURVEY.md §2.12 X5).

Pattern for 100 TB multimodal tables: payloads are opaque `binary`
columns with a typed metadata struct beside them; decode / feature-
extract / resize run as Arrow-batched `mapInPandas` stages so Python
touches each batch once, vectorized, and the shuffle moves only derived
features — never the payload twice.

The container has no image/audio codecs, so `fake_decode_batch` is the
clearly-marked deterministic stand-in for a real decoder (same
signature, schema, and batch shape a libvips/ffmpeg-backed UDF would
have). Swap `_decode_stub` for a real decoder to productionize.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the decode stage — what a real image decoder yields.
DECODE_SCHEMA = (
    "doc_id bigint, byte_len int, format string, width int, height int, "
    "n_frames int, mean_byte double"
)


def fake_decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, payload, format) → DECODE_SCHEMA rows.

    Arrow delivers each partition as a stream of pandas batches; we
    vectorize per batch and never hold the whole partition in memory.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payloads.map(len).astype("int32"),
                "format": pdf["format"],
                "width": payloads.map(
                    lambda b: 16 + (b[0] if len(b) else 0) % 64
                ).astype("int32"),
                "height": payloads.map(
                    lambda b: 16 + (b[-1] if len(b) else 0) % 64
                ).astype("int32"),
                "n_frames": payloads.map(lambda b: 1 + len(b) % 3).astype("int32"),
                "mean_byte": payloads.map(
                    lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                ),
            }
        )
        yield out


def attach_payload(docs: DataFrame) -> DataFrame:
    """Build a multimodal-shaped table from `documents`: binary payload
    (utf-8 text bytes standing in for media bytes) + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/img").alias("format"),
            F.col("n_chars").cast("int").alias("orig_chars"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )
