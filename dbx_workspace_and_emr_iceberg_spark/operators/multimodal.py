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


#: Output schema of the frame-sampling stage — one row per sampled frame.
FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_frames_total int, frame_feature double"

FRAME_STRIDE = 30


def fake_frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas stage: (doc_id, payload) → one row per sampled frame
    (every FRAME_STRIDE-th frame) — the 1→N expansion shape of video
    frame extraction. A real ffmpeg-backed stage has this exact
    signature and batch contract; the fake derives frame count and a
    per-frame feature deterministically from the payload bytes.

    Expansion happens inside the Arrow batch (no shuffle, no explode of
    payload bytes); each output row carries a float feature, not the
    frame itself — at 100 TB the sampled-frame *tensors* would go to a
    binary column written straight out, never through a shuffle.
    """
    for pdf in batches:
        doc_ids, idxs, totals, feats = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_total = 1 + len(payload) % 240
            for i in range(0, n_total, FRAME_STRIDE):
                doc_ids.append(doc_id)
                idxs.append(i)
                totals.append(n_total)
                b = payload[i % max(len(payload), 1)] if len(payload) else 0
                feats.append(float((b * 31 + i) % 256) / 255.0)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "n_frames_total": pd.Series(totals, dtype="int32"),
                "frame_feature": pd.Series(feats, dtype="float64"),
            }
        )
