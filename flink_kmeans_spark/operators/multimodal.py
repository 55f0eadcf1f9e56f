"""Multimodal column plumbing (north-star mandated).

Images/audio/video travel as opaque ``binary`` columns with typed
metadata structs; decode / feature-extract run as Arrow-batched
``mapInPandas`` stages. The container ships no image/audio libs, so the
DECODE KERNEL IS A STUB (deterministic fake features, clearly marked;
``real_decode=True`` raises NotImplementedError) — but everything
Spark-side is real and tested: the binary schema, the Arrow batch
shapes, the UDF signatures, the partition behavior. Swapping the stub
for PIL/librosa is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# binary payload + typed metadata: the at-rest layout for a media table
MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, "
    "meta struct<n_bytes: long, content_md5: string>"
)

DECODED_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "fake_width int, fake_height int, feature_norm double"
)


def to_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a media table from documents: payload = utf-8 bytes of
    the text (a stand-in for image bytes), metadata computed JVM-side."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode stage over the binary column.

    ``mapInPandas`` (not a scalar UDF) because decode is batch-oriented
    and may change cardinality (e.g. video frame sampling emits N rows
    per input). Partitioning is preserved — no shuffle; at 100 TB the
    decode cost is embarrassingly parallel scan work.

    IMPORTANT (worker serialization): every function shipped to Python
    workers in this repo is a CLOSURE so cloudpickle serializes it by
    value — a module-level kernel would pickle by reference and require
    ``import flink_kmeans_spark`` inside the worker, which only works
    when the driver's cwd happens to be the repo root (bug found by the
    plain-session full-gate replica).
    """
    if real_decode:
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in "
            "this container; the stub kernel exercises the full Spark path"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # worker-side import; no repo imports here

        def stub_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            """STUB decode kernel — deterministic fake features from raw
            bytes. A real deployment replaces this body with e.g.
            PIL.Image.open over io.BytesIO(payload); the signature (one
            pandas batch in, one DECODED_SCHEMA batch out) is the
            production contract."""
            out = pd.DataFrame()
            out["doc_id"] = pdf["doc_id"]
            out["media_type"] = pdf["media_type"]
            payloads = pdf["payload"]
            out["n_bytes"] = payloads.map(len).astype("int64")
            # fake geometry: first bytes, deterministic
            out["fake_width"] = payloads.map(
                lambda b: 1 + b[0] if len(b) else 0
            ).astype("int32")
            out["fake_height"] = payloads.map(
                lambda b: 1 + b[-1] if len(b) else 0
            ).astype("int32")
            out["feature_norm"] = payloads.map(
                lambda b: float(sum(b[:64])) / 255.0 if len(b) else 0.0
            )
            return out

        for pdf in batches:
            if len(pdf):
                yield stub_decode_batch(pdf)

    return media.mapInPandas(gen, DECODED_SCHEMA)


def frame_sample(media: DataFrame, frames_per_doc: int = 3) -> DataFrame:
    """Frame-sampling shape: one input row → N frame rows (cardinality-
    changing mapInPandas, the video-pipeline pattern). Frames are stub
    byte-slices; offsets/indices are real plumbing."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, r in pdf.iterrows():
                b = r["payload"]
                step = max(len(b) // frames_per_doc, 1)
                for i in range(frames_per_doc):
                    chunk = b[i * step : (i + 1) * step]
                    rows.append((r["doc_id"], i, len(chunk)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return media.mapInPandas(gen, "doc_id long, frame_idx int, frame_bytes long")
