"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column that never leaves the JVM except inside Arrow batches;
metadata (mime, byte length, content hash) travels in cheap typed columns
so filtering/joining/pruning happens without touching payload bytes.
Decode / feature-extraction runs as ``mapInPandas`` over Arrow batches —
partition-parallel, zero driver involvement.

The actual media codecs are not available in this container, so
``decode_image_stub`` is a clearly marked stub: it produces deterministic
fake features from the payload header and raises ``NotImplementedError``
when a real decode is requested. The Spark-side plumbing — schema, batch
iteration, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, sha256 string, fake_width int, fake_height int"
)


def binarize_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal ingest: payload = utf-8 bytes of the text
    (stands in for image bytes), plus the typed metadata columns."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_image_stub(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas decode kernel (STUB).

    Real deployments replace the body with an actual decoder (PIL/ffmpeg)
    — the signature, Arrow batch shape and output schema stay identical.
    Deterministic fake features: width/height derived from the first/last
    payload bytes (vectorized via the pandas bytes accessor — no per-row
    Python lambdas). Metadata already computed JVM-side (n_bytes, sha256
    from ``binarize_documents``) passes straight through instead of being
    recomputed per row in Python (the r01 anti-pattern)."""
    for pdf in batch_iter:
        payloads = pdf["payload"]
        first = payloads.str[0].fillna(-1).astype("int64")
        last = payloads.str[-1].fillna(-1).astype("int64")
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["n_bytes"].astype("int32"),
                "sha256": pdf["sha256"],
                "fake_width": (1 + first.where(first >= 0, 0)).astype("int32"),
                "fake_height": (1 + last.where(last >= 0, 0)).astype("int32"),
            }
        )
        yield out


def decode_real(*_args, **_kwargs):
    """Placeholder for a real media decode — requires codec libraries that
    are not present in this environment."""
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not available in this container; "
        "use decode_image_stub for the plumbing path"
    )


def decoded_features(docs: DataFrame) -> DataFrame:
    """Binary ingest → mapInPandas decode (stub) over Arrow batches."""
    return binarize_documents(docs).mapInPandas(decode_image_stub, DECODED_SCHEMA)
