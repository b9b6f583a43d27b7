"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: the payload is an opaque
``binary`` column that never leaves the JVM except inside Arrow batches;
metadata (mime, byte length, content hash) travels in cheap typed columns
so filtering/joining/pruning happens without touching payload bytes.
Decode / feature-extraction runs as ``mapInPandas`` over Arrow batches —
partition-parallel, zero driver involvement.

Two decode kernels share the plumbing: ``decode_image_stub`` (clearly
marked stub — deterministic fake features from payload bytes, for the
plumbing tests) and ``decode_real`` (real container-header decode:
Pillow where installed, pure-Python header probes from
operators/codecs.py where not, so the real path executes in this
codec-less container too). The Spark side — schema, batch iteration,
partitioning — is identical and tested for both.
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
                "n_bytes": pdf["n_bytes"].astype("Int32"),
                "sha256": pdf["sha256"],
                "fake_width": (1 + first.where(first >= 0, 0)).astype("int32"),
                "fake_height": (1 + last.where(last >= 0, 0)).astype("int32"),
            }
        )
        yield out


REAL_DECODED_SCHEMA = (
    "doc_id long, n_bytes int, sha256 string, width int, height int, "
    "mode string"
)


def decode_real_kernel(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel decoding REAL image payloads. Decoder choice
    happens once per worker: PIL where Pillow is installed (the full
    production codec surface), else the pure-Python header probes
    (operators/codecs.py — PNG/JPEG/GIF/BMP/PPM from their public
    specs). Both paths extract the same features — (width, height,
    mode) live in the container header, which is exactly what PIL's
    lazy ``Image.open`` reads too — so the seam swaps breadth of
    formats, not semantics, and the pure path keeps the real decode
    executable in codec-less environments like this container.
    Undecodable payloads yield NULL width/height/mode rather than
    failing the batch (a 100 TB crawl always contains corrupt blobs)."""
    import io

    try:
        from PIL import Image

        def probe(b: bytes):
            try:
                with Image.open(io.BytesIO(b)) as im:
                    return im.width, im.height, im.mode
            except Exception:
                return None

    except ImportError:
        from fluss_iceberg_spark.operators.codecs import probe_image as probe

    for pdf in batch_iter:
        widths, heights, modes = [], [], []
        for payload in pdf["payload"]:
            # NULL payloads (failed fetches) and unconvertible cells are
            # corrupt-blob cases: NULL features, never a task failure
            try:
                got = probe(bytes(payload)) if payload is not None else None
            except (TypeError, ValueError):
                got = None
            w, h, m = got if got is not None else (None, None, None)
            widths.append(w)
            heights.append(h)
            modes.append(m)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                # nullable Int32: a NULL payload carries NULL n_bytes,
                # which a plain int32 astype would refuse (NaN)
                "n_bytes": pdf["n_bytes"].astype("Int32"),
                "sha256": pdf["sha256"],
                "width": pd.Series(widths, dtype="Int32"),
                "height": pd.Series(heights, dtype="Int32"),
                "mode": pd.Series(modes, dtype="object"),
            }
        )


def decode_real(binarized: DataFrame) -> DataFrame:
    """Real media decode over the binary column: mapInPandas over Arrow
    batches, metadata passed through JVM-side — the same Spark plan as
    the stub path. Executes everywhere: via Pillow when installed, via
    the pure-Python header probes (operators/codecs.py) when not."""
    return binarized.mapInPandas(decode_real_kernel, REAL_DECODED_SCHEMA)


def decoded_features(docs: DataFrame) -> DataFrame:
    """Binary ingest → mapInPandas decode (stub) over Arrow batches."""
    return binarize_documents(docs).mapInPandas(decode_image_stub, DECODED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_offset int, frame_hash string"


def sample_frames_kernel(n_frames: int = 4, frame_bytes: int = 16):
    """mapInPandas kernel factory: N evenly spaced byte-range "frames" per
    payload, each hashed (sha256 hex) as the stand-in frame feature. A
    real video pipeline swaps the slice+hash for a codec frame-grab —
    signature, Arrow batch shape and output schema stay identical. The
    per-row loop over ≤ n_frames tiny slices is the honest shape here:
    frame extraction is inherently per-frame work."""
    import hashlib

    def kernel(batch_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batch_iter:
            ids, idxs, offs, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                for i in range(n_frames):
                    off = (i * n) // n_frames
                    ids.append(doc_id)
                    idxs.append(i)
                    offs.append(off)
                    hashes.append(
                        hashlib.sha256(b[off : off + frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int32"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return kernel


def sampled_frames(
    docs: DataFrame, n_frames: int = 4, frame_bytes: int = 16
) -> DataFrame:
    """Frame sampling over multimodal payloads (binary ingest →
    mapInPandas kernel): one row per (doc, frame)."""
    return binarize_documents(docs).mapInPandas(
        sample_frames_kernel(n_frames, frame_bytes), FRAMES_SCHEMA
    )


def resize_features(
    decoded: DataFrame, max_w: int = 64, max_h: int = 64
) -> DataFrame:
    """Resize planning on decoded dimensions: aspect-preserving clamp to
    (max_w, max_h). Pure column arithmetic — a real pipeline applies the
    computed scale inside the decode kernel; the dimension math itself
    belongs JVM-side."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_w)) / F.col("fake_width"),
        F.lit(float(max_h)) / F.col("fake_height"),
    )
    return decoded.select(
        "doc_id",
        "fake_width",
        "fake_height",
        F.round(scale, 6).alias("scale"),
        F.greatest(F.lit(1), F.floor(F.col("fake_width") * scale)).cast("int").alias("new_width"),
        F.greatest(F.lit(1), F.floor(F.col("fake_height") * scale)).cast("int").alias("new_height"),
    )
