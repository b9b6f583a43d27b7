"""Multimodal-column queries: binary payload plumbing, stubbed decode,
and a REAL container-header decode over synthesized PPM payloads."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluss_iceberg_spark.operators import multimodal as MM
from fluss_iceberg_spark.registry import query
from fluss_iceberg_spark.sources.tpch import load_table


@query(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           sha256(text) AS sha256,
           CAST(1 + ascii(substr(text, 1, 1)) AS INT) AS fake_width,
           CAST(1 + ascii(substr(text, length(text), 1)) AS INT) AS fake_height
    FROM documents
    """,
)
def decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary ingest (payload + typed metadata) → mapInPandas decode stub
    over Arrow batches. The oracle checks the whole plumbing: byte counts,
    content hash, and header-derived fake features all survive the
    binary→Arrow→pandas round trip."""
    return MM.decoded_features(load_table(spark, sf_dir, "documents"))


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents)
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           CAST((i * n) // 4 AS INT) AS frame_offset,
           sha256(substr(text, CAST((i * n) // 4 AS INT) + 1, 16)) AS frame_hash
    FROM d, UNNEST(range(0, 4)) AS t(i)
    """,
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plumbing: 4 evenly spaced 16-byte payload "frames"
    per doc, hashed inside the Arrow kernel (the codec frame-grab
    stand-in). Oracle-exact because the corpus is ASCII (byte slice ==
    char substring; both engines sha256 the same bytes)."""
    return MM.sampled_frames(load_table(spark, sf_dir, "documents"), 4, 16)


@query(
    "multimodal_resize_features",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               1 + ascii(substr(text, 1, 1)) AS w,
               1 + ascii(substr(text, length(text), 1)) AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(w AS INT) AS fake_width,
           CAST(h AS INT) AS fake_height,
           round(LEAST(1.0, 64.0 / w, 64.0 / h), 6) AS scale,
           CAST(GREATEST(1, FLOOR(w * LEAST(1.0, 64.0 / w, 64.0 / h))) AS INT) AS new_width,
           CAST(GREATEST(1, FLOOR(h * LEAST(1.0, 64.0 / w, 64.0 / h))) AS INT) AS new_height
    FROM d
    """,
)
def resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning over decoded dims: aspect-preserving clamp to
    64×64 (column arithmetic; the decode kernel applies the scale in a
    real pipeline)."""
    return MM.resize_features(
        MM.decoded_features(load_table(spark, sf_dir, "documents")), 64, 64
    )


@query(
    "multimodal_real_decode",
    oracle="""
    SELECT doc_id,
           CAST(doc_id % 13 + 2 AS INT) AS width,
           CAST(doc_id % 7 + 2 AS INT) AS height,
           'RGB' AS mode
    FROM documents
    """,
)
def real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: synthesize a VALID binary PPM (P6)
    payload per document JVM-side — header ``P6\\n{w} {h}\\n255\\n`` plus
    a w*h*3-byte raster, dimensions a pure function of doc_id — then run
    ``decode_real``'s mapInPandas kernel, which parses the container
    header exactly as PIL's lazy ``Image.open`` would (Pillow when
    installed, the operators/codecs.py probes here). The oracle recomputes
    the dimensions arithmetically, so a hash match proves the real decode
    path extracted them from the BYTES, not from metadata."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = F.col("doc_id") % 13 + 2
    h = F.col("doc_id") % 7 + 2
    payload = F.encode(
        F.concat(
            F.lit("P6\n"),
            w.cast("string"), F.lit(" "), h.cast("string"),
            F.lit("\n255\n"),
            F.expr("repeat('x', CAST((doc_id % 13 + 2) * (doc_id % 7 + 2) * 3 AS INT))"),
        ),
        "utf-8",
    )
    binarized = docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )
    return MM.decode_real(binarized).select("doc_id", "width", "height", "mode")
