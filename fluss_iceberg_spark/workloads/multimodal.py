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
    "multimodal_png_pixel_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id, doc_id % 9 + 8 AS w, doc_id % 5 + 8 AS h FROM documents
    ),
    px AS (
        SELECT doc_id, w, h, i, (doc_id * 31 + i * 7) % 251 AS v, i % 3 AS ch
        FROM d, UNNEST(range(0, w * h * 3)) t(i)
    )
    SELECT doc_id,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           CAST(MAX(w) * MAX(h) AS INT) AS n_pixels,
           CAST(SUM(v) FILTER (WHERE ch = 0) AS BIGINT) AS sum_r,
           CAST(SUM(v) FILTER (WHERE ch = 1) AS BIGINT) AS sum_g,
           CAST(SUM(v) FILTER (WHERE ch = 2) AS BIGINT) AS sum_b,
           CAST(MIN(v) AS INT) AS min_v,
           CAST(MAX(v) AS INT) AS max_v
    FROM px GROUP BY doc_id
    """,
)
def png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG raster decode end-to-end: synthesize a valid PNG per
    document whose RGB pixel bytes are a pure arithmetic function of
    doc_id (scanline filter = doc_id % 5 — the corpus exercises all five
    PNG filter types), then decode the raster back (zlib inflate +
    filter inversion, operators/rasters.py) and reduce it to exact
    integer channel statistics. The oracle recomputes the statistics
    arithmetically from doc_id, so a hash match proves the decoder
    recovered every pixel byte from the compressed container. Encoder
    and decoder share no filter code (forward vs inverse)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM.pixel_stats(MM.synth_png_payloads(docs))


@query(
    "multimodal_ahash_dedup",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               i,
               ((doc_id % 60) * 37 + i * 11) % 83 + 32
                 + CASE WHEN (i + doc_id) % 29 = 0 THEN doc_id % 6 ELSE 0 END AS v
        FROM documents, UNNEST(range(0, 256)) t(i)
    ),
    blocks AS (
        SELECT doc_id, ((i // 16) // 2) * 8 + ((i % 16) // 2) AS blk,
               SUM(v) AS bsum
        FROM px GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, SUM(v) AS tsum FROM px GROUP BY 1),
    hashes AS (
        SELECT b.doc_id,
               STRING_AGG(CASE WHEN b.bsum * 64 > t.tsum THEN '1' ELSE '0' END,
                          '' ORDER BY b.blk) AS ahash
        FROM blocks b JOIN tot t USING (doc_id)
        GROUP BY b.doc_id
    )
    SELECT ahash,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM hashes GROUP BY ahash
    """,
)
def ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup: synthesize 16x16 grayscale P5
    payloads JVM-side (base image keyed by doc_id % 60, plus a sparse
    per-doc pixel perturbation — near-duplicates, not byte-duplicates,
    so sha256 grouping would NOT collapse them), decode the raster,
    compute the exact-integer 64-bit aHash (operators/multimodal.py
    ahash_bits), and GROUP BY the hash. Only the 64-bit fingerprint
    shuffles — the raster never leaves the map side, which is the whole
    100 TB design. The oracle replays the hash arithmetic in SQL, so a
    match proves the decode + blocked-threshold pipeline bit-exactly."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raster = F.expr(
        "array_join(transform(sequence(0, 255), i -> "
        "char(((doc_id % 60) * 37 + i * 11) % 83 + 32 "
        "+ IF((i + doc_id) % 29 = 0, doc_id % 6, 0))), '')"
    )
    payload = F.encode(F.concat(F.lit("P5\n16 16\n255\n"), raster), "utf-8")
    binarized = docs.select("doc_id", payload.alias("payload"))
    return (
        MM.perceptual_hashes(binarized)
        .groupBy("ahash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


@query(
    "multimodal_ahash_neardup_pairs",
    oracle="""
    WITH px AS (
        SELECT doc_id,
               i,
               ((doc_id % 60) * 37 + i * 11) % 83 + 32
                 + CASE WHEN (i + doc_id) % 29 = 0 THEN doc_id % 6 ELSE 0 END AS v
        FROM documents, UNNEST(range(0, 256)) t(i)
    ),
    blocks AS (
        SELECT doc_id, ((i // 16) // 2) * 8 + ((i % 16) // 2) AS blk,
               SUM(v) AS bsum
        FROM px GROUP BY 1, 2
    ),
    tot AS (SELECT doc_id, SUM(v) AS tsum FROM px GROUP BY 1),
    hashes AS (
        SELECT b.doc_id,
               STRING_AGG(CASE WHEN b.bsum * 64 > t.tsum THEN '1' ELSE '0' END,
                          '' ORDER BY b.blk) AS ahash
        FROM blocks b JOIN tot t USING (doc_id)
        GROUP BY b.doc_id
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.ahash AS ha, b.ahash AS hb
        FROM hashes a JOIN hashes b ON a.doc_id < b.doc_id
    ),
    ham AS (
        SELECT doc_a, doc_b,
               CAST(SUM(CASE WHEN substr(ha, CAST(i AS INT) + 1, 1)
                              <> substr(hb, CAST(i AS INT) + 1, 1)
                         THEN 1 ELSE 0 END) AS INT) AS hamming
        FROM pairs, UNNEST(range(0, 64)) t(i)
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 6
    """,
)
def ahash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup PAIRS within hamming ≤ 6 over the same synthesized
    P5 corpus as multimodal_ahash_dedup, via hamming-banded LSH
    (operators/multimodal.ahash_near_pairs): 8 bands of 8 bits, join on
    band equality, exact hamming verify on candidates — pigeonhole-EXACT
    for radius < band count, which the oracle proves by computing the
    full quadratic ground truth (every pair, no banding) in DuckDB and
    matching hash-for-hash. The Spark side never builds the cross join:
    only (doc_id, band) rows shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    raster = F.expr(
        "array_join(transform(sequence(0, 255), i -> "
        "char(((doc_id % 60) * 37 + i * 11) % 83 + 32 "
        "+ IF((i + doc_id) % 29 = 0, doc_id % 6, 0))), '')"
    )
    payload = F.encode(F.concat(F.lit("P5\n16 16\n255\n"), raster), "utf-8")
    binarized = docs.select("doc_id", payload.alias("payload"))
    return MM.ahash_near_pairs(MM.perceptual_hashes(binarized), 6, 8)


@query(
    "multimodal_audio_features",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               1 + doc_id % 2 AS c,
               8000 + (doc_id % 4) * 4000 AS rate,
               doc_id % 50 + 20 AS n
        FROM documents
    ),
    s AS (
        SELECT doc_id, c, rate, n, j,
               CASE WHEN doc_id % 3 = 0
                    THEN (doc_id * 13 + j * 17) % 200 - 100
                    ELSE (doc_id * 13 + j * 17) % 4001 - 2000 END AS v
        FROM d, UNNEST(range(0, n * c)) t(j)
    ),
    ch0 AS (
        SELECT doc_id, v,
               LAG(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
        FROM s WHERE j % c = 0
    ),
    cr AS (
        SELECT doc_id,
               CAST(COUNT(*) FILTER (
                   WHERE pv IS NOT NULL AND ((pv < 0) <> (v < 0))
               ) AS INT) AS crossings
        FROM ch0 GROUP BY doc_id
    ),
    stats AS (
        SELECT doc_id,
               CAST(MAX(n) AS INT) AS n_frames,
               CAST(MAX(c) AS INT) AS channels,
               CAST(MAX(rate) AS INT) AS rate,
               CAST((MAX(n) * 1000000) // MAX(rate) AS BIGINT) AS duration_us,
               CAST(SUM(v) AS BIGINT) AS sum_samples,
               CAST(SUM(v * v) AS BIGINT) AS energy,
               CAST(MIN(v) AS INT) AS min_s,
               CAST(MAX(v) AS INT) AS max_s
        FROM s GROUP BY doc_id
    )
    SELECT stats.*, cr.crossings FROM stats JOIN cr USING (doc_id)
    """,
)
def audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: synthesize a valid RIFF/WAVE PCM
    payload per document — waveform a pure arithmetic function of
    doc_id, bit width alternating 8-bit biased-unsigned / 16-bit signed
    so both PCM layouts are exercised — then decode it back
    (operators/audio.py RIFF chunk walk) and reduce the waveform to
    exact integer statistics (duration, sum, energy, min/max, channel-0
    zero crossings). The oracle recomputes everything arithmetically
    from doc_id, so a hash match proves the decoder recovered every
    sample from the container bytes. Extends the multimodal surface to
    audio with the image-raster pattern (multimodal_png_pixel_stats)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM.audio_features(MM.synth_wav_payloads(docs))


@query(
    "multimodal_gif_frames",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               doc_id % 4 + 2 AS n_frames,
               doc_id % 6 + 6 AS w,
               doc_id % 4 + 5 AS h
        FROM documents
    ),
    fr AS (
        SELECT doc_id, w, h, f, (doc_id + f) % 50 AS delay_cs
        FROM d, UNNEST(range(0, n_frames)) t(f)
    ),
    px AS (
        SELECT doc_id, f, (doc_id * 7 + f * 13 + i * 3) % 128 AS v
        FROM fr, UNNEST(range(0, w * h)) t(i)
    ),
    st AS (
        SELECT doc_id, f,
               CAST(SUM(v) AS BIGINT) AS sum_idx,
               CAST(MIN(v) AS INT) AS min_idx,
               CAST(MAX(v) AS INT) AS max_idx
        FROM px GROUP BY doc_id, f
    )
    SELECT fr.doc_id,
           CAST(fr.f AS INT) AS frame_idx,
           CAST(fr.w AS INT) AS width,
           CAST(fr.h AS INT) AS height,
           CAST(fr.delay_cs AS INT) AS delay_cs,
           CAST(fr.w * fr.h AS INT) AS n_px,
           st.sum_idx, st.min_idx, st.max_idx
    FROM fr JOIN st ON fr.doc_id = st.doc_id AND fr.f = st.f
    """,
)
def gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-style frame decode end-to-end: synthesize an animated
    GIF per document (frames, geometry, delays, and every palette-index
    pixel are pure arithmetic functions of doc_id), then decode each
    frame's raster back through the spec LZW inflate (operators/gif.py)
    and reduce it to one row per (doc, frame) of exact integer
    statistics. The oracle recomputes everything arithmetically, so a
    hash match proves the decoder recovered every frame's pixels from
    the compressed container — the multimodal surface's frame-sampling
    path (multimodal_frame_sample is the byte-range stand-in; this is
    the real thing)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM.gif_frame_features(MM.synth_gif_payloads(docs))


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


@query(
    "multimodal_mp4_metadata",
    oracle="""
    WITH d AS (
        SELECT doc_id, doc_id % 6 + 3 AS n FROM documents
    ),
    sz AS (
        SELECT doc_id, CAST(SUM(16 + (doc_id + i * 3) % 9) AS BIGINT) AS total_bytes
        FROM d, UNNEST(range(0, n)) t(i) GROUP BY doc_id
    )
    SELECT d.doc_id,
           'isom' AS brand,
           'vide' AS handler,
           CAST((d.doc_id % 5 + 2) * 16 AS INT) AS width,
           CAST((d.doc_id % 4 + 2) * 16 AS INT) AS height,
           CAST(1000 + (d.doc_id % 3) * 200 AS INT) AS timescale,
           CAST((n // 2) * (100 + d.doc_id % 7)
                + (n - n // 2) * (150 + d.doc_id % 11) AS BIGINT) AS duration,
           CAST(((n // 2) * (100 + d.doc_id % 7)
                 + (n - n // 2) * (150 + d.doc_id % 11)) * 1000
                // (1000 + (d.doc_id % 3) * 200) AS BIGINT) AS duration_ms,
           CAST(n AS INT) AS n_frames,
           sz.total_bytes
    FROM d JOIN sz USING (doc_id)
    """,
)
def mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container parse end-to-end, metadata path: synthesize
    a spec-valid ISO-BMFF/MP4 per document (ftyp + chunked mdat + full
    moov sample table; every field a pure arithmetic function of
    doc_id), then walk the boxes back (operators/video.py — mvhd/tkhd
    16.16 dims, stts run expansion, stsz) WITHOUT touching mdat. The
    oracle recomputes every field arithmetically from doc_id, so a hash
    match proves the box walk recovered the container metadata exactly.
    This is the 100 TB catalog-scan shape for video corpora: moov is
    KBs; mdat is the terabytes the metadata path never reads.
    Reference parity: the lakehouse media-ingest column family
    (reference README.md demo rows carry media attributes)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM.mp4_metadata(MM.synth_mp4_payloads(docs))


@query(
    "multimodal_mp4_frame_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id, doc_id % 6 + 3 AS n FROM documents
    ),
    f AS (
        SELECT doc_id, n, CAST(i AS INT) AS frame_idx,
               16 + (doc_id + i * 3) % 9 AS size,
               CASE WHEN i < n // 2 THEN 100 + doc_id % 7
                    ELSE 150 + doc_id % 11 END AS dur
        FROM d, UNNEST(range(0, n)) t(i)
    )
    SELECT doc_id, frame_idx,
           CAST(MAX(dur) AS INT) AS dur,
           CAST(MAX(size) AS INT) AS n_bytes,
           CAST(SUM((doc_id * 7 + frame_idx * 31 + k * 13) % 251) AS BIGINT) AS sum_b,
           CAST(MIN((doc_id * 7 + frame_idx * 31 + k * 13) % 251) AS INT) AS min_b,
           CAST(MAX((doc_id * 7 + frame_idx * 31 + k * 13) % 251) AS INT) AS max_b
    FROM f, UNNEST(range(0, size)) u(k)
    GROUP BY doc_id, frame_idx
    """,
)
def mp4_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling end-to-end: parse the MP4 sample table
    (stsc chunk-run expansion × stco chunk offsets × stsz sizes → one
    absolute byte range per frame), slice every frame straight out of
    mdat by its byte range, and reduce each to exact integer statistics.
    The oracle recomputes per-frame sum/min/max arithmetically from
    doc_id, so a hash match proves the sample-table walk located every
    frame byte exactly — the property that makes 100 TB frame-sampling
    IO-proportional to frames taken, not bytes stored."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM.mp4_frame_stats(MM.synth_mp4_payloads(docs))


@query(
    "multimodal_video_scene_cuts",
    oracle="""
    WITH d AS (
        SELECT doc_id, doc_id % 6 + 3 AS n FROM documents
    ),
    f AS (
        SELECT doc_id, n, CAST(i AS INT) AS frame_idx,
               16 + (doc_id + i * 3) % 9 AS size
        FROM d, UNNEST(range(0, n)) t(i)
    ),
    st AS (
        SELECT doc_id, frame_idx,
               SUM((doc_id * 7 + frame_idx * 31 + k * 13) % 251) * 1000
                   // MAX(size) AS mean_milli
        FROM f, UNNEST(range(0, size)) u(k)
        GROUP BY doc_id, frame_idx
    ),
    lagged AS (
        SELECT doc_id, frame_idx, mean_milli,
               LAG(mean_milli) OVER (
                   PARTITION BY doc_id ORDER BY frame_idx
               ) AS prev_milli
        FROM st
    )
    SELECT doc_id, frame_idx,
           CAST(mean_milli - prev_milli AS BIGINT) AS delta_milli
    FROM lagged
    WHERE prev_milli IS NOT NULL AND abs(mean_milli - prev_milli) > 40
    """,
)
def video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection composed over the real frame decode:
    per-frame mean brightness from the Arrow kernel, then a per-video
    LAG window flags jumps > 40 milli-units. Payload bytes never
    shuffle — only (doc_id, frame_idx, mean) stats rows (~24 B/frame)
    enter the window exchange, so the detection cost at 100 TB is
    frames×24 bytes, independent of video bitrate."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    stats = MM.mp4_frame_stats(MM.synth_mp4_payloads(docs))
    return MM.video_scene_cuts(stats, 40)


@query(
    "multimodal_mp4_keyframe_stats",
    oracle="""
    WITH d AS (
        SELECT doc_id, doc_id % 6 + 3 AS n, doc_id % 3 + 2 AS s
        FROM documents
    ),
    f AS (
        SELECT doc_id, n, CAST(i AS INT) AS frame_idx,
               16 + (doc_id + i * 3) % 9 AS size,
               CASE WHEN i < n // 2 THEN 100 + doc_id % 7
                    ELSE 150 + doc_id % 11 END AS dur
        FROM d, UNNEST(range(0, n)) t(i)
        WHERE i % s = 0
    )
    SELECT doc_id, frame_idx,
           CAST(MAX(dur) AS INT) AS dur,
           CAST(MAX(size) AS INT) AS n_bytes,
           CAST(SUM((doc_id * 7 + frame_idx * 31 + k * 13) % 251) AS BIGINT) AS sum_b,
           CAST(MIN((doc_id * 7 + frame_idx * 31 + k * 13) % 251) AS INT) AS min_b,
           CAST(MAX((doc_id * 7 + frame_idx * 31 + k * 13) % 251) AS INT) AS max_b
    FROM f, UNNEST(range(0, size)) u(k)
    GROUP BY doc_id, frame_idx
    """,
)
def mp4_keyframe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe-only sampling via the stss sync-sample table: the
    synthesized MP4s mark every (doc_id%3 + 2)-th frame as sync, and the
    kernel slices ONLY those frames' byte ranges out of mdat — the
    practical video-ingest pattern (keyframes decode standalone, so at
    100 TB the decode cost is ∝ keyframes sampled, a small fraction of
    frames stored, and the IO is the keyframes' byte ranges only). The
    oracle replays the sync arithmetic (0-based frame i is sync iff
    i % s == 0) plus the per-frame byte stats, proving the stss walk
    selected exactly the right frames and the sample-table ranges
    located every keyframe byte."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM.mp4_frame_stats(
        MM.synth_mp4_payloads(docs, with_sync=True), sync_only=True
    )


def _phash_oracle_sql() -> str:
    """DuckDB replay of the full pHash pipeline from doc_id arithmetic:
    regenerate every pixel, pool, run the SAME fixed-point DCT (cos
    table embedded as the SAME 64 integers the kernel uses), take the
    order-statistic median, build the bit string. A hash match proves
    the kernel decoded every pixel AND the frequency transform is
    bit-identical."""
    from fluss_iceberg_spark.operators.multimodal import dct_cos_table

    cos_values = ", ".join(
        f"({u}, {t}, {cv})"
        for u, row in enumerate(dct_cos_table())
        for t, cv in enumerate(row)
    )
    return f"""
    WITH d AS (
        SELECT doc_id, doc_id % 9 + 8 AS w, doc_id % 5 + 8 AS h FROM documents
    ),
    lum AS (
        SELECT doc_id, w, h, (p % w) AS x, (p // w) AS y,
               (((doc_id * 31 + (p * 3) * 7) % 251)
                + ((doc_id * 31 + (p * 3 + 1) * 7) % 251)
                + ((doc_id * 31 + (p * 3 + 2) * 7) % 251)) // 3 AS lum
        FROM d, UNNEST(range(0, w * h)) t(p)
    ),
    pool AS (
        SELECT doc_id, (y * 8) // h AS bj, (x * 8) // w AS bi,
               SUM(lum) // COUNT(1) AS g
        FROM lum GROUP BY 1, 2, 3
    ),
    cost(u, t, cv) AS (VALUES {cos_values}),
    dct AS (
        SELECT p.doc_id, cu.u AS u, cv.u AS v,
               SUM(p.g * cu.cv * cv.cv) AS coef
        FROM pool p
        JOIN cost cu ON cu.t = p.bj
        JOIN cost cv ON cv.t = p.bi
        GROUP BY 1, 2, 3
    ),
    med AS (
        SELECT doc_id, coef AS med FROM (
            SELECT doc_id, coef,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY coef
                   ) AS rk
            FROM dct WHERE u + v > 0
        ) WHERE rk = 32
    ),
    hash AS (
        SELECT dct.doc_id,
               STRING_AGG(CASE WHEN dct.coef > med.med THEN '1' ELSE '0' END,
                          '' ORDER BY dct.u * 8 + dct.v) AS phash
        FROM dct JOIN med ON dct.doc_id = med.doc_id
        GROUP BY dct.doc_id
    )
    SELECT d.doc_id, CAST(d.w AS INT) AS width, CAST(d.h AS INT) AS height,
           hash.phash
    FROM d JOIN hash ON d.doc_id = hash.doc_id
    """


@query("multimodal_phash", oracle=_phash_oracle_sql())
def phash_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DCT perceptual hash (pHash) over real decoded PNG rasters — the
    frequency-domain image fingerprint beside aHash's spatial one
    (robust to global brightness/contrast because bits compare each DCT
    coefficient to their own median). The kernel runs the whole
    pipeline in exact integer arithmetic (operators/multimodal.
    phash_bits: fixed-point cos table, order-statistic median), and the
    oracle replays every pixel, the pooling, the transform, and the bit
    string arithmetically from doc_id — a full value gate over a DCT.
    100 TB: per-payload kernel work; 8 bytes/image leave the scan."""
    from fluss_iceberg_spark.operators import multimodal as MM2

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM2.dct_hashes(MM2.synth_png_payloads(docs))


def _audio_spectrum_oracle_sql() -> str:
    """DuckDB replay of the fixed-frame integer DFT from doc_id
    arithmetic (the same sample model multimodal_audio_features gates):
    regenerate channel-0, zero-pad/truncate to the 64-sample frame,
    multiply-accumulate against the SAME 2^14 fixed-point trig table the
    kernel uses, square into powers, argmax the dominant bin."""
    from fluss_iceberg_spark.operators.audio import dft64_tables

    cos, sin = dft64_tables()
    trig_values = ", ".join(
        f"({a}, {cv}, {sv})" for a, (cv, sv) in enumerate(zip(cos, sin))
    )
    return f"""
    WITH d AS (
        SELECT doc_id, 1 + doc_id % 2 AS c, doc_id % 50 + 20 AS n
        FROM documents
    ),
    x AS (
        SELECT doc_id, t,
               CASE WHEN t < n THEN (
                   CASE WHEN doc_id % 3 = 0
                        THEN (doc_id * 13 + t * c * 17) % 200 - 100
                        ELSE (doc_id * 13 + t * c * 17) % 4001 - 2000 END
               ) ELSE 0 END AS v
        FROM d, UNNEST(range(0, 64)) s(t)
    ),
    trig(a, cv, sv) AS (VALUES {trig_values}),
    bins(k) AS (VALUES (1), (2), (4), (8)),
    comp AS (
        SELECT x.doc_id, b.k,
               SUM(x.v * tr.cv) AS re,
               SUM(-x.v * tr.sv) AS im
        FROM x CROSS JOIN bins b
        JOIN trig tr ON tr.a = (b.k * x.t) % 64
        GROUP BY 1, 2
    ),
    p AS (SELECT doc_id, k, re * re + im * im AS pw FROM comp),
    dom AS (
        SELECT doc_id, k AS dom_bin FROM (
            SELECT doc_id, k,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY pw DESC, k ASC
                   ) AS rk
            FROM p
        ) WHERE rk = 1
    )
    SELECT p.doc_id,
           CAST(MAX(CASE WHEN k = 1 THEN pw END) AS BIGINT) AS p1,
           CAST(MAX(CASE WHEN k = 2 THEN pw END) AS BIGINT) AS p2,
           CAST(MAX(CASE WHEN k = 4 THEN pw END) AS BIGINT) AS p4,
           CAST(MAX(CASE WHEN k = 8 THEN pw END) AS BIGINT) AS p8,
           CAST(MAX(dom.dom_bin) AS INT) AS dom_bin
    FROM p JOIN dom ON p.doc_id = dom.doc_id
    GROUP BY p.doc_id
    """


@query("multimodal_audio_spectrum", oracle=_audio_spectrum_oracle_sql())
def audio_spectrum_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-domain audio features under a full value gate — the
    audio twin of the pHash DCT: channel-0 PCM (REAL RIFF/WAVE decode)
    zero-padded to a 64-sample frame and probed with an integer DFT at
    bins {1,2,4,8} (fixed-point trig table, pure multiply-accumulate —
    operators/audio.spectrum64); outputs per-bin spectral power and the
    dominant bin. The oracle replays samples, table, MAC and argmax
    arithmetically from doc_id, so a hash match proves real DSP over
    truly decoded bytes. 100 TB: per-payload kernel work, 5 integers
    per clip leave the scan."""
    from fluss_iceberg_spark.operators import multimodal as MM2

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return MM2.audio_spectrum(MM2.synth_wav_payloads(docs))
