"""Multimodal-pipeline queries: binary media columns through mapInPandas.

The media payloads are deterministic fakes built from the documents table
(see dsq_spark.multimodal — real decoders are stubbed, the Spark plumbing
is real), so the decode/metadata path is fully oracle-checkable: DuckDB
recomputes the header fields from the same md5/length arithmetic.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dsq_spark.multimodal import (
    attach_fake_media,
    decode_image_meta,
    extract_features,
    sample_frames,
)
from dsq_spark.queries.base import register, t


@register(
    "mm_image_meta",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         (length(text) % 640) + 16 AS width,
         CAST(concat('0x', substr(md5(text), 17, 8)) AS BIGINT) % 480 + 16 AS height,
         substr(md5(text), 1, 16) AS content_fp
  FROM documents
)
SELECT CAST(floor(width / 100) AS INTEGER) AS width_bucket,
       count(*) AS n_images,
       CAST(min(height) AS INTEGER) AS min_height,
       CAST(max(height) AS INTEGER) AS max_height,
       count(DISTINCT content_fp) AS n_distinct
FROM meta
GROUP BY 1
""",
    doc="Binary media header decode via Arrow-batched mapInPandas (stubbed "
        "image decoder, real plumbing), aggregated by width bucket. The "
        "oracle recomputes the deterministic header fields in SQL.",
)
def mm_image_meta(spark, sf_dir):
    media = attach_fake_media(t(spark, sf_dir, "documents"))
    meta = decode_image_meta(media)
    return (
        meta.groupBy(F.floor(F.col("width") / 100).cast("int").alias("width_bucket"))
        .agg(
            F.count("*").alias("n_images"),
            F.min("height").cast("int").alias("min_height"),
            F.max("height").cast("int").alias("max_height"),
            F.countDistinct("content_fp").alias("n_distinct"),
        )
    )


@register(
    "mm_frame_sample",
    oracle="""
WITH media AS (
  SELECT doc_id, substr(md5(text), 1, 16) AS base_hex
  FROM documents WHERE doc_id < 200
),
frames AS (
  SELECT doc_id, k * 4 AS frame_idx,
         substr(md5(concat(base_hex, ':', CAST(k * 4 AS VARCHAR))), 1, 12) AS frame_fp
  FROM media, range(0, 3) r(k)
)
SELECT doc_id, count(*) AS n_frames,
       min(frame_fp) AS first_fp,
       count(DISTINCT frame_fp) AS n_distinct_frames
FROM frames GROUP BY doc_id
""",
    doc="Video-style frame sampling (flat-map mapInPandas: N rows per "
        "payload); per-document frame counts + a value-checked fingerprint "
        "(min over the sampled frames). The stub fingerprints hash "
        "hex-string + index so the oracle recomputes them in SQL.",
)
def mm_frame_sample(spark, sf_dir):
    media = attach_fake_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200))
    frames = sample_frames(media, every_n=4, max_frames=3)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.min("frame_fp").alias("first_fp"),
        F.countDistinct("frame_fp").alias("n_distinct_frames"),
    )


@register(
    "mm_feature_neighbors",
    oracle="""
WITH media AS (
  SELECT doc_id,
         lower(concat('46414b45',
           lpad(to_hex((length(text) % 640) + 16), 4, '0'),
           lpad(to_hex(CAST(concat('0x', substr(md5(text), 17, 8)) AS BIGINT) % 480 + 16), 4, '0'),
           substr(md5(text), 1, 16))) AS media_hex
  FROM documents WHERE doc_id < 100
),
vecs AS (
  SELECT doc_id,
         list_transform(range(0, 8), i ->
           CAST(concat('0x', substr(md5(media_hex), 4 * CAST(i AS INTEGER) + 1, 4)) AS BIGINT)
             / 65535.0 - 0.5) AS v
  FROM media
),
scored AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         round(list_dot_product(a.v, b.v) /
               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
  FROM vecs a JOIN vecs b ON a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, cosine FROM scored WHERE cosine > 0.9
""",
    doc="Stub feature-extraction (mapInPandas) feeding brute-force cosine "
        "neighbor search — the multimodal → similarity-search hand-off. "
        "The md5-seeded double vectors are recomputed exactly by the SQL "
        "oracle (hash of the payload's hex string, 4-hex-digit windows).",
)
def mm_feature_neighbors(spark, sf_dir):
    media = attach_fake_media(
        t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100))
    feats = extract_features(media)
    dot = "aggregate(zip_with(f_a, f_b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    a = feats.select(F.col("doc_id").alias("doc_a"), F.col("feature").alias("f_a"))
    b = feats.select(F.col("doc_id").alias("doc_b"), F.col("feature").alias("f_b"))
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    sim = F.expr(dot) / (
        F.sqrt(F.expr(dot.replace("f_b", "f_a"))) * F.sqrt(F.expr(dot.replace("f_a", "f_b")))
    )
    return (
        pairs.select("doc_a", "doc_b", F.round(sim, 4).alias("cosine"))
        .filter(F.col("cosine") > 0.9)
    )


@register(
    "mm_audio_stats",
    oracle="""
WITH meta AS (
  SELECT doc_id,
         CASE length(text) % 3 WHEN 0 THEN 16000 WHEN 1 THEN 22050
              ELSE 44100 END AS sample_rate,
         (length(text) * 997) % 4194304 + 1000 AS n_samples
  FROM documents
)
SELECT sample_rate,
       count(*) AS n_clips,
       CAST(sum(n_samples) AS BIGINT) AS total_samples,
       round(sum(n_samples) / sample_rate / 3600.0, 4) AS total_hours
FROM meta
GROUP BY sample_rate
""",
    doc="Audio-corpus accounting (total hours per sample rate — the "
        "first number any speech-pipeline run reports). Stubbed header "
        "decode via Arrow-batched mapInPandas; the integer sample sum is "
        "exact on both engines, so hours derive deterministically.",
)
def mm_audio_stats(spark, sf_dir):
    from dsq_spark.multimodal import attach_fake_audio, decode_audio_meta

    media = attach_fake_audio(t(spark, sf_dir, "documents"))
    meta = decode_audio_meta(media)
    return meta.groupBy("sample_rate").agg(
        F.count("*").alias("n_clips"),
        F.sum("n_samples").cast("long").alias("total_samples"),
        F.round(F.sum("n_samples") / F.col("sample_rate") / 3600.0, 4).alias("total_hours"),
    )
