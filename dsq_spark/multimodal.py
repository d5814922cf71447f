"""Multimodal column operators (extension surface — north-star brief).

Treats image/audio/video payloads as opaque `binary` columns with typed
metadata, processed by Arrow-batched pandas iterators (`mapInPandas`) — the
sanctioned Python path: batches cross the JVM↔Python boundary as Arrow
buffers, never row-at-a-time.

The decode kernels themselves are STUBBED: the real image/audio libraries
are not in this container, so `decode_image` et al. run a deterministic
fake decoder (documented below) behind the same schema/partitioning/batch
plumbing a real decoder would use. Swapping in PIL/torchaudio is a
one-function change — the Spark-side contract (schema, UDF signature,
Arrow batching, partition sizing) is real and tested.

Scale notes (100 TB of media):
  * binary payloads ride in Parquet BINARY columns; `maxPartitionBytes`
    keeps per-task memory bounded — decode is embarrassingly parallel,
    zero shuffles;
  * metadata extraction emits narrow typed rows, so downstream filters/
    joins prune the heavy binary column at the scan (column pruning —
    verify via .explain ReadSchema);
  * frame sampling yields multiple rows per input via the pandas iterator
    (flat-map shape) without materializing whole videos.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Synthetic payloads: deterministic fake media derived from doc text — lets
# every pipeline stage run end-to-end with stable, oracle-checkable values.
# --------------------------------------------------------------------------


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Add a deterministic `media` binary column + metadata (a stand-in for
    reading real bytes from Parquet/object storage). Header layout:
    4-byte magic 'FAKE' | uint16 width | uint16 height | md5(text)[:8]."""
    # Every header field derives from length(text)/md5(text) only, so a SQL
    # oracle (DuckDB) can recompute the decoded metadata exactly.
    height_src = F.expr(
        "CAST(conv(substr(md5(text), 17, 8), 16, 10) AS BIGINT) % 480 + 16")
    return docs.select(
        "doc_id",
        F.to_binary(
            F.concat(
                F.lit("46414b45"),  # 'FAKE'
                F.lpad(F.hex((F.length("text") % 640) + 16), 4, "0"),
                F.lpad(F.hex(height_src), 4, "0"),
                F.substring(F.md5("text"), 1, 16),
            ),
            F.lit("hex"),
        ).alias("media"),
        F.col("n_chars").alias("payload_hint"),
    )


IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("content_fp", T.StringType()),
])


def decode_image_meta(media_df: DataFrame) -> DataFrame:
    """Parse the media header into typed metadata via mapInPandas.

    REAL DECODE IS STUBBED: a production build replaces `_parse_batch`'s
    header unpack with `PIL.Image.open(io.BytesIO(buf))`; everything else
    (Arrow batching, schema, pruning) is unchanged.
    """

    def _parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "n_bytes": [],
                   "content_fp": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                if buf is None or len(buf) < 16 or bytes(buf[:4]) != b"FAKE":
                    continue  # a real decoder would route to a quarantine sink
                w = struct.unpack(">H", bytes(buf[4:6]))[0]
                h = struct.unpack(">H", bytes(buf[6:8]))[0]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(buf))
                out["content_fp"].append(bytes(buf[8:16]).hex())
            yield pd.DataFrame(out)

    # guide §4.1: Spark cannot see which columns the Python function reads,
    # so ship ONLY what it needs across the Arrow boundary (and let the
    # pruned projection reach the scan) — callers may pass wider frames.
    return media_df.select("doc_id", "media").mapInPandas(
        _parse_batch, IMAGE_META_SCHEMA)


FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def extract_features(media_df: DataFrame, dim: int = 8) -> DataFrame:
    """Fixed-dim feature vector per payload (STUB: md5-seeded pseudo
    embedding; a real build calls a vision encoder here). Demonstrates the
    wide→narrow mapInPandas shape feeding the similarity-search operators.

    The stub hashes the payload's lowercase hex (not the raw bytes) and
    emits doubles so a SQL oracle (DuckDB has no md5-over-BLOB) recomputes
    every component exactly: v_i = int(md5hex[4i:4i+4], 16)/65535 - 0.5."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "feature": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                if buf is None:
                    continue
                h = hashlib.md5(bytes(buf).hex().encode()).hexdigest()
                vec = [
                    (int(h[4 * i:4 * i + 4], 16) / 65535.0) - 0.5
                    for i in range(dim)
                ]
                rows["doc_id"].append(doc_id)
                rows["feature"].append(vec)
            yield pd.DataFrame(rows)

    # prune to the columns the stub reads before the Arrow boundary (§4.1)
    return media_df.select("doc_id", "media").mapInPandas(
        _embed, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_fp", T.StringType()),
])


def sample_frames(media_df: DataFrame, every_n: int = 4,
                  max_frames: int = 3) -> DataFrame:
    """Flat-map shape: N output rows per input payload (video → sampled
    frames). STUB: frame fingerprints derive from the content hash; a real
    build seeks the container and decodes keyframes."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_fp": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                if buf is None or len(buf) < 16:
                    continue
                # fingerprint over hex-string + index (not raw bytes) so a
                # SQL oracle recomputes it — see extract_features
                base_hex = bytes(buf[8:16]).hex()
                for k in range(max_frames):
                    idx = k * every_n
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_fp"].append(
                        hashlib.md5(f"{base_hex}:{idx}".encode()).hexdigest()[:12])
            yield pd.DataFrame(rows)

    # prune to the columns the stub reads before the Arrow boundary (§4.1)
    return media_df.select("doc_id", "media").mapInPandas(
        _frames, FRAME_SCHEMA)


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_s", T.DoubleType()),
])

_AUDIO_RATES = (16000, 22050, 44100)


def attach_fake_audio(docs: DataFrame) -> DataFrame:
    """Deterministic fake audio payloads. Header layout:
    4-byte magic 'FAKA' | uint16 rate code | uint32 n_samples | md5(text)[:8].
    Every field derives from length(text)/md5(text) so a SQL oracle can
    recompute the decoded metadata exactly."""
    code = F.length("text") % 3
    n_samples = (F.length("text") * 997) % 4194304 + 1000
    return docs.select(
        "doc_id",
        F.to_binary(
            F.concat(
                F.lit("46414b41"),  # 'FAKA'
                F.lpad(F.hex(code), 4, "0"),
                F.lpad(F.hex(n_samples), 8, "0"),
                F.substring(F.md5("text"), 1, 16),
            ),
            F.lit("hex"),
        ).alias("media"),
    )


def decode_audio_meta(media_df: DataFrame) -> DataFrame:
    """Audio header → (sample_rate, n_samples, duration). REAL DECODE IS
    STUBBED: a production build replaces the header unpack with
    soundfile/torchaudio metadata reads; the Arrow batching, schema, and
    binary-column pruning are the real contract."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sample_rate": [], "n_samples": [],
                   "duration_s": []}
            for doc_id, buf in zip(pdf["doc_id"], pdf["media"]):
                if buf is None or len(buf) < 18 or bytes(buf[:4]) != b"FAKA":
                    continue  # quarantine sink in a real pipeline
                code = struct.unpack(">H", bytes(buf[4:6]))[0]
                n = struct.unpack(">I", bytes(buf[6:10]))[0]
                rate = _AUDIO_RATES[code % len(_AUDIO_RATES)]
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_s"].append(n / rate)
            yield pd.DataFrame(out)

    # prune to the columns the stub reads before the Arrow boundary (§4.1)
    return media_df.select("doc_id", "media").mapInPandas(
        _parse, AUDIO_META_SCHEMA)
