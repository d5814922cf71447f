"""Deduplication operators over the `documents` table.

Exact dedup (hash-groupBy), MinHash+LSH near-dup (shingle → minhash → band →
bucket-join → verify), SimHash, and n-gram Jaccard. Every stage is built from
Catalyst higher-order array functions + joins — no Python in the hot path —
so the same plan distributes: the only shuffles are the band-bucket join and
the verification join, both keyed well-spread by construction (hash keys).

Scale notes (100 TB):
  * MinHash candidate generation is linear: explode docs × n_bands rows,
    shuffle on (band, signature) — signatures are uniform, no skew.
  * Verification joins only candidate pairs (tiny vs the corpus) back to the
    shingle sets — a broadcast of the pair list when it fits, else a shuffle
    join on doc_id.
  * All-pairs n-gram Jaccard is quadratic by nature, so the oracle-checked
    query bounds it to a key range; at scale the MinHash path replaces it.

MinHash math (both engines, exact integer arithmetic):
    h(s)     = int(md5(s)[:15 hex]) % P          (identical md5 both sides)
    mh_j     = min over shingles of (A_j * h + B_j) % P
    band sig = md5(mh_{2t} || '_' || mh_{2t+1})   (b=4 bands, r=2 rows)
with P = 1_000_000_007 and fixed A_j/B_j literals below (A_j*h < 2^63: safe).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dsq_spark.queries.base import register, t
from dsq_spark.queries.text import D_NORM, D_TOKENS, NORM, TOKENS

P = 1_000_000_007
N_HASHES = 8
N_BANDS = 4  # r = 2 rows per band
_rng = random.Random(42)
A = [_rng.randrange(1, P) for _ in range(N_HASHES)]
B = [_rng.randrange(0, P) for _ in range(N_HASHES)]

# --- shared expression builders (Spark dialect / DuckDB dialect) -----------

# 3-word shingles, distinct; docs shorter than 3 tokens fall back to the
# whole normalized text as a single shingle.
SHINGLES = (
    f"CASE WHEN size({TOKENS}) >= 3 THEN array_distinct(transform("
    f"sequence(0, size({TOKENS}) - 3), i -> concat(element_at({TOKENS}, i + 1), ' ', "
    f"element_at({TOKENS}, i + 2), ' ', element_at({TOKENS}, i + 3)))) "
    f"ELSE array({NORM}) END"
)
D_SHINGLES = (
    f"CASE WHEN length({D_TOKENS}) >= 3 THEN list_distinct(list_transform("
    f"range(0, length({D_TOKENS}) - 2), i -> concat({D_TOKENS}[i + 1], ' ', "
    f"{D_TOKENS}[i + 2], ' ', {D_TOKENS}[i + 3]))) "
    f"ELSE [{D_NORM}] END"
)

HASHES = (
    f"transform({SHINGLES}, s -> CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT) % {P})"
)
D_HASHES = (
    f"list_transform({D_SHINGLES}, s -> CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT) % {P})"
)


def _minhash_cols():
    """Spark: one column per minhash slot."""
    return [
        F.expr(f"array_min(transform(hs, h -> ({A[j]} * h + {B[j]}) % {P}))").alias(f"mh{j}")
        for j in range(N_HASHES)
    ]


def _d_minhash_exprs():
    return ", ".join(
        f"list_min(list_transform(hs, h -> ({A[j]} * h + {B[j]}) % {P})) AS mh{j}"
        for j in range(N_HASHES)
    )


@register(
    "dedup_exact",
    oracle=f"""
WITH fp AS (SELECT source, md5({D_NORM}) AS fp FROM documents)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT fp) AS n_unique,
       count(*) - count(DISTINCT fp) AS n_duplicates
FROM fp
GROUP BY source
""",
    doc="Exact dedup via normalized-content hash groupBy — the linear-scan "
        "baseline; at scale this is one shuffle on a uniform 128-bit key.",
)
def dedup_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    fp = d.select("source", F.md5(F.expr(NORM)).alias("fp"))
    return fp.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        (F.count("*") - F.countDistinct("fp")).alias("n_duplicates"),
    )


def _band_sig_exprs():
    """Spark band-signature columns from mh0..mh{N_HASHES-1}."""
    return [
        F.md5(F.concat_ws("_", F.col(f"mh{2 * t}"), F.col(f"mh{2 * t + 1}"))).alias(f"band{t}")
        for t in range(N_BANDS)
    ]


@register(
    "dedup_minhash_lsh",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {D_HASHES} AS hs, {D_SHINGLES} AS shingles FROM documents
),
mh AS (
  SELECT doc_id, shingles, {_d_minhash_exprs()} FROM sh
),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {tband} AS band_idx, md5(concat(mh{2 * tband}, '_', mh{2 * tband + 1})) AS sig, shingles FROM mh"
      for tband in range(N_BANDS))}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.sig = b.sig AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sets sa ON sa.doc_id = c.doc_a
  JOIN sets sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
  GROUP BY c.doc_a, c.doc_b
)
SELECT c.doc_a, c.doc_b,
       round(coalesce(i.i, 0) * 1.0 / (za.n + zb.n - coalesce(i.i, 0)), 4) AS jaccard
FROM cand c
LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes za ON za.doc_id = c.doc_a
JOIN sizes zb ON zb.doc_id = c.doc_b
WHERE coalesce(i.i, 0) * 1.0 / (za.n + zb.n - coalesce(i.i, 0)) >= 0.5
""",
    doc="MinHash+LSH near-duplicate pairs: 3-word shingles → 8 minhashes → "
        "4 bands of 2 → bucket self-join → exact-Jaccard verification ≥ 0.5. "
        "Linear candidate generation; only candidates pay the quadratic cost.",
)
def dedup_minhash_lsh(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sh = d.select("doc_id", F.expr(HASHES).alias("hs"), F.expr(SHINGLES).alias("shingles"))
    mh = sh.select("doc_id", "shingles", *_minhash_cols())
    bands_cols = _band_sig_exprs()
    bands = None
    for tband in range(N_BANDS):
        piece = mh.select(
            "doc_id", F.lit(tband).alias("band_idx"), bands_cols[tband].alias("sig"), "shingles"
        )
        bands = piece if bands is None else bands.unionAll(piece)
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band_idx", "sig"
    )
    b = bands.select(F.col("doc_id").alias("doc_b"), F.col("band_idx").alias("band_idx_b"), F.col("sig").alias("sig_b"))
    cand = (
        a.join(b, (a.band_idx == b.band_idx_b) & (a.sig == b.sig_b) & (a.doc_a < b.doc_b))
        .select("doc_a", "doc_b").distinct()
    )
    sets = sh.select("doc_id", F.explode("shingles").alias("s"))
    sizes = sets.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b2"), F.col("s").alias("s_b"))
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, (F.col("doc_b") == F.col("doc_b2")) & (F.col("s_a") == F.col("s_b")))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("i"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.coalesce(F.col("i"), F.lit(0)) * 1.0 / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("i"), F.lit(0)))
    return (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a").join(zb, "doc_b")
        .filter(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, unnest({D_SHINGLES}) AS s FROM documents WHERE doc_id < 60
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (za.n + zb.n - i), 4) AS jaccard
FROM inter
JOIN sizes za ON za.doc_id = doc_a
JOIN sizes zb ON zb.doc_id = doc_b
WHERE i * 1.0 / (za.n + zb.n - i) >= 0.05
""",
    doc="Exact n-gram (3-word shingle) Jaccard over a bounded key range — "
        "the quadratic ground truth the MinHash path approximates.",
)
def dedup_ngram_jaccard(spark, sf_dir):
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = d.select("doc_id", F.explode(F.expr(SHINGLES)).alias("s"))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    inter = (
        a.join(b, (F.col("s_a") == F.col("s_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("i"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    jac = F.col("i") * 1.0 / (F.col("n_a") + F.col("n_b") - F.col("i"))
    return (
        inter.join(za, "doc_a").join(zb, "doc_b")
        .filter(jac >= 0.05)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# SimHash: 32-bit signature from per-token hash bit votes.
SIMHASH = (
    f"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, b) -> acc + "
    f"CASE WHEN aggregate(hs, CAST(0 AS BIGINT), "
    f"(v, h) -> v + CASE WHEN (h & shiftleft(CAST(1 AS BIGINT), b)) != 0 THEN 1 ELSE -1 END) > 0 "
    f"THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END)"
)
D_SIMHASH = (
    f"list_reduce(list_prepend(CAST(0 AS BIGINT), range(0, 32)), (acc, b) -> acc + "
    f"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), hs), "
    f"(v, h) -> v + CASE WHEN (h & (CAST(1 AS BIGINT) << b)) != 0 THEN 1 ELSE -1 END) > 0 "
    f"THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)"
)

# Token hashes for simhash: distinct tokens (set semantics), 60-bit md5 prefix.
TOKEN_HASHES = (
    f"transform(array_distinct({TOKENS}), "
    f"x -> CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT))"
)
D_TOKEN_HASHES = (
    f"list_transform(list_distinct({D_TOKENS}), "
    f"x -> CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT))"
)


@register(
    "dedup_simhash",
    oracle=f"""
WITH sh AS (
  SELECT doc_id, {D_TOKEN_HASHES} AS hs FROM documents
),
sig AS (SELECT doc_id, {D_SIMHASH} AS simhash FROM sh),
chunks AS (
  SELECT doc_id, simhash, unnest(range(0, 4)) AS k FROM sig
),
keyed AS (
  SELECT doc_id, simhash, k, (simhash >> (8 * CAST(k AS INTEGER))) & 255 AS chunk FROM chunks
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM keyed a JOIN keyed b
    ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
FROM pairs
WHERE bit_count(xor(sim_a, sim_b)) <= 6
""",
    doc="SimHash near-dup: 32-bit bit-vote signature over token hashes; "
        "4×8-bit chunk LSH (any-equal-chunk ⊇ hamming≤3 by pigeonhole, "
        "verified ≤6 here) — linear candidate generation at corpus scale.",
)
def dedup_simhash(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    sig = d.select("doc_id", F.expr(TOKEN_HASHES).alias("hs")).select(
        "doc_id", F.expr(SIMHASH).alias("simhash")
    )
    keyed = sig.select(
        "doc_id", "simhash", F.explode(F.expr("sequence(0, 3)")).alias("k")
    ).select(
        "doc_id", "simhash", "k",
        F.expr("shiftright(simhash, 8 * k) & 255").alias("chunk"),
    )
    a = keyed.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"), "k", "chunk")
    b = keyed.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"),
                     F.col("k").alias("k_b"), F.col("chunk").alias("chunk_b"))
    pairs = (
        a.join(b, (a.k == b.k_b) & (a.chunk == b.chunk_b) & (a.doc_a < b.doc_b))
        .select("doc_a", "doc_b", "sim_a", "sim_b").distinct()
    )
    hamming = F.expr("bit_count(sim_a ^ sim_b)")
    return pairs.filter(hamming <= 6).select(
        "doc_a", "doc_b", hamming.cast("long").alias("hamming")
    )
