"""Large-scale training-data pipeline operators over the documents /
embeddings tables.

These are the corpus-preparation capabilities a 100 TB transcript
pipeline needs around the index (dedup before indexing, quality/lang
filtering, fingerprinting for lineage, similarity search over
embeddings). They are built Spark-first: every operator below except
the (deliberately) UDF-based multimodal stub is pure DataFrame API —
JVM-side, whole-stage-codegen friendly, no Python in the hot path.

Scale notes (the 1000-executor story for each):
- exact dedup: one hash-partitioned groupBy on md5(text) — the shuffle
  key is uniform by construction.
- MinHash-LSH: banding turns the all-pairs O(n²) into per-band-bucket
  candidate joins; hot buckets (boilerplate shingles) are the skew
  point — AQE skew-join handles moderate cases, and the band key can
  be salted by doc-block exactly like the index build's stop-term
  splitting.
- SimHash / min-k fingerprints: embarrassingly parallel per row
  (map-only, no shuffle except the final write).
- brute-force kNN: broadcast the (tiny) query set, scan-and-score all
  vectors, per-partition top-k then global top-k — the same bounded
  shuffle shape as the BM25 scorer.
- LSH kNN: hyperplane bucketing pre-partitions vectors; the join is
  bucket-equality (pruned scan), the scale path when queries are many.

Deterministic parity: all hashing is md5-based (identical in Spark and
DuckDB), all pseudo-randomness (LSH hyperplanes) is closed-form
integer arithmetic, so every operator has an exact SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# same token definition as the index tokenizer's ASCII path / the
# entry-contract corpus CTE
TOKS_EXPR = "regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0)"

STOPWORDS = [
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "or",
]

# language marker sets (disjoint on purpose; deterministic tie-break
# en > de > fr > es, fallback 'und')
LANG_MARKERS = {
    "en": ["the", "and", "with", "this", "that"],
    "de": ["der", "und", "nicht", "das", "ein"],
    "fr": ["les", "une", "dans", "pour", "avec"],
    "es": ["los", "una", "por", "como", "pero"],
}

MINHASH_K = 8
MINHASH_ROWS_PER_BAND = 2
MINHASH_SHINGLE = 3
MINHASH_JACCARD = 0.3

KNN_QUERY_IDS = [0, 1, 2]
LSH_PLANES = 8  # legacy single-table signature width (kept for tests)
LSH_BANDS = 4  # multi-band LSH: bands of sign-bit signatures —
LSH_ROWS = 6  # candidate = shares ANY band (banded OR, recall knob)
EMB_DIM = 64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- dedup
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate detection: md5(text) groups; the lowest doc_id
    in each group is the keeper. One uniform hash shuffle."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.col("text")).alias("text_hash")
    )
    groups = docs.groupBy("text_hash").agg(
        F.min("doc_id").alias("keep_doc"), F.count("*").alias("group_size")
    )
    return docs.join(groups, "text_hash").select(
        "doc_id",
        "text_hash",
        F.col("group_size").cast("long").alias("group_size"),
        (F.col("doc_id") == F.col("keep_doc")).alias("is_keeper"),
    )


def _shingles(spark: SparkSession, sf_dir: str, n: int = MINHASH_SHINGLE) -> DataFrame:
    """Distinct word n-gram shingles per doc (docs with < n tokens drop
    out — they have no shingle set to compare)."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.expr(TOKS_EXPR).alias("toks"))
        .filter(F.expr(f"size(toks) >= {n}"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"array_distinct(transform(sequence(0, size(toks) - {n}),"
                    f" j -> concat_ws(' ', slice(toks, j + 1, {n}))))"
                )
            ).alias("shingle"),
        )
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-duplicate pairs, Jaccard-verified.

    shingle → K md5-minhash signatures → bands of R rows → docs
    sharing a band key are candidates → exact Jaccard over distinct
    shingle sets filters to >= threshold. The banded join replaces the
    quadratic all-pairs comparison; signatures are min-aggregations
    (map-side combinable).
    """
    k, r = MINHASH_K, MINHASH_ROWS_PER_BAND
    sh = _shingles(spark, sf_dir).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sigs = (
        sh.select(
            "doc_id",
            "shingle",
            F.explode(F.expr(f"sequence(0, {k - 1})")).alias("i"),
        )
        .select(
            "doc_id",
            "i",
            F.md5(
                F.concat_ws("|", F.col("i").cast("string"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("h").alias("sig"))
    )
    bands = (
        sigs.withColumn("band", F.expr(f"CAST(i / {r} AS INT)"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                "",
                *[
                    F.max(F.when(F.col("i") % r == j, F.col("sig")))
                    for j in range(r)
                ],
            ).alias("bkey")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_int"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_int").cast("long").alias("intersection"),
            F.col("n_a").cast("long").alias("n_shingles_a"),
            F.col("n_b").cast("long").alias("n_shingles_b"),
            (
                F.col("n_int").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_int")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= MINHASH_JACCARD)
    )
    return out


def dedup_minhash_lsh_sql() -> str:
    k, r, n, thr = MINHASH_K, MINHASH_ROWS_PER_BAND, MINHASH_SHINGLE, MINHASH_JACCARD
    row_cols = " || ".join(
        f"max(CASE WHEN i % {r} = {j} THEN sig END)" for j in range(r)
    )
    return f"""
WITH dtoks AS (
  SELECT doc_id, {TOKS_EXPR.replace("(text", "(text")} AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(0, len(toks) - {n - 1}),
                j -> array_to_string(list_slice(toks, j + 1, j + {n}), ' ')))) AS shingle
  FROM dtoks WHERE len(toks) >= {n}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
sigs AS (
  SELECT doc_id, i, min(md5(CAST(i AS VARCHAR) || '|' || shingle)) AS sig
  FROM sh CROSS JOIN (SELECT unnest(range(0, {k})) AS i) idx
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, CAST(i / {r} AS INT) AS band, {row_cols} AS bkey
  FROM sigs GROUP BY doc_id, CAST(i / {r} AS INT)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_int
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_int AS BIGINT) AS intersection,
       CAST(na.n_sh AS BIGINT) AS n_shingles_a,
       CAST(nb.n_sh AS BIGINT) AS n_shingles_b,
       CAST(i.n_int AS DOUBLE)
         / CAST(na.n_sh + nb.n_sh - i.n_int AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE CAST(i.n_int AS DOUBLE)
      / CAST(na.n_sh + nb.n_sh - i.n_int AS DOUBLE) >= {thr}
"""


# exact n-gram Jaccard dedup: same pair spec as the MinHash member but
# candidate generation is an inverted-index (rare-n-gram blocking) join
# instead of banded signatures — every pair sharing at least one n-gram
# with df <= NGRAM_DF_CAP is compared exactly. The df cap is the scale
# guard (prefix-filtering analogue): a boilerplate n-gram shared by
# every doc would otherwise emit a quadratic candidate set; capping df
# bounds any one join key to <= cap^2 candidate pairs, and near-dup
# pairs still block on their rare n-grams. The cap is part of the
# operator's spec, mirrored exactly by the SQL oracle.
NGRAM_N = MINHASH_SHINGLE
NGRAM_DF_CAP = 20
NGRAM_THR = MINHASH_JACCARD


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via rare-n-gram
    blocking. Unlike MinHash (probabilistic banding), recall is
    guaranteed for any pair sharing >= 1 n-gram rarer than the df cap;
    the exact-intersection rerank is shared with the MinHash member.
    Same output schema as :func:`dedup_minhash_lsh` so both certify
    under one suite entry (on this corpus both find the identical 25
    planted near-dup pairs — a cross-validation of the two methods)."""
    n, cap, thr = NGRAM_N, NGRAM_DF_CAP, NGRAM_THR
    sh = _shingles(spark, sf_dir, n=n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    rare = sh.join(dfc.filter(F.col("df") <= cap), "shingle").select(
        "doc_id", "shingle"
    )
    a = rare.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = rare.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_int"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_int").cast("long").alias("intersection"),
            F.col("n_a").cast("long").alias("n_shingles_a"),
            F.col("n_b").cast("long").alias("n_shingles_b"),
            (
                F.col("n_int").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_int")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= thr)
    )


def dedup_ngram_jaccard_sql() -> str:
    n, cap, thr = NGRAM_N, NGRAM_DF_CAP, NGRAM_THR
    return f"""
WITH dtoks AS (
  SELECT doc_id, {TOKS_EXPR} AS toks FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(0, len(toks) - {n - 1}),
                j -> array_to_string(list_slice(toks, j + 1, j + {n}), ' ')))) AS shingle
  FROM dtoks WHERE len(toks) >= {n}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
dfc AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
rare AS (
  SELECT sh.doc_id, sh.shingle FROM sh JOIN dfc USING (shingle)
  WHERE dfc.df <= {cap}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
inter AS (
  SELECT p.doc_a, p.doc_b, count(*) AS n_int
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b AND sb.shingle = sa.shingle
  GROUP BY p.doc_a, p.doc_b
)
SELECT i.doc_a, i.doc_b,
       CAST(i.n_int AS BIGINT) AS intersection,
       CAST(na.n_sh AS BIGINT) AS n_shingles_a,
       CAST(nb.n_sh AS BIGINT) AS n_shingles_b,
       CAST(i.n_int AS DOUBLE)
         / CAST(na.n_sh + nb.n_sh - i.n_int AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes na ON na.doc_id = i.doc_a
JOIN sizes nb ON nb.doc_id = i.doc_b
WHERE CAST(i.n_int AS DOUBLE)
      / CAST(na.n_sh + nb.n_sh - i.n_int AS DOUBLE) >= {thr}
"""


# ----------------------------------------------------------- fingerprints
_HEX = "0123456789abcdef"
# hex chars with bit b set, for b = 0..3
_BIT_CHARS = {
    b: [c for i, c in enumerate(_HEX) if (i >> b) & 1] for b in range(4)
}


def _simhash_bit_case(nibble: int, bit: int, term_col: str) -> str:
    chars = ", ".join(f"'{c}'" for c in _BIT_CHARS[bit])
    return (
        f"CASE WHEN substr(md5({term_col}), {nibble + 1}, 1) IN ({chars})"
        f" THEN 1 ELSE -1 END"
    )


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit tf-weighted SimHash per doc, emitted as four 16-bit
    words (w0 = bits 0..15 of md5-nibble stream, ... w3 = bits 48..63).
    Map-only after the per-doc tf aggregation; generated column
    expressions keep all 64 bit-sums inside one codegen'd groupBy."""
    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.expr(TOKS_EXPR)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("cnt"))
    )
    sums = tf.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(cnt * ({_simhash_bit_case(b // 4, b % 4, 'term')}))"
            ).alias(f"s{b}")
            for b in range(64)
        ]
    )
    words = [
        sum(
            (F.when(F.col(f"s{16 * w + j}") > 0, 1).otherwise(0) * (1 << j))
            for j in range(16)
        ).cast("long").alias(f"w{w}")
        for w in range(4)
    ]
    return sums.select("doc_id", *words)


def simhash_sql() -> str:
    bit_sums = ",\n         ".join(
        f"sum(cnt * ({_simhash_bit_case(b // 4, b % 4, 'term')})) AS s{b}"
        for b in range(64)
    )
    words = ",\n       ".join(
        "CAST("
        + " + ".join(
            f"(CASE WHEN s{16 * w + j} > 0 THEN 1 ELSE 0 END) * {1 << j}"
            for j in range(16)
        )
        + f" AS BIGINT) AS w{w}"
        for w in range(4)
    )
    return f"""
WITH dtoks AS (
  SELECT doc_id, unnest({TOKS_EXPR}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS cnt FROM dtoks GROUP BY doc_id, term),
sums AS (
  SELECT doc_id,
         {bit_sums}
  FROM tf GROUP BY doc_id
)
SELECT doc_id,
       {words}
FROM sums
"""


# SimHash near-duplicate pairs: Hamming-distance blocking over the four
# 16-bit signature words. Pigeonhole: hamming <= SIMHASH_HAM_MAX (3)
# over 64 bits forces at least one of the 4 words to match exactly, so
# word-equality blocking has guaranteed recall at that radius. Exact
# Hamming is then bit_count(xor(...)) per word on the candidates only.
# Scale: the block join keys are 16-bit word values — up to 4 * 2^16
# buckets, each bounded by the corpus's signature collision rate; a
# degenerate all-same-word corpus is the skew case (AQE skew-join /
# salting, same playbook as the index build's stop terms).
SIMHASH_HAM_MAX = 3


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at Hamming radius <= SIMHASH_HAM_MAX.

    Output shares the near-dup pair suite schema: ``intersection`` is
    the number of agreeing bits (64 - hamming), ``n_shingles_a/b`` are
    the signature width (64), ``jaccard`` is the bit-agreement fraction
    — the signature-space similarity this member ranks by."""
    sig = simhash(spark, sf_dir)
    blocks = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(w).alias("w"), F.col(f"w{w}").alias("val")
                    )
                    for w in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.w").alias("w"), F.col("b.val").alias("val"))
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"w{w}").alias(f"a{w}") for w in range(4)],
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"w{w}").alias(f"b{w}") for w in range(4)],
    )
    ham = sum(
        F.bit_count(F.expr(f"a{w} ^ b{w}")) for w in range(4)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= SIMHASH_HAM_MAX)
        .select(
            "doc_a",
            "doc_b",
            (F.lit(64) - F.col("hamming")).cast("long").alias("intersection"),
            F.lit(64).cast("long").alias("n_shingles_a"),
            F.lit(64).cast("long").alias("n_shingles_b"),
            ((F.lit(64) - F.col("hamming")).cast("double") / 64.0).alias(
                "jaccard"
            ),
        )
    )


def dedup_simhash_pairs_sql() -> str:
    ham = " + ".join(f"bit_count(xor(sa.w{w}, sb.w{w}))" for w in range(4))
    return f"""
WITH sig AS (
{simhash_sql()}
),
blocks AS (
  SELECT doc_id, unnest([0, 1, 2, 3]) AS w, unnest([w0, w1, w2, w3]) AS val
  FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blocks a JOIN blocks b
    ON a.w = b.w AND a.val = b.val AND a.doc_id < b.doc_id
),
ham AS (
  SELECT p.doc_a, p.doc_b, {ham} AS hamming
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.doc_a
  JOIN sig sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b,
       CAST(64 - hamming AS BIGINT) AS intersection,
       CAST(64 AS BIGINT) AS n_shingles_a,
       CAST(64 AS BIGINT) AS n_shingles_b,
       CAST(64 - hamming AS DOUBLE) / 64.0 AS jaccard
FROM ham
WHERE hamming <= {SIMHASH_HAM_MAX}
"""


FP_NGRAM = 5
FP_K = 5


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min-k document fingerprint: the k smallest md5 hashes of the
    doc's 5-gram shingles, comma-joined — a compact sketch whose
    overlap estimates containment (winnowing-style). Pure map, no
    shuffle, no Python."""
    n, k = FP_NGRAM, FP_K
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(
            f"CASE WHEN size({TOKS_EXPR}) >= {n} THEN "
            f"concat_ws(',', slice(array_sort(array_distinct(transform("
            f"sequence(0, size({TOKS_EXPR}) - {n}), "
            f"j -> md5(concat_ws(' ', slice({TOKS_EXPR}, j + 1, {n})))))), 1, {k})) "
            f"ELSE '' END"
        ).alias("fingerprint"),
    )


def doc_fingerprint_sql() -> str:
    n, k = FP_NGRAM, FP_K
    return f"""
SELECT doc_id,
       CASE WHEN len({TOKS_EXPR}) >= {n} THEN
         array_to_string(list_slice(list_sort(list_distinct(list_transform(
           range(0, len({TOKS_EXPR}) - {n - 1}),
           j -> md5(array_to_string(list_slice({TOKS_EXPR}, j + 1, j + {n}), ' '))))),
           1, {k}), ',')
       ELSE '' END AS fingerprint
FROM documents
"""


# ----------------------------------------------------------- text analysis
# BPE-style pretokenizer regex (GPT-2-ish shape minus apostrophe
# contractions): space-attached letter runs, digit runs, punctuation
# runs — the cheap in-engine proxy for "how many BPE tokens will this
# text cost" before any model tokenizer runs
BPE_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token statistics: the indexer-regex count plus the two
    counts an LLM-pipeline budgeter wants — whitespace tokens and a
    BPE-ish pretokenizer count (both closed-form, no model needed)."""
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(f"CAST(size({TOKS_EXPR}) AS BIGINT)").alias("n_tokens"),
        F.expr(
            "CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
            "size(split(trim(text), '\\\\s+')) END AS BIGINT)"
        ).alias("n_ws_tokens"),
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit(BPE_RE), F.lit(0))
        ).cast("long").alias("n_bpe_tokens"),
        F.expr(f"CAST(size(array_distinct({TOKS_EXPR})) AS BIGINT)").alias(
            "n_unique"
        ),
        F.expr(
            f"CASE WHEN size({TOKS_EXPR}) > 0 THEN "
            f"CAST(aggregate(transform({TOKS_EXPR}, t -> length(t)), 0,"
            f" (a, x) -> a + x) AS DOUBLE) / CAST(size({TOKS_EXPR}) AS DOUBLE) "
            f"ELSE 0.0 END"
        ).alias("avg_token_len"),
        F.expr(
            f"CASE WHEN size({TOKS_EXPR}) > 0 THEN "
            f"CAST(size(filter({TOKS_EXPR}, t -> t rlike '^[0-9]+$')) AS DOUBLE)"
            f" / CAST(size({TOKS_EXPR}) AS DOUBLE) ELSE 0.0 END"
        ).alias("digit_ratio"),
        F.expr(
            f"CASE WHEN size({TOKS_EXPR}) > 0 THEN "
            f"CAST(size(filter({TOKS_EXPR}, t -> t IN ({stop}))) AS DOUBLE)"
            f" / CAST(size({TOKS_EXPR}) AS DOUBLE) ELSE 0.0 END"
        ).alias("stopword_ratio"),
    )


def token_stats_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    t = TOKS_EXPR
    return f"""
SELECT doc_id,
       CAST(len({t}) AS BIGINT) AS n_tokens,
       CAST(CASE WHEN trim(text) = '' THEN 0 ELSE
         len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
         AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{BPE_RE}')) AS BIGINT)
         AS n_bpe_tokens,
       CAST(len(list_distinct({t})) AS BIGINT) AS n_unique,
       CASE WHEN len({t}) > 0 THEN
         CAST(list_reduce(list_transform({t}, t -> length(t)), (a, x) -> a + x)
              AS DOUBLE) / CAST(len({t}) AS DOUBLE)
       ELSE 0.0 END AS avg_token_len,
       CASE WHEN len({t}) > 0 THEN
         CAST(len(list_filter({t}, t -> regexp_full_match(t, '[0-9]+')))
              AS DOUBLE) / CAST(len({t}) AS DOUBLE)
       ELSE 0.0 END AS digit_ratio,
       CASE WHEN len({t}) > 0 THEN
         CAST(len(list_filter({t}, t -> t IN ({stop}))) AS DOUBLE)
              / CAST(len({t}) AS DOUBLE)
       ELSE 0.0 END AS stopword_ratio
FROM documents
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality heuristic in [0, 1]:
    0.4·min(n_tokens,100)/100 + 0.3·min(stopword_ratio·5, 1)
    + 0.3·(1 − digit_ratio). Length says substance, stopwords say
    natural language, digits say log spam."""
    s = token_stats(spark, sf_dir)
    return s.select(
        "doc_id",
        (
            0.4 * (F.least(F.col("n_tokens"), F.lit(100)).cast("double") / 100.0)
            + 0.3 * F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0))
            + 0.3 * (1.0 - F.col("digit_ratio"))
        ).alias("quality"),
    )


def quality_score_sql() -> str:
    return f"""
WITH s AS ({token_stats_sql()})
SELECT doc_id,
       0.4 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)
       + 0.3 * least(stopword_ratio * 5.0, 1.0)
       + 0.3 * (1.0 - digit_ratio) AS quality
FROM s
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID with deterministic priority
    tie-break (en > de > fr > es, else 'und'); returns the prediction
    next to the table's labelled lang."""
    docs = _docs(spark, sf_dir)
    scores = [
        F.expr(
            f"size(filter({TOKS_EXPR}, t -> t IN "
            f"({', '.join(repr(m) for m in markers)})))"
        ).alias(f"sc_{lang}")
        for lang, markers in LANG_MARKERS.items()
    ]
    scored = docs.select("doc_id", F.col("lang").alias("labelled_lang"), *scores)
    best = F.greatest(*[F.col(f"sc_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best == 0, "und")
    for lang in LANG_MARKERS:  # dict order is the priority order
        pred = pred.when(F.col(f"sc_{lang}") == best, lang)
    return scored.select(
        "doc_id", "labelled_lang", pred.alias("pred_lang")
    )


def lang_id_sql() -> str:
    score_cols = ",\n       ".join(
        f"len(list_filter({TOKS_EXPR}, t -> t IN "
        f"({', '.join(repr(m) for m in markers)}))) AS sc_{lang}"
        for lang, markers in LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"sc_{lang}" for lang in LANG_MARKERS) + ")"
    whens = "\n            ".join(
        f"WHEN sc_{lang} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"""
WITH scored AS (
  SELECT doc_id, lang AS labelled_lang,
       {score_cols}
  FROM documents
)
SELECT doc_id, labelled_lang,
       CASE WHEN {best} = 0 THEN 'und'
            {whens}
       END AS pred_lang
FROM scored
"""


# ------------------------------------------------------ similarity search
def _dot_expr(a: str, b: str) -> str:
    """Sequential left-fold dot product (same summation order as the
    SQL oracle's list_reduce, so doubles agree bit-for-bit)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) ->"
        f" CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        f" CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def knn_brute_frame(
    emb: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Frame-level brute-force cosine top-k (exact recall baseline for
    the ANN paths on any embedding table)."""
    q = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q))
    scored = pairs.select(
        "q_id",
        "vec_id",
        F.round(
            F.expr(
                f"({_dot_expr('embedding', 'q_emb')})"
                f" / (sqrt({_dot_expr('embedding', 'embedding')})"
                f" * sqrt({_dot_expr('q_emb', 'q_emb')}))"
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def knn_brute_cosine(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Brute-force cosine top-k for a broadcast query set: scan all
    vectors once, score JVM-side, bounded top-k per query. The
    baseline ANN path — at 10^12 vectors this is the map-side of the
    same partial-top-k-then-merge shape as the BM25 scorer."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id").isin(KNN_QUERY_IDS)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pairs = emb.crossJoin(F.broadcast(q))
    scored = pairs.select(
        "q_id",
        "vec_id",
        F.round(
            F.expr(
                f"({_dot_expr('embedding', 'q_emb')})"
                f" / (sqrt({_dot_expr('embedding', 'embedding')})"
                f" * sqrt({_dot_expr('q_emb', 'q_emb')}))"
            ),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),"
        f" (x, y) -> x + y)"
    )


def knn_brute_cosine_sql(k: int = 10) -> str:
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN ({ids})
),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(({_duck_dot('e.embedding', 'q.q_emb')})
               / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
                  * sqrt({_duck_dot('q.q_emb', 'q.q_emb')})), 6) AS cosine
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT q_id,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC
         ) AS INTEGER) AS rank,
         vec_id, cosine
  FROM scored
)
SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= {k}
"""


def _plane_expr(j: int, dialect: str) -> str:
    """Deterministic pseudo-random hyperplane j over EMB_DIM dims:
    w[d] = ((1009*j + 9176*d) % 97 - 48) / 48.0."""
    if dialect == "spark":
        return (
            f"transform(sequence(0, {EMB_DIM - 1}), d ->"
            f" CAST(((1009 * {j} + 9176 * d) % 97 - 48) AS DOUBLE) / 48.0)"
        )
    return (
        f"list_transform(range(0, {EMB_DIM}), d ->"
        f" CAST(((1009 * {j} + 9176 * d) % 97 - 48) AS DOUBLE) / 48.0)"
    )


def _band_sig(b: int, n_rows: int) -> "F.Column":
    """Sign-bit signature of band b: n_rows hyperplane bits packed
    into an int (planes b·r .. b·r+r-1)."""
    return sum(
        (
            F.when(
                F.expr(
                    _dot_expr(
                        "embedding", _plane_expr(b * n_rows + j, "spark")
                    )
                )
                > 0,
                1,
            ).otherwise(0)
            * (1 << j)
        )
        for j in range(n_rows)
    ).cast("int")


def knn_lsh_frame(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    bands: int | None = None,
    rows: int | None = None,
) -> DataFrame:
    """Multi-band random-hyperplane LSH kNN over an (vec_id,
    embedding) frame: ``bands`` bands of ``rows`` sign bits each; a
    vector is a candidate when it shares ANY band signature with the
    query (the same banded OR as dedup_minhash_lsh), then exact cosine
    re-ranks the candidate union.

    Scale shape: signatures are precomputable partition keys, the
    candidate join touches `bands` buckets per query instead of the
    full scan, and recall is tunable with (bands, rows) — the
    single-table/single-probe variant this replaces could not reach
    usable recall at 10^12 vectors (one 256th of the corpus per probe
    is still ~4·10^9 vectors and misses near neighbors that flip one
    of 8 bits). Recall is a property of the DATA's neighbor angles:
    with planted near-duplicates (cosine ≥ 0.9) the defaults reach
    ≥0.9 recall (pytest-measured); on isotropic random vectors no
    sublinear method can (top-cosine ≈ 0.33 here ⇒ per-plane
    agreement ≈ 0.61)."""
    n_bands = LSH_BANDS if bands is None else bands
    n_rows = LSH_ROWS if rows is None else rows
    return _knn_lsh_impl(emb, query_ids, k, n_bands, n_rows)


def knn_lsh_bucketed(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Multi-band LSH kNN over the sf embeddings table — see
    :func:`knn_lsh_frame`."""
    return knn_lsh_frame(_emb(spark, sf_dir), KNN_QUERY_IDS, k)


def _knn_lsh_impl(
    emb: DataFrame, query_ids: list[int], k: int, n_bands: int, n_rows: int
) -> DataFrame:
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), _band_sig(b, n_rows).alias("sig"))
            for b in range(n_bands)
        ]
    )
    exploded = (
        emb.select("vec_id", bands.alias("bands"))
        .select("vec_id", F.explode("bands").alias("bs"))
        .select("vec_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    )
    qsig = exploded.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), "band", "sig"
    )
    cand_ids = (
        exploded.join(F.broadcast(qsig), ["band", "sig"])
        .select("q_id", "vec_id")
        .distinct()
    )
    qemb = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        cand_ids.join(emb, "vec_id")
        .join(F.broadcast(qemb), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(
                F.expr(
                    f"({_dot_expr('embedding', 'q_emb')})"
                    f" / (sqrt({_dot_expr('embedding', 'embedding')})"
                    f" * sqrt({_dot_expr('q_emb', 'q_emb')}))"
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def knn_lsh_bucketed_sql(k: int = 5) -> str:
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT vec_id, {b} AS band, CAST({sig} AS INTEGER) AS sig FROM embeddings".format(
            b=b,
            sig=" + ".join(
                f"(CASE WHEN ({_duck_dot('embedding', _plane_expr(b * LSH_ROWS + j, 'duck'))}) > 0"
                f" THEN 1 ELSE 0 END) * {1 << j}"
                for j in range(LSH_ROWS)
            ),
        )
        for b in range(LSH_BANDS)
    )
    return f"""
WITH bands AS (
  {band_selects}
),
q AS (
  SELECT vec_id AS q_id, band, sig FROM bands WHERE vec_id IN ({ids})
),
cand AS (
  SELECT DISTINCT q.q_id, b.vec_id
  FROM bands b JOIN q ON b.band = q.band AND b.sig = q.sig
),
scored AS (
  SELECT c.q_id, c.vec_id,
         round(({_duck_dot('e.embedding', 'eq.embedding')})
               / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
                  * sqrt({_duck_dot('eq.embedding', 'eq.embedding')})), 6) AS cosine
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN embeddings eq ON eq.vec_id = c.q_id
),
ranked AS (
  SELECT q_id,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC
         ) AS INTEGER) AS rank,
         vec_id, cosine
  FROM scored
)
SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------- IVF kNN
IVF_CELLS = 16  # coarse-quantizer size (nlist)
IVF_PROBES = 5  # cells searched per query (nprobe): the synthetic
# embeddings are uniform (no cluster structure for the quantizer to
# exploit), so 5/16 cells are needed to hold recall@10 >= 0.8; real
# embedding corpora cluster, letting nprobe/nlist shrink at scale
IVF_ITERS = 2  # Lloyd refinement rounds at build time


def ivf_nlist_for(n_vectors: int) -> int:
    """~sqrt(N) coarse-quantizer sizing — the standard IVF guidance
    (cells ~ sqrt(N) balances the two scan costs: nlist centroid
    comparisons per query vs N/nlist vectors per probed cell; see e.g.
    Jegou et al., PAMI 2011). Floors at IVF_CELLS so tiny fixtures
    keep the pinned oracle geometry, caps at 2^16 — beyond that the
    centroid table stops being broadcast-sized metadata and the coarse
    quantizer itself should become an index (IVF-HNSW territory)."""
    import math

    return int(
        max(IVF_CELLS, min(1 << 16, round(math.sqrt(max(n_vectors, 1)))))
    )


def ivf_nprobe_for(nlist: int) -> int:
    """Probes per query for a POLICY-sized quantizer: the bench's
    synthetic embeddings are uniform (no cluster structure), where
    holding recall@10 >= 0.8 (with margin) empirically needs ~45%
    of cells probed;
    real embedding corpora cluster, letting the fraction fall with
    scale. Floored at IVF_PROBES (the pinned small-fixture value)."""
    return int(max(IVF_PROBES, -(-nlist * 9 // 20)))

# sf_dir -> materialized IVF build directory (centroids + cells)
_IVF_BUILD_DIRS: dict[str, str] = {}


def _cosine_lambda_expr(a: str, b: str) -> str:
    return (
        f"({_dot_expr(a, b)})"
        f" / (sqrt({_dot_expr(a, a)}) * sqrt({_dot_expr(b, b)}))"
    )


def _centroid_literal(cents: list[tuple[int, list[float]]]):
    """The nlist centroids as an inline array<struct> column —
    centroids are query/build metadata that always fits in a broadcast
    (nlist << N), so nearest-centroid assignment becomes a pure
    whole-stage-codegen map with NO join and NO shuffle. Ordered by
    c_id so the left-fold argmax tie-breaks to the smallest c_id,
    matching the oracle's ORDER BY cosine DESC, c_id ASC."""
    return F.array(
        *[
            F.struct(
                F.lit(cid).cast("long").alias("c_id"),
                F.array(*[F.lit(float(v)) for v in vec]).alias("c_emb"),
            )
            for cid, vec in sorted(cents)
        ]
    )


#: above this nlist the assignment switches from the inline-literal
#: fold (bit-reproducible vs the DuckDB oracle, but codegen grows with
#: nlist*dim literals) to a vectorized numpy matmul in mapInPandas —
#: the only sane shape for a policy-sized (~sqrt N) quantizer
_IVF_EXPR_MAX_CELLS = 64


def _ivf_assign_map(emb: DataFrame, cents: list[tuple[int, list[float]]]) -> DataFrame:
    """Map-only nearest-centroid assignment: per row, argmax cosine
    over the centroids (ties keep the smaller c_id).

    Two bodies, one contract: small quantizers (the pinned oracle
    geometry) use a left-fold over an inline literal array — the SQL
    oracle reproduces it bit-for-bit; policy-sized quantizers run a
    numpy matmul against the broadcast centroid matrix (Arrow-batched,
    no join, no shuffle, codegen-independent of nlist)."""
    import numpy as np
    import pandas as pd

    ordered = sorted(cents)
    if len(ordered) <= _IVF_EXPR_MAX_CELLS:
        argmax = f"""
aggregate(
  transform(cents, c -> struct(
    {_cosine_lambda_expr("embedding", "c.c_emb")} AS c_cos,
    c.c_id AS c_id)),
  struct(CAST(-9.0 AS DOUBLE) AS c_cos, CAST(-1 AS BIGINT) AS c_id),
  (best, cand) -> CASE WHEN cand.c_cos > best.c_cos THEN cand ELSE best END
).c_id
"""
        return (
            emb.withColumn("cents", _centroid_literal(ordered))
            .select("vec_id", "embedding", F.expr(argmax).alias("cell"))
        )
    c_ids = np.array([cid for cid, _ in ordered], dtype=np.int64)
    cmat = np.array([vec for _, vec in ordered], dtype=np.float64)
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0.0] = 1.0

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["embedding"]), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1)
            xn[xn == 0.0] = 1.0
            cos = (x @ cmat.T) / np.outer(xn, cnorm)
            # argmax takes the FIRST maximum -> smallest c_id on ties
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "embedding": pdf["embedding"],
                    "cell": c_ids[np.argmax(cos, axis=1)],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        fn, schema=emb.select("vec_id", "embedding").schema.add("cell", "long")
    )


def train_ivf_centroids(
    emb: DataFrame, nlist: int = IVF_CELLS, iters: int = IVF_ITERS
) -> list[tuple[int, list[float]]]:
    """Distributed k-means for the IVF coarse quantizer.

    Init is a deterministic hash-spread sample — the ``nlist`` vectors
    with the smallest ``md5(vec_id)`` hex digest, an ordering both
    Spark and the SQL oracle reproduce exactly (a k-means|| oversampling
    init slots in here at web scale; the seeded sample keeps the oracle
    bit-reproducible). Each Lloyd round is two distributed jobs:

    - assignment: the map-only argmax of :func:`_ivf_assign_map`
      (no shuffle — centroids ride along as an inline array);
    - update: posexplode to (cell, pos, val), one groupBy computing the
      element-wise mean with INTEGER-quantized accumulation
      (sum of round(1e6*val) as BIGINT), so the new centroid is
      independent of float summation order — Spark partial aggregates
      and the DuckDB oracle agree bit-for-bit.

    Only the nlist centroid vectors (not the data) ever reach the
    driver, mirroring the reference keeping its dictionary head in RAM
    while postings stay external. Empty cells keep their previous
    centroid."""
    cents_df = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(nlist)
        .select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_emb"))
    )
    cur = [
        (int(r.c_id), [float(v) for v in r.c_emb]) for r in cents_df.collect()
    ]
    for _ in range(iters):
        assign = _ivf_assign_map(emb, cur)
        upd = (
            assign.select(
                "cell", F.posexplode("embedding").alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(
                F.sum(
                    F.round(F.col("val").cast("double") * 1000000.0).cast("long")
                ).alias("s"),
                F.count("*").alias("n"),
            )
            .withColumn(
                "m", F.col("s").cast("double") / F.lit(1000000.0) / F.col("n")
            )
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                F.col("cell").alias("c_id"),
                F.expr("transform(pm, x -> x.m)").alias("c_emb"),
            )
        )
        new = {
            int(r.c_id): [float(v) for v in r.c_emb] for r in upd.collect()
        }
        cur = [(cid, new.get(cid, vec)) for cid, vec in cur]
    return cur


def build_ivf_frame(
    spark: SparkSession,
    emb: DataFrame,
    cache_key: str,
    nlist: int = IVF_CELLS,
    iters: int = IVF_ITERS,
) -> str:
    """Materialize the IVF index for an arbitrary embedding frame as
    BUILD artifacts (the reference's split-index + merge recipe,
    README.md:78-86: precompute at index time, prune at query time):
    ``centroids/`` (nlist rows) and ``cells/`` — the full assignment
    written PARTITIONED BY cell, so a query's nprobe cells are parquet
    partition pruning, not a filter over a full scan. Cached per
    (cache_key, nlist); at deployment this is an Iceberg table
    partitioned on cell."""
    import tempfile

    key = f"{cache_key}#nlist={nlist}"
    if key not in _IVF_BUILD_DIRS:
        cents = train_ivf_centroids(emb, nlist=nlist, iters=iters)
        d = tempfile.mkdtemp(prefix="atire_ivf_")
        spark.createDataFrame(
            [(cid, vec) for cid, vec in cents],
            "c_id long, c_emb array<double>",
        ).write.parquet(f"{d}/centroids")
        _ivf_assign_map(emb, cents).write.partitionBy("cell").parquet(
            f"{d}/cells"
        )
        _IVF_BUILD_DIRS[key] = d
    return _IVF_BUILD_DIRS[key]


def build_ivf(spark: SparkSession, sf_dir: str) -> str:
    """sf_dir convenience wrapper around :func:`build_ivf_frame` with
    the PINNED small-fixture geometry (nlist=IVF_CELLS): the driver's
    DuckDB oracle transcribes exactly this k-means, so the correctness
    entry keeps a fixed nlist; scale deployments size the quantizer
    with :func:`ivf_nlist_for` via build_ivf_frame."""
    return build_ivf_frame(
        spark, _emb(spark, sf_dir), sf_dir.rstrip("/"), nlist=IVF_CELLS
    )


def knn_ivf_frame(
    spark: SparkSession,
    emb: DataFrame,
    cache_key: str,
    query_ids: list[int],
    k: int = 10,
    nlist: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbour over the
    PREBUILT index of :func:`build_ivf_frame`: rank the query against
    the nlist stored centroids (driver-side metadata, like the
    reference loading its stats head at startup), read ONLY the nprobe
    matching cell partitions (storage partition pruning — the plan
    shows PartitionFilters, no full scan and no window over the
    collection), exact-rerank the candidates with the same bounded
    top-k as :func:`knn_brute_cosine`.

    ``nlist=None`` applies the ~sqrt(N) policy
    (:func:`ivf_nlist_for`, with :func:`ivf_nprobe_for` probes) — the
    scale path; explicit values pin the geometry (the sf_dir oracle
    entry does).

    Scale shape: the candidate scan touches ~nprobe/nlist of the
    collection via partition pruning; query-time shuffle is only the
    per-query top-k over candidates."""
    if nlist is None:
        nlist = ivf_nlist_for(emb.count())
    if nprobe is None:
        nprobe = ivf_nprobe_for(nlist)
    d = build_ivf_frame(spark, emb, cache_key, nlist=nlist)
    cent_rows = [
        (int(r.c_id), [float(v) for v in r.c_emb])
        for r in spark.read.parquet(f"{d}/centroids").collect()
    ]
    q = emb.filter(F.col("vec_id").isin(query_ids))
    # top-nprobe cells per query: sort the inline centroid array by
    # (-cosine, c_id) — ties to the smaller c_id like the oracle
    probe_expr = f"""
slice(array_sort(transform(cents, c -> struct(
  -({_cosine_lambda_expr("embedding", "c.c_emb")}) AS neg_cos,
  c.c_id AS c_id))), 1, {int(nprobe)})
"""
    probes = (
        q.withColumn("cents", _centroid_literal(cent_rows))
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(F.expr(probe_expr)).alias("pr"),
        )
        .select("q_id", "q_emb", F.col("pr.c_id").alias("cell"))
    )
    # the probed cell ids are tiny query metadata (<= nprobe x |queries|
    # rows) — collecting them turns the cells read into a LITERAL
    # partition filter, which is what prunes files at the source
    need = sorted(
        {int(r.cell) for r in probes.select("cell").distinct().collect()}
    )
    cells = spark.read.parquet(f"{d}/cells").filter(F.col("cell").isin(need))
    pair_cos = F.expr(_cosine_lambda_expr("embedding", "q_emb"))
    scored = (
        F.broadcast(probes)
        .join(cells, "cell")
        .select("q_id", "vec_id", F.round(pair_cos, 6).alias("cosine"))
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "cosine")
    )


def knn_ivf(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """sf_dir wrapper with the PINNED oracle geometry
    (nlist=IVF_CELLS, nprobe=IVF_PROBES) — the DuckDB oracle
    transcribes exactly this build, so the driver's correctness entry
    keeps fixed constants; the ~sqrt(N) scale policy is exercised (and
    recall-certified) through :func:`knn_ivf_frame` in bench.py."""
    return knn_ivf_frame(
        spark,
        _emb(spark, sf_dir),
        sf_dir.rstrip("/"),
        KNN_QUERY_IDS,
        k=k,
        nlist=IVF_CELLS,
        nprobe=IVF_PROBES,
    )


def _ivf_kmeans_ctes(nlist: int = IVF_CELLS, iters: int = IVF_ITERS) -> tuple[str, str]:
    """The k-means training transcribed to chained CTEs (one pair per
    unrolled Lloyd round) — integer-quantized mean accumulation makes
    the float results order-independent, so this reproduces
    :func:`train_ivf_centroids` exactly."""
    ctes = [
        f"""
cents0 AS (
  SELECT CAST(vec_id AS BIGINT) AS c_id, embedding AS c_emb FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {nlist}
)"""
    ]
    for i in range(iters):
        cur, nxt = f"cents{i}", f"cents{i + 1}"
        ctes.append(
            f"""
asg{i} AS (
  SELECT vec_id, embedding, c_id AS cell FROM (
    SELECT e.vec_id, e.embedding, c.c_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY ({_duck_dot('e.embedding', 'c.c_emb')})
                      / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
                         * sqrt({_duck_dot('c.c_emb', 'c.c_emb')})) DESC,
                      c.c_id ASC
           ) AS crank
    FROM embeddings e CROSS JOIN {cur} c
  ) WHERE crank = 1
),
upd{i} AS (
  SELECT c_id, list(m ORDER BY pos) AS c_emb FROM (
    SELECT cell AS c_id, pos,
           CAST(sum(CAST(round(CAST(val AS DOUBLE) * 1000000.0) AS BIGINT))
                AS DOUBLE) / 1000000.0 / count(*) AS m
    FROM (
      SELECT cell,
             unnest(range(0, len(embedding))) AS pos,
             unnest(embedding) AS val
      FROM asg{i}
    ) GROUP BY cell, pos
  ) GROUP BY c_id
),
{nxt} AS (
  SELECT c.c_id, coalesce(u.c_emb, c.c_emb) AS c_emb
  FROM {cur} c LEFT JOIN upd{i} u USING (c_id)
)"""
        )
    return ",".join(ctes), f"cents{iters}"


def knn_ivf_sql(k: int = 10) -> str:
    ids = ", ".join(str(i) for i in KNN_QUERY_IDS)
    kmeans, final = _ivf_kmeans_ctes()
    return f"""
WITH {kmeans},
cells AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT e.vec_id, c.c_id,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY ({_duck_dot('e.embedding', 'c.c_emb')})
                      / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
                         * sqrt({_duck_dot('c.c_emb', 'c.c_emb')})) DESC,
                      c.c_id ASC
           ) AS crank
    FROM embeddings e CROSS JOIN {final} c
  ) WHERE crank = 1
),
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings
  WHERE vec_id IN ({ids})
),
probes AS (
  SELECT q_id, q_emb, cell FROM (
    SELECT q.q_id, q.q_emb, c.c_id AS cell,
           row_number() OVER (
             PARTITION BY q.q_id
             ORDER BY ({_duck_dot('q.q_emb', 'c.c_emb')})
                      / (sqrt({_duck_dot('q.q_emb', 'q.q_emb')})
                         * sqrt({_duck_dot('c.c_emb', 'c.c_emb')})) DESC,
                      c.c_id ASC
           ) AS qrank
    FROM q CROSS JOIN {final} c
  ) WHERE qrank <= {IVF_PROBES}
),
scored AS (
  SELECT p.q_id, s.vec_id,
         round(({_duck_dot('e.embedding', 'p.q_emb')})
               / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
                  * sqrt({_duck_dot('p.q_emb', 'p.q_emb')})), 6) AS cosine
  FROM probes p
  JOIN cells s USING (cell)
  JOIN embeddings e ON e.vec_id = s.vec_id
),
ranked AS (
  SELECT q_id,
         CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC
         ) AS INTEGER) AS rank,
         vec_id, cosine
  FROM scored
)
SELECT q_id, rank, vec_id, cosine FROM ranked WHERE rank <= {k}
"""


def _synth_media_payloads(doc_ids, texts) -> list[bytes]:
    """Deterministic REAL container payloads for the multimodal
    entries: even doc_ids get a valid PNG signature + IHDR chunk
    (big-endian, CRC32 included), odd doc_ids a valid BMP file header
    + BITMAPINFOHEADER (little-endian); the utf-8 text rides along as
    body bytes. Dimensions derive from doc_id so the SQL oracle can
    state the expected metadata WITHOUT parsing — the engine-side
    parser is checked against an independent derivation."""
    import struct
    import zlib

    out = []
    for d, txt in zip(doc_ids, texts):
        d = int(d)
        body = txt.encode("utf-8")
        w = 16 + d % 509
        h = 16 + (d * 7) % 277
        if d % 2 == 0:
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            chunk = b"IHDR" + ihdr
            out.append(
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", len(ihdr))
                + chunk
                + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
                + body
            )
        else:
            dib = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
            out.append(
                b"BM"
                + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                + dib
                + body
            )
    return out


def parse_media_header(buf: bytes) -> tuple[str, int, int, int]:
    """REAL container-header decode — pure byte parsing, no codec
    libraries: PNG IHDR (PNG spec 11.2.2: width/height as big-endian
    uint32 at bytes 16..24, bit depth + color type after) and BMP
    BITMAPINFOHEADER (width/height little-endian int32 at offsets
    18/22, bits-per-pixel uint16 at 28; negative height = top-down
    row order). Returns (format, width, height, channels). Pixel
    decoding (zlib IDAT inflation / BMP row unpacking) stays out of
    scope — the metadata path is what the table pipeline needs."""
    import struct

    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", buf[16:24])
        color_type = buf[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
        return "png", w, h, channels
    if buf[:2] == b"BM":
        w, h = struct.unpack("<ii", buf[18:26])
        bpp = struct.unpack("<H", buf[28:30])[0]
        return "bmp", w, abs(h), bpp // 8
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        # logical screen descriptor: width/height LE uint16 at 6..10
        w, h = struct.unpack("<HH", buf[6:10])
        return "gif", w, h, 3
    raise ValueError("unknown container magic")


def parse_wav_header(buf: bytes) -> tuple[int, int, int]:
    """RIFF/WAVE fmt-chunk decode (WAVE spec): returns (sample_rate,
    n_samples, channels). Canonical layout only (fmt chunk at offset
    12, data chunk at 36) — the synthetic payloads and most real PCM
    WAV files use it; sample decoding stays out of scope."""
    import struct

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE" or buf[12:16] != b"fmt ":
        raise ValueError("not a canonical RIFF/WAVE header")
    channels = struct.unpack("<H", buf[22:24])[0]
    sample_rate = struct.unpack("<I", buf[24:28])[0]
    bits = struct.unpack("<H", buf[34:36])[0]
    data_size = struct.unpack("<I", buf[40:44])[0]
    n_samples = data_size // (channels * (bits // 8))
    return sample_rate, n_samples, channels


def _media_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, payload binary) — the synthetic media table the
    multimodal operators consume (at deployment this is the real
    binary column of an Iceberg media table)."""
    import pandas as pd

    docs = _docs(spark, sf_dir).select("doc_id", "text")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": _synth_media_payloads(
                        pdf["doc_id"], pdf["text"]
                    ),
                }
            )

    return docs.mapInPandas(gen, schema="doc_id long, payload binary")


_AV_DOC_OFFSET = 10_000_000  # av payload doc_ids live past the corpus


def _synth_av_payloads(doc_ids) -> list[bytes]:
    """Deterministic GIF (even) / canonical PCM WAV (odd) payloads;
    parameters derive from doc_id so the SQL oracle restates them
    without parsing (same scheme as :func:`_synth_media_payloads`)."""
    import struct

    out = []
    for d in doc_ids:
        d = int(d)
        if d % 2 == 0:
            w = 16 + d % 509
            h = 16 + (d * 7) % 277
            out.append(
                b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00;"
            )
        else:
            channels = 1 + d % 2  # odd d -> always 2 here; kept general
            sample_rate = 8000 * (1 + d % 5)
            n_samples = 100 + d % 1000
            data_size = n_samples * channels * 2
            out.append(
                b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
                + b"fmt " + struct.pack(
                    "<IHHIIHH", 16, 1, channels, sample_rate,
                    sample_rate * channels * 2, channels * 2, 16,
                )
                + b"data" + struct.pack("<I", data_size)
                + b"\x00" * data_size
            )
    return out


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media metadata: the binary payload column flows
    through an Arrow mapInPandas stage whose :func:`parse_media_header`
    REALLY parses the container bytes (PNG IHDR / BMP info header) —
    format, dimensions, channel count. The oracle derives the expected
    values independently from the payload generation rule, so the
    byte parser itself is under test."""
    import pandas as pd

    payload = _media_payloads(spark, sf_dir)

    def gen_av(batches):
        for pdf in batches:
            ids = pdf["doc_id"] + _AV_DOC_OFFSET
            yield pd.DataFrame(
                {"doc_id": ids,
                 "payload": _synth_av_payloads(pdf["doc_id"])}
            )

    av = _docs(spark, sf_dir).select("doc_id").mapInPandas(
        gen_av, schema="doc_id long, payload binary"
    )
    payload = payload.unionByName(av)

    def fn(batches):
        for pdf in batches:
            metas = []
            for b in pdf["payload"]:
                b = bytes(b)
                if b[:4] == b"RIFF":
                    sr, n, ch = parse_wav_header(b)
                    metas.append(("wav", sr, n, ch))
                else:
                    metas.append(parse_media_header(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": [m[0] for m in metas],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": pd.Series([m[1] for m in metas], dtype="int32"),
                    "height": pd.Series([m[2] for m in metas], dtype="int32"),
                    "channels": pd.Series(
                        [m[3] for m in metas], dtype="int32"
                    ),
                }
            )

    return payload.mapInPandas(
        fn,
        schema=(
            "doc_id long, format string, n_bytes long, width int,"
            " height int, channels int"
        ),
    )


def multimodal_meta_sql() -> str:
    # expected metadata restated from the GENERATION rule (doc_id
    # arithmetic + fixed header sizes: PNG 8+4+4+13+4=33, BMP 14+40=54)
    # — intentionally NOT a parse, so the engine parser is truly checked
    return """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
       CAST(octet_length(encode(text))
            + CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 54 END AS BIGINT)
         AS n_bytes,
       CAST(16 + doc_id % 509 AS INTEGER) AS width,
       CAST(16 + (doc_id * 7) % 277 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels
FROM documents
UNION ALL
SELECT doc_id + 10000000 AS doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'gif' ELSE 'wav' END AS format,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 14
                 ELSE 44 + (100 + doc_id % 1000) * (1 + doc_id % 2) * 2
            END AS BIGINT) AS n_bytes,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + doc_id % 509
                 ELSE 8000 * (1 + doc_id % 5) END AS INTEGER) AS width,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 16 + (doc_id * 7) % 277
                 ELSE 100 + doc_id % 1000 END AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 3
                 ELSE 1 + doc_id % 2 END AS INTEGER) AS channels
FROM documents
"""


MM_TARGET = 224  # resize target box (edge, aspect-fit)
MM_FPS = 25  # fake container framerate for the frame sampler
MM_SAMPLE_EVERY_S = 2  # one sampled frame per 2 seconds of "video"
MM_BYTES_PER_FRAME = 64  # fake container: 64 payload bytes per frame




# --------------------------------------------------------- pixel payloads
# small pixel-bearing images for the REAL-decode entries: dims are kept
# tiny so the SQL oracle can restate per-pixel sums with generate_series
MM_PIX_TARGET = 8  # nearest-neighbour resample target box (edge)


def _pix_dims(d: int) -> tuple[int, int]:
    return 8 + d % 24, 8 + (d * 7) % 16


def _pix_value(d, y, x, c):
    """Closed-form pixel value — identical formula in the SQL oracle,
    so the whole decode chain (inflate, unfilter, row unpack) is
    checked against an independent derivation."""
    return (d * 31 + y * 97 + x * 13 + c * 7) % 256


def _pix_raster(d: int) -> "np.ndarray":
    import numpy as np

    w, h = _pix_dims(d)
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((d * 31 + y * 97 + x * 13 + c * 7) % 256).astype(np.uint8)


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib as _z

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", _z.crc32(tag + body) & 0xFFFFFFFF)
    )


def _synth_pixel_payloads(doc_ids) -> list[bytes]:
    """REAL raster payloads: even doc_ids a full PNG (8-bit RGB,
    zlib-compressed IDAT whose rows cycle through ALL FIVE standard
    filter types y%5 — None/Sub/Up/Average/Paeth — so the decoder's
    unfilter path is genuinely exercised), odd doc_ids a 24bpp
    bottom-up BMP with BGR byte order and 4-byte row padding. Pixels
    follow :func:`_pix_value`."""
    import struct
    import zlib as _z

    import numpy as np

    out = []
    for d in doc_ids:
        d = int(d)
        w, h = _pix_dims(d)
        raster = _pix_raster(d).reshape(h, w * 3).astype(np.int64)
        if d % 2 == 0:
            parts = []
            for y in range(h):
                row = raster[y]
                up = raster[y - 1] if y > 0 else np.zeros(w * 3, np.int64)
                left = np.concatenate((np.zeros(3, np.int64), row[:-3]))
                upleft = np.concatenate((np.zeros(3, np.int64), up[:-3]))
                ft = y % 5
                if ft == 0:
                    f = row
                elif ft == 1:  # Sub
                    f = row - left
                elif ft == 2:  # Up
                    f = row - up
                elif ft == 3:  # Average
                    f = row - (left + up) // 2
                else:  # Paeth
                    p = left + up - upleft
                    pa, pb, pc = (
                        np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up, upleft),
                    )
                    f = row - pred
                parts.append(
                    bytes([ft]) + (f % 256).astype(np.uint8).tobytes()
                )
            idat = _z.compress(b"".join(parts))
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            out.append(
                b"\x89PNG\r\n\x1a\n"
                + _png_chunk(b"IHDR", ihdr)
                + _png_chunk(b"IDAT", idat)
                + _png_chunk(b"IEND", b"")
            )
        else:
            row_size = (w * 3 + 3) // 4 * 4
            dib = struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
            body = []
            for y in range(h - 1, -1, -1):  # bottom-up
                bgr = (
                    raster[y]
                    .reshape(w, 3)[:, ::-1]
                    .astype(np.uint8)
                    .tobytes()
                )
                body.append(bgr + b"\x00" * (row_size - w * 3))
            data = b"".join(body)
            out.append(
                b"BM"
                + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
                + dib
                + data
            )
    return out


def decode_pixels(buf: bytes) -> "np.ndarray":
    """REAL pixel decode with stdlib-only byte work — returns an
    (h, w, 3) uint8 RGB array. PNG: chunk walk, IDAT concatenation,
    zlib inflate, and per-row unfiltering for all five standard filter
    types (PNG spec 9.2 — Sub vectorized as a per-channel cumulative
    sum; Average/Paeth reconstructed left-to-right since they depend
    on already-reconstructed neighbours). BMP: BITMAPINFOHEADER,
    bottom-up padded BGR rows."""
    import struct
    import zlib as _z

    import numpy as np

    buf = bytes(buf)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", buf[16:24])
        bit_depth, color_type = buf[24], buf[25]
        if bit_depth != 8 or color_type != 2:
            raise ValueError("decoder handles 8-bit RGB PNGs")
        pos, idat = 8, []
        while pos + 8 <= len(buf):
            (ln,) = struct.unpack(">I", buf[pos : pos + 4])
            tag = buf[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat.append(buf[pos + 8 : pos + 8 + ln])
            pos += 12 + ln
            if tag == b"IEND":
                break
        data = _z.decompress(b"".join(idat))
        stride = w * 3
        recon = np.zeros((h, stride), dtype=np.int64)
        for y in range(h):
            off = y * (1 + stride)
            ft = data[off]
            row = np.frombuffer(
                data, dtype=np.uint8, count=stride, offset=off + 1
            ).astype(np.int64)
            up = recon[y - 1] if y > 0 else np.zeros(stride, np.int64)
            if ft == 0:
                recon[y] = row
            elif ft == 1:  # Sub: per-channel cumulative sum
                recon[y] = (
                    row.reshape(w, 3).cumsum(axis=0).reshape(stride) % 256
                )
            elif ft == 2:
                recon[y] = (row + up) % 256
            elif ft == 3:  # Average
                r = recon[y]
                for i in range(stride):
                    left = r[i - 3] if i >= 3 else 0
                    r[i] = (row[i] + (left + up[i]) // 2) % 256
            elif ft == 4:  # Paeth
                r = recon[y]
                for i in range(stride):
                    a = r[i - 3] if i >= 3 else 0
                    b = up[i]
                    c = up[i - 3] if i >= 3 else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    r[i] = (row[i] + pred) % 256
            else:
                raise ValueError(f"unknown PNG filter {ft}")
        return recon.astype(np.uint8).reshape(h, w, 3)
    if buf[:2] == b"BM":
        w, h = struct.unpack("<ii", buf[18:26])
        bpp = struct.unpack("<H", buf[28:30])[0]
        (off,) = struct.unpack("<I", buf[10:14])
        if bpp != 24 or h <= 0:
            raise ValueError("decoder handles 24bpp bottom-up BMPs")
        row_size = (w * 3 + 3) // 4 * 4
        outrows = []
        for y in range(h):
            start = off + (h - 1 - y) * row_size
            bgr = np.frombuffer(
                buf, dtype=np.uint8, count=w * 3, offset=start
            ).reshape(w, 3)
            outrows.append(bgr[:, ::-1])
        return np.stack(outrows)
    raise ValueError("unknown container magic")


def resample_nearest(img: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbour resample: out[yo, xo] = src[yo*h//out_h,
    xo*w//out_w] — integer arithmetic only, so the SQL oracle can
    restate the sampled grid exactly."""
    import numpy as np

    h, w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[np.ix_(ys, xs)]


def _pixel_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": _synth_pixel_payloads(pdf["doc_id"]),
                }
            )

    return docs.mapInPandas(gen, schema="doc_id long, payload binary")


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-fit resize with a REAL pixel path: every payload is a
    genuine raster container (:func:`_synth_pixel_payloads` — PNG with
    zlib IDAT cycling all five row filters, or bottom-up padded BMP),
    DECODED to pixels in the Arrow stage (:func:`decode_pixels`:
    inflate + unfilter / row unpack), resampled nearest-neighbour into
    the MM_PIX_TARGET box (aspect-fit, never upscaling, integer
    arithmetic), and fingerprinted by pixel sums. The oracle restates
    the decoded AND the resampled sums from the closed-form pixel
    formula — the whole decode chain is checked against an
    independent derivation, not against itself."""
    import numpy as np
    import pandas as pd

    payload = _pixel_payloads(spark, sf_dir)
    t = MM_PIX_TARGET

    def fn(batches):
        for pdf in batches:
            rows = []
            for d, buf in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_pixels(bytes(buf))
                h, w = img.shape[:2]
                long_edge = max(w, h)
                if long_edge <= t:
                    ow, oh = w, h
                else:
                    ow, oh = (w * t) // long_edge, (h * t) // long_edge
                out = resample_nearest(img, ow, oh)
                rows.append(
                    (
                        int(d), w, h, ow, oh,
                        int(img.astype(np.int64).sum()),
                        int(out.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "out_width",
                    "out_height", "pix_sum", "out_pix_sum",
                ],
            )

    return payload.mapInPandas(
        fn,
        schema=(
            "doc_id long, width int, height int, out_width int,"
            " out_height int, pix_sum long, out_pix_sum long"
        ),
    )


def multimodal_resize_sql() -> str:
    t = MM_PIX_TARGET
    pix = "(d.doc_id * 31 + {y} * 97 + {x} * 13 + {c} * 7) % 256"
    return f"""
WITH dims AS (
  SELECT doc_id,
         CAST(8 + doc_id % 24 AS BIGINT) AS w,
         CAST(8 + (doc_id * 7) % 16 AS BIGINT) AS h
  FROM documents
),
outdims AS (
  SELECT doc_id, w, h,
         CASE WHEN greatest(w, h) <= {t} THEN w
              ELSE (w * {t}) // greatest(w, h) END AS ow,
         CASE WHEN greatest(w, h) <= {t} THEN h
              ELSE (h * {t}) // greatest(w, h) END AS oh
  FROM dims
),
fullsum AS (
  SELECT d.doc_id,
         sum({pix.format(y="(s.i // (d.w * 3))",
                         x="((s.i % (d.w * 3)) // 3)",
                         c="(s.i % 3)")}) AS pix_sum
  FROM dims d,
       LATERAL (
         SELECT unnest(generate_series(0, d.w * d.h * 3 - 1)) AS i
       ) s
  GROUP BY d.doc_id
),
outsum AS (
  SELECT d.doc_id,
         sum({pix.format(
             y="(((s.j // (d.ow * 3)) * d.h) // d.oh)",
             x="((((s.j % (d.ow * 3)) // 3) * d.w) // d.ow)",
             c="(s.j % 3)")}) AS out_pix_sum
  FROM outdims d,
       LATERAL (
         SELECT unnest(generate_series(0, d.ow * d.oh * 3 - 1)) AS j
       ) s
  GROUP BY d.doc_id
)
SELECT o.doc_id,
       CAST(o.w AS INTEGER) AS width,
       CAST(o.h AS INTEGER) AS height,
       CAST(o.ow AS INTEGER) AS out_width,
       CAST(o.oh AS INTEGER) AS out_height,
       CAST(f.pix_sum AS BIGINT) AS pix_sum,
       CAST(s.out_pix_sum AS BIGINT) AS out_pix_sum
FROM outdims o
JOIN fullsum f USING (doc_id)
JOIN outsum s USING (doc_id)
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque video-ish payloads: the container
    metadata (frame count at MM_BYTES_PER_FRAME, MM_FPS) is the
    deterministic fake; the sampling schedule (one frame every
    MM_SAMPLE_EVERY_S seconds, clamped to the last frame) and the
    row-exploding Arrow plumbing — one input payload → many frame
    rows — are the real part a decoder slots into.

    Each sampled frame carries a deterministic fingerprint (md5 over
    doc/frame metadata; a real decoder would hash the decoded frame
    bytes)."""
    import hashlib

    import numpy as np
    import pandas as pd

    payload = _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    step = MM_FPS * MM_SAMPLE_EVERY_S

    def fn(batches):
        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64").to_numpy()
            frames = np.maximum(n // MM_BYTES_PER_FRAME, 1)
            n_samples = (frames + step - 1) // step
            doc_ids = np.repeat(pdf["doc_id"].to_numpy(), n_samples)
            tot = np.repeat(frames, n_samples)
            sample_idx = np.concatenate(
                [np.arange(k, dtype=np.int64) for k in n_samples]
            )
            frame_idx = np.minimum(sample_idx * step, tot - 1)
            ts_ms = frame_idx * 1000 // MM_FPS
            fps = [
                hashlib.md5(f"{d}:{f}".encode()).hexdigest()
                for d, f in zip(doc_ids, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "frame_idx": frame_idx,
                    "ts_ms": ts_ms,
                    "total_frames": tot,
                    "frame_fp": fps,
                }
            )

    return payload.mapInPandas(
        fn,
        schema=(
            "doc_id long, frame_idx long, ts_ms long, total_frames long,"
            " frame_fp string"
        ),
    )


def multimodal_frame_sample_sql() -> str:
    step = MM_FPS * MM_SAMPLE_EVERY_S
    return f"""
WITH vids AS (
  SELECT doc_id,
         greatest(octet_length(encode(text)) // {MM_BYTES_PER_FRAME}, 1)
           AS total_frames
  FROM documents
),
samples AS (
  SELECT v.doc_id, v.total_frames,
         least(s.i * {step}, v.total_frames - 1) AS frame_idx
  FROM vids v,
       LATERAL (
         SELECT unnest(generate_series(
           0, CAST((v.total_frames + {step} - 1) // {step} AS BIGINT) - 1
         )) AS i
       ) s
)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * 1000 // {MM_FPS} AS BIGINT) AS ts_ms,
       CAST(total_frames AS BIGINT) AS total_frames,
       md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR))
         AS frame_fp
FROM samples
"""


def dedup_exact_sql() -> str:
    return """
WITH h AS (SELECT doc_id, md5(text) AS text_hash FROM documents),
g AS (
  SELECT text_hash, min(doc_id) AS keep_doc,
         CAST(count(*) AS BIGINT) AS group_size
  FROM h GROUP BY text_hash
)
SELECT h.doc_id, h.text_hash, g.group_size,
       h.doc_id = g.keep_doc AS is_keeper
FROM h JOIN g USING (text_hash)
"""


def dalechall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dale-Chall readability per document — the reference's
    readability measure (readability_dale_chall.c:188): score =
    trunc(1000·(0.049·words/sentences + 15.79·unfamiliar/words
    + 3.6365)), 0 for empty docs; ``unfamiliar`` = tokens outside the
    published familiar-word list (readability_dale_chall_wordlist.h,
    shipped as data in kernels/dalechall.py). Sentences are
    [.!?]-runs (min 1 — the reference's parser ends the last sentence
    at EOF); the title-case familiarity rule is moot under this
    engine's lowercasing tokenizer.

    Plan: the 11,754-word list broadcast-joins the exploded tokens
    (left-anti) — no giant IN expression in the hot path."""
    from atire_spark.kernels.dalechall import DALE_CHALL_WORDS

    docs = _docs(spark, sf_dir)
    wl = spark.createDataFrame(
        [(w,) for w in sorted(DALE_CHALL_WORDS)], "t string"
    )
    unf = (
        docs.select("doc_id", F.explode(F.expr(TOKS_EXPR)).alias("t"))
        .join(F.broadcast(wl), "t", "left_anti")
        .groupBy("doc_id")
        .agg(F.count("*").alias("unfamiliar"))
    )
    base = docs.select(
        "doc_id",
        F.size(F.expr(TOKS_EXPR)).cast("long").alias("n_words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
        )
        .cast("long")
        .alias("n_sentences"),
    )
    j = base.join(unf, "doc_id", "left").fillna({"unfamiliar": 0})
    w, s, u = (
        F.col("n_words").cast("double"),
        F.col("n_sentences").cast("double"),
        F.col("unfamiliar").cast("double"),
    )
    score = F.when(F.col("n_words") == 0, F.lit(0)).otherwise(
        (
            1000.0 * ((0.049 * w) / s + (15.79 * u) / w + 3.6365)
        ).cast("long")
    )
    return j.select(
        "doc_id",
        "n_words",
        "n_sentences",
        F.col("unfamiliar").cast("long").alias("unfamiliar"),
        score.alias("dalechall"),
    )


def dalechall_sql() -> str:
    from atire_spark.kernels.dalechall import DALE_CHALL_WORDS

    values = ", ".join(f"('{w}')" for w in sorted(DALE_CHALL_WORDS))
    return f"""
WITH wl(t) AS (VALUES {values}),
d AS (SELECT doc_id, {TOKS_EXPR} AS toks, text FROM documents),
base AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
           AS n_sentences
  FROM d
),
unf AS (
  SELECT x.doc_id, CAST(count(*) AS BIGINT) AS unfamiliar
  FROM (SELECT doc_id, unnest(toks) AS t FROM d) x
  LEFT JOIN wl ON wl.t = x.t
  WHERE wl.t IS NULL
  GROUP BY x.doc_id
)
SELECT b.doc_id, b.n_words, b.n_sentences,
       COALESCE(u.unfamiliar, 0) AS unfamiliar,
       CASE WHEN b.n_words = 0 THEN 0
            ELSE CAST(trunc(1000.0
                 * ((0.049 * CAST(b.n_words AS DOUBLE))
                      / CAST(b.n_sentences AS DOUBLE)
                    + (15.79 * CAST(COALESCE(u.unfamiliar, 0) AS DOUBLE))
                      / CAST(b.n_words AS DOUBLE)
                    + 3.6365)) AS BIGINT) END AS dalechall
FROM base b LEFT JOIN unf u ON u.doc_id = b.doc_id
"""


EMB_DEDUP_TOPN = 25


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate candidates: random-hyperplane
    multi-band LSH buckets the vectors (pair = shares ANY band
    signature — a bucket self-join, never all-pairs), exact cosine
    reranks, and the top ``EMB_DEDUP_TOPN`` candidate pairs surface
    (a production run thresholds instead; the synthetic fixture has
    no true near-dups, max pairwise cosine ≈ 0.51, so the report form
    keeps the entry non-vacuous at every scale).

    Scale path: the self-join key is (band, sig) — 2^LSH_ROWS buckets
    per band bound each bucket's pair count; skewed buckets fall to
    AQE's skew-join split like dedup_minhash_lsh."""
    emb = _emb(spark, sf_dir)
    bands = F.array(
        *[
            F.struct(F.lit(b).alias("band"), _band_sig(b, LSH_ROWS).alias("sig"))
            for b in range(LSH_BANDS)
        ]
    )
    exploded = (
        emb.select("vec_id", bands.alias("bands"))
        .select("vec_id", F.explode("bands").alias("bs"))
        .select(
            "vec_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
        )
    )
    right = exploded.select(
        F.col("vec_id").alias("b_id"), "band", "sig"
    )
    cands = (
        exploded.select(F.col("vec_id").alias("a_id"), "band", "sig")
        .join(right, ["band", "sig"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"))
    scored = (
        cands.join(ea, "a_id")
        .join(eb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.expr(
                    f"({_dot_expr('ea', 'eb')})"
                    f" / (sqrt({_dot_expr('ea', 'ea')})"
                    f" * sqrt({_dot_expr('eb', 'eb')}))"
                ),
                6,
            ).alias("cosine"),
        )
    )
    return (
        scored.orderBy(F.col("cosine").desc(), "a_id", "b_id")
        .limit(EMB_DEDUP_TOPN)
    )


def dedup_embedding_cosine_sql() -> str:
    band_selects = "\n  UNION ALL\n  ".join(
        "SELECT vec_id, {b} AS band, CAST({sig} AS INTEGER) AS sig FROM embeddings".format(
            b=b,
            sig=" + ".join(
                f"(CASE WHEN ({_duck_dot('embedding', _plane_expr(b * LSH_ROWS + j, 'duck'))}) > 0"
                f" THEN 1 ELSE 0 END) * {1 << j}"
                for j in range(LSH_ROWS)
            ),
        )
        for b in range(LSH_BANDS)
    )
    return f"""
WITH bands AS (
  {band_selects}
),
cand AS (
  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig
  WHERE a.vec_id < b.vec_id
),
scored AS (
  SELECT c.a_id, c.b_id,
         round(({_duck_dot('ea.embedding', 'eb.embedding')})
               / (sqrt({_duck_dot('ea.embedding', 'ea.embedding')})
                  * sqrt({_duck_dot('eb.embedding', 'eb.embedding')})), 6) AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.a_id
  JOIN embeddings eb ON eb.vec_id = c.b_id
)
SELECT a_id, b_id, cosine FROM scored
ORDER BY cosine DESC, a_id, b_id
LIMIT {EMB_DEDUP_TOPN}
"""


# near-dup pair suite: three independent algorithms over the shared
# (doc_a, doc_b, intersection, n_shingles_a, n_shingles_b, jaccard)
# pair schema, tagged by `method` so one driver row certifies all
# three (the registry is pinned to the driver's 50-entry window).
_NEARDUP_MEMBERS = [
    ("minhash_lsh", dedup_minhash_lsh, dedup_minhash_lsh_sql),
    ("ngram_jaccard", dedup_ngram_jaccard, dedup_ngram_jaccard_sql),
    ("simhash_hamming", dedup_simhash_pairs, dedup_simhash_pairs_sql),
]


def dedup_neardup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for tag, fn, _ in _NEARDUP_MEMBERS:
        d = fn(spark, sf_dir).select(F.lit(tag).alias("method"), "*")
        out = d if out is None else out.unionByName(d)
    return out


def dedup_neardup_suite_sql() -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{tag}' AS method, sub.* FROM (\n{sql_fn()}\n) sub"
        for tag, _, sql_fn in _NEARDUP_MEMBERS
    )


CORPUS_QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_neardup_suite,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "fingerprint_simhash": simhash,
    "fingerprint_mink": doc_fingerprint,
    "text_token_stats": token_stats,
    "text_quality": quality_score,
    "text_langid": lang_id,
    "text_dalechall": dalechall,
    "knn_brute_cosine": knn_brute_cosine,
    "knn_lsh_bucketed": knn_lsh_bucketed,
    "knn_ivf": knn_ivf,
    "multimodal_resize": multimodal_resize,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_meta": multimodal_meta,
}


def corpus_oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": dedup_exact_sql(),
        "dedup_minhash_lsh": dedup_neardup_suite_sql(),
        "dedup_embedding_cosine": dedup_embedding_cosine_sql(),
        "fingerprint_simhash": simhash_sql(),
        "fingerprint_mink": doc_fingerprint_sql(),
        "text_token_stats": token_stats_sql(),
        "text_quality": quality_score_sql(),
        "text_langid": lang_id_sql(),
        "text_dalechall": dalechall_sql(),
        "knn_brute_cosine": knn_brute_cosine_sql(),
        "knn_lsh_bucketed": knn_lsh_bucketed_sql(),
        "knn_ivf": knn_ivf_sql(),
        "multimodal_resize": multimodal_resize_sql(),
        "multimodal_frame_sample": multimodal_frame_sample_sql(),
        "multimodal_meta": multimodal_meta_sql(),
    }
