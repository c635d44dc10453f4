"""Driver contract for the spark-graft builder (PySpark target).

Every entry pairs a Spark DataFrame query (our engine) with an ANSI-SQL
oracle that DuckDB runs on the same parquet tables. The corpus for the
fulltext engine is derived deterministically from the ``documents``
table into the north_rule transcripts shape
(conv_id, turn_idx, role, text, tool, ts): conv_id groups 8 docs,
turn_idx = doc_id % 8 — both sides derive it with the same arithmetic,
so docids (dense rank over (conv_id, turn_idx), empty turns skipped)
agree exactly.

BM25 arithmetic in the SQL oracles mirrors the reference bit-for-bit
(SURVEY.md §4.5): float32 length prior (CAST AS REAL), idf = ln(N/df)
with df = N contributing nothing, fixed-point 1 + trunc(100*rsv)
accumulated mod 2^16, tie-break larger docid first.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# fixed query set over the documents-derived corpus (deterministic)
TESTDATA_QUERIES: list[tuple[int, str]] = [
    (1, "dup"),  # rare term (df ~5% of docs)
    (2, "spark"),  # common term
    (3, "hash join"),  # two common terms
    (4, "the a"),  # stop-ish terms
    (5, "spark fast merge sort"),  # 4-term
    (6, "zzzmissing"),  # absent from corpus
    (7, "DUP"),  # uppercase input → lowercased
    (8, "dup spark window"),  # rare + common mix
]
TOP_K = 10

# stemming coverage: plural/suffixed query forms that the S-stripper
# maps onto the corpus's singular vocabulary (the synthetic corpus has
# no suffixed terms, so index-side stemming is identity here — it is
# certified on plural-rich fixtures in pytest; this entry certifies the
# query-side gate + the full stemmed build/query plumbing)
STEM_QUERIES: list[tuple[int, str]] = [
    (1, "joins"),
    (2, "hashes scans"),
    (3, "queries rows"),
    (4, "windows sorts streams"),
    (5, "the dups"),
    (6, "DUPS"),
    (7, "tables groups"),
    (8, "zzzmissings"),
]

# NEXI CO grammar coverage — reference-exact, binary-verified
# (reference_ab.py): +/- signs (parsed, scored as bare terms), phrases
# (ONE inert verbatim term), punctuation leaving a trailing token →
# ERROR_PREMATURE_END_OF_QUERY → the query is refused (0 hits), and
# all-uppercase terms kept verbatim as tag lookups (inert here)
NEXI_QUERIES: list[tuple[int, str]] = [
    (1, "+dup"),
    (2, "-dup"),
    (3, "dup + spark"),
    (4, "hash, join"),  # comma stopper + leftover → query refused
    (5, '"hash join" merge'),  # phrase inert → only "merge" scores
    (6, "spark -dup window"),
    (7, "the; spark"),  # semicolon stopper + leftover → refused
    (8, "+DUP -THE"),  # all-upper = tag names, match nothing
]

# boolean grammar coverage (AND/OR/NOT/XOR, brackets, adjacency=OR)
BOOLEAN_QUERIES: list[tuple[int, str]] = [
    (1, "dup AND spark"),
    (2, "spark OR merge"),
    (3, "spark NOT dup"),
    (4, "dup XOR spark"),
    (5, "(dup OR spark) AND merge"),
    (6, "hash join"),
    (7, "spark AND zzzmissing"),
    (8, "the AND a"),
]

_INDEX_CACHE: dict[str, object] = {}


# ---------------------------------------------------------------------------
# corpus derivation (Spark side)
def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(
            F.lit("conv"),
            # 12-wide zero pad: lpad truncates once doc_id/8 outgrows the
            # pad width, which would collide conv_ids (~8M docs at width
            # 6); 12 keeps the id unique + lexicographically ordered at
            # every scale factor
            F.lpad((F.col("doc_id") / 8).cast("long").cast("string"), 12, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 3 == 0, "user")
        .when(F.col("doc_id") % 3 == 1, "assistant")
        .otherwise("tool")
        .alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        (
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(mins=F.col("doc_id").cast("int"))
        ).alias("ts"),
    )


def _build_engine(spark: SparkSession, sf_dir: str, key: str, **build_kw):
    """Build once per (sf_dir, variant): materialize the index to
    parquet and query THROUGH storage — the term isin filter then
    prunes files (PushedFilters), which is the shape that scales; an
    unwritten lazy index would re-run the build per query."""
    if key not in _INDEX_CACHE:
        import tempfile

        from atire_spark.build import build_index, load_index, write_index
        from atire_spark.query import SearchEngine

        idx_dir = tempfile.mkdtemp(prefix="atire_entry_idx_")
        tables = build_index(spark, _transcripts(spark, sf_dir), **build_kw)
        write_index(tables, idx_dir)
        _INDEX_CACHE[key] = SearchEngine(spark, load_index(spark, idx_dir))
    return _INDEX_CACHE[key]


def _engine(spark: SparkSession, sf_dir: str):
    return _build_engine(spark, sf_dir, sf_dir.rstrip("/"))


def _quant_engine(spark: SparkSession, sf_dir: str):
    """Quantized (-Q, 8-bit) index over the same corpus."""
    return _build_engine(
        spark, sf_dir, sf_dir.rstrip("/") + "#quant", quantize_bits=8
    )


def _stem_engine(spark: SparkSession, sf_dir: str):
    """S-stripper-stemmed index (reference -ts, stem_s.c); the engine
    picks up the recorded ~stemmer and stems query terms to match."""
    return _build_engine(
        spark, sf_dir, sf_dir.rstrip("/") + "#stem_s", stemmer="s"
    )


def _stop_engine(spark: SparkSession, sf_dir: str):
    """NCBI-stopped index (PRUNE_STOPWORDS_BEFORE_INDEXING): stop
    tokens still count toward doc length but get no postings."""
    return _build_engine(
        spark,
        sf_dir,
        sf_dir.rstrip("/") + "#stop_ncbi",
        stop_before_indexing="ncbi",
    )


def _stream_engine(spark: SparkSession, sf_dir: str):
    """Index built by INCREMENTAL APPENDS (atire_spark.streaming) in
    two micro-batches instead of one batch build — the reference's
    multi-part-index + atire_merge recipe (README.md:78-86) run
    continuously. The batches split on the (conv_id, turn_idx) sort
    order, so arrival-order docids coincide with the batch build's
    sorted docids and the SAME BM25 oracle certifies the streamed
    index end-to-end (segment append geometry, per-batch term-stat
    partials, load-time global aggregation)."""
    key = sf_dir.rstrip("/") + "#stream"
    if key not in _INDEX_CACHE:
        import tempfile

        from atire_spark.query import SearchEngine
        from atire_spark.streaming import append_batch, load_stream_index

        idx_dir = tempfile.mkdtemp(prefix="atire_entry_stream_")
        t = _transcripts(spark, sf_dir)
        # split at the median conv_id so each batch is contiguous in
        # the (conv_id, turn_idx) global order
        med = t.select(
            F.expr(
                "percentile_approx(CAST(substr(conv_id, 5) AS LONG), 0.5, 10000)"
            )
        ).collect()[0][0]
        cond = F.expr(f"CAST(substr(conv_id, 5) AS LONG) <= {int(med)}")
        append_batch(spark, t.filter(cond), idx_dir, 0)
        append_batch(spark, t.filter(~cond), idx_dir, 1)
        _INDEX_CACHE[key] = SearchEngine(
            spark, load_stream_index(spark, idx_dir)
        )
    return _INDEX_CACHE[key]


def _q_bm25_streamed(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _stream_engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)


def _q_bm25_standing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming standing-query matcher (stream_query.py) over the same
    corpus: every turn scored against the broadcast query set with
    frozen snapshot stats, reshaped to top-k. A completely different
    code path from the index scan (stateless mapInPandas per-turn
    scoring vs segment decode) that must land on the IDENTICAL
    fixed-point BM25 ranking — so the unchanged batch oracle certifies
    the streaming matcher's arithmetic end-to-end."""
    from pyspark.sql import Window

    from atire_spark.stream_query import (
        frozen_stats_from_index,
        standing_query_matches,
    )

    eng = _engine(spark, sf_dir)
    stats = frozen_stats_from_index(spark, eng.index, TESTDATA_QUERIES)
    m = standing_query_matches(
        _transcripts(spark, sf_dir), TESTDATA_QUERIES, stats
    )
    d = eng.index.docmap.select("docid", "conv_id", "turn_idx")
    w = Window.partitionBy("query_id").orderBy(
        F.col("rsv_fixed").desc(), F.col("docid").desc()
    )
    return (
        m.join(d, ["conv_id", "turn_idx"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "rank",
            "docid",
            "rsv_fixed",
            (F.col("rsv_fixed") / F.lit(100.0)).alias("rsv"),
        )
    )


def _merged_engine(spark: SparkSession, sf_dir: str):
    """Index produced by atire_merge's recipe (README.md:78-86): build
    the two halves of the corpus as INDEPENDENT 0-based indexes, then
    merge_indexes shifts the right side's docids and re-serialises its
    segments. The halves split on the (conv_id, turn_idx) sort order,
    so merged docids coincide with the monolithic build's and the SAME
    batch BM25 oracle certifies the whole merge path (docid offset,
    re-blocking, df/cf re-aggregation)."""
    key = sf_dir.rstrip("/") + "#merged"
    if key not in _INDEX_CACHE:
        import tempfile

        from atire_spark.build import build_index, load_index, write_index
        from atire_spark.merge import merge_indexes
        from atire_spark.query import SearchEngine

        t = _transcripts(spark, sf_dir)
        med = t.select(
            F.expr(
                "percentile_approx(CAST(substr(conv_id, 5) AS LONG), 0.5, 10000)"
            )
        ).collect()[0][0]
        cond = F.expr(f"CAST(substr(conv_id, 5) AS LONG) <= {int(med)}")
        a = build_index(spark, t.filter(cond))
        b = build_index(spark, t.filter(~cond))
        merged = merge_indexes(spark, a, b)
        idx_dir = tempfile.mkdtemp(prefix="atire_entry_merged_")
        write_index(merged, idx_dir)
        _INDEX_CACHE[key] = SearchEngine(spark, load_index(spark, idx_dir))
    return _INDEX_CACHE[key]


def _q_bm25_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _merged_engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)


def _simple9_engine(spark: SparkSession, sf_dir: str):
    """Index with Simple-9 posting compression (the reference's -cs
    codec, compress_simple9.c) instead of the default vbyte — same
    postings, same scores, different wire format; the unchanged batch
    BM25 oracle certifies the whole codec round trip."""
    return _build_engine(
        spark, sf_dir, sf_dir.rstrip("/") + "#simple9", codec="simple9"
    )


def _q_bm25_simple9(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _simple9_engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)


def _q_bm25_codec(codec: str):
    """One entry per representative posting codec from the full
    compression factory (compression_factory.c:59-77): same postings,
    same scores as vbyte — the UNCHANGED batch BM25 oracle certifies
    each codec's whole encode→store→decode round trip at sf scale.
    simple8b_packed exercises the 64-bit DP packer with magic run
    selectors; carryover12 the cross-word bit-state machine;
    elias_gamma the bit-aligned family (bitio.py)."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = _build_engine(
            spark, sf_dir, sf_dir.rstrip("/") + "#" + codec, codec=codec
        )
        return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)

    return q


def _puurula_engine(spark: SparkSession, sf_dir: str):
    """-Ilmp index: per-doc Puurula length vectors built at serialise
    time (memory_index.c:1270-1410) into the ``puurula`` side table —
    required by the lmp / lmptfidf rankers."""
    return _build_engine(
        spark, sf_dir, sf_dir.rstrip("/") + "#puurula", puurula=True
    )


def _cull_engine(spark: SparkSession, sf_dir: str):
    """Serialise-time culling (should_prune, all four predicate
    classes): cf==1 singletons, rare terms (df <= 30), very frequent
    terms (df/N >= 0.78), and NCBI stop-list members dropped."""
    return _build_engine(
        spark,
        sf_dir,
        sf_dir.rstrip("/") + "#cull",
        cull_cf_singletons=True,
        cull_df_max=30,
        cull_df_proportion=0.78,
        cull_stoplist="ncbi",
    )


# TopSig entry parameters: 1024 bits keeps the oracle's doc×bit grid
# small; density 12% is the reference default
# (indexer_param_block_topsig.c:18-19 — reference width default 4096)
TOPSIG_W = 1024
TOPSIG_D = 12.0


def _topsig_sigs(spark: SparkSession, sf_dir: str):
    """Signature table for the sf_dir, materialized to parquet once —
    both topsig entries then scan storage instead of re-running the
    build."""
    key = sf_dir.rstrip("/") + "#topsig"
    if key not in _INDEX_CACHE:
        import tempfile

        from atire_spark.topsig import build_topsig

        eng = _engine(spark, sf_dir)
        d = tempfile.mkdtemp(prefix="atire_topsig_")
        build_topsig(
            spark,
            _transcripts(spark, sf_dir),
            eng.index,
            width=TOPSIG_W,
            density=TOPSIG_D,
        ).write.parquet(d, mode="overwrite")
        _INDEX_CACHE[key] = spark.read.parquet(d)
    return _INDEX_CACHE[key]


# ---------------------------------------------------------------------------
# shared SQL oracle scaffolding (DuckDB dialect of ANSI SQL)
_CORPUS_CTE = """
corpus AS (
  SELECT doc_id,
         'conv' || lpad(CAST(doc_id // 8 AS VARCHAR), 12, '0') AS conv_id,
         CAST(doc_id % 8 AS INTEGER) AS turn_idx,
         text
  FROM documents
),
toks AS (
  SELECT doc_id, conv_id, turn_idx,
         unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS term
  FROM corpus
),
doclen AS (
  SELECT doc_id, conv_id, turn_idx, CAST(count(*) AS BIGINT) AS doc_len
  FROM toks GROUP BY doc_id, conv_id, turn_idx
),
docmap AS (
  SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS docid,
         doc_id, conv_id, turn_idx, doc_len
  FROM doclen
),
tf AS (
  SELECT d.docid, t.term,
         CAST(least(count(*), 255) AS INTEGER) AS tf,
         CAST(count(*) AS BIGINT) AS occurrences
  FROM toks t JOIN docmap d USING (doc_id)
  GROUP BY d.docid, t.term
),
termstats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(occurrences) AS BIGINT) AS cf,
         CAST(max(tf) AS INTEGER) AS max_impact
  FROM tf GROUP BY term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(doc_len) AS BIGINT) AS coll_len,
         CAST(sum(doc_len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_len
  FROM docmap
)
"""


def _query_values_sql() -> str:
    """The TESTDATA_QUERIES parsed to (query_id, term, weight) VALUES —
    generated from the same parse_query the engine uses, so the two
    sides cannot drift."""
    from atire_spark.query import parse_query

    rows = []
    for qid, text in TESTDATA_QUERIES:
        for term, weight in parse_query(text):
            rows.append(f"({qid}, '{term}', {weight})")
    return ",\n       ".join(rows)


def _bm25_sql(
    k: int, conjunctive: bool = False, values_sql: str | None = None
) -> str:
    conj_filter = (
        """
, req AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_terms FROM q GROUP BY query_id)
, acc2 AS (
  SELECT a.query_id, a.docid, a.rsv_fixed
  FROM acc a JOIN req r USING (query_id)
  WHERE a.term_hits >= r.n_terms
)"""
        if conjunctive
        else ", acc2 AS (SELECT query_id, docid, rsv_fixed FROM acc)"
    )
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {values_sql or _query_values_sql()}
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT) * (1 + CAST(trunc(
                100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                      * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                         / (CAST(t.tf AS DOUBLE)
                            + CAST(CAST(0.9 * ((1.0 - 0.4)
                                + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                              AS REAL) AS DOUBLE)))) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN {1 if conjunctive else 0} ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed,
         CAST(sum(is_hit) AS BIGINT) AS term_hits
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
){conj_filter},
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc2
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the index over sf0.001 and run the BM25 batch,
    materialized back to (conv_id, turn_idx)."""
    eng = _engine(spark, "/root/testdata/sf0.001")
    res = eng.search_batch(TESTDATA_QUERIES, k=TOP_K)
    return eng.materialize(res)


# ---------------------------------------------------------------------------
def _q_docmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.index.docmap.select(
        "docid", "conv_id", "turn_idx", F.col("doc_len").cast("long").alias("doc_len")
    )


def _q_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.index.stats.select(
        F.col("documents").cast("long").alias("documents"),
        F.col("collection_len").cast("long").alias("collection_len"),
        F.col("mean_doc_len").cast("double").alias("mean_doc_len"),
        F.col("unique_terms").cast("long").alias("unique_terms"),
    )


def _q_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return (
        eng.index.postings.groupBy("term", "df", "cf")
        .agg(F.max("max_impact").alias("max_impact"))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            F.col("max_impact").cast("int").alias("max_impact"),
        )
    )


# deterministic CJK fixture for the bigram-segmentation certification:
# the driver corpus is ASCII, so the CJK path (parser.c:251-283
# BIGRAM_SEGMENTATION — overlapping 2-char windows + trailing char, a
# 1-char run is itself) gets its own literal turns, shared verbatim
# with the SQL oracle. Han runs are space-separated so the oracle can
# re-tokenize with substr arithmetic.
_CJK_TURNS: list[tuple[str, int, str]] = [
    ("c0", 0, "model summary 北京大学 tokens"),
    ("c0", 1, "英语 mixed line alpha"),
    ("c1", 0, "高性能计算 cluster run 北京"),
    ("c1", 1, "单"),
    ("c2", 0, "北京 北京大学 repeat terms"),
    ("c2", 1, "no cjk here at all"),
]


def _q_cjk_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index the CJK fixture with cjk_bigrams=True and emit the same
    (term, df, cf, max_impact) shape as the corpus member — certifies
    the CJK run scan, the overlapping-bigram expansion and the
    trailing-char quirk end-to-end through the real build."""
    import pandas as pd

    from atire_spark.build import build_index

    tdf = spark.createDataFrame(
        pd.DataFrame(_CJK_TURNS, columns=["conv_id", "turn_idx", "text"])
    )
    idx = build_index(spark, tdf, cjk_bigrams=True)
    return (
        idx.postings.groupBy("term", "df", "cf")
        .agg(F.max("max_impact").alias("max_impact"))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            F.col("max_impact").cast("int").alias("max_impact"),
        )
    )


def _cjk_term_stats_sql() -> str:
    values = ",\n    ".join(
        "({}, '{}')".format(i, text.replace("'", "''"))
        for i, (_c, _t, text) in enumerate(_CJK_TURNS)
    )
    return rf"""
WITH docs(docid, text) AS (VALUES
    {values}
),
toks AS (
  SELECT docid, unnest(string_split(text, ' ')) AS tok FROM docs
),
nz AS (SELECT docid, tok FROM toks WHERE tok <> ''),
terms AS (
  SELECT docid, lower(tok) AS term
  FROM nz WHERE NOT regexp_matches(tok, '^\p{{Han}}+$')
  UNION ALL
  SELECT docid, substr(tok, CAST(u.i AS INT), 2) AS term
  FROM nz, unnest(generate_series(1, length(tok) - 1)) u(i)
  WHERE regexp_matches(tok, '^\p{{Han}}+$') AND length(tok) >= 2
  UNION ALL
  SELECT docid, substr(tok, length(tok), 1) AS term
  FROM nz WHERE regexp_matches(tok, '^\p{{Han}}+$')
),
tf AS (
  SELECT docid, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms GROUP BY docid, term
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS cf,
       CAST(max(least(tf, 255)) AS INT) AS max_impact
FROM tf GROUP BY term
"""


def _q_postings_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suite: (a) decode every segment back to (term, docid, tf) —
    proves the impact-order + per-group vbyte layout round-trips
    through storage; (b) the same decode over an
    :func:`atire_spark.reorder.reorder_index` rewrite under the
    reversed-docid permutation (atire_reorder.c:382-560) — the oracle
    is the tf table with docid → N-1-docid, so the whole
    decode → cogrouped remap → re-serialise chain is
    driver-certified."""
    import numpy as np
    import pandas as pd

    eng = _engine(spark, sf_dir)

    def decode_fn(batches):
        from atire_spark.kernels.impact import decode_segment

        for pdf in batches:
            terms, docs, tfs = [], [], []
            for row in pdf.itertuples(index=False):
                d, t, _ = decode_segment(
                    np.asarray(row.impacts),
                    np.asarray(row.doc_counts),
                    row.postings,
                    None,
                )
                terms.append(np.full(d.size, row.term, dtype=object))
                docs.append(d)
                tfs.append(t)
            if terms:
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms),
                        "docid": np.concatenate(docs),
                        "tf": np.concatenate(tfs).astype(np.int32),
                    }
                )

    plain = eng.index.postings.mapInPandas(
        decode_fn, schema="term string, docid long, tf int"
    )
    from atire_spark.reorder import reorder_index

    n = int(eng.index.stats.select("documents").head()[0])
    mapping = eng.index.docmap.select(
        "docid",
        (F.lit(n - 1) - F.col("docid")).cast("long").alias("new_docid"),
    )
    re_idx = reorder_index(spark, eng.index, mapping)
    reordered = re_idx.postings.select(
        "term", "seg_group", "impacts", "doc_counts", "postings"
    ).mapInPandas(decode_fn, schema="term string, docid long, tf int")
    return plain.select(F.lit("plain").alias("mode"), "*").unionByName(
        reordered.select(F.lit("reordered").alias("mode"), "*")
    )


def _q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)


def _q_bm25_k100(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=100)


def _q_bm25_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K, conjunctive=True)


def _q_bm25_federated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broker scatter-gather (atire_broke.c:168-193) over a two-shard
    split at H = N // 2: each shard is an independent build with
    LOCAL statistics; the merge offsets shard B's docids by H
    (virtual ids == global docids here) and re-ranks with the
    broker's rsv-desc / lowest-docid tie-break
    (atire_engine_result_set.c:141-165)."""
    from atire_spark.build import build_index
    from atire_spark.federate import search_federated
    from atire_spark.query import SearchEngine

    eng = _engine(spark, sf_dir)
    key = sf_dir.rstrip("/") + "#federated"
    if key not in _INDEX_CACHE:
        n = int(eng.index.stats.select("documents").head()[0])
        h = n // 2
        tdf = _transcripts(spark, sf_dir)
        dm = eng.index.docmap

        def half(pred):
            sel = dm.filter(pred).select("conv_id", "turn_idx")
            return SearchEngine(
                spark,
                build_index(spark, tdf.join(sel, ["conv_id", "turn_idx"])),
            )

        _INDEX_CACHE[key] = (
            half(F.col("docid") < h),
            half(F.col("docid") >= h),
        )
    ea, eb = _INDEX_CACHE[key]
    return search_federated([ea, eb], TESTDATA_QUERIES, k=TOP_K)


def _federated_bm25_sql(k: int) -> str:
    """Two-shard broker oracle: per-shard BM25 with shard-local
    df/N/mean_len, per-shard engine top-k (tie-break docid DESC —
    each sub-engine's internal order), then the broker merge ranked
    rsv DESC / global docid ASC."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
hsel AS (SELECT CAST(n_docs // 2 AS BIGINT) AS h FROM stats),
sdoc AS (
  SELECT d.docid, d.doc_len,
         CASE WHEN d.docid < hsel.h THEN 0 ELSE 1 END AS shard
  FROM docmap d CROSS JOIN hsel
),
sstats AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(doc_len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_len
  FROM sdoc GROUP BY shard
),
stf AS (
  SELECT s.shard, s.docid, s.doc_len, t.term, t.tf
  FROM tf t JOIN sdoc s USING (docid)
),
stermstats AS (
  SELECT shard, term, CAST(count(*) AS BIGINT) AS df
  FROM stf GROUP BY shard, term
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.shard, t.docid,
         CASE WHEN ts.df = ss.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT) * (1 + CAST(trunc(
                100.0 * ln(CAST(ss.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                      * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                         / (CAST(t.tf AS DOUBLE)
                            + CAST(CAST(0.9 * ((1.0 - 0.4)
                                + 0.4 * (CAST(t.doc_len AS DOUBLE) / ss.mean_len))
                              AS REAL) AS DOUBLE)))) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = ss.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN stermstats ts USING (term)
  JOIN stf t ON t.term = q.term AND t.shard = ts.shard
  JOIN sstats ss ON ss.shard = t.shard
),
acc AS (
  SELECT query_id, shard, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, shard, docid
  HAVING sum(is_hit) > 0
),
shard_topk AS (
  SELECT * FROM (
    SELECT query_id, shard, docid, rsv_fixed,
           row_number() OVER (
             PARTITION BY query_id, shard
             ORDER BY rsv_fixed DESC, docid DESC
           ) AS srank
    FROM acc
  ) WHERE srank <= {k}
),
merged AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid ASC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM shard_topk
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM merged WHERE rank <= {k}
"""


def _q_termcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K, ranker="termcount")


def _q_inner_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K, ranker="inner")


def _q_lmd(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K, ranker="lmd")


def _q_bm25_stemmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _stem_engine(spark, sf_dir)
    return eng.search_batch(STEM_QUERIES, k=TOP_K)


_SQL_STEM_DOC = """
CASE WHEN length(term) <= 3 THEN term
     WHEN term LIKE '%ies' THEN substr(term, 1, length(term) - 3) || 'y'
     WHEN term LIKE '%es' THEN substr(term, 1, length(term) - 2)
     WHEN term LIKE '%s' THEN substr(term, 1, length(term) - 1)
     ELSE term END
"""

# query-side gate differs: length >= 3 and first char a lowercase
# letter (search_engine.c:775-779) vs the index side's length > 3
_SQL_STEM_QUERY = """
CASE WHEN length(term) < 3 OR NOT substr(term, 1, 1) BETWEEN 'a' AND 'z'
          THEN term
     WHEN term LIKE '%ies' THEN substr(term, 1, length(term) - 3) || 'y'
     WHEN term LIKE '%es' THEN substr(term, 1, length(term) - 2)
     WHEN term LIKE '%s' THEN substr(term, 1, length(term) - 1)
     ELSE term END
"""


def _stemmed_bm25_sql(k: int) -> str:
    """BM25 over the S-stripper-stemmed corpus: the doc-side stem is a
    pure-SQL CASE applied inside the toks CTE (independent of the
    engine's Python stemmer), and the query terms are raw VALUES
    stemmed by the query-side CASE then re-bagged."""
    from atire_spark.query import parse_query

    rows = []
    for qid, text in STEM_QUERIES:
        for term, weight in parse_query(text):  # RAW terms, no stem
            rows.append(f"({qid}, '{term}', {weight})")
    values = ",\n       ".join(rows)
    stemmed_cte = f"""
corpus AS (
  SELECT doc_id,
         'conv' || lpad(CAST(doc_id // 8 AS VARCHAR), 12, '0') AS conv_id,
         CAST(doc_id % 8 AS INTEGER) AS turn_idx,
         text
  FROM documents
),
rawtoks AS (
  SELECT doc_id, conv_id, turn_idx,
         unnest(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS term
  FROM corpus
),
toks AS (
  SELECT doc_id, conv_id, turn_idx, {_SQL_STEM_DOC} AS term
  FROM rawtoks
),
doclen AS (
  SELECT doc_id, conv_id, turn_idx, CAST(count(*) AS BIGINT) AS doc_len
  FROM toks GROUP BY doc_id, conv_id, turn_idx
),
docmap AS (
  SELECT CAST(row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS BIGINT) AS docid,
         doc_id, conv_id, turn_idx, doc_len
  FROM doclen
),
tf AS (
  SELECT d.docid, t.term,
         CAST(least(count(*), 255) AS INTEGER) AS tf,
         CAST(count(*) AS BIGINT) AS occurrences
  FROM toks t JOIN docmap d USING (doc_id)
  GROUP BY d.docid, t.term
),
termstats AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(occurrences) AS BIGINT) AS cf,
         CAST(max(tf) AS INTEGER) AS max_impact
  FROM tf GROUP BY term
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(doc_len) AS BIGINT) AS coll_len,
         CAST(sum(doc_len) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_len
  FROM docmap
)"""
    return f"""
WITH {stemmed_cte},
qraw(query_id, term, weight) AS (
  VALUES {values}
),
q AS (
  SELECT query_id, term, CAST(sum(weight) AS BIGINT) AS weight
  FROM (SELECT query_id, {_SQL_STEM_QUERY} AS term, weight FROM qraw)
  GROUP BY query_id, term
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT) * (1 + CAST(trunc(
                100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                      * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                         / (CAST(t.tf AS DOUBLE)
                            + CAST(CAST(0.9 * ((1.0 - 0.4)
                                + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                              AS REAL) AS DOUBLE)))) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


FB_DOCS = 10  # == TOP_K so the examined docs are exactly the sorted
FB_TERMS = 5  # top-k, matching the reference's partial-sort window


def _q_feedback_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_feedback(
        TESTDATA_QUERIES,
        _transcripts(spark, sf_dir),
        k=TOP_K,
        feedback_documents=FB_DOCS,
        feedback_terms=FB_TERMS,
    )


def _q_feedback_rm(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_feedback_rm(
        TESTDATA_QUERIES,
        _transcripts(spark, sf_dir),
        k=TOP_K,
        feedback_documents=FB_DOCS,
        feedback_terms=FB_TERMS,
    )


FB_INTERP_DOCS = 10


def _q_lmp_feedback_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _puurula_engine(spark, sf_dir)
    return eng.search_feedback_interpolated(
        TESTDATA_QUERIES, k=TOP_K, feedback_documents=FB_INTERP_DOCS
    )


def _q_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.more_like_this(
        0, _transcripts(spark, sf_dir), k=TOP_K, terms=10
    )


_BM25_CONTRIB = """
            100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                  * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                     / (CAST(t.tf AS DOUBLE)
                        + CAST(CAST(0.9 * ((1.0 - 0.4)
                            + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                          AS REAL) AS DOUBLE)))
"""

_BM25_RSV = """
            ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                  * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                     / (CAST(t.tf AS DOUBLE)
                        + CAST(CAST(0.9 * ((1.0 - 0.4)
                            + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                          AS REAL) AS DOUBLE)))
"""


def _kl_ctes(fbdocs_src: str) -> str:
    """Shared CTE block: pseudo-doc word tokens of the docs in
    ``fbdocs_src`` (query_id, docid) → per-query top-KL terms.
    Mirrors _kl_select: TT_WORD only (letters), q = cf/|C| or 1/|C|,
    kl = p·ln(p/q), ties by term asc."""
    return f"""
fbtoks AS (
  SELECT f.query_id,
         unnest(regexp_extract_all(lower(c.text), '[a-z]+')) AS term
  FROM {fbdocs_src} f
  JOIN docmap d USING (docid)
  JOIN corpus c USING (doc_id)
),
plen AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS plen
  FROM fbtoks GROUP BY query_id
),
ptf AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS ptf
  FROM fbtoks GROUP BY query_id, term
),
kl AS (
  SELECT p.query_id, p.term,
         (CAST(p.ptf AS DOUBLE) / CAST(l.plen AS DOUBLE))
           * ln((CAST(p.ptf AS DOUBLE) / CAST(l.plen AS DOUBLE))
                / (CASE WHEN ts.cf IS NULL
                        THEN 1.0 / CAST(s.coll_len AS DOUBLE)
                        ELSE CAST(ts.cf AS DOUBLE) / CAST(s.coll_len AS DOUBLE)
                   END)) AS kl
  FROM ptf p
  JOIN plen l USING (query_id)
  LEFT JOIN termstats ts USING (term)
  CROSS JOIN stats s
)"""


def _feedback_sql(k: int, fb_docs: int, fb_terms: int) -> str:
    """Full blind-KL chain in SQL: initial BM25 ranking → top-fb_docs
    pseudo-doc → KL terms → expanded re-query with the KL score as the
    per-term postscalar (1 + trunc((rsv·post)·100))."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
scored0 AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT)
                   * (1 + CAST(trunc({_BM25_CONTRIB}) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc0 AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored0
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked0 AS (
  SELECT query_id, docid, rsv_fixed,
         row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS rank
  FROM acc0
),
fbdocs AS (
  SELECT query_id, docid FROM ranked0 WHERE rank <= {fb_docs}
),
{_kl_ctes("fbdocs")},
fbterms AS (
  SELECT query_id, term, kl FROM (
    SELECT query_id, term, kl,
           row_number() OVER (
             PARTITION BY query_id ORDER BY kl DESC, term ASC
           ) AS rn
    FROM kl
  ) WHERE rn <= {fb_terms}
),
hasfb AS (SELECT DISTINCT query_id FROM fbterms),
exq AS (
  SELECT query_id, term, CAST(weight AS BIGINT) AS weight, 1.0 AS post
  FROM q
  UNION ALL
  SELECT query_id, term, CAST(1 AS BIGINT) AS weight, kl AS post
  FROM fbterms
),
scored AS (
  SELECT CAST(e.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE e.weight
                   * (1 + CAST(trunc(({_BM25_RSV} * e.post) * 100.0) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM exq e
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
final AS (
  SELECT query_id, docid, rsv_fixed FROM acc
  WHERE query_id IN (SELECT query_id FROM hasfb)
  UNION ALL
  SELECT query_id, docid, rsv_fixed FROM ranked0
  WHERE query_id NOT IN (SELECT query_id FROM hasfb) AND rank <= {k}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM final
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _query_values_ord_sql() -> str:
    """TESTDATA_QUERIES as (query_id, ord, term, weight) VALUES — ord
    is the term's parse position (the NEXI node order the reference's
    term iterator walks)."""
    from atire_spark.query import parse_query

    rows = []
    for qid, text in TESTDATA_QUERIES:
        for i, (term, weight) in enumerate(parse_query(text)):
            rows.append(f"({qid}, {i}, '{term}', {weight})")
    return ",\n       ".join(rows)


def _feedback_rm_sql(k: int, fb_docs: int, fb_terms: int) -> str:
    """Blind KL-RM feedback chain in SQL
    (relevance_feedback_blind_kl_rm.c:20-37): initial BM25 ranking →
    top-fb_docs pseudo-doc → the first min(|Q|, fb_terms) ORIGINAL
    query terms found there re-appended with their posterior
    tf/pseudo_len as the per-term postscalar."""
    return f"""
WITH {_CORPUS_CTE},
qo(query_id, ord, term, weight) AS (
  VALUES {_query_values_ord_sql()}
),
q AS (SELECT query_id, term, weight FROM qo),
scored0 AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT)
                   * (1 + CAST(trunc({_BM25_CONTRIB}) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc0 AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored0
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked0 AS (
  SELECT query_id, docid, rsv_fixed,
         row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS rank
  FROM acc0
),
fbdocs AS (
  SELECT query_id, docid FROM ranked0 WHERE rank <= {fb_docs}
),
fbtoks AS (
  SELECT f.query_id,
         unnest(regexp_extract_all(lower(c.text), '[a-z]+')) AS term
  FROM fbdocs f
  JOIN docmap d USING (docid)
  JOIN corpus c USING (doc_id)
),
plen AS (
  SELECT query_id, CAST(count(*) AS BIGINT) AS plen
  FROM fbtoks GROUP BY query_id
),
ptf AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS ptf
  FROM fbtoks GROUP BY query_id, term
),
fbterms AS (
  SELECT p.query_id, p.term,
         CAST(p.ptf AS DOUBLE) / CAST(l.plen AS DOUBLE) AS post
  FROM ptf p
  JOIN plen l USING (query_id)
  JOIN (SELECT DISTINCT query_id, term FROM qo WHERE ord < {fb_terms}) c
    ON c.query_id = p.query_id AND c.term = p.term
),
hasfb AS (SELECT DISTINCT query_id FROM fbterms),
exq AS (
  SELECT query_id, term, CAST(weight AS BIGINT) AS weight, 1.0 AS post
  FROM q
  UNION ALL
  SELECT query_id, term, CAST(1 AS BIGINT) AS weight, post
  FROM fbterms
),
scored AS (
  SELECT CAST(e.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE e.weight
                   * (1 + CAST(trunc(({_BM25_RSV} * e.post) * 100.0) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM exq e
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
final AS (
  SELECT query_id, docid, rsv_fixed FROM acc
  WHERE query_id IN (SELECT query_id FROM hasfb)
  UNION ALL
  SELECT query_id, docid, rsv_fixed FROM ranked0
  WHERE query_id NOT IN (SELECT query_id FROM hasfb) AND rank <= {k}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM final
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _lmp_feedback_interpolated_sql(
    k: int, fb_docs: int, lam: float = 0.5
) -> str:
    """FEEDBACK_INTERPOLATED (Puurula's ALTA, atire_api.c:1407-1555)
    transcribed whole: pass-1 lmp ranking, the log-domain normalizers
    folded through ANT_logsum in rank order (docs) then parse order
    (terms) via list_reduce over ordered lists seeded with 0.0, the
    interpolated float weights, and the pass-2 lmp re-query with the
    query length replaced by the weight sum."""
    logsum = (
        "(a, b) -> CASE WHEN a > b THEN ln(exp(b - a) + 1.0) + a"
        " ELSE ln(exp(a - b) + 1.0) + b END"
    )
    tfp1 = (
        "greatest(CAST(t.tf AS DOUBLE)"
        " - 0.5 * pow(CAST(t.tf AS DOUBLE), 0.5), 0.0)"
    )
    inner1 = (
        f"(ln({tfp1}) + ln(CAST(s.coll_len AS DOUBLE))"
        " - ln(1000.0 * CAST(ts.cf AS DOUBLE) + 1.0))"
    )
    ls1 = (
        f"CASE WHEN {inner1} > 0.0"
        f" THEN ln(exp(0.0 - {inner1}) + 1.0) + {inner1}"
        f" ELSE ln(exp({inner1}) + 1.0) END"
    )
    prior1 = (
        "ln(1.0 - (CAST(pl.ddl AS DOUBLE) / 1000.0)"
        " / (CAST(d.doc_len AS DOUBLE) + 1000.0))"
    )
    # memory-index side (local cf over the examined docs)
    tfpf = "greatest(g.tf0 - 0.5 * pow(g.tf0, 0.5), 0.0)"
    return f"""
WITH RECURSIVE {_CORPUS_CTE},
qo(query_id, ord, term, weight) AS (
  VALUES {_query_values_ord_sql()}
),
qn AS (SELECT query_id, CAST(sum(weight) AS DOUBLE) AS n FROM qo GROUP BY query_id),
pl AS (
  SELECT docid,
         CAST(floor(round(SUM(greatest(CAST(tf AS DOUBLE)
                - 0.5 * pow(CAST(tf AS DOUBLE), 0.5), 0.0)), 9)
              * 1000.0) AS BIGINT) AS ddl
  FROM tf GROUP BY docid
),
scored1 AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CAST(q.weight AS BIGINT) AS weight,
         1 + CAST(trunc(({ls1}) * 100.0) AS BIGINT) AS unit,
         1 + CAST(trunc((({ls1}) + qn.n * ({prior1})) * 100.0) AS BIGINT)
           AS unit_p,
         row_number() OVER (
           PARTITION BY q.query_id, t.docid ORDER BY ts.cf ASC, q.term ASC
         ) AS rn
  FROM qo q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  JOIN pl ON pl.docid = t.docid
  CROSS JOIN stats s
  JOIN qn ON qn.query_id = q.query_id
),
occs_w1 AS (
  -- exact is_zero_rsv replay: the prior fires on EVERY occurrence
  -- that finds the accumulator at zero (lmds.c:110-115), and the
  -- candidate-entry rule tracks 0->nonzero transitions per occurrence
  SELECT query_id, docid, unit, unit_p,
         row_number() OVER (
           PARTITION BY query_id, docid ORDER BY rn, _o.occ
         ) AS seq
  FROM scored1, unnest(range(1, CAST(weight AS BIGINT) + 1)) AS _o(occ)
),
cnt_w1 AS (
  SELECT query_id, docid, max(seq) AS n FROM occs_w1 GROUP BY 1, 2
),
walk_w1(query_id, docid, seq, acc16, nz) AS (
  SELECT query_id, docid, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0 FROM cnt_w1
  UNION ALL
  SELECT w.query_id, w.docid, w.seq + 1,
         ((w.acc16 + CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
           % 65536 + 65536) % 65536,
         CASE WHEN w.nz = 1
                OR ((CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
                    % 65536) <> 0
              THEN 1 ELSE 0 END
  FROM walk_w1 w
  JOIN occs_w1 o
    ON o.query_id = w.query_id AND o.docid = w.docid AND o.seq = w.seq + 1
),
acc1 AS (
  SELECT w.query_id AS query_id, w.docid AS docid,
         CAST(CASE WHEN w.acc16 >= 32768 THEN w.acc16 - 65536
                   ELSE w.acc16 END AS BIGINT) AS rsv_fixed
  FROM walk_w1 w
  JOIN cnt_w1 c
    ON c.query_id = w.query_id AND c.docid = w.docid AND w.seq = c.n
  WHERE w.nz = 1
),
ranked1 AS (
  SELECT query_id, docid, rsv_fixed,
         row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS rank
  FROM acc1
),
fbd AS (
  SELECT query_id, docid, rsv_fixed, rank
  FROM ranked1 WHERE rank <= {fb_docs}
),
grid AS (
  SELECT f.query_id, f.docid, f.rank, f.rsv_fixed,
         q.ord, q.term, CAST(q.weight AS DOUBLE) AS qf,
         CAST(coalesce(t.tf, 0) AS DOUBLE) AS tf0
  FROM fbd f
  JOIN qo q USING (query_id)
  LEFT JOIN tf t ON t.docid = f.docid AND t.term = q.term
),
cfl AS (
  SELECT query_id, term, sum(tf0) AS cf_local
  FROM grid GROUP BY query_id, term
),
dts AS (
  SELECT g.query_id, g.term, g.ord, g.rank,
         g.qf * (CASE WHEN {tfpf} > 0.0 THEN
             CASE WHEN (ln({tfpf}) + ln(CAST(s.coll_len AS DOUBLE))
                        - ln(1000.0 * c.cf_local + 1.0)) > 0.0
                  THEN ln(exp(0.0 - (ln({tfpf}) + ln(CAST(s.coll_len AS DOUBLE))
                        - ln(1000.0 * c.cf_local + 1.0))) + 1.0)
                       + (ln({tfpf}) + ln(CAST(s.coll_len AS DOUBLE))
                        - ln(1000.0 * c.cf_local + 1.0))
                  ELSE ln(exp(ln({tfpf}) + ln(CAST(s.coll_len AS DOUBLE))
                        - ln(1000.0 * c.cf_local + 1.0)) + 1.0) END
             ELSE 0.0 END)
         + ln(1.0 - (CAST(pl.ddl AS DOUBLE) / 1000.0)
              / (CAST(d.doc_len AS DOUBLE) + 1000.0))
         + CAST(g.rsv_fixed AS DOUBLE) AS x
  FROM grid g
  JOIN cfl c ON c.query_id = g.query_id AND c.term = g.term
  JOIN docmap d ON d.docid = g.docid
  JOIN pl ON pl.docid = g.docid
  CROSS JOIN stats s
  WHERE c.cf_local > 0
),
tn1 AS (
  SELECT query_id, term, min(ord) AS ord,
         list_reduce(list_prepend(0.0, list(x ORDER BY rank)),
                     {logsum}) AS tn
  FROM dts GROUP BY query_id, term
),
norm AS (
  SELECT query_id,
         list_reduce(list_prepend(0.0, list(tn ORDER BY ord)),
                     {logsum}) AS nz
  FROM tn1 GROUP BY query_id
),
tn2 AS (
  SELECT d2.query_id, d2.term,
         list_reduce(list_prepend(0.0, list(d2.x - n2.nz ORDER BY d2.rank)),
                     {logsum}) AS tn
  FROM dts d2 JOIN norm n2 USING (query_id)
  GROUP BY d2.query_id, d2.term
),
wts AS (
  SELECT q.query_id, q.term,
         CASE WHEN t2.tn IS NOT NULL
              THEN (1.0 - {lam}) * CAST(q.weight AS DOUBLE) / qn.n
                   + {lam} * exp(t2.tn)
              ELSE CAST(q.weight AS DOUBLE) END AS qf2,
         t2.tn IS NOT NULL AS present
  FROM (SELECT DISTINCT query_id, term, weight FROM qo) q
  JOIN qn USING (query_id)
  LEFT JOIN tn2 t2 ON t2.query_id = q.query_id AND t2.term = q.term
),
sq AS (
  SELECT query_id,
         coalesce(sum(CASE WHEN present THEN qf2 END), 0.0) AS sum_qf
  FROM wts GROUP BY query_id
),
scored2 AS (
  SELECT CAST(w.query_id AS BIGINT) AS query_id, t.docid,
         1 + CAST(trunc((w.qf2 * ({ls1})) * 100.0) AS BIGINT) AS unit,
         1 + CAST(trunc((w.qf2 * ({ls1})
               + sq.sum_qf * ({prior1})) * 100.0) AS BIGINT) AS unit_p,
         row_number() OVER (
           PARTITION BY w.query_id, t.docid ORDER BY ts.cf ASC, w.term ASC
         ) AS rn
  FROM wts w
  JOIN sq ON sq.query_id = w.query_id
  JOIN termstats ts ON ts.term = w.term
  JOIN tf t ON t.term = w.term
  JOIN docmap d USING (docid)
  JOIN pl ON pl.docid = t.docid
  CROSS JOIN stats s
),
occs_w2 AS (
  -- exact is_zero_rsv replay: the prior fires on EVERY occurrence
  -- that finds the accumulator at zero (lmds.c:110-115), and the
  -- candidate-entry rule tracks 0->nonzero transitions per occurrence
  SELECT query_id, docid, unit, unit_p,
         row_number() OVER (
           PARTITION BY query_id, docid ORDER BY rn, _o.occ
         ) AS seq
  FROM scored2, unnest(range(1, CAST(1 AS BIGINT) + 1)) AS _o(occ)
),
cnt_w2 AS (
  SELECT query_id, docid, max(seq) AS n FROM occs_w2 GROUP BY 1, 2
),
walk_w2(query_id, docid, seq, acc16, nz) AS (
  SELECT query_id, docid, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0 FROM cnt_w2
  UNION ALL
  SELECT w.query_id, w.docid, w.seq + 1,
         ((w.acc16 + CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
           % 65536 + 65536) % 65536,
         CASE WHEN w.nz = 1
                OR ((CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
                    % 65536) <> 0
              THEN 1 ELSE 0 END
  FROM walk_w2 w
  JOIN occs_w2 o
    ON o.query_id = w.query_id AND o.docid = w.docid AND o.seq = w.seq + 1
),
acc2 AS (
  SELECT w.query_id AS query_id, w.docid AS docid,
         CAST(CASE WHEN w.acc16 >= 32768 THEN w.acc16 - 65536
                   ELSE w.acc16 END AS BIGINT) AS rsv_fixed
  FROM walk_w2 w
  JOIN cnt_w2 c
    ON c.query_id = w.query_id AND c.docid = w.docid AND w.seq = c.n
  WHERE w.nz = 1
),
ranked2 AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc2
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked2 WHERE rank <= {k}
"""


def _more_like_this_sql(k: int, docid: int = 0, terms: int = 10) -> str:
    """More-like-this: top-``terms`` KL terms of one doc run as a
    plain query (weight 1, postscalar 1)."""
    return f"""
WITH {_CORPUS_CTE},
fbdocs AS (SELECT CAST(1 AS BIGINT) AS query_id, CAST({docid} AS BIGINT) AS docid),
{_kl_ctes("fbdocs")},
keyterms AS (
  SELECT query_id, term FROM (
    SELECT query_id, term, kl,
           row_number() OVER (
             PARTITION BY query_id ORDER BY kl DESC, term ASC
           ) AS rn
    FROM kl
  ) WHERE rn <= {terms}
),
scored AS (
  SELECT CAST(e.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE 1 + CAST(trunc({_BM25_CONTRIB}) AS BIGINT)
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM keyterms e
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


RERANK_FPK = 30  # first-pass depth for the two-stage rerank entry


def _q_bm25_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_rerank(
        TESTDATA_QUERIES,
        _transcripts(spark, sf_dir),
        k=TOP_K,
        first_pass_k=RERANK_FPK,
    )


def _rerank_sql(k: int, fpk: int) -> str:
    """Two-stage rerank oracle (atire_api.c:1716-1767): first-pass
    BM25 top-fpk, re-scored inside the subcollection with its own
    N / mean length / df; mini docids = rank order, ties larger
    minidoc first."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
scored0 AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT)
                   * (1 + CAST(trunc({_BM25_CONTRIB}) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc0 AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored0
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked0 AS (
  SELECT query_id, docid,
         row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS rank
  FROM acc0
),
minidocs AS (
  SELECT query_id, docid, rank - 1 AS minidoc
  FROM ranked0 WHERE rank <= {fpk}
),
ministats AS (
  SELECT m.query_id, CAST(count(*) AS BIGINT) AS n_sub,
         CAST(sum(d.doc_len) AS DOUBLE) / count(*) AS mean_sub
  FROM minidocs m JOIN docmap d USING (docid)
  GROUP BY m.query_id
),
minitf AS (
  SELECT m.query_id, m.minidoc, m.docid, t.term, t.tf, d.doc_len
  FROM minidocs m
  JOIN tf t USING (docid)
  JOIN docmap d USING (docid)
),
minidf AS (
  SELECT query_id, term, CAST(count(*) AS BIGINT) AS df_sub
  FROM minitf GROUP BY query_id, term
),
rescored AS (
  SELECT mt.query_id, mt.minidoc, mt.docid,
         CASE WHEN md.df_sub = ms.n_sub THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT) * (1 + CAST(trunc(
                100.0 * ln(CAST(ms.n_sub AS DOUBLE) / CAST(md.df_sub AS DOUBLE))
                      * ((CAST(mt.tf AS DOUBLE) * (0.9 + 1.0))
                         / (CAST(mt.tf AS DOUBLE)
                            + CAST(CAST(0.9 * ((1.0 - 0.4)
                                + 0.4 * (CAST(mt.doc_len AS DOUBLE) / ms.mean_sub))
                              AS REAL) AS DOUBLE)))) AS BIGINT))
         END AS contrib,
         CASE WHEN md.df_sub = ms.n_sub THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN minitf mt ON mt.query_id = q.query_id AND mt.term = q.term
  JOIN minidf md ON md.query_id = mt.query_id AND md.term = mt.term
  JOIN ministats ms ON ms.query_id = mt.query_id
),
racc AS (
  SELECT query_id, minidoc, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM rescored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, minidoc, docid
  HAVING sum(is_hit) > 0
),
rranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, minidoc DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM racc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM rranked WHERE rank <= {k}
"""


SNIPPET_TERMS = ["hash", "join", "dup", "spark"]
SNIPPET_WINDOW = 12
SNIPPET_LEN = 80
CLOUD_TERMS = 5


def _q_snippet_beginning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.snippets import snippet_beginning

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return snippet_beginning(docs.select("doc_id", "text"), SNIPPET_LEN)


def _q_snippet_window_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.snippets import snippet_window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return snippet_window(
        docs.select("doc_id", "text"),
        {t: 1.0 for t in SNIPPET_TERMS},
        SNIPPET_WINDOW,
    )


def _q_snippet_window_tficf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.snippets import snippet_window, tficf_weights

    eng = _engine(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wts = tficf_weights(
        SNIPPET_TERMS,
        eng.postings.select("term", "cf"),
        eng.collection_len,
    )
    return snippet_window(
        docs.select("doc_id", "text"), wts, SNIPPET_WINDOW
    )


def _q_snippet_kl_cloud(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.snippets import snippet_kl_cloud

    eng = _engine(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return snippet_kl_cloud(
        docs.select("doc_id", "text"),
        eng.postings.select("term", "cf"),
        eng.collection_len,
        CLOUD_TERMS,
    )


def _q_snippet_title(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.snippets import snippet_first_tag

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return snippet_first_tag(
        docs.select("doc_id", "source", "text"), SNIPPET_LEN
    )


def _q_snippet_best_tag(weighted: bool):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        from atire_spark.snippets import snippet_best_tag, tficf_weights

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        if weighted:
            eng = _engine(spark, sf_dir)
            wts = tficf_weights(
                SNIPPET_TERMS,
                eng.postings.select("term", "cf"),
                eng.collection_len,
            )
        else:
            wts = {t: 1.0 for t in SNIPPET_TERMS}
        return snippet_best_tag(
            docs.select("doc_id", "source", "text"), wts, SNIPPET_LEN
        )

    return fn


def _snippet_title_sql() -> str:
    """Closed form of the tag scan over the deterministic rendering:
    content-after-first-<title> with tags stripped is exactly
    source ⊕ text, whitespace-normalized (the corpus text contains no
    '<'), truncated."""
    return f"""
WITH {_CORPUS_CTE}
SELECT doc_id,
       substr(trim(regexp_replace(source || ' ' || text, '\\s+', ' ', 'g')),
              1, {SNIPPET_LEN}) AS snippet
FROM documents
"""


def _snippet_best_tag_sql(weights_expr: str) -> str:
    from atire_spark.snippets import TAG_TOKENS

    return f"""
WITH {_CORPUS_CTE},
tokpos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(0, len(tl))) AS pos
  FROM (
    SELECT doc_id,
           regexp_extract_all(lower(text), '[a-z]+|[0-9]+') AS tl
    FROM documents
  )
),
weighted AS (
  SELECT t.doc_id, t.pos, t.pos // {TAG_TOKENS} AS para, t.term,
         {weights_expr} AS weight
  FROM tokpos t
),
pscore AS (
  SELECT doc_id, para, round(sum(weight), 9) AS score
  FROM weighted
  GROUP BY doc_id, para
),
best AS (
  SELECT doc_id, para AS start, score FROM (
    SELECT doc_id, para, score,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, para ASC
           ) AS rn
    FROM pscore
  ) WHERE rn = 1 AND score > 0
),
won AS (
  SELECT b.doc_id, b.start, b.score,
         substr(string_agg(t.term, ' ' ORDER BY t.pos), 1,
                {SNIPPET_LEN}) AS snippet
  FROM best b JOIN tokpos t USING (doc_id)
  WHERE t.pos // {TAG_TOKENS} >= b.start
  GROUP BY b.doc_id, b.start, b.score
)
SELECT doc_id, CAST(start AS BIGINT) AS start, score, snippet FROM won
UNION ALL
SELECT d.doc_id, CAST(0 AS BIGINT) AS start, 0.0 AS score,
       substr(d.source || CASE WHEN j.body IS NULL OR j.body = ''
                               THEN '' ELSE ' ' || j.body END,
              1, {SNIPPET_LEN}) AS snippet
FROM documents d
LEFT JOIN (
  SELECT doc_id, string_agg(term, ' ' ORDER BY pos) AS body
  FROM tokpos GROUP BY doc_id
) j USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM best)
"""


def _snippet_window_sql(weights_expr: str) -> str:
    """Shared window-snippet oracle: parallel-unnest token positions,
    windowed weight sum, earliest-best window, tokens re-joined."""
    return f"""
WITH {_CORPUS_CTE},
tokpos AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(0, len(tl))) AS pos
  FROM (
    SELECT doc_id,
           regexp_extract_all(lower(text), '[a-z]+|[0-9]+') AS tl
    FROM documents
  )
),
weighted AS (
  SELECT t.doc_id, t.pos, t.term, {weights_expr} AS weight
  FROM tokpos t
),
win AS (
  SELECT doc_id, pos AS start,
         sum(weight) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {SNIPPET_WINDOW - 1} FOLLOWING
         ) AS score
  FROM weighted
),
best AS (
  SELECT doc_id, start, round(score, 9) AS score FROM (
    SELECT doc_id, start, score,
           row_number() OVER (
             PARTITION BY doc_id ORDER BY score DESC, start ASC
           ) AS rn
    FROM win
  ) WHERE rn = 1 AND score > 0
)
SELECT b.doc_id, b.start, b.score,
       string_agg(t.term, ' ' ORDER BY t.pos) AS snippet
FROM best b JOIN tokpos t USING (doc_id)
WHERE t.pos >= b.start AND t.pos < b.start + {SNIPPET_WINDOW}
GROUP BY b.doc_id, b.start, b.score
"""


def _snippet_kl_cloud_sql() -> str:
    return f"""
WITH {_CORPUS_CTE},
wtoks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
  FROM documents
),
wtf AS (SELECT doc_id, term, count(*) AS tf FROM wtoks GROUP BY doc_id, term),
wlen AS (SELECT doc_id, count(*) AS dlen FROM wtoks GROUP BY doc_id),
kl AS (
  SELECT f.doc_id, f.term,
         (CAST(f.tf AS DOUBLE) / l.dlen)
           * ln((CAST(f.tf AS DOUBLE) / l.dlen)
                / (CASE WHEN ts.cf IS NULL
                        THEN 1.0 / CAST(s.coll_len AS DOUBLE)
                        ELSE CAST(ts.cf AS DOUBLE) / CAST(s.coll_len AS DOUBLE)
                   END)) AS kl
  FROM wtf f
  JOIN wlen l USING (doc_id)
  LEFT JOIN termstats ts USING (term)
  CROSS JOIN stats s
)
SELECT doc_id, string_agg(term, ' ' ORDER BY kl DESC, term ASC) AS cloud
FROM (
  SELECT doc_id, term, kl,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY kl DESC, term ASC
         ) AS rn
  FROM kl
) WHERE rn <= {CLOUD_TERMS}
GROUP BY doc_id
"""


def _q_focus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INEX focused retrieval (focus_lowest_tag.c:13-92): BM25 top-k,
    then per-hit passage extraction over the deterministic tagged
    rendering — start at the open tag before the first query-term hit,
    finish at the close tag after the last."""
    from atire_spark.focus import focus_results

    eng = _engine(spark, sf_dir)
    topk = eng.search_batch(TESTDATA_QUERIES, k=TOP_K)
    return focus_results(
        topk, eng.index.docmap, _transcripts(spark, sf_dir), TESTDATA_QUERIES
    )


def _focus_sql(k: int) -> str:
    """Closed-form focusing oracle: re-derives tag_document's offsets
    arithmetically — paragraph i of 8 whitespace tokens costs
    7 + len(content) chars ('<p></p>'), '<doc>' costs 5 — and the
    focus scan's span: start = '<p>' of the first-hit paragraph,
    finish = end of '</p>' of the last-hit paragraph, whole document
    when no term matches. Hit test mirrors focus.py's word-run scan
    (letter runs lowercased, digit runs raw)."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
qterms AS (
  SELECT CAST(query_id AS BIGINT) AS query_id, list(DISTINCT term) AS terms
  FROM q GROUP BY query_id
),
scored0 AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT)
                   * (1 + CAST(trunc({_BM25_CONTRIB}) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc0 AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored0
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked0 AS (
  SELECT query_id, docid, rsv_fixed,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank
  FROM acc0
),
hits AS (
  SELECT r.query_id, r.rank, r.docid, r.rsv_fixed, c.text
  FROM ranked0 r
  JOIN docmap d USING (docid)
  JOIN corpus c USING (doc_id)
  WHERE r.rank <= {k}
),
feat AS (
  SELECT h.query_id, h.rank, h.docid, h.rsv_fixed,
         list_filter(regexp_split_to_array(trim(h.text), '\\s+'),
                     x -> x <> '') AS wtoks,
         qt.terms
  FROM hits h JOIN qterms qt USING (query_id)
),
hitidx AS (
  SELECT query_id, rank, docid, rsv_fixed, wtoks,
         CAST(ceil(len(wtoks) / 8.0) AS INTEGER) AS npara,
         list_filter(range(1, len(wtoks) + 1),
           i -> len(list_intersect(
                  list_transform(
                    regexp_extract_all(wtoks[i], '[A-Za-z]+|[0-9]+'),
                    r -> lower(r)),
                  terms)) > 0) AS hit_idx
  FROM feat
),
para AS (
  SELECT *,
         list_transform(range(0, npara),
           i -> 7 + length(array_to_string(
                      list_slice(wtoks, 8*i + 1, 8*i + 8), ' '))) AS costs,
         '<doc>' || array_to_string(
           list_transform(range(0, npara),
             i -> '<p>' || array_to_string(
                    list_slice(wtoks, 8*i + 1, 8*i + 8), ' ') || '</p>'),
           '') || '</doc>' AS tagged
  FROM hitidx
),
spans AS (
  SELECT query_id, rank, docid, rsv_fixed, tagged,
         CASE WHEN len(hit_idx) = 0 THEN 0
              ELSE 5 + coalesce(list_sum(list_slice(
                     costs, 1, CAST((hit_idx[1] - 1) // 8 AS INTEGER))), 0)
         END AS start,
         CASE WHEN len(hit_idx) = 0 THEN 11 + coalesce(list_sum(costs), 0)
              ELSE 5 + coalesce(list_sum(list_slice(
                     costs, 1,
                     CAST((hit_idx[-1] - 1) // 8 + 1 AS INTEGER))), 0)
         END AS finish
  FROM para
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(start AS INTEGER) AS start,
       CAST(finish AS INTEGER) AS finish,
       substr(tagged, CAST(start + 1 AS INTEGER),
              CAST(finish - start AS INTEGER)) AS passage
FROM spans
"""


# single-term queries for the reference's single-term top-k prune
ST_QUERIES: list[tuple[int, str]] = [
    (1, "spark"),
    (2, "dup"),
    (3, "the"),
    (4, "join"),
    (5, "window"),
]
TRIM_K = 20  # -K read-side trim exercised by bm25_trimmed_topk
STATIC_K = 15  # -K BUILD-side static prune exercised by the static member


def _q_single_term_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-term top-k prune (atire_api.c:989-997): each 1-term
    query decodes only its k highest-impact postings (mid-quantum
    cut), then ranks those."""
    eng = _engine(spark, sf_dir)
    return eng.search_batch(ST_QUERIES, k=TOP_K, single_term_prune=True)


def _q_bm25_static_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-side static prune (-K, memory_index.c:545-546 + the
    ~trimpoint variable, memory_index.c:1520-1521): the index itself
    is rewritten to each term's first STATIC_K postings in global
    impact order (exact mid-quantum cut, dictionary df/cf kept at
    collection values), then searched PLAIN — no query-side trim
    flags. The kept set equals the read-side trim's first-K set, so
    the oracle is the same trimmed-BM25 SQL at STATIC_K."""
    from atire_spark.prune import static_prune_index

    eng = _engine(spark, sf_dir)
    pruned = static_prune_index(spark, eng.index, STATIC_K)
    from atire_spark.query import SearchEngine

    return SearchEngine(spark, pruned).search_batch(TESTDATA_QUERIES, k=TOP_K)


def _q_bm25_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read-side trim point (-K query side, search_engine.c:938-963):
    every term decodes only its first TRIM_K postings in global
    impact order."""
    eng = _engine(spark, sf_dir)
    return eng.search_batch(
        TESTDATA_QUERIES, k=TOP_K, trim_postings_k=TRIM_K
    )


def _trimmed_bm25_sql(k: int, trim: int, values_sql: str) -> str:
    """BM25 with the per-(query, term) read trim: the first ``trim``
    postings in (impact desc, docid asc) order — the same global
    quantum order the engine's mid-quantum cut realizes."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {values_sql}
),
trimmed AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, q.weight, t.term,
         t.docid, t.tf
  FROM q JOIN tf t USING (term)
  QUALIFY row_number() OVER (
    PARTITION BY q.query_id, t.term ORDER BY t.tf DESC, t.docid ASC
  ) <= {trim}
),
scored AS (
  SELECT tr.query_id, tr.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(tr.weight AS BIGINT) * (1 + CAST(trunc(
                100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                      * ((CAST(tr.tf AS DOUBLE) * (0.9 + 1.0))
                         / (CAST(tr.tf AS DOUBLE)
                            + CAST(CAST(0.9 * ((1.0 - 0.4)
                                + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                              AS REAL) AS DOUBLE)))) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM trimmed tr
  JOIN termstats ts ON ts.term = tr.term
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation metrics (evaluator.c protocol) over the BM25 run
    with deterministic graded qrels derived from the corpus: docs
    containing 'dup' are relevant with grade = tf, docs containing
    'window' are judged irrelevant. Metrics rounded to 9 dp so the
    engine/oracle float-sum orders cannot ulp-diverge the hash."""
    import numpy as np
    import pandas as pd

    from atire_spark.eval import (
        bpref,
        mean_average_precision,
        precision_at,
        rank_effectiveness,
        success_at,
    )

    eng = _engine(spark, sf_dir)
    results = eng.search_batch(TESTDATA_QUERIES, k=TOP_K)

    def decode_fn(batches):
        from atire_spark.kernels.impact import decode_segment

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d, t, _ = decode_segment(
                    np.asarray(row.impacts),
                    np.asarray(row.doc_counts),
                    row.postings,
                    None,
                )
                yield pd.DataFrame(
                    {
                        "docid": d,
                        "tf": t.astype(np.int64),
                        "term": np.full(d.size, row.term, dtype=object),
                    }
                )

    tfd = eng.postings.filter(F.col("term").isin(["dup", "window"])).mapInPandas(
        decode_fn, schema="docid long, tf long, term string"
    )
    rel = tfd.groupBy("docid").agg(
        F.max(
            F.when(F.col("term") == "dup", F.col("tf")).otherwise(F.lit(0))
        ).alias("relevance")
    )
    qids = spark.createDataFrame(
        [(q,) for q, _ in TESTDATA_QUERIES], "query_id long"
    )
    qrels = qids.crossJoin(rel).select(
        "query_id", "docid", F.col("relevance").cast("int").alias("relevance")
    )
    out = (
        mean_average_precision(results, qrels)
        .join(precision_at(results, qrels, 10), "query_id")
        .join(success_at(results, qrels, 10), "query_id")
        .join(bpref(results, qrels), "query_id")
        .join(rank_effectiveness(results, qrels), "query_id")
    )
    return out.select(
        "query_id",
        F.round("average_precision", 9).alias("average_precision"),
        F.round("precision_at_10", 9).alias("precision_at_10"),
        F.round("success_at_10", 9).alias("success_at_10"),
        F.round("bpref", 9).alias("bpref"),
        F.round("rank_effectiveness", 9).alias("rank_effectiveness"),
    )


def _q_eval_intent_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intent-aware MAP over two deterministic subtopics: subtopic 0's
    relevance grades come from 'dup' term frequencies, subtopic 1's
    from 'window' (the judged pool for both is the union of documents
    containing either term)."""
    import numpy as np
    import pandas as pd

    from atire_spark.eval import intent_aware, mean_average_precision

    eng = _engine(spark, sf_dir)
    results = eng.search_batch(TESTDATA_QUERIES, k=TOP_K)

    def decode_fn(batches):
        from atire_spark.kernels.impact import decode_segment

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d, t, _ = decode_segment(
                    np.asarray(row.impacts),
                    np.asarray(row.doc_counts),
                    row.postings,
                    None,
                )
                yield pd.DataFrame(
                    {
                        "docid": d,
                        "tf": t.astype(np.int64),
                        "term": np.full(d.size, row.term, dtype=object),
                    }
                )

    tfd = eng.postings.filter(
        F.col("term").isin(["dup", "window"])
    ).mapInPandas(decode_fn, schema="docid long, tf long, term string")
    per_doc = tfd.groupBy("docid").agg(
        F.max(
            F.when(F.col("term") == "dup", F.col("tf")).otherwise(0)
        ).alias("rel0"),
        F.max(
            F.when(F.col("term") == "window", F.col("tf")).otherwise(0)
        ).alias("rel1"),
    )
    rel = per_doc.select(
        "docid", F.lit(0).alias("subtopic"), F.col("rel0").alias("relevance")
    ).unionByName(
        per_doc.select(
            "docid",
            F.lit(1).alias("subtopic"),
            F.col("rel1").alias("relevance"),
        )
    )
    qids = spark.createDataFrame(
        [(q,) for q, _ in TESTDATA_QUERIES], "query_id long"
    )
    subqrels = qids.crossJoin(rel).select(
        "query_id", "subtopic", "docid",
        F.col("relevance").cast("int").alias("relevance"),
    )
    out = intent_aware(mean_average_precision, results, subqrels)
    return out.select(
        "query_id",
        F.round("ia_average_precision", 9).alias("ia_average_precision"),
    )


def _eval_intent_aware_sql(k: int) -> str:
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT)
                   * (1 + CAST(trunc({_BM25_CONTRIB}) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
results AS (
  SELECT query_id, docid, rank FROM (
    SELECT query_id, docid,
           row_number() OVER (
             PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
           ) AS rank
    FROM acc
  ) WHERE rank <= {k}
),
relsub AS (
  SELECT docid, 0 AS subtopic,
         max(CASE WHEN term = 'dup' THEN tf ELSE 0 END) AS relevance
  FROM tf WHERE term IN ('dup', 'window') GROUP BY docid
  UNION ALL
  SELECT docid, 1 AS subtopic,
         max(CASE WHEN term = 'window' THEN tf ELSE 0 END) AS relevance
  FROM tf WHERE term IN ('dup', 'window') GROUP BY docid
),
qrels2 AS (
  SELECT qq.query_id, r.subtopic, r.docid, r.relevance
  FROM (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id FROM q) qq
  CROSS JOIN relsub r
),
topic2 AS (
  SELECT query_id, subtopic,
         sum(CASE WHEN relevance > 0 THEN 1 ELSE 0 END) AS n_rel
  FROM qrels2 GROUP BY query_id, subtopic
),
j2 AS (
  SELECT r.query_id, qr.subtopic, r.rank, coalesce(qr.relevance, 0) AS rel
  FROM results r
  JOIN qrels2 qr ON qr.query_id = r.query_id AND qr.docid = r.docid
),
ap2 AS (
  SELECT query_id, subtopic, sum(found * 1.0 / rank) AS p_sum FROM (
    SELECT query_id, subtopic, rank, rel,
           sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY query_id, subtopic ORDER BY rank) AS found
    FROM j2
  ) WHERE rel > 0 GROUP BY query_id, subtopic
),
persub AS (
  SELECT t.query_id, t.subtopic,
         coalesce(a.p_sum, 0) / t.n_rel AS ap
  FROM topic2 t LEFT JOIN ap2 a USING (query_id, subtopic)
  WHERE t.n_rel > 0
),
nsub AS (
  SELECT query_id, CAST(count(DISTINCT subtopic) AS BIGINT) AS n
  FROM qrels2 GROUP BY query_id
)
SELECT CAST(n.query_id AS VARCHAR) AS query_id,
       round(coalesce(sum(p.ap), 0) / n.n, 9) AS ia_average_precision
FROM nsub n LEFT JOIN persub p USING (query_id)
GROUP BY n.query_id, n.n
"""


def _eval_metrics_sql(k: int) -> str:
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT)
                   * (1 + CAST(trunc({_BM25_CONTRIB}) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
results AS (
  SELECT query_id, docid, rank FROM (
    SELECT query_id, docid,
           row_number() OVER (
             PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
           ) AS rank
    FROM acc
  ) WHERE rank <= {k}
),
rel AS (
  SELECT docid,
         max(CASE WHEN term = 'dup' THEN tf ELSE 0 END) AS relevance
  FROM tf WHERE term IN ('dup', 'window') GROUP BY docid
),
qrels AS (
  SELECT qq.query_id, r.docid, r.relevance
  FROM (SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id FROM q) qq
  CROSS JOIN rel r
),
topic AS (
  SELECT query_id,
         sum(CASE WHEN relevance > 0 THEN 1 ELSE 0 END) AS n_rel,
         sum(CASE WHEN relevance = 0 THEN 1 ELSE 0 END) AS n_nonrel
  FROM qrels GROUP BY query_id
),
j AS (
  SELECT r.query_id, r.rank, r.docid,
         coalesce(qr.relevance, 0) AS rel,
         CASE WHEN qr.docid IS NOT NULL THEN 1 ELSE 0 END AS judged
  FROM results r
  LEFT JOIN qrels qr ON qr.query_id = r.query_id AND qr.docid = r.docid
),
ap AS (
  SELECT query_id, sum(found * 1.0 / rank) AS p_sum FROM (
    SELECT query_id, rank, rel,
           sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
             OVER (PARTITION BY query_id ORDER BY rank) AS found
    FROM j
  ) WHERE rel > 0 GROUP BY query_id
),
p10 AS (
  SELECT query_id,
         sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS found,
         count(*) AS examined
  FROM j WHERE rank <= 10 GROUP BY query_id
),
jj AS (
  SELECT j.query_id, j.rank, j.rel, t.n_rel, t.n_nonrel,
         coalesce(sum(CASE WHEN j.rel = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY j.query_id ORDER BY j.rank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS nonrel_before
  FROM j JOIN topic t USING (query_id) WHERE j.judged = 1
),
bp AS (
  SELECT query_id,
         sum(1.0 - (least(nonrel_before, n_rel) * 1.0)
                   / least(n_rel, n_nonrel)) AS pref_sum
  FROM jj WHERE rel > 0 GROUP BY query_id
),
re AS (
  SELECT query_id,
         sum(1.0 - nonrel_before * 1.0 / greatest(n_nonrel, 1)) AS re_sum
  FROM jj WHERE rel > 0 GROUP BY query_id
)
SELECT t.query_id,
       round(coalesce(ap.p_sum, 0) / t.n_rel, 9) AS average_precision,
       round(coalesce(p10.found, 0) * 1.0
             / greatest(least(coalesce(p10.examined, 0), 10), 1), 9)
         AS precision_at_10,
       CASE WHEN coalesce(p10.found, 0) > 0 THEN 1.0 ELSE 0.0 END
         AS success_at_10,
       round(CASE WHEN t.n_nonrel = 0 THEN 1.0
                  ELSE coalesce(bp.pref_sum, 0) / t.n_rel END, 9) AS bpref,
       round(CASE WHEN t.n_nonrel = 0 THEN 1.0
                  ELSE coalesce(re.re_sum, 0) / t.n_rel END, 9)
         AS rank_effectiveness
FROM topic t
LEFT JOIN ap USING (query_id)
LEFT JOIN p10 USING (query_id)
LEFT JOIN bp USING (query_id)
LEFT JOIN re USING (query_id)
WHERE t.n_rel > 0
"""


def _q_nexi_signed(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_batch(NEXI_QUERIES, k=TOP_K)


# HAND-WRITTEN expected parses (not generated from the engine's parser,
# so the oracle independently pins the CO-grammar semantics). Queries
# 4 and 7 are REFUSED (trailing token after the stopper →
# ERROR_PREMATURE_END_OF_QUERY, NEXI_ant.c:27-28) and query 8's
# all-uppercase tag terms match nothing — none contribute rows; query
# 5's phrase is one inert verbatim term, so only "merge" scores.
_NEXI_EXPECTED_VALUES = """(1, 'dup', 1),
       (2, 'dup', 1),
       (3, 'dup', 1), (3, 'spark', 1),
       (5, 'merge', 1),
       (6, 'spark', 1), (6, 'dup', 1), (6, 'window', 1)"""


# NEXI CAS grammar coverage (nexi.c:510-567): about() clauses, nested
# paths, signs/phrases inside about, numeric predicates, and/or chains,
# a CO query through the same dispatch, and malformed inputs whose
# reference error codes refuse the query (0 hits)
NEXI_CAS_QUERIES: list[tuple[int, str]] = [
    (1, "//sec[about(., dup)]"),
    (2, "//article//p[about(.//title, spark merge)]"),
    (3, "//sec[about(., +dup -spark)]"),
    (4, '//sec[about(., "hash join") and about(., window)]'),
    (5, "//article[.//size > 5]"),
    (6, "dup spark"),  # no leading // -> CO dispatch
    (7, "//sec[dup]"),  # ERROR_MISSING_ABOUT_CLAUSE
    (8, "//sec about(., dup)"),  # ERROR_MISSING_OPEN_SQUARE_BRACKET
]

# HAND-DERIVED expected parses (the oracle pins the CAS degradation
# semantics independently of the engine's parser); error queries 7-8
# contribute no rows, and query 4's quoted phrase is ONE inert
# verbatim term — binary-verified: //sec[about(., "alpha bravo") and
# about(., omegaterm)] scores identically to plain ``omegaterm``
_NEXI_CAS_EXPECTED_VALUES = """(1, 'dup', 1),
       (2, 'spark', 1), (2, 'merge', 1),
       (3, 'dup', 1), (3, 'spark', 1),
       (4, 'window', 1),
       (5, '5', 1),
       (6, 'dup', 1), (6, 'spark', 1)"""


def _q_nexi_cas(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_cas(NEXI_CAS_QUERIES, k=TOP_K)


def _q_bm25_stopped(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _stop_engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)


def _q_term_culling(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _cull_engine(spark, sf_dir)
    return (
        eng.index.postings.groupBy("term", "df", "cf")
        .agg(F.max("max_impact").alias("max_impact"))
        .select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            F.col("max_impact").cast("int").alias("max_impact"),
        )
    )


def _stop_values_sql() -> str:
    """The NCBI stop list as a quoted IN-list for the oracle."""
    from atire_spark.kernels.stopwords import NCBI_STOPWORDS

    return ", ".join(f"'{w}'" for w in sorted(NCBI_STOPWORDS) if "'" not in w)


def _stopped_bm25_sql(k: int) -> str:
    """BM25 over the NCBI-stopped index: doc lengths count every
    token (terms_in_document++ precedes the stop check,
    index_document.c:61,100), postings exist only for non-stop terms."""
    return f"""
WITH {_CORPUS_CTE.replace("tf AS (", f'''stoppedtoks AS (
  SELECT * FROM toks WHERE term NOT IN ({_stop_values_sql()})
),
tf AS (''').replace("FROM toks t JOIN docmap d USING (doc_id)",
                    "FROM stoppedtoks t JOIN docmap d USING (doc_id)")},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CASE WHEN ts.df = s.n_docs THEN CAST(0 AS BIGINT)
              ELSE CAST(q.weight AS BIGINT) * (1 + CAST(trunc(
                100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                      * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                         / (CAST(t.tf AS DOUBLE)
                            + CAST(CAST(0.9 * ((1.0 - 0.4)
                                + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                              AS REAL) AS DOUBLE)))) AS BIGINT))
         END AS contrib,
         CASE WHEN ts.df = s.n_docs THEN 0 ELSE 1 END AS is_hit
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
acc AS (
  SELECT query_id, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored
  WHERE is_hit = 1 OR contrib <> 0
  GROUP BY query_id, docid
  HAVING sum(is_hit) > 0
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _mk_ranker_query(ranker: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = _engine(spark, sf_dir)
        return eng.search_batch(TESTDATA_QUERIES, k=TOP_K, ranker=ranker)

    return fn


def _ranker_sql(
    contrib_expr: str,
    k: int,
    extra_cte: str = "",
    extra_join: str = "",
    extra_where: str = "",
    agg: str = "sum",
    recursive: bool = False,
) -> str:
    """Shared scaffolding for the alternative-ranker oracles: same
    corpus CTE, per-query VALUES, pmod-wrapped uint16 accumulation,
    rsv desc / docid desc ranking. ``recursive`` switches the CTE
    list to WITH RECURSIVE (the adaptive-k1 oracles iterate their
    solvers as recursive CTEs)."""
    return f"""
WITH {"RECURSIVE " if recursive else ""}{_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
){extra_cte},
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         {contrib_expr} AS contrib
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
  {extra_join}
  {extra_where}
),
acc AS (
  SELECT query_id, docid,
         CAST(((({agg}(contrib) + 32768) % 65536 + 65536) % 65536) - 32768
              AS BIGINT) AS rsv_fixed
  FROM scored GROUP BY query_id, docid
  -- candidate-entry rule (search_engine_result.h add_rsv): a doc with
  -- every contribution zero never transitions 0 -> nonzero
  HAVING max(CASE WHEN contrib <> 0 THEN 1 ELSE 0 END) = 1
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _q_bm25_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _quant_engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)


def _q_bm25_quantized_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """-Q with automatic bit selection (memory_index.c:1553-1556):
    bits = trunc(5.4 + 5.4e-4*sqrt(N)) — 5 bits at sf0.01, so the
    oracle certifies a genuinely different impact scale than fixed8."""
    eng = _build_engine(
        spark, sf_dir, sf_dir.rstrip("/") + "#quant_auto", quantize_bits="auto"
    )
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K)


def _q_qaat_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantum-at-a-time traversal in exact mode
    (early_termination=None): processes every quantum in global
    impact-descending order — rank-identical to TaaT on the quantized
    index, so the bm25_quantized SQL oracle certifies the whole QaaT
    machinery (heap scheduling, per-quantum partial decode,
    accumulation). The QUANTUM_STOP_DIFF heuristic
    (atire_api.c:759-782) is exercised separately: pruning stats are
    reported by bench.py and its rank agreement is pytest-covered."""
    eng = _quant_engine(spark, sf_dir)
    return eng.search_qaat(TESTDATA_QUERIES, k=TOP_K, early_termination=None)


def _q_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-space block-max WAND (Broder CIKM'03 / Ding & Suel
    SIGIR'11 adapted to the impact-ordered segment layout): a
    metadata-only header pass derives a certified k-th-score lower
    bound θ₀, then only (query, seg_group) pairs whose Σ max_impact
    can reach θ₀ are decoded. Exact — the same quantized-TaaT oracle
    certifies it; pruning stats are reported by bench.py."""
    eng = _quant_engine(spark, sf_dir)
    return eng.search_wand(TESTDATA_QUERIES, k=TOP_K)


def _q_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_boolean(BOOLEAN_QUERIES, k=TOP_K)


def _boolean_sql(k: int) -> str:
    """Generated from the same parse trees the engine evaluates —
    per-leaf presence flags + the tree rendered as a SQL predicate."""
    from collections import Counter as _Counter

    from atire_spark.boolean import (
        assign_leaf_indexes,
        parse_boolean,
        tree_to_sql_predicate,
    )

    all_terms: set[str] = set()
    blocks: list[str] = []
    sels: list[str] = []
    for qid, text in BOOLEAN_QUERIES:
        tree = parse_boolean(text)
        if tree is None:
            continue
        leaves = assign_leaf_indexes(tree)
        mult = _Counter(leaf.term for leaf in leaves)
        all_terms.update(mult)
        flags = ",\n         ".join(
            f"bool_or(term = '{leaf.term}' AND c IS NOT NULL) AS f{leaf.idx}"
            for leaf in leaves
        )
        values = ", ".join(f"('{t}', {m})" for t, m in sorted(mult.items()))
        pred = tree_to_sql_predicate(tree, lambda i: f"f{i}")
        blocks.append(
            f"""cand{qid} AS (
  SELECT docid,
         CAST(((((coalesce(sum(m * c), 0)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed,
         {flags}
  FROM contrib JOIN (VALUES {values}) AS lm{qid}(term, m) USING (term)
  GROUP BY docid
)"""
        )
        sels.append(
            f"SELECT CAST({qid} AS BIGINT) AS query_id, docid, rsv_fixed "
            f"FROM cand{qid} WHERE {pred}"
        )
    term_list = ", ".join(f"'{t}'" for t in sorted(all_terms))
    union = "\n  UNION ALL\n  ".join(sels)
    return f"""
WITH {_CORPUS_CTE},
contrib AS (
  SELECT t.term, t.docid,
         CASE WHEN ts.df = s.n_docs THEN NULL
              ELSE 1 + CAST(trunc(
                100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                      * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                         / (CAST(t.tf AS DOUBLE)
                            + CAST(CAST(0.9 * ((1.0 - 0.4)
                                + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                              AS REAL) AS DOUBLE)))) AS BIGINT)
         END AS c
  FROM tf t
  JOIN termstats ts USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
  WHERE t.term IN ({term_list})
),
{','.join(blocks)},
allsel AS (
  {union}
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM allsel
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _q_topk_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialisation + the TREC run-file exporter
    (atire_engine_result_set_export_TREC.c:43-49): the driver-hashed
    ``line`` column is the exact run-file text, so the exporter's
    `topic Q0 docno rank rsv run_name` format is oracle-certified."""
    from atire_spark.export import export_trec

    eng = _engine(spark, sf_dir)
    res = eng.search_batch(TESTDATA_QUERIES[:3], k=TOP_K)
    mat = eng.materialize(res).select(
        "query_id", "rank", "docid", "conv_id", "turn_idx", "rsv_fixed"
    )
    return export_trec(mat, run_name="atire_spark", full=True)


def _q_pregen_recent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pregenerated ranking over the transcripts' ``ts`` field — the
    reference's INTEGEREXACT pregen writer turns an integer document
    field into .pregen scores (pregen_writer_exact_integers.c); here
    the (docid, score) table is built from the Iceberg-style source
    column, and matched docs rank most-recent-first."""
    eng = _engine(spark, sf_dir)
    t = _transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", F.unix_timestamp("ts").alias("score")
    )
    pregen = eng.index.docmap.join(t, ["conv_id", "turn_idx"]).select(
        "docid", "score"
    )
    return eng.search_pregen(TESTDATA_QUERIES, pregen, k=TOP_K)


def _pregen_sql(k: int) -> str:
    """Pregen oracle: matched (query, doc) pairs take the per-doc
    integer field value via set_rsv (MAX/overwrite — no weights, no
    accumulation), ranked rsv desc / docid desc."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
cand AS (
  SELECT DISTINCT CAST(q.query_id AS BIGINT) AS query_id, t.docid
  FROM q JOIN tf t USING (term)
),
pg AS (
  SELECT docid,
         CAST(epoch(TIMESTAMP '2025-01-01 00:00:00') AS BIGINT)
           + doc_id * 60 AS score
  FROM docmap
),
acc AS (
  SELECT c.query_id, c.docid, CAST(pg.score AS BIGINT) AS rsv_fixed
  FROM cand c JOIN pg ON pg.docid = c.docid
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _q_pregen_strexact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREXACT_RESTRICTED pregen writer
    (pregen_writer_exact_strings.c:182-206): the external id is
    base37-encoded (':' is unencodable and drops out) and each doc
    scores the dense strcmp-rank of its encoded field."""
    from atire_spark.pregen import pregen_scores

    eng = _engine(spark, sf_dir)
    docs = eng.index.docmap.select(
        "docid",
        F.concat_ws(
            ":", F.col("conv_id"), F.col("turn_idx").cast("string")
        ).alias("name"),
    )
    scores = pregen_scores(docs, "name", "strexact_restricted")
    return eng.search_pregen(TESTDATA_QUERIES, scores, k=TOP_K)


def _pregen_strexact_sql(k: int) -> str:
    """STREXACT_RESTRICTED oracle: over [0-9a-z] the base37 encoding
    is order-isomorphic to the plain string (digits before letters,
    shorter prefix first) and ':' is skipped, so the dense rank of
    replace(external_id, ':', '') is the exact encoded-bytes rank."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
cand AS (
  SELECT DISTINCT CAST(q.query_id AS BIGINT) AS query_id, t.docid
  FROM q JOIN tf t USING (term)
),
pg AS (
  SELECT docid,
         CAST(dense_rank() OVER (
           ORDER BY replace(conv_id || ':' || CAST(turn_idx AS VARCHAR),
                            ':', '')
         ) AS BIGINT) AS score
  FROM docmap
),
acc AS (
  SELECT c.query_id, c.docid, CAST(pg.score AS BIGINT) AS rsv_fixed
  FROM cand c JOIN pg ON pg.docid = c.docid
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _q_pregen_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BASE37_ARITHMETIC pregen writer (pregen_writer_normal.c:181-238
    generate_arithmetic + the reference's shipped non-adaptive base37
    model, arithmetic_model_tables.c:11-17): each doc scores the
    arithmetic-coded 40-char prefix of its turn text; the oracle
    replays the 16-bit-window coder bit-for-bit as a recursive CTE."""
    from atire_spark.pregen import pregen_scores

    eng = _engine(spark, sf_dir)
    t = _transcripts(spark, sf_dir).select(
        "conv_id", "turn_idx", F.substring("text", 1, 40).alias("name")
    )
    docs = eng.index.docmap.join(t, ["conv_id", "turn_idx"]).select(
        "docid", "name"
    )
    scores = pregen_scores(docs, "name", "base37arith")
    return eng.search_pregen(TESTDATA_QUERIES, scores, k=TOP_K)


def _pregen_arith_sql(k: int) -> str:
    """BASE37_ARITHMETIC oracle: an independent replay of the
    arithmetic coder (arithmetic_coding_encoder.h:50-120) as a
    recursive CTE — phase 0 narrows [low, high) by the symbol's
    cfreq slice, phase 1 runs one renormalization iteration (emit a
    settled half bit + pending underflow bits, or shrink the middle),
    padding with symbol 0 until the 63-bit buffer fills (done()); the
    score is T_max - buffer with the zero bump.  The model VALUES are
    the suffix-cumulative sums of the reference's shipped base37
    table."""
    from atire_spark.kernels.arith_tables import FREQ_BASE37

    cfreq = [0] * 38
    for i in range(36, -1, -1):
        cfreq[i] = cfreq[i + 1] + FREQ_BASE37[i]
    total = cfreq[0]
    model_rows = ",\n    ".join(
        f"({s}, {cfreq[s]}, {cfreq[s + 1]})" for s in range(37)
    )
    return f"""
WITH RECURSIVE {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
cand AS (
  SELECT DISTINCT CAST(q.query_id AS BIGINT) AS query_id, t.docid
  FROM q JOIN tf t USING (term)
),
model(sym, cf_hi, cf_lo) AS (VALUES
    {model_rows}
),
nm AS (
  SELECT d.docid, substr(c.text, 1, 40) AS nm
  FROM (SELECT DISTINCT docid FROM cand) x
  JOIN docmap d USING (docid) JOIN corpus c USING (doc_id)
),
chars AS (
  SELECT docid, i AS pos, substr(lower(nm), CAST(i AS INTEGER), 1) AS ch
  FROM (SELECT docid, nm, unnest(range(1, length(nm) + 1)) AS i FROM nm)
),
symraw AS (
  SELECT docid, pos,
         CASE WHEN ch = ' ' THEN 0
              WHEN ch BETWEEN '0' AND '9' THEN ascii(ch) - 48 + 1
              WHEN ch BETWEEN 'a' AND 'z' THEN ascii(ch) - 97 + 11
         END AS sym,
         CASE WHEN ch = ' ' THEN 1 ELSE 0 END AS is_space
  FROM chars
),
sym2 AS (
  SELECT docid, pos, sym, is_space,
         lag(is_space, 1, 1) OVER (PARTITION BY docid ORDER BY pos)
           AS prev_space
  FROM (SELECT * FROM symraw WHERE sym IS NOT NULL)
),
syms AS (
  SELECT docid,
         row_number() OVER (PARTITION BY docid ORDER BY pos) - 1 AS idx,
         sym
  FROM sym2 WHERE NOT (is_space = 1 AND prev_space = 1)
),
enc AS (
  SELECT docid, CAST(0 AS BIGINT) AS idx, 0 AS phase,
         CAST(0 AS BIGINT) AS low, CAST(65535 AS BIGINT) AS high,
         CAST(0 AS BIGINT) AS fbits,
         CAST(0 AS HUGEINT) AS buffer, CAST(63 AS BIGINT) AS btg
  FROM nm
  UNION ALL
  SELECT e.docid,
         CASE WHEN e.phase = 0 THEN e.idx + 1 ELSE e.idx END AS idx,
         CASE WHEN e.phase = 0 THEN 1
              WHEN e.high < 32768 OR e.low >= 32768
                   OR (e.low >= 16384 AND e.high < 49152) THEN 1
              ELSE 0 END AS phase,
         CASE WHEN e.phase = 0
                THEN e.low + ((e.high - e.low + 1) * m.cf_lo) // {total}
              WHEN e.high < 32768 THEN e.low * 2
              WHEN e.low >= 32768 THEN (e.low - 32768) * 2
              WHEN e.low >= 16384 AND e.high < 49152
                THEN (e.low - 16384) * 2
              ELSE e.low END AS low,
         CASE WHEN e.phase = 0
                THEN e.low + ((e.high - e.low + 1) * m.cf_hi) // {total} - 1
              WHEN e.high < 32768 THEN e.high * 2 + 1
              WHEN e.low >= 32768 THEN (e.high - 32768) * 2 + 1
              WHEN e.low >= 16384 AND e.high < 49152
                THEN (e.high - 16384) * 2 + 1
              ELSE e.high END AS high,
         CASE WHEN e.phase = 0 THEN e.fbits
              WHEN e.high < 32768 OR e.low >= 32768 THEN 0
              WHEN e.low >= 16384 AND e.high < 49152 THEN e.fbits + 1
              ELSE e.fbits END AS fbits,
         CASE WHEN e.phase = 1 AND e.high < 32768
                THEN e.buffer
                     * (CAST(1 AS HUGEINT)
                        << CAST(least(e.fbits + 1, e.btg) AS INTEGER))
                     + CASE WHEN least(e.fbits + 1, e.btg) >= 1
                            THEN (CAST(1 AS HUGEINT)
                                  << CAST(least(e.fbits + 1, e.btg) - 1
                                          AS INTEGER)) - 1
                            ELSE 0 END
              WHEN e.phase = 1 AND e.low >= 32768
                THEN e.buffer
                     * (CAST(1 AS HUGEINT)
                        << CAST(least(e.fbits + 1, e.btg) AS INTEGER))
                     + CASE WHEN least(e.fbits + 1, e.btg) >= 1
                            THEN CAST(1 AS HUGEINT)
                                 << CAST(least(e.fbits + 1, e.btg) - 1
                                         AS INTEGER)
                            ELSE 0 END
              ELSE e.buffer END AS buffer,
         CASE WHEN e.phase = 1 AND (e.high < 32768 OR e.low >= 32768)
                THEN e.btg - least(e.fbits + 1, e.btg)
              ELSE e.btg END AS btg
  FROM enc e
  LEFT JOIN syms s ON s.docid = e.docid AND s.idx = e.idx
  LEFT JOIN model m
    ON m.sym = CASE WHEN e.phase = 0 THEN coalesce(s.sym, 0) END
  WHERE NOT (e.phase = 0 AND e.btg = 0)
),
pg AS (
  SELECT docid,
         CASE WHEN raw = 0 THEN 1 ELSE raw END AS score
  FROM (
    SELECT docid,
           CAST((CAST(1 AS HUGEINT) << 63) - 1 - buffer AS BIGINT) AS raw
    FROM enc WHERE phase = 0 AND btg = 0
  )
),
acc AS (
  SELECT c.query_id, c.docid, CAST(pg.score AS BIGINT) AS rsv_fixed
  FROM cand c JOIN pg ON pg.docid = c.docid
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _q_readable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readable ranker, reference defaults (mix=0, cutoff=hardest):
    matched docs ranked easiest-reading-first by Dale-Chall; the
    readability table keys the corpus measure to the index docids."""
    from atire_spark.corpus import dalechall

    eng = _engine(spark, sf_dir)
    dc = dalechall(spark, sf_dir).select(
        F.concat(
            F.lit("conv"),
            F.lpad((F.col("doc_id") / 8).cast("long").cast("string"), 12, "0"),
        ).alias("conv_id"),
        (F.col("doc_id") % 8).cast("int").alias("turn_idx"),
        "dalechall",
    )
    readability = eng.index.docmap.join(dc, ["conv_id", "turn_idx"]).select(
        "docid", "dalechall"
    )
    return eng.search_readable(TESTDATA_QUERIES, readability, k=TOP_K)


def _readable_sql(k: int) -> str:
    """readable oracle: per matched (query, doc) rsv =
    (cutoff − dale/1000) with mix=0 (the BM25 blend term is zero);
    cutoff = max dale/1000 over the collection; rank rsv desc, docid
    desc; rsv rounded to 9 dp like the engine."""
    from atire_spark.corpus import dalechall_sql

    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
dc AS ({dalechall_sql()}),
rd AS (
  SELECT m.docid, CAST(dc.dalechall AS DOUBLE) AS dale
  FROM dc JOIN docmap m ON m.doc_id = dc.doc_id
),
hardest AS (SELECT CAST(CAST(max(dale) AS BIGINT) AS DOUBLE) / 1000.0 AS cutoff FROM rd),
cand AS (
  SELECT DISTINCT CAST(q.query_id AS BIGINT) AS query_id, t.docid
  FROM q JOIN tf t USING (term)
),
scored AS (
  SELECT c.query_id, c.docid,
         round((1.0 - 0.0) * (h.cutoff - rd.dale / 1000.0) + 0.0, 9) AS rsv
  FROM cand c JOIN rd ON rd.docid = c.docid CROSS JOIN hardest h
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv
  FROM scored
)
SELECT query_id, rank, docid, rsv FROM ranked WHERE rank <= {k}
"""


def _q_lmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _puurula_engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K, ranker="lmp")


def _q_lmptfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _puurula_engine(spark, sf_dir)
    return eng.search_batch(TESTDATA_QUERIES, k=TOP_K, ranker="lmptfidf")


def _lmp_sql(k: int) -> str:
    """LMP oracle (ranking_function_puurula.c:69-108): tf discounted
    by g·tf^g, ANT_logsum'd against 0 in the C branch order
    (maths.h:461-468), document prior ln(1 − ddl/(len+u)) on the
    first processed term (cf asc, term asc) scaled by the query
    length; ddl recomputed per doc exactly as the -Ilmp serialise
    does (×1000 trunc, 9-dp round to bridge sum order)."""
    tfp = (
        "greatest(CAST(t.tf AS DOUBLE)"
        " - 0.5 * pow(CAST(t.tf AS DOUBLE), 0.5), 0.0)"
    )
    inner = (
        f"(ln({tfp}) + ln(CAST(s.coll_len AS DOUBLE))"
        " - ln(1000.0 * CAST(ts.cf AS DOUBLE) + 1.0))"
    )
    rsv = (
        f"CASE WHEN {inner} > 0.0"
        f" THEN ln(exp(0.0 - {inner}) + 1.0) + {inner}"
        f" ELSE ln(exp({inner}) + 1.0) END"
    )
    prior = (
        "ln(1.0 - (CAST(pl.ddl AS DOUBLE) / 1000.0)"
        " / (CAST(d.doc_len AS DOUBLE) + 1000.0))"
    )
    return f"""
WITH RECURSIVE {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
qn AS (SELECT query_id, CAST(sum(weight) AS DOUBLE) AS n FROM q GROUP BY query_id),
pl AS (
  SELECT docid,
         CAST(floor(round(SUM(greatest(CAST(tf AS DOUBLE)
                - 0.5 * pow(CAST(tf AS DOUBLE), 0.5), 0.0)), 9)
              * 1000.0) AS BIGINT) AS ddl
  FROM tf GROUP BY docid
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CAST(q.weight AS BIGINT) AS weight,
         1 + CAST(trunc(({rsv}) * 100.0) AS BIGINT) AS unit,
         1 + CAST(trunc((({rsv}) + qn.n * ({prior})) * 100.0) AS BIGINT) AS unit_p,
         row_number() OVER (
           PARTITION BY q.query_id, t.docid ORDER BY ts.cf ASC, q.term ASC
         ) AS rn
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  JOIN pl ON pl.docid = t.docid
  CROSS JOIN stats s
  JOIN qn ON qn.query_id = q.query_id
),
occs_w3 AS (
  -- exact is_zero_rsv replay: the prior fires on EVERY occurrence
  -- that finds the accumulator at zero (lmds.c:110-115), and the
  -- candidate-entry rule tracks 0->nonzero transitions per occurrence
  SELECT query_id, docid, unit, unit_p,
         row_number() OVER (
           PARTITION BY query_id, docid ORDER BY rn, _o.occ
         ) AS seq
  FROM scored, unnest(range(1, CAST(weight AS BIGINT) + 1)) AS _o(occ)
),
cnt_w3 AS (
  SELECT query_id, docid, max(seq) AS n FROM occs_w3 GROUP BY 1, 2
),
walk_w3(query_id, docid, seq, acc16, nz) AS (
  SELECT query_id, docid, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0 FROM cnt_w3
  UNION ALL
  SELECT w.query_id, w.docid, w.seq + 1,
         ((w.acc16 + CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
           % 65536 + 65536) % 65536,
         CASE WHEN w.nz = 1
                OR ((CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
                    % 65536) <> 0
              THEN 1 ELSE 0 END
  FROM walk_w3 w
  JOIN occs_w3 o
    ON o.query_id = w.query_id AND o.docid = w.docid AND o.seq = w.seq + 1
),
acc AS (
  SELECT w.query_id AS query_id, w.docid AS docid,
         CAST(CASE WHEN w.acc16 >= 32768 THEN w.acc16 - 65536
                   ELSE w.acc16 END AS BIGINT) AS rsv_fixed
  FROM walk_w3 w
  JOIN cnt_w3 c
    ON c.query_id = w.query_id AND c.docid = w.docid AND w.seq = c.n
  WHERE w.nz = 1
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _lmptfidf_sql(k: int) -> str:
    """LMPTFIDF oracle (ranking_function_puurula_idf.c:88-133):
    tf reweighted to ln(1+tf/uniq)·ln(N/df), powerlaw-discounted with
    gg = 0.005 (the C powerlaw index really is (int)(g·1000),
    puurula_idf.c:45-48 / memory_index.c:1317); zero-score postings
    never touch the accumulator, the prior uses the tfidf length
    pair, and each occurrence's query weight is the transformed
    ln(1 + 1/|Q|)·ln(N/df) with the query length their sum
    (atire_api.c:942-951)."""
    tfp = "greatest(wv.w - 0.005 * pow(wv.w, 0.005), 0.0)"
    rsv = (
        "qf.qfv * ln(("
        f"{tfp} * ut.u) / 1000.0 + 1.0)"
    )
    prior = (
        "ln(1.0 - (CAST(tl.tddl AS DOUBLE) / 1000.0)"
        " / ((CAST(tl.tlen AS DOUBLE) / 1000.0) + 1000.0))"
    )
    return f"""
WITH RECURSIVE {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
qn AS (SELECT query_id, CAST(sum(weight) AS DOUBLE) AS n FROM q GROUP BY query_id),
ut AS (SELECT CAST(count(*) AS DOUBLE) AS u FROM termstats),
uq AS (SELECT docid, CAST(count(*) AS BIGINT) AS uniq FROM tf GROUP BY docid),
wv AS (
  SELECT t.docid, t.term,
         ln(1.0 + CAST(t.tf AS DOUBLE) / CAST(u2.uniq AS DOUBLE))
           * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE)) AS w
  FROM tf t
  JOIN uq u2 USING (docid)
  JOIN termstats ts ON ts.term = t.term
  CROSS JOIN stats s
),
tl AS (
  SELECT docid,
         CAST(floor(round(SUM(w), 9) * 1000.0) AS BIGINT) AS tlen,
         CAST(floor(round(SUM(greatest(w - 0.005 * pow(w, 0.005), 0.0)), 9)
              * 1000.0) AS BIGINT) AS tddl
  FROM wv GROUP BY docid
),
qf AS (
  SELECT q.query_id, q.term, q.weight,
         ln(1.0 + 1.0 / qn.n)
           * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE)) AS qfv
  FROM q JOIN qn USING (query_id)
  JOIN termstats ts USING (term)
  CROSS JOIN stats s
),
ql AS (SELECT query_id, SUM(CAST(weight AS DOUBLE) * qfv) AS n FROM qf GROUP BY query_id),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CAST(q.weight AS BIGINT) AS weight,
         1 + CAST(trunc(({rsv}) * 100.0) AS BIGINT) AS unit,
         1 + CAST(trunc((({rsv}) + ql.n * ({prior})) * 100.0) AS BIGINT) AS unit_p,
         row_number() OVER (
           PARTITION BY q.query_id, t.docid ORDER BY ts.cf ASC, q.term ASC
         ) AS rn
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN wv ON wv.docid = t.docid AND wv.term = t.term
  JOIN tl ON tl.docid = t.docid
  JOIN qf ON qf.query_id = q.query_id AND qf.term = q.term
  JOIN ql ON ql.query_id = q.query_id
  CROSS JOIN ut
  WHERE {tfp} != 0.0
),
occs_w4 AS (
  -- exact is_zero_rsv replay: the prior fires on EVERY occurrence
  -- that finds the accumulator at zero (lmds.c:110-115), and the
  -- candidate-entry rule tracks 0->nonzero transitions per occurrence
  SELECT query_id, docid, unit, unit_p,
         row_number() OVER (
           PARTITION BY query_id, docid ORDER BY rn, _o.occ
         ) AS seq
  FROM scored, unnest(range(1, CAST(weight AS BIGINT) + 1)) AS _o(occ)
),
cnt_w4 AS (
  SELECT query_id, docid, max(seq) AS n FROM occs_w4 GROUP BY 1, 2
),
walk_w4(query_id, docid, seq, acc16, nz) AS (
  SELECT query_id, docid, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0 FROM cnt_w4
  UNION ALL
  SELECT w.query_id, w.docid, w.seq + 1,
         ((w.acc16 + CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
           % 65536 + 65536) % 65536,
         CASE WHEN w.nz = 1
                OR ((CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
                    % 65536) <> 0
              THEN 1 ELSE 0 END
  FROM walk_w4 w
  JOIN occs_w4 o
    ON o.query_id = w.query_id AND o.docid = w.docid AND o.seq = w.seq + 1
),
acc AS (
  SELECT w.query_id AS query_id, w.docid AS docid,
         CAST(CASE WHEN w.acc16 >= 32768 THEN w.acc16 - 65536
                   ELSE w.acc16 END AS BIGINT) AS rsv_fixed
  FROM walk_w4 w
  JOIN cnt_w4 c
    ON c.query_id = w.query_id AND c.docid = w.docid AND w.seq = c.n
  WHERE w.nz = 1
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _bm25t_sql(k: int) -> str:
    """BM25T oracle (ranking_function_bm25t.c): per-term k1 solves
    g(k1) = mean ln(c'+1) with the secant method (maths.h:196-218),
    transcribed as a recursive CTE running the identical float64
    op sequence; the mean is rounded to 9 dp on both sides so float
    addition order cannot drift the solver input."""
    extra_cte = """,
tsum AS (
  SELECT t.term,
         round(SUM(ln(CAST(t.tf AS DOUBLE)
                      / (1.0 - 0.2 + 0.2 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                      + 1)) / CAST(MAX(ts.df) AS DOUBLE), 9) AS sn
  FROM (SELECT DISTINCT term FROM q) qt
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  JOIN termstats ts ON ts.term = t.term
  CROSS JOIN stats s
  GROUP BY t.term
),
sec AS (
  SELECT term, 0 AS iter, CAST(1.0 AS DOUBLE) AS x1, CAST(1.1 AS DOUBLE) AS x2,
         (1.0 - sn) * (1.0 - sn) AS f1, FALSE AS done, sn
  FROM tsum
  UNION ALL
  SELECT term, iter + 1,
         CASE WHEN stop1 THEN x1 ELSE x2 END,
         CASE WHEN stop1 THEN x2 ELSE x3 END,
         CASE WHEN stop1 THEN f1 ELSE f2 END,
         stop1 OR NOT (abs((x2 - x3) / x3) > 0.00001),
         sn
  FROM (
    SELECT term, iter, x1, x2, f1, sn, f2,
           (f2 * x1 - f1 * x2) / NULLIF(f2 - f1, 0) AS x3,
           (abs(f2 - f1) < 0.00001) AS stop1
    FROM (
      SELECT term, iter, x1, x2, f1, sn,
             ((CASE WHEN x2 = 1.0 THEN 1.0 ELSE (x2 / (x2 - 1.0)) * ln(x2) END) - sn)
             * ((CASE WHEN x2 = 1.0 THEN 1.0 ELSE (x2 / (x2 - 1.0)) * ln(x2) END) - sn) AS f2
      FROM sec WHERE NOT done AND iter < 200
    )
  )
),
k1t AS (
  SELECT term, x2 AS k1 FROM sec
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY iter DESC) = 1
)"""
    cp = (
        "(CAST(t.tf AS DOUBLE)"
        " / (1.0 - 0.2 + 0.2 * (CAST(d.doc_len AS DOUBLE) / s.mean_len)))"
    )
    contrib = (
        "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
        f"((kt.k1 + 1.0) * {cp}) / (kt.k1 + {cp})"
        " * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))"
        ") * 100.0) AS BIGINT))"
    )
    return _ranker_sql(
        contrib,
        k,
        extra_cte=extra_cte,
        extra_join="JOIN k1t kt ON kt.term = q.term",
        recursive=True,
    )


def _bm25adpt_sql(k: int) -> str:
    """BM25-adpt oracle (ranking_function_bm25adpt.c): round(c')
    histogram → suffix-cumulated counts (with counts[0]=N and
    counts[1]=df pinned) → information-gain curve with the
    first-non-monotone-past-3 truncation and forced IG[254]=-1 →
    jump-halving range search (c:47-90) as a recursive CTE; the
    squared-distance objective is rounded to 9 dp on both sides.
    IG[1] doubles as the term's idf in the scoring expression."""
    extra_cte = """,
qt AS (SELECT DISTINCT q.term, ts.df FROM q JOIN termstats ts USING (term)),
cvals AS (
  SELECT t.term,
         CAST(floor(CAST(t.tf AS DOUBLE)
              / (1.0 - 0.3 + 0.3 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
              + 0.5) AS BIGINT) AS idx
  FROM qt JOIN tf t USING (term) JOIN docmap d USING (docid) CROSS JOIN stats s
),
hist AS (
  SELECT term, idx, CAST(count(*) AS DOUBLE) AS cnt
  FROM cvals WHERE idx < 256 GROUP BY term, idx
),
grid AS (
  SELECT qt.term, qt.df, gs.idx
  FROM qt CROSS JOIN (SELECT unnest(range(0, 256)) AS idx) gs
),
counts AS (
  SELECT g.term, g.df, g.idx,
    CASE WHEN g.idx = 0 THEN CAST(s.n_docs AS DOUBLE)
         WHEN g.idx = 1 THEN CAST(g.df AS DOUBLE)
         ELSE SUM(COALESCE(h.cnt, 0)) OVER (PARTITION BY g.term ORDER BY g.idx DESC)
    END AS c
  FROM grid g
  LEFT JOIN hist h ON h.term = g.term AND h.idx = g.idx
  CROSS JOIN stats s
),
ig0 AS (
  SELECT c1.term, c1.idx,
    (-(ln((CAST(c1.df AS DOUBLE) + 0.5) / (CAST(s.n_docs AS DOUBLE) + 1.0)) / ln(2.0))
     + ln((c2.c + 0.5) / (c1.c + 1.0)) / ln(2.0)) AS ig
  FROM counts c1
  JOIN counts c2 ON c2.term = c1.term AND c2.idx = c1.idx + 1
  CROSS JOIN stats s
  WHERE c1.idx <= 254
  UNION ALL
  SELECT term, 255, 0.0 FROM qt
),
kills AS (
  SELECT a.term, MIN(a.idx) + 1 AS kidx
  FROM ig0 a JOIN ig0 b ON b.term = a.term AND b.idx = a.idx + 1
  WHERE a.idx BETWEEN 3 AND 254 AND a.ig > b.ig
  GROUP BY a.term
),
ig2 AS (
  SELECT i.term, i.idx,
         CASE WHEN i.idx = k.kidx OR i.idx = 254 THEN -1.0 ELSE i.ig END AS ig
  FROM ig0 i LEFT JOIN kills k ON k.term = i.term
  WHERE i.idx <= 254
),
stopx AS (SELECT term, MIN(idx) AS sidx FROM ig2 WHERE ig < 0 GROUP BY term),
live AS (
  SELECT g.term, CAST(g.idx AS DOUBLE) AS i, g.ig
  FROM ig2 g JOIN stopx USING (term) WHERE g.idx < sidx
),
igone AS (SELECT term, ig AS v FROM ig0 WHERE idx = 1),
rs AS (
  SELECT term, 0 AS iter, CAST(0.001 AS DOUBLE) AS wh, CAST(1.0 AS DOUBLE) AS jump,
         CAST('infinity' AS DOUBLE) AS best, FALSE AS done
  FROM qt
  UNION ALL
  SELECT term, iter + 1,
    CASE WHEN brk THEN wh
         WHEN s > best AND n > s THEN wh
         WHEN s > best THEN wh + hj
         ELSE wh + jump END,
    nj,
    CASE WHEN brk THEN best
         WHEN s > best AND n > s THEN best
         WHEN s > best THEN n
         ELSE s END,
    brk OR NOT (abs(nj) > 0.001)
    FROM (
      SELECT term, iter, wh, jump, best, brk, hj, s, n,
        CASE WHEN brk THEN jump
             WHEN s > best AND n > s THEN -hj
             WHEN s > best THEN hj
             ELSE jump END AS nj
      FROM (
        SELECT t1.*,
          (SELECT round(SUM((l.ig / g1.v - (((t1.wh + t1.hj) + 1.0) * l.i) / ((t1.wh + t1.hj) + l.i))
                          * (l.ig / g1.v - (((t1.wh + t1.hj) + 1.0) * l.i) / ((t1.wh + t1.hj) + l.i))), 9)
           FROM live l JOIN igone g1 ON g1.term = l.term
           WHERE l.term = t1.term) AS n
        FROM (
          SELECT r.term, r.iter, r.wh, r.jump, r.best,
            (r.wh > abs(r.jump) + 10.0) AS brk,
            CASE WHEN r.wh + (r.jump / 2.0) < 0 THEN -(r.jump / 2.0) ELSE (r.jump / 2.0) END AS hj,
            (SELECT round(SUM((l.ig / g1.v - ((r.wh + 1.0) * l.i) / (r.wh + l.i))
                            * (l.ig / g1.v - ((r.wh + 1.0) * l.i) / (r.wh + l.i))), 9)
             FROM live l JOIN igone g1 ON g1.term = l.term
             WHERE l.term = r.term) AS s
          FROM rs r WHERE NOT r.done AND r.iter < 200
        ) t1
      )
    )
),
k1a AS (
  SELECT term, wh AS k1 FROM rs
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY iter DESC) = 1
)"""
    cp = (
        "(CAST(t.tf AS DOUBLE)"
        " / (1.0 - 0.3 + 0.3 * (CAST(d.doc_len AS DOUBLE) / s.mean_len)))"
    )
    contrib = (
        "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
        f"((ka.k1 + 1.0) * {cp}) / (ka.k1 + {cp}) * g1.v"
        ") * 100.0) AS BIGINT))"
    )
    return _ranker_sql(
        contrib,
        k,
        extra_cte=extra_cte,
        extra_join=(
            "JOIN k1a ka ON ka.term = q.term"
            " JOIN igone g1 ON g1.term = q.term"
        ),
        recursive=True,
    )


def _q_topsig_sig_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.topsig import signature_stats

    return signature_stats(_topsig_sigs(spark, sf_dir))


def _q_topsig_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.topsig import search_topsig

    eng = _engine(spark, sf_dir)
    return search_topsig(
        spark,
        _topsig_sigs(spark, sf_dir),
        eng.index,
        TESTDATA_QUERIES,
        k=TOP_K,
        width=TOPSIG_W,
        density=TOPSIG_D,
    )


TOPSIG_FB_DOCS = 5


def _q_topsig_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    from atire_spark.topsig import search_topsig_feedback

    eng = _engine(spark, sf_dir)
    return search_topsig_feedback(
        spark,
        _topsig_sigs(spark, sf_dir),
        eng.index,
        TESTDATA_QUERIES,
        k=TOP_K,
        feedback_docs=TOPSIG_FB_DOCS,
        width=TOPSIG_W,
        density=TOPSIG_D,
    )


# ---------------------------------------------------------------------------
# TopSig oracle: the signature construction transcribed to SQL.
# splitmix64 runs on UBIGINT with every multiply/add widened to
# UHUGEINT and wrapped mod 2^64 (DuckDB integer arithmetic is
# overflow-checked, and mixed UHUGEINT+INTEGER ops promote through
# DOUBLE — every operand is cast explicitly).
_U64_MOD = "CAST(18446744073709551616 AS UHUGEINT)"


def _splitmix_sql(prefix: str, src: str, keys: str, seed_expr: str) -> str:
    """Chained CTEs ``{prefix}0..{prefix}4`` carrying ``keys`` and the
    mixed hash ``h`` (exact splitmix64 of ``seed_expr``)."""
    return f"""
{prefix}0 AS (SELECT {keys}, CAST(({seed_expr}) % {_U64_MOD} AS UBIGINT) AS z FROM {src}),
{prefix}1 AS (SELECT {keys}, CAST((CAST(z AS UHUGEINT) + CAST(11400714819323198485 AS UHUGEINT)) % {_U64_MOD} AS UBIGINT) AS z FROM {prefix}0),
{prefix}2 AS (SELECT {keys}, CAST((CAST(xor(z, z >> 30) AS UHUGEINT) * CAST(13787848793156543929 AS UHUGEINT)) % {_U64_MOD} AS UBIGINT) AS z FROM {prefix}1),
{prefix}3 AS (SELECT {keys}, CAST((CAST(xor(z, z >> 27) AS UHUGEINT) * CAST(10723151780598845931 AS UHUGEINT)) % {_U64_MOD} AS UBIGINT) AS z FROM {prefix}2),
{prefix}4 AS (SELECT {keys}, xor(z, z >> 31) AS h FROM {prefix}3)"""


def _topsig_cte(width: int, density: float, with_query: bool) -> str:
    """CTE chain ending in ``sig(docid, bit, bit_set)`` (and, with
    ``with_query``, ``qvec(query_id, pos, qv)``) — the exact integer
    arithmetic of kernels/topsig.py."""
    num_positive = int(width * (density / 200.0))
    w_expr = (
        "CAST(t.occurrences AS DOUBLE) * ln("
        "(CAST(t.occurrences AS DOUBLE) / CAST(d.doc_len AS DOUBLE))"
        " * (CAST(s.coll_len AS DOUBLE) / CAST(ts.cf AS DOUBLE)))"
    )
    vocab_src = (
        "(SELECT term FROM termstats UNION SELECT DISTINCT term FROM q) v"
        if with_query
        else "(SELECT term FROM termstats) v"
    )
    sql = f"""
tsw AS (
  SELECT t.docid, t.term,
         CAST(floor(1000.0 * ({w_expr}) + 0.5) AS BIGINT) AS wq
  FROM tf t
  JOIN docmap d USING (docid)
  JOIN termstats ts USING (term)
  CROSS JOIN stats s
  WHERE {w_expr} >= 2.718281828459045
),
draws AS (SELECT unnest(generate_series(0, {2 * num_positive - 1})) AS j),
tpj AS (SELECT v.term, dr.j FROM {vocab_src} CROSS JOIN draws dr),
{_splitmix_sql("tp", "tpj", "term, j", "CAST(md5_number_lower(term) AS UHUGEINT) + CAST(j AS UHUGEINT)")},
tpos AS (
  SELECT term, CAST(h % {width} AS INTEGER) AS pos,
         CASE WHEN j % 2 = 0 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END AS sgn
  FROM tp4
),
vec AS (
  SELECT w.docid, p.pos, CAST(sum(p.sgn * w.wq) AS BIGINT) AS v
  FROM tsw w JOIN tpos p USING (term)
  GROUP BY w.docid, p.pos
),
grid AS (
  SELECT d.docid, b.bit
  FROM docmap d
  CROSS JOIN (SELECT unnest(generate_series(0, {width - 1})) AS bit) b
),
{_splitmix_sql("fl", "grid", "docid, bit", "CAST(md5_number_lower('doc:' || CAST(docid AS VARCHAR)) AS UHUGEINT) + CAST(bit AS UHUGEINT)")},
fill AS (SELECT docid, bit, CAST(h & 1 AS INTEGER) AS f FROM fl4),
sig AS (
  SELECT g.docid, g.bit,
         CASE WHEN coalesce(v.v, 0) > 0 THEN 1
              WHEN coalesce(v.v, 0) = 0 THEN f.f
              ELSE 0 END AS bit_set
  FROM grid g
  LEFT JOIN vec v ON v.docid = g.docid AND v.pos = g.bit
  JOIN fill f ON f.docid = g.docid AND f.bit = g.bit
)"""
    if with_query:
        sql += f""",
qw AS (
  SELECT q.query_id,
         q.term,
         CAST(floor(1000.0 * ln(CAST(s.coll_len AS DOUBLE)
                 / CAST(coalesce(ts.cf, 1) AS DOUBLE)) + 0.5) AS BIGINT)
           * CAST(q.weight AS BIGINT) AS wq
  FROM q
  LEFT JOIN termstats ts USING (term)
  CROSS JOIN stats s
  WHERE ln(CAST(s.coll_len AS DOUBLE) / CAST(coalesce(ts.cf, 1) AS DOUBLE))
        >= 2.718281828459045
),
qvec AS (
  SELECT w.query_id, p.pos, CAST(sum(p.sgn * w.wq) AS BIGINT) AS qv
  FROM qw w JOIN tpos p USING (term)
  GROUP BY w.query_id, p.pos
)"""
    return sql


def _topsig_stats_sql(width: int, density: float) -> str:
    return f"""
WITH {_CORPUS_CTE},
{_topsig_cte(width, density, with_query=False)}
SELECT docid, CAST(sum(bit_set) AS BIGINT) AS bits_set
FROM sig GROUP BY docid
"""


def _topsig_topk_sql(width: int, density: float, k: int) -> str:
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
{_topsig_cte(width, density, with_query=True)},
score AS (
  SELECT v.query_id, s.docid, CAST(count(*) AS BIGINT) AS rsv_fixed
  FROM qvec v
  JOIN sig s ON s.bit = v.pos
  WHERE v.qv <> 0
    AND ((v.qv > 0 AND s.bit_set = 1) OR (v.qv < 0 AND s.bit_set = 0))
  GROUP BY v.query_id, s.docid
),
ranked AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM score
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) AS rsv
FROM ranked WHERE rank <= {k}
"""


def _topsig_feedback_sql(
    width: int, density: float, k: int, fb_docs: int
) -> str:
    """atire_api.c:1606-1650: pass-1 top-fb_docs results' signature
    bits sum into the feedback vector (only + increments →
    positive-ranker-only re-query); pass-2 rsv = count of set bits
    shared with any fed-back document."""
    return f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
{_topsig_cte(width, density, with_query=True)},
score1 AS (
  SELECT v.query_id, s.docid, CAST(count(*) AS BIGINT) AS rsv_fixed
  FROM qvec v
  JOIN sig s ON s.bit = v.pos
  WHERE v.qv <> 0
    AND ((v.qv > 0 AND s.bit_set = 1) OR (v.qv < 0 AND s.bit_set = 0))
  GROUP BY v.query_id, s.docid
),
ranked1 AS (
  SELECT query_id, docid,
         row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS rank
  FROM score1
),
fb AS (
  SELECT r.query_id, s.bit
  FROM ranked1 r JOIN sig s ON s.docid = r.docid
  WHERE r.rank <= {fb_docs} AND s.bit_set = 1
  GROUP BY r.query_id, s.bit
),
score2 AS (
  SELECT f.query_id, s.docid, CAST(count(*) AS BIGINT) AS rsv_fixed
  FROM fb f JOIN sig s ON s.bit = f.bit
  WHERE s.bit_set = 1
  GROUP BY f.query_id, s.docid
),
ranked2 AS (
  SELECT CAST(query_id AS BIGINT) AS query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM score2
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) AS rsv
FROM ranked2 WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# suite composition: the driver records a bounded window of registry
# entries (r2 recorded exactly the first 50), so single-operator
# variants with a shared result schema are merged into parameterized
# suite entries — each member keeps its own engine path and its own
# SQL oracle, tagged by a discriminator column, so one green driver
# row certifies every member (the hash covers the tag column).
def _suite_fn(members: list[tuple], col: str):
    """Engine side of a suite entry: union the member DataFrames with
    a literal discriminator column ``col`` prepended."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = None
        for tag, q in members:
            d = q(spark, sf_dir).select(F.lit(tag).alias(col), "*")
            out = d if out is None else out.unionByName(d)
        return out

    return fn


def _suite_sql(members: list[tuple], col: str) -> str:
    """Oracle side: UNION ALL of the member oracles, each wrapped as a
    subquery (DuckDB accepts full WITH/WITH RECURSIVE statements in a
    derived table) with the same discriminator literal."""
    parts = []
    for tag, sql in members:
        lit = str(tag) if isinstance(tag, int) else f"'{tag}'"
        parts.append(f"SELECT {lit} AS {col}, sub.* FROM (\n{sql}\n) sub")
    return "\nUNION ALL\n".join(parts)


# ranker suites: every member shares the (query_id, rank, docid,
# rsv_fixed, rsv) schema; the suite tag is the reference factory name
_RANKER_SUITE_MEMBERS: dict[str, list[str]] = {
    "rankers_tf_topk": ["termcount", "inner_product", "docid_asc", "docid_desc"],
    "rankers_lm_topk": ["lmd", "lmds", "lmjm"],
    "rankers_puurula_topk": ["lmp", "lmptfidf"],
    "rankers_bm25_family_topk": ["bm25l", "bm25plus", "bm25t", "bm25adpt"],
    "rankers_divergence_topk": [
        "dph",
        "dlh13",
        "bose_gl2",
        "divergence_ineb2",
        "dfree",
    ],
    "rankers_dfi_topk": [
        "dfi",
        "dfi_idf",
        "dfiw",
        "dfiw_idf",
        "tflodop",
        "kbtfidf",
    ],
}


def _q_snippets_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four untagged-corpus snippet algorithms
    (snippet_factory.c:19-46) in one entry, normalized to
    (method, doc_id, start, score, snippet); beginning/kl_cloud have
    no window so start/score take 0 sentinels."""
    zl = F.lit(0).cast("long").alias("start")
    zd = F.lit(0.0).alias("score")
    b = _q_snippet_beginning(spark, sf_dir).select(
        F.lit("beginning").alias("method"), "doc_id", zl, zd, "snippet"
    )
    wtf = _q_snippet_window_tf(spark, sf_dir).select(
        F.lit("window_tf").alias("method"),
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("score").cast("double").alias("score"),
        "snippet",
    )
    wtficf = _q_snippet_window_tficf(spark, sf_dir).select(
        F.lit("window_tficf").alias("method"),
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("score").cast("double").alias("score"),
        "snippet",
    )
    cloud = _q_snippet_kl_cloud(spark, sf_dir).select(
        F.lit("kl_cloud").alias("method"),
        "doc_id",
        zl,
        zd,
        F.col("cloud").alias("snippet"),
    )
    title = _q_snippet_title(spark, sf_dir).select(
        F.lit("title_tag").alias("method"), "doc_id", zl, zd, "snippet"
    )
    bt = _q_snippet_best_tag(True)(spark, sf_dir).select(
        F.lit("best_tag_tficf").alias("method"),
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("score").cast("double").alias("score"),
        "snippet",
    )
    bttf = _q_snippet_best_tag(False)(spark, sf_dir).select(
        F.lit("best_tag_tf").alias("method"),
        "doc_id",
        F.col("start").cast("long").alias("start"),
        F.col("score").cast("double").alias("score"),
        "snippet",
    )
    return (
        b.unionByName(wtf)
        .unionByName(wtficf)
        .unionByName(cloud)
        .unionByName(title)
        .unionByName(bt)
        .unionByName(bttf)
    )


def _snippets_suite_sql(parts: dict[str, str]) -> str:
    wrap = []
    for tag, key, snip_col, has_win in [
        ("beginning", "snippet_beginning", "snippet", False),
        ("window_tf", "snippet_window_tf", "snippet", True),
        ("window_tficf", "snippet_window_tficf", "snippet", True),
        ("kl_cloud", "snippet_kl_cloud", "cloud", False),
        ("title_tag", "snippet_title", "snippet", False),
        ("best_tag_tficf", "snippet_best_tag_tficf", "snippet", True),
        ("best_tag_tf", "snippet_best_tag_tf", "snippet", True),
    ]:
        start = 'CAST("start" AS BIGINT)' if has_win else "CAST(0 AS BIGINT)"
        score = "CAST(score AS DOUBLE)" if has_win else "CAST(0.0 AS DOUBLE)"
        wrap.append(
            f"SELECT '{tag}' AS method, doc_id, {start} AS start,"
            f" {score} AS score, {snip_col} AS snippet FROM (\n"
            f"{parts[key]}\n) sub"
        )
    return "\nUNION ALL\n".join(wrap)


def _q_eval_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eval_metrics + intent-aware MAP in one long-format entry
    (query_id, metric, value)."""
    m = _q_eval_metrics(spark, sf_dir).selectExpr(
        "CAST(query_id AS STRING) AS query_id",
        "stack(5,"
        " 'average_precision', average_precision,"
        " 'precision_at_10', precision_at_10,"
        " 'success_at_10', success_at_10,"
        " 'bpref', bpref,"
        " 'rank_effectiveness', rank_effectiveness) AS (metric, value)",
    )
    ia = _q_eval_intent_aware(spark, sf_dir).select(
        F.col("query_id").cast("string").alias("query_id"),
        F.lit("ia_average_precision").alias("metric"),
        F.col("ia_average_precision").cast("double").alias("value"),
    )
    return m.unionByName(ia)


def _eval_suite_sql(metrics_sql: str, ia_sql: str) -> str:
    return f"""
SELECT CAST(query_id AS VARCHAR) AS query_id, metric,
       CAST(value AS DOUBLE) AS value
FROM ({metrics_sql})
UNPIVOT (value FOR metric IN (average_precision, precision_at_10,
                              success_at_10, bpref, rank_effectiveness))
UNION ALL
SELECT CAST(query_id AS VARCHAR) AS query_id,
       'ia_average_precision' AS metric,
       CAST(ia_average_precision AS DOUBLE) AS value
FROM ({ia_sql}) sub
"""


# ---------------------------------------------------------------------------
# stemmer suite entry: every factory stemmer applied through the
# distributed build-side kernel (stem_unique over Arrow batches, the
# same code path tokenize_stage runs) to a fixed probe vocabulary.
# The oracle is a FROZEN LITERAL table: the paice_husk/otago/otago_v2
# rows were verified against the compiled reference C
# (stem_paice_husk.c, stem_otago.c, stem_otago_v2.c — see
# tests/test_stem.py, 6,091/6,091-word sweep), the s/porter rows
# against the hand-derived rule tables already certified there.
STEM_SUITE_WORDS = [
    'queries',
    'tables',
    'running',
    'happiness',
    'connection',
    'maximum',
    'nationally',
    'classified',
    'kilometres',
    'splitting',
    'realization',
    'organizations',
    'troubles',
    'computes',
    'magnetic',
    'specialized',
    'ponies',
    'caresses',
    'motoring',
    'generalization',
    'ab',
    'up',
    '12345',
]

# (stemmer, word) -> expected index-side stem; the three new
# stemmers' rows verified against the compiled reference C
_STEM_SUITE_EXPECTED = [
    ('s', 'queries', 'query'),
    ('s', 'tables', 'tabl'),
    ('s', 'running', 'running'),
    ('s', 'happiness', 'happines'),
    ('s', 'connection', 'connection'),
    ('s', 'maximum', 'maximum'),
    ('s', 'nationally', 'nationally'),
    ('s', 'classified', 'classified'),
    ('s', 'kilometres', 'kilometr'),
    ('s', 'splitting', 'splitting'),
    ('s', 'realization', 'realization'),
    ('s', 'organizations', 'organization'),
    ('s', 'troubles', 'troubl'),
    ('s', 'computes', 'comput'),
    ('s', 'magnetic', 'magnetic'),
    ('s', 'specialized', 'specialized'),
    ('s', 'ponies', 'pony'),
    ('s', 'caresses', 'caress'),
    ('s', 'motoring', 'motoring'),
    ('s', 'generalization', 'generalization'),
    ('s', 'ab', 'ab'),
    ('s', 'up', 'up'),
    ('s', '12345', '12345'),
    ('porter', 'queries', 'queri'),
    ('porter', 'tables', 'tabl'),
    ('porter', 'running', 'run'),
    ('porter', 'happiness', 'happi'),
    ('porter', 'connection', 'connect'),
    ('porter', 'maximum', 'maximum'),
    ('porter', 'nationally', 'nation'),
    ('porter', 'classified', 'classifi'),
    ('porter', 'kilometres', 'kilometr'),
    ('porter', 'splitting', 'split'),
    ('porter', 'realization', 'realiz'),
    ('porter', 'organizations', 'organ'),
    ('porter', 'troubles', 'troubl'),
    ('porter', 'computes', 'comput'),
    ('porter', 'magnetic', 'magnet'),
    ('porter', 'specialized', 'special'),
    ('porter', 'ponies', 'poni'),
    ('porter', 'caresses', 'caress'),
    ('porter', 'motoring', 'motor'),
    ('porter', 'generalization', 'gener'),
    ('porter', 'ab', 'ab'),
    ('porter', 'up', 'up'),
    ('porter', '12345', '12345'),
    ('paice_husk', 'queries', 'query'),
    ('paice_husk', 'tables', 'tabl'),
    ('paice_husk', 'running', 'runn'),
    ('paice_husk', 'happiness', 'happy'),
    ('paice_husk', 'connection', 'connect'),
    ('paice_husk', 'maximum', 'maxim'),
    ('paice_husk', 'nationally', 'nation'),
    ('paice_husk', 'classified', 'class'),
    ('paice_husk', 'kilometres', 'kilomet'),
    ('paice_husk', 'splitting', 'split'),
    ('paice_husk', 'realization', 'real'),
    ('paice_husk', 'organizations', 'org'),
    ('paice_husk', 'troubles', 'troubl'),
    ('paice_husk', 'computes', 'comput'),
    ('paice_husk', 'magnetic', 'magnet'),
    ('paice_husk', 'specialized', 'spec'),
    ('paice_husk', 'ponies', 'pony'),
    ('paice_husk', 'caresses', 'caress'),
    ('paice_husk', 'motoring', 'motor'),
    ('paice_husk', 'generalization', 'gener'),
    ('paice_husk', 'ab', 'ab'),
    ('paice_husk', 'up', 'up'),
    ('paice_husk', '12345', '12345'),
    ('otago', 'queries', 'querie'),
    ('otago', 'tables', 'table'),
    ('otago', 'running', 'running'),
    ('otago', 'happiness', 'happines'),
    ('otago', 'connection', 'connection'),
    ('otago', 'maximum', 'maximum'),
    ('otago', 'nationally', 'nationally'),
    ('otago', 'classified', 'classified'),
    ('otago', 'kilometres', 'kilometr'),
    ('otago', 'splitting', 'splitting'),
    ('otago', 'realization', 'realization'),
    ('otago', 'organizations', 'organization'),
    ('otago', 'troubles', 'trouble'),
    ('otago', 'computes', 'comput'),
    ('otago', 'magnetic', 'magnet'),
    ('otago', 'specialized', 'specialized'),
    ('otago', 'ponies', 'ponie'),
    ('otago', 'caresses', 'caress'),
    ('otago', 'motoring', 'motoring'),
    ('otago', 'generalization', 'generalization'),
    ('otago', 'ab', 'ab'),
    ('otago', 'up', 'up'),
    ('otago', '12345', '12345'),
    ('otago_v2', 'queries', 'querie'),
    ('otago_v2', 'tables', 'table'),
    ('otago_v2', 'running', 'running'),
    ('otago_v2', 'happiness', 'happin'),
    ('otago_v2', 'connection', 'connectio'),
    ('otago_v2', 'maximum', 'maximum'),
    ('otago_v2', 'nationally', 'nationalli'),
    ('otago_v2', 'classified', 'classified'),
    ('otago_v2', 'kilometres', 'kilometr'),
    ('otago_v2', 'splitting', 'splitting'),
    ('otago_v2', 'realization', 'realizatio'),
    ('otago_v2', 'organizations', 'organizatio'),
    ('otago_v2', 'troubles', 'trouble'),
    ('otago_v2', 'computes', 'comput'),
    ('otago_v2', 'magnetic', 'magneti'),
    ('otago_v2', 'specialized', 'specialized'),
    ('otago_v2', 'ponies', 'ponie'),
    ('otago_v2', 'caresses', 'caress'),
    ('otago_v2', 'motoring', 'motoring'),
    ('otago_v2', 'generalization', 'generalizatio'),
    ('otago_v2', 'ab', 'ab'),
    ('otago_v2', 'up', 'up'),
    ('otago_v2', '12345', '12345'),
    # phonetic matchers (stemmer_factory.c:62-63): soundex is the
    # 4-char ATIRE variant (phonetic_soundex.h), double_metaphone the
    # lowercased primary key (phonetic_double_metaphone.h:47); rows
    # verified against the compiled reference C (5,347-word sweep,
    # see tests/test_phonetic.py)
    ('soundex', 'queries', 'q620'),
    ('soundex', 'tables', 't142'),
    ('soundex', 'running', 'r552'),
    ('soundex', 'happiness', 'h152'),
    ('soundex', 'connection', 'c523'),
    ('soundex', 'maximum', 'm255'),
    ('soundex', 'nationally', 'n354'),
    ('soundex', 'classified', 'c421'),
    ('soundex', 'kilometres', 'k453'),
    ('soundex', 'splitting', 's143'),
    ('soundex', 'realization', 'r423'),
    ('soundex', 'organizations', 'o625'),
    ('soundex', 'troubles', 't614'),
    ('soundex', 'computes', 'c513'),
    ('soundex', 'magnetic', 'm253'),
    ('soundex', 'specialized', 's124'),
    ('soundex', 'ponies', 'p520'),
    ('soundex', 'caresses', 'c622'),
    ('soundex', 'motoring', 'm365'),
    ('soundex', 'generalization', 'g564'),
    ('soundex', 'ab', 'ab'),
    ('soundex', 'up', 'up'),
    ('soundex', '12345', '12345'),
    ('double_metaphone', 'queries', 'krs'),
    ('double_metaphone', 'tables', 'tpls'),
    ('double_metaphone', 'running', 'rnnk'),
    ('double_metaphone', 'happiness', 'hpns'),
    ('double_metaphone', 'connection', 'knkx'),
    ('double_metaphone', 'maximum', 'mksm'),
    ('double_metaphone', 'nationally', 'nxnl'),
    ('double_metaphone', 'classified', 'klsf'),
    ('double_metaphone', 'kilometres', 'klmt'),
    ('double_metaphone', 'splitting', 'splt'),
    ('double_metaphone', 'realization', 'rlsx'),
    ('double_metaphone', 'organizations', 'arkn'),
    ('double_metaphone', 'troubles', 'trpl'),
    ('double_metaphone', 'computes', 'kmpt'),
    ('double_metaphone', 'magnetic', 'mntk'),
    ('double_metaphone', 'specialized', 'spsl'),
    ('double_metaphone', 'ponies', 'pns'),
    ('double_metaphone', 'caresses', 'krss'),
    ('double_metaphone', 'motoring', 'mtrn'),
    ('double_metaphone', 'generalization', 'jnrl'),
    ('double_metaphone', 'ab', 'ab'),
    ('double_metaphone', 'up', 'up'),
    ('double_metaphone', '12345', '12345'),
    # Snowball English / Porter2 (stemmer_factory.c:44 via
    # libstemmer): rows verified against the compiled libstemmer
    # shipped in the reference tree (11,117-word sweep, see
    # tests/test_snowball.py)
    ('snowball_english', 'queries', 'queri'),
    ('snowball_english', 'tables', 'tabl'),
    ('snowball_english', 'running', 'run'),
    ('snowball_english', 'happiness', 'happi'),
    ('snowball_english', 'connection', 'connect'),
    ('snowball_english', 'maximum', 'maximum'),
    ('snowball_english', 'nationally', 'nation'),
    ('snowball_english', 'classified', 'classifi'),
    ('snowball_english', 'kilometres', 'kilometr'),
    ('snowball_english', 'splitting', 'split'),
    ('snowball_english', 'realization', 'realiz'),
    ('snowball_english', 'organizations', 'organ'),
    ('snowball_english', 'troubles', 'troubl'),
    ('snowball_english', 'computes', 'comput'),
    ('snowball_english', 'magnetic', 'magnet'),
    ('snowball_english', 'specialized', 'special'),
    ('snowball_english', 'ponies', 'poni'),
    ('snowball_english', 'caresses', 'caress'),
    ('snowball_english', 'motoring', 'motor'),
    ('snowball_english', 'generalization', 'general'),
    ('snowball_english', 'ab', 'ab'),
    ('snowball_english', 'up', 'up'),
    ('snowball_english', '12345', '12345'),
    # Snowball Lovins (stemmer_factory.c:53 via libstemmer): rows
    # verified against the compiled libstemmer lovins (62,809-word
    # sweep, 0 mismatches — tests/test_lovins.py)
    ('snowball_lovins', 'queries', 'quer'),
    ('snowball_lovins', 'tables', 'tabl'),
    ('snowball_lovins', 'running', 'run'),
    ('snowball_lovins', 'happiness', 'hap'),
    ('snowball_lovins', 'connection', 'connect'),
    ('snowball_lovins', 'maximum', 'maxim'),
    ('snowball_lovins', 'nationally', 'nat'),
    ('snowball_lovins', 'classified', 'classif'),
    ('snowball_lovins', 'kilometres', 'kilometer'),
    ('snowball_lovins', 'splitting', 'split'),
    ('snowball_lovins', 'realization', 'real'),
    ('snowball_lovins', 'organizations', 'organ'),
    ('snowball_lovins', 'troubles', 'troubl'),
    ('snowball_lovins', 'computes', 'comput'),
    ('snowball_lovins', 'magnetic', 'magnet'),
    ('snowball_lovins', 'specialized', 'special'),
    ('snowball_lovins', 'ponies', 'pon'),
    ('snowball_lovins', 'caresses', 'cares'),
    ('snowball_lovins', 'motoring', 'motor'),
    ('snowball_lovins', 'generalization', 'general'),
    ('snowball_lovins', 'ab', 'ab'),
    ('snowball_lovins', 'up', 'up'),
    ('snowball_lovins', '12345', '12345'),
    # Krovetz / kstem (stemmer_factory.c:36): rows verified against
    # the compiled reference stem_krovetz.c (56,758-word sweep, 0
    # mismatches — tests/test_kstem.py)
    ('krovetz', 'queries', 'query'),
    ('krovetz', 'tables', 'table'),
    ('krovetz', 'running', 'run'),
    ('krovetz', 'happiness', 'happy'),
    ('krovetz', 'connection', 'connect'),
    ('krovetz', 'maximum', 'maximum'),
    ('krovetz', 'nationally', 'national'),
    ('krovetz', 'classified', 'classify'),
    ('krovetz', 'kilometres', 'kilometre'),
    ('krovetz', 'splitting', 'split'),
    ('krovetz', 'realization', 'realize'),
    ('krovetz', 'organizations', 'organize'),
    ('krovetz', 'troubles', 'trouble'),
    ('krovetz', 'computes', 'compute'),
    ('krovetz', 'magnetic', 'magnetic'),
    ('krovetz', 'specialized', 'specialize'),
    ('krovetz', 'ponies', 'pony'),
    ('krovetz', 'caresses', 'caress'),
    ('krovetz', 'motoring', 'motor'),
    ('krovetz', 'generalization', 'general'),
    ('krovetz', 'ab', 'ab'),
    ('krovetz', 'up', 'up'),
    ('krovetz', '12345', '12345'),
    ('snowball_porter', 'queries', 'queri'),
    ('snowball_porter', 'tables', 'tabl'),
    ('snowball_porter', 'running', 'run'),
    ('snowball_porter', 'happiness', 'happi'),
    ('snowball_porter', 'connection', 'connect'),
    ('snowball_porter', 'maximum', 'maximum'),
    ('snowball_porter', 'nationally', 'nation'),
    ('snowball_porter', 'classified', 'classifi'),
    ('snowball_porter', 'kilometres', 'kilometr'),
    ('snowball_porter', 'splitting', 'split'),
    ('snowball_porter', 'realization', 'realiz'),
    ('snowball_porter', 'organizations', 'organ'),
    ('snowball_porter', 'troubles', 'troubl'),
    ('snowball_porter', 'computes', 'comput'),
    ('snowball_porter', 'magnetic', 'magnet'),
    ('snowball_porter', 'specialized', 'special'),
    ('snowball_porter', 'ponies', 'poni'),
    ('snowball_porter', 'caresses', 'caress'),
    ('snowball_porter', 'motoring', 'motor'),
    ('snowball_porter', 'generalization', 'gener'),
    ('snowball_porter', 'ab', 'ab'),
    ('snowball_porter', 'up', 'up'),
    ('snowball_porter', '12345', '12345'),
    ('snowball_danish', 'queries', 'queri'),
    ('snowball_danish', 'tables', 'tabl'),
    ('snowball_danish', 'running', 'running'),
    ('snowball_danish', 'happiness', 'happines'),
    ('snowball_danish', 'connection', 'connection'),
    ('snowball_danish', 'maximum', 'maximum'),
    ('snowball_danish', 'nationally', 'nationally'),
    ('snowball_danish', 'classified', 'classified'),
    ('snowball_danish', 'kilometres', 'kilometr'),
    ('snowball_danish', 'splitting', 'splitting'),
    ('snowball_danish', 'realization', 'realization'),
    ('snowball_danish', 'organizations', 'organization'),
    ('snowball_danish', 'troubles', 'troubl'),
    ('snowball_danish', 'computes', 'comput'),
    ('snowball_danish', 'magnetic', 'magnetic'),
    ('snowball_danish', 'specialized', 'specialized'),
    ('snowball_danish', 'ponies', 'poni'),
    ('snowball_danish', 'caresses', 'cares'),
    ('snowball_danish', 'motoring', 'motoring'),
    ('snowball_danish', 'generalization', 'generalization'),
    ('snowball_danish', 'ab', 'ab'),
    ('snowball_danish', 'up', 'up'),
    ('snowball_danish', '12345', '12345'),
    ('snowball_norwegian', 'queries', 'queri'),
    ('snowball_norwegian', 'tables', 'tabl'),
    ('snowball_norwegian', 'running', 'running'),
    ('snowball_norwegian', 'happiness', 'happiness'),
    ('snowball_norwegian', 'connection', 'connection'),
    ('snowball_norwegian', 'maximum', 'maximum'),
    ('snowball_norwegian', 'nationally', 'nationally'),
    ('snowball_norwegian', 'classified', 'classified'),
    ('snowball_norwegian', 'kilometres', 'kilometr'),
    ('snowball_norwegian', 'splitting', 'splitting'),
    ('snowball_norwegian', 'realization', 'realization'),
    ('snowball_norwegian', 'organizations', 'organization'),
    ('snowball_norwegian', 'troubles', 'troubl'),
    ('snowball_norwegian', 'computes', 'comput'),
    ('snowball_norwegian', 'magnetic', 'magnetic'),
    ('snowball_norwegian', 'specialized', 'specialized'),
    ('snowball_norwegian', 'ponies', 'poni'),
    ('snowball_norwegian', 'caresses', 'caress'),
    ('snowball_norwegian', 'motoring', 'motoring'),
    ('snowball_norwegian', 'generalization', 'generalization'),
    ('snowball_norwegian', 'ab', 'ab'),
    ('snowball_norwegian', 'up', 'up'),
    ('snowball_norwegian', '12345', '12345'),
    ('snowball_swedish', 'queries', 'queri'),
    ('snowball_swedish', 'tables', 'tabl'),
    ('snowball_swedish', 'running', 'running'),
    ('snowball_swedish', 'happiness', 'happiness'),
    ('snowball_swedish', 'connection', 'connection'),
    ('snowball_swedish', 'maximum', 'maximum'),
    ('snowball_swedish', 'nationally', 'nationally'),
    ('snowball_swedish', 'classified', 'classified'),
    ('snowball_swedish', 'kilometres', 'kilometr'),
    ('snowball_swedish', 'splitting', 'splitting'),
    ('snowball_swedish', 'realization', 'realization'),
    ('snowball_swedish', 'organizations', 'organization'),
    ('snowball_swedish', 'troubles', 'troubl'),
    ('snowball_swedish', 'computes', 'comput'),
    ('snowball_swedish', 'magnetic', 'magnetic'),
    ('snowball_swedish', 'specialized', 'specialized'),
    ('snowball_swedish', 'ponies', 'poni'),
    ('snowball_swedish', 'caresses', 'caress'),
    ('snowball_swedish', 'motoring', 'motoring'),
    ('snowball_swedish', 'generalization', 'generalization'),
    ('snowball_swedish', 'ab', 'ab'),
    ('snowball_swedish', 'up', 'up'),
    ('snowball_swedish', '12345', '12345'),
    ('snowball_german', 'queries', 'queri'),
    ('snowball_german', 'tables', 'tabl'),
    ('snowball_german', 'running', 'running'),
    ('snowball_german', 'happiness', 'happiness'),
    ('snowball_german', 'connection', 'connection'),
    ('snowball_german', 'maximum', 'maximum'),
    ('snowball_german', 'nationally', 'nationally'),
    ('snowball_german', 'classified', 'classified'),
    ('snowball_german', 'kilometres', 'kilometr'),
    ('snowball_german', 'splitting', 'splitting'),
    ('snowball_german', 'realization', 'realization'),
    ('snowball_german', 'organizations', 'organization'),
    ('snowball_german', 'troubles', 'troubl'),
    ('snowball_german', 'computes', 'comput'),
    ('snowball_german', 'magnetic', 'magnetic'),
    ('snowball_german', 'specialized', 'specialized'),
    ('snowball_german', 'ponies', 'poni'),
    ('snowball_german', 'caresses', 'caress'),
    ('snowball_german', 'motoring', 'motoring'),
    ('snowball_german', 'generalization', 'generalization'),
    ('snowball_german', 'ab', 'ab'),
    ('snowball_german', 'up', 'up'),
    ('snowball_german', '12345', '12345'),
    ('snowball_german2', 'queries', 'queri'),
    ('snowball_german2', 'tables', 'tabl'),
    ('snowball_german2', 'running', 'running'),
    ('snowball_german2', 'happiness', 'happiness'),
    ('snowball_german2', 'connection', 'connection'),
    ('snowball_german2', 'maximum', 'maximum'),
    ('snowball_german2', 'nationally', 'nationally'),
    ('snowball_german2', 'classified', 'classified'),
    ('snowball_german2', 'kilometres', 'kilometr'),
    ('snowball_german2', 'splitting', 'splitting'),
    ('snowball_german2', 'realization', 'realization'),
    ('snowball_german2', 'organizations', 'organization'),
    ('snowball_german2', 'troubles', 'troubl'),
    ('snowball_german2', 'computes', 'comput'),
    ('snowball_german2', 'magnetic', 'magnetic'),
    ('snowball_german2', 'specialized', 'specialized'),
    ('snowball_german2', 'ponies', 'poni'),
    ('snowball_german2', 'caresses', 'caress'),
    ('snowball_german2', 'motoring', 'motoring'),
    ('snowball_german2', 'generalization', 'generalization'),
    ('snowball_german2', 'ab', 'ab'),
    ('snowball_german2', 'up', 'up'),
    ('snowball_german2', '12345', '12345'),
    ('snowball_dutch', 'queries', 'queries'),
    ('snowball_dutch', 'tables', 'tables'),
    ('snowball_dutch', 'running', 'running'),
    ('snowball_dutch', 'happiness', 'happines'),
    ('snowball_dutch', 'connection', 'connection'),
    ('snowball_dutch', 'maximum', 'maximum'),
    ('snowball_dutch', 'nationally', 'nationally'),
    ('snowball_dutch', 'classified', 'classified'),
    ('snowball_dutch', 'kilometres', 'kilometres'),
    ('snowball_dutch', 'splitting', 'splitting'),
    ('snowball_dutch', 'realization', 'realization'),
    ('snowball_dutch', 'organizations', 'organization'),
    ('snowball_dutch', 'troubles', 'troubles'),
    ('snowball_dutch', 'computes', 'computes'),
    ('snowball_dutch', 'magnetic', 'magnetic'),
    ('snowball_dutch', 'specialized', 'specialized'),
    ('snowball_dutch', 'ponies', 'ponies'),
    ('snowball_dutch', 'caresses', 'caresses'),
    ('snowball_dutch', 'motoring', 'motor'),
    ('snowball_dutch', 'generalization', 'generalization'),
    ('snowball_dutch', 'ab', 'ab'),
    ('snowball_dutch', 'up', 'up'),
    ('snowball_dutch', '12345', '12345'),
    ('snowball_french', 'queries', 'quer'),
    ('snowball_french', 'tables', 'tabl'),
    ('snowball_french', 'running', 'running'),
    ('snowball_french', 'happiness', 'happiness'),
    ('snowball_french', 'connection', 'connect'),
    ('snowball_french', 'maximum', 'maximum'),
    ('snowball_french', 'nationally', 'nationally'),
    ('snowball_french', 'classified', 'classified'),
    ('snowball_french', 'kilometres', 'kilometr'),
    ('snowball_french', 'splitting', 'splitting'),
    ('snowball_french', 'realization', 'realiz'),
    ('snowball_french', 'organizations', 'organiz'),
    ('snowball_french', 'troubles', 'troubl'),
    ('snowball_french', 'computes', 'comput'),
    ('snowball_french', 'magnetic', 'magnetic'),
    ('snowball_french', 'specialized', 'specialized'),
    ('snowball_french', 'ponies', 'pon'),
    ('snowball_french', 'caresses', 'caress'),
    ('snowball_french', 'motoring', 'motoring'),
    ('snowball_french', 'generalization', 'generaliz'),
    ('snowball_french', 'ab', 'ab'),
    ('snowball_french', 'up', 'up'),
    ('snowball_french', '12345', '12345'),
    ('snowball_spanish', 'queries', 'queri'),
    ('snowball_spanish', 'tables', 'tabl'),
    ('snowball_spanish', 'running', 'running'),
    ('snowball_spanish', 'happiness', 'happiness'),
    ('snowball_spanish', 'connection', 'connection'),
    ('snowball_spanish', 'maximum', 'maximum'),
    ('snowball_spanish', 'nationally', 'nationally'),
    ('snowball_spanish', 'classified', 'classifi'),
    ('snowball_spanish', 'kilometres', 'kilometr'),
    ('snowball_spanish', 'splitting', 'splitting'),
    ('snowball_spanish', 'realization', 'realization'),
    ('snowball_spanish', 'organizations', 'organizations'),
    ('snowball_spanish', 'troubles', 'troubl'),
    ('snowball_spanish', 'computes', 'comput'),
    ('snowball_spanish', 'magnetic', 'magnetic'),
    ('snowball_spanish', 'specialized', 'specializ'),
    ('snowball_spanish', 'ponies', 'poni'),
    ('snowball_spanish', 'caresses', 'caress'),
    ('snowball_spanish', 'motoring', 'motoring'),
    ('snowball_spanish', 'generalization', 'generalization'),
    ('snowball_spanish', 'ab', 'ab'),
    ('snowball_spanish', 'up', 'up'),
    ('snowball_spanish', '12345', '12345'),
    ('snowball_italian', 'queries', 'queries'),
    ('snowball_italian', 'tables', 'tables'),
    ('snowball_italian', 'running', 'running'),
    ('snowball_italian', 'happiness', 'happiness'),
    ('snowball_italian', 'connection', 'connection'),
    ('snowball_italian', 'maximum', 'maximum'),
    ('snowball_italian', 'nationally', 'nationally'),
    ('snowball_italian', 'classified', 'classified'),
    ('snowball_italian', 'kilometres', 'kilometres'),
    ('snowball_italian', 'splitting', 'splitting'),
    ('snowball_italian', 'realization', 'realization'),
    ('snowball_italian', 'organizations', 'organizations'),
    ('snowball_italian', 'troubles', 'troubles'),
    ('snowball_italian', 'computes', 'computes'),
    ('snowball_italian', 'magnetic', 'magnetic'),
    ('snowball_italian', 'specialized', 'specialized'),
    ('snowball_italian', 'ponies', 'ponies'),
    ('snowball_italian', 'caresses', 'caresses'),
    ('snowball_italian', 'motoring', 'motoring'),
    ('snowball_italian', 'generalization', 'generalization'),
    ('snowball_italian', 'ab', 'ab'),
    ('snowball_italian', 'up', 'up'),
    ('snowball_italian', '12345', '12345'),
    ('snowball_portuguese', 'queries', 'queri'),
    ('snowball_portuguese', 'tables', 'tabl'),
    ('snowball_portuguese', 'running', 'running'),
    ('snowball_portuguese', 'happiness', 'happiness'),
    ('snowball_portuguese', 'connection', 'connection'),
    ('snowball_portuguese', 'maximum', 'maximum'),
    ('snowball_portuguese', 'nationally', 'nationally'),
    ('snowball_portuguese', 'classified', 'classified'),
    ('snowball_portuguese', 'kilometres', 'kilometr'),
    ('snowball_portuguese', 'splitting', 'splitting'),
    ('snowball_portuguese', 'realization', 'realization'),
    ('snowball_portuguese', 'organizations', 'organizations'),
    ('snowball_portuguese', 'troubles', 'troubl'),
    ('snowball_portuguese', 'computes', 'comput'),
    ('snowball_portuguese', 'magnetic', 'magnetic'),
    ('snowball_portuguese', 'specialized', 'specialized'),
    ('snowball_portuguese', 'ponies', 'poni'),
    ('snowball_portuguese', 'caresses', 'car'),
    ('snowball_portuguese', 'motoring', 'motoring'),
    ('snowball_portuguese', 'generalization', 'generalization'),
    ('snowball_portuguese', 'ab', 'ab'),
    ('snowball_portuguese', 'up', 'up'),
    ('snowball_portuguese', '12345', '12345'),
    ('snowball_romanian', 'queries', 'queries'),
    ('snowball_romanian', 'tables', 'tables'),
    ('snowball_romanian', 'running', 'running'),
    ('snowball_romanian', 'happiness', 'happiness'),
    ('snowball_romanian', 'connection', 'connection'),
    ('snowball_romanian', 'maximum', 'maximum'),
    ('snowball_romanian', 'nationally', 'nationally'),
    ('snowball_romanian', 'classified', 'classified'),
    ('snowball_romanian', 'kilometres', 'kilometres'),
    ('snowball_romanian', 'splitting', 'splitting'),
    ('snowball_romanian', 'realization', 'realization'),
    ('snowball_romanian', 'organizations', 'organizations'),
    ('snowball_romanian', 'troubles', 'troubles'),
    ('snowball_romanian', 'computes', 'computes'),
    ('snowball_romanian', 'magnetic', 'magnet'),
    ('snowball_romanian', 'specialized', 'specialized'),
    ('snowball_romanian', 'ponies', 'ponies'),
    ('snowball_romanian', 'caresses', 'caresses'),
    ('snowball_romanian', 'motoring', 'motoring'),
    ('snowball_romanian', 'generalization', 'generalization'),
    ('snowball_romanian', 'ab', 'ab'),
    ('snowball_romanian', 'up', 'up'),
    ('snowball_romanian', '12345', '12345'),
    ('snowball_catalan', 'queries', 'quer'),
    ('snowball_catalan', 'tables', 'tab'),
    ('snowball_catalan', 'running', 'running'),
    ('snowball_catalan', 'happiness', 'happin'),
    ('snowball_catalan', 'connection', 'connection'),
    ('snowball_catalan', 'maximum', 'maximum'),
    ('snowball_catalan', 'nationally', 'nationally'),
    ('snowball_catalan', 'classified', 'classif'),
    ('snowball_catalan', 'kilometres', 'kilometr'),
    ('snowball_catalan', 'splitting', 'splitting'),
    ('snowball_catalan', 'realization', 'realization'),
    ('snowball_catalan', 'organizations', 'organizat'),
    ('snowball_catalan', 'troubles', 'troub'),
    ('snowball_catalan', 'computes', 'comput'),
    ('snowball_catalan', 'magnetic', 'magnetic'),
    ('snowball_catalan', 'specialized', 'specializ'),
    ('snowball_catalan', 'ponies', 'pon'),
    ('snowball_catalan', 'caresses', 'car'),
    ('snowball_catalan', 'motoring', 'motoring'),
    ('snowball_catalan', 'generalization', 'generalization'),
    ('snowball_catalan', 'ab', 'ab'),
    ('snowball_catalan', 'up', 'up'),
    ('snowball_catalan', '12345', '12345'),
    ('snowball_russian', 'queries', 'queries'),
    ('snowball_russian', 'tables', 'tables'),
    ('snowball_russian', 'running', 'running'),
    ('snowball_russian', 'happiness', 'happiness'),
    ('snowball_russian', 'connection', 'connection'),
    ('snowball_russian', 'maximum', 'maximum'),
    ('snowball_russian', 'nationally', 'nationally'),
    ('snowball_russian', 'classified', 'classified'),
    ('snowball_russian', 'kilometres', 'kilometres'),
    ('snowball_russian', 'splitting', 'splitting'),
    ('snowball_russian', 'realization', 'realization'),
    ('snowball_russian', 'organizations', 'organizations'),
    ('snowball_russian', 'troubles', 'troubles'),
    ('snowball_russian', 'computes', 'computes'),
    ('snowball_russian', 'magnetic', 'magnetic'),
    ('snowball_russian', 'specialized', 'specialized'),
    ('snowball_russian', 'ponies', 'ponies'),
    ('snowball_russian', 'caresses', 'caresses'),
    ('snowball_russian', 'motoring', 'motoring'),
    ('snowball_russian', 'generalization', 'generalization'),
    ('snowball_russian', 'ab', 'ab'),
    ('snowball_russian', 'up', 'up'),
    ('snowball_russian', '12345', '12345'),
    ('snowball_finnish', 'queries', 'queries'),
    ('snowball_finnish', 'tables', 'tables'),
    ('snowball_finnish', 'running', 'running'),
    ('snowball_finnish', 'happiness', 'happines'),
    ('snowball_finnish', 'connection', 'connectio'),
    ('snowball_finnish', 'maximum', 'maximum'),
    ('snowball_finnish', 'nationally', 'nationaly'),
    ('snowball_finnish', 'classified', 'classified'),
    ('snowball_finnish', 'kilometres', 'kilometres'),
    ('snowball_finnish', 'splitting', 'splitting'),
    ('snowball_finnish', 'realization', 'realizatio'),
    ('snowball_finnish', 'organizations', 'organizations'),
    ('snowball_finnish', 'troubles', 'troubles'),
    ('snowball_finnish', 'computes', 'computes'),
    ('snowball_finnish', 'magnetic', 'magnetic'),
    ('snowball_finnish', 'specialized', 'specialized'),
    ('snowball_finnish', 'ponies', 'ponies'),
    ('snowball_finnish', 'caresses', 'caresses'),
    ('snowball_finnish', 'motoring', 'motoring'),
    ('snowball_finnish', 'generalization', 'generalizatio'),
    ('snowball_finnish', 'ab', 'ab'),
    ('snowball_finnish', 'up', 'up'),
    ('snowball_finnish', '12345', '12345'),
    ('snowball_hungarian', 'queries', 'queries'),
    ('snowball_hungarian', 'tables', 'tables'),
    ('snowball_hungarian', 'running', 'running'),
    ('snowball_hungarian', 'happiness', 'happiness'),
    ('snowball_hungarian', 'connection', 'connect'),
    ('snowball_hungarian', 'maximum', 'maximu'),
    ('snowball_hungarian', 'nationally', 'nationally'),
    ('snowball_hungarian', 'classified', 'classif'),
    ('snowball_hungarian', 'kilometres', 'kilometres'),
    ('snowball_hungarian', 'splitting', 'splitting'),
    ('snowball_hungarian', 'realization', 'realizat'),
    ('snowball_hungarian', 'organizations', 'organizations'),
    ('snowball_hungarian', 'troubles', 'troubles'),
    ('snowball_hungarian', 'computes', 'computes'),
    ('snowball_hungarian', 'magnetic', 'magnetic'),
    ('snowball_hungarian', 'specialized', 'specializ'),
    ('snowball_hungarian', 'ponies', 'ponies'),
    ('snowball_hungarian', 'caresses', 'caresses'),
    ('snowball_hungarian', 'motoring', 'motoring'),
    ('snowball_hungarian', 'generalization', 'generalizat'),
    ('snowball_hungarian', 'ab', 'ab'),
    ('snowball_hungarian', 'up', 'up'),
    ('snowball_hungarian', '12345', '12345'),
    ('snowball_armenian', 'queries', 'queries'),
    ('snowball_armenian', 'tables', 'tables'),
    ('snowball_armenian', 'running', 'running'),
    ('snowball_armenian', 'happiness', 'happiness'),
    ('snowball_armenian', 'connection', 'connection'),
    ('snowball_armenian', 'maximum', 'maximum'),
    ('snowball_armenian', 'nationally', 'nationally'),
    ('snowball_armenian', 'classified', 'classified'),
    ('snowball_armenian', 'kilometres', 'kilometres'),
    ('snowball_armenian', 'splitting', 'splitting'),
    ('snowball_armenian', 'realization', 'realization'),
    ('snowball_armenian', 'organizations', 'organizations'),
    ('snowball_armenian', 'troubles', 'troubles'),
    ('snowball_armenian', 'computes', 'computes'),
    ('snowball_armenian', 'magnetic', 'magnetic'),
    ('snowball_armenian', 'specialized', 'specialized'),
    ('snowball_armenian', 'ponies', 'ponies'),
    ('snowball_armenian', 'caresses', 'caresses'),
    ('snowball_armenian', 'motoring', 'motoring'),
    ('snowball_armenian', 'generalization', 'generalization'),
    ('snowball_armenian', 'ab', 'ab'),
    ('snowball_armenian', 'up', 'up'),
    ('snowball_armenian', '12345', '12345'),
    ('snowball_basque', 'queries', 'queries'),
    ('snowball_basque', 'tables', 'tables'),
    ('snowball_basque', 'running', 'running'),
    ('snowball_basque', 'happiness', 'happiness'),
    ('snowball_basque', 'connection', 'connection'),
    ('snowball_basque', 'maximum', 'maximum'),
    ('snowball_basque', 'nationally', 'nationally'),
    ('snowball_basque', 'classified', 'classified'),
    ('snowball_basque', 'kilometres', 'kilometres'),
    ('snowball_basque', 'splitting', 'splitting'),
    ('snowball_basque', 'realization', 'realization'),
    ('snowball_basque', 'organizations', 'organizations'),
    ('snowball_basque', 'troubles', 'troubles'),
    ('snowball_basque', 'computes', 'computes'),
    ('snowball_basque', 'magnetic', 'magnetic'),
    ('snowball_basque', 'specialized', 'specialized'),
    ('snowball_basque', 'ponies', 'ponies'),
    ('snowball_basque', 'caresses', 'caresses'),
    ('snowball_basque', 'motoring', 'motoring'),
    ('snowball_basque', 'generalization', 'generalization'),
    ('snowball_basque', 'ab', 'ab'),
    ('snowball_basque', 'up', 'up'),
    ('snowball_basque', '12345', '12345'),
    ('snowball_turkish', 'queries', 'queries'),
    ('snowball_turkish', 'tables', 'tables'),
    ('snowball_turkish', 'running', 'runningi'),
    ('snowball_turkish', 'happiness', 'happiness'),
    ('snowball_turkish', 'connection', 'connection'),
    ('snowball_turkish', 'maximum', 'maxim'),
    ('snowball_turkish', 'nationally', 'nationally'),
    ('snowball_turkish', 'classified', 'classifiedi'),
    ('snowball_turkish', 'kilometres', 'kilometres'),
    ('snowball_turkish', 'splitting', 'splittingi'),
    ('snowball_turkish', 'realization', 'realization'),
    ('snowball_turkish', 'organizations', 'organizations'),
    ('snowball_turkish', 'troubles', 'troubles'),
    ('snowball_turkish', 'computes', 'computes'),
    ('snowball_turkish', 'magnetic', 'magnetiç'),
    ('snowball_turkish', 'specialized', 'specializedi'),
    ('snowball_turkish', 'ponies', 'ponies'),
    ('snowball_turkish', 'caresses', 'caresses'),
    ('snowball_turkish', 'motoring', 'motoringi'),
    ('snowball_turkish', 'generalization', 'generalization'),
    ('snowball_turkish', 'ab', 'ab'),
    ('snowball_turkish', 'up', 'up'),
    ('snowball_turkish', '12345', '12345'),
    ('snowball_kraaij_pohlmann', 'queries', 'querie'),
    ('snowball_kraaij_pohlmann', 'tables', 'tabl'),
    ('snowball_kraaij_pohlmann', 'running', 'run'),
    ('snowball_kraaij_pohlmann', 'happiness', 'happines'),
    ('snowball_kraaij_pohlmann', 'connection', 'connection'),
    ('snowball_kraaij_pohlmann', 'maximum', 'maximum'),
    ('snowball_kraaij_pohlmann', 'nationally', 'nationally'),
    ('snowball_kraaij_pohlmann', 'classified', 'classified'),
    ('snowball_kraaij_pohlmann', 'kilometres', 'kilometr'),
    ('snowball_kraaij_pohlmann', 'splitting', 'split'),
    ('snowball_kraaij_pohlmann', 'realization', 'realization'),
    ('snowball_kraaij_pohlmann', 'organizations', 'organization'),
    ('snowball_kraaij_pohlmann', 'troubles', 'troubl'),
    ('snowball_kraaij_pohlmann', 'computes', 'comput'),
    ('snowball_kraaij_pohlmann', 'magnetic', 'magnetic'),
    ('snowball_kraaij_pohlmann', 'specialized', 'specialized'),
    ('snowball_kraaij_pohlmann', 'ponies', 'ponie'),
    ('snowball_kraaij_pohlmann', 'caresses', 'cares'),
    ('snowball_kraaij_pohlmann', 'motoring', 'motoor'),
    ('snowball_kraaij_pohlmann', 'generalization', 'neralization'),
    ('snowball_kraaij_pohlmann', 'ab', 'ab'),
    ('snowball_kraaij_pohlmann', 'up', 'up'),
    ('snowball_kraaij_pohlmann', '12345', '12345'),
]


def _q_stemmer_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from atire_spark.kernels.stem import STEMMERS, stem_unique

    # one (stemmer, word) frame, one Arrow pass: the per-stemmer
    # dispatch happens inside the batch, not as 30 separate jobs
    pairs = spark.createDataFrame(
        [(st, w) for st in STEMMERS for w in STEM_SUITE_WORDS],
        "stemmer string, word string",
    )

    def fn(batches):
        for pdf in batches:
            stems = np.empty(len(pdf), dtype=object)
            for st, grp in pdf.groupby("stemmer"):
                u = np.asarray(grp["word"].to_numpy(), dtype=object)
                stems[grp.index.to_numpy()] = stem_unique(u, st)
            yield pd.DataFrame(
                {"stemmer": pdf["stemmer"], "word": pdf["word"],
                 "stem": stems}
            )

    return pairs.mapInPandas(
        fn, schema="stemmer string, word string, stem string"
    )


def _stemmer_suite_sql() -> str:
    rows = ",\n       ".join(
        f"({st!r}, {w!r}, {expect!r})"
        for st, w, expect in _STEM_SUITE_EXPECTED
    )
    return f"""
SELECT * FROM (VALUES {rows}) AS t(stemmer, word, stem)
"""


# ---------------------------------------------------------------------------
# stemmer-iterator entries: query-side stemming over an UNSTEMMED
# index (stemmer.c:14-48 btree walk → stem conflation,
# search_engine.c:1262-1360) with the similarity-gated wrappers
# (stemmer_factory.c:71-72). The corpus vocabulary has no plural
# pairs, so the classes here are singletons / empties — certifying
# the gating edge semantics exactly (absent base → similarity 0.0 →
# threshold drops the class, weighted zeroes it; the base term always
# passes the threshold via the strcmp short-circuit); the nontrivial
# similarity arithmetic is oracled bit-exactly by
# tests/test_stem_iterator.py on a plural-rich corpus.
ITERATOR_QUERIES: list[tuple[int, str]] = [
    (1, "dup"),  # in-vocab base, singleton class
    (2, "queries"),  # absent base → class {query}, sim 0.0
    (3, "windows spark"),  # absent + in-vocab mix
    (4, "the a"),  # 'a' fails the ≥3 gate → plain singleton
    (5, "dup window zzzmissing"),  # empty class member
]
ITER_THRESHOLD = 0.5
ITER_WEIGHT = 1.0


def _q_stem_iterator(mode: str | None, value: float = 0.0):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        eng = _engine(spark, sf_dir)
        return eng.search_stemmed_iterator(
            ITERATOR_QUERIES, stemmer="s", k=TOP_K,
            similarity=mode, value=value,
        )

    return fn


# stem_s as a SQL expression (stem_s.c: ies→y, else strip es, else
# strip s, first match wins) — applied unguarded to vocabulary terms,
# exactly like the iterator's stem() calls
def _stem_s_sql(col: str) -> str:
    return f"""CASE
      WHEN {col} LIKE '%ies' THEN substr({col}, 1, length({col}) - 3) || 'y'
      WHEN {col} LIKE '%es' THEN substr({col}, 1, length({col}) - 2)
      WHEN {col} LIKE '%s' THEN substr({col}, 1, length({col}) - 1)
      ELSE {col} END"""


def _stem_iterator_sql(k: int, mode: str | None, value: float = 0.0) -> str:
    """Independent DuckDB implementation of the stemmer-iterator
    search: stem classes via the SQL S-stripper with the prefix
    bound, postings-cosine similarity with the reference's asymmetric
    normalization, threshold/weighted gating, conflation with the
    (size_t) truncation + 255 cap, one BM25 contribution per class."""
    from atire_spark.query import parse_nexi

    base_rows = []
    for qid, text in ITERATOR_QUERIES:
        from collections import Counter

        raw_bag = Counter(t.term for t in parse_nexi(text))
        for gid, (base, weight) in enumerate(sorted(raw_bag.items())):
            use_iter = len(base) >= 3 and "a" <= base[0] <= "z"
            base_rows.append(
                f"({qid}, {gid}, '{base}', {weight}, {str(use_iter).upper()})"
            )
    if mode is None:
        weight_expr = "1.0"
        gate_cond = "TRUE"
    elif mode == "threshold":
        weight_expr = "1.0"
        # keep term == base (strcmp short-circuit) or NOT (sim < t):
        # DuckDB orders NaN above every value, so NaN < t is FALSE
        # and NaN similarities are kept, like the C
        gate_cond = f"(c.term = c.base OR NOT (c.sim < {value}))"
    else:  # weighted
        weight_expr = (
            f"CASE WHEN c.term = c.base THEN 1.0 ELSE pow(c.sim, {value}) END"
        )
        gate_cond = "TRUE"
    return f"""
WITH {_CORPUS_CTE},
bases(query_id, gid, base, weight, use_iter) AS (
  VALUES {",".join(base_rows)}
),
sbase AS (
  SELECT *, {_stem_s_sql("base")} AS bstem FROM bases
),
cand AS (
  SELECT b.query_id, b.gid, b.base, b.weight, v.term
  FROM sbase b JOIN termstats v
    ON b.use_iter
   AND starts_with(v.term, b.bstem)
   AND ({_stem_s_sql("v.term")}) = b.bstem
  UNION ALL
  SELECT query_id, gid, base, weight, base AS term
  FROM sbase WHERE NOT use_iter
),
norms AS (
  SELECT term, CAST(sum(CAST(tf AS BIGINT) * tf) AS DOUBLE) AS n2,
         CAST(count(*) AS BIGINT) AS df
  FROM tf GROUP BY term
),
dots AS (
  SELECT c.query_id, c.gid, c.term,
         sum((CAST(ta.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE))
           * (CAST(tb.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE))) AS dot
  FROM cand c
  JOIN tf ta ON ta.term = c.base
  JOIN tf tb ON tb.term = c.term AND tb.docid = ta.docid
  JOIN docmap d ON d.docid = ta.docid
  WHERE c.term <> c.base
  GROUP BY 1, 2, 3
),
simmed AS (
  SELECT c.query_id, c.gid, c.base, c.weight, c.term,
         CASE WHEN na.n2 IS NULL THEN 0.0
              WHEN nb.n2 IS NULL THEN 0.0
              ELSE coalesce(dd.dot, 0.0)
                   * (ln(CAST(s.n_docs AS DOUBLE) / na.df)
                      * ln(CAST(s.n_docs AS DOUBLE) / nb.df))
                   / sqrt(na.n2 * ln(CAST(s.n_docs AS DOUBLE) / na.df)
                                * ln(CAST(s.n_docs AS DOUBLE) / na.df))
                   / sqrt(nb.n2 * ln(CAST(s.n_docs AS DOUBLE) / nb.df)
                                * ln(CAST(s.n_docs AS DOUBLE) / nb.df))
         END AS sim
  FROM cand c
  LEFT JOIN norms na ON na.term = c.base
  LEFT JOIN norms nb ON nb.term = c.term
  LEFT JOIN dots dd
    ON dd.query_id = c.query_id AND dd.gid = c.gid AND dd.term = c.term
  CROSS JOIN stats s
),
members AS (
  SELECT c.query_id, c.gid, c.weight, c.term, {weight_expr} AS w
  FROM simmed c
  WHERE {gate_cond}
),
mtf AS (
  SELECT m.query_id, m.gid, t.docid,
         sum(CAST(t.tf AS DOUBLE) * m.w) AS wsum,
         max(d.doc_len) AS doc_len
  FROM members m
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  GROUP BY 1, 2, 3
  HAVING sum(CAST(t.tf AS DOUBLE) * m.w) <> 0.0
),
imp AS (
  SELECT *, CASE WHEN wsum >= 256.0 THEN CAST(255 AS BIGINT)
                 ELSE CAST(trunc(wsum) AS BIGINT) END AS tf
  FROM mtf
),
gdf AS (
  SELECT query_id, gid, CAST(count(*) AS BIGINT) AS df
  FROM imp GROUP BY query_id, gid
),
gweight AS (
  SELECT DISTINCT query_id, gid, weight FROM bases
),
scored AS (
  SELECT CAST(i.query_id AS BIGINT) AS query_id, i.docid,
         CAST(g.weight AS BIGINT) * (1 + CAST(trunc(
           100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(gdf.df AS DOUBLE))
                 * ((CAST(i.tf AS DOUBLE) * (0.9 + 1.0))
                    / (CAST(i.tf AS DOUBLE)
                       + CAST(CAST(0.9 * ((1.0 - 0.4)
                           + 0.4 * (CAST(i.doc_len AS DOUBLE) / s.mean_len))
                         AS REAL) AS DOUBLE)))) AS BIGINT)) AS contrib
  FROM imp i
  JOIN gdf USING (query_id, gid)
  JOIN gweight g USING (query_id, gid)
  CROSS JOIN stats s
  WHERE gdf.df <> s.n_docs
),
acc AS (
  SELECT query_id, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored GROUP BY query_id, docid
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# thesaurus entries: classic query expansion (-W, atire.c:898-899 →
# nexi.c:484-495 appends synset terms at the same weight) and in-place
# synonym conflation (atire_api.c:571-576 → search_engine.c:1369-1461
# merges the synonyms' tf vectors, caps at 255, recomputes df, and
# ranks the merge as ONE term). Synonym rings over the corpus
# vocabulary; "quick" is absent from the corpus (vocab-miss member).
ENTRY_THESAURUS_GROUPS = [
    ["join", "merge"],
    ["sort", "order"],
    ["fast", "quick"],
    ["dup", "window"],
]


def _entry_thesaurus():
    from atire_spark.thesaurus import Thesaurus

    return Thesaurus.synonyms(ENTRY_THESAURUS_GROUPS)


def _q_thesaurus_expanded(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_expanded(TESTDATA_QUERIES, _entry_thesaurus(), k=TOP_K)


def _q_thesaurus_conflated(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    return eng.search_conflated(TESTDATA_QUERIES, _entry_thesaurus(), k=TOP_K)


def _thesaurus_expanded_values_sql() -> str:
    """TESTDATA_QUERIES after classic expansion, parsed by the same
    code the engine runs (anti-drift, like _query_values_sql)."""
    from collections import Counter

    from atire_spark.query import parse_nexi

    thes = _entry_thesaurus()
    rows = []
    for qid, text in TESTDATA_QUERIES:
        bag: Counter = Counter()
        for t in parse_nexi(text):
            bag[t.term] += 1
            for syn in thes.get_synset(t.term):
                bag[syn] += 1
        for term, weight in bag.items():
            rows.append(f"({qid}, '{term}', {weight})")
    return ",\n       ".join(rows)


def _thesaurus_conflated_sql(k: int) -> str:
    """DuckDB oracle for synonym conflation: merge member tf vectors
    per (query, group, doc) with the 255 cap, df from the merged
    vector, one fixed-point BM25 contribution per group — the same
    expression tree as SearchEngine.search_conflated."""
    from collections import Counter

    from atire_spark.query import parse_nexi

    thes = _entry_thesaurus()
    grp_rows, mem_rows = [], []
    for qid, text in TESTDATA_QUERIES:
        raw_bag = Counter(t.term for t in parse_nexi(text))
        for gid, (base, weight) in enumerate(sorted(raw_bag.items())):
            grp_rows.append(f"({qid}, {gid}, {weight})")
            members = Counter([base])
            for syn in thes.get_synset(base):
                members[syn] += 1
            for m, copies in members.items():
                mem_rows.append(f"({qid}, {gid}, '{m}', {copies})")
    return f"""
WITH {_CORPUS_CTE},
grp(query_id, gid, weight) AS (
  VALUES {",".join(grp_rows)}
),
member(query_id, gid, term, copies) AS (
  VALUES {",".join(mem_rows)}
),
mtf AS (
  SELECT m.query_id, m.gid, t.docid,
         CAST(least(sum(CAST(t.tf AS BIGINT) * m.copies), 255) AS BIGINT) AS tf,
         max(d.doc_len) AS doc_len
  FROM member m
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  GROUP BY m.query_id, m.gid, t.docid
),
gdf AS (
  SELECT query_id, gid, CAST(count(*) AS BIGINT) AS df
  FROM mtf GROUP BY query_id, gid
),
scored AS (
  SELECT CAST(mtf.query_id AS BIGINT) AS query_id, mtf.docid,
         CAST(g.weight AS BIGINT) * (1 + CAST(trunc(
           100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(gdf.df AS DOUBLE))
                 * ((CAST(mtf.tf AS DOUBLE) * (0.9 + 1.0))
                    / (CAST(mtf.tf AS DOUBLE)
                       + CAST(CAST(0.9 * ((1.0 - 0.4)
                           + 0.4 * (CAST(mtf.doc_len AS DOUBLE) / s.mean_len))
                         AS REAL) AS DOUBLE)))) AS BIGINT)) AS contrib
  FROM mtf
  JOIN gdf USING (query_id, gid)
  JOIN grp g USING (query_id, gid)
  CROSS JOIN stats s
  WHERE gdf.df <> s.n_docs  -- merged df == N contributes nothing
),
acc AS (
  SELECT query_id, docid,
         CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored GROUP BY query_id, docid
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from atire_spark.corpus import CORPUS_QUERIES

    ranker_fns = {
        "termcount": _q_termcount,
        "inner_product": _q_inner_product,
        "docid_asc": _mk_ranker_query("docid_asc"),
        "docid_desc": _mk_ranker_query("docid_desc"),
        "lmd": _q_lmd,
        "lmds": _mk_ranker_query("lmds"),
        "lmjm": _mk_ranker_query("lmjm"),
        "lmp": _q_lmp,
        "lmptfidf": _q_lmptfidf,
        "bm25l": _mk_ranker_query("bm25l"),
        "bm25plus": _mk_ranker_query("bm25plus"),
        "bm25t": _mk_ranker_query("bm25t"),
        "bm25adpt": _mk_ranker_query("bm25adpt"),
        "dph": _mk_ranker_query("dph"),
        "dlh13": _mk_ranker_query("dlh13"),
        "bose_gl2": _mk_ranker_query("bose"),
        "divergence_ineb2": _mk_ranker_query("divergence"),
        "dfree": _mk_ranker_query("dfree"),
        "dfi": _mk_ranker_query("dfi"),
        "dfi_idf": _mk_ranker_query("dfi_idf"),
        "dfiw": _mk_ranker_query("dfiw"),
        "dfiw_idf": _mk_ranker_query("dfiw_idf"),
        "tflodop": _mk_ranker_query("tflodop"),
        "kbtfidf": _mk_ranker_query("kbtfidf"),
    }
    reg: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    # entries the r1/r2 driver window never recorded lead the registry
    reg["topsig_sig_stats"] = _q_topsig_sig_stats
    reg["topsig_topk"] = _suite_fn(
        [("direct", _q_topsig_topk), ("feedback", _q_topsig_feedback)],
        "mode",
    )
    reg["blockmax_topk"] = _suite_fn(
        [("qaat_exact", _q_qaat_exact), ("wand", _q_bm25_wand)],
        "mode",
    )
    reg["pregen_recent_topk"] = _suite_fn(
        [
            ("recent", _q_pregen_recent),
            ("strexact", _q_pregen_strexact),
            ("arith", _q_pregen_arith),
        ],
        "field",
    )
    reg["readable_topk"] = _q_readable
    reg["bm25_quantized_topk"] = _suite_fn(
        [("fixed8", _q_bm25_quantized), ("auto", _q_bm25_quantized_auto)],
        "bits",
    )
    reg["boolean_topk"] = _q_boolean
    reg["topk_materialized"] = _q_topk_materialized
    reg["focus_passages"] = _q_focus
    reg["stemmer_suite_map"] = _q_stemmer_suite
    reg["lmp_feedback_interpolated_topk"] = _q_lmp_feedback_interpolated
    for suite, tags in _RANKER_SUITE_MEMBERS.items():
        reg[suite] = _suite_fn([(t, ranker_fns[t]) for t in tags], "ranker")
    # previously certified entries
    reg.update(CORPUS_QUERIES)
    reg["docmap"] = _q_docmap
    reg["collection_stats"] = _q_collection_stats
    reg["term_stats"] = _suite_fn(
        [("corpus", _q_term_stats), ("cjk_bigram", _q_cjk_term_stats)],
        "mode",
    )
    reg["postings_roundtrip"] = _q_postings_roundtrip
    # k=10 / k=100 / conjunctive-AND share the result schema — one
    # suite row keeps the registry inside the driver's 50-entry window
    reg["bm25_topk"] = _suite_fn(
        [
            ("k10", _q_bm25),
            ("k100", _q_bm25_k100),
            ("conjunctive", _q_bm25_conjunctive),
            ("merged", _q_bm25_merged),
            ("federated", _q_bm25_federated),
        ],
        "mode",
    )
    reg["bm25_streamed_topk"] = _suite_fn(
        [
            ("ingest", _q_bm25_streamed),
            ("standing", _q_bm25_standing),
        ],
        "mode",
    )
    reg["bm25_codecs_topk"] = _suite_fn(
        [
            ("simple9", _q_bm25_simple9),
            ("simple8b_packed", _q_bm25_codec("simple8b_packed")),
            ("carryover12", _q_bm25_codec("carryover12")),
            ("elias_gamma", _q_bm25_codec("elias_gamma")),
        ],
        "codec",
    )
    reg["bm25_stemmed_topk"] = _q_bm25_stemmed
    reg["bm25_stopped_topk"] = _q_bm25_stopped
    reg["nexi_topk"] = _suite_fn(
        [("co_signed", _q_nexi_signed), ("cas", _q_nexi_cas)], "grammar"
    )
    reg["bm25_feedback_topk"] = _suite_fn(
        [("kl", _q_feedback_kl), ("rm", _q_feedback_rm)], "method"
    )
    # one suite for the two query-rewrite families (same result
    # schema): thesaurus expansion/conflation + the stemmer-iterator
    # modes — keeps the registry within the driver's recorded window
    reg["expansion_topk"] = _suite_fn(
        [
            ("thesaurus_expanded", _q_thesaurus_expanded),
            ("thesaurus_conflated", _q_thesaurus_conflated),
            ("stem_plain", _q_stem_iterator(None)),
            ("stem_threshold", _q_stem_iterator("threshold", ITER_THRESHOLD)),
            ("stem_weighted", _q_stem_iterator("weighted", ITER_WEIGHT)),
        ],
        "mode",
    )
    reg["more_like_this_topk"] = _q_more_like_this
    reg["eval_suite"] = _q_eval_suite
    reg["bm25_pruned_topk"] = _suite_fn(
        [
            ("single_term", _q_single_term_pruned),
            ("trimmed", _q_bm25_trimmed),
            ("static_prune", _q_bm25_static_pruned),
        ],
        "mode",
    )
    reg["snippets"] = _q_snippets_suite
    reg["bm25_rerank_topk"] = _q_bm25_rerank
    reg["term_culling_stats"] = _q_term_culling
    return reg


def oracle_sql() -> dict[str, str]:
    from atire_spark.corpus import corpus_oracle_sql

    parts = {
        "docmap": f"""
WITH {_CORPUS_CTE}
SELECT docid, conv_id, turn_idx, doc_len FROM docmap
""",
        "collection_stats": f"""
WITH {_CORPUS_CTE}
SELECT s.n_docs AS documents, s.coll_len AS collection_len,
       s.mean_len AS mean_doc_len,
       (SELECT CAST(count(*) AS BIGINT) FROM termstats) AS unique_terms
FROM stats s
""",
        "term_stats": f"""
WITH {_CORPUS_CTE}
SELECT term, df, cf, max_impact FROM termstats
""",
        "postings_roundtrip": f"""
WITH {_CORPUS_CTE}
SELECT term, docid, tf FROM tf
""",
        "bm25_topk": _bm25_sql(TOP_K),
        # the streamed (two-incremental-append) index must reproduce
        # the batch build's ranking exactly — same oracle, verbatim
        "bm25_streamed_topk": _bm25_sql(TOP_K),
        # codec-variant indexes: identical ranking, same oracle — the
        # unchanged SQL certifies each codec's wire round trip
        "bm25_simple9_topk": _bm25_sql(TOP_K),
        "bm25_simple8b_packed_topk": _bm25_sql(TOP_K),
        "bm25_carryover12_topk": _bm25_sql(TOP_K),
        "bm25_elias_gamma_topk": _bm25_sql(TOP_K),
        "bm25_topk_k100": _bm25_sql(100),
        "bm25_conjunctive": _bm25_sql(TOP_K, conjunctive=True),
        "boolean_topk": _boolean_sql(TOP_K),
        # quantized (-Q) index: per-posting raw rsv (idf kept even at 0,
        # ranking_function.c:495-526), global min/max, impact =
        # trunc(scale + 1), query rsv = sum(impact) mod 2^16 — identical
        # expression tree to kernels/quantize.py
        # termcount (boolean-OR): one point per matching query token
        "termcount_topk": _ranker_sql("CAST(q.weight AS BIGINT)", TOP_K),
        # TF·IDF inner product: rsv = tf*idf^2/100
        # (ranking_function_inner_product.c — the /100 avoids blowing
        # out the uint16 accumulators), same op order as the engine
        "inner_product_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc("
            "((CAST(t.tf AS DOUBLE)"
            " * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))"
            " * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE)))"
            " / 100.0) * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # LM Dirichlet u=6750 (ranking_function_lmd.c):
        # rsv = ln(1 + (tf/u)*(len_C/cf)) - n*ln(1 + len_d/u)
        "lmd_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(100.0 * ("
            "ln(1.0 + (CAST(t.tf AS DOUBLE) / 6750.0)"
            " * (CAST(s.coll_len AS DOUBLE) / CAST(ts.cf AS DOUBLE)))"
            " - qn.n * ln(1.0 + CAST(d.doc_len AS DOUBLE) / 6750.0)"
            ")) AS BIGINT))",
            TOP_K,
            extra_cte=(
                ",\nqn AS (SELECT query_id, CAST(sum(weight) AS DOUBLE) AS n"
                " FROM q GROUP BY query_id)"
            ),
            extra_join="JOIN qn ON qn.query_id = q.query_id",
        ),
        # S-stripper-stemmed index (stem_s.c; ~stemmer recorded,
        # query terms stemmed by the query-side gate)
        "bm25_stemmed_topk": _stemmed_bm25_sql(TOP_K),
        # NCBI stop-before-indexing (index_document.c:100-101)
        "bm25_stopped_topk": _stopped_bm25_sql(TOP_K),
        # NEXI signed terms / phrases / punctuation-stop (nexi.c:437-505)
        # — VALUES are the hand-derived expected parses
        "nexi_signed_topk": _bm25_sql(TOP_K, values_sql=_NEXI_EXPECTED_VALUES),
        # blind KL relevance feedback (atire_api.c:1553-1600 +
        # relevance_feedback_blind_kl.c): full chain in SQL
        "bm25_feedback_kl_topk": _feedback_sql(TOP_K, FB_DOCS, FB_TERMS),
        # .morelike (atire.c:488-504, extract_query_terms)
        "more_like_this_topk": _more_like_this_sql(TOP_K),
        # evaluation metrics (evaluator.c:126-260; MAP/P@n/S@n/bpref —
        # nDCG and ERR are pytest-certified with hand values)
        "eval_metrics": _eval_metrics_sql(TOP_K),
        "eval_intent_aware": _eval_intent_aware_sql(TOP_K),
        # single-term top-k prune (atire_api.c:989-997)
        "bm25_single_term_pruned": _trimmed_bm25_sql(
            TOP_K,
            TOP_K,
            ",\n       ".join(f"({q}, '{t}', 1)" for q, t in ST_QUERIES),
        ),
        # -K read-side trim (search_engine.c:938-963)
        "bm25_trimmed_topk": _trimmed_bm25_sql(
            TOP_K, TRIM_K, _query_values_sql()
        ),
        # -K build-side static prune (memory_index.c:545-546): plain
        # search over the rewritten index == trimmed search at K
        "bm25_static_pruned": _trimmed_bm25_sql(
            TOP_K, STATIC_K, _query_values_sql()
        ),
        # snippets (snippet_factory.c:19-46; token-window adaptation
        # documented in snippets.py)
        "snippet_beginning": f"""
SELECT doc_id,
       substr(trim(regexp_replace(text, '\\s+', ' ', 'g')), 1, {SNIPPET_LEN})
         AS snippet
FROM documents
""",
        "snippet_window_tf": _snippet_window_sql(
            "CASE WHEN t.term IN ("
            + ", ".join(f"'{t}'" for t in SNIPPET_TERMS)
            + ") THEN 1.0 ELSE 0.0 END"
        ),
        "snippet_window_tficf": _snippet_window_sql(
            "CASE WHEN t.term IN ("
            + ", ".join(f"'{t}'" for t in SNIPPET_TERMS)
            + ") THEN ln(CAST((SELECT coll_len FROM stats) AS DOUBLE)"
            " / CAST((SELECT cf FROM termstats"
            "         WHERE termstats.term = t.term) AS DOUBLE))"
            " ELSE 0.0 END"
        ),
        "snippet_kl_cloud": _snippet_kl_cloud_sql(),
        "snippet_title": _snippet_title_sql(),
        "snippet_best_tag_tficf": _snippet_best_tag_sql(
            "CASE WHEN t.term IN ("
            + ", ".join(f"'{t}'" for t in SNIPPET_TERMS)
            + ") THEN ln(CAST((SELECT coll_len FROM stats) AS DOUBLE)"
            " / CAST((SELECT cf FROM termstats"
            "         WHERE termstats.term = t.term) AS DOUBLE))"
            " ELSE 0.0 END"
        ),
        "snippet_best_tag_tf": _snippet_best_tag_sql(
            "CASE WHEN t.term IN ("
            + ", ".join(f"'{t}'" for t in SNIPPET_TERMS)
            + ") THEN 1.0 ELSE 0.0 END"
        ),
        # two-stage rerank over the top-k in-memory subcollection
        # (atire_api.c:1716-1767)
        "bm25_rerank_topk": _rerank_sql(TOP_K, RERANK_FPK),
        # serialise-time culling (should_prune, memory_index.c:782-798):
        # surviving dictionary = no predicate fired
        "term_culling_stats": f"""
WITH {_CORPUS_CTE}
SELECT term, df, cf, max_impact
FROM termstats CROSS JOIN stats
WHERE NOT (cf = 1
           OR df <= 30
           OR CAST(df AS DOUBLE) / CAST(n_docs AS DOUBLE) >= 0.78
           OR term IN ({_stop_values_sql()}))
""",
        # BM25L δ=0.5 (ranking_function_bm25l.c; Lv & Zhai SIGIR'11):
        # c' = tf/(1-b+b·len/avg); rsv = ((k1+1)(c'+δ)/(k1+c'+δ))·idf
        "bm25l_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " (((0.9 + 1.0) * ((CAST(t.tf AS DOUBLE)"
            "   / (1.0 - 0.4 + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))) + 0.5))"
            "  / (0.9 + (CAST(t.tf AS DOUBLE)"
            "   / (1.0 - 0.4 + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))) + 0.5))"
            " * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # BM25+ δ=1 (ranking_function_bm25plus.c; Lv & Zhai CIKM'11)
        "bm25plus_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))"
            " * ((((0.9 + 1.0) * CAST(t.tf AS DOUBLE))"
            "    / (0.9 * (1.0 - 0.4 + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))"
            "       + CAST(t.tf AS DOUBLE))) + 1.0)"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # LM Jelinek-Mercer λ=0.5 (ranking_function_lmjm.c):
        # rsv = ln(1 + ((1-λ)/λ)·(tf/len)·(|C|/cf)); (1-0.5)/0.5 = 1.0
        "lmjm_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " ln(1.0 + (CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE))"
            "    * (CAST(s.coll_len AS DOUBLE) / CAST(ts.cf AS DOUBLE)))"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # DPH (ranking_function_dph.c): tf==len makes log2(0) (C UB) —
        # both sides define such postings to contribute nothing
        "dph_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " 1.0 * (((1.0 - CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE))"
            "   * (1.0 - CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE)))"
            "   / (CAST(t.tf AS DOUBLE) + 1.0))"
            " * (CAST(t.tf AS DOUBLE)"
            "    * (ln((CAST(t.tf AS DOUBLE) * s.mean_len / CAST(d.doc_len AS DOUBLE))"
            "          * (CAST(s.n_docs AS DOUBLE) / CAST(ts.cf AS DOUBLE))) / ln(2.0))"
            "    + 0.5 * (ln(2.0 * pi() * CAST(t.tf AS DOUBLE)"
            "          * (1.0 - CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE)))"
            "          / ln(2.0)))"
            ") * 100.0) AS BIGINT))",
            TOP_K,
            extra_where="WHERE t.tf < d.doc_len",
        ),
        # DLH13, Terrier form (ranking_function_dlh13.c:94-98) — the
        # reference adds a flat +10.0 AFTER the formula
        # (``score += 10.0``, binary-verified via reference_ab.py)
        "dlh13_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " 1.0 * (CAST(t.tf AS DOUBLE)"
            "    * (ln((CAST(t.tf AS DOUBLE) * s.mean_len / CAST(d.doc_len AS DOUBLE))"
            "          * (CAST(s.n_docs AS DOUBLE) / CAST(ts.cf AS DOUBLE))) / ln(2.0))"
            "    + 0.5 * (ln(2.0 * pi() * CAST(t.tf AS DOUBLE)"
            "          * (1.0 - CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE)))"
            "          / ln(2.0)))"
            " / (CAST(t.tf AS DOUBLE) + 0.5)"
            " + 10.0"
            ") * 100.0) AS BIGINT))",
            TOP_K,
            extra_where="WHERE t.tf < d.doc_len",
        ),
        # LMDS u=2500 (ranking_function_lmds.c): the first accumulated
        # hit of a doc folds in the doc prior |q|·ln(u/(len+u))
        # (is_zero_rsv, lmds.c:110-115); terms are processed in
        # ascending-cf order (atire_api.c:961-968), ties by term text
        # (the reference's qsort tie order is unspecified; both sides
        # here use the same deterministic tie-break)
        "lmds_topk": _lmds_sql(TOP_K),
        # Bose-Einstein GL2 (ranking_function_bose_einstein.c:76-96)
        "bose_gl2_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " (ln(1.0 + CAST(ts.cf AS DOUBLE) / CAST(s.n_docs AS DOUBLE))"
            "  + (CAST(t.tf AS DOUBLE)"
            "     * ln(1.0 + s.mean_len / CAST(d.doc_len AS DOUBLE)))"
            "    * ln(1.0 + CAST(s.n_docs AS DOUBLE) / CAST(ts.cf AS DOUBLE)))"
            " / ((CAST(t.tf AS DOUBLE)"
            "     * ln(1.0 + s.mean_len / CAST(d.doc_len AS DOUBLE))) + 1.0)"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # DFR I(ne)B2 (ranking_function_divergence.c:46-75)
        "divergence_ineb2_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " (CAST(t.tf AS DOUBLE)"
            "  * (ln(1.0 + s.mean_len / CAST(d.doc_len AS DOUBLE)) / ln(2.0)))"
            " * (ln((CAST(s.n_docs AS DOUBLE) + 1.0)"
            "       / (CAST(s.n_docs AS DOUBLE)"
            "          * (1.0 - pow((CAST(s.n_docs AS DOUBLE) - 1.0)"
            "                        / CAST(s.n_docs AS DOUBLE),"
            "                       CAST(ts.cf AS DOUBLE))) + 0.5)) / ln(2.0))"
            " * ((CAST(ts.cf AS DOUBLE) + 1.0)"
            "    / (CAST(ts.df AS DOUBLE)"
            "       * ((CAST(t.tf AS DOUBLE)"
            "           * (ln(1.0 + s.mean_len / CAST(d.doc_len AS DOUBLE))"
            "              / ln(2.0))) + 1.0)))"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # DFRee (ranking_function_dfree.c:20-45)
        "dfree_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " 1.0 * (CAST(t.tf AS DOUBLE)"
            "   * (ln(((CAST(t.tf AS DOUBLE) + 1.0) / (CAST(d.doc_len AS DOUBLE) + 1.0))"
            "         / (CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE))) / ln(2.0)))"
            " * (CAST(t.tf AS DOUBLE)"
            "     * (-(ln((CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE))"
            "             * (CAST(s.coll_len AS DOUBLE) / CAST(t.tf AS DOUBLE))) / ln(2.0)))"
            "    + (CAST(t.tf AS DOUBLE) + 1.0)"
            "      * (ln(((CAST(t.tf AS DOUBLE) + 1.0) / (CAST(d.doc_len AS DOUBLE) + 1.0))"
            "            * (CAST(s.coll_len AS DOUBLE) / CAST(t.tf AS DOUBLE))) / ln(2.0))"
            "    + 0.5 * (ln(((CAST(t.tf AS DOUBLE) + 1.0) / (CAST(d.doc_len AS DOUBLE) + 1.0))"
            "                / (CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE))) / ln(2.0)))"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # DFI family (ranking_function_dfi*.c): postings with
        # tf <= ef = cf·len/|C| contribute nothing
        "dfi_topk": _ranker_sql(
            _DFI_CONTRIB.replace("_TAIL_", ""), TOP_K, extra_where=_DFI_WHERE
        ),
        "dfi_idf_topk": _ranker_sql(
            _DFI_CONTRIB.replace(
                "_TAIL_",
                " * (ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE)) / ln(2.0))",
            ),
            TOP_K,
            extra_where=_DFI_WHERE,
        ),
        "dfiw_topk": _ranker_sql(
            _DFI_CONTRIB.replace(
                "_TAIL_",
                " * (-(ln(CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE)) / ln(2.0)))",
            ),
            TOP_K,
            extra_where=_DFI_WHERE,
        ),
        "dfiw_idf_topk": _ranker_sql(
            _DFI_CONTRIB.replace(
                "_TAIL_",
                " * (ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE)) / ln(2.0))"
                " * (-(ln(CAST(t.tf AS DOUBLE) / CAST(d.doc_len AS DOUBLE)) / ln(2.0)))",
            ),
            TOP_K,
            extra_where=_DFI_WHERE,
        ),
        # adaptive-k1 BM25s: per-term k1 solved by recursive-CTE
        # transcriptions of the reference's secant / range search
        "bm25t_topk": _bm25t_sql(TOP_K),
        "bm25adpt_topk": _bm25adpt_sql(TOP_K),
        # Pitman-Yor LM rankers over the -Ilmp length vectors
        "lmp_topk": _lmp_sql(TOP_K),
        "lmptfidf_topk": _lmptfidf_sql(TOP_K),
        # pregen: matched docs ranked by a precomputed field score
        "pregen_recent_topk": _pregen_sql(TOP_K),
        # readable: BM25/Dale-Chall blend at the reference defaults
        "readable_topk": _readable_sql(TOP_K),
        # TFlodop b=0.1 δ=0.1 (ranking_function_tflodop.c:73-89)
        "tflodop_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " (1 + ln(1 + ln(CAST(t.tf AS DOUBLE)"
            "   / (1 - 0.1 + 0.1 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))"
            "   + 0.1)))"
            " * ln((CAST(s.n_docs AS DOUBLE) + 1) / CAST(ts.df AS DOUBLE))"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # kbtfidf k=5 b=5−e (ranking_function_kbtfidf.c:139,160-163)
        "kbtfidf_topk": _ranker_sql(
            "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
            " (ln(5.0 * CAST(t.tf AS DOUBLE) - 2.281718171540955)"
            "  * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))"
            "  * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))) / 100.0"
            ") * 100.0) AS BIGINT))",
            TOP_K,
        ),
        # docid rankers (ranking_function_docid.c): positional set_rsv
        "docid_asc_topk": _ranker_sql(
            "CAST(s.n_docs - t.docid AS BIGINT)", TOP_K, agg="max"
        ),
        "docid_desc_topk": _ranker_sql(
            "CAST(t.docid + 1 AS BIGINT)", TOP_K, agg="max"
        ),
        "bm25_quantized_topk": _quantized_sql(),
        # exact-mode QaaT is rank-identical to TaaT over the quantized
        # index — same oracle certifies the quantum-ordered traversal
        "qaat_exact_topk": _quantized_sql(qaat=True),
        "topk_materialized": f"""
WITH {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CAST(q.weight AS BIGINT) * (1 + CAST(trunc(
           100.0 * ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
                 * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
                    / (CAST(t.tf AS DOUBLE)
                       + CAST(CAST(0.9 * ((1.0 - 0.4)
                           + 0.4 * (CAST(d.doc_len AS DOUBLE) / s.mean_len))
                         AS REAL) AS DOUBLE)))) AS BIGINT)) AS contrib
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
  WHERE ts.df <> s.n_docs AND q.query_id <= 3
),
acc AS (
  SELECT query_id, docid, CAST(((((sum(contrib)) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM scored GROUP BY query_id, docid
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT r.query_id, r.rank, r.docid, d.conv_id, d.turn_idx, r.rsv_fixed,
       CAST(r.query_id AS VARCHAR) || ' Q0 ' || d.conv_id || ':'
         || CAST(d.turn_idx AS VARCHAR) || ' ' || CAST(r.rank AS VARCHAR)
         || ' ' || CAST(r.rsv_fixed AS VARCHAR) || ' atire_spark' AS line
FROM ranked r JOIN docmap d USING (docid)
WHERE r.rank <= {TOP_K}
""",
        # TopSig (index_document_topsig.c, ranking_function_topsig_*.c):
        # integer-quantized signature arithmetic transcribed whole —
        # per-doc bit density and agreement-count top-k
        "topsig_sig_stats": _topsig_stats_sql(TOPSIG_W, TOPSIG_D),
        "topsig_topk": _topsig_topk_sql(TOPSIG_W, TOPSIG_D, TOP_K),
        "topsig_feedback_topk": _topsig_feedback_sql(
            TOPSIG_W, TOPSIG_D, TOP_K, TOPSIG_FB_DOCS
        ),
    }
    # compose the driver registry — mirror of queries(); every suite
    # member keeps its independent oracle, tagged by the same
    # discriminator the engine side emits
    reg: dict[str, str] = {}
    reg["topsig_sig_stats"] = parts["topsig_sig_stats"]
    reg["topsig_topk"] = _suite_sql(
        [
            ("direct", parts["topsig_topk"]),
            ("feedback", parts["topsig_feedback_topk"]),
        ],
        "mode",
    )
    # both block-max traversals are exact → rank-identical to TaaT on
    # the quantized index; one oracle certifies the quantum-ordered
    # heap (QaaT) and the θ₀-pruned WAND path alike
    reg["blockmax_topk"] = _suite_sql(
        [
            ("qaat_exact", parts["qaat_exact_topk"]),
            # WAND scores through the TaaT impact path (raw impact
            # sums); only the quantum path carries the 1+100·impact
            # add_rsv(double) scale
            ("wand", _quantized_sql()),
        ],
        "mode",
    )
    reg["pregen_recent_topk"] = _suite_sql(
        [
            ("recent", parts["pregen_recent_topk"]),
            ("strexact", _pregen_strexact_sql(TOP_K)),
            ("arith", _pregen_arith_sql(TOP_K)),
        ],
        "field",
    )
    reg["readable_topk"] = parts["readable_topk"]
    reg["bm25_quantized_topk"] = _suite_sql(
        [
            ("fixed8", parts["bm25_quantized_topk"]),
            ("auto", _quantized_sql(auto_bits=True)),
        ],
        "bits",
    )
    reg["boolean_topk"] = parts["boolean_topk"]
    reg["topk_materialized"] = parts["topk_materialized"]
    reg["focus_passages"] = _focus_sql(TOP_K)
    reg["stemmer_suite_map"] = _stemmer_suite_sql()
    reg["lmp_feedback_interpolated_topk"] = _lmp_feedback_interpolated_sql(
        TOP_K, FB_INTERP_DOCS
    )
    for suite, tags in _RANKER_SUITE_MEMBERS.items():
        reg[suite] = _suite_sql(
            [(t, parts[f"{t}_topk"]) for t in tags], "ranker"
        )
    reg.update(corpus_oracle_sql())
    for k in (
        "docmap",
        "collection_stats",
    ):
        reg[k] = parts[k]
    reg["postings_roundtrip"] = _suite_sql(
        [
            ("plain", parts["postings_roundtrip"]),
            # atire_reorder under the reversed permutation: every
            # posting survives with docid -> N-1-docid
            (
                "reordered",
                f"""WITH {_CORPUS_CTE}
SELECT t.term, s.n_docs - 1 - t.docid AS docid, t.tf
FROM tf t CROSS JOIN stats s""",
            ),
        ],
        "mode",
    )
    reg["term_stats"] = _suite_sql(
        [
            ("corpus", parts["term_stats"]),
            ("cjk_bigram", _cjk_term_stats_sql()),
        ],
        "mode",
    )
    reg["bm25_topk"] = _suite_sql(
        [
            ("k10", parts["bm25_topk"]),
            ("k100", parts["bm25_topk_k100"]),
            ("conjunctive", parts["bm25_conjunctive"]),
            # merged halves == monolithic build ⇒ the same oracle
            # certifies the whole atire_merge path
            ("merged", parts["bm25_topk"]),
            # broker scatter-gather: shard-LOCAL statistics + the
            # broker merge tie-break — a genuinely different oracle
            ("federated", _federated_bm25_sql(TOP_K)),
        ],
        "mode",
    )
    reg["bm25_streamed_topk"] = _suite_sql(
        [
            # streamed (two-append) index == batch build ⇒ same oracle
            ("ingest", parts["bm25_streamed_topk"]),
            # standing-query matcher (streaming query side): per-turn
            # mapInPandas scoring must land the identical fixed-point
            # ranking ⇒ the very same oracle certifies it
            ("standing", parts["bm25_streamed_topk"]),
        ],
        "mode",
    )
    reg["bm25_codecs_topk"] = _suite_sql(
        [
            ("simple9", parts["bm25_simple9_topk"]),
            ("simple8b_packed", parts["bm25_simple8b_packed_topk"]),
            ("carryover12", parts["bm25_carryover12_topk"]),
            ("elias_gamma", parts["bm25_elias_gamma_topk"]),
        ],
        "codec",
    )
    for k in (
        "bm25_stemmed_topk",
        "bm25_stopped_topk",
        "more_like_this_topk",
    ):
        reg[k] = parts[k]
    reg["nexi_topk"] = _suite_sql(
        [
            ("co_signed", parts["nexi_signed_topk"]),
            ("cas", _bm25_sql(TOP_K, values_sql=_NEXI_CAS_EXPECTED_VALUES)),
        ],
        "grammar",
    )
    reg["bm25_feedback_topk"] = _suite_sql(
        [
            ("kl", parts["bm25_feedback_kl_topk"]),
            ("rm", _feedback_rm_sql(TOP_K, FB_DOCS, FB_TERMS)),
        ],
        "method",
    )
    reg["expansion_topk"] = _suite_sql(
        [
            (
                "thesaurus_expanded",
                _bm25_sql(
                    TOP_K, values_sql=_thesaurus_expanded_values_sql()
                ),
            ),
            ("thesaurus_conflated", _thesaurus_conflated_sql(TOP_K)),
            ("stem_plain", _stem_iterator_sql(TOP_K, None)),
            (
                "stem_threshold",
                _stem_iterator_sql(TOP_K, "threshold", ITER_THRESHOLD),
            ),
            (
                "stem_weighted",
                _stem_iterator_sql(TOP_K, "weighted", ITER_WEIGHT),
            ),
        ],
        "mode",
    )
    reg["eval_suite"] = _eval_suite_sql(
        parts["eval_metrics"], parts["eval_intent_aware"]
    )
    reg["bm25_pruned_topk"] = _suite_sql(
        [
            ("single_term", parts["bm25_single_term_pruned"]),
            ("trimmed", parts["bm25_trimmed_topk"]),
            ("static_prune", parts["bm25_static_pruned"]),
        ],
        "mode",
    )
    reg["snippets"] = _snippets_suite_sql(parts)
    reg["bm25_rerank_topk"] = parts["bm25_rerank_topk"]
    reg["term_culling_stats"] = parts["term_culling_stats"]
    return reg


# DFI base contribution; _TAIL_ is replaced per variant (idf / w / both)
_DFI_CONTRIB = (
    "CAST(q.weight AS BIGINT) * (1 + CAST(trunc(("
    " (ln((CAST(t.tf AS DOUBLE)"
    "      - CAST(ts.cf AS DOUBLE)"
    "        * (CAST(d.doc_len AS DOUBLE) / CAST(s.coll_len AS DOUBLE)))"
    "     / sqrt(CAST(ts.cf AS DOUBLE)"
    "            * (CAST(d.doc_len AS DOUBLE) / CAST(s.coll_len AS DOUBLE)))"
    "     + 1) / ln(2.0))_TAIL_"
    ") * 100.0) AS BIGINT))"
)
_DFI_WHERE = (
    "WHERE CAST(t.tf AS DOUBLE)"
    " - CAST(ts.cf AS DOUBLE)"
    "   * (CAST(d.doc_len AS DOUBLE) / CAST(s.coll_len AS DOUBLE)) > 0"
)


def _lmds_sql(k: int) -> str:
    """LMDS oracle: per-(query, doc) the first term by (cf asc, term
    asc) contributes ``1 + trunc(100·(rsv + n·prior))`` for one of its
    occurrences, every other occurrence ``1 + trunc(100·rsv)``."""
    rsv = (
        "ln((CAST(t.tf AS DOUBLE) / 2500.0)"
        " * (CAST(s.coll_len AS DOUBLE) / CAST(ts.cf AS DOUBLE)) + 1.0)"
    )
    prior = "ln(2500.0 / (CAST(d.doc_len AS DOUBLE) + 2500.0))"
    return f"""
WITH RECURSIVE {_CORPUS_CTE},
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
qn AS (SELECT query_id, CAST(sum(weight) AS DOUBLE) AS n FROM q GROUP BY query_id),
scored AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, t.docid,
         CAST(q.weight AS BIGINT) AS weight,
         1 + CAST(trunc(({rsv}) * 100.0) AS BIGINT) AS unit,
         1 + CAST(trunc((({rsv}) + qn.n * ({prior})) * 100.0) AS BIGINT) AS unit_p,
         row_number() OVER (
           PARTITION BY q.query_id, t.docid ORDER BY ts.cf ASC, q.term ASC
         ) AS rn
  FROM q
  JOIN termstats ts USING (term)
  JOIN tf t USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
  JOIN qn ON qn.query_id = q.query_id
),
occs_w5 AS (
  -- exact is_zero_rsv replay: the prior fires on EVERY occurrence
  -- that finds the accumulator at zero (lmds.c:110-115), and the
  -- candidate-entry rule tracks 0->nonzero transitions per occurrence
  SELECT query_id, docid, unit, unit_p,
         row_number() OVER (
           PARTITION BY query_id, docid ORDER BY rn, _o.occ
         ) AS seq
  FROM scored, unnest(range(1, CAST(weight AS BIGINT) + 1)) AS _o(occ)
),
cnt_w5 AS (
  SELECT query_id, docid, max(seq) AS n FROM occs_w5 GROUP BY 1, 2
),
walk_w5(query_id, docid, seq, acc16, nz) AS (
  SELECT query_id, docid, CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0 FROM cnt_w5
  UNION ALL
  SELECT w.query_id, w.docid, w.seq + 1,
         ((w.acc16 + CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
           % 65536 + 65536) % 65536,
         CASE WHEN w.nz = 1
                OR ((CASE WHEN w.acc16 = 0 THEN o.unit_p ELSE o.unit END)
                    % 65536) <> 0
              THEN 1 ELSE 0 END
  FROM walk_w5 w
  JOIN occs_w5 o
    ON o.query_id = w.query_id AND o.docid = w.docid AND o.seq = w.seq + 1
),
acc AS (
  SELECT w.query_id AS query_id, w.docid AS docid,
         CAST(CASE WHEN w.acc16 >= 32768 THEN w.acc16 - 65536
                   ELSE w.acc16 END AS BIGINT) AS rsv_fixed
  FROM walk_w5 w
  JOIN cnt_w5 c
    ON c.query_id = w.query_id AND c.docid = w.docid AND w.seq = c.n
  WHERE w.nz = 1
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {k}
"""


def _quantized_sql(auto_bits: bool = False, qaat: bool = False) -> str:
    """Quantized-index BM25 oracle; ``auto_bits`` switches the scale
    from the fixed 8-bit 254.0 to the reference's automatic formula
    (memory_index.c:1553-1556, truncating C cast): bits =
    trunc(5.4 + 5.4e-4*sqrt(N)), scale = 2^bits - 2.

    ``qaat=True`` models the reference's quantum path, which routes
    each impact through add_rsv(double) — quantum_parameters.tf is a
    double — adding ``1 + 100*impact`` per hit where the TaaT impact
    ranker adds the raw impact (binary-verified, see
    SearchEngine.search_qaat)."""
    scale = (
        "(pow(2.0, trunc(5.4 + 5.4e-4 * sqrt(CAST(s2.n_docs AS DOUBLE))))"
        " - 2.0)"
        if auto_bits
        else "254.0"
    )
    stats_join = "CROSS JOIN stats s2" if auto_bits else ""
    hit_expr = (
        "sum(q.weight * (1 + 100 * i.impact))"
        if qaat
        else "sum(i.impact * q.weight)"
    )
    return f"""
WITH {_CORPUS_CTE},
scored_all AS (
  -- the quantizer's prior uses len+1 / mean+1: the index-side ranker
  -- reads the memory index's RAW length array, which stores length+1
  -- (search subtracts it back) — binary-verified, see
  -- atire_spark/kernels/quantize.raw_rsv
  SELECT t.term, t.docid,
         ln(CAST(s.n_docs AS DOUBLE) / CAST(ts.df AS DOUBLE))
           * ((CAST(t.tf AS DOUBLE) * (0.9 + 1.0))
              / (CAST(t.tf AS DOUBLE)
                 + CAST(CAST(0.9 * ((1.0 - 0.4)
                     + 0.4 * ((CAST(d.doc_len AS DOUBLE) + 1.0)
                              / (s.mean_len + 1.0)))
                   AS REAL) AS DOUBLE))) AS rsv
  FROM tf t
  JOIN termstats ts USING (term)
  JOIN docmap d USING (docid)
  CROSS JOIN stats s
),
qrange AS (SELECT min(rsv) AS qmin, max(rsv) AS qmax FROM scored_all),
impacts AS (
  SELECT term, docid,
         CAST(trunc(((rsv - qmin) / (qmax - qmin)) * {scale} + 1.0) AS BIGINT)
           AS impact
  FROM scored_all CROSS JOIN qrange {stats_join}
),
q(query_id, term, weight) AS (
  VALUES {_query_values_sql()}
),
acc AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, i.docid,
         CAST((((({hit_expr}) + 32768) % 65536 + 65536) % 65536) - 32768 AS BIGINT) AS rsv_fixed
  FROM q JOIN impacts i USING (term)
  GROUP BY q.query_id, i.docid
),
ranked AS (
  SELECT query_id,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY rsv_fixed DESC, docid DESC
         ) AS INTEGER) AS rank,
         docid, rsv_fixed
  FROM acc
)
SELECT query_id, rank, docid, rsv_fixed,
       CAST(rsv_fixed AS DOUBLE) / 100.0 AS rsv
FROM ranked WHERE rank <= {TOP_K}
"""
