"""Snippet generation — result-page text extracts.

Re-expression of the reference's snippet makers
(/root/reference/source/snippet_factory.c:19-46) — all SEVEN
algorithms, as pure DataFrame pipelines over the whole corpus at once
(the reference generates one snippet per displayed result; a Spark
engine snippets millions of rows per pass). The transcripts corpus is
untagged, so the three tag-anchored variants (SNIPPET_TITLE,
SNIPPET_BEST_TFICF_TAG, SNIPPET_BEST_TF_TAG — at the bottom of this
module) run over the same deterministic tagged rendering the INEX
focusing module uses; the other four:

- ``snippet_beginning``  (snippet_beginning.c): the document's opening
  text, whitespace-deduplicated, first N characters;
- ``snippet_window_tf``  (snippet_tf.h / snippet_tficf.c:34-37 with
  weight 1): best sliding window by number of query-term hits;
- ``snippet_window_tficf`` (snippet_tficf.c:30-33): hits weighted by
  ln(collection_length / cf(term));
- ``snippet_kl_cloud``   (snippet_word_cloud.c): the document's top-N
  KL-divergence terms, the same p·ln(p/q) selection relevance
  feedback uses.

Adaptation (documented deviation): the reference slides a
character-width window over the raw text and centres the hits
(snippet_tficf.c:85-120); we slide a TOKEN-width window and return
the window's tokens joined by single spaces. Scoring semantics
(sum of hit weights in a fixed-width window, first-best wins,
snippet_tficf.c:93-103) are preserved; only the unit of width and the
surrounding-text reconstruction differ — both deterministic and
SQL-expressible, which keeps every algorithm under the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE_SQL = "[a-z]+|[0-9]+"  # the document tokenizer's classes
WORD_RE_SQL = "[a-z]+"  # TT_WORD only (KL cloud, feedback)


def snippet_beginning(docs: DataFrame, length: int = 80) -> DataFrame:
    """First ``length`` characters of the whitespace-normalized text
    (snippet_beginning.c get_snippet + strip_duplicate_space_inline,
    degraded to doc start for untagged plain text)."""
    return docs.select(
        "doc_id",
        F.substring(
            F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), 1, length
        ).alias("snippet"),
    )


def _token_positions(docs: DataFrame, pattern: str) -> DataFrame:
    """(doc_id, pos, term) — 0-based token positions."""
    return docs.select(
        "doc_id",
        F.posexplode(
            F.expr(f"regexp_extract_all(lower(text), '{pattern}', 0)")
        ).alias("pos", "term"),
    )


def snippet_window(
    docs: DataFrame,
    term_weights: dict[str, float],
    window_tokens: int = 12,
) -> DataFrame:
    """Best fixed-width window by summed hit weight
    (snippet_tficf.c:93-120): for every window start, score = Σ weight
    of query-term occurrences inside; highest score wins, ties to the
    earliest window (the reference's strict ``>`` comparison). Only
    documents with at least one hit produce a row (with no hits the
    reference's window is start-of-hit-array garbage; we omit).

    Returns (doc_id, start, score, snippet).
    """
    spark = docs.sparkSession
    toks = _token_positions(docs, TOKEN_RE_SQL)
    wts = spark.createDataFrame(
        [(t, float(w)) for t, w in term_weights.items()],
        "term string, weight double",
    )
    scored = toks.join(F.broadcast(wts), "term", "left").fillna(
        {"weight": 0.0}
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, window_tokens - 1)
    )
    windows = scored.select(
        "doc_id",
        F.col("pos").alias("start"),
        F.sum("weight").over(w).alias("score"),
    )
    best = (
        windows.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), F.col("start").asc()
                )
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("score") > 0))
        .select("doc_id", "start", F.round("score", 9).alias("score"))
    )
    text = toks.join(best, "doc_id").filter(
        (F.col("pos") >= F.col("start"))
        & (F.col("pos") < F.col("start") + window_tokens)
    )
    snip = text.groupBy("doc_id", "start", "score").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("term")))
                ),
                lambda x: x.term,
            ),
        ).alias("snippet")
    )
    return snip.select("doc_id", "start", "score", "snippet")


def tficf_weights(
    terms: list[str], term_stats: DataFrame, collection_len: int
) -> dict[str, float]:
    """tf·icf hit weights: ln(|C| / cf) per query term
    (snippet_tficf.c:30-33); terms absent from the collection cannot
    hit, so they are dropped."""
    import math

    rows = (
        term_stats.filter(F.col("term").isin(terms))
        .select("term", "cf")
        .distinct()
        .collect()
    )
    return {
        r["term"]: math.log(collection_len / int(r["cf"])) for r in rows
    }


def snippet_kl_cloud(
    docs: DataFrame,
    term_stats: DataFrame,
    collection_len: int,
    cloud_terms: int = 5,
) -> DataFrame:
    """KL word cloud (snippet_word_cloud.c): each document's
    ``cloud_terms`` highest-KL words (p = tf_doc/len_doc over WORD
    tokens only, q = cf/|C| or 1/|C| unseen, kl = p·ln(p/q) — the
    relevance-feedback selection per document), joined in (kl desc,
    term asc) order. One grouped pass over the corpus."""
    toks = _token_positions(docs, WORD_RE_SQL)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dlen = toks.groupBy("doc_id").agg(F.count("*").alias("dlen"))
    kl = (
        tf.join(dlen, "doc_id")
        .join(
            term_stats.select("term", "cf").distinct(), "term", "left"
        )
        .select(
            "doc_id",
            "term",
            (
                (F.col("tf").cast("double") / F.col("dlen"))
                * F.log(
                    (F.col("tf").cast("double") / F.col("dlen"))
                    / F.when(
                        F.col("cf").isNull(),
                        F.lit(1.0) / F.lit(float(collection_len)),
                    ).otherwise(
                        F.col("cf").cast("double")
                        / F.lit(float(collection_len))
                    )
                )
            ).alias("kl"),
        )
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(
            F.col("kl").desc(), F.col("term").asc()
        )
    )
    top = kl.withColumn("rn", rn).filter(F.col("rn") <= cloud_terms)
    return top.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rn"), F.col("term")))
                ),
                lambda x: x.term,
            ),
        ).alias("cloud")
    )


# -------------------------------------------------- tag-anchored trio
TAG_TOKENS = 8  # focus.tag_document's paragraph width — shared rendering


def snippet_first_tag(docs: DataFrame, length: int = 80) -> DataFrame:
    """SNIPPET_TITLE (snippet_tag.c:33-76 ``get_snippet``): the snippet
    begins at the *contents* of the first occurrence of the anchor
    tag; XML_to_text then runs to the document end and the first
    ``length`` characters are kept, duplicate spaces stripped.

    The transcripts corpus is untagged, so documents pass through the
    same deterministic tagged rendering INEX focusing uses
    (focus.tag_document), extended with a ``<title>`` element carrying
    the document's source label:
    ``<doc><title>{source}</title><p>{text}</p></doc>``. The
    scan-for-tag → strip-tags → truncate machinery runs literally
    (locate + regexp over the rendered string), so a natively tagged
    corpus works unchanged; only the rendering is synthetic.
    """
    t = docs.withColumn(
        "tagged",
        F.concat(
            F.lit("<doc><title>"),
            F.col("source"),
            F.lit("</title><p>"),
            F.col("text"),
            F.lit("</p></doc>"),
        ),
    )
    return t.select(
        "doc_id",
        F.substring(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.expr(
                            "substring(tagged,"
                            " locate('<title>', tagged) + 7)"
                        ),
                        r"<[^>]*>",
                        " ",
                    ),
                    r"\s+",
                    " ",
                )
            ),
            1,
            length,
        ).alias("snippet"),
    )


def snippet_best_tag(
    docs: DataFrame,
    term_weights: dict[str, float],
    length: int = 80,
    tag_tokens: int = TAG_TOKENS,
) -> DataFrame:
    """SNIPPET_BEST_TFICF_TAG / SNIPPET_BEST_TF_TAG
    (snippet_best_tag.c:25-115; the _tf variant is the same scan with
    hit weight 1, snippet_best_tag_tf.h): every instance of the anchor
    tag is scored by the summed hit weight of the query terms inside
    it; the instance with the strictly highest score wins
    (``score > best_score`` — ties go to the earliest instance, and
    ``best_score`` starts at 0 so a hitless document keeps
    ``best_start = document`` head, title included); the snippet is
    XML_to_text from the winner to the document end, truncated.

    Rendering adaptation (shared with focusing/window snippets):
    paragraph instances are tag_document's deterministic
    ``tag_tokens``-token chunks, so "inside the i-th tag" = token
    positions [i·w, (i+1)·w); the snippet is token-joined text
    (the module's documented unit-of-width adaptation).

    Returns (doc_id, start = winning paragraph index, score, snippet);
    hitless documents emit (0, 0.0, head-of-document snippet).
    """
    spark = docs.sparkSession
    toks = _token_positions(docs, TOKEN_RE_SQL).withColumn(
        "para", (F.col("pos") / F.lit(tag_tokens)).cast("long")
    )
    wts = spark.createDataFrame(
        [(t, float(w)) for t, w in term_weights.items()],
        "term string, weight double",
    )
    scores = (
        toks.join(F.broadcast(wts), "term")
        .groupBy("doc_id", "para")
        .agg(F.round(F.sum("weight"), 9).alias("score"))
    )
    best = (
        scores.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score").desc(), F.col("para").asc()
                )
            ),
        )
        .filter((F.col("rn") == 1) & (F.col("score") > 0))
        .select("doc_id", F.col("para").alias("start"), "score")
    )
    joined_from = (
        toks.join(best, "doc_id")
        .filter(F.col("para") >= F.col("start"))
        .groupBy("doc_id", "start", "score")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("term")))
                    ),
                    lambda x: x.term,
                ),
            ).alias("body")
        )
        .select(
            "doc_id",
            "start",
            "score",
            F.substring("body", 1, length).alias("snippet"),
        )
    )
    # hitless fallback: best_start = the document head of the tagged
    # rendering — title (source) then every paragraph
    fallback = (
        docs.join(best.select("doc_id"), "doc_id", "left_anti")
        .join(
            toks.groupBy("doc_id").agg(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.col("pos"), F.col("term"))
                            )
                        ),
                        lambda x: x.term,
                    ),
                ).alias("body")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.lit(0).cast("long").alias("start"),
            F.lit(0.0).alias("score"),
            F.substring(
                F.when(
                    F.coalesce(F.col("body"), F.lit("")) == "",
                    F.col("source"),
                ).otherwise(F.concat_ws(" ", "source", "body")),
                1,
                length,
            ).alias("snippet"),
        )
    )
    return joined_from.unionByName(fallback)
