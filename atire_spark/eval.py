"""IR effectiveness metrics over result + qrel DataFrames.

Re-expression of the reference's evaluator (/root/reference/source/
evaluator.c:126-260 metric registry; per-metric semantics cited per
function below). The reference evaluates one ranked list at a time
against bsearch'd qrels; here every metric is a single grouped
DataFrame computation over ALL queries at once — joins + window
functions, no per-row Python — so a million-query evaluation run is
one shuffle.

Inputs:
- ``results``: (query_id, rank, docid, ...) — rank 1-based, as
  produced by SearchEngine;
- ``qrels``: (query_id, docid, relevance) — graded relevance, the
  reference's ``relevant_characters`` (0 = judged irrelevant;
  unjudged documents are simply absent).

All metrics honor the reference's evaluation depth ``precision_point``
(default: no cap → the full result list; "@n" caps like evaluator.c's
``MAP@n`` suffixes) and average over the queries present in ``qrels``
— a topic with no relevant documents scores 0 and is excluded from
the valid-count, exactly like the ``*valid`` flag in evaluate().
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _joined(results: DataFrame, qrels: DataFrame, depth: int | None) -> DataFrame:
    r = results.select("query_id", "rank", "docid")
    if depth is not None:
        r = r.filter(F.col("rank") <= depth)
    return r.join(
        qrels.select(
            "query_id", "docid", F.col("relevance").cast("long").alias("rel")
        ),
        ["query_id", "docid"],
        "left",
    ).fillna({"rel": 0})


def _topic_stats(qrels: DataFrame) -> DataFrame:
    """Per-topic relevant/nonrelevant judged counts (relevant_topic
    setup, evaluation.c)."""
    return qrels.groupBy("query_id").agg(
        F.sum((F.col("relevance") > 0).cast("long")).alias("n_rel"),
        F.sum((F.col("relevance") == 0).cast("long")).alias("n_nonrel"),
        F.max("relevance").cast("long").alias("max_judgement"),
    )


def mean_average_precision(
    results: DataFrame, qrels: DataFrame, depth: int | None = None
) -> DataFrame:
    """MAP (evaluation_mean_average_precision.c:18-61): per query,
    sum over relevant retrieved docs of (found_so_far / rank), divided
    by the TOTAL number of relevant docs in the qrels (not just the
    retrieved ones). Returns (query_id, average_precision) — average
    the column for the mean."""
    j = _joined(results, qrels, depth)
    w = Window.partitionBy("query_id").orderBy("rank")
    per_doc = j.withColumn(
        "found", F.sum((F.col("rel") > 0).cast("long")).over(w)
    ).filter(F.col("rel") > 0)
    ap = per_doc.groupBy("query_id").agg(
        F.sum(F.col("found").cast("double") / F.col("rank")).alias("p_sum")
    )
    return (
        _topic_stats(qrels)
        .filter(F.col("n_rel") > 0)
        .join(ap, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("p_sum"), F.lit(0.0)) / F.col("n_rel")).alias(
                "average_precision"
            ),
        )
    )


def precision_at(results: DataFrame, qrels: DataFrame, n: int) -> DataFrame:
    """P@n (evaluation_precision_at_n.c): relevant in the first n /
    min(returned, n) — the reference divides by the number of results
    actually examined when fewer than n were returned."""
    j = _joined(results, qrels, n)
    agg = j.groupBy("query_id").agg(
        F.sum((F.col("rel") > 0).cast("long")).alias("found"),
        F.count("*").alias("examined"),
    )
    return (
        _topic_stats(qrels)
        .join(agg, "query_id", "left")
        .select(
            "query_id",
            (
                F.coalesce(F.col("found"), F.lit(0)).cast("double")
                / F.greatest(
                    F.least(F.coalesce(F.col("examined"), F.lit(0)), F.lit(n)),
                    F.lit(1),
                )
            ).alias(f"precision_at_{n}"),
        )
    )


def success_at(results: DataFrame, qrels: DataFrame, n: int) -> DataFrame:
    """S@n (evaluation_success_at_n.c): 1 if any relevant doc appears
    in the first n results."""
    j = _joined(results, qrels, n)
    agg = j.groupBy("query_id").agg(
        F.max((F.col("rel") > 0).cast("long")).alias("hit")
    )
    return (
        _topic_stats(qrels)
        .join(agg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hit"), F.lit(0)).cast("double").alias(
                f"success_at_{n}"
            ),
        )
    )


def bpref(
    results: DataFrame,
    qrels: DataFrame,
    depth: int | None = None,
    minimum: float = 0.0,
) -> DataFrame:
    """Binary preference (evaluation_binary_preference.c:16-60):

    per relevant retrieved doc, add
    ``1 - (minimum + min(nonrel_seen_before_it, R)) / (minimum + min(R, N))``
    then divide by R (R/N = judged relevant/nonrelevant counts).
    A topic with no judged nonrelevant docs scores a perfect 1.
    """
    j = _joined(results, qrels, depth)
    # only JUDGED docs drive bpref: nonrel_seen counts judged-irrelevant
    judged = j.join(
        qrels.select("query_id", "docid").distinct(), ["query_id", "docid"]
    )
    w = Window.partitionBy("query_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, -1
    )
    per_doc = judged.withColumn(
        "nonrel_before",
        F.coalesce(F.sum((F.col("rel") == 0).cast("long")).over(w), F.lit(0)),
    ).filter(F.col("rel") > 0)
    ts = _topic_stats(qrels).filter(F.col("n_rel") > 0)
    contrib = per_doc.join(ts, "query_id").groupBy("query_id").agg(
        F.sum(
            1.0
            - (
                (F.lit(minimum) + F.least(F.col("nonrel_before"), F.col("n_rel")))
                / (F.lit(minimum) + F.least(F.col("n_rel"), F.col("n_nonrel")))
            )
        ).alias("pref_sum")
    )
    return ts.join(contrib, "query_id", "left").select(
        "query_id",
        F.when(F.col("n_nonrel") == 0, F.lit(1.0))
        .otherwise(
            F.coalesce(F.col("pref_sum"), F.lit(0.0)) / F.col("n_rel")
        )
        .alias("bpref"),
    )


def ndcg(
    results: DataFrame,
    qrels: DataFrame,
    depth: int | None = None,
    trec_mode: bool = True,
    alpha: float = 0.5,
) -> DataFrame:
    """nDCG (evaluation_normalised_discounted_cumulative_gain.c +
    evaluation_discounted_cumulative_gain.c):

    gain(rel, rank) = (2^rel − 1) · (1−α)^rank   [TREC mode]
                    =  rel        · (1−α)^rank   [nDCGt mode]
    discount(rank)  = ln(2)/ln(rank+2)           [TREC mode]
                    = 1/log2(2+rank)             [nDCGt mode]
    with rank 0-based; α defaults to 0.5, i.e. (1-α)^rank halves each
    position exactly as the reference's default alpha does. The ideal
    gain sorts the topic's relevance grades descending and applies the
    same gain·discount at the same depth.
    """
    decay = 1.0 - alpha

    def gain_col(rel, rank0):
        g = (
            (F.pow(F.lit(2.0), rel) - 1.0)
            if trec_mode
            else rel.cast("double")
        )
        return g * F.pow(F.lit(decay), rank0)

    def discount_col(rank0):
        if trec_mode:
            return F.lit(math.log(2.0)) / F.log(rank0 + 2.0)
        return 1.0 / (F.log(2.0 + rank0) / F.lit(math.log(2.0)))

    j = _joined(results, qrels, depth).filter(F.col("rel") > 0)
    rank0 = (F.col("rank") - 1).cast("double")
    dcg = j.groupBy("query_id").agg(
        F.sum(gain_col(F.col("rel"), rank0) * discount_col(rank0)).alias("dcg")
    )
    # ideal: relevance grades sorted descending, same formula
    wi = Window.partitionBy("query_id").orderBy(F.col("relevance").desc())
    ideal = (
        qrels.filter(F.col("relevance") > 0)
        .withColumn("irank0", (F.row_number().over(wi) - 1).cast("double"))
    )
    if depth is not None:
        ideal = ideal.filter(F.col("irank0") < depth)
    idcg = ideal.groupBy("query_id").agg(
        F.sum(
            gain_col(F.col("relevance").cast("long"), F.col("irank0"))
            * discount_col(F.col("irank0"))
        ).alias("idcg")
    )
    return (
        _topic_stats(qrels)
        .filter(F.col("n_rel") > 0)
        .join(dcg, "query_id", "left")
        .join(idcg, "query_id")
        .select(
            "query_id",
            (F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("ndcg"),
        )
    )


def expected_reciprocal_rank(
    results: DataFrame, qrels: DataFrame, depth: int | None = None
) -> DataFrame:
    """ERR (evaluation_expected_reciprocal_rank.c:16-50):
    r_i = (2^rel − 1)/2^max_judgement; ERR = Σ r_i·decay/(rank),
    decay *= (1 − r_i) over the ranked judged docs.

    The sequential decay product is expressed as a window: decay at
    rank i = Π over earlier judged docs of (1 − r_j) =
    exp(Σ ln(1 − r_j)) — docs with r == 1 zero the decay afterwards.
    """
    j = _joined(results, qrels, depth)
    judged = j.join(
        qrels.select("query_id", "docid").distinct(), ["query_id", "docid"]
    )
    ts = _topic_stats(qrels)
    r = judged.join(ts, "query_id").withColumn(
        "r",
        (F.pow(F.lit(2.0), F.col("rel").cast("double")) - 1.0)
        / F.pow(F.lit(2.0), F.col("max_judgement").cast("double")),
    )
    w = Window.partitionBy("query_id").orderBy("rank").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # ln(1-r) of earlier docs; a saturated earlier doc (r==1) makes the
    # log -inf → exp gives decay 0, which is the right limit
    r = r.withColumn(
        "decay",
        F.coalesce(F.exp(F.sum(F.log(1.0 - F.col("r"))).over(w)), F.lit(1.0)),
    )
    err = r.groupBy("query_id").agg(
        F.sum(F.col("r") * F.col("decay") / F.col("rank")).alias("err_sum")
    )
    return (
        ts.filter(F.col("n_rel") > 0)
        .join(err, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("err_sum"), F.lit(0.0)).alias("err"),
        )
    )


def read_qrels(
    spark, path: str, fmt: str = "auto"
) -> DataFrame:
    """Assessment-file reader (assessment_factory.c:25-54 — format
    sniffed by separator count; TREC ``topic subtopic docno rel``
    per assessment_TREC.c, INEX ``topic Q0 docno relevant_characters
    document_length ...`` per assessment_INEX.c:58).

    Distributed: ``spark.read.text`` + column splits, so a
    million-line qrel file never passes through the driver. Returns
    (query_id, subtopic, doc, relevance[, doc_length]) with ``doc``
    the external document id — resolve to docids with
    :func:`qrels_with_docids`."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("v"))
        .filter(F.col("v") != "")
    )
    if fmt == "auto":
        first = lines.select("v").head()
        nsep = first["v"].count(" ") if first else 3
        fmt = "inex" if nsep >= 4 else "trec"
    parts = F.split(F.col("v"), r"\s+")
    if fmt == "trec":
        return lines.select(
            parts.getItem(0).cast("long").alias("query_id"),
            parts.getItem(1).cast("long").alias("subtopic"),
            parts.getItem(2).alias("doc"),
            parts.getItem(3).cast("long").alias("relevance"),
        )
    if fmt == "inex":
        return lines.select(
            parts.getItem(0).cast("long").alias("query_id"),
            F.lit(0).cast("long").alias("subtopic"),  # assessment_INEX.c:104
            parts.getItem(2).alias("doc"),
            parts.getItem(3).cast("long").alias("relevance"),
            parts.getItem(4).cast("long").alias("doc_length"),
        )
    raise ValueError(f"unknown qrel format {fmt!r}")


def qrels_with_docids(qrels: DataFrame, docmap: DataFrame) -> DataFrame:
    """Resolve external ``doc`` ids (``conv_id:turn_idx``, the
    engine's materialized form) against the index docmap — the
    reference's bsearch over the sorted doclist
    (assessment_TREC.c:55-70); assessments naming documents absent
    from the collection are dropped with the same semantics as the
    reference's warn-and-skip."""
    ext = docmap.select(
        F.concat_ws(
            ":", F.col("conv_id"), F.col("turn_idx").cast("string")
        ).alias("doc"),
        "docid",
    )
    return qrels.join(ext, "doc").drop("doc")


def rank_effectiveness(
    results: DataFrame, qrels: DataFrame, depth: int | None = None
) -> DataFrame:
    """Rank effectiveness (evaluation_rank_effectiveness.c:23-61,
    the corrected Büttcher et al. form): per relevant retrieved doc
    add ``1 − nonrelevant_seen_before / total_nonrelevant``; divide by
    the total relevant count. A topic whose judged documents are all
    relevant scores a perfect 1. Unjudged retrieved documents are
    skipped entirely (they advance the rank but neither count)."""
    r = results.select("query_id", "rank", "docid")
    if depth is not None:
        r = r.filter(F.col("rank") <= depth)
    j = r.join(
        qrels.select(
            "query_id",
            "docid",
            F.col("relevance").cast("long").alias("rel"),
            F.lit(1).alias("judged"),
        ),
        ["query_id", "docid"],
        "left",
    ).fillna({"rel": 0, "judged": 0})
    w = Window.partitionBy("query_id").orderBy("rank")
    per_doc = j.withColumn(
        "nonrel_seen",
        F.sum(((F.col("judged") == 1) & (F.col("rel") == 0)).cast("long")).over(
            w
        ),
    ).filter((F.col("judged") == 1) & (F.col("rel") > 0))
    stats = _topic_stats(qrels).filter(F.col("n_rel") > 0)
    acc = per_doc.join(
        stats.select("query_id", "n_nonrel"), "query_id"
    ).groupBy("query_id").agg(
        F.sum(
            1.0
            - F.col("nonrel_seen").cast("double")
            # n_nonrel == 0 takes the perfect-score branch below; the
            # greatest() only keeps ANSI mode from evaluating 0/0
            / F.greatest(F.col("n_nonrel"), F.lit(1)).cast("double")
        ).alias("re_sum")
    )
    return stats.join(acc, "query_id", "left").select(
        "query_id",
        F.when(F.col("n_nonrel") == 0, F.lit(1.0))
        .otherwise(
            F.coalesce(F.col("re_sum"), F.lit(0.0))
            / F.col("n_rel").cast("double")
        )
        .alias("rank_effectiveness"),
    )


MAGP_BETA = 0.25  # evaluation_mean_average_generalised_precision_document.c:24


def magp_document(
    results: DataFrame, qrels: DataFrame, depth: int | None = None
) -> DataFrame:
    """MAgP for whole documents
    (evaluation_mean_average_generalised_precision_document.c:17-76):
    graded qrels carry ``relevance`` = relevant characters and a
    ``doc_length``; each relevant retrieved document contributes an
    F-score (β=0.25, recall 1 since the whole document is retrieved)
    to a running generalised-found count, and precision accumulates
    ``found_so_far / rank``; divided by the total relevant count."""
    b2 = MAGP_BETA * MAGP_BETA
    r = results.select("query_id", "rank", "docid")
    if depth is not None:
        r = r.filter(F.col("rank") <= depth)
    j = r.join(
        qrels.select(
            "query_id",
            "docid",
            F.col("relevance").cast("double").alias("rel_chars"),
            F.col("doc_length").cast("double").alias("dlen"),
        ),
        ["query_id", "docid"],
        "inner",
    ).filter(F.col("rel_chars") > 0)
    p = F.col("rel_chars") / F.col("dlen")
    fsc = ((1.0 + b2) * p) / (b2 * p + 1.0)
    w = Window.partitionBy("query_id").orderBy("rank")
    per_doc = j.withColumn("found", F.sum(fsc).over(w))
    acc = per_doc.groupBy("query_id").agg(
        F.sum(F.col("found") / F.col("rank").cast("double")).alias("gp_sum")
    )
    stats = _topic_stats(qrels).filter(F.col("n_rel") > 0)
    return stats.join(acc, "query_id", "left").select(
        "query_id",
        (
            F.coalesce(F.col("gp_sum"), F.lit(0.0))
            / F.col("n_rel").cast("double")
        ).alias("magp"),
    )


def intent_aware(
    metric_fn,
    results: DataFrame,
    subtopic_qrels: DataFrame,
    *args,
    **kwargs,
) -> DataFrame:
    """Intent-aware wrapper
    (evaluation_intent_aware_mean_average_precision.c:17-41 and
    siblings): the base metric evaluated once per (topic, subtopic)
    against that subtopic's qrels, then the unweighted mean over the
    topic's subtopics. ``subtopic_qrels``: (query_id, subtopic, docid,
    relevance[, ...]).

    Implemented by re-keying (topic, subtopic) as a composite query id
    — the base metric's grouped computation then evaluates every
    subtopic of every topic in the same single pass. The returned
    ``query_id`` is the string form of the original id."""
    pairs = subtopic_qrels.select("query_id", "subtopic").distinct()
    comp = F.concat_ws("#", F.col("query_id").cast("string"), F.col("subtopic").cast("string"))
    exp_results = (
        results.join(pairs, "query_id")
        .withColumn("cq", comp)
        .drop("query_id", "subtopic")
        .withColumnRenamed("cq", "query_id")
    )
    exp_qrels = (
        subtopic_qrels.withColumn("cq", comp)
        .drop("query_id", "subtopic")
        .withColumnRenamed("cq", "query_id")
    )
    per_sub = metric_fn(exp_results, exp_qrels, *args, **kwargs)
    score_col = [c for c in per_sub.columns if c != "query_id"][0]
    split = F.split(F.col("query_id"), "#")
    sums = (
        per_sub.select(
            split.getItem(0).alias("query_id"),
            F.col(score_col).alias("s"),
        )
        .groupBy("query_id")
        .agg(F.sum("s").alias("s_sum"))
    )
    # divide by ALL of the topic's subtopics — a subtopic the base
    # metric marked invalid (no relevant docs) contributes 0 but still
    # counts (the reference's  precision / number_of_subtopics,
    # evaluation_intent_aware_mean_average_precision.c:36-38)
    n_subs = (
        pairs.withColumn("q", F.col("query_id").cast("string"))
        .groupBy("q")
        .agg(F.count("*").alias("n_subtopics"))
        .withColumnRenamed("q", "query_id")
    )
    return n_subs.join(sums, "query_id", "left").select(
        "query_id",
        (
            F.coalesce(F.col("s_sum"), F.lit(0.0))
            / F.col("n_subtopics").cast("double")
        ).alias(f"ia_{score_col}"),
    )


def evaluate(
    results: DataFrame,
    qrels: DataFrame,
    metrics: tuple[str, ...] = ("MAP", "P@10", "S@10", "bpref", "nDCG", "ERR"),
    depth: int | None = None,
) -> DataFrame:
    """One row per query with every requested metric — the reference's
    ``-m<metric>`` multi-metric evaluation (evaluator.c:126-260)."""
    out = None
    for m in metrics:
        if m == "MAP":
            df = mean_average_precision(results, qrels, depth)
        elif m.startswith("P@"):
            df = precision_at(results, qrels, int(m[2:]))
        elif m.startswith("S@"):
            df = success_at(results, qrels, int(m[2:]))
        elif m == "bpref":
            df = bpref(results, qrels, depth)
        elif m == "nDCG":
            df = ndcg(results, qrels, depth)
        elif m == "nDCGt":
            df = ndcg(results, qrels, depth, trec_mode=False)
        elif m == "ERR":
            df = expected_reciprocal_rank(results, qrels, depth)
        elif m == "RE":
            df = rank_effectiveness(results, qrels, depth)
        else:
            raise ValueError(f"unknown metric {m!r}")
        out = df if out is None else out.join(df, "query_id", "outer")
    return out.orderBy("query_id")


# ---------------------------------------------------------------------------
def kendall_tau(pairs) -> float:
    """Kendall's tau-b between two score lists over the same documents
    — the reference's pregen-ordering comparison
    (source/pregen_kendall_tau.c:116-190, the O(n log n) Knight 1966
    method it cites): sort by (score1 desc, score2 desc), count the
    merge-sort swaps needed to order score2 descending, apply the
    tie-correction factors 2n1/2n2 and the reference's
    "jointly-tied blocks" 2n3 reading (:164-179, counted over
    consecutive runs tied on BOTH keys in the (s1, s2) sort).

    tau = ((2n0 − 2n1 − 2n2 + 2n3)/2 − 2·swaps)
          / sqrt((2n0 − 2n1)(2n0 − 2n2) / 4)

    ``pairs``: iterable of (score1, score2).
    """
    docs = sorted(pairs, key=lambda p: (-p[0], -p[1]))
    n = len(docs)
    twice_n0 = n * (n - 1)

    def _twice_ties(key) -> int:
        total, i = 0, 0
        while i < n - 1:
            j = i + 1
            while j < n and key(docs[i]) == key(docs[j]):
                j += 1
            ties = j - i
            if ties > 1:
                total += ties * (ties - 1)
            i = j
        return total

    twice_n1 = _twice_ties(lambda p: p[0])
    twice_n3 = _twice_ties(lambda p: (p[0], p[1]))

    # merge-sort swap count ordering score2 descending (:49-111)
    def _sort(lst):
        if len(lst) <= 1:
            return lst, 0
        mid = len(lst) // 2
        left, s1 = _sort(lst[:mid])
        right, s2 = _sort(lst[mid:])
        merged, swaps, i, j = [], s1 + s2, 0, 0
        while i < len(left) or j < len(right):
            if i >= len(left) or (
                j < len(right) and right[j][1] > left[i][1]
            ):
                swaps += len(left) - i
                merged.append(right[j])
                j += 1
            else:
                merged.append(left[i])
                i += 1
        return merged, swaps

    docs, swaps = _sort(docs)
    twice_n2 = _twice_ties(lambda p: p[1])

    numerator = (twice_n0 - twice_n1 - twice_n2 + twice_n3) // 2 - 2 * swaps
    denominator = math.sqrt(
        (twice_n0 - twice_n1) * (twice_n0 - twice_n2) / 4.0
    )
    return numerator / denominator


def kendall_tau_df(
    scores: DataFrame,
    col1: str,
    col2: str,
    by: str | None = None,
) -> DataFrame:
    """Distributed wrapper: tau-b per ``by`` group (or one global row)
    over a (…, col1, col2) frame — one applyInPandas pass, each group
    the size of a result list, exactly the per-pregen-pair comparison
    the reference runs in RAM."""
    import pandas as pd

    group_col = by or "_g"
    src = (
        scores
        if by is not None
        else scores.withColumn("_g", F.lit(0))
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        tau = kendall_tau(list(zip(pdf[col1], pdf[col2])))
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]], "tau": [tau]})

    out = src.select(group_col, col1, col2).groupBy(group_col).applyInPandas(
        fn, schema=f"{group_col} long, tau double"
    )
    return out if by is not None else out.select("tau")
