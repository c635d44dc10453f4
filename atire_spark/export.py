"""Run-file exporters — TREC and INEX-snippet result formats.

The reference serialises ranked results into evaluation-forum run
files (atire/atire_engine_result_set_export_TREC.c:31-51 and
atire/atire_engine_result_set_export_INEX_snippet.c:36-100); atire.c
selects them with `-e TREC|INEX`.  Here each exporter is a pure
column expression over the materialized result frame (docid already
joined back to its external id), so the formatting runs JVM-side in
whole-stage codegen and the run file is a single-column DataFrame the
caller writes with `df.write.text(...)` — a distributed sink, not a
driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["external_id", "export_trec", "export_inex_snippet"]


def external_id(materialized: DataFrame) -> DataFrame:
    """Attach the external document name column.

    The reference's external ID is the source filename / <DOCNO>
    (FILENAME_INDEX, GNUmakefile.defns:70); for the transcripts table
    the stable external identity is ``conv_id:turn_idx``.
    """
    return materialized.withColumn(
        "name", F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))
    )


def export_trec(
    materialized: DataFrame,
    run_name: str = "Unknown",
    first: int = 1,
    page_length: int | None = None,
    full: bool = False,
) -> DataFrame:
    """TREC run format, one line per result:

        ``topic Q0 docno rank rsv run_name``

    per atire_engine_result_set_export_TREC.c:43-49 (rsv is the
    fixed-point accumulator value the engine serialises, and the
    printed rank is the absolute 1-based rank — ``current + 1`` —
    even when paging with ``first``/``page_length``,
    atire_engine_result_set_export_TREC.c:38-42).

    Returns (query_id, rank, line); callers wanting the bare run file
    select ``line`` and ``write.text``.  With ``full=True`` every
    input column is kept alongside ``line``.
    """
    out = external_id(materialized)
    if first > 1:
        out = out.filter(F.col("rank") >= first)
    if page_length is not None:
        out = out.filter(F.col("rank") < first + page_length)
    line = F.concat_ws(
        " ",
        F.col("query_id"),
        F.lit("Q0"),
        F.col("name"),
        F.col("rank"),
        F.col("rsv_fixed"),
        F.lit(run_name),
    ).alias("line")
    if full:
        return out.select("*", line).drop("name")
    return out.select("query_id", "rank", line)


def _inex_doc_id(name_col):
    """INEX doc-id = external name minus any directory prefix and
    minus the first '.'-suffix after it
    (atire_engine_result_set_export_INEX_snippet.c:61-82: take the
    max of the positions after the last '/' and '\\\\', then truncate
    at the first '.')."""
    base = F.element_at(F.split(name_col, r"[/\\]"), -1)
    return F.element_at(F.split(base, r"\."), 1)


def export_inex_snippet(
    materialized: DataFrame,
    participant_id: str = "Unknown",
    run_id: str = "Unknown",
    description: str = "Unknown",
    snippet_col: str | None = None,
    title_col: str | None = None,
) -> DataFrame:
    """INEX snippet-track XML run
    (atire_engine_result_set_export_INEX_snippet.c:36-108).

    Returns one row per output line with a global ``seq`` ordering
    column: preamble lines, then per-topic ``<topic>`` blocks in
    topic order with each ``<snippet rsv=".." doc-id="..">`` line in
    rank order, then the postamble.  Line content per result:
    snippet if present, else title, else empty (``:86-93``).

    The seq encoding (topic-major, rank-minor, with header/footer
    sentinels) keeps the whole construction a union of column
    expressions — sortable and writable distributively.
    """
    out = external_id(materialized)
    body_text = F.lit("")
    if title_col is not None:
        body_text = F.coalesce(F.col(title_col), body_text)
    if snippet_col is not None:
        body_text = F.coalesce(F.col(snippet_col), body_text)

    qid = F.col("query_id").cast("long")
    # per-topic block: header (rank 0), snippets (rank 1..), footer
    header = out.groupBy("query_id").agg(F.min("rank").alias("_r")).select(
        qid.alias("qid"),
        F.lit(0).alias("r"),
        F.concat(
            F.lit('<topic topic-id="'), F.col("query_id"), F.lit('">')
        ).alias("line"),
    )
    rows = out.select(
        qid.alias("qid"),
        F.col("rank").alias("r"),
        F.concat(
            F.lit('   <snippet rsv="'),
            F.col("rsv_fixed"),
            F.lit('" doc-id="'),
            _inex_doc_id(F.col("name")),
            F.lit('">'),
            body_text,
            F.lit("</snippet>"),
        ).alias("line"),
    )
    footer = out.groupBy("query_id").agg(F.max("rank").alias("mr")).select(
        qid.alias("qid"),
        (F.col("mr") + 1).alias("r"),
        F.lit("</topic>").alias("line"),
    )
    spark = materialized.sparkSession
    pre = spark.createDataFrame(
        [
            (
                -1,
                0,
                f'<inex-snippet-submission participant-id="{participant_id}"'
                f' run-id="{run_id}">',
            ),
            (-1, 1, f"<description>{description}</description>"),
        ],
        "qid LONG, r INT, line STRING",
    )
    post = spark.createDataFrame(
        [(2**62, 0, "</inex-snippet-submission>")],
        "qid LONG, r INT, line STRING",
    )
    return (
        pre.unionByName(header)
        .unionByName(rows)
        .unionByName(footer)
        .unionByName(post)
        .select("qid", "r", "line")
    )
