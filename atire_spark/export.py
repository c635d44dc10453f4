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

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "external_id",
    "export_trec",
    "export_inex_snippet",
    "export_inex_element",
    "export_inex_efficiency",
    "export_inex_focus",
]


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


def _topic_blocks(
    spark, out: DataFrame, pre_lines: list[str], post_line: str,
    header_line, row_lines: list, footer_line,
) -> DataFrame:
    """Assemble a line-per-row run document: fixed preamble, then one
    block per topic (header / per-result line groups in rank order /
    footer), then the postamble.  ``row_lines`` is a list of column
    expressions — each result contributes len(row_lines) consecutive
    lines, sequenced by (qid, rank, sub)."""
    qid = F.col("query_id").cast("long")
    n_sub = len(row_lines)
    # header attributes (timings etc.) are constant per topic — carry
    # them through the group so header_line can reference any column
    header = (
        out.groupBy("query_id")
        .agg(
            *[
                F.first(c).alias(c)
                for c in out.columns
                if c != "query_id"
            ]
        )
        .select(qid.alias("qid"), F.lit(0).cast("long").alias("r"), header_line.alias("line"))
    )
    row_parts = [
        out.select(
            qid.alias("qid"),
            (F.col("rank") * n_sub + i).cast("long").alias("r"),
            expr.alias("line"),
        )
        for i, expr in enumerate(row_lines)
    ]
    footer = out.groupBy("query_id").agg(F.max("rank").alias("mr")).select(
        qid.alias("qid"),
        ((F.col("mr") + 1) * n_sub).cast("long").alias("r"),
        footer_line.alias("line"),
    )
    pre = spark.createDataFrame(
        [(-1, i, ln) for i, ln in enumerate(pre_lines)],
        "qid LONG, r LONG, line STRING",
    )
    post = spark.createDataFrame(
        [(2**62, 0, post_line)], "qid LONG, r LONG, line STRING"
    )
    doc = pre.unionByName(header)
    for p in row_parts:
        doc = doc.unionByName(p)
    return doc.unionByName(footer).unionByName(post).select(
        "qid", "r", "line"
    )


def export_inex_element(
    materialized: DataFrame,
    participant_id: str = "Unknown",
    run_id: str = "Unknown",
    task: str = "adhoc",
) -> DataFrame:
    """INEX ad-hoc element-result submission
    (source/search_engine_forum_INEX.c:14-21,103-137): XML preamble
    with the reference's fixed topic-fields/collections block, then
    per topic a ``<result>`` of ``<file>name</file>``, the hardcoded
    ``<path>/article[1]</path>`` (whole-article results, :130), and a
    0-based ``<rank>``."""
    out = external_id(materialized)
    pre = [
        f'<inex-submission participant-id="{participant_id}" '
        f'run-id="{run_id}" task="{task}" query="automatic" '
        f'result-type="element">',
        '<topic-fields title="yes" castitle="no" description="no" '
        'narrative="no"/>',
        "<description>None</description>",
        "<collections>",
        "<collection>wikipedia</collection>",
        "</collections>",
    ]
    rows = [
        F.lit("<result>"),
        F.concat(F.lit("<file>"), _inex_doc_id(F.col("name")), F.lit("</file>")),
        F.lit("<path>/article[1]</path>"),
        F.concat(
            F.lit("<rank>"), F.col("rank") - 1, F.lit("</rank></result>")
        ),
    ]
    return _topic_blocks(
        materialized.sparkSession,
        out,
        pre,
        "</inex-submission>",
        F.concat(F.lit('<topic topic-id="'), F.col("query_id"), F.lit('">')),
        rows,
        F.lit("</topic>"),
    )


def export_inex_efficiency(
    materialized: DataFrame,
    participant_id: str = "Unknown",
    run_id: str = "Unknown",
    topk: int = 10,
    topic_stats: DataFrame | None = None,
) -> DataFrame:
    """INEX efficiency-track submission
    (source/search_engine_forum_INEX_efficiency.c:23-111): the header
    carries the run's hardware/topk attributes, each topic block its
    cpu/io timing attributes (pass per-topic ``topic_stats`` with
    columns query_id, cpu_time_ms, io_time_ms, io_bytes; defaults 0),
    and each result the descending surrogate ``<rsv>hits-which</rsv>``
    — including the reference's literal ``<path>/article[1]></path>``
    stray ``>`` (:100)."""
    out = external_id(materialized)
    if topic_stats is not None:
        out = out.join(topic_stats, "query_id", "left")
    for c in ("cpu_time_ms", "io_time_ms", "io_bytes"):
        if c not in out.columns:
            out = out.withColumn(c, F.lit(0).cast("long"))
    out = out.fillna(0, subset=["cpu_time_ms", "io_time_ms", "io_bytes"])
    out = out.withColumn(
        "hits", F.max("rank").over(Window.partitionBy("query_id"))
    )
    pre = [
        f'<efficiency-submission  participant-id = "{participant_id}"'
        f' run-id = "{run_id}" task = "adhoc" type = "article"'
        ' query = "automatic" sequential = "yes" no_cpu = "8"'
        ' ram = "8GB" no_nodes = "1" hardware_cost = "3000NZD"'
        f' hardware_year = "2008" topk = "{topk}"'
        ' index_size_bytes = "0" indexing_time_sec = "0">',
        '<topic-fields co_title = "yes" cas_title = "no"'
        ' xpath_title = "no" text_predicates = "no"'
        ' description = "no" narrative = "no" />',
    ]
    header = F.concat(
        F.lit('<topic topic-id = "'),
        F.col("query_id"),
        F.lit('" total_time_ms = "'),
        F.col("cpu_time_ms") + F.col("io_time_ms"),
        F.lit('" cpu_time_ms = "'),
        F.col("cpu_time_ms"),
        F.lit('" io_time_ms = "'),
        F.col("io_time_ms"),
        F.lit('" io_bytes = "'),
        F.col("io_bytes"),
        F.lit('">'),
    )
    rows = [
        F.lit("<result>"),
        F.concat(F.lit("<file>"), _inex_doc_id(F.col("name")), F.lit("</file>")),
        F.lit("<path>/article[1]></path>"),
        F.concat(F.lit("<rank>"), F.col("rank") - 1, F.lit("</rank>")),
        F.concat(
            F.lit("<rsv>"),
            F.col("hits") - (F.col("rank") - 1),
            F.lit("</rsv></result>"),
        ),
    ]
    return _topic_blocks(
        materialized.sparkSession,
        out,
        pre,
        "</efficiency-submission>",
        header,
        rows,
        F.lit("</topic>"),
    )


def export_inex_focus(
    focused: DataFrame,
    docmap: DataFrame,
    run_id: str = "Unknown",
    bep: bool = False,
) -> DataFrame:
    """Focused-retrieval run lines over :func:`atire_spark.focus.
    focus_results` output with ``inex_offsets=True``:

        ``topic Q0 name rank (hits-rank+1) run inex_start inex_finish``

    per source/search_engine_forum_INEX_focus.c:24-41 (the rsv field
    is the descending surrogate ``hits - which``); ``bep=True`` drops
    the finish column — the best-entry-point format
    (source/search_engine_forum_INEX_bep.c:24-41)."""
    out = focused.join(
        docmap.select("docid", "conv_id", "turn_idx"), "docid"
    )
    out = external_id(out).withColumn(
        "hits", F.max("rank").over(Window.partitionBy("query_id"))
    )
    cols = [
        F.col("query_id"),
        F.lit("Q0"),
        F.col("name"),
        F.col("rank"),
        F.col("hits") - (F.col("rank") - 1),
        F.lit(run_id),
        F.col("inex_start"),
    ]
    if not bep:
        cols.append(F.col("inex_finish"))
    return out.select(
        "query_id", "rank", F.concat_ws(" ", *cols).alias("line")
    )
