"""Pregen score tables — the pregen writer family, Spark-side.

Produces the (docid, score) tables :meth:`atire_spark.query.
SearchEngine.search_pregen` ranks by, from a per-document field
column:

- the "normal" closed-form generators (integer / bintrunc /
  recentdate / the six radix string packings / the four
  arithmetic-coded packings) run the kernels
  (:mod:`atire_spark.kernels.pregen`,
  :mod:`atire_spark.kernels.arith`) vectorized in one Arrow pass —
  map-only, no shuffle; arith models are fixed tables (reference
  default or :func:`train_arith_model`-trained), broadcast by
  closure;
- the "exact" writers (``strexact`` / ``strexact_restricted`` /
  ``integerexact``) assign ordinal ranks over the whole collection —
  one global sort, exactly the reference's in-RAM std::sort
  (pregen_writer_exact_strings.c:182-206,
  pregen_writer_exact_integers.c:104-119): strings get a DENSE rank
  (equal strings share an rsv, ":199 don't increase RSV if this
  string is the same as the previous"), integers an ordinal row
  number, both starting at 1.

Faithfulness note: the reference's exact close_write() emits the rank
stream in SORTED order while the .pregen format is docid-ordered —
``exact_strings[i].first`` (the docid) is never consulted — so a
literal port would scramble the docid→score association.  We
implement the evident intent (docid → rank of ITS OWN field value);
tie order inside equal integer values is pinned to docid for
determinism where std::sort leaves it unspecified.

``bits`` defaults to 63 so every score fits a Spark/DuckDB BIGINT —
``ANT_PREGEN_T`` is the reference's own compile-time width knob
(pregen_t.h:9-13).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf

from atire_spark.kernels.pregen import RADIX_SCHEMES, encode_field

__all__ = ["pregen_scores", "train_arith_model", "EXACT_TYPES"]

EXACT_TYPES = ("strexact", "strexact_restricted", "integerexact")


def _encoded_bytes_col(field_col: str, restricted: bool):
    """The exact-strings comparison key: per-character lowercase +
    per-byte encode under base37 (restricted) or printable-ascii,
    skipping unencodable bytes and collapsing spaces
    (pregen_writer_exact_strings.c:110-170).  Returned as BINARY so
    Spark's unsigned-lexicographic ordering equals the reference's
    memcmp-then-length ``exact_str_less`` (:40-54)."""
    from atire_spark.kernels.pregen import CHAR_ENCODE_FAIL, normalize_lowercase

    _, enc = RADIX_SCHEMES["base37" if restricted else "asciiprintables"]
    enc_space = enc(0x20)

    def one(s: str) -> bytes:
        out = bytearray()
        prev_space = True
        for ch in s or "":
            for b in normalize_lowercase(ch).encode("utf-8"):
                e = enc(b)
                if e == CHAR_ENCODE_FAIL:
                    continue
                if e == enc_space:
                    if prev_space:
                        continue
                    prev_space = True
                else:
                    prev_space = False
                out.append(e)
        return bytes(out)

    @pandas_udf("binary")
    def fn(col: pd.Series) -> pd.Series:
        return col.map(one)

    return fn(F.col(field_col))


def train_arith_model(
    docs: DataFrame, field_col: str, field_type: str
) -> tuple:
    """Corpus-trained arithmetic-model table — the
    tools/arithmetic_encoding_model_gen.c analogue, Spark-first.

    The tool walks every field character (lowercased, encoder-mapped,
    encode-failures skipped, NO space collapsing, bigram context reset
    per document) and renders the trained frequency table.  Here the
    per-row symbol walk runs vectorized in ``mapInPandas`` emitting
    partial (symbol, count) rows per Arrow batch — map-side combine —
    and one tiny groupBy-sum shuffle (<= (nsym+1)*nsym distinct keys)
    produces the global counts;
    :func:`atire_spark.kernels.arith.counts_to_freqs` then applies the
    reference's cap/halving arithmetic.  Feed the result to
    ``pregen_scores(..., arith_model=...)``.
    """
    from atire_spark.kernels.arith import ARITH_SCHEMES, counts_to_freqs, symbol_stream

    scheme, bigram = ARITH_SCHEMES[field_type]
    nsym = RADIX_SCHEMES[scheme][0]

    def emit(batches):
        from collections import Counter

        for pdf in batches:
            counts: Counter = Counter()
            for s in pdf[field_col]:
                syms = symbol_stream(s or "", scheme, collapse_spaces=False)
                if bigram:
                    ctx = 0  # start-of-string context per document
                    for sym in syms:
                        counts[ctx * nsym + sym] += 1
                        ctx = sym + 1
                else:
                    counts.update(syms)
            if counts:
                yield pd.DataFrame(
                    {"key": list(counts.keys()), "n": list(counts.values())}
                )

    totals = (
        docs.select(field_col)
        .mapInPandas(emit, "key long, n long")
        .groupBy("key")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    return counts_to_freqs({r["key"]: r["n"] for r in totals}, nsym, bigram)


def pregen_scores(
    docs: DataFrame,
    field_col: str,
    field_type: str,
    bits: int = 63,
    docid_col: str = "docid",
    arith_model: tuple | None = None,
) -> DataFrame:
    """(docid, score) for one pregen field of the given type —
    type names per indexer_param_block_pregen.c:32-66.

    For the four ``*arith`` types, ``arith_model`` optionally replaces
    the reference's shipped frequency table (pregen_writer_normal.h
    init_models()) with a corpus-trained one from
    :func:`train_arith_model`; the tiny table ships to executors by
    closure and the encode stays one map-only Arrow pass."""
    from atire_spark.kernels.arith import ARITH_SCHEMES

    if field_type in ARITH_SCHEMES:
        from atire_spark.kernels.arith import ArithModel, encode_arith

        scheme, bigram = ARITH_SCHEMES[field_type]
        nsym = RADIX_SCHEMES[scheme][0]
        table = tuple(arith_model) if arith_model is not None else None

        @pandas_udf("long")
        def enc_arith(col: pd.Series) -> pd.Series:
            from atire_spark.kernels.arith import default_model

            model = (
                ArithModel(nsym, table, bigram=bigram)
                if table is not None
                else default_model(field_type)
            )
            return col.map(
                lambda s: encode_arith(s or "", field_type, model=model, bits=bits)
            )

        return docs.select(
            F.col(docid_col).alias("docid"),
            enc_arith(F.col(field_col)).alias("score"),
        )

    base = docs.select(
        F.col(docid_col).alias("docid"), F.col(field_col).alias("_f")
    )
    if field_type in ("integer", "bintrunc", "recentdate") or (
        field_type in RADIX_SCHEMES
    ):

        @pandas_udf("long")
        def enc(col: pd.Series) -> pd.Series:
            return col.map(
                lambda s: encode_field(s or "", field_type, bits)
            )

        return base.select("docid", enc(F.col("_f")).alias("score"))

    if field_type in ("strexact", "strexact_restricted"):
        key = _encoded_bytes_col("_f", field_type == "strexact_restricted")
        w = Window.orderBy("_key")
        return (
            base.withColumn("_key", key)
            .withColumn("score", F.dense_rank().over(w).cast("long"))
            .select("docid", "score")
        )

    if field_type == "integerexact":

        @pandas_udf("long")
        def atol(col: pd.Series) -> pd.Series:
            import re

            def one(s):
                m = re.match(r"\s*[+-]?\d+", s or "")
                return int(m.group()) if m else 0

            return col.map(one)

        w = Window.orderBy("_v", "docid")
        return (
            base.withColumn("_v", atol(F.col("_f")))
            .withColumn("score", F.row_number().over(w).cast("long"))
            .select("docid", "score")
        )

    raise ValueError(
        f"unknown pregen field type {field_type!r} "
        "(indexer_param_block_pregen.c:32-66)"
    )
