"""Pregen score tables — the pregen writer family, Spark-side.

Produces the (docid, score) tables :meth:`atire_spark.query.
SearchEngine.search_pregen` ranks by, from a per-document field
column:

- the "normal" closed-form generators (integer / bintrunc /
  recentdate / the six radix string packings) run the kernel
  (:mod:`atire_spark.kernels.pregen`) vectorized in one Arrow pass —
  map-only, no shuffle;
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

__all__ = ["pregen_scores", "EXACT_TYPES"]

EXACT_TYPES = ("strexact", "strexact_restricted", "integerexact")


def _encoded_bytes_col(field_col: str, restricted: bool):
    """The exact-strings comparison key: per-character lowercase +
    per-byte encode under base37 (restricted) or printable-ascii,
    skipping unencodable bytes and collapsing spaces
    (pregen_writer_exact_strings.c:110-170).  Returned as BINARY so
    Spark's unsigned-lexicographic ordering equals the reference's
    memcmp-then-length ``exact_str_less`` (:40-54)."""
    from atire_spark.kernels.pregen import CHAR_ENCODE_FAIL

    _, enc = RADIX_SCHEMES["base37" if restricted else "asciiprintables"]
    enc_space = enc(0x20)

    def one(s: str) -> bytes:
        out = bytearray()
        prev_space = True
        for ch in s or "":
            for b in ch.lower().encode("utf-8"):
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


def pregen_scores(
    docs: DataFrame,
    field_col: str,
    field_type: str,
    bits: int = 63,
    docid_col: str = "docid",
) -> DataFrame:
    """(docid, score) for one pregen field of the given type —
    type names per indexer_param_block_pregen.c:32-66."""
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
        "(indexer_param_block_pregen.c:32-66; the *arith* variants "
        "need a corpus-trained arithmetic model and are not "
        "implemented)"
    )
