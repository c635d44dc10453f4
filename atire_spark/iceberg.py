"""Iceberg table sink/source for the index (north_rule's storage).

The parquet directory layout :func:`atire_spark.build.write_index`
produces is the sandbox stand-in; this module is the deployment path —
the same DataFrames written through ``writeTo(...).using("iceberg")``
so manifest min/max stats perform at planning time the file pruning
the parquet layout gets from footer stats:

- ``postings`` is sorted on (term, seg_group) — the range-clustered
  layout write_index builds by hand is exactly an Iceberg sort order,
  and a query's pushed term ``isin`` then skips non-matching data
  files from the manifests without touching them;
- ``docmap``/``stats`` are plain unpartitioned tables (docmap lookups
  are docid-range scans; stats is one row);
- ``puurula`` (present only for -Ilmp builds) clusters on seg_group so
  the query-side cogroup reads contiguous files per group.

The sandbox has no Iceberg runtime jar, so everything here gates on
the catalog actually resolving; the error message carries the exact
spark-submit configuration a cluster needs. Tested for the gate; the
write path is a direct composition of DataFrameWriterV2 calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from atire_spark.build import IndexTables

#: packages/conf a deployment passes to spark-submit; interpolated
#: into the gate error so the fix is copy-pasteable
SUBMIT_HINT = (
    "spark-submit --py-files dist/atire_spark.zip "
    "--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver> "
    "--conf spark.sql.catalog.<cat>=org.apache.iceberg.spark.SparkCatalog "
    "--conf spark.sql.catalog.<cat>.type=hive|hadoop|rest ..."
)


def _require_iceberg(spark: SparkSession, table_prefix: str) -> None:
    """Fail fast with an actionable message when the catalog of
    ``table_prefix`` (e.g. ``cat.db.index``) is not an Iceberg one."""
    catalog = table_prefix.split(".", 1)[0]
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if impl is None:
        raise RuntimeError(
            f"no Iceberg catalog {catalog!r} configured: run under "
            f"{SUBMIT_HINT}"
        )
    try:  # the jar must actually be on the classpath, not just named
        spark._jvm.java.lang.Class.forName(impl)  # type: ignore[union-attr]
    except Exception as exc:  # pragma: no cover - needs a real cluster
        raise RuntimeError(
            f"Iceberg catalog class {impl} not loadable ({exc}); add "
            f"the runtime jar: {SUBMIT_HINT}"
        ) from exc


def write_index_iceberg(
    spark: SparkSession,
    tables: IndexTables,
    table_prefix: str,
    mode: str = "createOrReplace",
) -> None:
    """Materialize an index into Iceberg tables ``{prefix}_postings``,
    ``{prefix}_docmap``, ``{prefix}_stats`` (+ ``{prefix}_puurula``).

    ``mode``: ``createOrReplace`` (default) or ``append`` — append is
    the incremental-merge path (streaming.py's docid-offset contract:
    the caller appends segments whose docids continue the existing
    range, exactly like the reference's index merge,
    atire_merge.c:563-930).
    """
    _require_iceberg(spark, table_prefix)

    def _write(
        df: DataFrame,
        name: str,
        sort: list[str] | None,
        replace: bool = False,
    ) -> None:
        if sort:
            df = df.sortWithinPartitions(*sort)
        w = df.writeTo(f"{table_prefix}_{name}")
        if mode == "append" and not replace:
            w.append()
        else:
            w.using("iceberg").createOrReplace()
            if sort:  # declare the sort order so compaction keeps it
                cols = ", ".join(sort)
                spark.sql(
                    f"ALTER TABLE {table_prefix}_{name} "
                    f"WRITE ORDERED BY ({cols})"
                )

    _write(
        tables.postings.repartitionByRange("term", "seg_group"),
        "postings",
        ["term", "seg_group"],
    )
    _write(tables.docmap, "docmap", ["docid"])
    # stats is a SINGLE-ROW snapshot of the whole index: an append
    # would accumulate conflicting rows and SearchEngine's
    # stats.collect()[0] would read an arbitrary stale one — the
    # caller of an incremental append passes the RE-AGGREGATED stats
    # (documents/collection_len over old+new) and it replaces
    _write(tables.stats, "stats", None, replace=True)
    if tables.puurula is not None:
        _write(
            tables.puurula.repartition("seg_group"),
            "puurula",
            ["seg_group", "docid"],
        )


def load_index_iceberg(spark: SparkSession, table_prefix: str) -> IndexTables:
    """Read the index back from Iceberg tables; the pushed term filters
    and column pruning behave identically to the parquet layout, with
    manifest-level file skipping on top."""
    _require_iceberg(spark, table_prefix)
    names = [
        r.tableName for r in spark.sql(
            f"SHOW TABLES IN {table_prefix.rsplit('.', 1)[0]}"
        ).collect()
    ]
    puu_name = f"{table_prefix.rsplit('.', 1)[-1]}_puurula"
    return IndexTables(
        docmap=spark.table(f"{table_prefix}_docmap"),
        postings=spark.table(f"{table_prefix}_postings"),
        stats=spark.table(f"{table_prefix}_stats"),
        puurula=(
            spark.table(f"{table_prefix}_puurula")
            if puu_name in names
            else None
        ),
    )
