"""Alternative sources feed the same build pipeline — the reference's
CSV reader (directory_iterator_csv.c) maps to spark.read.csv; the
index built from a CSV dump must be identical to one built from the
in-memory frame."""

import os
import tempfile

import pandas as pd


TRANSCRIPTS = pd.DataFrame(
    {
        "conv_id": ["c0", "c0", "c1", "c1"],
        "turn_idx": [0, 1, 0, 1],
        "text": [
            "alpha bravo charlie",
            "bravo delta",
            "alpha alpha echo",
            "charlie delta echo foxtrot",
        ],
    }
)


def test_csv_source_builds_identical_index(spark):
    from pyspark.sql import functions as F

    from atire_spark.build import build_index

    with tempfile.TemporaryDirectory() as tmp:
        csv_path = os.path.join(tmp, "transcripts.csv")
        TRANSCRIPTS.to_csv(csv_path, index=False)
        csv_df = spark.read.csv(
            csv_path,
            header=True,
            schema="conv_id string, turn_idx int, text string",
        )
        idx_csv = build_index(spark, csv_df)
        idx_mem = build_index(spark, spark.createDataFrame(TRANSCRIPTS))

        def decoded(idx):
            import numpy as np

            from atire_spark.kernels.impact import decode_segment

            out = []
            for row in idx.postings.collect():
                d, t, _ = decode_segment(
                    np.asarray(row["impacts"]),
                    np.asarray(row["doc_counts"]),
                    row["postings"],
                    None,
                )
                out.extend(
                    (row["term"], int(x), int(y)) for x, y in zip(d, t)
                )
            return sorted(out)

        assert decoded(idx_csv) == decoded(idx_mem)
        dm_csv = idx_csv.docmap.orderBy("docid").collect()
        dm_mem = idx_mem.docmap.orderBy("docid").collect()
        assert [tuple(r) for r in dm_csv] == [tuple(r) for r in dm_mem]
