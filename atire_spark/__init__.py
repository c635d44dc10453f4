"""atire_spark — a from-scratch PySpark-native inverted-index + BM25 engine.

Reimplements the *capabilities* of the reference ATIRE engine
(vkitchen/atire, read-only at /root/reference) over Spark DataFrames:

- index build: tokenization + per-turn posting extraction in vectorized
  Arrow/pandas UDFs, partition-local posting construction, salted
  term-partitioned shuffle merge into impact-ordered vbyte-compressed
  posting segments (reference recipe: per-part index + atire_merge,
  reference README.md:78-93).
- query: BM25 term-at-a-time top-k, rank-identical to the reference's
  default configuration (unquantized tf-impact index, k1=0.9, b=0.4,
  fixed-point uint16 accumulators, tie-break larger-docid-first), plus
  ALL 28 named rankers of the reference factory (including adaptive-k1
  BM25T/ADPT, Pitman-Yor lmp/lmptfidf, readable, pregen),
  quantum-at-a-time block-max pruning, boolean retrieval, read-side
  trims, blind-KL feedback, more-like-this, two-stage rerank, snippets
  and the full evaluator family (MAP, P@n, S@n, bpref, nDCG/nDCGt,
  ERR, rank effectiveness, MAgP, intent-aware wrappers).
- TopSig: the reference's signature-index mode (-st) as a packed
  signature table — build, agreement-count search, blind feedback —
  with bit-identical DuckDB oracles (md5-seeded splitmix64 PRNG).
- streaming: Structured Streaming incremental index build
  (foreachBatch partial-index appends, the reference's build+merge
  recipe run continuously; score-identical to a batch build).
- text pipeline: S-stripper/Porter stemming, NCBI/Puurula stopwords,
  serialise-time term culling — all with the reference's gates; CJK
  single-char/bigram modes plus the ONFLY dictionary-segmenter plugin
  slot on both index and query side.
- corpus operators: dedup (exact/MinHash-LSH/SimHash/embedding-cosine),
  fingerprints, token stats, quality, language ID, Dale-Chall, brute +
  multi-band-LSH + IVF cosine kNN (k-means-trained build/query split),
  multimodal binary plumbing (real PNG/BMP/GIF/RIFF header decode,
  resize planning, frame sampling).
- periphery (r3): TREC/INEX run-file exporters (the full forum-writer
  family), broker-style federated search, docid reorder, TREC/INEX
  topic-file readers, the pregen writer family, Kendall tau-b, the
  compressed document repository, the -S byte scrubber, and the
  dictionary/doclist utility CLIs.

Nothing here is a port: the reference's hash tables, B-trees and byte
buffers are replaced by DataFrame aggregations, Iceberg/Parquet segment
tables and numpy kernels.
"""

__version__ = "0.3.0"
