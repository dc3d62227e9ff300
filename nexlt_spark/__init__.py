"""nexlt_spark — a PySpark-native full-text index build + BM25 query engine.

A from-scratch re-expression of the capabilities of svetakrasikova/NeXLT
(Solr 4.x ingest + Lucene retrieval, see /root/reference) as an idiomatic
Spark engine:

- documents are conversation turns flattened under stable (conv_id, turn_idx)
  ordering (NeXLT: one Solr doc per translation segment,
  indexers/athena2nexlt/AthenaExportMt.java:454);
- the inverted index is a set of DataFrame-backed tables (postings,
  doc_stats, term_stats) instead of Lucene segments
  (solr/NeXLT/solr/collection1/conf/schema.xml declares the fields; Lucene
  jars implement the postings — we implement them in Spark);
- scoring is Okapi BM25 (k1=1.2, b=0.75) per BASELINE.json, replacing the
  reference's Solr-4 DefaultSimilarity (schema.xml:1088);
- tokenization is one deterministic chain shared bit-for-bit between the
  Spark pandas_udf and the pure-Python oracle (schema.xml:198-213
  text_general analog: unicode word tokenize + NFKC + lowercase, no
  stopwords — the reference's stopword list is empty).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
from nexlt_spark.index.blocks import (  # noqa: F401
    BlockedIndex,
    build_blocks,
    load_blocked_index,
    save_blocked_index,
)
from nexlt_spark.index.packed import build_blocked_direct, save_blocked  # noqa: F401
from nexlt_spark.index.incremental import (  # noqa: F401
    compact,
    ingest_batch,
    live_documents,
    live_index,
)
from nexlt_spark.query.wand import wand_topk  # noqa: F401
from nexlt_spark.query.enrich import expand_synonyms, highlight, parse_synonyms  # noqa: F401
