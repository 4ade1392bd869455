"""rse_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch re-imagining of the reference engine GSE/RSE
(/root/reference: Go crawler -> Postgres keyword table -> Go scoring API)
as an idiomatic Spark batch/streaming pipeline:

* corpus: DataFrame (repo, path, commit, lang, content) — the Spark
  analogue of GSE's ``pages`` table (reference
  crawler/src/postgres/init_db.sql:1-8).
* index: term -> posting-list DataFrames — the analogue of GSE's
  ``keywords(page_id, word, frequency)`` inverted index
  (init_db.sql:10-16), upgraded with document-partitioned segments,
  delta+varint compression and block-max metadata.
* query: BM25 (k1=1.2, b=0.75) top-k — replacing GSE's tf-dot-product
  scorer (crawler/src/api/main.go:85-95) which had no idf / length norm.

Everything is DataFrame/SQL-first; Python appears only inside
Arrow-vectorized pandas UDFs (tokenizer stemming, posting codecs, WAND).
"""

__version__ = "0.1.0"

from rse_spark.session import get_spark  # noqa: F401
