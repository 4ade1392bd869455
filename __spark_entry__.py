"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship path: build the inverted index over the
sf0.001 ``documents`` corpus with the real engine (tokenize -> tf ->
salted stats -> compressed posting segments) and execute a BM25 top-10
search. ``queries``/``oracle_sql`` expose every SQL-checkable operator
(see rse_spark/harness.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rse_spark import harness  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from rse_spark.deploy import ensure_shipped
    from rse_spark.index.build import build_index
    from rse_spark.query.engine import search_bundle

    ensure_shipped(spark)  # UDFs import rse_spark on the workers

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bundle = build_index(
        spark, docs, analyzer="simple", content_col="text",
        docs_per_segment=128,
    )
    hits = search_bundle(
        spark, bundle, "spark join filter", k=10, analyzer="simple"
    )
    return hits.join(bundle.doc_map, "doc_id").select(
        "doc_id", F.round("score", 6).alias("score"), "lang", "source"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from rse_spark.deploy import ensure_shipped

    def shipped(fn):
        def wrapper(spark, sf_dir):
            ensure_shipped(spark)
            return fn(spark, sf_dir)

        return wrapper

    return {name: shipped(fn) for name, fn in harness.queries().items()}


def oracle_sql() -> dict[str, str]:
    return harness.oracle_sql()
