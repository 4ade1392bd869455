"""Percolation — reversed search: match documents against a STORED
query/rule set (Elasticsearch percolate query; Luwak/Lucene monitor).

The pipeline shape this serves at 100 TB: tagging, alerting, and
routing — every incoming document (batch or micro-batch) is checked
against thousands of standing rules ("contains spark AND join",
"any of merge/sort/hash") to label training data, fan out to topic
sinks, or trigger alerts. The classic mistake is a per-rule scan;
the correct plan — built here — scans the token stream ONCE, joins
it to a broadcast rule-term table, and verifies per-(doc, rule) term
coverage with one partial+final hash aggregate. Adding rules grows
the broadcast, never the number of corpus scans; the operator is
trivially incremental (run it per micro-batch inside foreachBatch —
it reads nothing but the batch).

Declarative/oracle twin: harness.q_percolate (driver-checked against
DuckDB at every round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Rule = "tuple[int, list[str], int]"  # (rule_id, terms, min_match)


def percolate_tokens(spark: SparkSession, toks: DataFrame,
                     rules: "list[Rule]") -> DataFrame:
    """(rule_id, doc_id, n_matched) for every rule firing on a doc —
    a rule (rule_id, terms, min_match) fires when the doc contains at
    least ``min_match`` DISTINCT terms of the rule (len(terms) = AND,
    1 = OR). ``toks`` is a (doc_id, term) token stream; duplicates are
    collapsed before coverage counting. Raises ValueError on empty or
    malformed rules (min_match out of [1, len(terms)])."""
    if not rules:
        raise ValueError("empty rule set")
    # terms are deduplicated per rule and min_match validated against
    # the DISTINCT count — a rule listing the same term twice would
    # otherwise produce duplicate broadcast rows that double-count in
    # n_matched and fire min_match early, diverging from the serving
    # twin DirectSearcher.percolate (round-6 advice)
    deduped: list[tuple[int, list[str], int]] = []
    for rid, terms, mm in rules:
        uniq = sorted(set(terms))
        if not uniq or not 1 <= mm <= len(uniq):
            raise ValueError(
                f"rule {rid}: min_match {mm} out of "
                f"[1, {len(uniq)}]"
            )
        deduped.append((rid, uniq, mm))
    rules_df = spark.createDataFrame(
        [(rid, t, mm) for rid, terms, mm in deduped for t in terms],
        "rule_id INT, term STRING, min_match INT",
    )
    return (
        toks.select("doc_id", "term").distinct()
        .join(F.broadcast(rules_df), "term")
        .groupBy("rule_id", "doc_id", "min_match")
        .agg(F.count("*").cast("int").alias("n_matched"))
        .filter(F.col("n_matched") >= F.col("min_match"))
        .select("rule_id", "doc_id", "n_matched")
    )
