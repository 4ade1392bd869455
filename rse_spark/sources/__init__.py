from rse_spark.sources.corpus_io import read_corpus, write_jsonl  # noqa: F401
