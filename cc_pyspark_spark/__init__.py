"""cc_pyspark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of commoncrawl/cc-pyspark (reference at
/root/reference, studied for WHAT it computes, not HOW), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal column plumbing) designed for 100 TB scale.

Layout:
  session.py    SparkSession factory with a tuned conf profile
  catalog.py    table registry over the driver parquet star schema
  plans/        named, oracle-checkable queries (the SURVEY §2 inventory)
  functions/    scalar/column function library (tokenize, URL, hashing)
  operators/    composite operators (dedup, similarity, graph)
  sources/      WARC/WAT/WET record source (manifest -> DataFrame)
  jobs/         reference job parity as DataFrame pipelines
  streaming/    Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
