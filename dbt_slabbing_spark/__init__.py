"""dbt_slabbing_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``racoon-z/dbt-slabbing`` (a DICOM/clinical-CSV ETL pipeline — see
SURVEY.md) as idiomatic Spark SQL / DataFrame pipelines, extended with the
relational surface (joins, aggregations, windows, set ops, rollup/cube,
JSON/date/string functions), Structured Streaming, and LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.

Layout:
    session     SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
    catalog     table registry over the testdata parquet + clinical CSVs
    queries/    declarative query corpus (relational + LLM) w/ DuckDB oracles
    operators/  custom operators: dedup (minhash/simhash), similarity, asof,
                range join, ordered fold
    functions/  scalar-function helpers (text stats, outcome classification)
    sources/    clinical CSV (+_line_no), DICOM binaryFile source, multimodal
    pipelines/  the two reference pipelines re-expressed Spark-first
    streaming/  Structured Streaming jobs over the events table
"""

__version__ = "0.1.0"
