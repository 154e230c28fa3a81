"""dbt_slabbing_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``racoon-z/dbt-slabbing`` (a DICOM/clinical-CSV ETL pipeline — see
SURVEY.md) as idiomatic Spark SQL / DataFrame pipelines, extended with the
full relational surface (joins, aggregations, windows, set ops,
rollup/cube, JSON/date/string functions), Structured Streaming, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale (SCALE.md).

Layout:
    session      SparkSession factory (AQE, Arrow, UTC, tuned shuffle)
    catalog      table registry over the TESTDATA parquet
    rounding     cross-engine-stable double rounding (dround/sql_round)
    queries/     the gate corpus: ~100 named queries w/ DuckDB oracles
                 (registry() → name → Query(fn, oracle))
    operators/   custom operators: text stats, portable minhash/simhash,
                 MLlib LSH, cosine/hyperplane-LSH/IVF similarity, as-of
                 join, merge/SCD2, multimodal probe
    functions/   pandas UDF / grouped UDAF / Python UDTF surface
    sources/     clinical CSV (+_line_no), DICOM binaryFile source
    pipelines/   the reference's two pipelines (mapping, ground truths)
                 + the training-data chunking pipeline
    plans/       dbt-style SQL model runner ({{ ref() }} DAG)
    streaming/   Structured Streaming jobs over the events table
    sinks        parquet/CSV/JSON writers, Delta-gated merge

Coverage map: COVERAGE.md (SURVEY §2 → implementation → verification).
"""

__version__ = "0.1.0"
