"""projet_etl_spark — a PySpark-native analytics engine.

A brand-new, idiomatic Spark implementation of the query and
data-processing capabilities of the MohammadKattan/Projet-ETL
reference (a SQLite+pandas retail-analytics backend), re-expressed
as lazy DataFrame plans optimized by Catalyst, plus a scale-oriented
extension surface (dedup, similarity search, text analysis,
streaming windows) for large training-data pipelines.

Layout:
  session.py    SparkSession factory (AQE on, UTC, sane shuffle sizing)
  params.py     pinned default query parameters (reproducible tests)
  schemas.py    explicit StructTypes for every table
  sources/      parquet star-schema loaders + whitespace-CSV ingest
  functions/    reusable column expressions (scores, dates, text, vectors)
  operators/    the query library (parity surface + extensions)
  plans/        registry wiring queries to DuckDB oracle SQL
  streaming/    Structured Streaming variants over the events table
"""

__version__ = "0.1.0"
