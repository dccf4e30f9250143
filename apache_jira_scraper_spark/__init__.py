"""apache_jira_scraper_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ETL system ``HarshiSharma04/apache-jira-scraper`` (see SURVEY.md),
re-expressed as idiomatic Spark DataFrame / SQL programs and extended with
the LLM-data-pipeline operator family (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
  session.py    — SparkSession factory tuned for local[N] and cluster use
  io.py         — table loaders over the driver's parquet test tables
  functions/    — pure Column->Column scalar functions (reference §2.8)
  operators/    — query programs: relational, tasks (flatMap), stats,
                  dedup, similarity, text, asof, multimodal
  sources/      — custom Python DataSource for the paginated Jira REST scan
  streaming/    — Structured Streaming pipelines (offsets, watermark windows)
  plans/        — plan inspection helpers (explain capture, shuffle audit)
"""

__version__ = "0.1.0"
