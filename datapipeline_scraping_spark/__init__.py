"""datapipeline_scraping_spark — a PySpark-native analytics engine.

A brand-new Spark-first engine providing the query and data-processing
capabilities of the reference pipeline ``lph9l/datapipeline-scraping``
(an Airflow-orchestrated incremental scraping ETL), re-expressed as a
library of composable DataFrame operators, plus the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
that a 100 TB training-data pipeline needs.

Design stance (see SURVEY.md §7.0):
- DataFrame/SQL only; Catalyst + AQE do the physical planning.
- No Python row UDFs on hot paths; pandas UDFs only at the pluggable
  LLM-backend seam (`operators.classify`).
- No ``collect()`` of data inside operators — only tiny branch counts.
- Windows always partitioned; dedup/delta by key-partitioned join or
  window so state shards across executors.
- Broadcast joins for dimension tables; AQE skew handling on.
"""

__version__ = "0.1.0"
