"""icebergproject_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference lakehouse (bobo1108/IceBergProject, a
Flink+Iceberg medallion pipeline; see SURVEY.md):

- ``session``    — SparkSession factory tuned for the local harness but
  configured the way a large cluster deployment would be (AQE, pushdown,
  Arrow, optional Iceberg catalog).
- ``tables``     — typed loaders for the harness parquet tables.
- ``functions``  — scalar function library (date/string/JSON semantics of
  the reference's utils, re-expressed as Spark column expressions).
- ``operators``  — relational operators: projections, routing filters,
  broadcast config join, dimension enrichment joins, hierarchy flatten,
  aggregates, windowed counts.
- ``plans``      — the medallion pipeline (ODS → DWD → DIM/DWS → DM) as
  pure DataFrame→DataFrame stages.
- ``streaming``  — Structured Streaming wrappers for the same stages.
- ``lakehouse``  — table-format layer: real Iceberg when the runtime jar is
  on the classpath, a parquet+manifest fallback otherwise.
- ``llm``        — large-scale training-data operators: dedup (exact,
  MinHash-LSH, SimHash, n-gram Jaccard), similarity search, text analysis,
  multimodal column plumbing.
"""

__version__ = "0.1.0"
