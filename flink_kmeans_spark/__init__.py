"""flink_kmeans_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``mmziyad/flink-kmeans`` (a Flink DataSet-API Lloyd's K-Means pipeline;
see SURVEY.md — the reference checkout was empty at survey time, so
anchors are tagged [EXPECTED] against the canonical Flink batch
clustering example), widened to a full relational / event-time /
LLM-data-pipeline operator surface designed for 100 TB scale.

Layout
------
- ``session``    — SparkSession construction + required runtime confs
- ``sources``    — schema-checked readers for the ten test tables
                   (centralizes the events ns-timestamp normalization)
- ``functions``  — reusable column expressions (vector math, text)
- ``operators``  — the operator implementations (kmeans, relational,
                   event-time, dedup, similarity, text, multimodal)
- ``plans``      — the query registry: every SURVEY.md §2 key mapped to
                   a (spark, sf_dir) -> DataFrame callable plus its
                   DuckDB oracle SQL
- ``streaming``  — Structured Streaming variants of the event-time ops
"""

__version__ = "0.1.0"
