"""dst_spark_k8_lakehouse_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capability surface of
the reference lakehouse platform ``vifroab/dst-spark-k8-lakehouse``
(Spark 3.5.3 + Delta/Iceberg + Polaris + MinIO on Kubernetes):

- ``session``    — SparkSession factory (local analog of the reference's
                   ``docker/spark-notebook/connector.py:18-152``)
- ``sources``    — testdata catalog + readers/writers (scan/sink surface)
- ``operators``  — relational operator inventory (SURVEY.md §2.3-2.8)
- ``functions``  — scalar function sweep (SURVEY.md §2.9)
- ``plans``      — lakehouse table layer: DDL/DML, schema evolution,
                   time travel (SURVEY.md §2.2)
- ``streaming``  — Structured Streaming window operators (SURVEY.md §2.10)
- ``metrics``    — batched re-implementation of the reference's
                   ``dst_metrics`` pipeline-metrics module
- ``llm``        — LLM-data-pipeline extensions: dedup, similarity
                   search, text analysis, multimodal columns (§2.12)

Everything is DataFrame/SQL-first: Catalyst plans the physical execution;
no RDDs; Python UDFs only where built-ins genuinely cannot express the
semantics (and then Arrow-vectorized).
"""

from dst_spark_k8_lakehouse_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
