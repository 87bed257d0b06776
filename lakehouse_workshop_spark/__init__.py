"""lakehouse_workshop_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of the
``lakehouse-workshop`` reference (see SURVEY.md): lakehouse catalog + ingestion,
the full relational operator surface the workshop exercises, a distributed
customer-lifetime-value analytics layer (BG/NBD + Gamma-Gamma via
``applyInPandas``), segmentation rollups, and LLM-data-pipeline extensions
(dedup, similarity search, text analysis, sessionization) designed for
100 TB scale.

Everything is expressed Spark-first: declarative DataFrame/SQL plans that
Catalyst + AQE optimize; Arrow-vectorized pandas UDFs only where built-in
operators cannot express the semantics (model fitting).
"""

from lakehouse_workshop_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
