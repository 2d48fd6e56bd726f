"""cognitive_score_bigdata_spark — PySpark-native analytics engine.

A ground-up Spark rebuild of the query and data-processing capabilities of
the Cognitive Performance Monitoring System reference
(Vladyslbr/cognitive-score-bigdata): relational analytics (dashboard SQL at
``src/backend/main.py:139-155``), streaming latest-state maintenance
(``src/stream_processor.py``), batch ETL (``scripts/db_loader.py``), ML
scoring (``setup_model.py``) — plus the large-scale training-data operators
(dedup, similarity search, text analysis) the reference's architecture
points at but never shipped.

Everything is expressed Spark-first: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming for the hot path, MLlib for scoring,
pandas/Arrow UDFs only where built-ins genuinely can't express the
semantics.
"""

from cognitive_score_bigdata_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
