"""candyspark — a PySpark-native analytics engine.

From-scratch rebuild of the capabilities of ``piyushnaidu77/candy-etl-pipeline``
(reference at /root/reference, see SURVEY.md) as pure, composable, explicitly
schemaed DataFrame operators, extended with LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) and designed
for large-cluster scale: broadcast-aware joins, AQE, partition-pruned layouts,
``applyInPandas`` instead of RDD/driver-side state.
"""

from candyspark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
