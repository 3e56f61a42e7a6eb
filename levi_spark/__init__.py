"""levi-spark: PySpark-native Delta-table analytics & maintenance engine.

Re-expresses the capability surface of mrpowers-io/levi (a delta-rs /
PyArrow / pandas helper library, see SURVEY.md) as idiomatic PySpark,
plus large-scale LLM-data-pipeline operators (dedup, similarity search,
text analysis, streaming) designed for 100 TB-scale execution.
"""

from levi_spark.session import get_spark
from levi_spark.delta.log import DeltaLog, Snapshot

__all__ = ["get_spark", "DeltaLog", "Snapshot"]
__version__ = "0.1.0"
