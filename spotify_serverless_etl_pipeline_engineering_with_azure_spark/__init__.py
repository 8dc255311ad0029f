"""PySpark-native analytics engine with the query and data-processing
capabilities of nirm44n/Spotify-Serverless-ETL-Pipeline-Engineering-with-Azure,
re-expressed Spark-first (DataFrame/SQL + Catalyst + Structured
Streaming) and extended with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing). See SURVEY.md for the blueprint and README.md for the
operator coverage map.
"""

from .catalog import TABLES, register_views, table  # noqa: F401
from .registry import REGISTRY, load_all, oracle_sql, queries, register  # noqa: F401
from .session import get_spark  # noqa: F401
