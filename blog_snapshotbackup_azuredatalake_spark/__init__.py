"""PySpark-native engine with the capability surface of
rebremer/blog-snapshotbackup-azuredatalake (data-lake snapshot / backup /
incremental sync), extended with LLM training-data pipeline operators.

Everything is expressed through the DataFrame/SQL API so Catalyst can
optimize (pushdown, pruning, broadcast, AQE); Python runs only in
Arrow-batched UDFs on the multimodal path.
"""

from blog_snapshotbackup_azuredatalake_spark.session import get_session

__all__ = ["get_session"]
