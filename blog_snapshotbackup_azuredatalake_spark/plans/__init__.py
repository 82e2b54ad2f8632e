from blog_snapshotbackup_azuredatalake_spark.plans import analytics

__all__ = ["analytics"]
