from hdfs_mapreduce_spark.plans.relational import ORACLE_SQL, QUERIES

__all__ = ["QUERIES", "ORACLE_SQL"]
