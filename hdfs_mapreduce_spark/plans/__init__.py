from hdfs_mapreduce_spark.plans import (
    analytics_plans,
    dedup_plans,
    pipeline_plans,
    relational,
    relevance_plans,
    similarity_plans,
    text_plans,
)

QUERIES = {
    **relational.QUERIES,
    **analytics_plans.QUERIES,
    **text_plans.QUERIES,
    **relevance_plans.QUERIES,
    **dedup_plans.QUERIES,
    **similarity_plans.QUERIES,
    **pipeline_plans.QUERIES,
}
ORACLE_SQL = {
    **relational.ORACLE_SQL,
    **analytics_plans.ORACLE_SQL,
    **text_plans.ORACLE_SQL,
    **relevance_plans.ORACLE_SQL,
    **dedup_plans.ORACLE_SQL,
    **similarity_plans.ORACLE_SQL,
    **pipeline_plans.ORACLE_SQL,
}

__all__ = ["QUERIES", "ORACLE_SQL"]
