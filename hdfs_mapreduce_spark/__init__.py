"""hdfs_mapreduce_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of turutupa/hdfs_mapreduce, rebuilt Spark-first.

The reference is an HDFS-like DFS plus a from-scratch MapReduce engine (Go,
/root/reference). Its single dataflow — scan → map(plugin) → partition → sort
→ shuffle → merge → group → reduce(plugin) → sink (SURVEY.md §3.1) — collapses
here into Catalyst-planned DataFrame programs; its exec-per-record plugin
protocol (dfs/compute_engine/compute_engine.go:54,122) becomes Column
expressions plus Arrow-vectorized mapInPandas/applyInPandas surfaces
(functions.plugin); its DFS verbs become catalog operations (sources.catalog).
Beyond parity, operators.* adds the LLM-data-pipeline surface: dedup,
similarity search, text analysis, multimodal columns.
"""

from hdfs_mapreduce_spark.session import get_spark

__all__ = ["get_spark"]
