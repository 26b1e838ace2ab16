"""Engine facade: the reference's client verbs as catalog operations.

The reference client exposes PUT / GET / ls / rm / COMPUTE / stats over its
DFS (dfs/client/cli.go:121-166, dfs/client/actions.go). Here each verb is a
thin catalog/storage operation — chunking, replication, placement, heartbeat
bookkeeping (dfs/client/chunkinator.go, dfs/storageNode/storageNode.go:
188-230, dfs/controller/zookeeper.go) all belong to the storage layer and
Spark, so the facade stays ~10 lines per verb:

    verb        reference path                      here
    PUT         chunk+round-robin+replicate         read → partitioned parquet write
    GET         parallel chunk fetch + concat       spark.read.parquet
    ls          controller file index               warehouse listing
    rm          index delete + async chunk deletes  recursive path delete
    COMPUTE     plugin MAP/REDUCE job (§3.1)        functions.plugin.run_mapreduce
    stats       per-node counters via heartbeats    per-table files/bytes/rows
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from hdfs_mapreduce_spark.functions.plugin import run_mapreduce


class Engine:
    """A warehouse-scoped session facade. ``warehouse`` is any Spark-readable
    directory (local in tests, HDFS/object-store in production)."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    # --- PUT (S1): ingest a local file as a parquet table --------------------
    def put(
        self,
        local_path: str,
        name: str,
        fmt: str = "text",
        partitions: int | None = None,
        **read_opts,
    ) -> None:
        base = os.path.basename(local_path)
        if base.startswith(("_", ".")):
            # Hadoop's input format treats _/.-prefixed paths as hidden
            # (metadata like _SUCCESS) and silently reads ZERO rows — turn
            # that silent data loss into an error.
            raise ValueError(
                f"source file name {base!r} starts with '_' or '.'; Spark "
                "treats such paths as hidden and reads no rows — rename it"
            )
        reader = self.spark.read
        if fmt == "text":
            df = reader.text(local_path)
        elif fmt == "csv":
            df = reader.options(**read_opts).csv(local_path)
        elif fmt == "json":
            df = reader.options(**read_opts).json(local_path)
        elif fmt == "parquet":
            df = reader.parquet(local_path)
        else:
            raise ValueError(f"unsupported format: {fmt}")
        if partitions:
            df = df.repartition(partitions)
        df.write.mode("errorifexists").parquet(self._path(name))

    # --- GET (S3) -------------------------------------------------------------
    def get(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    # --- ls (S6) ---------------------------------------------------------------
    def ls(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(self._path(d))
        )

    # --- rm (S7) ---------------------------------------------------------------
    def rm(self, name: str) -> None:
        target = self._path(name)
        if not os.path.isdir(target):
            raise FileNotFoundError(name)
        shutil.rmtree(target)

    # --- stats (S8) -------------------------------------------------------------
    def stats(self) -> dict[str, dict[str, int]]:
        out: dict[str, dict[str, int]] = {}
        for name in self.ls():
            files = [
                f
                for f in os.listdir(self._path(name))
                if f.endswith(".parquet")
            ]
            out[name] = {
                "n_files": len(files),
                "n_bytes": sum(
                    os.path.getsize(os.path.join(self._path(name), f))
                    for f in files
                ),
            }
        return out

    # --- SQL over the warehouse namespace ----------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Run SQL with every stored table visible as a view — the query
        language the reference never had (its only 'plan' was a compiled
        plugin binary; SURVEY §3.4)."""
        for name in self.ls():
            self.get(name).createOrReplaceTempView(name)
        return self.spark.sql(query)

    # --- COMPUTE (§3.1): the reference's MapReduce job verb ---------------------
    def compute(
        self,
        name: str,
        mapper,
        reducer,
        map_schema: str,
        reduce_schema: str,
        output_name: str,
        key: str = "key",
    ) -> DataFrame:
        """Run a map/reduce plugin job over a stored table and persist the
        result as a new table (the reference uploads reducer output back into
        the DFS — dfs/storageNode/storageNode.go:499-522)."""
        result = run_mapreduce(
            self.get(name), mapper, reducer, map_schema, reduce_schema, key
        )
        result.write.mode("errorifexists").parquet(self._path(output_name))
        return self.get(output_name)
