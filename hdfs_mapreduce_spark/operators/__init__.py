from hdfs_mapreduce_spark.operators.asof import as_of_join
from hdfs_mapreduce_spark.operators.band import band_join
from hdfs_mapreduce_spark.operators.components import (
    canonical_assignment,
    connected_components,
)
from hdfs_mapreduce_spark.operators.dedup import (
    exact_dedup,
    minhash_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_signatures,
)
from hdfs_mapreduce_spark.operators.materialize import (
    materialize,
    materialize_minhash_pairs,
    materialize_minhash_signatures,
    purge_scratch,
    session_scratch_dir,
)
from hdfs_mapreduce_spark.operators.packing import pack_sequences
from hdfs_mapreduce_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
    cosine_pairs,
)

__all__ = [
    "as_of_join",
    "band_join",
    "canonical_assignment",
    "connected_components",
    "exact_dedup",
    "minhash_signatures",
    "minhash_pairs",
    "simhash_signatures",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "materialize",
    "materialize_minhash_pairs",
    "materialize_minhash_signatures",
    "purge_scratch",
    "session_scratch_dir",
    "pack_sequences",
    "ann_topk_bruteforce",
    "ann_topk_ivf",
    "ann_topk_lsh",
    "cosine_pairs",
]
