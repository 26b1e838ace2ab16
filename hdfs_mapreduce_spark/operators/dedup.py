"""Deduplication operators for large-scale training-data pipelines.

Four families, each a pure DataFrame composition (no Python UDFs — every
expression is JVM-side and codegen'd), each with an exact DuckDB oracle twin
in plans/dedup_plans.py:

* **exact**   — hash-groupBy on normalized content; one shuffle on the hash.
* **MinHash/LSH** — shingle → minhash signature → band → bucket self-join →
  exact-Jaccard verify. The standard near-dup pipeline (Broder '97); at
  100 TB the candidate self-join shuffles only on band keys and the verify
  join is band-pruned, never all-pairs.
* **SimHash** — per-token signed bit votes → 32-bit signature → byte-band
  bucketing → Hamming≤k verify (Charikar '02). Hamming ≤3 over 4 byte-bands
  is exact by pigeonhole.
* **n-gram Jaccard (exact)** — inverted-index self-join on shingle hashes →
  per-pair intersection counts → Jaccard from set sizes. Exact but heavier;
  the scale path prefilters by document length band.

All hashing is the shared md5-based h56 (functions/hashing.py) so signatures
are bit-identical across engines. Determinism note: every operator's output
is a pure function of the input — no RNG, no timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hdfs_mapreduce_spark.functions.hashing import MERSENNE_31, h56, perm_params
from hdfs_mapreduce_spark.functions.text import tokens

# MinHash configuration: 16 permutations in 8 bands of 2 → LSH threshold
# ≈ (1/8)^(1/2) ≈ 0.35; the exact-Jaccard verify then applies the real
# threshold. Fixed seed → same signatures everywhere.
N_PERM = 16
N_BANDS = 8
ROWS_PER_BAND = N_PERM // N_BANDS
PERMS = perm_params(N_PERM, seed=42)
SHINGLE_K = 3


# --- exact dedup ---------------------------------------------------------------
def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Exact duplicate groups: md5 of content → keep lowest id, count dups.
    One hash-partitioned shuffle; map-side partial agg makes the common
    all-unique case cheap."""
    return (
        df.groupBy(F.md5(F.col(content_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .orderBy("keep_id")
    )


# --- shingling ------------------------------------------------------------------
def shingle_relation(
    df: DataFrame, id_col: str, text_col: str, k: int = SHINGLE_K
) -> DataFrame:
    """(doc, x) relation of k-token-shingle h56 hashes, with duplicates.

    Map-only: shingle strings are built array-side (`transform` over a
    `sequence` of start offsets, `slice` + `concat_ws` per offset) and the
    md5-based h56 runs *after* the explode, inside whole-stage codegen. Keep
    md5 out of the lambda — a HOF body is interpreted per element, and an
    md5-inside-transform variant measured ~6x slower at sf0.1; this shape
    measured ~6x faster than the posexplode + window-lead alternative, which
    pays a full shuffle of every token. No shuffle at all here: at 100 TB
    this stage is pure map parallelism over input splits. Docs with 1..k-1
    tokens contribute their whole token string as one shingle; zero-token
    docs contribute nothing."""
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(
        F.col(id_col).alias("doc"), toks.alias("tk"), F.size(toks).alias("cnt")
    )
    shingles = (
        F.when(
            F.col("cnt") >= k,
            F.transform(
                F.sequence(F.lit(0), F.col("cnt") - k),
                lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, k)),
            ),
        )
        .when(F.col("cnt") > 0, F.array(F.array_join(F.col("tk"), " ")))
        .otherwise(F.array().cast("array<string>"))
    )
    return base.select("doc", F.explode(shingles).alias("s")).select(
        "doc", h56(F.col("s")).alias("x")
    )


def _sig_agg(doc_col: str, exploded: DataFrame) -> DataFrame:
    """Signatures from an exploded (doc, shingle-hash x) relation: groupBy
    doc with N_PERM codegen'd MIN aggregates. This is the Spark-native
    formulation — whole-stage codegen end-to-end, map-side partial mins, one
    tiny shuffle of (doc × 16 longs). Array-fold versions (higher-order
    functions are interpreted per element) measured 10-100x slower."""
    p = F.lit(MERSENNE_31)
    return exploded.groupBy(doc_col).agg(
        *[
            F.min((F.lit(a) * (F.col("x") % p) + F.lit(b)) % p).alias(f"mh{i}")
            for i, (a, b) in enumerate(PERMS)
        ]
    )


def minhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document MinHash signature."""
    rel = shingle_relation(df, id_col, text_col).withColumnRenamed("doc", id_col)
    return _sig_agg(id_col, rel).orderBy(id_col)


def minhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash LSH + exact-Jaccard verification.

    Plan shape (scale-critical):
      1. map: signature + shingle set per doc (no shuffle);
      2. explode to (band_idx, band_key, id) — N_BANDS rows/doc;
      3. self-join on band key (shuffle on band key only) → candidate pairs;
      4. distinct pairs, then verify with exact Jaccard over the shingle-hash
         sets (array_intersect/array_union on pre-deduped hash arrays).
    LSH prunes candidates below ~0.35 similarity; the verify applies
    ``threshold`` exactly, so output = {pairs sharing ≥1 band ∧ J ≥ t}.
    """
    # ONE groupBy produces both the signature (16 codegen MINs) and the
    # shingle-hash set per doc — the single shuffle of the whole pipeline.
    # per_doc then feeds banding AND both sides of the verify join, so it is
    # persisted (5k rows x (set + 16 longs) at sf0.1; at 100 TB this is the
    # doc-level sketch table you'd materialize anyway).
    p = F.lit(MERSENNE_31)
    rel = shingle_relation(df, id_col, text_col)
    per_doc = rel.groupBy("doc").agg(
        F.collect_set("x").alias("sh"),
        *[
            F.min((F.lit(a) * (F.col("x") % p) + F.lit(b)) % p).alias(f"mh{i}")
            for i, (a, b) in enumerate(PERMS)
        ],
    ).persist()
    sets = per_doc.select("doc", "sh")
    bands = per_doc.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"mh{b * ROWS_PER_BAND + r}")
                                for r in range(ROWS_PER_BAND)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc", "band.band_idx", "band.band_key")

    left = bands.alias("l")
    right = bands.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )

    return (
        cand.join(sets.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# --- SimHash ---------------------------------------------------------------------
SIMHASH_BITS = 32
SIMHASH_BYTES = 4
HAMMING_MAX = 3


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash per document: explode tokens (with multiplicity — term
    frequency is the weight), one shuffle back onto the id with 32 signed bit
    votes as map-side-combinable SUMs, then reassemble the signature."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    ).withColumn("h", h56(F.col("token")))
    votes = tok.groupBy("doc").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << j)) != 0, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sig = sum(
        [
            F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(SIMHASH_BITS)
        ],
        start=F.lit(0),
    ).cast("long")
    return votes.select("doc", sig.alias("simhash")).orderBy("doc")


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = HAMMING_MAX
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming. Candidates come
    from byte-band buckets (4 bands × 8 bits); by pigeonhole any pair within
    Hamming ≤ 3 shares at least one identical byte, so the banding is exact,
    never just approximate."""
    sigs = simhash_signatures(df, id_col, text_col)
    bands = sigs.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned(F.col("simhash"), 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("band_key"),
                    )
                    for b in range(SIMHASH_BYTES)
                ]
            )
        ).alias("band"),
    ).select("doc", "simhash", "band.band_idx", "band.band_key")
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            F.expr("bit_count(l.simhash ^ r.simhash)").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


# --- exact n-gram Jaccard ----------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact all-pairs Jaccard ≥ threshold via an inverted-index self-join:
    explode distinct shingle hashes, join on the hash (shuffle on shingle —
    co-occurring docs meet without an all-pairs cross join), count shared
    shingles per pair, then J = shared / (|A| + |B| - shared).

    Scale note: hot shingles (boilerplate) blow up the self-join
    quadratically in their document frequency. ``max_df`` drops shingles
    appearing in more than that many documents *from the join only* (doc
    sizes keep every shingle, so J is never inflated — a pair sharing only
    boilerplate can drop out, pairs kept are scored exactly). The declared
    query runs with ``max_df=None`` so the oracle stays the pure
    definition; at 100 TB set it to ~0.1-1% of the corpus."""
    # distinct (doc, shingle-hash) pairs; persisted — feeds per-doc sizes and
    # both sides of the inverted self-join (identical plan → reused exchange)
    inv = shingle_relation(df, id_col, text_col).distinct().persist()
    sizes_src = inv
    if max_df is not None:
        hot = (
            inv.groupBy("x")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("x")
        )
        inv = inv.join(F.broadcast(hot), "x", "left_anti")
    sizes = sizes_src.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    l, r = inv.alias("l"), inv.alias("r")
    shared = (
        l.join(r, (F.col("l.x") == F.col("r.x")) & (F.col("l.doc") < F.col("r.doc")))
        .groupBy(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("shared") / (F.col("sz_a") + F.col("sz_b") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
