"""Dedup queries over the documents table, with DuckDB oracle twins.

The SQL is generated from the same permutation parameters, shingle size,
band layout, and thresholds as operators/dedup.py — signatures are integer
arithmetic end-to-end, so oracle matches are exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_mapreduce_spark.functions.hashing import MERSENNE_31, h56_sql
from hdfs_mapreduce_spark.operators.guards import NGRAM_UNCAPPED_MAX_ROWS
from hdfs_mapreduce_spark.operators.dedup import (
    edit_distance_pairs,
    winnowing_pairs,
    FP_MAX_DF,
    WINNOW_FOLD,
    WINNOW_MIN_SHARED,
    WINNOW_POS,
    WINNOW_W,
    BAND_BITS,
    DUPSPAN_K,
    RUN_GRAM_K,
    RUN_MAX_DF,
    RUN_MIN_TOKENS,
    duplicate_spans,
    exact_substring_runs,
    exact_substring_scrub,
    span_scrub,
    HAMMING_MAX,
    N_BANDS,
    N_PERM,
    PARA_WINDOW,
    PERMS,
    ROWS_PER_BAND,
    SHINGLE_K,
    SIMHASH_BANDS,
    SIMHASH_BITS,
    CHUNK_SIZE,
    CHUNK_STRIDE,
    chunk_documents,
    decontaminate,
    exact_dedup,
    incremental_minhash_pairs,
    minhash_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    paragraph_dedup,
    paragraph_scrub,
    simhash_pairs,
    simhash_signatures,
)
from hdfs_mapreduce_spark.sources.catalog import load_table, spread

MINHASH_THRESHOLD = 0.5
NGRAM_THRESHOLD = 0.5
# Hot-shingle cap for the declared capped query. At sf0.01 this prunes the
# shingles with df > 5 (the tail of the distribution tops out at 7), so the
# oracle genuinely exercises the cap; at 100 TB the cap would be ~0.1-1% of
# the corpus size.
NGRAM_MAX_DF = 5

# ---- shared DuckDB fragments -------------------------------------------------
_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
_SHINGLE_PARTS = " || ' ' || ".join(f"toks[i+{j}]" for j in range(SHINGLE_K))
_SHINGLES = (
    f"CASE WHEN len(toks) >= {SHINGLE_K} THEN "
    f"list_transform(generate_series(1, len(toks) - {SHINGLE_K - 1}), "
    f"i -> {_SHINGLE_PARTS}) "
    "ELSE [array_to_string(toks, ' ')] END"
)
_SH = f"list_distinct(list_transform({_SHINGLES}, s -> {h56_sql('s')}))"


def _mh_sql(a: int, b: int) -> str:
    return (
        f"list_min(list_transform(sh, x -> "
        f"({a} * (x % {MERSENNE_31}) + {b}) % {MERSENNE_31}))"
    )


def _base_cte(name: str, perms: list[tuple[int, int]]) -> str:
    """Signature CTE for one b/r configuration: per-doc shingle set plus
    one MIN-permutation column per (a, b) pair. Both the default (r=2)
    and wide (r=4) oracles generate from this one builder, so the
    shingle/minhash formula can never silently diverge between them."""
    return f"""
    {name} AS (
        SELECT doc, sh,
               {', '.join(f'{_mh_sql(a, b)} AS mh{i}' for i, (a, b) in enumerate(perms))}
        FROM (SELECT doc_id AS doc, {_SH} AS sh
              FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
              WHERE len(toks) >= 1) s
    )
"""


def _bands_cte(name: str, src: str, n_bands: int, rows_per_band: int) -> str:
    def key(b: int) -> str:
        cols = [
            f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
            for r in range(rows_per_band)
        ]
        return " || ':' || ".join(cols)

    return f"{name} AS (" + " UNION ALL ".join(
        f"SELECT doc, {b} AS band_idx, {key(b)} AS band_key FROM {src}"
        for b in range(n_bands)
    ) + ")"


_BASE_CTE = _base_cte("base", PERMS)
_BANDS_CTE = _bands_cte("bands", "base", N_BANDS, ROWS_PER_BAND)

# ---- wide-band (production r=4) configuration --------------------------------
# The default sketch (16 perms × 8 bands → r=2 rows/band) has a CONSTANT
# per-pair chance-collision rate between dissimilar docs, so false candidates
# grow ~N² — the r8 sf1→sf10 octave measured that term directly. The
# billion-doc production configuration is wider bands: 32 perms × 8 bands →
# r=4 squares the per-band false-positive rate (the verify keeps results
# exact either way; what changes is candidate volume). Recall at the 0.5
# threshold follows 1-(1-s^r)^b — lower at the threshold edge, steep above
# it — which dedup_lsh_recall audits for the default and this twin makes
# oracle-certifiable for the wide form.
from hdfs_mapreduce_spark.operators.dedup import (  # noqa: E402
    WIDE_BANDS,
    WIDE_PERM,
)

WIDE_ROWS_PER_BAND = WIDE_PERM // WIDE_BANDS
# perm_params is a deterministic sequence: the first 16 (a, b) pairs equal
# PERMS, the next 16 extend it — same seed as the operator side.
from hdfs_mapreduce_spark.functions.hashing import perm_params  # noqa: E402

WIDE_PERMS = perm_params(WIDE_PERM, seed=42)


_WBASE_CTE = _base_cte("wbase", WIDE_PERMS)
_WBANDS_CTE = _bands_cte("wbands", "wbase", WIDE_BANDS, WIDE_ROWS_PER_BAND)


# ---- queries -------------------------------------------------------------------
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return exact_dedup(docs, "doc_id", "text")


def dedup_minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return minhash_signatures(docs, "doc_id", "text")


def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The b/r point is PINNED at every declared call site (round-10
    # ADVICE): this relation's oracle is generated from the 16×8 CTEs,
    # so letting auto_band_config resolve it would silently change the
    # emitted pair SET — not just candidate economics — the moment a
    # corpus crosses AUTO_WIDE_MIN_DOCS, and the declared hash would go
    # red. The wide production point is its own declared query
    # (dedup_minhash_pairs_wide); the count-probe default stays the
    # library behaviour for direct operator callers. Pinning also drops
    # the probe's eager count job from every declared plan build.
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return minhash_pairs(
        docs, "doc_id", "text", MINHASH_THRESHOLD,
        n_perm=N_PERM, n_bands=N_BANDS,
    )


def dedup_minhash_pairs_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs under the PRODUCTION wide-band sketch (32 perms ×
    8 bands → r=4 rows/band). Same operator, same exact-Jaccard verify,
    same threshold as dedup_minhash_pairs — only the b/r point moves: at
    r=4 the chance band-collision rate between dissimilar docs is the
    default config's rate SQUARED, killing the ~N² false-candidate term
    the r8 sf1→sf10 octave measured at r=2. This is the configuration a
    billion-doc corpus runs; the r=2 default stays declared as the
    recall-favouring small-corpus form."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return minhash_pairs(
        docs, "doc_id", "text", MINHASH_THRESHOLD,
        n_perm=WIDE_PERM, n_bands=WIDE_BANDS,
    )


def dedup_simhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    # Presentation sort lives here, not in the operator: simhash_pairs
    # composes the signature plan and must not inherit a mid-pipeline
    # global sort (a range exchange per join side for nothing).
    return simhash_signatures(docs, "doc_id", "text").orderBy("doc")


def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return simhash_pairs(docs, "doc_id", "text", HAMMING_MAX)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", NGRAM_THRESHOLD,
        max_rows=NGRAM_UNCAPPED_MAX_ROWS,
    )


def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-quality audit a dedup pipeline monitors continuously:
    the banded MinHash pair relation scored against the exact n-gram
    Jaccard pairs at the same threshold — one row of (n_exact, n_lsh,
    n_both, recall, precision). Both inputs are already-verified declared
    relations (full-outer join on the pair key), so this also certifies
    their agreement end-to-end. The exact side is the CAPPED relation
    (dedup_ngram_jaccard_capped) — the r4 verdict flagged the uncapped
    inverted-index self-join as quadratic under a hot boilerplate shingle
    at 100 TB, and an audit that runs continuously must itself use the
    scale-safe plan; the capped score is exact over the non-boilerplate
    shingle space, which is also the fairer yardstick for MinHash (whose
    signal is content similarity, not shared boilerplate). Scale: pair
    relations are tiny relative to the corpus (the expensive work happens
    inside each input's own plan) and the audit is a pair-keyed join +
    1-row aggregate."""
    exact = dedup_ngram_jaccard_capped(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_exact")
    )
    lsh = dedup_minhash_pairs(spark, sf_dir).select(
        "doc_a", "doc_b", F.lit(1).alias("in_lsh")
    )
    joined = exact.join(lsh, ["doc_a", "doc_b"], "full_outer")
    return joined.agg(
        F.count("in_exact").alias("n_exact"),
        F.count("in_lsh").alias("n_lsh"),
        F.count(F.when((F.col("in_exact") == 1) & (F.col("in_lsh") == 1), 1)).alias(
            "n_both"
        ),
    ).select(
        "n_exact",
        "n_lsh",
        "n_both",
        # explicit NULL when a denominator is 0 — matches the oracle's
        # CASE, so a duplicate-free corpus still hash-matches
        F.when(
            F.col("n_exact") > 0,
            F.col("n_both").cast("double") / F.col("n_exact"),
        ).alias("recall"),
        F.when(
            F.col("n_lsh") > 0,
            F.col("n_both").cast("double") / F.col("n_lsh"),
        ).alias("precision"),
    )


def _canonical_over_minhash(
    spark: SparkSession, sf_dir: str, tag: str
) -> DataFrame:
    """(doc_id, canonical) over the MinHash pair graph — the shared front
    half of dedup_components / dedup_keep_best / dataset_split_safe. The
    pair relation is materialized first via the materialize-then-probe
    API (the components module's documented 100 TB pattern: the edge
    list is orders of magnitude smaller than the corpus, so the
    convergence probe and the k unrolled propagation rounds scan that
    tiny table instead of re-running the LSH pipeline — measured ~2.5x
    faster at sf0.1, same result). The write lands under the session's
    applicationId-keyed scratch dir, so concurrent sessions on the same
    sf can never clobber each other's edges (r2 verdict fix)."""
    import os

    from hdfs_mapreduce_spark.operators.components import canonical_assignment
    from hdfs_mapreduce_spark.operators.materialize import (
        materialize_minhash_pairs,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    edges = materialize_minhash_pairs(
        docs,
        "doc_id",
        "text",
        MINHASH_THRESHOLD,
        name=f"{tag}_edges_{os.path.basename(sf_dir.rstrip('/'))}",
        n_perm=N_PERM,
        n_bands=N_BANDS,  # oracle-pinned (dedup_minhash_pairs)
    )
    return canonical_assignment(
        docs.select("doc_id"), "doc_id", edges, "doc_a", "doc_b"
    )


def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram over the near-dup graph: (cluster_size,
    n_clusters, n_docs) — the one-page observability readout a dedup
    owner actually watches. A healthy crawl batch is overwhelmingly
    size-1 with a thin tail; a sudden mass at high sizes means template
    spam or a broken upstream join, and total kept docs after keep-one
    dedup is Σ n_clusters — this histogram answers "how much will dedup
    remove" BEFORE committing to the scrub. Cost beyond the component
    labeling itself: one canonical-keyed aggregate of integers."""
    assign = _canonical_over_minhash(spark, sf_dir, "dedup_hist")
    sizes = assign.groupBy("canonical").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
        .orderBy("cluster_size")
    )


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → dedup groups: connected components over the MinHash
    pair graph, every document mapped to its component's min doc_id (itself
    when it has no near-dups). ``canonical_id == doc_id`` is the survivor
    predicate a curation pipeline filters on. The oracle computes the same
    labeling as a recursive-CTE transitive closure over the identical pair
    SQL. Edge materialization and the 100 TB rationale:
    ``_canonical_over_minhash``."""
    assign = _canonical_over_minhash(spark, sf_dir, "dedup")
    return assign.select(
        "doc_id", F.col("canonical").alias("canonical_id")
    ).orderBy("doc_id")


EDIT_KEY_LEN = 40
EDIT_WINDOW_LEN = 16
EDIT_MAX_DIST = 2
# Hot deletion-variant cap (the FP_MAX_DF / PHASH_BAND_MAX discipline):
# a variant shared by >C docs contributes O(df²) candidate rows, and df
# tracks duplicate-GROUP size — a boilerplate prefix shared by 10⁶ docs
# would alone be quadratic. C=64 bounds every variant at C²/2 candidates;
# synthetic fixture dfs peak at 11 (sf0.1), so at test scale the capped
# and uncapped relations coincide, and the oracle mirrors the exclusion.
EDIT_VARIANT_MAX_DF = 64


def dedup_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-key near-dup pairs by deletion-neighborhood blocking
    (operators/dedup.py edit_distance_pairs): two docs are candidates
    iff their 16-char key windows share a ≤1-deletion variant (holds
    exactly when the windows are within one edit), then JVM-side
    levenshtein ≤ 2 on the 40-char key verifies. The title/URL
    fuzzy-match modality the shingle family can't express; bucket sizes
    track duplicate groups (output-sized), not prefix vocabulary, so
    the plan stays ~linear at 100× (the prefix-bucket first cut went
    quadratic at sf1 — see the operator docstring), and variants hotter
    than EDIT_VARIANT_MAX_DF docs are excluded from blocking so no
    single boilerplate prefix can go quadratic. The oracle emits the
    identical variant set, hot-variant exclusion, and verify filter."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return edit_distance_pairs(
        docs,
        "doc_id",
        "text",
        key_len=EDIT_KEY_LEN,
        window_len=EDIT_WINDOW_LEN,
        max_dist=EDIT_MAX_DIST,
        max_variant_df=EDIT_VARIANT_MAX_DF,
    )


PAGERANK_ITERS = 3
PAGERANK_DAMPING = 0.85


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality over the near-dup similarity graph: 3 power-iteration
    PageRank rounds (operators/components.py pagerank) on the
    symmetrized MinHash pair relation — which documents are hubs of a
    duplicate neighborhood, the weighting signal corpus-curation
    sampling consumes (contrast dedup_components, which only partitions
    the graph). Edges are materialized once (the components module's
    100 TB pattern) so the three unrolled rounds scan a tiny parquet
    table; the oracle unrolls the identical three rounds as chained
    CTEs over the same pair SQL. Ranks are rounded to 6 decimals (the
    only engine difference is float SUM order, ~1e-16 relative)."""
    import os

    from hdfs_mapreduce_spark.operators.components import pagerank
    from hdfs_mapreduce_spark.operators.materialize import (
        materialize_minhash_pairs,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    pairs = materialize_minhash_pairs(
        docs,
        "doc_id",
        "text",
        MINHASH_THRESHOLD,
        name=f"pagerank_edges_{os.path.basename(sf_dir.rstrip('/'))}",
        n_perm=N_PERM,
        n_bands=N_BANDS,  # oracle-pinned (dedup_minhash_pairs)
    )
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    pr = pagerank(edges, iters=PAGERANK_ITERS, damping=PAGERANK_DAMPING)
    return pr.select(
        "node", (F.round("rank", 6) + F.lit(0.0)).alias("rank")
    ).orderBy("node")


def dedup_components_logrounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The O(log n)-round star-contraction variant of dedup_components
    (operators/components.py connected_components_logrounds — alternating
    large-star/small-star, the algorithm for long-chain graphs where
    min-label propagation's O(diameter) rounds would bottleneck). Same
    MinHash edge relation, same (doc_id, canonical_id) output contract,
    and the labeling is provably identical to min-label components — so
    it shares the dedup_components recursive-CTE oracle verbatim.
    Declared in round 4 (was pytest-only: tests/test_dedup.py
    test_logrounds_components_match_union_find)."""
    import os

    from hdfs_mapreduce_spark.operators.components import (
        connected_components_logrounds,
    )
    from hdfs_mapreduce_spark.operators.materialize import (
        materialize_minhash_pairs,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    edges = materialize_minhash_pairs(
        docs,
        "doc_id",
        "text",
        MINHASH_THRESHOLD,
        name=f"logrounds_edges_{os.path.basename(sf_dir.rstrip('/'))}",
        n_perm=N_PERM,
        n_bands=N_BANDS,  # oracle-pinned (dedup_minhash_pairs)
    )
    labels = connected_components_logrounds(edges, "doc_a", "doc_b")
    return (
        docs.select("doc_id")
        .join(labels, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id", F.coalesce("label", "doc_id").alias("canonical_id")
        )
        .orderBy("doc_id")
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware survivor selection: near-dup components (same edge
    relation as dedup_components) reduced to one kept document per cluster
    — the *longest* member (n_chars desc, doc_id tie-break), not the
    arbitrary min-id. This is the curation step after clustering: MinHash
    tells you who duplicates whom; keep-best decides which copy enters the
    training set. Ranking keys are stored integers, so oracle parity is
    exact. Costs one extra broadcast-size join over dedup_components: the
    per-cluster argmax runs on the (doc → canonical) assignment, which is
    corpus-row-count sized but only 3 integer columns wide at 100 TB."""
    from pyspark.sql.window import Window

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    assign = _canonical_over_minhash(spark, sf_dir, "keepbest")
    member = assign.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("canonical").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    best = (
        member.select(
            "canonical", "doc_id", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("canonical").alias("canonical_id"),
            F.col("doc_id").alias("kept_id"),
        )
    )
    counts = assign.groupBy(F.col("canonical").alias("canonical_id")).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    return best.join(counts, "canonical_id").orderBy("canonical_id")


def dataset_split_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the hash gate runs on the
    near-dup CLUSTER canonical id, not the doc id, so every member of a
    near-dup cluster lands in the same split — the guard that stops a
    training document's near-duplicate from leaking into the eval split.
    Same 98/1/1 thresholds as dataset_split (text_plans); the difference
    is exactly one join against the (doc → canonical) assignment. The
    leakage property itself is asserted in tests/test_dedup.py."""
    from hdfs_mapreduce_spark.functions.hashing import h56
    from hdfs_mapreduce_spark.plans.text_plans import SPLIT_MOD, SPLIT_TRAIN

    assign = _canonical_over_minhash(spark, sf_dir, "splitsafe")
    bucket = h56(F.concat(F.lit("split:"), F.col("canonical"))) % SPLIT_MOD
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket == SPLIT_TRAIN, "val")
        .otherwise("test")
    )
    return (
        assign.select("doc_id", split.alias("split"), "canonical")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("canonical").alias("n_clusters"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("split")
    )


def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path: hot-shingle cap live in the verified plan. Jaccard is
    exact over the reduced shingle space (df ≤ NGRAM_MAX_DF on both the
    inverted index and the size counts)."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", NGRAM_THRESHOLD, max_df=NGRAM_MAX_DF
    )


# Synthetic eval split for the decontamination query: every 50th doc plays
# the benchmark; the rest is the training corpus. Both faces derive the
# split from the same modulus.
DECON_MOD = 50
DECON_MIN_HITS = 2


def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination against a synthetic benchmark (doc_id % 50 == 0):
    training docs sharing >= DECON_MIN_HITS distinct 3-gram shingles with
    the benchmark set. The benchmark shingle vocabulary broadcasts; the
    corpus side stays a map-scan (see operators/dedup.py:decontaminate)."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    bench = docs.filter(F.col("doc_id") % DECON_MOD == 0)
    train = docs.filter(F.col("doc_id") % DECON_MOD != 0)
    out = decontaminate(
        train, bench, "doc_id", "text", min_hits=DECON_MIN_HITS
    )
    return out.select(F.col("doc").alias("doc_id"), "n_hits")


# Incremental-ingest split: every 5th doc plays the incoming batch, the
# rest is the standing corpus (at sf0.01 this yields cross-set near-dups,
# so the oracle exercises real hits, not an empty result).
INC_MOD = 5


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-batch-vs-corpus dedup: flag incoming docs (doc_id % 5 == 0) that
    near-duplicate the standing corpus. The batch sketch broadcasts; the
    corpus is probed band-wise with no self-join — the only dedup shape
    that scales to continuous ingest against 100 TB (see
    operators/dedup.py:incremental_minhash_pairs)."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    new = docs.filter(F.col("doc_id") % INC_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % INC_MOD != 0)
    return incremental_minhash_pairs(
        corpus, new, "doc_id", "text", MINHASH_THRESHOLD,
        n_perm=N_PERM, n_bands=N_BANDS,  # oracle-pinned (dedup_minhash_pairs)
    )


def text_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint overlap pairs (operators/dedup.py
    winnowing_pairs — the MOSS algorithm): documents sharing ≥
    WINNOW_MIN_SHARED selected window-minimum shingle hashes, hot
    fingerprints (df > FP_MAX_DF) dropped. The contiguous-overlap
    detector with a guaranteed floor — any shared run of W+K-1 tokens
    surfaces — complementing MinHash (global set similarity) and the
    span family (exact 64-gram matches). Integer-only: no float
    surface."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return winnowing_pairs(docs, "doc_id", "text").orderBy(
        "doc_a", "doc_b"
    )


BOILERPLATE_TOP_K = 20


def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter shingles: the BOILERPLATE_TOP_K most document-frequent
    3-gram shingles in the corpus — the report that tells you what
    `max_df` should prune (ngram_jaccard's hot-shingle cap) and what
    boilerplate dominates a crawl. Exact top-k: distinct (doc, shingle) →
    partial-agg count → TakeOrdered — no global sort, no sketch needed
    because the output domain is k rows."""
    from hdfs_mapreduce_spark.functions.text import tokens

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    toks = tokens(F.lower(F.col("text")))
    base = docs.select(
        F.col("doc_id").alias("doc"), toks.alias("tk"), F.size(toks).alias("cnt")
    )
    shingles = (
        F.when(
            F.col("cnt") >= SHINGLE_K,
            F.transform(
                F.sequence(F.lit(0), F.col("cnt") - SHINGLE_K),
                lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, SHINGLE_K)),
            ),
        )
        .when(F.col("cnt") > 0, F.array(F.array_join(F.col("tk"), " ")))
        .otherwise(F.array().cast("array<string>"))
    )
    return (
        base.select("doc", F.explode(shingles).alias("shingle"))
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), "shingle")
        .limit(BOILERPLATE_TOP_K)
    )


def pipeline_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping RAG-style chunking of every document (size=CHUNK_SIZE,
    stride=CHUNK_STRIDE tokens), ordered output. Map-only."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return chunk_documents(docs, "doc_id", "text").orderBy("doc", "chunk_idx")


def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return paragraph_dedup(docs, "doc_id", "text", window=PARA_WINDOW)


def dedup_paragraph_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return paragraph_scrub(
        docs, "doc_id", "text", window=PARA_WINDOW
    ).withColumnRenamed("doc", "doc_id")


def dedup_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first exact-substring scrub over DUPSPAN_K-token windows —
    see operators/dedup.py span_scrub."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return span_scrub(docs, "doc_id", "text", k=DUPSPAN_K).withColumnRenamed(
        "doc", "doc_id"
    )


def dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated DUPSPAN_K-token spans per document (exact
    substring dedup à la Lee et al. 2021) — see operators/dedup.py
    duplicate_spans for the plan shape."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return duplicate_spans(docs, "doc_id", "text", k=DUPSPAN_K).withColumnRenamed(
        "doc", "doc_id"
    )


def dedup_exact_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal exact cross-document repeated runs >= RUN_MIN_TOKENS tokens
    as (doc_a, doc_b) pairs with both sides' bounds — the Lee et al. 2022
    suffix-array pass as a sorted k-gram chain (operators/dedup.py
    exact_substring_runs). The paired complement of dedup_spans: each row
    is one run one specific pair shares verbatim."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return exact_substring_runs(
        docs, "doc_id", "text", k=RUN_GRAM_K, min_tokens=RUN_MIN_TOKENS,
        max_df=RUN_MAX_DF,
    )


def dedup_exact_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first excision of the cross-document exact runs: the lower
    doc id keeps its copy, the higher id's covered positions scrub out
    (operators/dedup.py exact_substring_scrub)."""
    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    return exact_substring_scrub(
        docs, "doc_id", "text", k=RUN_GRAM_K, min_tokens=RUN_MIN_TOKENS,
        max_df=RUN_MAX_DF,
    ).withColumnRenamed("doc", "doc_id")


def corpus_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication diagnostics: for every pair of sources,
    the number of distinct shingles present in both and the shingle-set
    Jaccard — the report that tells a curation pipeline which crawls/
    dumps overlap before it decides mixture weights or dedup priority.

    Scale shape: map-only shingling keyed by SOURCE (shingle_relation
    with id_col="source"), ONE corpus-sized shuffle — the shingle-keyed
    collect_set, which dedups (source, shingle) itself, so no separate
    distinct pass exists — then pairs are expanded array-side from the
    sorted set (s·(s−1)/2 per shingle, s = #sources carrying it) and
    counted with a partial agg on the pair key; per-source totals come
    from EXPLODING the collected sets (a shingle-vocabulary-sized
    relation, not the corpus) and join back as broadcasts. Output
    cardinality is ≤ sources²/2 rows; nothing document-quadratic exists
    anywhere."""
    from hdfs_mapreduce_spark.operators.dedup import shingle_relation

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    inv = shingle_relation(docs, "source", "text")
    sets = inv.groupBy("x").agg(
        F.array_sort(F.collect_set("doc")).alias("srcs")
    )
    totals = (
        sets.select(F.explode("srcs").alias("doc"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("tot"))
    )
    per_sh = sets.filter(F.size("srcs") >= 2)
    pairs = per_sh.select(
        F.explode(
            F.flatten(
                F.transform(
                    "srcs",
                    lambda s, i: F.transform(
                        F.slice(
                            F.col("srcs"), i + 2, F.size("srcs")
                        ),
                        lambda t: F.struct(
                            s.alias("source_a"), t.alias("source_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.source_a", "p.source_b")
    shared = pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("shared")
    )
    ta = totals.select(
        F.col("doc").alias("source_a"), F.col("tot").alias("tot_a")
    )
    tb = totals.select(
        F.col("doc").alias("source_b"), F.col("tot").alias("tot_b")
    )
    return (
        shared.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "shared",
            F.round(
                F.col("shared")
                / (F.col("tot_a") + F.col("tot_b") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def dataset_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination audit: the verified minhash near-dup
    pairs, each labeled with BOTH members' hash-split assignment
    (dataset_split's rule, computed map-side from the ids — no join) and
    counted per normalized (lo, hi) split combination. Rows with
    leaks=true are near-duplicates straddling train/val/test — the
    measured reason dataset_split_safe (component-level splitting)
    exists. Cost = the pair relation + one tiny groupBy."""
    from hdfs_mapreduce_spark.functions.hashing import h56
    from hdfs_mapreduce_spark.plans.text_plans import (
        SPLIT_MOD,
        SPLIT_TRAIN,
    )

    docs = spread(load_table(spark, sf_dir, "documents"), spark)
    pairs = minhash_pairs(
        docs, "doc_id", "text", MINHASH_THRESHOLD,
        n_perm=N_PERM, n_bands=N_BANDS,  # oracle-pinned (dedup_minhash_pairs)
    )

    def split_of(c):
        b = h56(F.concat(F.lit("split:"), c)) % SPLIT_MOD
        return (
            F.when(b < SPLIT_TRAIN, "train")
            .when(b == SPLIT_TRAIN, "val")
            .otherwise("test")
        )

    sa, sb = split_of(F.col("doc_a")), split_of(F.col("doc_b"))
    return (
        pairs.select(
            F.least(sa, sb).alias("split_lo"),
            F.greatest(sa, sb).alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaks", F.col("split_lo") != F.col("split_hi"))
        .orderBy("split_lo", "split_hi")
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dataset_split_leakage": dataset_split_leakage,
    "corpus_overlap_matrix": corpus_overlap_matrix,
    "dedup_spans": dedup_spans,
    "dedup_span_scrub": dedup_span_scrub,
    "dedup_exact_substrings": dedup_exact_substrings,
    "dedup_exact_substring_scrub": dedup_exact_substring_scrub,
    "dedup_paragraphs": dedup_paragraphs,
    "dedup_paragraph_scrub": dedup_paragraph_scrub,
    "pipeline_chunk": pipeline_chunk,
    "dedup_decontaminate": dedup_decontaminate,
    "boilerplate_ngrams": boilerplate_ngrams,
    "dedup_minhash_sigs": dedup_minhash_sigs,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "dedup_minhash_pairs_wide": dedup_minhash_pairs_wide,
    "dedup_simhash_sigs": dedup_simhash_sigs,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_lsh_recall": dedup_lsh_recall,
    "dedup_ngram_jaccard_capped": dedup_ngram_jaccard_capped,
    "dedup_components": dedup_components,
    "dedup_cluster_sizes": dedup_cluster_sizes,
    "graph_pagerank": graph_pagerank,
    "dedup_edit_pairs": dedup_edit_pairs,
    "dedup_components_logrounds": dedup_components_logrounds,
    "dedup_keep_best": dedup_keep_best,
    "dataset_split_safe": dataset_split_safe,
    "dedup_incremental": dedup_incremental,
    "text_winnowing": text_winnowing,
}

# Branchless bit votes, the same identity as the Spark side: the signed vote
# Σ±1 is 2·s_j − n with s_j = Σ((h >> j) & 1); v_j > 0 ⇔ 2·s_j > n.
_SIMHASH_VOTES = "COUNT(*) AS n, " + ", ".join(
    f"SUM((h >> {j}) & 1) AS s{j}" for j in range(SIMHASH_BITS)
)
_SIMHASH_SIG = " + ".join(
    f"(CASE WHEN 2 * s{j} > n THEN {1 << j} ELSE 0 END)"
    for j in range(SIMHASH_BITS)
)
_SIMHASH_CTE = f"""
    tok AS (SELECT doc_id AS doc, unnest({_TOKS}) AS token FROM documents),
    hashed AS (SELECT doc, {h56_sql('token')} AS h FROM tok),
    votes AS (SELECT doc, {_SIMHASH_VOTES} FROM hashed GROUP BY doc),
    sigs AS (SELECT doc, CAST({_SIMHASH_SIG} AS BIGINT) AS simhash FROM votes)
"""
_SIMHASH_BANDS = "simbands AS (" + " UNION ALL ".join(
    f"SELECT doc, simhash, {b} AS band_idx, "
    f"(simhash >> {BAND_BITS * b}) & {(1 << BAND_BITS) - 1} AS band_key FROM sigs"
    for b in range(SIMHASH_BANDS)
) + ")"

# Transitive closure over the MinHash pair relation — shared by the
# dedup_components and dedup_keep_best oracles (substituted below).
_COMPONENT_CTES = f"""
        cand AS (
            SELECT DISTINCT l.doc AS doc_a, r.doc AS doc_b
            FROM bands l JOIN bands r
              ON l.band_idx = r.band_idx AND l.band_key = r.band_key
             AND l.doc < r.doc
        ),
        pairs AS (
            SELECT doc_a, doc_b FROM (
                SELECT c.doc_a, c.doc_b,
                       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                           / len(list_distinct(a.sh || b.sh)) AS jaccard
                FROM cand c
                JOIN base a ON a.doc = c.doc_a
                JOIN base b ON b.doc = c.doc_b
            ) WHERE jaccard >= {MINHASH_THRESHOLD}
        ),
        edges AS (
            SELECT doc_a AS a, doc_b AS b FROM pairs
            UNION ALL SELECT doc_b, doc_a FROM pairs
        ),
        reach AS (
            SELECT a, b FROM edges
            UNION
            SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
        ),
        labels AS (SELECT a AS node, MIN(b) AS mn FROM reach GROUP BY a)
"""

# Fixed-window span relation for the paragraph-dedup oracles: chunk starts
# from generate_series(1, len, W), pidx = (s-1) // W matches posexplode.
_PARA_CTES = f"""
    tkc AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    para AS (
        SELECT doc, (s - 1) // {PARA_WINDOW} AS pidx,
               array_to_string(list_slice(tk, s, s + {PARA_WINDOW} - 1), ' ') AS p
        FROM (SELECT doc_id AS doc, tk,
                     unnest(generate_series(1, len(tk), {PARA_WINDOW})) AS s
              FROM tkc WHERE len(tk) > 0)
    )
"""

_DUPSPAN_SHINGLE = " || ' ' || ".join(f"toks[i+{j}]" for j in range(DUPSPAN_K))

def _lsh_recall_sql() -> str:
    """Composes the two already-verified pair oracles (their full SQL as
    CTE bodies) into the agreement report. The exact side is the CAPPED
    jaccard oracle, mirroring the Spark plan's scale-safe exact side."""
    exact = ORACLE_SQL["dedup_ngram_jaccard_capped"]
    lsh = ORACLE_SQL["dedup_minhash_pairs"]
    return f"""
        WITH exact_pairs AS ({exact}),
        lsh_pairs AS ({lsh}),
        j AS (
            SELECT COALESCE(e.doc_a, l.doc_a) AS doc_a,
                   COALESCE(e.doc_b, l.doc_b) AS doc_b,
                   e.doc_a IS NOT NULL AS in_exact,
                   l.doc_a IS NOT NULL AS in_lsh
            FROM exact_pairs e
            FULL OUTER JOIN lsh_pairs l
              ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b
        )
        SELECT n_exact, n_lsh, n_both,
               CASE WHEN n_exact > 0
                    THEN CAST(n_both AS DOUBLE) / n_exact END AS recall,
               CASE WHEN n_lsh > 0
                    THEN CAST(n_both AS DOUBLE) / n_lsh END AS precision
        FROM (
            SELECT CAST(COALESCE(SUM(CAST(in_exact AS BIGINT)), 0) AS BIGINT)
                       AS n_exact,
                   CAST(COALESCE(SUM(CAST(in_lsh AS BIGINT)), 0) AS BIGINT)
                       AS n_lsh,
                   CAST(COALESCE(SUM(CAST(in_exact AND in_lsh AS BIGINT)), 0)
                       AS BIGINT) AS n_both
            FROM j)
    """


ORACLE_SQL = {
    "dedup_spans": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        sh AS (
            SELECT doc_id, i - 1 AS pos, {_DUPSPAN_SHINGLE} AS sh
            FROM (SELECT doc_id, toks,
                         unnest(generate_series(1, len(toks) - {DUPSPAN_K} + 1)) AS i
                  FROM t WHERE len(toks) >= {DUPSPAN_K})
        ),
        dup AS (
            SELECT doc_id, pos FROM (
                SELECT doc_id, pos, COUNT(*) OVER (PARTITION BY sh) AS cnt FROM sh
            ) WHERE cnt >= 2
        ),
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN lag(pos) OVER w IS NULL
                             OR pos > lag(pos) OVER w + {DUPSPAN_K}
                        THEN 1 ELSE 0 END AS new_span
            FROM dup
            WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ),
        islands AS (
            SELECT doc_id, pos,
                   SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos) AS span_id
            FROM flagged
        )
        SELECT doc_id,
               CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + {DUPSPAN_K} - 1 AS BIGINT) AS span_end,
               CAST(MAX(pos) + {DUPSPAN_K} - MIN(pos) AS BIGINT) AS n_tokens
        FROM islands GROUP BY doc_id, span_id
        ORDER BY doc_id, span_start
    """,
    "dedup_span_scrub": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        sh AS (
            SELECT doc_id, i - 1 AS pos, {_DUPSPAN_SHINGLE} AS sh
            FROM (SELECT doc_id, toks,
                         unnest(generate_series(1, len(toks) - {DUPSPAN_K} + 1)) AS i
                  FROM t WHERE len(toks) >= {DUPSPAN_K})
        ),
        occ AS (
            SELECT doc_id, pos,
                   COUNT(*) OVER (PARTITION BY sh) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY sh ORDER BY doc_id, pos) AS rn
            FROM sh
        ),
        cover AS (
            SELECT doc_id,
                   unnest(generate_series(pos, pos + {DUPSPAN_K} - 1)) AS i,
                   rn = 1 AS kept
            FROM occ WHERE cnt >= 2
        ),
        scrub AS (
            SELECT doc_id, list_sort(list(i)) AS sp
            FROM (SELECT doc_id, i, MAX(kept) AS any_kept
                  FROM cover GROUP BY doc_id, i)
            WHERE NOT any_kept GROUP BY doc_id
        ),
        j AS (
            SELECT t.doc_id, toks, COALESCE(sp, CAST([] AS BIGINT[])) AS sp
            FROM t LEFT JOIN scrub USING (doc_id)
        )
        SELECT doc_id,
               CAST(len(sp) AS BIGINT) AS n_removed,
               CAST(len(toks) - len(sp) AS BIGINT) AS n_kept,
               -- array_to_string([]) is NULL in DuckDB but '' in Spark's
               -- array_join: coalesce so fully-scrubbed docs hash alike.
               md5(COALESCE(array_to_string(
                   list_filter(
                       list_transform(generate_series(1, len(toks)),
                           jj -> CASE WHEN list_contains(sp, jj - 1)
                                      THEN NULL ELSE toks[jj] END),
                       x -> x IS NOT NULL), ' '), '')) AS scrubbed_hash
        FROM j ORDER BY doc_id
    """,
    "pipeline_chunk": f"""
        WITH tkc AS (
            SELECT doc_id AS doc, {_TOKS.replace("text", "text")} AS tk
            FROM documents
        ),
        starts AS (
            SELECT doc, tk,
                   unnest(generate_series(0,
                       CASE WHEN len(tk) > {CHUNK_SIZE}
                            THEN CAST(ceil(CAST(len(tk) - {CHUNK_SIZE} AS DOUBLE)
                                           / {CHUNK_STRIDE}) AS BIGINT)
                            ELSE 0 END)) AS k
            FROM tkc WHERE len(tk) > 0
        )
        SELECT doc, CAST(k AS INT) AS chunk_idx,
               array_to_string(list_slice(tk, k * {CHUNK_STRIDE} + 1,
                                          k * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' ')
                   AS chunk,
               len(string_split(array_to_string(
                   list_slice(tk, k * {CHUNK_STRIDE} + 1,
                              k * {CHUNK_STRIDE} + {CHUNK_SIZE}), ' '), ' '))
                   AS n_tokens
        FROM starts ORDER BY doc, chunk_idx
    """,
    "dedup_paragraphs": f"""
        WITH {_PARA_CTES}
        SELECT md5(p) AS phash, COUNT(*) AS n_copies,
               COUNT(DISTINCT doc) AS n_docs, MIN(doc) AS first_doc
        FROM para GROUP BY 1 HAVING COUNT(*) > 1
        ORDER BY first_doc, phash
    """,
    "dedup_paragraph_scrub": f"""
        WITH {_PARA_CTES},
        ranked AS (
            SELECT doc, pidx, p,
                   ROW_NUMBER() OVER (PARTITION BY md5(p) ORDER BY doc, pidx) AS rn
            FROM para
        )
        SELECT doc AS doc_id, COUNT(*) AS n_kept,
               md5(string_agg(p, ' ' ORDER BY pidx)) AS scrubbed_hash
        FROM ranked WHERE rn = 1
        GROUP BY doc ORDER BY doc_id
    """,
    "boilerplate_ngrams": f"""
        WITH sh AS (
            SELECT DISTINCT doc_id, unnest({_SHINGLES}) AS shingle
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
            WHERE len(toks) >= 1
        )
        SELECT shingle, COUNT(*) AS df
        FROM sh GROUP BY shingle
        ORDER BY df DESC, shingle LIMIT {BOILERPLATE_TOP_K}
    """,
    "dedup_decontaminate": f"""
        WITH sh AS (
            SELECT doc_id, unnest({_SH}) AS x
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
            WHERE len(toks) >= 1
        ),
        bench AS (SELECT DISTINCT x FROM sh WHERE doc_id % {DECON_MOD} = 0)
        SELECT s.doc_id, COUNT(*) AS n_hits
        FROM sh s JOIN bench b ON s.x = b.x
        WHERE s.doc_id % {DECON_MOD} <> 0
        GROUP BY s.doc_id
        HAVING COUNT(*) >= {DECON_MIN_HITS}
        ORDER BY s.doc_id
    """,
    "dedup_exact": """
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text) ORDER BY keep_id
    """,
    "dedup_minhash_sigs": f"""
        WITH {_BASE_CTE}
        SELECT doc AS doc_id,
               {', '.join(f'mh{i}' for i in range(N_PERM))}
        FROM base ORDER BY doc_id
    """,
    "dedup_minhash_pairs_wide": f"""
        WITH {_WBASE_CTE},
        {_WBANDS_CTE},
        cand AS (
            SELECT DISTINCT l.doc AS doc_a, r.doc AS doc_b
            FROM wbands l JOIN wbands r
              ON l.band_idx = r.band_idx AND l.band_key = r.band_key
             AND l.doc < r.doc
        )
        SELECT doc_a, doc_b, jaccard FROM (
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / len(list_distinct(a.sh || b.sh)) AS jaccard
            FROM cand c
            JOIN wbase a ON a.doc = c.doc_a
            JOIN wbase b ON b.doc = c.doc_b
        ) WHERE jaccard >= {MINHASH_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    "dedup_minhash_pairs": f"""
        WITH {_BASE_CTE},
        {_BANDS_CTE},
        cand AS (
            SELECT DISTINCT l.doc AS doc_a, r.doc AS doc_b
            FROM bands l JOIN bands r
              ON l.band_idx = r.band_idx AND l.band_key = r.band_key
             AND l.doc < r.doc
        )
        SELECT doc_a, doc_b, jaccard FROM (
            SELECT c.doc_a, c.doc_b,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / len(list_distinct(a.sh || b.sh)) AS jaccard
            FROM cand c
            JOIN base a ON a.doc = c.doc_a
            JOIN base b ON b.doc = c.doc_b
        ) WHERE jaccard >= {MINHASH_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    "dedup_incremental": f"""
        WITH {_BASE_CTE},
        {_BANDS_CTE},
        cand AS (
            SELECT DISTINCT n.doc AS new_doc, o.doc AS dup_of
            FROM bands n JOIN bands o
              ON n.band_idx = o.band_idx AND n.band_key = o.band_key
            WHERE n.doc % {INC_MOD} = 0 AND o.doc % {INC_MOD} <> 0
        )
        SELECT new_doc, dup_of, jaccard FROM (
            SELECT c.new_doc, c.dup_of,
                   CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / len(list_distinct(a.sh || b.sh)) AS jaccard
            FROM cand c
            JOIN base a ON a.doc = c.new_doc
            JOIN base b ON b.doc = c.dup_of
        ) WHERE jaccard >= {MINHASH_THRESHOLD}
        ORDER BY new_doc, dup_of
    """,
    "dedup_simhash_sigs": f"""
        WITH {_SIMHASH_CTE}
        SELECT doc, simhash FROM sigs ORDER BY doc
    """,
    "dedup_simhash_pairs": f"""
        WITH {_SIMHASH_CTE},
        {_SIMHASH_BANDS}
        SELECT DISTINCT l.doc AS doc_a, r.doc AS doc_b,
               bit_count(xor(l.simhash, r.simhash)) AS hamming
        FROM simbands l JOIN simbands r
          ON l.band_idx = r.band_idx AND l.band_key = r.band_key
         AND l.doc < r.doc
        WHERE bit_count(xor(l.simhash, r.simhash)) <= {HAMMING_MAX}
        ORDER BY doc_a, doc_b
    """,
    "dedup_ngram_jaccard": f"""
        WITH sets AS (
            SELECT doc_id AS doc, {_SH} AS sh
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
            WHERE len(toks) >= 1
        ),
        sizes AS (SELECT doc, len(sh) AS sz FROM sets),
        inv AS (SELECT doc, unnest(sh) AS h FROM sets),
        shared AS (
            SELECT l.doc AS doc_a, r.doc AS doc_b, COUNT(*) AS shared
            FROM inv l JOIN inv r ON l.h = r.h AND l.doc < r.doc
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, jaccard FROM (
            SELECT s.doc_a, s.doc_b,
                   CAST(s.shared AS DOUBLE) / (sa.sz + sb.sz - s.shared) AS jaccard
            FROM shared s
            JOIN sizes sa ON sa.doc = s.doc_a
            JOIN sizes sb ON sb.doc = s.doc_b
        ) WHERE jaccard >= {NGRAM_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
    "dedup_components": f"""
        WITH RECURSIVE {_BASE_CTE},
        {_BANDS_CTE},
        {{component_ctes}}
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS canonical_id
        FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
        ORDER BY d.doc_id
    """,
    "dedup_keep_best": f"""
        WITH RECURSIVE {_BASE_CTE},
        {_BANDS_CTE},
        {{component_ctes}},
        assign AS (
            SELECT d.doc_id, d.n_chars,
                   LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS canonical
            FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
        ),
        ranked AS (
            SELECT canonical, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY canonical
                                      ORDER BY n_chars DESC, doc_id) AS rn
            FROM assign
        )
        SELECT r.canonical AS canonical_id, r.doc_id AS kept_id,
               c.n_members
        FROM ranked r
        JOIN (SELECT canonical AS canonical_id, COUNT(*) AS n_members
              FROM assign GROUP BY 1) c ON c.canonical_id = r.canonical
        WHERE r.rn = 1
        ORDER BY canonical_id
    """,
    "corpus_overlap_matrix": f"""
        WITH sets AS (
            SELECT source AS src, {_SH} AS sh
            FROM (SELECT source, {_TOKS} AS toks FROM documents)
            WHERE len(toks) >= 1
        ),
        inv AS (SELECT DISTINCT src, unnest(sh) AS h FROM sets),
        totals AS (SELECT src, COUNT(*) AS tot FROM inv GROUP BY src),
        shared AS (
            SELECT l.src AS source_a, r.src AS source_b, COUNT(*) AS shared
            FROM inv l JOIN inv r ON l.h = r.h AND l.src < r.src
            GROUP BY 1, 2
        )
        SELECT s.source_a, s.source_b, s.shared,
               round(CAST(s.shared AS DOUBLE)
                     / (ta.tot + tb.tot - s.shared), 6) AS jaccard
        FROM shared s
        JOIN totals ta ON ta.src = s.source_a
        JOIN totals tb ON tb.src = s.source_b
        ORDER BY source_a, source_b
    """,
    "dedup_ngram_jaccard_capped": f"""
        WITH sets AS (
            SELECT doc_id AS doc, {_SH} AS sh
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
            WHERE len(toks) >= 1
        ),
        inv0 AS (SELECT doc, unnest(sh) AS h FROM sets),
        hot AS (SELECT h FROM inv0 GROUP BY h HAVING COUNT(*) > {NGRAM_MAX_DF}),
        inv AS (SELECT doc, h FROM inv0 ANTI JOIN hot USING (h)),
        sizes AS (SELECT doc, COUNT(*) AS sz FROM inv GROUP BY doc),
        shared AS (
            SELECT l.doc AS doc_a, r.doc AS doc_b, COUNT(*) AS shared
            FROM inv l JOIN inv r ON l.h = r.h AND l.doc < r.doc
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, jaccard FROM (
            SELECT s.doc_a, s.doc_b,
                   CAST(s.shared AS DOUBLE) / (sa.sz + sb.sz - s.shared) AS jaccard
            FROM shared s
            JOIN sizes sa ON sa.doc = s.doc_a
            JOIN sizes sb ON sb.doc = s.doc_b
        ) WHERE jaccard >= {NGRAM_THRESHOLD}
        ORDER BY doc_a, doc_b
    """,
}

from hdfs_mapreduce_spark.plans.text_plans import (  # noqa: E402
    SPLIT_MOD as _SPLIT_MOD,
    SPLIT_TRAIN as _SPLIT_TRAIN,
)

ORACLE_SQL["dataset_split_safe"] = f"""
    WITH RECURSIVE {_BASE_CTE},
    {_BANDS_CTE},
    {{component_ctes}},
    assign AS (
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS canonical
        FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
    ),
    b AS (
        SELECT doc_id, canonical,
               CAST('0x' || substr(md5('split:' || canonical), 1, 14) AS BIGINT)
                   % {_SPLIT_MOD} AS bucket
        FROM assign
    )
    SELECT CASE WHEN bucket < {_SPLIT_TRAIN} THEN 'train'
                WHEN bucket = {_SPLIT_TRAIN} THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT canonical) AS n_clusters,
           MIN(doc_id) AS first_doc
    FROM b GROUP BY 1 ORDER BY split
"""

# Star contraction provably yields the same min-label components, so the
# logrounds variant reuses the recursive-CTE oracle verbatim.
ORACLE_SQL["dedup_components_logrounds"] = ORACLE_SQL["dedup_components"]

# Histogram over the same labeling: the size-per-canonical aggregate of
# the components oracle's assign relation.
ORACLE_SQL["dedup_cluster_sizes"] = f"""
    WITH RECURSIVE {_BASE_CTE},
    {_BANDS_CTE},
    {{component_ctes}},
    assign AS (
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(l.mn, d.doc_id)) AS canonical
        FROM documents d LEFT JOIN labels l ON l.node = d.doc_id
    ),
    sizes AS (
        SELECT canonical, COUNT(*) AS cluster_size FROM assign GROUP BY 1
    )
    SELECT cluster_size, COUNT(*) AS n_clusters,
           cluster_size * COUNT(*) AS n_docs
    FROM sizes GROUP BY cluster_size ORDER BY cluster_size
"""

for _k in (
    "dedup_components",
    "dedup_components_logrounds",
    "dedup_keep_best",
    "dataset_split_safe",
    "dedup_cluster_sizes",
):
    ORACLE_SQL[_k] = ORACLE_SQL[_k].replace("{component_ctes}", _COMPONENT_CTES)

# Composed after the dict exists: reuses the two pair oracles verbatim.
ORACLE_SQL["dedup_lsh_recall"] = _lsh_recall_sql()


def _pagerank_sql(
    iters: int = PAGERANK_ITERS, damping: float = PAGERANK_DAMPING
) -> str:
    """Unrolled power iteration over the minhash pair graph — the exact
    three rounds the Spark plan runs, as chained CTEs over the verified
    pair oracle (composition pattern of _lsh_recall_sql). The damping
    expression is written identically on both engines ((1.0 - d)/n,
    d * COALESCE(SUM(...), 0.0)) so only SUM order can differ."""
    pairs = ORACLE_SQL["dedup_minhash_pairs"]
    rounds = []
    for i in range(1, iters + 1):
        rounds.append(
            f"""r{i} AS (
            SELECT nd.node,
                   (1.0 - {damping}) / (SELECT n FROM nn)
                   + {damping} * COALESCE(SUM(r.rank / d.d), 0.0) AS rank
            FROM nodes nd
            LEFT JOIN edges e ON e.dst = nd.node
            LEFT JOIN r{i - 1} r ON r.node = e.src
            LEFT JOIN deg d ON d.src = e.src
            GROUP BY nd.node
        )"""
        )
    chained = ",\n        ".join(rounds)
    return f"""
        WITH pairs AS ({pairs}),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT doc_a AS node FROM pairs
                UNION ALL SELECT doc_b AS node FROM pairs
            )
        ),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM pairs
            UNION ALL SELECT doc_b AS src, doc_a AS dst FROM pairs
        ),
        deg AS (
            SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src
        ),
        r0 AS (
            SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
        ),
        {chained}
        SELECT node, ROUND(rank, 6) + 0.0 AS rank
        FROM r{iters} ORDER BY node
    """


ORACLE_SQL["graph_pagerank"] = _pagerank_sql()


def _split_leakage_sql() -> str:
    """Composes the verified pair oracle with dataset_split's exact hash
    rule (same 'split:' prefix, same buckets)."""
    from hdfs_mapreduce_spark.plans.text_plans import (
        SPLIT_MOD,
        SPLIT_TRAIN,
    )

    def case(b: str) -> str:
        return (
            f"CASE WHEN {b} < {SPLIT_TRAIN} THEN 'train' "
            f"WHEN {b} = {SPLIT_TRAIN} THEN 'val' ELSE 'test' END"
        )

    return f"""
        WITH pairs AS ({ORACLE_SQL["dedup_minhash_pairs"]}),
        lab AS (
            SELECT least(sa, sb) AS split_lo,
                   greatest(sa, sb) AS split_hi
            FROM (
                SELECT {case("ba")} AS sa, {case("bb")} AS sb
                FROM (
                    SELECT {h56_sql("'split:' || doc_a")} % {SPLIT_MOD}
                               AS ba,
                           {h56_sql("'split:' || doc_b")} % {SPLIT_MOD}
                               AS bb
                    FROM pairs
                )
            )
        )
        SELECT split_lo, split_hi, COUNT(*) AS n_pairs,
               split_lo <> split_hi AS leaks
        FROM lab GROUP BY 1, 2 ORDER BY split_lo, split_hi
    """


ORACLE_SQL["dataset_split_leakage"] = _split_leakage_sql()


ORACLE_SQL["dedup_edit_pairs"] = f"""
    WITH k AS (
        SELECT doc_id AS doc, substr(text, 1, {EDIT_KEY_LEN}) AS key,
               list_distinct(list_prepend(
                   substr(text, 1, {EDIT_WINDOW_LEN}),
                   list_transform(
                       generate_series(1, {EDIT_WINDOW_LEN}),
                       i -> substr(text, 1, CAST(i - 1 AS INT))
                            || substr(text, CAST(i + 1 AS INT),
                                      CAST({EDIT_WINDOW_LEN} - i AS INT))
                   ))) AS variants
        FROM documents
    ),
    kv0 AS (SELECT doc, key, unnest(variants) AS variant FROM k),
    hot AS (
        SELECT variant FROM kv0 GROUP BY variant
        HAVING COUNT(*) > {EDIT_VARIANT_MAX_DF}
    ),
    kv AS (SELECT * FROM kv0 ANTI JOIN hot USING (variant)),
    cand AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
               a.key AS key_a, b.key AS key_b
        FROM kv a JOIN kv b
          ON a.variant = b.variant AND a.doc < b.doc
    )
    SELECT doc_a, doc_b,
           CAST(levenshtein(key_a, key_b) AS INT) AS edit_dist
    FROM cand
    WHERE levenshtein(key_a, key_b) <= {EDIT_MAX_DIST}
    ORDER BY doc_a, doc_b
"""


def _winnow_sql() -> str:
    """Exact twin of winnowing_pairs: same shingles, same 32-bit fold,
    same (hash asc, pos desc) BIGINT packing, same window MIN + short-doc
    pos=1 rule, same df cap and min-shared floor. Integer-only."""
    shp = " || ' ' || ".join(f"tk[i+{j}]" for j in range(SHINGLE_K))
    return f"""
        WITH toksw AS (
            SELECT doc_id AS doc,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               t -> t <> '') AS tk
            FROM documents
        ),
        shw AS (
            SELECT doc,
                   CASE WHEN len(tk) >= {SHINGLE_K} THEN
                       list_transform(
                           generate_series(1, len(tk) - {SHINGLE_K - 1}),
                           i -> {shp})
                   WHEN len(tk) > 0 THEN [array_to_string(tk, ' ')]
                   ELSE CAST([] AS VARCHAR[]) END AS shl
            FROM toksw
        ),
        exw AS (
            SELECT doc, unnest(generate_series(1, len(shl))) AS pos,
                   unnest(list_transform(
                       shl, s -> ({h56_sql('s')}) % {WINNOW_FOLD})) AS fh
            FROM shw
        ),
        keyed AS (
            SELECT doc, pos,
                   fh * {WINNOW_POS} + ({WINNOW_POS - 1} - pos) AS key
            FROM exw
        ),
        win AS (
            SELECT doc, pos,
                   min(key) OVER (PARTITION BY doc ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                       AND {WINNOW_W - 1} FOLLOWING) AS mn,
                   count(*) OVER (PARTITION BY doc ORDER BY pos
                       ROWS BETWEEN CURRENT ROW
                       AND {WINNOW_W - 1} FOLLOWING) AS cw
            FROM keyed
        ),
        sel AS (
            SELECT DISTINCT doc, mn FROM win
            WHERE cw = {WINNOW_W} OR (pos = 1 AND cw < {WINNOW_W})
        ),
        fps AS (SELECT DISTINCT doc, mn // {WINNOW_POS} AS fp FROM sel),
        good AS (
            SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {FP_MAX_DF}
        ),
        gfw AS (SELECT f.doc, f.fp FROM fps f JOIN good USING (fp))
        SELECT doc_a, doc_b, n_shared FROM (
            SELECT l.doc AS doc_a, r.doc AS doc_b, COUNT(*) AS n_shared
            FROM gfw l JOIN gfw r ON l.fp = r.fp AND l.doc < r.doc
            GROUP BY 1, 2
        ) WHERE n_shared >= {WINNOW_MIN_SHARED}
        ORDER BY doc_a, doc_b
    """


ORACLE_SQL["text_winnowing"] = _winnow_sql()

# Exact cross-document repeated runs (Lee et al. 2022's suffix-array pass
# as the sorted k-gram chain): shared CTEs — k-grams, gram matches per
# (doc_a, doc_b, diagonal), island merge, maximal runs >= RUN_MIN_TOKENS.
_RUNGRAM = " || ' ' || ".join(f"toks[i+{j}]" for j in range(RUN_GRAM_K))
_RUNS_CTES = f"""
    WITH t AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    sh0 AS (
        SELECT doc_id, i - 1 AS pos, {_RUNGRAM} AS sh
        FROM (SELECT doc_id, toks,
                     unnest(generate_series(1, len(toks) - {RUN_GRAM_K} + 1)) AS i
              FROM t WHERE len(toks) >= {RUN_GRAM_K})
    ),
    hot AS (
        SELECT sh FROM sh0 GROUP BY sh
        HAVING count(DISTINCT doc_id) > {RUN_MAX_DF}
    ),
    sh AS (
        SELECT * FROM sh0 WHERE sh NOT IN (SELECT sh FROM hot)
    ),
    m AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.pos AS pa, a.pos - b.pos AS diag
        FROM sh a JOIN sh b USING (sh) WHERE a.doc_id < b.doc_id
    ),
    flagged AS (
        SELECT doc_a, doc_b, diag, pa,
               CASE WHEN lag(pa) OVER w IS NULL OR pa > lag(pa) OVER w + 1
                    THEN 1 ELSE 0 END AS new_run
        FROM m WINDOW w AS (PARTITION BY doc_a, doc_b, diag ORDER BY pa)
    ),
    islands AS (
        SELECT doc_a, doc_b, diag, pa,
               SUM(new_run) OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS run_id
        FROM flagged
    ),
    runs AS (
        SELECT doc_a, doc_b, diag,
               MIN(pa) AS a0, MAX(pa) + {RUN_GRAM_K} - 1 AS a1,
               MAX(pa) - MIN(pa) + {RUN_GRAM_K} AS n_tokens
        FROM islands GROUP BY doc_a, doc_b, diag, run_id
        HAVING MAX(pa) - MIN(pa) + {RUN_GRAM_K} >= {RUN_MIN_TOKENS}
    )
"""

ORACLE_SQL["dedup_exact_substrings"] = f"""
    {_RUNS_CTES}
    SELECT doc_a, doc_b,
           CAST(a0 AS BIGINT) AS a_start,
           CAST(a1 AS BIGINT) AS a_end,
           CAST(a0 - diag AS BIGINT) AS b_start,
           CAST(a1 - diag AS BIGINT) AS b_end,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM runs ORDER BY doc_a, doc_b, a_start, b_start
"""

ORACLE_SQL["dedup_exact_substring_scrub"] = f"""
    {_RUNS_CTES},
    cover AS (
        SELECT DISTINCT doc_b AS doc_id,
               unnest(generate_series(a0 - diag, a1 - diag)) AS i
        FROM runs
    ),
    scrub AS (
        SELECT doc_id, list_sort(list(i)) AS sp FROM cover GROUP BY doc_id
    ),
    j AS (
        SELECT t.doc_id, toks, COALESCE(sp, CAST([] AS BIGINT[])) AS sp
        FROM t LEFT JOIN scrub USING (doc_id)
    )
    SELECT doc_id,
           CAST(len(sp) AS BIGINT) AS n_removed,
           CAST(len(toks) - len(sp) AS BIGINT) AS n_kept,
           md5(COALESCE(array_to_string(
               list_filter(
                   list_transform(generate_series(1, len(toks)),
                       jj -> CASE WHEN list_contains(sp, jj - 1)
                                  THEN NULL ELSE toks[jj] END),
                   x -> x IS NOT NULL), ' '), '')) AS scrubbed_hash
    FROM j ORDER BY doc_id
"""
