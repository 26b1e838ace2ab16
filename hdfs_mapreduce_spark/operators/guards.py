"""Input-size guards for the deliberately-exact (quadratic) operators.

Three declared queries are O(N²) BY CONSTRUCTION — they exist as the
recall/accuracy baselines their sublinear production twins are audited
against (SCALE.md "exact contrasts"):

* ``cosine_pairs``            → banded-LSH / PQ-bucket / SemDeDup twins
* ``ngram_jaccard_pairs`` (uncapped) → the ``max_df``-capped twin
* ``ann_topk_bruteforce``     → ``ann_topk_lsh`` / ``ann_topk_ivf``

Correct on a bounded slice, a scale-killer on a corpus: before round 6,
calling one of them over 100 TB launched a silent quadratic job. Each
now runs a COUNT PROBE at plan-build time and raises ``ExactScaleError``
above a documented bound, naming the sublinear twin to use instead. The
probe is one metadata-cheap count per build (parquet row-group counts —
no column data moves); pass ``max_rows=None`` to accept the quadratic
cost explicitly on a slice you know is bounded.

Bounds are set where the quadratic arithmetic is still minutes-not-days
on one executor wave, comfortably above every test fixture (sf0.1 and
the 3× scale smoke) so declared-query results are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# All-pairs vector comparison: N² / 2 dot products of 64 doubles. 100k
# rows ≈ 5e9 pairs ≈ 3e11 FLOPs — an hour-class single-wave BLAS job,
# the sane ceiling for a *baseline* relation.
EXACT_PAIRS_MAX_ROWS = 100_000

# Uncapped shingle inverted-index self-join: boilerplate shingles blow
# up quadratically in their document frequency, so the uncapped form
# degrades far sooner than the dgemm — cap it tighter.
NGRAM_UNCAPPED_MAX_ROWS = 50_000

# Brute-force ANN is linear in the corpus but multiplies by the query
# count: bound the product (500M query·corpus dot products ≈ the same
# FLOP ceiling as the pair bound above).
ANN_BRUTE_MAX_PAIRS = 500_000_000

# Corpus-derived vocabulary relations (BPE word dictionary, unigram-LM
# vocab, TF-IDF df table) are Heaps-law-unbounded: curated corpora keep
# them in the millions, but a raw web crawl's whitespace-token types
# (URLs, typos, hex blobs) grow into the billions, where a forced
# ``F.broadcast`` hint is an executor OOM rather than a slow path. 2M
# rows ≈ low-hundreds of MB for a word→subwords row — comfortably
# inside an executor's broadcast budget; above it the plain join runs
# and AQE picks the physical strategy at runtime.
VOCAB_BROADCAST_MAX_ROWS = 2_000_000


class ExactScaleError(ValueError):
    """An exact-contrast operator was asked to run over an input too
    large for its by-construction quadratic plan."""


def gated_broadcast(
    df: DataFrame,
    probe: DataFrame | None = None,
    max_rows: int | None = VOCAB_BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Probe-then-decide broadcast for corpus-derived relations: count
    ``probe`` (default ``df`` itself — pass a cheaper same-cardinality
    plan when one exists, e.g. the pre-merge word table whose row count
    a per-row fold chain preserves) and attach the ``F.broadcast`` hint
    only when the relation is under ``max_rows``; otherwise return the
    plain relation and let AQE choose the join strategy at runtime.

    This is the ``hot_keys`` probe discipline applied to the broadcast
    decision: one count job at plan-build time buys freedom from the
    Heaps-law OOM an unconditional hint commits to. ``max_rows=None``
    forces the broadcast unconditionally (the pre-round-9 behavior) for
    callers that know their vocabulary is bounded.

    The probe counts ``limit(max_rows + 1)`` rather than the full
    relation — only the threshold comparison is needed, and the limit
    lets the probe job stop as soon as the bound is exceeded instead of
    finishing a corpus-scale aggregate it is about to discard. The
    probe's input scan is still one extra pass over the probed lineage
    (the join re-derives the relation lazily); production callers
    amortize it to a metadata read by probing a materialized vocabulary
    table (the materialize-then-probe pattern).
    """
    from pyspark.sql import functions as F

    if max_rows is None:
        return F.broadcast(df)
    n = (probe if probe is not None else df).limit(max_rows + 1).count()
    if n <= max_rows:
        return F.broadcast(df)
    return df


def guard_exact_input(
    df: DataFrame, max_rows: int | None, operator: str, twin: str
) -> int:
    """Count-probe ``df`` and raise ``ExactScaleError`` when it exceeds
    ``max_rows`` (None disables the guard and returns -1). Returns the
    probed count so callers can reuse it."""
    if max_rows is None:
        return -1
    n = df.count()
    if n > max_rows:
        raise ExactScaleError(
            f"{operator}: input has {n:,} rows, above the {max_rows:,}-row "
            f"bound for its by-construction exact/quadratic plan. At this "
            f"scale use the sublinear twin: {twin}. To accept the quadratic "
            f"cost on a slice you know is bounded, pass max_rows=None (or "
            f"a higher bound)."
        )
    return n
