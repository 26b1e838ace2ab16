"""Behavioral dedup tests on planted duplicates (the synthetic documents
table has organic near-dups too, but planted cases pin down semantics)."""

from __future__ import annotations

from hdfs_mapreduce_spark.operators.dedup import (
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away "
    "into the deep dark forest tonight"
)
NEAR = BASE.replace("tonight", "today")  # one token differs
OTHER = "completely different content about spark query engines and shuffles"


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)], "doc_id long, text string"
    )


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs(spark), "doc_id", "text").collect()
    by_keep = {r["keep_id"]: r["n_copies"] for r in out}
    assert by_keep == {1: 2, 3: 1, 4: 1}  # docs 1+2 identical, kept id=1


def test_minhash_finds_planted_near_dup(spark):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_pairs(_docs(spark), "doc_id", "text", 0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.7  # one-token edit
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_simhash_identical_docs_hamming_zero(spark):
    """56-bit signatures: identical docs collide at hamming 0; a 1%-token
    edit stays within the hamming-3 budget (a 1-in-17-token edit does not —
    the 56-bit bar is ~94.6% bit agreement, per the Manku '07 layout)."""
    base = " ".join(f"tok{i}" for i in range(100))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, base.replace("tok99", "changed")), (4, OTHER)],
        "doc_id long, text string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_pairs(docs, "doc_id", "text").collect()
    }
    assert out[(1, 2)] == 0
    assert out[(1, 3)] <= 3  # near-dup within the hamming budget
    assert not any(4 in p for p in out)


def test_minhash_pairs_subset_of_exact(spark):
    """LSH+verify can only *prune* relative to the exact inverted-index
    algorithm at the same threshold — never add."""
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    assert lsh <= exact
    assert len(exact) > 0  # the synthetic table has organic near-dups
    # On this data the 8x2 banding catches every true pair ≥ 0.5.
    assert lsh == exact


def test_ngram_jaccard_max_df_reduced_space_semantics(spark):
    """max_df removes hot (boilerplate) shingles from the whole shingle
    space: pairs similar only through boilerplate drop out, and surviving
    pairs are scored exactly on the reduced space.

    Construction: 20 boilerplate tokens shared by all docs (18 internal
    3-shingles, df = 12 > max_df = 5) + a 4-token unique tail. Docs 1/2
    share 3 of their 4 post-boilerplate shingles; docs 3..12 share nothing
    beyond boilerplate."""
    from hdfs_mapreduce_spark.operators.dedup import ngram_jaccard_pairs

    boiler = " ".join(f"b{i}" for i in range(20))
    rows = [
        (1, f"{boiler} alpha beta gamma delta"),
        (2, f"{boiler} alpha beta gamma epsilon"),
    ] + [(i, f"{boiler} u{i}a u{i}b u{i}c u{i}d") for i in range(3, 13)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", 0.5, max_df=5).collect()
    }
    # Uncapped: every pair clears 0.5 through shared boilerplate alone
    # (18 shared / 26 union ≈ 0.69) → all C(12,2) pairs.
    assert len(full) == 66
    # Capped: boilerplate-only pairs vanish; 1-2 survive on content with the
    # exact reduced-space score 3 shared / (4 + 4 - 3).
    assert set(capped) == {(1, 2)}
    assert abs(capped[(1, 2)] - 3 / 5) < 1e-12


def test_dedup_pair_queries_leave_no_cached_rdds(spark):
    """The pair pipelines rely on ReusedExchange, not persist — nothing may
    stay cached after the action (VERDICT r1 item 3: long-lived sessions
    must not accumulate cache). Asserted as a before/after diff of the
    persistent-RDD map, not emptiness: the session is shared across the
    suite and an earlier test's ContextCleaner-driven cleanup can still be
    in flight, which is that test's storage, not ours."""
    from hdfs_mapreduce_spark.plans.dedup_plans import (
        dedup_minhash_pairs,
        dedup_ngram_jaccard_capped,
    )

    sf = "/root/testdata/sf0.001"
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    dedup_minhash_pairs(spark, sf).collect()
    dedup_ngram_jaccard_capped(spark, sf).collect()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after - before == set()


def test_connected_components_chain_and_singleton(spark):
    """A diameter-2 chain (1-2, 2-3) collapses to one component labeled by
    its min id; isolated pairs and nodes label independently; nothing stays
    cached after the probe loop."""
    from hdfs_mapreduce_spark.operators.components import (
        canonical_assignment,
        connected_components,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 9)], "src long, dst long"
    )
    labels = {
        r["node"]: r["label"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 7, 9, 42)], "id long")
    assign = {
        r["id"]: r["canonical"]
        for r in canonical_assignment(nodes, "id", edges, "src", "dst").collect()
    }
    assert assign == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7, 42: 42}
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_components_local_and_distributed_agree(spark):
    """The driver-side union-find and the distributed min-label loop return
    the same labeling on a pseudo-random graph with chains, cliques and
    singleton pairs."""
    from hdfs_mapreduce_spark.operators.components import connected_components

    # Deterministic edge soup: chains of length 5, a clique, stray pairs.
    edges_py = [(i, i + 1) for i in range(0, 50, 5) for i in (i,)]
    edges_py = [(i + j, i + j + 1) for i in range(0, 50, 10) for j in range(4)]
    edges_py += [(100, 103), (101, 103), (102, 100)]  # clique-ish
    edges_py += [(200, 201), (300, 301)]
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    local = {
        r["node"]: r["label"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    dist = {
        r["node"]: r["label"]
        for r in connected_components(
            edges, "src", "dst", local_limit=0
        ).collect()
    }
    assert local == dist
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_dedup_components_survivors_consistent_with_pairs(spark):
    """Every pair's docs share a canonical id; docs in no pair are their own
    canonical."""
    from hdfs_mapreduce_spark.plans.dedup_plans import (
        MINHASH_THRESHOLD,
        dedup_components,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_pairs(docs, "doc_id", "text", MINHASH_THRESHOLD).collect()
    ]
    canon = {
        r["doc_id"]: r["canonical_id"] for r in dedup_components(spark, sf).collect()
    }
    assert len(pairs) > 0
    paired = {d for p in pairs for d in p}
    for a, b in pairs:
        assert canon[a] == canon[b] <= min(a, b)
    for d, c in canon.items():
        if d not in paired:
            assert c == d


def test_paragraph_spans_delimiter_mode(spark):
    from hdfs_mapreduce_spark.operators.dedup import paragraph_spans

    df = spark.createDataFrame(
        [(1, "para one here\n\nsecond para\n\n\nthird"), (2, ""), (3, "solo")],
        "doc_id long, text string",
    )
    rows = paragraph_spans(df, "doc_id", "text", delim_regex="\n\n+").collect()
    got = {(r["doc"], r["pidx"]): r["p"] for r in rows}
    assert got == {
        (1, 0): "para one here",
        (1, 1): "second para",
        (1, 2): "third",
        (3, 0): "solo",
    }


def test_paragraph_dedup_and_scrub_window_mode(spark):
    import hashlib

    from hdfs_mapreduce_spark.operators.dedup import (
        paragraph_dedup,
        paragraph_scrub,
    )

    # window=2 chunks: doc1 -> ["a b", "c d"], doc2 -> ["c d", "e f"];
    # "c d" is duplicated; doc3 is empty and must vanish.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "c d e f"), (3, "")],
        "doc_id long, text string",
    )
    dup = paragraph_dedup(df, "doc_id", "text", window=2).collect()
    assert len(dup) == 1
    assert dup[0]["n_copies"] == 2 and dup[0]["n_docs"] == 2
    assert dup[0]["first_doc"] == 1

    scrub = {r["doc"]: r for r in paragraph_scrub(df, "doc_id", "text", window=2).collect()}
    assert set(scrub) == {1, 2}
    # doc1 keeps both spans; doc2 loses its copy of "c d"
    assert scrub[1]["n_kept"] == 2
    assert scrub[2]["n_kept"] == 1
    assert scrub[1]["scrubbed_hash"] == hashlib.md5(b"a b c d").hexdigest()
    assert scrub[2]["scrubbed_hash"] == hashlib.md5(b"e f").hexdigest()


def test_chunk_documents_overlap_and_tail_coverage(spark):
    import pytest

    from hdfs_mapreduce_spark.operators.dedup import chunk_documents

    # 10 tokens, size=4, stride=3 -> starts 1,4,7,(ceil(6/3)=2 -> k<=2)…
    # k_max = ceil((10-4)/3) = 2 -> starts 1, 4, 7; last chunk t7..t10.
    df = spark.createDataFrame(
        [(1, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = chunk_documents(df, "doc_id", "text", size=4, stride=3).collect()
    got = {(r["doc"], r["chunk_idx"]): (r["chunk"], r["n_tokens"]) for r in rows}
    assert got == {
        (1, 0): ("t1 t2 t3 t4", 4),
        (1, 1): ("t4 t5 t6 t7", 4),
        (1, 2): ("t7 t8 t9 t10", 4),
        (2, 0): ("a b", 2),  # short doc: one window, shorter than size
    }
    # every token appears in some chunk (tail is covered)
    covered = set()
    for (d, _), (chunk, _) in got.items():
        if d == 1:
            covered.update(chunk.split(" "))
    assert covered == {f"t{i}" for i in range(1, 11)}
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", size=4, stride=5)


def test_split_safe_never_separates_near_dup_pairs(spark):
    """The leakage guard: for every MinHash near-dup pair, both docs must
    land in the same split (they share a canonical, hence a hash gate)."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.functions.hashing import h56
    from hdfs_mapreduce_spark.operators.dedup import minhash_pairs
    from hdfs_mapreduce_spark.plans.dedup_plans import (
        MINHASH_THRESHOLD,
        _canonical_over_minhash,
    )
    from hdfs_mapreduce_spark.plans.text_plans import SPLIT_MOD, SPLIT_TRAIN
    from hdfs_mapreduce_spark.sources.catalog import load_table, spread

    sf = "/root/testdata/sf0.001"
    docs = spread(load_table(spark, sf, "documents"), spark)
    assign = _canonical_over_minhash(spark, sf, "splitsafe_test")
    bucket = h56(F.concat(F.lit("split:"), F.col("canonical"))) % SPLIT_MOD
    split = (
        F.when(bucket < SPLIT_TRAIN, "train")
        .when(bucket == SPLIT_TRAIN, "val")
        .otherwise("test")
    )
    doc_split = {
        r["doc_id"]: r["s"]
        for r in assign.select("doc_id", split.alias("s")).collect()
    }
    pairs = minhash_pairs(docs, "doc_id", "text", MINHASH_THRESHOLD).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for p in pairs:
        assert doc_split[p["doc_a"]] == doc_split[p["doc_b"]], p


def test_duplicate_spans_detects_and_merges(spark):
    """Planted shared prefix: docs A and B share tokens 0..11 (12 tokens);
    with k=4 every window 0..8 is duplicated in both docs and merges into
    one maximal span [0, 11]. Doc C shares nothing. A same-document repeat
    (doc D contains the same 4-token run twice) also counts as duplicated."""
    from hdfs_mapreduce_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, shared + " unique1 tail1 end1 stop1"),
            (2, shared + " other2 words2 here2 fin2"),
            (3, "nothing in common with anything else at all today"),
            (4, "x0 rep0 rep1 rep2 rep3 y0 y1 y2 rep0 rep1 rep2 rep3 z0"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc"], r["span_start"]): (r["span_end"], r["n_tokens"])
        for r in duplicate_spans(docs, "doc_id", "text", k=4).collect()
    }
    # A/B: one merged maximal span covering the 12 shared tokens.
    assert out[(1, 0)] == (11, 12)
    assert out[(2, 0)] == (11, 12)
    # C: clean.
    assert not any(doc == 3 for doc, _ in out)
    # D: both copies of the repeated 4-token run flagged, not merged
    # (positions 1 and 8, gap > k).
    assert out[(4, 1)] == (4, 4)
    assert out[(4, 8)] == (11, 4)
    assert len(out) == 4


def test_duplicate_spans_gap_split(spark):
    """Two duplicated runs in one doc separated by a fresh token stay two
    spans; contiguous ones merge."""
    from hdfs_mapreduce_spark.operators.dedup import duplicate_spans

    run_a = "a0 a1 a2 a3"
    run_b = "b0 b1 b2 b3"
    docs = spark.createDataFrame(
        [
            (1, f"{run_a} gapX {run_b}"),
            (2, f"{run_a} gapY {run_b}"),
            (3, f"{run_a} {run_b} trailing filler words here"),
            (4, f"{run_a} {run_b} and some more padding too"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc"], r["span_start"]): (r["span_end"], r["n_tokens"])
        for r in duplicate_spans(docs, "doc_id", "text", k=4).collect()
    }
    # Docs 1/2: runs split by the unique gap token → two spans each.
    assert out[(1, 0)] == (3, 4)
    assert out[(1, 5)] == (8, 4)
    # Docs 3/4: contiguous 8-token shared prefix → one merged span.
    assert out[(3, 0)] == (7, 8)
    assert out[(4, 0)] == (7, 8)


def test_span_scrub_keeps_first_occurrence(spark):
    """Docs 1 and 2 share an 8-token run; doc 1 (first by (doc, pos)) keeps
    it, doc 2 loses exactly those tokens. Doc 3 (unique) is untouched; a doc
    that is ALL duplicate text scrubs to the empty string."""
    from hdfs_mapreduce_spark.operators.dedup import span_scrub

    run = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, run + " unique1 tail1"),
            (2, "head2 " + run + " tail2"),
            (3, "totally unrelated words live here today ok fine"),
            (4, run),  # entire doc duplicated → fully scrubbed
        ],
        "doc_id long, text string",
    )
    rows = {r["doc"]: r for r in span_scrub(docs, "doc_id", "text", k=4).collect()}
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    # doc 1: canonical copy, nothing removed.
    assert rows[1]["n_removed"] == 0
    assert rows[1]["scrubbed_hash"] == md5(run + " unique1 tail1")
    # doc 2: the 8 replicated tokens removed, frame kept.
    assert rows[2]["n_removed"] == 8
    assert rows[2]["scrubbed_hash"] == md5("head2 tail2")
    # doc 3: untouched.
    assert rows[3]["n_removed"] == 0
    # doc 4: everything scrubbed → md5('').
    assert rows[4]["n_kept"] == 0
    assert rows[4]["scrubbed_hash"] == md5("")


def test_logrounds_components_match_union_find(spark):
    """Large-star/small-star must produce the identical min-id labeling
    as union-find on every graph shape — including the long chains that
    are min-label propagation's worst case (O(diameter) rounds vs
    O(log n) here)."""
    import random

    from hdfs_mapreduce_spark.operators.components import (
        connected_components_logrounds,
    )

    def union_find_labels(edge_list):
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in edge_list:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {n for e in edge_list for n in e}
        return {n: find(n) for n in nodes}

    rng = random.Random(3)
    cases = {
        "long_path": [(i, i + 1) for i in range(500)],
        "two_cliques": [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(100, 104) for b in range(a + 1, 104)],
        "random_sparse": [
            (rng.randrange(300), rng.randrange(300)) for _ in range(200)
        ],
        "star": [(0, i) for i in range(1, 50)],
        "reversed_path": [(i + 1, i) for i in range(200)],
    }
    for name, edge_list in cases.items():
        edge_list = [(a, b) for a, b in edge_list if a != b]
        df = spark.createDataFrame(edge_list, "src long, dst long")
        got = {
            r["node"]: r["label"]
            for r in connected_components_logrounds(df).collect()
        }
        # full contract: every node of the edge set gets a row, roots
        # self-labeled — identical to connected_components' output
        want = union_find_labels(edge_list)
        assert got == want, f"{name}: mismatch"

    # non-numeric node ids: the fixpoint probe must not assume numeric
    # arithmetic (string ids are the common case for URL/hash doc keys)
    sids = [(f"doc-{a}", f"doc-{b}") for a, b in cases["two_cliques"]]
    df = spark.createDataFrame(sids, "src string, dst string")
    got = {
        r["node"]: r["label"]
        for r in connected_components_logrounds(df).collect()
    }
    want = union_find_labels(sids)
    assert got == want


def test_pagerank_matches_hand_computation_and_conserves_mass(spark):
    """3-round power iteration on a 4-node path graph (symmetrized):
    ranks must match the closed-form rounds computed by hand in numpy,
    sum to 1 every round (no dangling mass on a symmetric graph), and
    order hubs above leaves."""
    import numpy as np

    from hdfs_mapreduce_spark.operators.components import pagerank

    # path 0-1-2-3, symmetrized
    und = [(0, 1), (1, 2), (2, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=3).collect()}

    # hand computation
    n, d = 4, 0.85
    adj = np.zeros((n, n))
    for a, b in und:
        adj[a, b] = adj[b, a] = 1.0
    out_deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(3):
        r = (1 - d) / n + d * (adj.T @ (r / out_deg))
    for v in range(n):
        assert abs(got[v] - r[v]) < 1e-12, (v, got[v], r[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # middle nodes are hubs
    assert got[1] > got[0] and got[2] > got[3]
    # symmetry of the path: 0~3 and 1~2
    assert abs(got[0] - got[3]) < 1e-12 and abs(got[1] - got[2]) < 1e-12


def test_pagerank_empty_graph(spark):
    from hdfs_mapreduce_spark.operators.components import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges, iters=2).count() == 0


def test_edit_distance_pairs_semantics(spark):
    """Deletion-neighborhood blocking: keys whose 16-char windows are
    within one edit are candidates (substitution, insertion/shift, and
    suffix-only edits all covered); two edits INSIDE the window escape
    the block by design (the recall knob), and the full-key Levenshtein
    filter decides membership."""
    from hdfs_mapreduce_spark.operators.dedup import edit_distance_pairs

    rows = [
        (0, "alpha beta gamma"),
        (1, "alpha beta gamma!"),  # append beyond window -> dist 1
        (2, "alpha beta gXmma"),  # 1 substitution in window -> dist 1
        (3, "Xlpha beta gamma"),  # 1 substitution at window start -> dist 1
        (4, "XYpha beta gamma"),  # 2 edits inside the window: escapes block
        (5, "totally different text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_dist"]
        for r in edit_distance_pairs(df, "doc_id", "text", max_dist=2).collect()
    }
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 1
    assert got[(0, 3)] == 1
    assert got[(1, 2)] == 2
    assert got[(1, 3)] == 2
    # docs 2 and 3 differ at TWO window positions (1 and 12): their
    # windows are 2 edits apart, so the pair escapes the block even
    # though the full-key distance is 2 — the documented recall trade
    assert (2, 3) not in got
    # doc 4 is 2 window-edits from doc 0 (escapes the block) but only
    # 1 from doc 3 (caught): the block is per-pair, not per-doc
    assert (0, 4) not in got
    assert got[(3, 4)] == 1
    assert not any(5 in p for p in got)
    # insertion that SHIFTS the window is still caught
    df2 = spark.createDataFrame(
        [(10, "abcdefghijklmnop qrst"), (11, "Xabcdefghijklmnop qrst")],
        "doc_id long, text string",
    )
    got2 = edit_distance_pairs(df2, "doc_id", "text", max_dist=2).collect()
    assert [(r["doc_a"], r["doc_b"], r["edit_dist"]) for r in got2] == [
        (10, 11, 1)
    ]


def test_edit_distance_pairs_hot_variant_cap(spark):
    """max_variant_df excludes variants shared by more than C docs from
    blocking: a boilerplate prefix group larger than the cap produces NO
    pairs (its O(df²) candidates never materialize), while pairs below
    the cap — and pairs also reachable through a non-hot variant — are
    kept. max_variant_df=None keeps the uncapped semantics."""
    from hdfs_mapreduce_spark.operators.dedup import edit_distance_pairs

    # 5 docs share the identical window "alpha beta gamma" (df=5 on the
    # window variant and every deletion of it); 2 docs share a distinct
    # rare prefix.
    rows = [(i, f"alpha beta gamma tail{i}") for i in range(5)]
    rows += [(10, "zulu yankee xray"), (11, "zulu yankee xray!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = edit_distance_pairs(df, "doc_id", "text", max_dist=2)
    assert uncapped.filter("doc_a < 10").count() == 10  # C(5,2) hot pairs
    capped = edit_distance_pairs(
        df, "doc_id", "text", max_dist=2, max_variant_df=4
    ).collect()
    # every variant of the hot group has df=5 > 4 ⇒ the whole group is
    # boilerplate-excluded; the rare pair (df=2) survives
    assert [(r["doc_a"], r["doc_b"]) for r in capped] == [(10, 11)]


def test_winnowing_guarantee_shared_run_yields_shared_fp(spark):
    """Winnowing's detection floor: two documents sharing a token run of
    length W + K - 1 (= 6) must share at least one fingerprint, however
    the rest of the text differs."""
    from hdfs_mapreduce_spark.operators.dedup import winnowing_fingerprints

    shared = "one two three four five six"
    rows = [
        (1, f"left padding words {shared} and an ending tail"),
        (2, f"{shared} totally different continuation here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = winnowing_fingerprints(df, "doc_id", "text").collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]


def test_winnowing_pairs_planted_dup_and_hot_fp_cap(spark):
    """The planted near-dup pair surfaces; a fingerprint present in more
    than max_df docs (boilerplate) is dropped, so boilerplate-only
    overlap yields NO pair."""
    from hdfs_mapreduce_spark.operators.dedup import winnowing_pairs

    boiler = "subscribe to our newsletter for updates today please"
    rows = [(1, "the quick brown fox jumps over the lazy dog " + boiler),
            (2, "the quick brown fox jumps over the lazy cat " + boiler)]
    # 12 docs sharing ONLY the boilerplate text
    rows += [(100 + i, f"unique words {i} only here {i} " + boiler)
             for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(max_df):
        return {
            (r["doc_a"], r["doc_b"])
            for r in winnowing_pairs(
                df, "doc_id", "text", min_shared=1, max_df=max_df
            ).collect()
        }

    capped, uncapped = pairs(10), pairs(100)
    assert (1, 2) in capped
    # The interior boilerplate fingerprints are selected in all 14 docs
    # (windows fully inside the shared run pick the same minimum), so the
    # df<=10 cap drops them: boilerplate-driven pairs shrink strictly.
    # Boundary windows CAN still select a boilerplate shingle in a df<=10
    # subset of docs — that residue is correct winnowing behavior.
    boiler_only = lambda ps: {p for p in ps if p[0] >= 100 and p[1] >= 100}
    assert boiler_only(capped) < boiler_only(uncapped)


def test_winnowing_short_doc_still_fingerprints(spark):
    """A doc with fewer than W shingles (short doc) still yields exactly
    its global-minimum fingerprint."""
    from hdfs_mapreduce_spark.operators.dedup import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, "just four tokens here"), (2, "hi")],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, "doc_id", "text").collect()
    docs = {}
    for r in fps:
        docs.setdefault(r["doc"], []).append(r["fp"])
    # doc 1: 2 shingles -> one short window at pos=1 -> 1 fp
    assert len(docs[1]) == 1
    # doc 2: single token -> whole-text shingle -> 1 fp
    assert len(docs[2]) == 1


def test_minhash_wider_bands_cut_candidates_keep_high_j_pairs(spark):
    """The b/r tuning lever (r8 sf10 probe: at the default r=2 the
    CHANCE band-collision rate is constant per pair, so false candidates
    grow ~N^2): wider bands must produce a SUBSET of the default verified
    pairs with identical Jaccard values, and every high-similarity pair
    must survive — recall loss concentrates at the threshold, exactly
    the (1/b)^(1/r) curve."""
    from hdfs_mapreduce_spark.operators.dedup import minhash_pairs
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_pairs(docs, "doc_id", "text", 0.5).collect()
    }
    wide = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_pairs(
            docs, "doc_id", "text", 0.5, n_perm=32, n_bands=8
        ).collect()
    }
    assert set(wide) <= set(base)
    assert all(wide[p] == base[p] for p in wide)
    hi = {p for p, j in base.items() if j >= 0.8}
    assert hi <= set(wide), "a high-J pair vanished under wider bands"
    import pytest

    with pytest.raises(ValueError, match="not divisible"):
        minhash_pairs(docs, "doc_id", "text", 0.5, n_perm=16, n_bands=5)


def test_logrounds_leaves_no_persistent_rdds(spark):
    """The execution contract the min-label variant always had, now
    pinned for star contraction too: the probe loop's checkpoints are
    all freed and the returned relation is a PURE unrolled plan — the
    old returned-live-checkpoint form leaked one persistent RDD into
    every later workload in the session (caught only when tests ran
    after the query sweep; file ordering had masked it)."""
    from hdfs_mapreduce_spark.operators.components import (
        connected_components,
        connected_components_logrounds,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (7, 9), (10, 11), (11, 12), (12, 13)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["label"]
        for r in connected_components_logrounds(edges, "src", "dst").collect()
    }
    want = {
        r["node"]: r["label"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == want
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0


def test_incremental_minhash_wide_config_matches_full_relation(spark):
    """The wide-band (r=4) lever flows through the incremental-ingest
    path: a batch probed against the corpus under the wide config must
    return exactly the (new, old) restriction of the full wide pair
    relation — same permutations, same first-band-wins dedup, same
    exact-Jaccard verify."""
    from pyspark.sql import functions as F

    from hdfs_mapreduce_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_pairs,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    got = {
        (r["new_doc"], r["dup_of"], round(r["jaccard"], 9))
        for r in incremental_minhash_pairs(
            corpus, batch, "doc_id", "text", 0.5, n_perm=32, n_bands=8
        ).collect()
    }
    full = minhash_pairs(docs, "doc_id", "text", 0.5, n_perm=32, n_bands=8)
    want = {
        (n, o, round(j, 9))
        for a, b, j in (
            (r["doc_a"], r["doc_b"], r["jaccard"]) for r in full.collect()
        )
        for n, o in (((a, b) if a % 5 == 0 else (b, a)),)
        if (n % 5 == 0) != (o % 5 == 0)
    }
    assert got == want and got


def test_auto_band_config_switchover_and_shape_adoption(spark, monkeypatch):
    """Auto b/r selection (round-9 verdict item 5): (a) the count probe
    picks the default 16×8 point at fixture scale and the wide 32×8
    point past the doc bound (pinned by shrinking the bound, not by
    conjuring a million docs); (b) minhash_pairs under auto equals the
    explicit-default call at fixture scale — the declared queries are
    unchanged; (c) a probe with no explicit shape ADOPTS a stored
    sketch's configuration across the switchover, and an explicit
    mismatched probe still raises."""
    import pytest
    from pyspark.sql import functions as F

    import hdfs_mapreduce_spark.operators.dedup as dd
    from hdfs_mapreduce_spark.operators.dedup import (
        _banded_sketch,
        auto_band_config,
        incremental_pairs_against_sketch,
    )
    from hdfs_mapreduce_spark.sources.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(60)
    n = docs.count()
    assert auto_band_config(docs) == (dd.N_PERM, dd.N_BANDS)
    assert auto_band_config(docs, wide_min_docs=n - 1) == (
        dd.WIDE_PERM,
        dd.WIDE_BANDS,
    )
    assert auto_band_config(docs, wide_min_docs=n) == (dd.N_PERM, dd.N_BANDS)

    want = [
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_pairs(
            docs, "doc_id", "text", 0.5, n_perm=dd.N_PERM, n_bands=dd.N_BANDS
        ).collect()
    ]
    got = [
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in minhash_pairs(docs, "doc_id", "text", 0.5).collect()
    ]
    assert got == want

    # (c) past the bound the auto sketch is wide; an omitted-shape probe
    # adopts it, an explicit default-shape probe raises
    monkeypatch.setattr(dd, "AUTO_WIDE_MIN_DOCS", n - 1)
    assert auto_band_config(docs) == (dd.WIDE_PERM, dd.WIDE_BANDS)
    corpus, batch = docs.filter(F.col("doc_id") % 2 == 0), docs.filter(
        F.col("doc_id") % 2 == 1
    )
    sketch = _banded_sketch(
        corpus, "doc_id", "text", dd.WIDE_PERM, dd.WIDE_BANDS
    )
    adopted = incremental_pairs_against_sketch(
        sketch, batch, "doc_id", "text", 0.5
    )
    explicit = incremental_pairs_against_sketch(
        sketch, batch, "doc_id", "text", 0.5,
        n_perm=dd.WIDE_PERM, n_bands=dd.WIDE_BANDS,
    )
    key = lambda df: [  # noqa: E731
        (r["new_doc"], r["dup_of"]) for r in df.collect()
    ]
    assert key(adopted) == key(explicit)
    with pytest.raises(ValueError, match="shape mismatch"):
        incremental_pairs_against_sketch(
            sketch, batch, "doc_id", "text", 0.5,
            n_perm=dd.N_PERM, n_bands=dd.N_BANDS,
        )
    with pytest.raises(ValueError, match="BOTH"):
        minhash_pairs(docs, "doc_id", "text", 0.5, n_perm=dd.N_PERM)


def test_resolve_sketch_shape_empty_legacy_and_trusted_probe(spark):
    """resolve_sketch_shape contract (round-10 advice trio): an EMPTY
    sketch yields None (omitted) or the explicit shape; a legacy v1
    sketch (no rpb column) raises a targeted rebuild error instead of a
    downstream missing-column AnalysisException; validate_shape=False
    skips the stored-shape sample entirely (proven by a mismatched probe
    that does NOT raise) and demands explicit values."""
    import pytest

    import hdfs_mapreduce_spark.operators.dedup as dd
    from hdfs_mapreduce_spark.operators.dedup import (
        _banded_sketch,
        incremental_pairs_against_sketch,
        resolve_sketch_shape,
    )

    docs = _docs(spark)
    batch = docs.filter("doc_id = 3")
    sketch = _banded_sketch(docs, "doc_id", "text", dd.N_PERM, dd.N_BANDS)
    empty = sketch.filter("doc < 0")
    assert resolve_sketch_shape(empty) is None
    assert resolve_sketch_shape(empty, dd.WIDE_PERM, dd.WIDE_BANDS) == (
        dd.WIDE_PERM,
        dd.WIDE_BANDS,
    )
    with pytest.raises(ValueError, match="EMPTY"):
        incremental_pairs_against_sketch(empty, batch, "doc_id", "text", 0.5)
    legacy = sketch.drop("rpb")  # the pre-round-10 on-disk layout
    with pytest.raises(ValueError, match="legacy"):
        resolve_sketch_shape(legacy)
    with pytest.raises(ValueError, match="legacy"):
        incremental_pairs_against_sketch(legacy, batch, "doc_id", "text", 0.5)
    # trusted probe: no sample job, so a (deliberately) mismatched shape
    # builds a plan instead of raising — and explicit values are required
    mis = incremental_pairs_against_sketch(
        sketch, batch, "doc_id", "text", 0.5,
        n_perm=dd.WIDE_PERM, n_bands=dd.WIDE_BANDS, validate_shape=False,
    )
    assert mis.count() == 0  # mismatched band keys join nothing
    with pytest.raises(ValueError, match="explicit"):
        incremental_pairs_against_sketch(
            sketch, batch, "doc_id", "text", 0.5, validate_shape=False
        )


def test_auto_band_config_memoizes_per_plan(spark, monkeypatch):
    """The count probe behind defaulted minhash operators runs ONCE per
    (session, input plan): a second defaulted call over the same
    relation must not launch another limit-probe job (round-10 verdict
    'What's wrong' #3)."""
    import hdfs_mapreduce_spark.operators.dedup as dd

    dd._AUTO_BAND_MEMO.clear()
    docs = _docs(spark)
    probes = {"n": 0}
    orig = type(docs).count

    def counting_count(self):
        probes["n"] += 1
        return orig(self)

    monkeypatch.setattr(type(docs), "count", counting_count)
    assert dd.auto_band_config(docs) == (dd.N_PERM, dd.N_BANDS)
    assert dd.auto_band_config(docs) == (dd.N_PERM, dd.N_BANDS)
    assert probes["n"] == 1, "second defaulted call re-ran the count probe"
    # a different bound is a different decision — fresh probe
    assert dd.auto_band_config(docs, wide_min_docs=2) == (
        dd.WIDE_PERM,
        dd.WIDE_BANDS,
    )
    assert probes["n"] == 2
    dd._AUTO_BAND_MEMO.clear()


def test_auto_band_config_reprobes_rewritten_path(spark, tmp_path):
    """semanticHash is NOT listing-sensitive for file sources (r11
    ADVICE: HadoopFsRelation equality compares only rootPaths), so the
    memo key folds in an inputFiles() digest: re-reading a GROWN dataset
    at the same path must re-probe and may flip the band decision."""
    import hdfs_mapreduce_spark.operators.dedup as dd

    dd._AUTO_BAND_MEMO.clear()
    path = str(tmp_path / "corpus")
    small = spark.range(3).selectExpr("id AS doc_id", "'x' AS text")
    small.write.mode("overwrite").parquet(path)
    first = spark.read.parquet(path)
    assert dd.auto_band_config(first, wide_min_docs=5) == (
        dd.N_PERM, dd.N_BANDS,
    )
    big = spark.range(10).selectExpr("id AS doc_id", "'x' AS text")
    big.write.mode("overwrite").parquet(path)
    regrown = spark.read.parquet(path)
    assert dd.auto_band_config(regrown, wide_min_docs=5) == (
        dd.WIDE_PERM, dd.WIDE_BANDS,
    ), "stale memo served the pre-rewrite band decision"
    dd._AUTO_BAND_MEMO.clear()


def test_exact_substring_runs_pair_exact_maximal(spark):
    """The sorted k-gram chain reconstructs MAXIMAL cross-document runs
    per (pair, diagonal): docs 1/2 share a 10-token run at different
    offsets (bounds exact on both sides), a 5-token share below
    min_tokens=6 is dropped, and — the pair-exactness property
    duplicate_spans lacks — doc 3 sharing ADJACENT-but-different runs
    with docs 1 and 2 yields two separate pair rows, never a chained
    span no single pair shares."""
    from hdfs_mapreduce_spark.operators.dedup import exact_substring_runs

    run = " ".join(f"r{i}" for i in range(10))     # 10 shared tokens
    left = " ".join(f"l{i}" for i in range(6))     # doc1/doc3 share
    right = " ".join(f"g{i}" for i in range(6))    # doc2/doc3 share
    short = "s0 s1 s2 s3 s4"                       # 5 < min_tokens
    docs = spark.createDataFrame(
        [
            (1, f"{left} {run} {short}"),
            (2, f"pad2a pad2b {run} xx {short} yy {right}"),
            (3, f"{left} {right} solo3 alone3"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_a"], r["doc_b"], r["a_start"]): r
        for r in exact_substring_runs(
            docs, "doc_id", "text", k=4, min_tokens=6
        ).collect()
    }
    # 1-2: the 10-token run, exact bounds both sides; the 5-token share
    # is below min_tokens and absent.
    r12 = rows[(1, 2, 6)]
    assert (r12["a_end"], r12["b_start"], r12["b_end"], r12["n_tokens"]) == (
        15, 2, 11, 10,
    )
    # 1-3: the left run only (per-pair row, not chained through doc 3).
    r13 = rows[(1, 3, 0)]
    assert (r13["a_end"], r13["b_start"], r13["b_end"], r13["n_tokens"]) == (
        5, 0, 5, 6,
    )
    # 2-3: the right run only (doc 2 tokens 19..24, doc 3 tokens 6..11).
    r23 = rows[(2, 3, 19)]
    assert (r23["a_end"], r23["b_start"], r23["b_end"], r23["n_tokens"]) == (
        24, 6, 11, 6,
    )
    assert len(rows) == 3


def test_exact_substring_runs_two_diagonals(spark):
    """A run doc_b repeats at TWO positions produces two rows (one per
    diagonal), each maximal — the relation an excision pass needs to
    cover every copy."""
    from hdfs_mapreduce_spark.operators.dedup import exact_substring_runs

    run = " ".join(f"d{i}" for i in range(6))
    docs = spark.createDataFrame(
        [
            (1, f"{run} tailA tailB"),
            (2, f"{run} midgap {run}"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r["b_start"], r["b_end"], r["n_tokens"])
        for r in exact_substring_runs(
            docs, "doc_id", "text", k=4, min_tokens=6
        ).collect()
    )
    assert got == [(0, 5, 6), (7, 12, 6)]


def test_exact_substring_scrub_keep_first(spark):
    """Keep-first excision: the LOWER doc id keeps every run; the higher
    id's covered positions union (overlapping runs from different
    partners count once) and scrub out; untouched docs still report."""
    import hashlib

    from hdfs_mapreduce_spark.operators.dedup import exact_substring_scrub

    run = " ".join(f"e{i}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, f"{run} one1 two1"),
            (2, f"head2 {run} tail2"),
            (3, f"{run} fresh3 here3"),   # scrubbed vs BOTH 1 and 2
            (4, "no shared content at all in this document today"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc"]: r
        for r in exact_substring_scrub(
            docs, "doc_id", "text", k=4, min_tokens=6
        ).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert rows[1]["n_removed"] == 0
    assert rows[1]["scrubbed_hash"] == md5(run + " one1 two1")
    assert rows[2]["n_removed"] == 8
    assert rows[2]["scrubbed_hash"] == md5("head2 tail2")
    # doc 3's run is covered by pairs (1,3) AND (2,3) — union, not sum.
    assert rows[3]["n_removed"] == 8
    assert rows[3]["scrubbed_hash"] == md5("fresh3 here3")
    assert rows[4]["n_removed"] == 0 and rows[4]["n_kept"] == 9
    assert len(rows) == 4


def test_exact_substring_runs_boilerplate_cap(spark):
    """A gram present in more distinct docs than max_df is corpus
    boilerplate: it drops BEFORE the self-join (the df^2 skew bomb), so a
    run flowing through it splits at the hot gram, while runs shared by
    few docs are untouched (each of their grams has df <= the pair
    count). max_df=None disables the cap."""
    from hdfs_mapreduce_spark.operators.dedup import exact_substring_runs

    boiler = "b0 b1 b2 b3"  # in ALL FIVE docs -> its grams have df=5
    rare = "r0 r1 r2 r3"    # only docs 1/2 -> df=2, below the cap
    docs = spark.createDataFrame(
        [
            (1, f"{rare} {boiler} one1"),
            (2, f"{rare} {boiler} two2"),
            (3, f"{boiler} three3a three3b three3c"),
            (4, f"{boiler} four4a four4b four4c"),
            (5, f"{boiler} five5a five5b five5c"),
        ],
        "doc_id long, text string",
    )
    capped = exact_substring_runs(
        docs, "doc_id", "text", k=4, min_tokens=4, max_df=4
    ).collect()
    # Only the rare run survives (1,2); every boilerplate-only pair is
    # gone and the 1-2 run STOPS at the hot gram: of docs 1/2's grams,
    # only position 4 ("b0 b1 b2 b3") exists in all five docs (df 5 >
    # 4); positions 0..3 still straddle rare tokens (df 2) and are kept,
    # so the merged run covers tokens 0..6 (7 tokens), not the full
    # 8-token prefix the uncapped chain would report.
    assert {(r["doc_a"], r["doc_b"]) for r in capped} == {(1, 2)}
    r = capped[0]
    assert (r["a_start"], r["a_end"], r["n_tokens"]) == (0, 6, 7)
    uncapped = exact_substring_runs(
        docs, "doc_id", "text", k=4, min_tokens=4, max_df=None
    ).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in uncapped} == {
        (a, b) for a in range(1, 6) for b in range(a + 1, 6)
    }
