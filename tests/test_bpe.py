"""BPE merge loop (r2 verdict item 8): the distributed loop must
reproduce a sequential reference implementation's merge sequence
exactly, and every round's pair-count plan must stay partial-agg +
TakeOrdered."""

from __future__ import annotations

from pyspark.sql import functions as F

from hdfs_mapreduce_spark.operators.bpe import (
    _pair_counts,
    bpe_learn,
    word_frequencies,
)


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Sequential Sennrich-style BPE with the same determinism rules:
    argmax by (count desc, pair lexicographic), left-priority
    non-overlapping replacement."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = (
                    counts.get((sym[i], sym[i + 1]), 0) + n
                )
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], p))
        merges.append(pair)
        a, b = pair
        new_vocab = {}
        for sym, n in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab
    return merges, vocab


SENNRICH_CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_learn_matches_reference_merge_sequence(spark):
    rows = [(" ".join([w] * n),) for w, n in SENNRICH_CORPUS.items()]
    df = spark.createDataFrame(rows, "text string")
    got_merges, words = bpe_learn(df, "text", n_merges=8)
    want_merges, want_vocab = _reference_bpe(SENNRICH_CORPUS, 8)
    assert got_merges == want_merges
    got_vocab = {
        tuple(r["sym"]): r["n"] for r in words.select("sym", "n").collect()
    }
    assert got_vocab == want_vocab


def test_bpe_learn_random_corpus_property(spark):
    import random

    rng = random.Random(7)
    alphabet = "abcd"
    counts = {
        "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 7))
        ): rng.randint(1, 9)
        for _ in range(30)
    }
    rows = [(" ".join([w] * n),) for w, n in counts.items()]
    df = spark.createDataFrame(rows, "text string")
    got, _ = bpe_learn(df, "text", n_merges=12)
    want, _ = _reference_bpe(counts, 12)
    assert got == want


def test_bpe_learn_early_stops_when_fully_fused(spark):
    df = spark.createDataFrame([("ab ab ab",)], "text string")
    merges, words = bpe_learn(df, "text", n_merges=10)
    assert merges == [("a", "b")]
    assert [tuple(r["sym"]) for r in words.collect()] == [("ab",)]


def test_bpe_pair_count_plan_stays_takeordered_partial_agg(spark):
    """The per-round argmax must plan as partial+final HashAggregate and
    TakeOrderedAndProject at every round — the loop never degrades into
    a global sort or a single-stage aggregate."""
    df = spark.createDataFrame(
        [(" ".join([w] * n),) for w, n in SENNRICH_CORPUS.items()],
        "text string",
    )
    from hdfs_mapreduce_spark.operators.bpe import _chars

    words = word_frequencies(df, "text").select(
        "word", "n", _chars(F.col("word")).alias("sym")
    )
    from hdfs_mapreduce_spark.operators.bpe import _apply_merge

    for a, b in [("e", "s"), ("es", "t")]:  # rounds 0, 1, 2 plan shapes
        plan = (
            _pair_counts(words)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert plan.count("HashAggregate") >= 2  # partial + final
        assert "Sort " not in plan  # no global sort sneaks in
        words = words.select(
            "word", "n", _apply_merge(F.col("sym"), a, b).alias("sym")
        )


def _reference_encode(word: str, merges) -> list[str]:
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_encode_matches_reference_and_preserves_order(spark):
    """Encoding with learned merges must tokenize each document exactly as
    the sequential reference encoder does, with subwords in document
    order across word boundaries."""
    from hdfs_mapreduce_spark.operators.bpe import bpe_encode

    rows = [(i, " ".join([w] * n)) for i, (w, n) in
            enumerate(SENNRICH_CORPUS.items())]
    rows.append((99, "newest lower widest low"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, _ = _reference_bpe(SENNRICH_CORPUS, 6)
    got = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_encode(df, "doc_id", "text", merges).collect()
    }
    for doc_id, text in rows:
        want = [
            t for w in text.split() for t in _reference_encode(w, merges)
        ]
        assert got[doc_id] == (want, len(want)), f"doc {doc_id}"


def test_bpe_encode_roundtrip_with_learn(spark):
    """Encoding the training corpus with its own learned merges must
    reproduce bpe_learn's final symbol table, word for word."""
    from hdfs_mapreduce_spark.operators.bpe import bpe_encode, bpe_learn

    rows = [(i, " ".join([w] * n)) for i, (w, n) in
            enumerate(SENNRICH_CORPUS.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, words = bpe_learn(df, "text", n_merges=5)
    final = {r["word"]: list(r["sym"]) for r in words.collect()}
    enc = bpe_encode(df, "doc_id", "text", merges)
    for (doc_id, text), _ in zip(rows, range(len(rows))):
        toks = [
            list(r["tokens"])
            for r in enc.filter(F.col("doc_id") == doc_id).collect()
        ][0]
        want = [t for w in text.split() for t in final[w]]
        assert toks == want


def test_bpe_learn_long_run_with_checkpointing(spark):
    """A long merge run with frequent checkpoints must reproduce the
    reference merge sequence exactly (lineage truncation cannot change
    results) and must not leak cached RDDs beyond the single live
    checkpoint."""
    import random

    from hdfs_mapreduce_spark.operators.bpe import bpe_learn

    rng = random.Random(11)
    counts = {
        "".join(rng.choice("abcdef") for _ in range(rng.randint(2, 10))):
        rng.randint(1, 9)
        for _ in range(40)
    }
    rows = [(" ".join([w] * n),) for w, n in counts.items()]
    df = spark.createDataFrame(rows, "text string")
    sc = spark.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet())
    got, _ = bpe_learn(df, "text", n_merges=30, checkpoint_every=5)
    want, _ = _reference_bpe(counts, 30)
    assert got == want
    leaked = set(sc._jsc.getPersistentRDDs().keySet()) - before
    assert len(leaked) <= 1  # only the newest checkpoint may remain live


def test_bpe_model_save_load_roundtrip_and_frozen_encode(spark, tmp_path):
    """The tokenizer lifecycle: train once, persist the merges, reload,
    and encode a NEW batch with the frozen model — loaded-model encodes
    must be identical to fresh-model encodes, and merge order must come
    from the step column, not file layout."""
    from hdfs_mapreduce_spark.operators.bpe import (
        bpe_encode,
        bpe_learn,
        load_bpe_model,
        save_bpe_model,
    )

    docs = spark.createDataFrame(
        [(0, "lower lowest newer newest wider widest low new"),
         (1, "lower newer low low newest widest")],
        "doc_id long, text string",
    )
    merges, _ = bpe_learn(docs, "text", 6)
    path = str(tmp_path / "bpe_model")
    save_bpe_model(spark, merges, path)
    loaded = load_bpe_model(spark, path)
    assert loaded == merges
    day2 = spark.createDataFrame(
        [(7, "newest lowest wider unseen")], "doc_id long, text string"
    )
    fresh = bpe_encode(day2, "doc_id", "text", merges).collect()
    frozen = bpe_encode(day2, "doc_id", "text", loaded).collect()
    assert [(r["doc_id"], r["tokens"]) for r in fresh] == [
        (r["doc_id"], r["tokens"]) for r in frozen
    ]


def test_bpe_model_resave_same_path_is_safe(spark, tmp_path):
    """save_bpe_model routes through materialize's write-temp-then-swap
    (r8 ADVICE): re-saving at the same path — the retrain-in-place
    refresh loop — must never leave a moment with the artifact deleted
    or half-written, and the reloaded list must be the new one."""
    from hdfs_mapreduce_spark.operators.bpe import (
        load_bpe_model,
        save_bpe_model,
    )

    path = str(tmp_path / "model")
    save_bpe_model(spark, [("a", "b"), ("ab", "c")], path)
    assert load_bpe_model(spark, path) == [("a", "b"), ("ab", "c")]
    save_bpe_model(spark, [("x", "y")], path)
    assert load_bpe_model(spark, path) == [("x", "y")]


# ---- batched merge selection (production-scale trainer) --------------------


def test_bpe_batched_k1_is_exactly_sequential(spark):
    """batch_k=1 degenerates to the strict Sennrich loop: identical
    merge sequence AND identical final symbol table."""
    from hdfs_mapreduce_spark.operators.bpe import bpe_learn_batched

    rows = [(" ".join([w] * n),) for w, n in SENNRICH_CORPUS.items()]
    df = spark.createDataFrame(rows, "text string")
    got, words_b = bpe_learn_batched(df, "text", n_merges=8, batch_k=1)
    want, want_vocab = _reference_bpe(SENNRICH_CORPUS, 8)
    assert got == want
    assert {
        tuple(r["sym"]): r["n"] for r in words_b.select("sym", "n").collect()
    } == want_vocab


def test_bpe_batched_respects_conflict_rule_and_stays_valid(spark):
    """Batched selection must (a) never co-select pairs sharing a
    symbol or colliding with a product, (b) produce a symbol table
    identical to applying its own merge list strictly sequentially
    (the batch's folds commute — snapshot-faithful application), and
    (c) lead every batch with the snapshot's TRUE argmax, so the first
    merge overall is exactly the sequential algorithm's."""
    import random

    from hdfs_mapreduce_spark.operators.bpe import (
        _apply_merge,
        bpe_learn_batched,
    )

    rng = random.Random(11)
    counts = {
        "".join(
            rng.choice("abcdef") for _ in range(rng.randint(2, 8))
        ): rng.randint(1, 9)
        for _ in range(40)
    }
    rows = [(" ".join([w] * n),) for w, n in counts.items()]
    df = spark.createDataFrame(rows, "text string")
    merges, words = bpe_learn_batched(df, "text", n_merges=10, batch_k=4)
    assert len(merges) == len(set(merges))

    # (b) replay the recorded list strictly one-at-a-time from scratch
    base = word_frequencies(df, "text").select(
        "word",
        "n",
        F.filter(F.split(F.col("word"), ""), lambda x: x != F.lit("")).alias(
            "sym"
        ),
    )
    for a, b in merges:
        base = base.select(
            "word", "n", _apply_merge(F.col("sym"), a, b).alias("sym")
        )
    assert sorted(
        (tuple(r["sym"]), r["n"]) for r in words.select("sym", "n").collect()
    ) == sorted(
        (tuple(r["sym"]), r["n"]) for r in base.select("sym", "n").collect()
    )

    # (c) the first merge is the snapshot argmax == sequential's first
    want, _ = _reference_bpe(counts, 1)
    assert merges[0] == want[0]


def test_bpe_batched_encode_roundtrip(spark):
    """A batched-trained model is a valid frozen tokenizer: encoding
    with it reproduces each word's final symbol sequence."""
    from hdfs_mapreduce_spark.operators.bpe import bpe_encode, bpe_learn_batched

    rows = [(i, " ".join([w] * n)) for i, (w, n) in
            enumerate(SENNRICH_CORPUS.items())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges, words = bpe_learn_batched(df, "text", n_merges=6, batch_k=3)
    want = {r["word"]: list(r["sym"]) for r in words.collect()}
    enc = bpe_encode(df, "doc_id", "text", merges)
    for r in enc.join(df, "doc_id").select("text", "tokens").collect():
        w = r["text"].split()[0]
        n = len(r["text"].split())
        assert r["tokens"] == want[w] * n


def test_bpe_batched_declared_config_exercises_skip_and_divergence(spark):
    """The declared bpe_train_batched query must genuinely exercise the
    batched selection rule at fixture scale: (a) round 1's greedy scan
    over the engine's candidate window SKIPS at least one conflicting
    candidate, and (b) the batched merge list is NOT the sequential
    list — otherwise the oracle would certify only the degenerate path
    bpe_train already covers."""
    from hdfs_mapreduce_spark.operators.bpe import (
        _pair_counts,
        bpe_learn,
        bpe_learn_batched,
    )
    from hdfs_mapreduce_spark.plans.text_plans import (
        BPE_BATCH_K,
        BPE_BATCHED_MERGES,
        _bpe_alpha_corpus,
    )
    from tests.conftest import SF_SMOKE

    corpus = _bpe_alpha_corpus(spark, SF_SMOKE)
    batched, _ = bpe_learn_batched(
        corpus, "text", BPE_BATCHED_MERGES, batch_k=BPE_BATCH_K
    )
    sequential, _ = bpe_learn(corpus, "text", BPE_BATCHED_MERGES)
    assert len(batched) == BPE_BATCHED_MERGES
    assert batched != sequential
    assert sorted(set(batched)) != sorted(set(sequential)) or batched != sequential

    # Replay round 1's greedy scan over the engine's static candidate
    # window and demand at least one conflict skip.
    words = word_frequencies(corpus, "text").select(
        "word",
        "n",
        F.filter(F.split(F.col("word"), ""), lambda x: x != F.lit("")).alias(
            "sym"
        ),
    )
    top = (
        _pair_counts(words)
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(max(4 * BPE_BATCH_K, 8))
        .collect()
    )
    used: set[str] = set()
    taken, skipped = [], []
    for r in top:
        if len(taken) >= BPE_BATCH_K:
            break
        a, b = r["a"], r["b"]
        if {a, b, a + b} & used:
            skipped.append((a, b))
            continue
        taken.append((a, b))
        used.update((a, b, a + b))
    assert skipped, "declared config no longer hits a conflict skip"
    assert batched[: len(taken)] == taken
