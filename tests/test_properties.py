"""Property-based tests (hypothesis): the custom join operators must equal a
brute-force reference on arbitrary small inputs — catches boundary/tie cases
fixtures miss (equal times, duplicate keys, empty sides, bucket edges)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

BASE = datetime(2024, 1, 1)
WINDOW_US = 90 * 1_000_000  # 90 s band

row = st.tuples(
    st.integers(min_value=0, max_value=3),    # key
    st.integers(min_value=0, max_value=300),  # seconds offset
)
rows = st.lists(row, min_size=0, max_size=12)


def _ts(sec: int) -> datetime:
    return BASE + timedelta(seconds=sec)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows)
def test_band_join_matches_bruteforce(spark, left, right):
    from hdfs_mapreduce_spark.operators.band import band_join

    ldf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(left)] or [(None, None, None)],
        "k long, lid long, lt timestamp",
    ).filter("lid is not null")
    rdf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(right)] or [(None, None, None)],
        "rk long, rid long, rt timestamp",
    ).filter("rid is not null")
    got = {
        (r["lid"], r["rid"])
        for r in band_join(
            ldf, rdf, "k", "rk", "lt", "rt", lower_us=0, upper_us=WINDOW_US
        ).collect()
    }
    want = {
        (li, ri)
        for li, (lk, ls) in enumerate(left)
        for ri, (rk, rs) in enumerate(right)
        if lk == rk and 0 <= (rs - ls) * 1_000_000 <= WINDOW_US
    }
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=rows, right=rows)
def test_asof_join_matches_bruteforce(spark, left, right):
    from hdfs_mapreduce_spark.operators.asof import as_of_join

    ldf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(left)] or [(None, None, None)],
        "k long, lid long, lt timestamp",
    ).filter("lid is not null")
    rdf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(right)] or [(None, None, None)],
        "k long, rid long, rt timestamp",
    ).filter("rid is not null")
    out = as_of_join(
        ldf, rdf,
        left_key="k", right_key="k",
        left_time="lt", right_time="rt",
        value_cols=["rid"], right_tiebreak="rid",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    # reference: most recent right row with rt <= lt for the same key;
    # among equal times the HIGHEST tiebreak wins (last in window order)
    want = {}
    for li, (lk, ls) in enumerate(left):
        cands = [
            (rs, ri)
            for ri, (rk, rs) in enumerate(right)
            if rk == lk and rs <= ls
        ]
        want[li] = max(cands)[1] if cands else None
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=rows,
    right=rows,
    tol_s=st.integers(min_value=0, max_value=120),
    forward=st.booleans(),
)
def test_asof_join_tolerance_and_direction_match_bruteforce(
    spark, left, right, tol_s, forward
):
    """Both directions with a staleness bound against the sequential
    model: backward takes the latest right at or before the left time
    within tol, forward the earliest at or after within tol; tie on
    equal times -> highest tiebreak backward, lowest forward."""
    from hdfs_mapreduce_spark.operators.asof import as_of_join

    ldf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(left)] or [(None, None, None)],
        "k long, lid long, lt timestamp",
    ).filter("lid is not null")
    rdf = spark.createDataFrame(
        [(k, i, _ts(s)) for i, (k, s) in enumerate(right)] or [(None, None, None)],
        "k long, rid long, rt timestamp",
    ).filter("rid is not null")
    out = as_of_join(
        ldf, rdf,
        left_key="k", right_key="k",
        left_time="lt", right_time="rt",
        value_cols=["rid"], right_tiebreak="rid",
        tolerance_us=tol_s * 1_000_000,
        direction="forward" if forward else "backward",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    want = {}
    for li, (lk, ls) in enumerate(left):
        if forward:
            cands = [
                (rs, ri)
                for ri, (rk, rs) in enumerate(right)
                if rk == lk and ls <= rs <= ls + tol_s
            ]
            want[li] = min(cands)[1] if cands else None
        else:
            cands = [
                (rs, ri)
                for ri, (rk, rs) in enumerate(right)
                if rk == lk and ls - tol_s <= rs <= ls
            ]
            want[li] = max(cands)[1] if cands else None
    assert got == want


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=8
    ),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=1, max_value=6),
)
@settings(max_examples=15, deadline=None)
def test_chunk_documents_covers_every_token(spark, texts, size, stride):
    """Every token of every doc appears in at least one chunk, chunk_idx is
    dense from 0, and no chunk exceeds `size` tokens."""
    from hdfs_mapreduce_spark.operators.dedup import chunk_documents

    assume(stride <= size)
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(df, "doc_id", "text", size=size, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc"], []).append(r)
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.lower().split() if t]
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r["chunk_idx"])
        if not toks:
            assert not chunks
            continue
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        seen = []
        for c in chunks:
            ctoks = c["chunk"].split(" ")
            assert len(ctoks) <= size
            start = c["chunk_idx"] * stride
            assert ctoks == toks[start : start + size]
            seen.extend(range(start, start + len(ctoks)))
        assert set(seen) == set(range(len(toks)))


# Tiny alphabet so random corpora actually share k-token windows.
_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
)
_corpus = st.lists(_words, min_size=1, max_size=6)
_SPAN_K = 3


def _brute_spans(texts: list[list[str]], k: int):
    """Reference model: duplicated k-window positions, merged to maximal
    spans per doc (count >= 2 corpus-wide, same-doc repeats included)."""
    from collections import Counter

    counts = Counter()
    for toks in texts:
        for p in range(len(toks) - k + 1):
            counts[tuple(toks[p : p + k])] += 1
    out = {}
    for doc, toks in enumerate(texts):
        dup = [
            p
            for p in range(len(toks) - k + 1)
            if counts[tuple(toks[p : p + k])] >= 2
        ]
        spans = []
        for p in dup:
            if spans and p <= spans[-1][1] - k + 1 + k:  # p <= prev_p + k
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + k - 1))
            else:
                spans.append((p, p + k - 1))
        for s, e in spans:
            out[(doc, s)] = e
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_duplicate_spans_matches_bruteforce(spark, texts):
    from hdfs_mapreduce_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        (r["doc"], r["span_start"]): r["span_end"]
        for r in duplicate_spans(docs, "doc_id", "text", k=_SPAN_K).collect()
    }
    assert got == _brute_spans(texts, _SPAN_K)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_span_scrub_matches_bruteforce(spark, texts):
    """Keep-first scrub vs a direct model: a token survives unless some
    duplicated window covers it and no kept (globally-first) one does."""
    import hashlib
    from collections import Counter, defaultdict

    from hdfs_mapreduce_spark.operators.dedup import span_scrub

    k = _SPAN_K
    counts = Counter()
    occs = defaultdict(list)  # window -> [(doc, pos) in global order]
    for doc, toks in enumerate(texts):
        for p in range(len(toks) - k + 1):
            w = tuple(toks[p : p + k])
            counts[w] += 1
            occs[w].append((doc, p))
    covered, kept_cover = set(), set()
    for w, lst in occs.items():
        if counts[w] < 2:
            continue
        for rank, (doc, p) in enumerate(sorted(lst)):
            for i in range(p, p + k):
                covered.add((doc, i))
                if rank == 0:
                    kept_cover.add((doc, i))
    want = {}
    for doc, toks in enumerate(texts):
        kept = [
            t
            for i, t in enumerate(toks)
            if (doc, i) not in covered or (doc, i) in kept_cover
        ]
        n_removed = len(toks) - len(kept)
        want[doc] = (
            n_removed,
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r["doc"]: (r["n_removed"], r["n_kept"], r["scrubbed_hash"])
        for r in span_scrub(docs, "doc_id", "text", k=k).collect()
    }
    assert got == want


_iv = st.tuples(
    st.integers(min_value=0, max_value=3),     # key
    st.integers(min_value=0, max_value=400),   # start sec
    st.integers(min_value=0, max_value=200),   # duration sec
)
_ivs = st.lists(_iv, min_size=0, max_size=10)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_ivs, right=_ivs, bucket_sec=st.sampled_from([7, 60, 301]))
def test_interval_join_matches_bruteforce(spark, left, right, bucket_sec):
    """Exactly-once pair emission for arbitrary intervals and bucket widths
    (overlaps spanning many shared buckets, touching endpoints, nested and
    identical intervals, empty sides)."""
    from hdfs_mapreduce_spark.operators.band import interval_join

    ldf = spark.createDataFrame(
        [(k, i, _ts(s), _ts(s + d)) for i, (k, s, d) in enumerate(left)]
        or [(None, None, None, None)],
        "k long, lid long, lst timestamp, len_ timestamp",
    ).filter("lid is not null")
    rdf = spark.createDataFrame(
        [(k, i, _ts(s), _ts(s + d)) for i, (k, s, d) in enumerate(right)]
        or [(None, None, None, None)],
        "rk long, rid long, rst timestamp, ren timestamp",
    ).filter("rid is not null")
    got = sorted(
        (r["lid"], r["rid"])
        for r in interval_join(
            ldf, rdf, "k", "rk", "lst", "len_", "rst", "ren",
            bucket_us=bucket_sec * 1_000_000,
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, (lk, lsec, ld) in enumerate(left)
        for ri, (rk, rsec, rd) in enumerate(right)
        if lk == rk and lsec <= rsec + rd and rsec <= lsec + ld
    )
    assert got == want  # sorted WITH duplicates: each pair exactly once


# --- product quantization ---------------------------------------------------
vec8 = st.lists(
    st.floats(
        min_value=-4.0, max_value=4.0, allow_nan=False, allow_infinity=False,
        width=32,
    ),
    min_size=8,
    max_size=8,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=st.lists(vec8, min_size=4, max_size=10))
def test_pq_encode_picks_the_true_argmin(spark, vecs):
    """For arbitrary small corpora, every emitted (code, sq_err) must be
    the brute-force minimum distance from the vector's subspace slice to
    ANY codeword of that subspace — and ties must go to the lower code
    (the ROW_NUMBER (dist, j) rule the oracle uses)."""
    from hdfs_mapreduce_spark.operators.similarity import (
        _pq_codewords,
        pq_encode,
    )

    m_sub, ksub = 2, 3
    dsub = 8 // m_sub
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cbs = _pq_codewords(emb, m_sub, ksub, "vec_id", "embedding")
    rows = pq_encode(emb, m_sub=m_sub, ksub=ksub).collect()
    assert len(rows) == len(vecs) * m_sub
    # brute-force reference with the same sequential fold
    vec_by_id = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }
    for r in rows:
        v = vec_by_id[r["vid"]]
        sub = v[r["s"] * dsub : (r["s"] + 1) * dsub]
        dists = []
        for j in range(cbs.shape[1]):
            acc = 0.0
            for d in range(dsub):
                diff = sub[d] - cbs[r["s"], j, d]
                acc += diff * diff
            dists.append(acc)
        best = min(range(len(dists)), key=lambda j: (dists[j], j))
        assert r["code"] == best
        assert r["sq_err"] == dists[best]
