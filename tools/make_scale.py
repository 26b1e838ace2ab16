"""Deterministic scale-up of the driver's parquet fixtures: replicate a
source SF directory K times into a target directory, preserving each
table's internal structure while keeping replicas from cross-matching.

Why not plain duplication: copying documents/embeddings verbatim K times
multiplies every near-dup cluster by K, so pair-producing queries
(minhash/simhash/jaccard/crosscheck) blow up ~K^2 — a workload REAL K×
data does not have. Instead each replica gets a structure-preserving
isomorphism:

* documents: every whitespace token in replica k>0 gets an ``_rk`` suffix
  (vocabulary becomes disjoint across replicas, so shingle/minhash/
  simhash similarity within a replica is exactly the original while
  cross-replica similarity drops to ~0), then the whole text goes
  through a per-replica character substitution cipher (seeded random
  permutation of letters and digits — see ``_replica_cipher``) so
  character-PREFIX modalities (edit-distance key blocking) can't
  cross-match either: the suffix alone left the first window_len chars
  byte-identical across replicas whenever the first token was long.
  Token counts, lengths, whitespace shape, and all within-replica
  Levenshtein distances are preserved (plus a constant 3 chars/token
  from the suffix).
* embeddings: replica k multiplies each vector elementwise by a
  deterministic ±1 mask seeded by k — norms and all within-replica
  dot products are exactly preserved (cos(Ma, Mb) = cos(a, b)); across
  replicas cosines decorrelate.
* keyed tables (events, orders×lineitem, customer): surrogate keys are
  offset by k × (max_key + 1) so joins stay 1:N within a replica and
  never cross replicas. Timestamps are left alone (K× event density in
  the same window — what a bigger day of the same service looks like).
* dimensions (region/nation/part/supplier) are NOT scaled: at any real
  SF they stay broadcast-sized; queries join them K× harder instead.

Usage: python tools/make_scale.py [src_sf_dir] [dst_dir] [k]
Defaults: /root/testdata/sf0.1 /tmp/sf1.0 10
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIM_TABLES = ("region", "nation", "part", "supplier")


def _offset(col: pa.ChunkedArray, k: int, span: int) -> pa.Array:
    return pc.add(col, pa.scalar(k * span, type=col.type))


def _span(col: pa.ChunkedArray) -> int:
    return int(pc.max(col).as_py()) + 1


def _replica_cipher(k: int) -> dict[int, str]:
    """Per-replica character substitution cipher (seeded random
    permutation of [a-z] — mirrored onto [A-Z] — and of [0-9];
    whitespace and punctuation pass through). Why it exists: the
    per-token ``_rk`` suffix keeps TOKEN vocabularies disjoint across
    replicas, but character-PREFIX modalities (edit-distance key
    blocking) saw byte-identical windows whenever a doc's first token
    was longer than the window — replicas cross-matched, pair counts
    grew ~K² for those docs, and the sf1→sf3 smoke measured that
    fixture artifact (dedup_edit_pairs 3.57×) instead of the plan's
    real growth. A bijective per-character map preserves every
    WITHIN-replica Levenshtein distance and equality structure exactly
    (substitutions stay substitutions, equal chars stay equal, lengths
    unchanged), while two independent random permutations agree on any
    given character with probability 1/26 — so cross-replica windows
    differ at essentially every letter position and never share a
    ≤1-deletion blocking variant. Unlike a constant per-replica tag
    (the first cut), it consumes NO window characters, so
    within-replica discrimination is untouched; and unlike a Caesar
    rotation it composes safely when scale dirs are built from already
    scaled dirs (random permutations don't collide under composition
    the way additive rotations do).

    NESTING CAVEAT (measured round 9): the CIPHERS compose safely, but
    replica 0 being the IDENTITY does not — scaling an already-scaled
    dir makes outer-replica-j(inner-replica-0(doc)) byte-identical to
    outer-replica-0(inner-replica-j(doc)), i.e. every base doc gains
    K-1 exact twins ACROSS outer replicas (45,944 dup pairs at nested
    k=10-of-k=10), quadratically inflating pair-producing queries with
    TRUE duplicates the fixture never meant to contain. For honest
    pair-growth octaves, always build the larger SF DIRECTLY from the
    unscaled base (k=100 from sf0.1, not k=10 from sf1)."""
    rng = np.random.default_rng(987654 + k)
    lower = "abcdefghijklmnopqrstuvwxyz"
    digits = "0123456789"
    lperm = rng.permutation(list(lower))
    dperm = rng.permutation(list(digits))
    table: dict[int, str] = {}
    for a, b in zip(lower, lperm):
        table[ord(a)] = b
        table[ord(a.upper())] = b.upper()
    for a, b in zip(digits, dperm):
        table[ord(a)] = b
    return table


def scale_documents(src: str, dst: str, k_total: int) -> None:
    t = pq.read_table(src)
    reps = [t]
    texts = t.column("text").to_pylist()
    for k in range(1, k_total):
        suffix = f"_r{k}"
        cipher = _replica_cipher(k)
        new_texts = [
            " ".join(w + suffix for w in s.split(" ")).translate(cipher)
            if s
            else s
            for s in texts
        ]
        cols = {}
        span = _span(t.column("doc_id"))
        cols["doc_id"] = _offset(t.column("doc_id"), k, span)
        cols["text"] = pa.array(new_texts, type=pa.string())
        cols["lang"] = t.column("lang")
        cols["source"] = t.column("source")
        cols["n_chars"] = pa.array(
            [len(s) for s in new_texts], type=pa.int64()
        )
        reps.append(pa.table(cols))
    pq.write_table(pa.concat_tables(reps), dst)


def scale_embeddings(src: str, dst: str, k_total: int) -> None:
    t = pq.read_table(src)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    span = _span(t.column("vec_id"))
    reps = [t]
    for k in range(1, k_total):
        rng = np.random.default_rng(1234 + k)
        mask = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        flipped = vecs * mask
        cols = {
            "vec_id": _offset(t.column("vec_id"), k, span),
            "embedding": pa.array(
                [row for row in flipped.tolist()],
                type=t.schema.field("embedding").type,
            ),
            "label": t.column("label"),
        }
        reps.append(pa.table(cols))
    pq.write_table(pa.concat_tables(reps), dst)


def scale_keyed(
    src: str, dst: str, k_total: int, key_spans: dict[str, str]
) -> None:
    """Replicate offsetting each key column by k×span(span_source_col).
    key_spans maps column name → column whose max defines the span (so
    l_orderkey in lineitem is offset by the span of the SAME key space
    as orders.o_orderkey: pass explicit spans via the caller)."""
    t = pq.read_table(src)
    spans = {c: _span(t.column(c)) for c in key_spans}
    reps = [t]
    for k in range(1, k_total):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in spans:
                cols[name] = _offset(col, k, spans[name])
            else:
                cols[name] = col
        reps.append(pa.table(cols))
    pq.write_table(pa.concat_tables(reps), dst)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1.0"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in DIM_TABLES:
        shutil.copyfile(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    scale_documents(f"{src}/documents.parquet", f"{dst}/documents.parquet", k)
    scale_embeddings(
        f"{src}/embeddings.parquet", f"{dst}/embeddings.parquet", k
    )
    scale_keyed(
        f"{src}/events.parquet",
        f"{dst}/events.parquet",
        k,
        {"event_id": "event_id", "user_id": "user_id"},
    )
    # orders/lineitem share the orderkey space: offset both by the span of
    # the larger observed key so the join keys keep lining up per replica.
    orders = pq.read_table(f"{src}/orders.parquet")
    lineitem = pq.read_table(f"{src}/lineitem.parquet")
    okspan = max(
        _span(orders.column("o_orderkey")), _span(lineitem.column("l_orderkey"))
    )
    customer = pq.read_table(f"{src}/customer.parquet")
    # span over BOTH custkey spaces: customers with no orders would
    # otherwise let replica ids collide with base ids
    ckspan = max(
        _span(orders.column("o_custkey")), _span(customer.column("c_custkey"))
    )

    def _rep(t: pa.Table, keymap: dict[str, int]) -> pa.Table:
        reps = [t]
        for kk in range(1, k):
            cols = {}
            for name in t.column_names:
                col = t.column(name)
                if name in keymap:
                    cols[name] = _offset(col, kk, keymap[name])
                else:
                    cols[name] = col
            reps.append(pa.table(cols))
        return pa.concat_tables(reps)

    pq.write_table(
        _rep(orders, {"o_orderkey": okspan, "o_custkey": ckspan}),
        f"{dst}/orders.parquet",
    )
    pq.write_table(
        _rep(lineitem, {"l_orderkey": okspan}), f"{dst}/lineitem.parquet"
    )
    pq.write_table(
        _rep(customer, {"c_custkey": ckspan}), f"{dst}/customer.parquet"
    )
    for name in sorted(os.listdir(dst)):
        print(name, pq.read_metadata(os.path.join(dst, name)).num_rows)


if __name__ == "__main__":
    main()
