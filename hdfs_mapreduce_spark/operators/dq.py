"""Declarative data-quality expectations, evaluated engine-side.

The validation gate every production pipeline runs before promoting a
batch (Great-Expectations/Deequ-style), re-expressed Spark-first: each
table's row-level checks compile into ONE conditional-aggregate pass
(``SUM(CASE WHEN violated)`` per check inside a single ``agg`` — no
per-check rescans), unpivoted to (tbl, check, n_rows, violations, pass)
rows with ``stack``. Referential-integrity checks are left-anti joins
aggregated to a count — written without a broadcast hint so AQE picks
broadcast locally and shuffle join at 100 TB parent sizes.

Scale posture: cost = one scan per table + one join per RI rule,
independent of the number of row-level checks; the result relation is
O(#checks) rows. Uniqueness uses exact COUNT(col) - COUNT(DISTINCT col)
(a two-phase partial-agg shuffle — the exact form scales; swap in
approx_count_distinct when a tolerance is acceptable).

The relation is a deterministic audit of the data — violations are
whatever they are — so it carries a full hash oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EVENT_TYPE_DOMAIN = ("click", "error", "purchase", "signup", "view")


def _violations(cond: Column) -> Column:
    """Count of rows violating the expectation (cond = is-violated)."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def _unpivot(one_row: DataFrame, tbl: str, checks: list[str]) -> DataFrame:
    """One aggregate row with a column per check -> (tbl, check, n_rows,
    violations, pass) rows via stack — still a single pass."""
    pairs = ", ".join(f"'{c}', `{c}`" for c in checks)
    return one_row.selectExpr(
        f"'{tbl}' AS tbl",
        "n_rows",
        f"stack({len(checks)}, {pairs}) AS (check, violations)",
    ).select(
        "tbl",
        "check",
        "n_rows",
        "violations",
        (F.col("violations") == 0).alias("pass"),
    )


def _row_checks(
    df: DataFrame, tbl: str, checks: dict[str, Column],
    unique_col: str | None = None,
) -> DataFrame:
    """One aggregate pass per table: every conditional-count check plus
    (optionally) the exact uniqueness check in the SAME agg. Uniqueness
    used to be a separate single-check aggregate over the same table —
    a second full scan per table per suite run (events, documents and
    embeddings each scanned twice). count_distinct beside plain sums
    plans as one scan + Expand (rows duplicated 2x in-memory for the
    distinct path), which trades a little CPU for a whole I/O pass —
    the right trade at any corpus size."""
    names = list(checks)
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        *[_violations(cond).alias(name) for name, cond in checks.items()],
    ]
    if unique_col is not None:
        names.append(f"{unique_col}_unique")
        aggs.append(
            _unique_violations(df, unique_col).alias(f"{unique_col}_unique")
        )
    return _unpivot(df.agg(*aggs), tbl, names)


def _unique_violations(df: DataFrame, col: str) -> Column:
    """Non-null rows beyond the first per value: COUNT(col) -
    COUNT(DISTINCT col) — exact, two-phase partial agg."""
    return (F.count(col) - F.count_distinct(F.col(col))).cast("long")


def _ri_check(
    child: DataFrame,
    parent: DataFrame,
    fk: str,
    pk: str,
    tbl: str,
    check: str,
) -> DataFrame:
    """Orphaned-foreign-key count: child rows whose fk matches no parent
    pk (left-anti). No broadcast hint — AQE picks the join strategy by
    parent size. The parent key is aliased to a reserved name so a rule
    whose fk and pk share a column name can't make the join condition
    ambiguous (or trivially true)."""
    n = child.agg(F.count(F.lit(1)).alias("n_rows"))
    viol = (
        child.select(F.col(fk))
        .join(
            parent.select(F.col(pk).alias("_dq_pk")).distinct(),
            F.col(fk) == F.col("_dq_pk"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("violations"))
    )
    return n.crossJoin(viol).select(
        F.lit(tbl).alias("tbl"),
        F.lit(check).alias("check"),
        "n_rows",
        "violations",
        (F.col("violations") == 0).alias("pass"),
    )


def incremental_row_checks(
    base: DataFrame,
    change_feeds: list[DataFrame],
    tbl: str,
    checks: dict,
) -> DataFrame:
    """Deequ-on-Delta: maintain a row-level expectations report from the
    change feed instead of rescanning the table. Seed (n_rows, violations
    per check) from the ``base`` snapshot with the same ONE
    conditional-aggregate pass ``dq_report`` uses, then fold each CDF
    relation (``streaming/logtable.py table_changes`` shape): after-images
    of inserts/updates ADD a violation when they break the predicate,
    before-images of updates/deletes RETRACT one when they did — the
    retract-and-add discipline of ``logtable_ivm``, applied to audit
    counters. Row count maintains as +inserts − deletes.

    ``checks`` maps name → callable taking a column accessor
    (``col_of: name -> Column``) and returning the is-violated predicate,
    so one definition evaluates against the base row, the ``_before``
    image, and the ``_after`` image. The CDF emits the table's key
    column BARE (no suffix — an upsert key is identical in both images
    by construction), so the accessor resolves a name to its suffixed
    image when the feed carries one and to the bare column otherwise;
    checks may therefore reference the key column safely.
    Only valid for row-LOCAL predicates
    (each row's verdict independent of other rows): uniqueness and
    referential integrity are not foldable this way and keep the
    full-scan forms in ``dq_report``.

    Scale: the base pass runs ONCE (at the maintained view's birth);
    each maintenance step is one conditional-agg pass over |delta| rows
    and a 1-row merge — the full-rescan twin pays O(|table|) per run.
    Equivalence to a fresh full rescan of the final snapshot is exact
    (proven by pytest and by the declared query's closed-form oracle)."""
    acc = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        *[
            F.coalesce(  # empty base: SUM is NULL, the count is 0
                _violations(build(lambda c: F.col(c))), F.lit(0).cast("long")
            ).alias(name)
            for name, build in checks.items()
        ],
    )
    ct = F.col("change_type")
    is_after = ct.isin("insert", "update")
    is_before = ct.isin("update", "delete")
    for ch in change_feeds:
        if ch is None:
            continue
        feed_cols = set(ch.columns)

        def _img(suffix):
            # Suffixed image when the feed carries one; the key column
            # (emitted bare by table_changes) resolves to itself.
            return lambda c: F.col(
                f"{c}{suffix}" if f"{c}{suffix}" in feed_cols else c
            )

        delta = ch.agg(
            F.sum(
                F.when(ct == "insert", 1)
                .when(ct == "delete", -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_rows"),
            *[
                F.sum(
                    F.when(
                        is_after & build(_img("_after")), 1
                    ).otherwise(0)
                    - F.when(
                        is_before & build(_img("_before")),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias(name)
                for name, build in checks.items()
            ],
        )
        cols = ["n_rows", *checks]
        a, d = acc.alias("a"), delta.alias("d")
        acc = a.crossJoin(d).select(
            *[
                (
                    F.col(f"a.{c}")
                    + F.coalesce(F.col(f"d.{c}"), F.lit(0))
                ).alias(c)
                for c in cols
            ]
        )
    return _unpivot(acc, tbl, list(checks))


def dq_report(
    events: DataFrame,
    documents: DataFrame,
    embeddings: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    customer: DataFrame,
) -> DataFrame:
    """The full expectations suite over the warehouse: per-table
    conditional-aggregate passes + two referential-integrity anti-joins,
    unioned to one (tbl, check, n_rows, violations, pass) relation."""
    parts = [
        _row_checks(
            events,
            "events",
            {
                "event_id_not_null": F.col("event_id").isNull(),
                "ts_not_null": F.col("ts").isNull(),
                "value_positive": F.col("value").isNull()
                | (F.col("value") <= 0),
                "event_type_in_domain": F.col("event_type").isNull()
                | ~F.col("event_type").isin(*EVENT_TYPE_DOMAIN),
            },
            unique_col="event_id",
        ),
        _row_checks(
            documents,
            "documents",
            {
                "n_chars_consistent": F.col("n_chars")
                != F.length(F.col("text")),
            },
            unique_col="doc_id",
        ),
        _row_checks(
            embeddings,
            "embeddings",
            {
                "embedding_dim_64": F.size(F.col("embedding")) != 64,
            },
            unique_col="vec_id",
        ),
        _row_checks(
            orders,
            "orders",
            {
                "o_totalprice_positive": F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") <= 0),
            },
        ),
        _ri_check(
            orders,
            customer,
            "o_custkey",
            "c_custkey",
            "orders",
            "o_custkey_ri_customer",
        ),
        _row_checks(
            lineitem,
            "lineitem",
            {
                "l_quantity_in_1_50": F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                "l_discount_in_0_01": F.col("l_discount").isNull()
                | (F.col("l_discount") < 0)
                | (F.col("l_discount") > 0.1),
            },
        ),
        _ri_check(
            lineitem,
            orders,
            "l_orderkey",
            "o_orderkey",
            "lineitem",
            "l_orderkey_ri_orders",
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("tbl", "check")
