"""Change-data-capture between table versions: keyed snapshot diff.

The consumer side of the snapshot/time-travel layer (sources/tableio):
given two versions of a keyed table, emit one row per changed key with
`change_type` in {added, removed, changed} and both value images — what
an incremental downstream (index refresh, cache invalidation, training-
set delta shipping) consumes instead of re-reading 100 TB.

Shape at scale: ONE full-outer shuffle join on the key (both sides
hash-partitioned once); the value comparison is a narrow codegen
predicate, and unchanged keys are filtered BEFORE any further exchange,
so the output is proportional to the churn, not the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Keyed diff: (keys..., change_type, <col>_old, <col>_new per
    compare col).  Unchanged keys produce no row.  NULL-safe comparison
    (<=>), so NULL -> value and value -> NULL count as changes."""
    o = old.select(
        *keys, *[F.col(c).alias(f"{c}_old") for c in compare_cols]
    ).withColumn("_in_old", F.lit(1))
    n = new.select(
        *keys, *[F.col(c).alias(f"{c}_new") for c in compare_cols]
    ).withColumn("_in_new", F.lit(1))
    j = o.join(n, keys, "full_outer")
    same = " and ".join(f"{c}_old <=> {c}_new" for c in compare_cols)
    return (
        j.withColumn(
            "change_type",
            F.expr(
                "CASE WHEN _in_old IS NULL THEN 'added'"
                " WHEN _in_new IS NULL THEN 'removed'"
                f" WHEN {same} THEN 'unchanged'"
                " ELSE 'changed' END"
            ),
        )
        .filter("change_type != 'unchanged'")
        .drop("_in_old", "_in_new")
    )


def upsert_merge(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
) -> DataFrame:
    """MERGE semantics: rows from ``updates`` win on key collision,
    unmatched current rows survive — one full-outer join + per-column
    coalesce (matched-update + not-matched-insert of Iceberg/Delta
    MERGE INTO, without delete clauses)."""
    cols = [c for c in current.columns if c not in keys]
    assert set(current.columns) == set(updates.columns), (
        current.columns, updates.columns,
    )
    c = current.alias("c")
    u = updates.alias("u")
    j = c.join(u, keys, "full_outer")
    return j.select(
        *[F.coalesce(F.col(f"u.{k}"), F.col(f"c.{k}")).alias(k) for k in keys],
        *[
            # updates win WHERE THE KEY MATCHED (u side present), even if
            # the new value is NULL: gate on a u-side key, not the value
            F.when(
                F.col(f"u.{keys[0]}").isNotNull(), F.col(f"u.{col}")
            ).otherwise(F.col(f"c.{col}")).alias(col)
            for col in cols
        ],
    )


def apply_rollup_delta(
    old_rollup: DataFrame,
    diff: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_cols: list[str] | None = None,
) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE for algebraic rollups: given the old
    per-key rollup and a snapshot_diff of the BASE table, produce the
    new rollup WITHOUT rescanning the base — each changed row
    contributes (new - old) to its key's aggregates; added rows
    contribute +new, removed rows -old.  Keys whose count reaches zero
    drop out.

    The 100 TB point: the base table never rescans — the update cost is
    O(churn), and the delta aggregation + outer merge shuffle only the
    (small) changed-key set.  Requires algebraic aggregates (count/sum);
    min/max need the base table on shrinkage and are out of scope."""
    sum_cols = sum_cols or []
    contrib = diff.selectExpr(
        *keys,
        "CASE change_type WHEN 'added' THEN 1 WHEN 'removed' THEN -1"
        " ELSE 0 END as _dn",
        *[
            f"coalesce({c}_new, cast(0 as double))"
            f" - coalesce({c}_old, cast(0 as double)) as _d_{c}"
            for c in sum_cols
        ],
    )
    delta = contrib.groupBy(*keys).agg(
        F.sum("_dn").alias("_dn"),
        *[F.sum(f"_d_{c}").alias(f"_d_{c}") for c in sum_cols],
    )
    o = old_rollup.alias("o")
    d = delta.alias("d")
    j = o.join(d, keys, "full_outer")
    out = j.select(
        *[
            F.coalesce(F.col(f"d.{k}"), F.col(f"o.{k}")).alias(k)
            for k in keys
        ],
        (
            F.coalesce(F.col(f"o.{count_col}"), F.lit(0))
            + F.coalesce(F.col("d._dn"), F.lit(0))
        ).alias(count_col),
        *[
            (
                F.coalesce(F.col(f"o.{c}"), F.lit(0.0))
                + F.coalesce(F.col(f"d._d_{c}"), F.lit(0.0))
            ).alias(c)
            for c in sum_cols
        ],
    )
    return out.filter(F.col(count_col) > 0)
