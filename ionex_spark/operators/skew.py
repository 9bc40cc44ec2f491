"""Skew handling for hot spatial cells — salting + AQE backstop.

At 10^12 images, spatial keys are Zipfian (cities, popular cameras): a
groupBy/join on raw cell_id puts entire hot cells in single tasks.  Two
engine-level answers (SURVEY.md §4.2):

1. ``salted_rollup`` — split every group into S salt buckets derived from
   a high-entropy row attribute (phash/id), partial-aggregate on
   (key, salt), then merge the S partials per key.  The first (heavy)
   shuffle spreads hot keys over S tasks; the second shuffle moves only
   #distinct-keys * S tiny partial rows.  Works for all algebraic aggs.
2. ``salted_broadcast_join`` is intentionally ABSENT: broadcast joins
   don't skew (no shuffle of the big side) — the engine's spatial join is
   already broadcast, which is the strongest skew answer of all.  Salting
   matters for the aggregation after, and for future sort-merge joins
   against large dimension tables.

AQE skew-join splitting stays on as the backstop (session.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, n_salts: int, entropy_col: str = "id",
              out: str = "salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from a high-entropy column
    (NOT the group key).  Deterministic -> resumable replays stay
    idempotent."""
    return df.withColumn(
        out, F.pmod(F.xxhash64(F.col(entropy_col)), F.lit(n_salts))
    )


def salted_rollup(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    n_salts: int = 16,
    entropy_col: str = "id",
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    aggs: {column: fn} with fn in {count, sum, min, max} (algebraic fns
    that re-combine; avg = sum+count composed by the caller).
    """
    combinable = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    for fn in aggs.values():
        if fn not in combinable:
            raise ValueError(f"non-algebraic aggregate {fn!r}")
    salted = with_salt(df, n_salts, entropy_col)
    partial = salted.groupBy(*key_cols, "salt").agg(
        *[
            getattr(F, fn)(c if fn != "count" else F.lit(1)).alias(f"p_{c}")
            for c, fn in aggs.items()
        ]
    )
    final = partial.groupBy(*key_cols).agg(
        *[
            getattr(F, combinable[fn])(f"p_{c}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )
    return final


def skew_stats(df: DataFrame, key_cols: list[str], top: int = 10) -> DataFrame:
    """Per-key row counts + share of total — the metrics view that decides
    whether salting / AQE splitting is warranted (engine metrics table)."""
    from pyspark.sql.window import Window

    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_rows"))
    total = Window.partitionBy()
    return (
        counts.withColumn("share", F.col("n_rows") / F.sum("n_rows").over(total))
        .orderBy(F.desc("n_rows"))
        .limit(top)
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    n_salts: int = 16,
    entropy_col: str = "id",
    how: str = "inner",
) -> DataFrame:
    """Skew-safe BIG-BIG equi-join (the salting ladder's join rung).

    When the dimension side is too large to broadcast, a shuffle join on
    a Zipfian key puts every hot-key fact row in ONE task.  Classic
    remedy: salt the fact side into ``n_salts`` buckets from a
    high-entropy attribute, replicate each dim row once per salt
    (explode), and equi-join on (key, salt) — the hot key's probe work
    spreads over ``n_salts`` tasks at the cost of an n_salts-times
    larger dim shuffle (dim is the smaller side, so that product is
    bounded).  Join semantics are EXACTLY the unsalted join's: every
    (fact, dim) key match meets in exactly one salt bucket.

    The DIM side is hinted shuffle_hash: a hint on either side forces
    hash over sort-merge (no sort of the giant fact side) and stops the
    optimizer "rescuing" small test inputs with a broadcast that would
    hide the skew path — but JoinSelection prefers the HINTED side as
    the hash-map BUILD side, so the hint must sit on the small
    replicated dim, not the fact (ADVICE r5: a fact-side hint builds
    per-task hash maps out of the skewed fact — executor OOM on hot
    partitions at exactly the scale this operator exists for).  AQE
    skew-split stays on as backstop for residual bucket imbalance.

    ``how`` may be inner or left (fact-preserving): an unmatched fact
    row lives in exactly one salt bucket, so it surfaces exactly once.
    Dim-preserving joins (right/full) are rejected — an unmatched dim
    row exists in ALL n_salts replicas and would surface n_salts times;
    salt the other side instead."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}"
        )
    f = with_salt(facts, n_salts, entropy_col)
    d = dim.withColumn(
        "salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return (
        f.join(d.hint("shuffle_hash"), [*key_cols, "salt"], how)
        .drop("salt")
    )
