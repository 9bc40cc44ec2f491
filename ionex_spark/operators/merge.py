"""IONEX merge — keyed union preferring lhs + header qc semantics.

Mirrors the reference's qc-feature merge (src/lib.rs:1290-1323):
- record merge: full outer join on the grid key, lhs wins, rhs fills
  missing keys AND missing RMS/height fields (src/record/qc.rs:12-31);
- header merge: min first epoch, max last epoch, min sampling interval,
  comment union + a "FILE MERGE" tag (src/header/qc.rs:13-97);
- merged-file predicate: comments contain "FILE MERGE" (src/lib.rs:547-554).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ionex_spark.core.ionex_io import IonexHeader

MERGE_TAG = "FILE MERGE"

KEY = ["epoch", "lat", "lon", "alt"]


def merge_tec_points(lhs: DataFrame, rhs: DataFrame) -> DataFrame:
    """Keyed union preferring lhs; rhs fills missing keys and missing
    nullable fields (rms_q) on shared keys.

    An rms_q filled from rhs is an integer quantized under RHS's exponent;
    when the merged row keeps LHS's exponent the value is rescaled by
    10^(r_exp - exp) (rounded) so its REAL value is preserved — without
    this, files merged across different EXPONENT headers mis-scale the
    filled RMS by a power of 10."""
    l = lhs.select(*KEY, "tecu_q", "exp", "rms_q")
    r = rhs.select(
        *KEY,
        F.col("tecu_q").alias("r_tecu_q"),
        F.col("exp").alias("r_exp"),
        F.col("rms_q").alias("r_rms_q"),
    )
    m = l.join(r, KEY, "full_outer")
    m = m.withColumn("exp_out", F.coalesce("exp", "r_exp"))

    def _fill_rescaled(own: str, other: str) -> str:
        # a quantized value filled from rhs is an integer under RHS's
        # exponent; rescale to the merged row's exponent so its REAL
        # value is preserved (tecu_q can be filled cross-row too now that
        # RMS-only rows carry NULL tecu_q)
        return (
            f"CASE WHEN {own} IS NOT NULL THEN {own}"
            f" WHEN {other} IS NOT NULL THEN"
            f"  cast(round({other} * power(cast(10 as double),"
            f"  cast(r_exp - exp_out as double))) as bigint)"
            f" ELSE NULL END"
        )

    return m.select(
        *KEY,
        F.expr(_fill_rescaled("tecu_q", "r_tecu_q")).alias("tecu_q"),
        F.col("exp_out").alias("exp"),
        F.expr(_fill_rescaled("rms_q", "r_rms_q")).alias("rms_q"),
    )


def merge_headers(a: IonexHeader, b: IonexHeader) -> IonexHeader:
    """min/max epoch span, min sampling, comment union + FILE MERGE tag."""
    comments = list(dict.fromkeys(a.comments + b.comments))
    if MERGE_TAG not in comments:
        comments.append(MERGE_TAG)
    return IonexHeader(
        version=a.version,
        program=a.program,
        run_by=a.run_by,
        description=list(dict.fromkeys(a.description + b.description)),
        map_dimension=a.map_dimension,
        grid=a.grid,
        interval_s=min(a.interval_s, b.interval_s),
        epoch_first=min(a.epoch_first, b.epoch_first),
        epoch_last=max(a.epoch_last, b.epoch_last),
        number_of_maps=0,  # recomputed from the merged record at export
        elevation_cutoff=a.elevation_cutoff,
        mapping_function=a.mapping_function,
        base_radius_km=a.base_radius_km,
        exponent=a.exponent,
        comments=comments,
    )


def is_merged(header: IonexHeader) -> bool:
    return any(MERGE_TAG in c for c in header.comments)
