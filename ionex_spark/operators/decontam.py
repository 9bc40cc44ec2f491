"""Benchmark decontamination: flag corpus documents that share word
n-gram shingles with a held-out evaluation set.

The standard LLM training-data hygiene step (n-gram overlap
decontamination as popularized by the GPT-3/PaLM appendices): any
training document containing a benchmark n-gram is suspect and gets
dropped or audited.  Shape at 100 TB:

- the benchmark side is SMALL (eval suites are thousands of docs, not
  billions) -> distinct-shingle index, explicitly broadcast;
- the corpus side is a narrow (doc_id, shingle) explode — no shuffle:
  the broadcast hash join + partial aggregation run map-side, and the
  only exchange is the final per-doc rollup keyed by doc_id (uniform);
- shingling reuses dedup.shingles_exploded, so the tokenizer can never
  drift between dedup and decontamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ionex_spark.operators.dedup import shingles_exploded


def contamination_hits(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    text_col: str = "text",
    exclude_self_ids: bool = False,
) -> DataFrame:
    """Per-corpus-doc contamination rollup: (doc_id, n_shared_shingles,
    n_bench_docs) for every document sharing >= 1 distinct word n-gram
    with any benchmark document.  Clean documents produce no row.

    ``exclude_self_ids`` skips pairs whose corpus id equals the bench id
    numerically.  It is OFF by default: with an EXTERNAL eval set the id
    spaces are unrelated, and an accidental collision would silently
    exempt that corpus doc from comparison against that bench doc — a
    decontamination leak.  Turn it on ONLY when bench is a subset of the
    corpus sharing the same id space (the gate query's setup)."""
    c = shingles_exploded(corpus, id_col, text_col, n=n).dropDuplicates(
        [id_col, "token"]
    )
    b = (
        shingles_exploded(bench, bench_id_col, text_col, n=n)
        .dropDuplicates([bench_id_col, "token"])
    )
    hits = c.join(F.broadcast(b), "token")
    if exclude_self_ids:
        hits = hits.filter(F.col(id_col) != F.col(bench_id_col))
    return hits.groupBy(id_col).agg(
        F.countDistinct("token").alias("n_shared_shingles"),
        F.countDistinct(bench_id_col).alias("n_bench_docs"),
    )
