"""Text analysis for training-data pipelines — language-ID, quality
scoring, token counting, fingerprinting (north_rule training-data ops).

All built-in JVM expressions (length/replace/split/md5) — no Python, no
regexp (regex dialects differ between engines; substring counting via
replace-length is portable and codegen-friendly).  Each function both
powers a registered oracled query and is usable as a standalone operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# occurrence count of a literal needle: (len(s) - len(replace(s, needle)))
# / len(needle) — portable to any SQL engine, stays in whole-stage codegen
def occ_sql(s: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"((length({s}) - length(replace({s}, '{n}', ''))) / {len(n)})"


def ws_norm_sql(s: str) -> str:
    """Translate tab/LF/CR to plain spaces so every whitespace class
    separates tokens (multi-line documents tokenize correctly, not as one
    giant token per line-join).  chr() + translate() spell identically in
    Spark and DuckDB, so the SAME fragment serves engine and oracle —
    the two sides cannot drift."""
    return f"translate({s}, concat(chr(9), chr(10), chr(13)), '   ')"


def token_count_sql(s: str) -> str:
    """Whitespace token count: split on whitespace (space/tab/LF/CR via
    ws_norm_sql), ignore empty tokens — consistent with
    dedup.tokens_exploded (runs of whitespace don't inflate the count;
    empty/all-space text counts 0)."""
    return (
        f"size(filter(split({ws_norm_sql(s)}, ' '), x -> length(x) > 0))"
    )


def token_count_duckdb_sql(s: str) -> str:
    """DuckDB spelling of token_count_sql (same VALUE)."""
    return (
        f"len(list_filter(string_split({ws_norm_sql(s)}, ' '),"
        f" x -> length(x) > 0))"
    )


# tiny deterministic stopword banks per language (public common words)
LANG_MARKERS = {
    "en": (" the ", " and ", " of "),
    "fr": (" le ", " la ", " et "),
    "de": (" der ", " und ", " die "),
    "es": (" el ", " de ", " que "),
}


def lang_score_sql(s: str, lang: str) -> str:
    terms = " + ".join(occ_sql(s, m) for m in LANG_MARKERS[lang])
    return f"({terms})"


def lang_id_sql(s: str) -> str:
    """argmax over language marker scores; ties resolve in the fixed
    en > fr > de > es order (CASE evaluation order) — deterministic."""
    scores = {lang: lang_score_sql(s, lang) for lang in LANG_MARKERS}
    pairs = list(scores.items())
    best = f"greatest({', '.join(scores.values())})"
    cases = " ".join(
        f"WHEN {expr} = {best} THEN '{lang}'" for lang, expr in pairs
    )
    return f"(CASE {cases} ELSE 'und' END)"


def quality_score_sql(s: str) -> str:
    """Cheap quality heuristic in [0,1]-ish: penalize very short docs and
    extreme punctuation/space ratios.  Integer/portable arithmetic over
    doubles only."""
    length = f"length({s})"
    spaces = occ_sql(s, " ")
    dots = occ_sql(s, ".")
    return (
        f"(least(cast({length} as double) / cast(500.0 as double),"
        f" cast(1.0 as double))"
        f" * (cast(1.0 as double) - least(({dots}) / (({spaces}) +"
        f" cast(1.0 as double)), cast(1.0 as double))))"
    )


def fingerprint_sql(s: str) -> str:
    """64-bit-ish document fingerprint: md5 of the normalized head + length
    mixed in; portable (md5 is identical everywhere)."""
    return f"substr(md5(concat(substr(lower({s}), 1, 256), '#', length({s}))), 1, 16)"


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumns(
        {
            "n_tokens": F.expr(token_count_sql(text_col)),
            "lang_pred": F.expr(lang_id_sql(f"lower({text_col})")),
            "quality": F.expr(quality_score_sql(text_col)),
            "fingerprint": F.expr(fingerprint_sql(text_col)),
        }
    )


def rolling_hash_sql(s: str, dialect: str = "spark") -> str:
    """Polynomial rolling hash over characters: h = (h*31 + ascii(c)) mod
    1e9+7 — the classic document-fingerprint kernel, as a fold over the
    char array (JVM-side in Spark, list_reduce in DuckDB; identical
    values).  Modulus keeps the accumulator ANSI-overflow-safe."""
    if dialect == "spark":
        return (
            f"aggregate(regexp_extract_all({s}, '.', 0), 0L,"
            " (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        f"regexp_extract_all({s}, '.'), c -> CAST(ascii(c) AS BIGINT))),"
        " (acc, c) -> (acc * 31 + c) % 1000000007)"
    )


# the composed ingest-filter predicate over with_text_features columns —
# ONE definition shared by the oracled gate query (corpus_quality_filter,
# both engine and DuckDB sides) and the production spark-submit job
# (jobs/corpus_pipeline_job.py), so thresholds cannot drift between them
QUALITY_FILTER_SQL = (
    "n_tokens BETWEEN 5 AND 100000"
    " AND quality >= CAST(0.05 AS DOUBLE)"
    " AND lang_pred = lang"
)


# ------------------------------------------------ sampling & packing ops

def sample_hash_sql(
    id_expr: str, dialect: str = "spark", salt: str = ""
) -> str:
    """Deterministic sampling hash in [0, 10000): the engine's ONE
    portable md5-to-int64 kernel (dedup.token_hash_sql and its DuckDB
    twin) applied to the stringified id, mod 1e4 — identical value in
    Spark and DuckDB, so a sampled dataset is REPRODUCIBLE across engines
    and reruns (the seeded-rand alternative is neither).

    ``salt`` makes gates INDEPENDENT (review finding): two unsalted
    gates composed in a pipeline share one hash, so the second gate's
    thresholds see a hash confined to the first gate's survivor range
    instead of uniform [0, 10000) — e.g. a mixture over a
    stratified-sampled corpus silently over-keeps every domain whose
    upstream keep-fraction was below the mixture threshold.  Each
    distinct sampling purpose must pass its own salt (mixture='mix',
    split='split', per-group sampling='topk'; plain stratified
    sampling keeps the unsalted default)."""
    from ionex_spark.operators import dedup as dd

    if salt and not salt.replace("_", "").isalnum():
        raise ValueError(f"salt must be alphanumeric, got {salt!r}")
    if dialect == "spark":
        v = (
            f"concat('{salt}:', cast({id_expr} as string))"
            if salt
            else f"cast({id_expr} as string)"
        )
        h = dd.token_hash_sql(v, 7)
    else:
        v = (
            f"concat('{salt}:', CAST({id_expr} AS VARCHAR))"
            if salt
            else f"CAST({id_expr} AS VARCHAR)"
        )
        h = dd.token_hash_duckdb_sql(v, 7)
    return f"({h} % 10000)"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its sampling
    hash falls under the stratum's threshold.  Narrow (no shuffle, no
    state), reproducible, and exact-in-expectation per stratum — the
    standard shape for language/quality rebalancing of a 100 TB corpus."""
    return df.filter(
        F.expr(
            f"{sample_hash_sql(id_col)}"
            f" < {strata_threshold_case_sql(strata_col, fractions)}"
        )
    )


def strata_threshold_case_sql(
    strata_col: str, fractions: dict[str, float]
) -> str:
    """CASE expression mapping stratum -> hash threshold in [0, 10000];
    shared by the Spark plan and the DuckDB oracle so the two sides can
    never drift.  Keys are single-quote-escaped."""
    cases = " ".join(
        "WHEN {c} = '{k}' THEN {t}".format(
            c=strata_col,
            k=str(k).replace("'", "''"),
            t=int(round(f * 10000)),
        )
        for k, f in fractions.items()
    )
    return f"(CASE {cases} ELSE 0 END)"


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_expr: str | None = None,
) -> DataFrame:
    """Sequential training-sequence packing: docs are sharded by id hash,
    ordered within each shard, and assigned to fixed-budget sequences by
    running token count (seq boundary every ``budget_tokens``).

    Output: (doc_id, shard, seq_id, seq_offset_tokens, n_tokens) where
    seq_id/seq_offset locate the doc's STARTING position in the shard's
    concatenated token stream — concat-and-chop semantics: a doc whose
    offset + n_tokens exceeds the budget straddles into the following
    sequence(s), exactly like sequential-fill packing in LLM data
    pipelines (no padding, no NP-hard bin packing; consumers derive the
    spill from seq_offset_tokens + n_tokens > budget)."""
    from pyspark.sql.window import Window

    # xxhash64 is the fast production shard hash; the oracled query passes
    # the portable md5-based expression instead (DuckDB has no xxhash64)
    shard = shard_expr or f"pmod(xxhash64({id_col}), {n_shards})"
    sharded = df.selectExpr(
        id_col,
        f"{shard} as shard",
        f"cast({tokens_col} as bigint) as n_tokens",
    )
    w = Window.partitionBy("shard").orderBy(id_col)
    cum = sharded.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    return cum.selectExpr(
        id_col,
        "shard",
        f"cum_before div {budget_tokens} as seq_id",
        f"cum_before % {budget_tokens} as seq_offset_tokens",
        "n_tokens",
    )


# ------------------------------------------------- repetition statistics

def repetition_stats(
    df: DataFrame, n: int = 2, id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram repetition statistics — the Gopher-style
    quality rule 'drop documents dominated by a repeated n-gram'
    (machine-generated spam, boilerplate, keyword stuffing).

    Output: (doc_id, total_ngrams, max_ngram_count, rep_ratio) with
    rep_ratio = occurrences of the document's MOST FREQUENT n-gram over
    all its n-grams.  Shape at 100 TB: shingles stay multiplicity-
    preserving (dedup.shingles_exploded), the (doc, ngram) count and the
    per-doc max/sum both partially aggregate map-side and shuffle only
    on doc-id-derived keys — uniform, skew-free, one logical exchange."""
    from ionex_spark.operators.dedup import shingles_exploded

    per_ngram = (
        shingles_exploded(df, id_col, text_col, n=n)
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_ngram.groupBy(id_col).agg(
        F.sum("cnt").alias("total_ngrams"),
        F.max("cnt").alias("max_ngram_count"),
        F.expr(
            "cast(max(cnt) as double) / cast(sum(cnt) as double)"
        ).alias("rep_ratio"),
    )


# -------------------------------------------------- iterative BPE training

def _sql_str(s: str) -> str:
    """Escape a Python string for use inside a Spark SQL '...' literal.

    Backslash FIRST: it is itself the escape character in Spark SQL
    string literals, so a merge symbol containing a backslash (paths are
    plausible winners in real corpora) would otherwise produce a wrong
    or unparseable literal and corrupt the merge fold."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_fold_sql(a: str, b: str, syms_expr: str = "syms") -> str:
    """Greedy left-to-right merge of (a, b) -> ab inside a symbol array,
    as one fold: state = (emitted symbols, pending symbol)."""
    qa, qb = _sql_str(a), _sql_str(b)
    return f"""
aggregate(
  {syms_expr},
  struct(cast(array() as array<string>) as arr,
         cast(null as string) as pend),
  (acc, s) -> case
      when acc.pend is null then struct(acc.arr as arr, s as pend)
      when acc.pend = '{qa}' and s = '{qb}'
        then struct(concat(acc.arr, array('{qa}{qb}')) as arr,
                    cast(null as string) as pend)
      else struct(concat(acc.arr, array(acc.pend)) as arr, s as pend)
    end,
  acc -> case when acc.pend is null then acc.arr
              else concat(acc.arr, array(acc.pend)) end)
"""


def _pairs_interact(p: tuple[str, str], q: tuple[str, str]) -> bool:
    """Whether merging p can change q's count or identity: shared raw
    symbols, or either merged symbol string colliding with the other
    pair's symbols or merged symbol (symbols are plain strings, so
    'a'+'b' IS any existing 'ab')."""
    pa, pb = p
    qa, qb = q
    if {pa, pb} & {qa, qb}:
        return True
    pm, qm = pa + pb, qa + qb
    return pm in (qa, qb) or qm in (pa, pb) or pm == qm


def select_merge_batch(
    ranked: list[tuple[str, str, int]], batch: int
) -> list[tuple[str, str]]:
    """Pick a batch of merges from the (count desc, pair lexical)
    ranking that is provably IDENTICAL to running sequential BPE one
    merge at a time (the exactness the parity test pins):

    take the maximal PREFIX of the ranking that is mutually
    non-interacting, close the batch at any SELF-pair (a == b), then
    keep only pairs whose count is STRICTLY above the count at the
    stopping point.  Proof sketch: at sequential step j every pair
    ranked above p_j is already merged (prefix property); merging
    p_1..p_{j-1} can only decrease other old pairs' counts, and any
    CREATED pair's count is bounded by an interacting old neighbor's
    count <= the stop count < count(p_j) (strictness), so the
    sequential argmax at step j is exactly p_j.  The self-pair rule
    exists because that neighbor bound fails exactly when a selected
    pair interacts with ITSELF: merging (a, a) over a run 'a a a'
    creates (aa, a) whose count is bounded by count(a, a) — the
    selected pair's own count, above any stop — so a self-merge may
    only ever be the batch's final member (found by review: corpus
    'aaa aaa aaa xy' made batch=2 pick (x,y) where sequential picks
    (aa,a)).  The first pick is always safe."""
    if not ranked:
        return []
    selected: list[tuple[str, str]] = [(ranked[0][0], ranked[0][1])]
    stop_n: int | None = None
    if ranked[0][0] == ranked[0][1]:
        stop_n = ranked[1][2] if len(ranked) > 1 else None
    else:
        for i in range(1, len(ranked)):
            a, b, n = ranked[i]
            if len(selected) >= batch or any(
                _pairs_interact((a, b), s) for s in selected
            ):
                stop_n = n
                break
            selected.append((a, b))
            if a == b:  # self-merge closes the batch (see docstring)
                stop_n = ranked[i + 1][2] if i + 1 < len(ranked) else None
                break
    if stop_n is None:
        # every candidate was consumed without a stop: only possible
        # when the collected ranking is the COMPLETE pair universe (the
        # caller's collect limit exceeds the batch, so a truncated
        # window always trips the batch guard first) — nothing exists
        # below the window to bound against
        stop_n = 0
    counts = {(a, b): n for a, b, n in ranked}
    out = [selected[0]]
    for p in selected[1:]:
        if counts[p] > stop_n:
            out.append(p)
        else:
            break
    return out


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch: int = 1,
):
    """Byte-pair-encoding TOKENIZER TRAINING: n_merges rounds of
    (count adjacent symbol pairs -> merge the most frequent pair in the
    vocabulary), the Sennrich et al. 2016 algorithm.

    Scale shape (the reason BPE trains fine on a 100 TB corpus): the
    corpus is touched ONCE to build the (distinct word, frequency)
    table; every merge round after that operates on the vocabulary —
    Heaps-law sublinear in corpus size — with one pair-count rollup and
    one narrow fold per round, plus a bounded driver action to pick the
    winning pair(s) (the connected-components loop pattern).  Ties
    break deterministically (count desc, pair lexical).

    ``batch > 1`` removes the one-Spark-job-per-merge cliff at real
    vocabulary sizes (30k merges = 30k job submissions): each round
    collects the top ranking once and applies every merge in the
    provably-safe batch prefix (select_merge_batch — EXACTLY the
    sequential result, not the classic lossy frequency-threshold
    approximation) as stacked folds in ONE job.  batch=1 is the
    reference path; the parity test pins batched == sequential.

    Returns (merges, vocab_df): the ordered merge list [(a, b), ...]
    and the final vocabulary DataFrame (token, syms array<string>,
    freq)."""
    from pyspark.sql import functions as F

    from ionex_spark.operators.dedup import tokens_exploded

    vocab = (
        tokens_exploded(df, id_col, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .selectExpr(
            "token",
            "transform(sequence(1, length(token)),"
            " i -> substr(token, i, 1)) as syms",
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        # guard: sequence(0, -1) DESCENDS in Spark, so a single-symbol
        # token would index syms[-1] — filter fully-merged words out of
        # the pair scan (they can never contribute a pair again)
        pairs = vocab.filter("size(syms) >= 2").selectExpr(
            "explode(transform(sequence(0, size(syms) - 2),"
            " i -> struct(syms[i] as a, syms[i + 1] as b))) as p",
            "freq",
        )
        want = min(batch, n_merges - len(merges))
        top = (
            pairs.groupBy("p")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "p.a", "p.b")
            .limit(max(2 * want, 16))
            .collect()
        )
        if not top:
            break
        picked = select_merge_batch(
            [(r.p.a, r.p.b, r.n) for r in top], want
        )
        merges.extend(picked)
        expr = "syms"
        for a, b in picked:
            expr = _merge_fold_sql(a, b, expr)
        vocab = vocab.selectExpr(
            "token", f"{expr} as syms", "freq"
        ).localCheckpoint()
    return merges, vocab


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained BPE merge list to a corpus — the INFERENCE side
    of bpe_train: each document becomes its BPE token sequence by
    replaying the merges in training order (greedy left-to-right, the
    standard semantics).

    Shape: one narrow chained projection per merge — K merges = K
    whole-stage-codegen folds over the token arrays, zero shuffles; at
    100 TB the cost is K linear passes per row, embarrassingly
    parallel.  Output: (id_col, bpe_tokens array<string>, n_bpe_tokens).
    """
    # words as char arrays: merges never cross word boundaries because
    # each word keeps its own symbol array
    out = df.selectExpr(
        id_col,
        f"transform(filter(split(lower({ws_norm_sql(text_col)}), ' '),"
        " x -> length(x) > 0),"
        " w -> transform(sequence(1, length(w)), i -> substr(w, i, 1)))"
        " as words",
    )
    for a, b in merges:
        qa, qb = _sql_str(a), _sql_str(b)
        merge = f"""
transform(words, syms -> aggregate(
  syms,
  struct(cast(array() as array<string>) as arr,
         cast(null as string) as pend),
  (acc, s) -> case
      when acc.pend is null then struct(acc.arr as arr, s as pend)
      when acc.pend = '{qa}' and s = '{qb}'
        then struct(concat(acc.arr, array('{qa}{qb}')) as arr,
                    cast(null as string) as pend)
      else struct(concat(acc.arr, array(acc.pend)) as arr, s as pend)
    end,
  acc -> case when acc.pend is null then acc.arr
              else concat(acc.arr, array(acc.pend)) end))
"""
        out = out.selectExpr(id_col, f"{merge} as words")
    return out.selectExpr(
        id_col,
        "flatten(words) as bpe_tokens",
        "size(flatten(words)) as n_bpe_tokens",
    )


# ------------------------------------------------ URL canonicalization

def canonical_url_sql(url: str) -> str:
    """Canonical URL for crawl dedup: lowercase, scheme and www.
    stripped, query string and fragment dropped, trailing slashes
    trimmed — the canonicalization step before URL-level dedup of a
    web crawl (distinct fetches of one resource collapse to one key).
    Standard SQL functions only (lower/replace/split_part/
    regexp_replace), identical spelling in Spark and DuckDB; the
    independent Python-reference fixture pins the semantics."""
    s = f"lower({url})"
    # strip only a LEADING scheme: replace() would also erase a scheme
    # embedded in the path (archive/proxy URLs like
    # 'http://host/web/https://example.com/x'), wrongly collapsing
    # distinct resources (review finding)
    s = (
        f"(case when {s} like 'https://%' then substr({s}, 9)"
        f" when {s} like 'http://%' then substr({s}, 8)"
        f" else {s} end)"
    )
    s = f"split_part(split_part({s}, '?', 1), '#', 1)"
    # LIKE + substr, NOT regexp '^www\.': Spark processes backslash
    # escapes inside string literals while DuckDB does not, so the same
    # regex literal parses to DIFFERENT patterns in the two engines
    # (caught by the cross-engine smoke); LIKE treats '.' literally in
    # both.
    s = f"(case when {s} like 'www.%' then substr({s}, 5) else {s} end)"
    return f"regexp_replace({s}, '/+$', '')"


def sample_topk_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic K examples per group — eval-set / few-shot /
    inspection sampling: rank rows inside each group by the portable
    sampling hash (then id) and keep the first k.  Unlike
    `TABLESAMPLE`/rand(), the selection is reproducible across engines,
    reruns, and partitionings, and adding rows to OTHER groups never
    changes a group's picks.

    Scale: one window per group.  If a group can be huge, pre-filter
    with `sample_hash < t` for t ~ 3*k*1e4/|group| first so the sort
    sees O(k) candidates — the window itself is the correct final
    tie-break either way.  Output: input columns + sample_rank
    (1-based)."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(group_col).orderBy(
        F.expr(sample_hash_sql(id_col, salt="topk")), id_col
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def boilerplate_ngram_stats(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CROSS-document boilerplate measure (the C4/Gopher-style 'drop
    docs dominated by text that appears everywhere'): an n-gram is
    boilerplate when it occurs in >= ``min_docs`` distinct documents;
    each doc reports the fraction of its n-gram slots covered by
    boilerplate.  Complements repetition_ngrams (WITHIN-doc loops) and
    containment (pairwise overlap) — this catches site templates and
    license headers shared by thousands of docs.

    Shape: shingle explode -> distinct per doc -> document-frequency
    aggregate -> join back -> per-doc rollup.  Two shuffles keyed on
    the shingle, both map-side combining; never pairwise.  Output:
    (id, n_ngrams, n_boilerplate, boilerplate_frac)."""
    from pyspark.sql import functions as F

    from ionex_spark.operators.dedup import shingles_exploded

    sh = shingles_exploded(df, id_col, text_col, n=n).dropDuplicates(
        [id_col, "token"]
    )
    dfreq = sh.groupBy("token").agg(
        F.count(F.lit(1)).alias("_df")
    )
    tagged = sh.join(dfreq, "token").selectExpr(
        id_col,
        f"cast(_df >= {min_docs} as int) as _hot",
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.expr("cast(sum(_hot) as bigint)").alias("n_boilerplate"),
        F.expr(
            "cast(sum(_hot) as double) / cast(count(1) as double)"
        ).alias("boilerplate_frac"),
    )
