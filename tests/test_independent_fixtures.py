"""Independent evidence for shared-fragment query families.

The bit-exact gate has a structural blind spot (the round-3 median
lesson): engine and oracle often share the value-producing expression
text (ionex_spark.functions.sqlgen / the md5 hash twins), so a bug in
the shared fragment passes the gate on both sides.  Each test here
recomputes a family's semantics from the SPEC in plain Python/numpy —
never importing the shared fragment builders for the expected values —
so a fragment bug breaks these even when the gate stays green.
tests/test_evidence_manifest.py maps every registered query to its
independent evidence and fails on uncovered families.
"""

import hashlib
import re

import numpy as np
import pytest

MOD = 1_000_000_007


def _py_tokens(text: str) -> list[str]:
    # engine spec: tab/LF/CR normalized to spaces, split, drop empties
    return [t for t in re.split("[ \t\n\r]+", text) if t]


def _py_md5_60bit(seed: int, token: str) -> int:
    return int(hashlib.md5(f"{seed}:{token}".encode()).hexdigest()[:15], 16)


# ------------------------------------------------------- rolling hash

def test_rolling_hash_hand_computed(spark):
    """h = fold(h*31 + ascii(c)) mod 1e9+7, recomputed in plain Python
    ints — the Spark aggregate() and DuckDB list_reduce spellings must
    both equal this."""
    import duckdb

    from ionex_spark.operators import text as tx

    samples = ["", "a", "ab", "The quick brown fox.", "ÿ" ]

    def ref(s):
        h = 0
        for c in s:
            h = (h * 31 + ord(c)) % MOD
        return h

    # hand-check the formula on 'ab' literally: (0*31+97)*31+98
    assert ref("ab") == 97 * 31 + 98

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "i bigint, s string"
    )
    got = (
        df.selectExpr("i", f"{tx.rolling_hash_sql('s', 'spark')} as h")
        .toPandas()
        .set_index("i")["h"]
    )
    for i, s in enumerate(samples):
        assert got.loc[i] == ref(s), s

    con = duckdb.connect()
    for s in samples:
        (dh,) = con.execute(
            "SELECT "
            + tx.rolling_hash_sql("v", "duckdb")
            + " FROM (SELECT ? AS v)",
            [s],
        ).fetchone()
        assert (dh or 0) == ref(s), s


# ------------------------------------------------ text feature kernels

def test_text_features_python_reference(spark):
    """occ counts, language id, quality score, md5 fingerprint, token
    counts — all recomputed with hashlib/plain Python from the spec."""
    from ionex_spark.operators.text import with_text_features

    docs = [
        (1, "the cat and the dog of the house"),          # en x3 markers
        (2, "le chat et la mer et le ciel"),              # fr
        (3, "der hund und die katze und der vogel"),      # de
        (4, "x" * 600 + ". . ."),                         # long + dots
        (5, "tiny"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = with_text_features(df).toPandas().set_index("doc_id")

    markers = {
        "en": (" the ", " and ", " of "),
        "fr": (" le ", " la ", " et "),
        "de": (" der ", " und ", " die "),
        "es": (" el ", " de ", " que "),
    }

    for doc_id, text in docs:
        # token count
        assert got.loc[doc_id, "n_tokens"] == len(_py_tokens(text)), doc_id
        # lang id: occurrence counts of markers in lower(text),
        # argmax with en > fr > de > es tie order
        low = text.lower()
        scores = {
            lang: sum(low.count(m) for m in ms)
            for lang, ms in markers.items()
        }
        best = max(scores.values())
        pred = next(k for k in ("en", "fr", "de", "es") if scores[k] == best)
        assert got.loc[doc_id, "lang_pred"] == pred, doc_id
        # quality: min(len/500, 1) * (1 - min(dots/(spaces+1), 1))
        want_q = min(len(text) / 500.0, 1.0) * (
            1.0 - min(text.count(".") / (text.count(" ") + 1.0), 1.0)
        )
        assert got.loc[doc_id, "quality"] == pytest.approx(want_q, abs=0),\
            doc_id
        # fingerprint: md5(lower(head 256) + '#' + len) first 16 hex
        want_fp = hashlib.md5(
            (low[:256] + "#" + str(len(text))).encode()
        ).hexdigest()[:16]
        assert got.loc[doc_id, "fingerprint"] == want_fp, doc_id


# ------------------------------------------------- stratified sampling

def test_stratified_sample_python_reference(spark):
    """Membership = md5-60bit('7:' + str(id)) % 10000 < threshold,
    recomputed with hashlib — the engine's conv(substr(md5)) chain must
    pick exactly this subset."""
    from ionex_spark.operators.text import stratified_sample

    fractions = {"en": 0.5, "fr": 0.1}
    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "fr") for i in range(400)],
        "doc_id bigint, lang string",
    )
    got = set(
        r.doc_id
        for r in stratified_sample(df, "lang", fractions).collect()
    )
    want = set()
    for i in range(400):
        lang = "en" if i % 2 == 0 else "fr"
        thr = int(round(fractions[lang] * 10000))
        if _py_md5_60bit(7, str(i)) % 10000 < thr:
            want.add(i)
    assert got == want
    assert 0 < len(want) < 400  # both strata actually sampled


# ------------------------------------------------- sequence packing

def test_pack_sequences_python_reference(spark):
    """concat-and-chop packing recomputed in Python: within each shard,
    docs in id order, seq_id = cum_before // budget, offset = cum_before
    % budget."""
    from ionex_spark.operators.text import pack_sequences

    rows = [(i, (i * 37) % 190 + 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
    got = (
        pack_sequences(
            df, budget_tokens=128, n_shards=4, shard_expr="doc_id % 4"
        )
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    shard_docs: dict[int, list[tuple[int, int]]] = {}
    for i, n in rows:
        shard_docs.setdefault(i % 4, []).append((i, n))
    for shard, docs in shard_docs.items():
        cum = 0
        for i, n in sorted(docs):
            assert got.loc[i, "shard"] == shard
            assert got.loc[i, "seq_id"] == cum // 128, i
            assert got.loc[i, "seq_offset_tokens"] == cum % 128, i
            assert got.loc[i, "n_tokens"] == n
            cum += n


# ------------------------------------------------------------- tf-idf

def test_tfidf_hand_computed(spark, tmp_path):
    """Rational idf = (n_docs+1)/(df+1), score = tf * idf, top-3 per doc
    with (score desc, token asc) tie-break — expected rows written
    literally from a hand calculation."""
    from ionex_spark.plans.queries_data import tfidf_top_terms

    docs = [
        (1, "apple apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry dates dates dates apple"),
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r.doc_id, r.rank): (r.token, r.tf, r.doc_freq, r.score)
        for r in tfidf_top_terms(spark, str(tmp_path)).collect()
    }
    # n_docs = 3 -> idf = 4/(df+1)
    # doc 1: apple tf3 df2 -> 3*4/3 = 4.0 ; banana tf1 df2 -> 4/3
    assert got[(1, 1)] == ("apple", 3, 2, 4.0)
    assert got[(1, 2)] == ("banana", 1, 2, pytest.approx(4 / 3, abs=0))
    # doc 2: banana 1*4/3, cherry 1*4/3 -> tie, token asc: banana first
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"
    assert got[(2, 1)][3] == got[(2, 2)][3] == pytest.approx(4 / 3, abs=0)
    # doc 3: dates tf3 df1 -> 3*2=6 ; cherry tf2 df2 -> 2*4/3=8/3 ;
    #        apple tf1 df2 -> 4/3
    assert got[(3, 1)] == ("dates", 3, 1, 6.0)
    assert got[(3, 2)] == ("cherry", 2, 2, pytest.approx(8 / 3, abs=0))
    assert got[(3, 3)] == ("apple", 1, 2, pytest.approx(4 / 3, abs=0))
    assert len(got) == 7  # doc 2 has only 2 terms


# ------------------------------------------------------- token drift

def test_token_drift_hand_computed(spark, tmp_path):
    """drift_num = |c_old*T_new - c_new*T_old| recomputed with Python
    ints on a corpus where the halves differ by construction."""
    from ionex_spark.plans.queries_data import token_drift_top

    docs = [
        (0, "aa aa bb"),        # old half (even ids)
        (2, "aa cc"),
        (1, "bb bb bb dd"),     # new half (odd ids)
        (3, "cc dd"),
    ]
    spark.createDataFrame(docs, "doc_id bigint, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r.token: (r.c_old, r.c_new, r.drift_num)
        for r in token_drift_top(spark, str(tmp_path)).collect()
    }
    old_counts = {"aa": 3, "bb": 1, "cc": 1}
    new_counts = {"bb": 3, "dd": 2, "cc": 1}
    t_old, t_new = 5, 6
    for tok in {*old_counts, *new_counts}:
        c_o, c_n = old_counts.get(tok, 0), new_counts.get(tok, 0)
        assert got[tok] == (c_o, c_n, abs(c_o * t_new - c_n * t_old)), tok
    assert len(got) == 4


# -------------------------------------------- histogram quantile sketch

def test_histogram_quantiles_hand_computed(spark):
    """Bin counts and quantile boundaries recomputed by hand: values
    [0.1, 0.3, 0.6, 0.9, 2.0] at width 0.5 -> bins [0,0,1,1,4];
    p50 -> first bin with cum >= ceil(0.5*5)=3 -> bin 1 -> 0.5;
    p99 -> cum >= 5 -> bin 4 -> 2.0."""
    from ionex_spark.operators import sketch as sk

    df = spark.createDataFrame(
        [("a", v) for v in (0.1, 0.3, 0.6, 0.9, 2.0)],
        "g string, v double",
    )
    bins = sk.histogram_bins(df, ["g"], "v", 0.5)
    got_bins = {
        (r.g, r.bin): r.n for r in bins.collect()
    }
    assert got_bins == {("a", 0): 2, ("a", 1): 2, ("a", 4): 1}
    q = sk.histogram_quantiles(bins, ["g"], 0.5, [0.5, 0.99]).collect()[0]
    assert q.q_0_5 == 0.5
    assert q.q_0_99 == 2.0
    assert q.total_n == 5

    # mergeability: two half-histograms bit_sum to the full one
    h1 = sk.histogram_bins(df.limit(3), ["g"], "v", 0.5)
    h2 = sk.histogram_bins(
        spark.createDataFrame([("a", 0.9), ("a", 2.0)], "g string, v double"),
        ["g"], "v", 0.5,
    )
    merged = (
        h1.unionByName(h2).groupBy("g", "bin").sum("n")
        .withColumnRenamed("sum(n)", "n")
    )
    assert {(r.g, r.bin): r.n for r in merged.collect()} == got_bins


# ------------------------------------------------ URL canonicalization

def test_canonical_url_python_reference(spark):
    """Canonicalization semantics recomputed with plain Python string
    ops — lowercase, scheme strip, query/fragment drop, www. strip,
    trailing-slash trim — including the non-stripping wwwx edge."""
    from ionex_spark.operators.text import canonical_url_sql

    def ref(u: str) -> str:
        s = u.lower()
        for p in ("https://", "http://"):
            if s.startswith(p):
                s = s[len(p):]
                break
        s = s.split("?", 1)[0].split("#", 1)[0]
        if s.startswith("www."):
            s = s[4:]
        return s.rstrip("/")

    urls = [
        "https://www.Example.COM/p/7",
        "HTTP://EXAMPLE.com/p/7/",
        "https://example.com/p/7?utm_source=x&ref=1",
        "http://www.example.com/p/7/#frag",
        "https://wwwx.com/a",          # www. must NOT strip here
        "https://example.com///",      # all trailing slashes trim
        "http://a.b/c?x=1#y",
        # scheme embedded in the PATH must survive (archive/proxy URLs
        # are distinct resources — review finding)
        "http://web.archive.org/web/2020/https://example.com/x",
        "http://web.archive.org/web/2020/example.com/x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [
        r.c
        for r in df.selectExpr(
            f"{canonical_url_sql('u')} as c"
        ).collect()
    ]
    assert got == [ref(u) for u in urls]


# ------------------------------------- per-tile representative argmin

def test_tile_representative_hand_computed(spark):
    """Packed-bigint argmin equals the hand argmin of (score, id),
    including a score tie broken by smaller id."""
    from ionex_spark.operators.tiles import tile_representative

    rows = [
        (10, 1, 50), (10, 2, 30), (10, 3, 30),   # tie on 30 -> id 2
        (20, 7, 99),                              # singleton
    ]
    df = spark.createDataFrame(rows, "tile bigint, id bigint, score bigint")
    got = (
        tile_representative(df, "tile", "id", "score")
        .toPandas()
        .set_index("tile")
        .sort_index()
    )
    assert got.loc[10, "n_rows"] == 3
    assert got.loc[10, "rep_id"] == 2 and got.loc[10, "rep_score"] == 30
    assert got.loc[20, "rep_id"] == 7 and got.loc[20, "rep_score"] == 99


# --------------------------------------------------- integer PageRank

def test_pagerank_int_python_reference(spark):
    """The integer power-iteration recurrence recomputed in plain
    Python dicts on a hub-and-chain graph, including dangling nodes
    and an isolated node."""
    from ionex_spark.operators.graph import pagerank_int

    edges = [(0, 1), (1, 2), (2, 0), (3, 1), (3, 2), (5, 0)]
    # node 4 isolated; node 5 sources but nothing points at it
    nodes = list(range(6))
    nd = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    ed = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.node: r.rank
        for r in pagerank_int(nd, ed, n_iter=4, init_rank=1_000_000).collect()
    }

    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    base = (150_000 * 1_000_000) // 1_000_000
    for _ in range(4):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        r = {n: base + (850_000 * contrib[n]) // 1_000_000 for n in nodes}
    assert got == r
    # isolated + unpointed nodes sit at exactly the base rank
    assert got[4] == base and got[5] == base
    # the cycle members accumulate the hub's mass: all above base
    assert min(got[0], got[1], got[2]) > base


def test_pagerank_int_duplicate_and_self_edges_ignored(spark):
    """Self-loops and duplicate edges must not change the result."""
    from ionex_spark.operators.graph import pagerank_int

    nd = spark.createDataFrame([(n,) for n in range(3)], "node bigint")
    clean = spark.createDataFrame([(0, 1), (1, 2)], "src bigint, dst bigint")
    dirty = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 2), (2, 2), (1, 1)], "src bigint, dst bigint"
    )
    a = {r.node: r.rank for r in pagerank_int(nd, clean, n_iter=3).collect()}
    b = {r.node: r.rank for r in pagerank_int(nd, dirty, n_iter=3).collect()}
    assert a == b


def test_tile_representative_rejects_out_of_domain(spark):
    """Negative scores/ids (e.g. raw signed hashes) must raise, not
    silently unpack into garbage representatives."""
    from pyspark.errors.exceptions.base import PySparkException

    from ionex_spark.operators.tiles import tile_representative

    bad = spark.createDataFrame(
        [(1, 5, -1)], "tile bigint, id bigint, score bigint"
    )
    with pytest.raises(PySparkException, match="tile_representative"):
        tile_representative(bad, "tile", "id", "score").collect()


def test_tile_representative_ignores_null_rows(spark):
    """NULL score/id rows never win (or abort) the argmin; an all-null
    tile yields NULL rep columns."""
    from ionex_spark.operators.tiles import tile_representative

    df = spark.createDataFrame(
        [(1, 5, 30), (1, 6, None), (2, 7, None)],
        "tile bigint, id bigint, score bigint",
    )
    got = (
        tile_representative(df, "tile", "id", "score")
        .toPandas()
        .set_index("tile")
        .sort_index()
    )
    assert got.loc[1, "rep_id"] == 5 and got.loc[1, "rep_score"] == 30
    assert got.loc[1, "n_rows"] == 2
    import pandas as pd

    assert pd.isna(got.loc[2, "rep_id"]) and pd.isna(got.loc[2, "rep_score"])


def test_pagerank_int_overflow_guard(spark):
    """ADVICE r5: the int64 bound is n_nodes * init_rank * damping_ppm
    < 2^63 (star graphs funnel ~all mass into one node's contrib) —
    exceeding it must raise, not wrap silently."""
    import pytest as _pytest

    from ionex_spark.operators.graph import pagerank_int

    nd = spark.createDataFrame([(n,) for n in range(4)], "node bigint")
    ed = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src bigint, dst bigint")
    with _pytest.raises(ValueError, match="overflow"):
        pagerank_int(nd, ed, n_iter=1, init_rank=2**62)
    # just under the bound still runs
    ok = pagerank_int(nd, ed, n_iter=1,
                      init_rank=(2**63 - 1) // 1_000_000 // 4)
    assert ok.count() == 4


def test_pagerank_int_dangling_redistribution_python_reference(spark):
    """redistribute_dangling=True recomputed in plain Python dicts:
    dangling mass (nodes 3 has out-edges; 4 isolated and 6 dangling)
    re-added as dmass // n before damping; mass conserved up to
    integer-division dust."""
    from ionex_spark.operators.graph import pagerank_int

    edges = [(0, 1), (1, 2), (2, 0), (3, 1), (3, 2), (5, 0)]
    nodes = list(range(7))  # 4 isolated, 6 dangling (5 -> 0 only src)
    nd = spark.createDataFrame([(n,) for n in nodes], "node bigint")
    ed = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.node: r.rank
        for r in pagerank_int(
            nd, ed, n_iter=4, init_rank=1_000_000,
            redistribute_dangling=True,
        ).collect()
    }

    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    r = {x: 1_000_000 for x in nodes}
    base = (150_000 * 1_000_000) // 1_000_000
    for _ in range(4):
        contrib = {x: 0 for x in nodes}
        for s, d in edges:
            contrib[d] += r[s] // outdeg[s]
        dmass = sum(r[x] for x in nodes if x not in outdeg)
        dshare = dmass // n
        r = {
            x: base + (850_000 * (contrib[x] + dshare)) // 1_000_000
            for x in nodes
        }
    assert got == r
    # conservation: per round the loss is bounded by damping of the
    # div dust, far tighter than the dropped-mass default
    total0 = n * 1_000_000
    assert total0 - sum(got.values()) < 4 * (n * 1_000_000) // 100
    # and strictly more mass retained than the dropping default
    drop = {
        row.node: row.rank
        for row in pagerank_int(nd, ed, n_iter=4, init_rank=1_000_000).collect()
    }
    assert sum(got.values()) > sum(drop.values())
