"""Pin the staleness-rotating query registry (round-4 verdict task #1).

The round driver's oracle gate checks only the FIRST 50 entries of
__spark_entry__.queries() in iteration order.  Since round 5 the
ordering is staleness-dominant: after the explicit priority-100 block
(new/changed work), entries sort by the age of their last green driver
row (ionex_spark/plans/gate_history.json, regenerated from the driver's
own CORRECTNESS_r*.json — self-healing since round 6).  These tests pin
the rotation invariant — no oracled query may go beyond its staleness
budget (2 rounds, or 3 once deeply verified with >= DEEP_EVIDENCE green
rounds) without a green driver row — so a future registration can't
silently push risky work outside the gate again.
"""

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

GATE_CAP = 50
REPO = "/root/repo"

# queries that are NEW or materially CHANGED this round: they must be
# registered at priority 100 so the driver gate sees them regardless of
# rotation state.  Update each round.
NEW_THIS_ROUND = {
    "corpus_mixture_sample",
    "shard_manifest_rollup",
    "shard_bytes_manifest",
    "dedup_group_representatives",
    "incremental_dedup_bloom",
    "mixture_quality_curriculum",
    "patch_pack_sequences",
    "group_sample_topk",
    "boilerplate_ngram_stats",
    "embedding_label_centroids",
    "contamination_safe_split",
    "dedup_containment_capped",
    "patch_extract_stats",
    "streaming_histogram_batch",
    "knn_points_adaptive",
    "domain_pagerank_dangling",
    "knn_points_metrics",  # denominator fix (ADVICE r5) changes semantics
}


def _entry():
    import __spark_entry__ as m

    return m

def _registry():
    from ionex_spark.plans import queries as q

    return q


def test_gate_history_is_fresh():
    """gate_history() must cover every CORRECTNESS file on disk — since
    round 6 it self-heals by regenerating from the driver files, so this
    can only fail if the self-healing path itself breaks."""
    q = _registry()
    latest_on_disk = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m:
            latest_on_disk = max(latest_on_disk, int(m.group(1)))
    assert q.gate_history()["latest_round"] == latest_on_disk, (
        "gate_history self-healing failed — check queries.gate_history()"
    )


def test_gate_history_matches_regeneration():
    """The served history is exactly what the generator produces."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_gate_history

    assert gen_gate_history.build() == _registry().gate_history()


def test_gate_history_self_heals_from_stale_commit(tmp_path):
    """Round-5 verdict task #1: a driver CORRECTNESS write after the
    builder's last commit must NOT strand a stale committed JSON.  Write
    a deliberately stale JSON, call gate_history(), and require both the
    in-memory result and the re-written file to be fresh."""
    q = _registry()
    fresh = q.build_history(REPO)
    stale = {"latest_round": fresh["latest_round"] - 1, "rounds": {}}
    with open(q._HISTORY_PATH, "w") as f:
        json.dump(stale, f)
    try:
        served = q.gate_history()
        assert served == fresh
        with open(q._HISTORY_PATH) as f:
            assert json.load(f) == fresh
    finally:  # restore the canonical file regardless
        with open(q._HISTORY_PATH, "w") as f:
            json.dump(fresh, f, indent=1, sort_keys=True)
            f.write("\n")


def test_gate_history_survives_corrupt_commit():
    """A corrupt/truncated committed JSON (bad merge) must not crash the
    registry (ADVICE r5): gate_history() falls back / regenerates."""
    q = _registry()
    fresh = q.build_history(REPO)
    with open(q._HISTORY_PATH, "w") as f:
        f.write("{truncated")
    try:
        assert q.gate_history() == fresh
    finally:
        with open(q._HISTORY_PATH, "w") as f:
            json.dump(fresh, f, indent=1, sort_keys=True)
            f.write("\n")


def test_no_oracled_query_stale_beyond_budget():
    """THE rotation invariant: every oracled query at or beyond its
    staleness budget (2 rounds; 3 for deeply verified entries — see
    queries.max_staleness) must be inside the first-GATE_CAP window this
    round, so the driver re-greens it now."""
    q = _registry()
    names = list(_entry().queries())
    window = set(names[:GATE_CAP])
    hist = q.gate_history()
    cur = q.current_round()
    due = [
        n
        for n in names
        if n in q.ORACLES
        and (q.last_driver_round(n, hist) == 0
             or cur - q.last_driver_round(n, hist) >= q.max_staleness(n, hist))
    ]
    missing = set(due) - window
    assert not missing, (
        f"due queries outside the {GATE_CAP}-entry gate window: {missing};"
        " demote multiply-verified entries or shrink this round's"
        " priority-100 block"
    )


def test_new_work_is_priority_100_and_inside_window():
    q = _registry()
    names = list(_entry().queries())
    window = set(names[:GATE_CAP])
    for n in NEW_THIS_ROUND:
        if n not in q.QUERIES:
            continue  # not landed yet (test stays green mid-build)
        assert q.PRIORITY[n] >= 100, f"{n} is new this round: register priority=100"
        assert n in window, f"{n} fell outside the gate window"


def test_priority_100_block_leads_and_is_small():
    """The explicit new-work block sorts first and must stay small
    enough (< GATE_CAP - due count head-room) that rotation still
    covers every due query.  A 100-entry left green by a past round
    should be demoted to 50."""
    q = _registry()
    names = list(_entry().queries())
    hundreds = [n for n in names if q.PRIORITY[n] >= 100]
    hist = q.gate_history()
    assert names[: len(hundreds)] == sorted(
        hundreds,
        key=lambda n: (
            q.last_driver_round(n, hist),
            q.evidence_depth(n, hist),
            -q.PRIORITY[n],
            n,
        ),
    )
    for n in hundreds:
        assert q.last_driver_round(n, hist) < q.current_round() - 1 or (
            n in NEW_THIS_ROUND
        ), f"{n} is priority 100 but already has fresh driver evidence — demote to 50"


def test_oracles_subset_of_queries_and_ordering_matches():
    m = _entry()
    qs, os_ = m.queries(), m.oracle_sql()
    assert set(os_) <= set(qs)
    # oracle iteration order mirrors queries order (driver zips them)
    q_order = [n for n in qs if n in os_]
    assert list(os_) == q_order


def test_ordering_is_import_order_independent():
    """Importing queries_ref BEFORE queries_data must not change the
    emitted order (the bug this guards: registration order depends on
    which consumer imports first; the sort key never uses registration
    position)."""
    import subprocess
    import sys as _sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from ionex_spark.plans import queries_ref  # ref FIRST\n"
        "import __spark_entry__ as m\n"
        "print('\\n'.join(m.queries()))\n"
    )
    out = subprocess.run(
        [_sys.executable, "-c", code], capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.split() == list(_entry().queries())


def test_rotation_would_cover_everything_next_round():
    """Simulate: if the driver greens this round's window, does next
    round's window have capacity for everything that would then be due?
    Guards against registry growth outpacing rotation capacity (round-5
    verdict task #9: projected revisit gap must not exceed the tier
    budget)."""
    q = _registry()
    names = list(_entry().queries())
    window = set(names[:GATE_CAP])
    hist = q.gate_history()
    cur = q.current_round()
    # after this round: windowed queries get last=cur, others keep last;
    # windowed queries also gain one round of evidence depth
    nxt_last = {
        n: (cur if n in window else q.last_driver_round(n, hist))
        for n in names
    }
    nxt_depth = {
        n: q.evidence_depth(n, hist) + (1 if n in window else 0)
        for n in names
    }
    due_next = [
        n for n in names
        if n in q.ORACLES
        and (nxt_last[n] == 0
             or (cur + 1) - nxt_last[n]
             >= (3 if nxt_depth[n] >= q.DEEP_EVIDENCE else 2))
    ]
    assert len(due_next) <= GATE_CAP, (
        f"{len(due_next)} queries would be due next round — registry"
        f" has outgrown rotation capacity at cap {GATE_CAP}"
    )
