"""Pin the staleness-rotating query registry (round-4 verdict task #1).

The round driver's oracle gate checks only the FIRST 50 entries of
__spark_entry__.queries() in iteration order.  Since round 5 the
ordering is staleness-dominant: after the explicit priority-100 block
(new/changed work), entries sort by the age of their last green driver
row (ionex_spark/plans/gate_history.json, regenerated from the driver's
own CORRECTNESS_r*.json by tools/gen_gate_history.py).  These tests pin
the rotation invariant — no oracled query may go >= 2 rounds without a
green driver row — so a future registration can't silently push risky
work outside the gate again.
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
    "alt_interp_trilinear",
    "skew_salted_join",
    "compacted_snapshot_rollup",
    "schema_evolution_rollup",
    "knn_points_metrics",
    "histogram_quantiles_value",
    "url_dedup_canonical",
    "tile_representative_image",
    "domain_pagerank",
    "dedup_containment_pairs",
}


def _entry():
    import __spark_entry__ as m

    return m


def _registry():
    from ionex_spark.plans import queries as q

    return q


def test_gate_history_is_fresh():
    """gate_history.json must cover every CORRECTNESS file on disk —
    a stale history would mis-rotate the window next round."""
    q = _registry()
    latest_on_disk = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", path)
        if m:
            latest_on_disk = max(latest_on_disk, int(m.group(1)))
    assert q.gate_history()["latest_round"] == latest_on_disk, (
        "gate_history.json is stale — run python tools/gen_gate_history.py"
    )


def test_gate_history_matches_regeneration():
    """The committed JSON is exactly what the generator produces."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import gen_gate_history

    assert gen_gate_history.build() == _registry().gate_history()


def test_no_oracled_query_stale_beyond_two_rounds():
    """THE rotation invariant: every oracled query whose last green
    driver row is >= 2 rounds old (or that never had one) must be inside
    the first-GATE_CAP window this round."""
    q = _registry()
    names = list(_entry().queries())
    window = set(names[:GATE_CAP])
    hist = q.gate_history()
    cur = q.current_round()
    stale = [
        n
        for n in names
        if n in q.ORACLES
        and (q.last_driver_round(n, hist) == 0
             or cur - q.last_driver_round(n, hist) >= 2)
    ]
    missing = set(stale) - window
    assert not missing, (
        f"stale queries outside the {GATE_CAP}-entry gate window: {missing};"
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
    enough (< GATE_CAP - stale count head-room) that rotation still
    covers every stale query.  A 100-entry left green by a past round
    should be demoted to 50."""
    q = _registry()
    names = list(_entry().queries())
    hundreds = [n for n in names if q.PRIORITY[n] >= 100]
    assert names[: len(hundreds)] == sorted(
        hundreds,
        key=lambda n: (q.last_driver_round(n), -q.PRIORITY[n], n),
    )
    hist = q.gate_history()
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


def test_rotation_would_cover_everything_in_two_rounds():
    """Simulate: if the driver greens this round's window, does next
    round's window cover everything that would then be stale?  Guards
    against registry growth outpacing 2-round rotation capacity."""
    q = _registry()
    names = list(_entry().queries())
    window = set(names[:GATE_CAP])
    hist = q.gate_history()
    cur = q.current_round()
    # after this round: windowed queries get last=cur, others keep last
    nxt = {
        n: (cur if n in window else q.last_driver_round(n, hist))
        for n in names
    }
    stale_next = [n for n in names if n in q.ORACLES and (
        nxt[n] == 0 or (cur + 1) - nxt[n] >= 2)]
    assert len(stale_next) <= GATE_CAP, (
        f"{len(stale_next)} queries would be stale next round — registry"
        f" has outgrown 2-round rotation at cap {GATE_CAP}"
    )
