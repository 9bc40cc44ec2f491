"""Pin the priority-ordered query registry (round-3 verdict finding #1).

The round driver's oracle gate checks only the FIRST 50 entries of
__spark_entry__.queries() in iteration order.  register() carries a
priority tag and __spark_entry__ sorts by (priority desc, registration
order); this test pins the invariants so a future registration can't
silently push risky work outside the gate again.
"""

import sys

sys.path.insert(0, "/root/repo")

GATE_CAP = 50

# every query that MUST have driver-gate evidence: the 13 that fell
# outside the r3 window + this round's new/changed rows
RISKY = {
    "sessionize_events", "windowed_event_counts", "skew_salted_rollup",
    "tile_kring_counts", "cell_geodesic_metrics", "ipp_slant",
    "grid_3x3_mean", "grid_resample", "range_join_windows",
    "median_value_by_type", "asof_irregular", "temporal_interp_irregular",
    "knn_points", "dedup_simhash_pairs", "dedup_simhash_pairs_bands",
    "streaming_neardup_batch", "streaming_dedup_batch",
    # round-4 operators
    "decontam_bench_overlap", "repetition_ngrams", "tile_polyfill",
    "radius_search_sites", "gap_fill_epochs", "zorder_blocks",
    "tile_compact", "distinct_users_kmv", "user_tracks",
    "tile_coverage_gaps", "ionex_file_bilinear",
    "quartiles_value_by_type", "snapshot_diff_events",
    "attribution_interval_join",
}

# the flagship + §2 core operators the VERDICT coverage table cites as
# driver evidence — these must stay inside the gate too.  (dedup_groups
# is deliberately absent: demoted to priority 10 because
# dedup_groups_star shares its oracle and stays gated.)
CORE = {
    "tile_bilinear", "temporal_interp", "cell_rollup", "knn_grid",
    "pip_polygons", "roi_filter", "grid_cells_join", "grid_merge",
    "dedup_exact", "dedup_minhash_pairs",
    "dedup_groups_star", "similarity_topk", "similarity_ivf",
    "bucketed_join_rollup",
}


def _entry():
    import __spark_entry__ as m

    return m


def test_risky_queries_inside_gate_window():
    names = list(_entry().queries())
    first = set(names[:GATE_CAP])
    missing = (RISKY | CORE) - first
    assert not missing, f"queries outside the {GATE_CAP}-entry gate: {missing}"


def test_priority_ordering_is_monotone():
    from ionex_spark.plans import queries as q

    names = list(_entry().queries())
    prios = [q.PRIORITY[n] for n in names]
    assert prios == sorted(prios, reverse=True)
    # risky entries are priority 100 — the top block
    for n in RISKY:
        assert q.PRIORITY[n] == 100, n


def test_only_trivial_entries_can_drop_out():
    """Everything past the cap must be explicitly priority-10 (trivial,
    long-stable, pytest-covered elsewhere) — never a default-priority
    query someone forgot to think about."""
    from ionex_spark.plans import queries as q

    names = list(_entry().queries())
    for n in names[GATE_CAP:]:
        assert q.PRIORITY[n] == 10, (
            f"{n} (priority {q.PRIORITY[n]}) falls outside the gate window;"
            " either demote it explicitly or raise another entry's priority"
        )


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
    which consumer imports first; the sort key is now (priority, name),
    never registration position)."""
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
