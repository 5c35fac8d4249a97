"""Driver-contract invariants (no Spark session needed).

The driver grades every ``queries()`` entry against ``oracle_sql()``; a
query silently missing its oracle gets only the weaker rows-only check.
This locks the registry: every query must either carry an oracle or be on
the EXPLICIT rows-only allowlist (each with a documented reason), so new
operators can't drift in unchecked.
"""

from __future__ import annotations

# Queries deliberately without a DuckDB oracle — each needs a reason.
ROWS_ONLY_ALLOWLIST = {
    # HLL sketches differ by engine — approx count is engine-specific
    "approx_distinct",
    # ANN with recall < 1 by design (bucketed LSH + IVF probing, merged)
    "knn_ann",
    # synthesized input (pages generator) — no shared table for DuckDB
    "pages_pipeline_top10",
    # mapInPandas feature extraction over synthesized binary payloads
    "multimodal_features",
}


def test_registry_is_exactly_driver_window_sized():
    """The driver checks the first ~50 entries in dict order; a registry
    larger than that silently drops queries from the correctness gate
    (round-2 lesson: 9 of 59 never got a row)."""
    from linkgraph.driver_queries import QUERIES

    assert len(QUERIES) == 50, f"registry must stay at 50 entries, got {len(QUERIES)}"


def test_every_query_is_oracled_or_allowlisted():
    from linkgraph.driver_queries import ORACLE_SQL, QUERIES

    missing = set(QUERIES) - set(ORACLE_SQL) - ROWS_ONLY_ALLOWLIST
    assert not missing, (
        f"queries without oracle_sql and not allowlisted: {sorted(missing)}"
    )
    stale = ROWS_ONLY_ALLOWLIST - set(QUERIES)
    assert not stale, f"allowlist entries no longer registered: {sorted(stale)}"
    oracled_anyway = ROWS_ONLY_ALLOWLIST & set(ORACLE_SQL)
    assert not oracled_anyway, (
        f"allowlisted queries now HAVE oracles — drop them from the "
        f"allowlist: {sorted(oracled_anyway)}"
    )


def test_oracle_sql_has_no_orphans():
    from linkgraph.driver_queries import ORACLE_SQL, QUERIES

    orphans = set(ORACLE_SQL) - set(QUERIES)
    assert not orphans, f"oracle_sql for unregistered queries: {sorted(orphans)}"


def test_entry_module_exposes_contract():
    import __spark_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    assert len(q) >= 50 and set(o) <= set(q)
