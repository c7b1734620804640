"""Registry-vs-oracle drift guard (round-3 verdict item 7): the
correctness gate's strength is the oracle coverage ratio, so every
query that COULD have an exact DuckDB twin must have one.  A query may
ship rows-only ONLY by joining the documented allowlist with a reason
(approximate/iterative by design, pinned elsewhere in pytest).  This
test fails when an exact-expressible query ships oracle-less — and
when the allowlist itself goes stale.  No Ray session needed."""

from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import (
    ORACLE_SQL,
    QUERIES,
    ROWS_ONLY_QUERIES,
)


def test_every_query_is_oracle_checked_or_documented_rows_only():
    missing = set(QUERIES) - set(ORACLE_SQL)
    undocumented = sorted(missing - set(ROWS_ONLY_QUERIES))
    assert not undocumented, (
        "queries without an ORACLE_SQL twin AND without a documented "
        f"rows-only reason: {undocumented} — add an exact DuckDB oracle "
        "(preferred) or a ROWS_ONLY_QUERIES entry explaining why none "
        "is feasible"
    )


def test_rows_only_allowlist_is_not_stale():
    # an allowlisted query that gained an oracle (or was removed) must
    # leave the allowlist, so the documented set stays exact
    stale = sorted(
        n for n in ROWS_ONLY_QUERIES if n not in QUERIES or n in ORACLE_SQL
    )
    assert not stale, f"stale ROWS_ONLY_QUERIES entries: {stale}"
    # every reason is a real sentence pointing at the pinning test
    for name, reason in ROWS_ONLY_QUERIES.items():
        assert len(reason) > 20 and ("test" in reason or "pinned" in reason), (
            name,
            reason,
        )


def test_oracle_keys_are_subset_of_queries():
    extra = sorted(set(ORACLE_SQL) - set(QUERIES))
    assert not extra, f"ORACLE_SQL entries with no query: {extra}"
