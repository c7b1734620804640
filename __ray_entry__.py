"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (full CDC replay via the partitioned LWW
    merge path) on sf0.001."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import cdc_replay_full

    return cdc_replay_full("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2)."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (keys without an entry get the
    weaker rows-only check)."""
    from cityofphiladelphia_databridge_etl_tools_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
