"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in kiezray) calls ray.init()/ray.shutdown().

- ``entry()``: flagship pipeline on /root/testdata/sf0.001.
- ``queries()``: one callable per implemented operator/pipeline from
  SURVEY.md §2 (+ training-data extensions); each takes ``sf_dir``.
- ``oracle_sql()``: DuckDB-runnable equivalents (same column names/types;
  distances rounded identically on both sides). MP-normal/empiric final
  distances are omitted (DuckDB lacks erf) -> rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: the full north-rule ER pipeline (embed -> LSH blocking ->
    hubness-reranked pair scoring -> transitive clustering) over the
    sf0.001 documents table adapted to the interleaved-span schema."""
    from kiezray.pipelines import queries as Q

    return Q.q_er_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from kiezray.pipelines import queries as Q

    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    from kiezray.pipelines import queries as Q

    return dict(Q.ORACLE_SQL)
