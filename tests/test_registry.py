"""Registry invariants: the correctness-coverage contract.

Every entry in the public ``queries()`` registry must be verifiable by
the driver gate: either an exact DuckDB oracle in ``ORACLE_SQL`` or a
semantic check in ``tools/check_oracles.py::SEMANTIC_CHECKS``. A query
with neither would silently downgrade to a rows-only check — this test
makes that a loud failure instead.
"""

import importlib.util
import sys


def _load_check_oracles():
    spec = importlib.util.spec_from_file_location(
        "check_oracles_for_test", "tools/check_oracles.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["check_oracles_for_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_every_query_has_an_oracle():
    from graphsetintersection_ray.pipelines.queries import ORACLE_SQL, QUERIES

    semantic = _load_check_oracles().SEMANTIC_CHECKS
    uncovered = [
        name
        for name in QUERIES
        if name not in ORACLE_SQL and name not in semantic
    ]
    assert not uncovered, (
        f"queries without SQL or semantic oracle: {uncovered}"
    )
    # no dangling oracle entries for queries that don't exist
    dangling_sql = [n for n in ORACLE_SQL if n not in QUERIES]
    dangling_sem = [n for n in semantic if n not in QUERIES]
    assert not dangling_sql, dangling_sql
    assert not dangling_sem, dangling_sem


def test_oracle_sql_column_name_discipline():
    """The driver's compare sorts columns by name before hashing, so a
    SQL oracle must not emit DuckDB's default aggregate column names
    (e.g. ``count(*)``, ``sum(x)``) — every computed column needs an AS
    alias matching the Ray side. Heuristic guard: no '(' in the final
    projection name position (a paren in a column name means a missing
    alias)."""
    import duckdb

    from graphsetintersection_ray.pipelines.queries import ORACLE_SQL

    con = duckdb.connect()
    bad = {}
    for name, sql in ORACLE_SQL.items():
        try:
            cols = [
                d[0]
                for d in con.execute(
                    f"DESCRIBE SELECT * FROM ({sql.replace(';', '')}) LIMIT 0"
                ).fetchall()
            ]
        except Exception:
            # needs the registered views; column discipline is then
            # enforced by the sf-scale gate itself
            continue
        paren = [c for c in cols if "(" in c]
        if paren:
            bad[name] = paren
    assert not bad, bad
