"""Pipeline oracles must be self-contained: they synthesize transcripts from
the dual-dialect formula, so a bare duckdb.connect() (no views registered — the
driver's environment for them) must execute every one."""

from __future__ import annotations

import duckdb

from openfactverification_spark.plans import oracle as oracle_mod


def test_all_pipeline_oracles_run_on_bare_duckdb():
    con = duckdb.connect()
    oracles = oracle_mod.oracle_queries(256)  # small n: syntax/shape check
    assert len(oracles) >= 15
    for name, sql in oracles.items():
        res = con.execute(sql)
        rows = res.fetchall()
        assert len(res.description) > 0, name
        assert isinstance(rows, list), name
