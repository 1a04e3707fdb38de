"""Driver-contract smoke tests: entry() + a representative subset of
queries() vs oracle_sql() at sf0.001 (full sweep lives in
tools/check_queries.py)."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"

#: fast, SQL-checkable representatives of each operator family
SUBSET = [
    "cdc_apply_full",
    "cdc_normalize",
    "cdc_op_counts",
    "dedup_exact",
    "token_count",
    "ann_cosine_topk",
    "window_events_hourly",
    "term_topk",
    "distinct_users_by_type",
    "value_quantiles_by_type",
    "ngram_jaccard",
]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in r) for r in df.itertuples(index=False))


def test_entry_returns_rows():
    df = entrymod.entry()
    assert len(df) > 0
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def test_every_query_has_callable():
    qs = entrymod.queries()
    assert len(qs) >= 25
    for name, fn in qs.items():
        assert callable(fn), name
    # every oracle key exists in queries
    assert set(entrymod.oracle_sql()) <= set(qs)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    got = qs[name](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = _oracle(oracles[name])
    assert len(got) == len(want), name
    assert sorted(got.columns) == sorted(want.columns), name
    assert _norm(got) == _norm(want), name


def test_query_registry_has_no_shadowed_names():
    """Regression guard: QUERIES/ORACLES are dict literals — a
    duplicate key (or a re-defined q_* function) silently shadows an
    operator, so the gate runs the wrong code. Parse the module AST
    and refuse duplicates outright."""
    import ast
    import os

    import aws_serverless_elt_pipeline_enterprise_ray.pipelines.queries as qmod

    src = open(os.path.abspath(qmod.__file__).replace(".pyc", ".py")).read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id in ("QUERIES", "ORACLES"):
                    keys = [k.value for k in node.value.keys]
                    dups = {k for k in keys if keys.count(k) > 1}
                    assert not dups, f"duplicate {t.id} keys: {dups}"
    defs = [n.name for n in tree.body
            if isinstance(n, ast.FunctionDef) and n.name.startswith("q_")]
    dup_defs = {n for n in defs if defs.count(n) > 1}
    assert not dup_defs, f"shadowed query functions: {dup_defs}"
    # every oracle has a query
    assert set(qmod.ORACLES) <= set(qmod.QUERIES)
