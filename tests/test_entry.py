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
