"""SQL text front-end (``sqlpred.py``): parser shapes, NOT/DNF
normalization, statement shells, CLI integration, and a seeded fuzz of
random boolean expression trees checked row-for-row against DuckDB
evaluating the SAME SQL text."""

import json

import duckdb
import pandas as pd
import pytest

from aws_serverless_elt_pipeline_enterprise_ray import apply_changes, default_spec
from aws_serverless_elt_pipeline_enterprise_ray.gen import (
    gen_changes,
    oracle_final_state,
)
from aws_serverless_elt_pipeline_enterprise_ray.pipelines.dml import scan_where
from aws_serverless_elt_pipeline_enterprise_ray.sqlpred import (
    SqlParseError,
    parse_statement,
    parse_where,
)


# ------------------------------------------------------------- unit shapes

def test_single_conjunction():
    assert parse_where("role = 'assistant' AND turn_idx >= 5") == [
        ("role", "==", "assistant"),
        ("turn_idx", ">=", 5),
    ]


def test_or_goes_dnf():
    assert parse_where("turn_idx < 3 OR role <> 'user'") == [
        [("turn_idx", "<", 3)],
        [("role", "!=", "user")],
    ]


def test_precedence_and_binds_tighter():
    got = parse_where("a = 1 OR b = 2 AND c = 3")
    assert got == [[("a", "==", 1)], [("b", "==", 2), ("c", "==", 3)]]


def test_parens_distribute():
    got = parse_where("(a = 1 OR b = 2) AND c = 3")
    assert got == [
        [("a", "==", 1), ("c", "==", 3)],
        [("b", "==", 2), ("c", "==", 3)],
    ]


def test_between_and_in():
    assert parse_where("turn_idx BETWEEN 5 AND 9") == [
        ("turn_idx", "between", (5, 9))
    ]
    assert parse_where("role IN ('user', 'tool')") == [
        ("role", "in", ["user", "tool"])
    ]


def test_not_normalization():
    assert parse_where("NOT role = 'user'") == [("role", "!=", "user")]
    assert parse_where("turn_idx NOT BETWEEN 5 AND 9") == [
        [("turn_idx", "<", 5)],
        [("turn_idx", ">", 9)],
    ]
    assert parse_where("role NOT IN ('a', 'b')") == [
        ("role", "!=", "a"),
        ("role", "!=", "b"),
    ]
    # De Morgan through parens
    assert parse_where("NOT (a = 1 OR b < 2)") == [
        ("a", "!=", 1),
        ("b", ">=", 2),
    ]


def test_literals():
    assert parse_where("x = -3") == [("x", "==", -3)]
    assert parse_where("x = 2.5") == [("x", "==", 2.5)]
    assert parse_where("s = 'it''s'") == [("s", "==", "it's")]
    assert parse_where("ts > TIMESTAMP '2026-01-01 00:00:00'") == [
        ("ts", ">", "2026-01-01 00:00:00")
    ]
    assert parse_where("flag = TRUE") == [("flag", "==", True)]


def test_errors():
    with pytest.raises(SqlParseError, match="IS"):
        parse_where("x IS NULL")
    with pytest.raises(SqlParseError, match="NULL"):
        parse_where("x = NULL")
    with pytest.raises(SqlParseError, match="trailing"):
        parse_where("x = 1 y = 2")
    with pytest.raises(SqlParseError, match="tokenize"):
        parse_where("x = $bad")
    with pytest.raises(SqlParseError, match="OR groups"):
        parse_where(
            " AND ".join(f"(a = {i} OR b = {i})" for i in range(8))
        )


def test_statements():
    d = parse_statement("DELETE FROM t WHERE role = 'tool';")
    assert d == {"kind": "delete", "table": "t",
                 "where": [("role", "==", "tool")]}
    u = parse_statement(
        "UPDATE t SET role = 'edited', tool = NULL WHERE turn_idx < 2"
    )
    assert u["set"] == {"role": "edited", "tool": None}
    assert u["where"] == [("turn_idx", "<", 2)]
    s = parse_statement(
        "SELECT conv_id, turn_idx FROM t WHERE turn_idx IN (1, 2) LIMIT 5"
    )
    assert s["columns"] == ["conv_id", "turn_idx"]
    assert s["limit"] == 5
    star = parse_statement("SELECT * FROM t")
    assert star["columns"] is None and star["where"] is None
    with pytest.raises(SqlParseError):
        parse_statement("DROP TABLE t")


# ----------------------------------------------------- engine + CLI + fuzz

@pytest.fixture(scope="module")
def lake(tmp_path_factory):
    root = tmp_path_factory.mktemp("sqlpred")
    changes = str(root / "ch")
    gen_changes(changes, n_events=4000, n_convs=50, n_files=3, seed=137)
    lake = str(root / "lake")
    apply_changes(changes, lake, default_spec(num_partitions=4))
    final = oracle_final_state(changes).to_pandas()
    return lake, final


def _canon(df):
    return (
        df.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .reindex(columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    )


def test_scan_where_sql_matches_duckdb(lake):
    lake_dir, final = lake
    sql = "(role = 'assistant' OR turn_idx BETWEEN 3 AND 6) AND tool <> 'x'"
    got = scan_where(lake_dir, parse_where(sql)).to_pandas()
    con = duckdb.connect()
    con.register("final", final)
    want = con.execute(f"SELECT * FROM final WHERE {sql}").df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


def test_fuzz_sql_trees_vs_duckdb(lake):
    """Random boolean trees (AND/OR/NOT/parens over =, <>, <, <=, >,
    >=, BETWEEN, IN) rendered to SQL text: the engine scanning with
    ``parse_where(sql)`` must equal DuckDB evaluating the same text."""
    import numpy as np

    lake_dir, final = lake
    rng = np.random.default_rng(4242)
    roles = sorted(final["role"].dropna().unique())[:3] + ["ghost"]
    con = duckdb.connect()
    con.register("final", final)

    def leaf():
        k = int(rng.integers(0, 4))
        if k == 0:
            r = roles[int(rng.integers(0, len(roles)))]
            op = ["=", "<>"][int(rng.integers(0, 2))]
            return f"role {op} '{r}'"
        if k == 1:
            lo = int(rng.integers(0, 25))
            return f"turn_idx BETWEEN {lo} AND {lo + int(rng.integers(0, 12))}"
        if k == 2:
            op = ["<", "<=", ">", ">="][int(rng.integers(0, 4))]
            return f"turn_idx {op} {int(rng.integers(0, 30))}"
        vals = ", ".join(str(int(v)) for v in rng.integers(0, 30, size=3))
        return f"turn_idx IN ({vals})"

    def tree(depth):
        if depth == 0 or rng.random() < 0.35:
            s = leaf()
            return f"NOT ({s})" if rng.random() < 0.2 else s
        op = " AND " if rng.random() < 0.5 else " OR "
        kids = [tree(depth - 1) for _ in range(int(rng.integers(2, 4)))]
        s = "(" + op.join(kids) + ")"
        return f"NOT {s}" if rng.random() < 0.15 else s

    for trial in range(30):
        sql = tree(2)
        try:
            pred = parse_where(sql)
        except SqlParseError as e:
            assert "OR groups" in str(e), f"unexpected parse error on {sql}: {e}"
            continue
        got = scan_where(lake_dir, pred).to_pandas()
        want = con.execute(f"SELECT * FROM final WHERE {sql}").df()
        assert len(got) == len(want), f"trial {trial}: {sql}"
        if len(want):
            pd.testing.assert_frame_equal(
                _canon(got), _canon(want), obj=f"trial {trial}: {sql}"
            )


def test_cli_where_sql_and_sql_statement(lake, tmp_path, capsys):
    import shutil

    from aws_serverless_elt_pipeline_enterprise_ray import cli, read_table

    lake_dir, final = lake
    work = str(tmp_path / "clilake")
    shutil.copytree(lake_dir, work)

    assert cli.main([
        "scan", "--lake", work,
        "--where-sql", "role = 'assistant' AND turn_idx < 4",
        "--columns", "conv_id,turn_idx", "--limit", "3",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want_n = len(final[(final["role"] == "assistant") & (final["turn_idx"] < 4)])
    assert out["matched"] == want_n

    assert cli.main([
        "sql", "--lake", work,
        "--statement",
        "UPDATE transcripts SET role = 'edited' WHERE turn_idx BETWEEN 0 AND 1",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "update" and out["committed"]

    assert cli.main([
        "sql", "--lake", work,
        "--statement", "DELETE FROM transcripts WHERE turn_idx >= 20",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "delete" and out["committed"]

    df = read_table(work).to_pandas()
    assert (df["turn_idx"] < 20).all()
    assert (df.loc[df["turn_idx"] <= 1, "role"] == "edited").all()

    assert cli.main([
        "sql", "--lake", work,
        "--statement", "SELECT conv_id FROM transcripts WHERE role = 'edited'",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["kind"] == "select"
    assert out["matched"] == int((df["role"] == "edited").sum())

    # exactly one of --where / --where-sql
    with pytest.raises(SystemExit):
        cli.main(["delete", "--lake", work,
                  "--where", "turn_idx:>=:5", "--where-sql", "turn_idx >= 5"])
