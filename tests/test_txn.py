"""Multi-table transactional catalog: all-or-nothing cross-lake
visibility, crash-window consistency, race arbitration, object-store
backend."""

import pandas as pd
import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
    CommitConflict,
    ManifestStore,
)
from aws_serverless_elt_pipeline_enterprise_ray.state.txn import (
    TxnCatalog,
    read_table_at,
)


def _frame(ds) -> pd.DataFrame:
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _setup(tmp_path, n_files=4):
    a_ch, b_ch = str(tmp_path / "cha"), str(tmp_path / "chb")
    gen_changes(a_ch, n_events=3000, n_convs=40, n_files=n_files, seed=31)
    gen_changes(b_ch, n_events=3000, n_convs=40, n_files=n_files, seed=37)
    return a_ch, b_ch, str(tmp_path / "lake_a"), str(tmp_path / "lake_b")


def test_txn_commit_publishes_both_pins_atomically(tmp_path):
    a_ch, b_ch, a_lake, b_lake = _setup(tmp_path)
    spec = engine.default_spec(num_partitions=4)
    cat = TxnCatalog(str(tmp_path / "cat"))

    txn = cat.begin()
    txn.apply("a", a_ch, spec, lake_dir=a_lake)
    txn.apply("b", b_ch, spec, lake_dir=b_lake)
    # nothing visible through the catalog until commit
    assert cat.snapshot() == {}
    v = txn.commit()
    assert v == 1
    snap = cat.snapshot()
    assert set(snap) == {"a", "b"}
    pd.testing.assert_frame_equal(
        _frame(read_table_at(cat, "a")), _frame(engine.read_table(a_lake))
    )
    pd.testing.assert_frame_equal(
        _frame(read_table_at(cat, "b")), _frame(engine.read_table(b_lake))
    )


def test_txn_readers_never_see_half_a_transaction(tmp_path):
    a_ch, b_ch, a_lake, b_lake = _setup(tmp_path, n_files=2)
    spec = engine.default_spec(num_partitions=4)
    cat = TxnCatalog(str(tmp_path / "cat"))

    txn = cat.begin()
    txn.apply("a", a_ch, spec, lake_dir=a_lake)
    txn.apply("b", b_ch, spec, lake_dir=b_lake)
    txn.commit()
    a_v1, b_v1 = _frame(read_table_at(cat, "a")), _frame(read_table_at(cat, "b"))

    # second transaction: both lakes advance, catalog not yet committed
    a_ch2, b_ch2 = str(tmp_path / "cha2"), str(tmp_path / "chb2")
    gen_changes(a_ch2, n_events=800, n_convs=40, n_files=1, seed=41)
    gen_changes(b_ch2, n_events=800, n_convs=40, n_files=1, seed=43)
    txn2 = cat.begin()
    txn2.apply("a", a_ch2, spec)
    # lake CURRENT moved, catalog pin did not: catalog readers still
    # see the v1 snapshot of BOTH tables (no half-transaction reads)
    assert ManifestStore(a_lake).current_version() > cat.snapshot()["a"]["version"]
    pd.testing.assert_frame_equal(_frame(read_table_at(cat, "a")), a_v1)
    pd.testing.assert_frame_equal(_frame(read_table_at(cat, "b")), b_v1)

    txn2.apply("b", b_ch2, spec)
    txn2.commit()
    pd.testing.assert_frame_equal(
        _frame(read_table_at(cat, "a")), _frame(engine.read_table(a_lake))
    )
    assert not _frame(read_table_at(cat, "a")).equals(a_v1)


def test_txn_crash_window_rerun_converges(tmp_path):
    a_ch, b_ch, a_lake, b_lake = _setup(tmp_path, n_files=2)
    spec = engine.default_spec(num_partitions=4)
    cat = TxnCatalog(str(tmp_path / "cat"))
    txn = cat.begin()
    txn.apply("a", a_ch, spec, lake_dir=a_lake)
    txn.apply("b", b_ch, spec, lake_dir=b_lake)
    txn.commit()

    # "crash" after per-lake commits, before the catalog commit
    a_ch2 = str(tmp_path / "cha2")
    gen_changes(a_ch2, n_events=500, n_convs=40, n_files=1, seed=47)
    dead = cat.begin()
    ms = dead.apply("a", a_ch2, spec)
    assert len(ms) == 1  # lake advanced
    del dead  # never committed

    # re-run: apply is idempotent (nothing pending), pin re-read from
    # the lake's CURRENT, catalog commit completes
    retry = cat.begin()
    ms2 = retry.apply("a", a_ch2, spec)
    assert ms2 == []
    retry.commit()
    pd.testing.assert_frame_equal(
        _frame(read_table_at(cat, "a")), _frame(engine.read_table(a_lake))
    )
    # untouched table keeps its pin
    assert cat.snapshot()["b"]["version"] == 1


def test_txn_race_loser_repins_and_wins_on_retry(tmp_path):
    a_ch, b_ch, a_lake, b_lake = _setup(tmp_path, n_files=1)
    spec = engine.default_spec(num_partitions=4)
    cat = TxnCatalog(str(tmp_path / "cat"))
    t0 = cat.begin()
    t0.apply("a", a_ch, spec, lake_dir=a_lake)
    t0.apply("b", b_ch, spec, lake_dir=b_lake)
    t0.commit()

    # two transactions race from the same parent on DIFFERENT tables
    a_ch2, b_ch2 = str(tmp_path / "cha2"), str(tmp_path / "chb2")
    gen_changes(a_ch2, n_events=300, n_convs=40, n_files=1, seed=53)
    gen_changes(b_ch2, n_events=300, n_convs=40, n_files=1, seed=59)
    t1, t2 = cat.begin(), cat.begin()
    t1.apply("a", a_ch2, spec)
    t2.apply("b", b_ch2, spec)
    assert t1.commit() == 2
    # loser with retries=0 gets the clean conflict...
    with pytest.raises(CommitConflict):
        t2.commit(retries=0)
    # ...and with the default bounded retry re-pins over the winner
    assert t2.commit() == 3
    snap = cat.snapshot()
    # both transactions' pins survive
    assert snap["a"]["version"] == ManifestStore(a_lake).current_version()
    assert snap["b"]["version"] == ManifestStore(b_lake).current_version()


def test_txn_unknown_table_needs_lake_dir_and_empty_commit_rejected(tmp_path):
    cat = TxnCatalog(str(tmp_path / "cat"))
    txn = cat.begin()
    with pytest.raises(KeyError):
        txn.apply("ghost", str(tmp_path / "nope"))
    with pytest.raises(ValueError):
        txn.commit()


def test_txn_catalog_on_object_store(tmp_path):
    """The catalog's exclusive-create commit runs on the rename-free
    object backend (the deployment shape: catalog + lakes on S3)."""
    a_ch, b_ch, _, _ = _setup(tmp_path, n_files=1)
    base = "s3sim://" + str(tmp_path).lstrip("/")
    a_lake, b_lake = base + "/lake_a", base + "/lake_b"
    spec = engine.default_spec(num_partitions=4)
    cat = TxnCatalog(base + "/cat")
    txn = cat.begin()
    txn.apply("a", a_ch, spec, lake_dir=a_lake)
    txn.apply("b", b_ch, spec, lake_dir=b_lake)
    assert txn.commit() == 1
    assert read_table_at(cat, "a").count() > 0
    # racing duplicate catalog version is refused by conditional put
    with pytest.raises(CommitConflict):
        cat.commit_pins(cat.snapshot(), parent=None)
