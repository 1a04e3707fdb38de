"""POSIX commit-protocol invariants: roll-forward recovery, monotonic
CURRENT, retired floor (the object path's equivalents are covered by
test_objstore)."""

import dataclasses
import json

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.manifest import (
    CommitConflict,
    ManifestStore,
)

SPEC = engine.default_spec(num_partitions=4)


def _lake(tmp_path, n=1500, files=2):
    ch = str(tmp_path / "ch")
    gen_changes(ch, n_events=n, n_convs=20, n_files=files, seed=3)
    lake = str(tmp_path / "lake")
    engine.apply_changes(ch, lake, SPEC)
    return ch, lake


def _plant_corpse(store: ManifestStore) -> int:
    """Simulate a committer that died between its exclusive create and
    its CURRENT swap: a complete version file above CURRENT."""
    m = store.load()
    corpse = dataclasses.replace(
        m,
        version=m.version + 1,
        parent_version=m.version,
        metrics={"planted": "corpse"},
        lineage={},
    )
    store.fs.create_exclusive(
        store.fs.full("_manifest", f"manifest-{corpse.version:06d}.json"),
        corpse.to_json(),
    )
    return corpse.version


def test_roll_forward_makes_corpse_visible(tmp_path):
    ch, lake = _lake(tmp_path)
    store = ManifestStore(lake)
    v_corpse = _plant_corpse(store)
    # CURRENT still points below the corpse
    assert store.current_version() == v_corpse - 1

    # the next writer rolls the corpse forward and lands ABOVE it
    gen_changes(str(tmp_path / "ch2"), n_events=400, n_convs=20,
                n_files=1, seed=5)
    ms = engine.apply_changes(str(tmp_path / "ch2"), lake, SPEC)
    assert ms and ms[-1].version == v_corpse + 1
    assert store.current_version() == v_corpse + 1
    hist = [h["version"] for h in store.history()]
    assert hist == list(range(1, v_corpse + 2))  # gapless, corpse kept
    assert store.load(v_corpse).metrics == {"planted": "corpse"}


def test_stale_parent_commit_conflicts_after_roll_forward(tmp_path):
    ch, lake = _lake(tmp_path)
    store = ManifestStore(lake)
    m1 = store.load()
    v_corpse = _plant_corpse(store)
    # a stale sibling built against v1 (same parent as the corpse) must
    # conflict - this exact shape was the silent lost-commit race
    stale = dataclasses.replace(
        m1,
        version=v_corpse + 1,  # next_version() as the racer would compute
        parent_version=m1.version,
        metrics={"planted": "stale-sibling"},
        lineage={},
    )
    try:
        store.commit(stale)
        raise AssertionError("stale sibling must not commit")
    except CommitConflict:
        pass
    # and the conflict rolled the corpse forward as a side effect
    assert store.current_version() == v_corpse


def test_delayed_current_swap_never_regresses(tmp_path):
    ch, lake = _lake(tmp_path)
    store = ManifestStore(lake)
    head = store.current_version()
    # a delayed rival swap for an OLDER version is a no-op
    store._update_current_monotonic(head - 1 if head > 1 else head)
    assert store.current_version() == head


def test_rollback_then_write_stays_on_retired_floor(tmp_path):
    ch, lake = _lake(tmp_path, n=3000, files=3)
    store = ManifestStore(lake)
    # three commits via per-file apply
    lake2 = str(tmp_path / "lake2")
    engine.apply_changes(ch, lake2, SPEC, commit_every_files=1)
    s2 = ManifestStore(lake2)
    head = s2.current_version()
    assert head == 3
    s2.rollback(1)
    assert s2.current_version() == 1
    # retired versions 2..3 must NOT roll forward; the next write lands
    # above the old head (burned numbers), parented on v1
    gen_changes(str(tmp_path / "ch3"), n_events=300, n_convs=20,
                n_files=1, seed=7)
    ms = engine.apply_changes(str(tmp_path / "ch3"), lake2, SPEC)
    assert ms
    m = s2.load()
    assert m.parent_version == 1 and m.version == head + 1


def test_sibling_appearing_mid_commit_conflicts_not_clobbers(tmp_path, monkeypatch):
    """The narrowest race: a rival's exclusive create lands AFTER this
    committer's roll-forward check but BEFORE its version listing. The
    commit must CONFLICT — burning past the fresh sibling would publish
    same-parent state over the rival's commit (lost update)."""
    ch, lake = _lake(tmp_path)
    store = ManifestStore(lake)
    m1 = store.load()

    real_versions = store.versions
    state = {"calls": 0, "planted": None}

    def versions_with_injection():
        state["calls"] += 1
        # after the roll-forward pass has used the listing once, a
        # rival commits; plant it exactly before the second listing
        if state["calls"] == 2 and state["planted"] is None:
            state["planted"] = _plant_corpse(store)
        return real_versions()

    monkeypatch.setattr(store, "versions", versions_with_injection)

    stale = dataclasses.replace(
        m1,
        version=m1.version + 1,
        parent_version=m1.version,
        metrics={"planted": "late-racer"},
        lineage={},
    )
    try:
        store.commit(stale)
        raise AssertionError("mid-commit sibling must conflict")
    except CommitConflict:
        pass
    # the rival's commit survives untouched at the head number
    assert store.load(state["planted"]).metrics == {"planted": "corpse"}
    # and a retry against the rolled-forward parent succeeds cleanly
    retry = dataclasses.replace(
        m1,
        version=state["planted"] + 1,
        parent_version=state["planted"],
        metrics={"planted": "retry"},
        lineage={},
    )
    monkeypatch.setattr(store, "versions", real_versions)
    committed = store.commit(retry)
    assert committed.version == state["planted"] + 1
