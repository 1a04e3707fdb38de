"""Object-store fault-injection contract tests (round-5): the
conditional-put adapter must drive throttle storms (503 SlowDown),
5xx, and S3's 409 ConditionalRequestConflict to a DEFINITIVE outcome
under the retry policy documented in ``state/lakefs.py`` — and the
exactly-once apply must stay correct when commits ride through a
fault storm. These are the behaviors the first REAL S3/GCS run will
hit (no network in this sandbox; the mock clients raise
botocore/GCS-shaped errors through the production adapter path)."""

import pytest

import aws_serverless_elt_pipeline_enterprise_ray as engine
from aws_serverless_elt_pipeline_enterprise_ray.gen import gen_changes
from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import LakeFS

import mocks3  # noqa: F401 - registers s3:// and gs:// mock schemes
from mocks3 import FakeClientError, FakeGCSClient, FakeS3Client

from test_cdc_e2e import assert_matches_oracle


@pytest.fixture(autouse=True)
def _clean_faults(monkeypatch):
    """Empty fault queues before/after, and strip real sleeping from
    the backoff so storms run instantly (count preserved)."""
    FakeS3Client.faults = []
    FakeGCSClient.faults = []
    sleeps = []
    monkeypatch.setattr("time.sleep", lambda s: sleeps.append(s))
    yield sleeps
    FakeS3Client.faults = []
    FakeGCSClient.faults = []


def _s3_lake(tmp_path) -> LakeFS:
    return LakeFS("s3://" + str(tmp_path).lstrip("/") + "/lake")


def test_throttle_storm_then_success(tmp_path, _clean_faults):
    fs = _s3_lake(tmp_path)
    FakeS3Client.faults = [("SlowDown", 503)] * 3
    fs.create_exclusive(fs.full("_manifest", "m1"), b"x")
    assert fs.read_text(fs.full("_manifest", "m1")) == "x"
    assert len(_clean_faults) == 3  # one backoff per throttle


def test_persistent_5xx_bounded_then_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("GRAFT_COND_PUT_ATTEMPTS", "4")
    fs = _s3_lake(tmp_path)
    FakeS3Client.faults = [("InternalError", 500)] * 10
    with pytest.raises(FakeClientError):
        fs.create_exclusive(fs.full("_manifest", "m1"), b"x")
    # exactly the attempt budget was spent, then surfaced
    assert len(FakeS3Client.faults) == 6
    assert not fs.exists(fs.full("_manifest", "m1"))


def test_conflict_409_rival_failed_then_we_win(tmp_path):
    """409 means a rival conditional PUT is mid-air with UNKNOWN
    outcome; if the rival ultimately fails, the retry must land OUR
    write (not report a phantom 'exists')."""
    fs = _s3_lake(tmp_path)
    FakeS3Client.faults = [("ConditionalRequestConflict", 409)] * 2
    fs.create_exclusive(fs.full("_manifest", "m1"), b"winner")
    assert fs.read_text(fs.full("_manifest", "m1")) == "winner"


def test_conflict_409_rival_won_reports_exists(tmp_path):
    fs = _s3_lake(tmp_path)
    path = fs.full("_manifest", "m1")
    fs.write_atomic(path, b"rival")  # the rival's PUT lands mid-storm
    FakeS3Client.faults = [("ConditionalRequestConflict", 409)]
    with pytest.raises(FileExistsError):
        fs.create_exclusive(path, b"loser")
    assert fs.read_text(path) == "rival"


def test_non_retryable_error_surfaces_immediately(tmp_path, _clean_faults):
    fs = _s3_lake(tmp_path)
    FakeS3Client.faults = [("AccessDenied", 403), ("ok", 0)]
    with pytest.raises(FakeClientError):
        fs.create_exclusive(fs.full("_manifest", "m1"), b"x")
    assert len(FakeS3Client.faults) == 1  # no second attempt
    assert _clean_faults == []  # and no backoff slept


def test_gcs_throttle_then_success_and_bounded(tmp_path, monkeypatch):
    fs = LakeFS("gs://" + str(tmp_path).lstrip("/") + "/lake")
    FakeGCSClient.faults = [429, 503]
    fs.create_exclusive(fs.full("_manifest", "m1"), b"x")
    assert fs.read_text(fs.full("_manifest", "m1")) == "x"
    monkeypatch.setenv("GRAFT_COND_PUT_ATTEMPTS", "3")
    FakeGCSClient.faults = [500] * 10
    with pytest.raises(Exception, match="transient"):
        fs.create_exclusive(fs.full("_manifest", "m2"), b"x")
    assert len(FakeGCSClient.faults) == 7


def test_apply_converges_through_fault_storm(tmp_path):
    """End-to-end: a multi-commit ingest whose conditional puts keep
    hitting throttles and 409s still converges exactly-once to the
    oracle state."""
    changes = str(tmp_path / "ch")
    gen_changes(changes, n_events=6000, n_convs=40, n_files=6, seed=101)
    lake = "s3://" + str(tmp_path).lstrip("/") + "/lake"
    # a fault before most puts: throttles and in-flight conflicts mixed
    FakeS3Client.faults = (
        [("SlowDown", 503), ("ok", 0), ("ConditionalRequestConflict", 409),
         ("ok", 0), ("InternalError", 500), ("ok", 0)] * 10
    )
    ms = engine.apply_changes(
        changes, lake, engine.default_spec(num_partitions=4),
        commit_every_files=2,
    )
    assert [m.version for m in ms] == [1, 2, 3]
    assert_matches_oracle(lake, changes)
    # idempotent resubmit unaffected by leftover faults
    assert engine.apply_changes(changes, lake) == []
