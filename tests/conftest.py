import os
import sys
import warnings

import pytest

# Ray Data itself calls its deprecated internal free() when dropping
# superseded MaterializedDatasets (one warning per freed block set);
# iterative algorithms materialize per round, so this Ray-internal
# deprecation would otherwise spam hundreds of lines per run.
warnings.filterwarnings(
    "ignore",
    message=".*`free` is a deprecated API.*",
    category=DeprecationWarning,
)


def pytest_configure(config):
    # pytest re-arms warnings per test; the ini-style filter is the
    # one that actually sticks
    config.addinivalue_line(
        "filterwarnings",
        "ignore:.*`free` is a deprecated API.*:DeprecationWarning",
    )
    config.addinivalue_line(
        "markers", "slow: long-running endurance/stress test"
    )

_TESTS = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_TESTS)
sys.path.insert(0, _REPO)

# The mocked real-object-store schemes (s3://, gs://) must be
# registered in EVERY Ray worker, not just the pytest process; both
# variables are inherited by workers because they are set before
# ray.init (see state/lakefs._load_fs_plugins).
os.environ["GRAFT_FS_MODULES"] = "mocks3"
os.environ["PYTHONPATH"] = os.pathsep.join(
    [_TESTS, _REPO, os.environ.get("PYTHONPATH", "")]
).rstrip(os.pathsep)


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(params=["posix", "s3sim"])
def tmp_lake(tmp_path, request):
    """The lake under test, on BOTH backends: plain POSIX paths and the
    rename-free object-store contract (``s3sim://`` routes through
    fsspec with put/list/delete semantics only - see state/lakefs.py).
    Every test consuming this fixture proves the engine end-to-end on
    each."""
    if request.param == "s3sim":
        return "s3sim://" + str(tmp_path).lstrip("/") + "/lake"
    return str(tmp_path / "lake")


@pytest.fixture()
def tmp_changes(tmp_path):
    return str(tmp_path / "changes")
