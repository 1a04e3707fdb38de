import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
