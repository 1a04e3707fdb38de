"""The object-store shim and LakeFS abstraction: atomic puts,
conditional create, no-rename contract, cross-process visibility,
parquet + ray.data round trips."""

import os
import subprocess
import sys

import pyarrow as pa
import pytest

from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import (
    LakeFS,
    ObjStoreShimFileSystem,
    lakefs,
)


def shim_uri(tmp_path) -> str:
    """The lake's object-store URI: key space == absolute local path,
    so every test gets its own isolated 'bucket' with no global state."""
    return "s3sim://" + str(tmp_path).lstrip("/") + "/lake"


# The full object-store contract runs over THREE backends: the native
# shim (s3sim) and the mocked real schemes (s3, gs), whose conditional
# create goes through the production SDK-client adapters in
# lakefs._COND_PUT_SCHEMES rather than the shim's put_if_absent.
@pytest.fixture(params=["s3sim", "s3", "gs"])
def shim_base(request, tmp_path):
    import mocks3  # noqa: F401  - registers the s3/gs mock schemes

    return f"{request.param}://" + str(tmp_path).lstrip("/") + "/lake"


def test_put_get_list_delete(shim_base):
    fs = LakeFS(shim_base)
    assert fs.is_object
    fs.write_atomic(fs.full("_manifest", "CURRENT"), b'{"version": 1}')
    assert fs.read_text(fs.full("_manifest", "CURRENT")) == '{"version": 1}'
    fs.write_atomic(fs.full("data", "a.bin"), b"A")
    fs.write_atomic(fs.full("data", "b.bin"), b"B")
    assert fs.listdir(fs.full("data")) == ["a.bin", "b.bin"]
    assert fs.walk_files(fs.full()) == [
        shim_base + "/_manifest/CURRENT",
        shim_base + "/data/a.bin",
        shim_base + "/data/b.bin",
    ]
    assert fs.size(fs.full("data", "a.bin")) == 1
    assert fs.mtime(fs.full("data", "a.bin")) > 0
    fs.remove(fs.full("data", "a.bin"))
    assert not fs.exists(fs.full("data", "a.bin"))
    assert fs.listdir(fs.full("missing")) == []


def test_create_exclusive_is_atomic_and_conflicts(shim_base):
    fs = LakeFS(shim_base)
    p = fs.full("_manifest", "manifest-000001.json")
    fs.create_exclusive(p, b"v1")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, b"v1-loser")
    assert fs.read_bytes(p) == b"v1"


def test_rename_is_refused(shim_base):
    fs = LakeFS(shim_base)
    fs.write_atomic(fs.full("x"), b"x")
    with pytest.raises(NotImplementedError):
        fs.fs.mv(fs.strip(fs.full("x")), fs.strip(fs.full("y")))


def test_rel_and_copy(shim_base):
    fs = LakeFS(shim_base)
    full = fs.full("data", "part=00001", "f-1.parquet")
    assert fs.rel(full) == "data/part=00001/f-1.parquet"
    fs.write_atomic(full, b"PQ")
    fs.copy_file(full, fs.full("data", "part=00001", "f-2.parquet"))
    assert fs.read_bytes(fs.full("data", "part=00001", "f-2.parquet")) == b"PQ"


def test_parquet_roundtrip_and_ray_read(shim_base):
    fs = LakeFS(shim_base)
    t = pa.table({"k": ["a", "b"], "v": [1, 2]})
    p = fs.full("data", "t.parquet")
    fs.write_parquet(t, p)
    assert fs.read_parquet(p).equals(t)
    # pruned read through the fsspec handler
    assert fs.read_parquet(p, columns=["v"]).column_names == ["v"]
    # ray.data reads ship the filesystem to worker processes (the mock
    # classes reach workers via conftest's PYTHONPATH + GRAFT_FS_MODULES)
    out = fs.ray_read_parquet(p).to_pandas().sort_values("k")
    assert out["v"].tolist() == [1, 2]


def test_cross_process_visibility(shim_base):
    """A write from another OS process is visible here (memory:// would
    fail this - its store is per-process)."""
    fs = LakeFS(shim_base)
    code = (
        "import sys; sys.path.insert(0, %r); sys.path.insert(0, %r); "
        "import mocks3; "
        "from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import LakeFS; "
        "LakeFS(%r).write_atomic(%r, b'hi')"
        % ("/root/repo", "/root/repo/tests", shim_base, shim_base + "/from-child")
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    assert fs.read_bytes(fs.full("from-child")) == b"hi"


def test_posix_backend_unchanged(tmp_path):
    fs = LakeFS(str(tmp_path / "lake"))
    assert not fs.is_object
    fs.makedirs(fs.full("_manifest"))
    fs.write_atomic(fs.full("_manifest", "CURRENT"), '{"version": 3}')
    assert fs.read_text(fs.full("_manifest", "CURRENT")) == '{"version": 3}'
    fs.create_exclusive(fs.full("_manifest", "m1"), b"x")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(fs.full("_manifest", "m1"), b"y")
    assert fs.rel(fs.full("data", "f")) == os.path.join("data", "f")
    t = pa.table({"v": [1]})
    fs.makedirs(fs.full("data"))
    fs.write_parquet(t, fs.full("data", "t.parquet"))
    assert fs.read_parquet(fs.full("data", "t.parquet")).equals(t)


def test_conditional_create_race_across_processes(shim_base, tmp_path):
    """True atomicity of put-if-absent under PROCESS-level concurrency:
    N workers race the same key; exactly one wins, the losers all see
    FileExistsError, and the winner's payload is intact."""
    import concurrent.futures as cf

    key = shim_base + "/_manifest/manifest-000042.json"
    script = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "sys.path.insert(0, '/root/repo/tests'); import mocks3\n"
        "from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import LakeFS\n"
        "fs = LakeFS(%r)\n"
        "try:\n"
        "    fs.create_exclusive(%r, ('winner=' + sys.argv[1]).encode())\n"
        "    print('WON')\n"
        "except FileExistsError:\n"
        "    print('LOST')\n"
    ) % (shim_base, key)

    def race(i):
        return subprocess.run(
            [sys.executable, "-c", script, str(i)],
            capture_output=True, text=True,
        ).stdout.strip()

    with cf.ThreadPoolExecutor(max_workers=6) as ex:
        outcomes = list(ex.map(race, range(6)))
    assert outcomes.count("WON") == 1, outcomes
    assert outcomes.count("LOST") == 5
    body = LakeFS(shim_base).read_bytes(key).decode()
    assert body.startswith("winner=")


def test_s3_adapter_uses_conditional_put(tmp_path):
    """The s3:// scheme routes create_exclusive through the boto3-shaped
    PutObject(IfNoneMatch='*') call, and a 412 maps to FileExistsError."""
    import mocks3

    base = "s3://" + str(tmp_path).lstrip("/") + "/lake"
    fs = LakeFS(base)
    p = fs.full("_manifest", "manifest-000001.json")
    fs.create_exclusive(p, b"v1")
    calls = fs.fs._sync_s3_client.calls
    assert calls and calls[-1]["IfNoneMatch"] == "*"
    assert calls[-1]["Bucket"] == str(tmp_path).lstrip("/").split("/", 1)[0]
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, b"loser")
    assert fs.read_bytes(p) == b"v1"


def test_gcs_adapter_uses_generation_match(tmp_path):
    import mocks3

    base = "gs://" + str(tmp_path).lstrip("/") + "/lake"
    fs = LakeFS(base)
    p = fs.full("_manifest", "manifest-000001.json")
    fs.create_exclusive(p, b"g1")
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, b"loser")
    assert fs.read_bytes(p) == b"g1"


def test_backend_without_conditional_create_is_refused():
    """A generic fsspec backend (memory://) has no conditional-create
    primitive: the commit arbiter refuses instead of degrading to
    exists-then-put."""
    fs = LakeFS("memory://lake")
    with pytest.raises(NotImplementedError, match="conditional-create"):
        fs.create_exclusive("memory://lake/_manifest/m1", b"x")


def test_s3_error_classifier_shapes():
    from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import (
        _s3_error_exists,
        _s3_error_in_flight,
        _s3_error_transient,
    )
    from mocks3 import FakeClientError

    assert _s3_error_exists(FakeClientError("PreconditionFailed", 412))
    assert _s3_error_exists(FakeClientError("SlowDown", 412))  # status wins
    assert not _s3_error_exists(FakeClientError("AccessDenied", 403))
    assert not _s3_error_exists(ValueError("no response attr"))
    # 409 = rival PUT mid-air: NOT definitive-exists, IS retryable
    assert _s3_error_in_flight(
        FakeClientError("ConditionalRequestConflict", 409)
    )
    assert not _s3_error_exists(
        FakeClientError("ConditionalRequestConflict", 409)
    )
    assert _s3_error_transient(FakeClientError("SlowDown", 503))
    assert _s3_error_transient(FakeClientError("InternalError", 500))
    assert not _s3_error_transient(FakeClientError("AccessDenied", 403))
