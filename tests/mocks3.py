"""Offline mocks for the real-object-store schemes.

``MockS3FileSystem`` / ``MockGCSFileSystem`` register under the REAL
schemes (``s3://``, ``gs://``) so ``LakeFS`` exercises its production
code path: scheme lookup in ``_COND_PUT_SCHEMES`` and the SDK-client
conditional-put adapters (``_s3_conditional_put`` via a boto3-shaped
``put_object(IfNoneMatch='*')`` raising a botocore-shaped 412, and
``_gcs_conditional_put`` via ``bucket().blob().upload_from_string(
if_generation_match=0)`` raising a 412-coded PreconditionFailed).

They subclass the disk-backed shim, so the store is shared across OS
processes and the contract suite's subprocess races run unchanged; the
shim's native ``put_if_absent`` is masked to force the adapter path.
Key space: ``s3://tmp/x/lake`` <-> ``/tmp/x/lake``, same as s3sim.
"""

from __future__ import annotations

import os
import uuid

import fsspec

from aws_serverless_elt_pipeline_enterprise_ray.state.lakefs import (
    ObjStoreShimFileSystem,
)


class FakeClientError(Exception):
    """botocore.exceptions.ClientError shape: carries ``.response``."""

    def __init__(self, code: str, status: int):
        super().__init__(f"An error occurred ({code})")
        self.response = {
            "Error": {"Code": code},
            "ResponseMetadata": {"HTTPStatusCode": status},
        }


class FakeS3Client:
    """The one boto3 S3 method the engine's adapter calls.

    Fault injection: ``FakeS3Client.faults`` is a CLASS-level queue of
    ``(code, status)`` pairs consumed one per ``put_object`` call
    (shared across instances because fsspec caches filesystems);
    ``("ok", 0)`` passes through. Lets contract tests drive throttle
    storms (SlowDown/503), 5xx, and ConditionalRequestConflict/409
    races through the adapter's REAL retry path."""

    faults: list = []

    def __init__(self, calls: list | None = None):
        self.calls = calls if calls is not None else []

    def put_object(self, Bucket, Key, Body, IfNoneMatch=None, **kw):
        self.calls.append({"Bucket": Bucket, "Key": Key, "IfNoneMatch": IfNoneMatch})
        if FakeS3Client.faults:
            code, status = FakeS3Client.faults.pop(0)
            if code != "ok":
                raise FakeClientError(code, status)
        lp = "/" + Bucket.strip("/") + "/" + Key.lstrip("/")
        os.makedirs(os.path.dirname(lp), exist_ok=True)
        data = Body if isinstance(Body, bytes) else bytes(Body)
        t = os.path.join(os.path.dirname(lp), ".fake-s3-" + uuid.uuid4().hex)
        with open(t, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        if IfNoneMatch == "*":
            try:
                os.link(t, lp)  # atomic create-if-absent, like real S3
            except FileExistsError:
                raise FakeClientError("PreconditionFailed", 412) from None
            finally:
                os.unlink(t)
        else:
            os.replace(t, lp)
        return {"ETag": '"fake"'}


class MockS3FileSystem(ObjStoreShimFileSystem):
    protocol = "s3"
    put_if_absent = None  # mask the shim's native primitive -> adapter path

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._sync_s3_client = FakeS3Client()


class FakePreconditionFailed(Exception):
    code = 412


class FakeGCSTransient(Exception):
    """google-api-core-style transient error: carries ``.code``."""

    def __init__(self, code: int):
        super().__init__(f"transient {code}")
        self.code = code


class FakeGCSClient:
    """The google-cloud-storage surface the GCS adapter calls.
    ``FakeGCSClient.faults``: class-level queue of status ints consumed
    one per upload (429/500/503 transient shapes); 0 passes through."""

    faults: list = []

    class _Blob:
        def __init__(self, bucket: str, key: str):
            self._lp = "/" + bucket.strip("/") + "/" + key.lstrip("/")

        def upload_from_string(self, data, if_generation_match=None, **kw):
            if FakeGCSClient.faults:
                status = FakeGCSClient.faults.pop(0)
                if status:
                    raise FakeGCSTransient(status)
            os.makedirs(os.path.dirname(self._lp), exist_ok=True)
            if isinstance(data, str):
                data = data.encode()
            t = os.path.join(
                os.path.dirname(self._lp), ".fake-gcs-" + uuid.uuid4().hex
            )
            with open(t, "wb") as f:
                f.write(data)
            if if_generation_match == 0:
                try:
                    os.link(t, self._lp)
                except FileExistsError:
                    raise FakePreconditionFailed(self._lp) from None
                finally:
                    os.unlink(t)
            else:
                os.replace(t, self._lp)

    class _Bucket:
        def __init__(self, name: str):
            self._name = name

        def blob(self, key: str):
            return FakeGCSClient._Blob(self._name, key)

    def bucket(self, name: str):
        return self._Bucket(name)


class MockGCSFileSystem(ObjStoreShimFileSystem):
    protocol = "gs"
    put_if_absent = None

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._sync_gcs_client = FakeGCSClient()


fsspec.register_implementation("s3", MockS3FileSystem, clobber=True)
fsspec.register_implementation("gs", MockGCSFileSystem, clobber=True)
