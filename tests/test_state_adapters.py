"""boto3-shaped KV adapters for the reference's S3/DynamoDB watermark
backends (extract_github_data.py:164-286) — injected fakes, no network.
No Spark fixture: the adapters are pure driver-side state plumbing."""

from __future__ import annotations

from ag_data_ingestion_github_to_snowflake_spark.sources.state import (
    DynamoTableKV,
    KVWatermark,
    S3ObjectKV,
)


class FakeS3Client:
    """Implements exactly the boto3 S3 surface the adapter touches."""

    def __init__(self):
        self.objects: dict[tuple[str, str], bytes] = {}

    def get_object(self, Bucket: str, Key: str) -> dict:
        if (Bucket, Key) not in self.objects:
            raise KeyError(Key)  # boto3 raises NoSuchKey; any exc works
        body = self.objects[(Bucket, Key)]

        class _Body:
            def read(self) -> bytes:
                return body

        return {"Body": _Body()}

    def put_object(self, Bucket: str, Key: str, Body: bytes) -> None:
        self.objects[(Bucket, Key)] = Body


class FakeDynamoTable:
    """Implements exactly the boto3 Table surface the adapter touches."""

    def __init__(self):
        self.items: dict[str, dict] = {}

    def get_item(self, Key: dict) -> dict:
        (pk,) = Key.values()
        item = self.items.get(pk)
        return {"Item": item} if item is not None else {}

    def put_item(self, Item: dict) -> None:
        self.items[Item["extraction_id"]] = Item


def test_s3_adapter_roundtrip_and_fresh_start():
    s3 = FakeS3Client()
    wm = KVWatermark(S3ObjectKV(s3, bucket="my-bucket"), key="last_repo_id.txt")
    assert wm.get() == 0  # NoSuchKey -> start fresh (reference :209-211)
    wm.set(4321)
    assert wm.get() == 4321
    # persisted under the reference's state-prefix layout
    assert ("my-bucket", "github_extraction_state/last_repo_id.txt") in s3.objects


def test_dynamo_adapter_roundtrip_and_item_layout():
    table = FakeDynamoTable()
    wm = KVWatermark(DynamoTableKV(table), key="github_repos")
    assert wm.get() == 0  # missing item -> start fresh (reference :225-228)
    wm.set(999)
    assert wm.get() == 999
    # the reference's item shape: extraction_id partition key + last_repo_id
    assert table.items["github_repos"]["last_repo_id"] == "999"


def test_corrupt_remote_value_falls_back_to_default():
    s3 = FakeS3Client()
    s3.put_object(
        Bucket="b", Key="github_extraction_state/wm", Body=b"not-an-int"
    )
    wm = KVWatermark(S3ObjectKV(s3, bucket="b"), key="wm", default=7)
    assert wm.get() == 7
