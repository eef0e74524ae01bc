"""GitHub-repos REST connector as a Spark 4 Python Data Source.

Promotes the driver-side fetch (sources/rest.py) to a first-class
``spark.read.format("github_repos")`` source (SURVEY §7.4): the list
scan is keyset-paginated so page N+1 depends on page N's last id —
but with a fixed ``since``/``until`` id range the keyspace can be
*sharded by id*: each input partition owns an id sub-range and pages
through it independently (``GET /repositories?since=<shard_start>``
stopping at shard end). That turns the reference's serial loop
(/root/reference/src/extract_github_data.py:394-435) into N parallel
scan streams, one per Spark task — the same technique JDBC sources use
for predicate-sharded parallel reads.

Registration requires a picklable transport factory; tests inject the
stub via ``TransportRegistry`` (executors re-create the transport from
its spec, never over the wire).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ag_data_ingestion_github_to_snowflake_spark.sources.rest import LIST_SCHEMA


class TransportRegistry:
    """Maps a name to a transport factory so executors can rebuild the
    transport from options (options must be plain strings)."""

    _factories: dict[str, object] = {}

    @classmethod
    def register(cls, name: str, factory) -> None:
        cls._factories[name] = factory

    @classmethod
    def build(cls, name: str, spec: str):
        return cls._factories[name](spec)


class _IdRangePartition(InputPartition):
    def __init__(self, start: int, end: int, row_cap: int | None = None):
        self.start = start
        self.end = end
        self.row_cap = row_cap  # max rows this shard may emit (budget share)


class GithubReposReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = options
        self.since = int(options.get("since", 0))
        self.until = int(options.get("until", 1000))
        self.per_page = int(options.get("per_page", 100))
        self.num_partitions = int(options.get("num_partitions", 4))
        budget = options.get("budget")
        self.budget = int(budget) if budget is not None else None
        self.transport_name = options.get("transport", "stub")
        self.transport_spec = options.get("transport_spec", "")

    def partitions(self) -> list[_IdRangePartition]:
        """Shard the keyset range (since, until] into contiguous
        sub-ranges (each shard is exclusive-start/inclusive-end,
        matching the API's ``since`` semantics: ids strictly greater
        than the cursor). Consecutive shards never overlap.

        A ``budget`` option (max total rows, the reference's
        MAX_REQUESTS_PER_RUN) is enforced *structurally*: it is split
        across shards at planning time (first ``budget % n`` shards get
        one extra), so independent executor tasks can never jointly
        exceed it — the distributed analog of ``rows[:budget]``, with
        no cross-task coordination needed."""
        span = max(self.until - self.since, 0)
        n = max(min(self.num_partitions, span), 1)
        step = (span + n - 1) // n if span else 1
        starts = list(range(self.since, self.until, step)) or [self.since]
        caps: list[int | None] = [None] * len(starts)
        if self.budget is not None:
            share, extra = divmod(max(self.budget, 0), len(starts))
            caps = [share + (1 if i < extra else 0) for i in range(len(starts))]
        return [
            _IdRangePartition(s, min(s + step, self.until) if span else self.until, cap)
            for s, cap in zip(starts, caps)
        ]

    def read(self, partition: _IdRangePartition) -> Iterator[tuple]:
        """Page through one (start, end] id shard (executor-side),
        honoring the shard's planned row cap (budget share)."""
        transport = TransportRegistry.build(self.transport_name, self.transport_spec)
        cursor = partition.start
        emitted = 0
        while cursor < partition.end:
            if partition.row_cap is not None and emitted >= partition.row_cap:
                return
            status, payload = transport(
                "/repositories", {"since": cursor, "per_page": self.per_page}
            )
            if status != 200 or not payload:
                break
            prev_cursor = cursor
            for r in payload:
                rid = int(r["id"])
                if rid <= prev_cursor:
                    # ``since`` means strictly-greater ids; replayed or
                    # stale rows from a misbehaving server are dropped.
                    continue
                if rid > partition.end:
                    return
                if partition.row_cap is not None and emitted >= partition.row_cap:
                    return
                yield (
                    rid,
                    r.get("name"),
                    r.get("full_name"),
                    (r.get("owner") or {}).get("login"),
                )
                emitted += 1
                cursor = max(cursor, rid)
            if cursor <= prev_cursor:
                # Forward-progress guard: a page that advanced nothing
                # must not trap the executor in an infinite loop of
                # identical requests.
                break
            if len(payload) < self.per_page:
                break


class GithubReposStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor: the reference's scheduled-extraction loop
    (cron fires, pull ≤N records past the watermark, persist the
    cursor — /root/reference/.github/workflows/scheduled-extraction.yml
    + src/extract_github_data.py:568-578) as a genuine Structured
    Streaming source.

    - offset = ``{"cursor": <last seen id>}`` — the keyset watermark,
      checkpointed by Spark's offset log instead of the hand-rolled
      state file, so exactly-once batch accounting and restart-resume
      come from the engine;
    - each micro-batch pulls at most ``batch_rows`` rows
      (MAX_REQUESTS_PER_RUN per firing);
    - ``readBetweenOffsets`` replays a committed range
      deterministically for recovery (ids are immutable, so the range
      (start, end] re-fetches identically).
    """

    def __init__(self, options: dict):
        self.since = int(options.get("since", 0))
        self.per_page = int(options.get("per_page", 100))
        self.batch_rows = int(options.get("batch_rows", 59))
        self.transport_name = options.get("transport", "stub")
        self.transport_spec = options.get("transport_spec", "")

    def initialOffset(self) -> dict:
        return {"cursor": self.since}

    def _pull(self, after: int, limit: int | None, stop_at: int | None = None):
        transport = TransportRegistry.build(self.transport_name, self.transport_spec)
        rows: list[tuple] = []
        cursor = after
        while limit is None or len(rows) < limit:
            status, payload = transport(
                "/repositories", {"since": cursor, "per_page": self.per_page}
            )
            if status != 200 or not payload:
                break
            prev_cursor = cursor
            for r in payload:
                rid = int(r["id"])
                if rid <= prev_cursor:
                    continue
                if stop_at is not None and rid > stop_at:
                    return rows, cursor
                if limit is not None and len(rows) >= limit:
                    return rows, cursor
                rows.append(
                    (
                        rid,
                        r.get("name"),
                        r.get("full_name"),
                        (r.get("owner") or {}).get("login"),
                    )
                )
                cursor = max(cursor, rid)
            if cursor <= prev_cursor:  # forward-progress guard
                break
            if len(payload) < self.per_page:
                break
        return rows, cursor

    def read(self, start: dict):
        rows, cursor = self._pull(int(start["cursor"]), self.batch_rows)
        return iter(rows), {"cursor": cursor}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._pull(int(start["cursor"]), None, stop_at=int(end["cursor"]))
        return iter(rows)


class GithubReposDataSource(DataSource):
    """``spark.read.format("github_repos").options(...)`` source —
    batch (id-sharded parallel scan) and streaming (keyset-cursor
    micro-batches) flavors.

    Options: since, until, per_page, num_partitions, budget, transport,
    transport_spec (JSON string for the transport factory); streaming
    adds batch_rows (max rows per micro-batch).
    """

    @classmethod
    def name(cls) -> str:
        return "github_repos"

    def schema(self):
        return LIST_SCHEMA

    def reader(self, schema) -> GithubReposReader:
        return GithubReposReader(self.options)

    def simpleStreamReader(self, schema) -> GithubReposStreamReader:
        return GithubReposStreamReader(self.options)


def _stub_factory(spec: str):
    """Rebuild the tests' StubTransport from a JSON spec (executor-side)."""
    from ag_data_ingestion_github_to_snowflake_spark.sources.stub import StubTransport

    cfg = json.loads(spec) if spec else {}
    return StubTransport(**cfg)


TransportRegistry.register("stub", _stub_factory)


def register(spark) -> None:
    """Register the connector on a session (idempotent)."""
    spark.dataSource.register(GithubReposDataSource)
