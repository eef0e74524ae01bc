"""HeaderRateLimitGovernor (A20): X-RateLimit header parsing, low-quota
warnings, and reset-time backoff — driven entirely through an injectable
clock/sleeper and a header-emitting stub transport, mirroring the
reference's check_rate_limit behaviour
(/root/reference/src/extract_github_data.py:372-391)."""

from __future__ import annotations

from ag_data_ingestion_github_to_snowflake_spark.sources.rest import (
    HeaderRateLimitGovernor,
)


class HeaderStub:
    """Serves a fixed quota window; each response reports remaining and
    the epoch at which the window resets."""

    def __init__(self, quota: int, reset_at: float):
        self.quota = quota
        self.reset_at = reset_at
        self.calls = 0

    def __call__(self, path: str, params: dict):
        self.calls += 1
        remaining = max(self.quota - self.calls, 0)
        headers = {
            "X-RateLimit-Remaining": str(remaining),
            "X-RateLimit-Reset": str(self.reset_at),
        }
        return 200, {"ok": self.calls}, headers


def make_governor(start: float = 1000.0, **kw):
    state = {"now": start}
    sleeps: list[float] = []

    def clock() -> float:
        return state["now"]

    def sleeper(s: float) -> None:
        sleeps.append(s)
        state["now"] += s

    gov = HeaderRateLimitGovernor(clock=clock, sleeper=sleeper, **kw)
    return gov, state, sleeps


def test_observe_parses_headers_case_insensitively():
    gov, _, _ = make_governor()
    gov.observe({"x-ratelimit-remaining": "42", "X-RATELIMIT-RESET": "1234.5"})
    assert gov.remaining == 42
    assert gov.reset_at == 1234.5
    gov.observe({})  # absent headers leave state unchanged
    assert gov.remaining == 42


def test_warns_below_threshold():
    gov, _, _ = make_governor()
    for remaining in (10, 5, 4, 2):
        gov.observe({"X-RateLimit-Remaining": str(remaining)})
    assert gov.warnings == [
        "rate limit low: 4 requests remaining",
        "rate limit low: 2 requests remaining",
    ]


def test_backoff_waits_until_server_reset():
    gov, state, sleeps = make_governor(start=1000.0)
    gov.observe({"X-RateLimit-Remaining": "0", "X-RateLimit-Reset": "1300"})
    gov.before_call()
    assert sleeps == [300.0]
    assert state["now"] == 1300.0
    # state cleared: next call proceeds without sleeping again
    gov.before_call()
    assert sleeps == [300.0]


def test_backoff_floor_is_min_backoff():
    """Reset already passed (or unknown) still sleeps the reference's
    minimum 60 s."""
    gov, _, sleeps = make_governor(start=5000.0)
    gov.observe({"X-RateLimit-Remaining": "0", "X-RateLimit-Reset": "4000"})
    gov.before_call()
    assert sleeps == [60.0]
    gov.observe({"X-RateLimit-Remaining": "0"})  # no reset header
    gov.before_call()
    assert sleeps == [60.0, 60.0]


def test_wrapped_transport_schedule_end_to_end():
    """Exhaust a 3-call window, see exactly one backoff to the reset
    time, then keep calling in the fresh window."""
    gov, state, sleeps = make_governor(start=100.0)
    stub = HeaderStub(quota=3, reset_at=700.0)
    governed = gov.wrap(stub)

    for i in range(1, 4):
        status, payload = governed("/repositories", {})
        assert status == 200 and payload == {"ok": i}
    assert gov.remaining == 0
    assert sleeps == []  # backoff happens before the NEXT call, not eagerly

    governed("/repositories", {})
    assert sleeps == [600.0]  # 700 - 100
    assert state["now"] == 700.0
    assert stub.calls == 4
    assert any("0 requests remaining" in w for w in gov.warnings)
