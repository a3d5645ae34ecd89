"""Per-host politeness token buckets (T3 generalization).

The reference sleeps U(minMs, maxMs) before every article fetch and every
image download per worker (crawler/crawler.go:59-65,485-498,763-774) — on a
single host that is a global rate cap of ``workers / mean_delay`` req/s. At
engine scale politeness must be per-host and shared across the fetch pool,
so the budget lives in the frontier shards (a shard owns a host partition —
hash-by-host keeps each host's URLs in exactly one shard, making its token
bucket globally correct without cross-actor coordination, SURVEY §7.5.2).

The clock is injectable so tests and the deterministic bench can run with a
virtual clock (no real sleeping) while preserving release ordering.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class TokenBucket:
    rate: float           # tokens per second
    burst: float          # bucket capacity
    clock: object = time.monotonic
    tokens: float = field(default=0.0)
    _last: float | None = None

    def __post_init__(self) -> None:
        self.tokens = self.burst

    def try_take(self, n: float = 1.0) -> bool:
        now = self.clock()
        if self._last is None:
            self._last = now
        self.tokens = min(self.burst, self.tokens + (now - self._last) * self.rate)
        self._last = now
        if self.tokens >= n:
            self.tokens -= n
            return True
        return False


class HostPoliteness:
    """Per-host bucket map. rate==0 disables limiting (test/bench mode where
    determinism matters more than pacing)."""

    def __init__(self, rate: float = 0.0, burst: float | None = None, clock=time.monotonic,
                 rate_for=None, burst_s: float = 1.0):
        """``rate_for``: optional host → req/s callable for per-host budgets
        (a frontier shard owning 1/k of a host's URLs passes the host's full
        rate divided by the ACTUAL number of owning shards). When set,
        ``rate`` is only the ==0 on/off switch and each host's bucket gets
        rate_for(host) with capacity burst_s seconds of that rate."""
        self.rate = rate
        self.burst = burst if burst is not None else max(1.0, rate)
        self.clock = clock
        self.rate_for = rate_for
        self.burst_s = burst_s
        self._buckets: dict[str, TokenBucket] = {}
        self._cooldown_until: dict[str, float] = {}
        # per-host rate overrides (robots.txt Crawl-delay): win over both
        # rate_for and the flat rate when present
        self._host_rate: dict[str, float] = {}

    def cooldown(self, host: str, seconds: float) -> None:
        """Server-driven backoff (429 feedback): no requests to ``host``
        until now+seconds regardless of token balance. Extends, never
        shortens, an existing cooldown. Applies even when rate limiting is
        otherwise disabled — a 429'ing host must be backed off either way."""
        until = self.clock() + seconds
        if until > self._cooldown_until.get(host, 0.0):
            self._cooldown_until[host] = until

    def allow(self, host: str, n: int = 1) -> int:
        """How many of n requests to `host` may proceed now (0..n)."""
        until = self._cooldown_until.get(host)
        if until is not None:
            if self.clock() < until:
                return 0
            del self._cooldown_until[host]
        if self.rate <= 0:
            return n
        b = self._buckets.get(host)
        if b is None:
            r = self._host_rate.get(host)
            if r is None:
                r = self.rate_for(host) if self.rate_for is not None else self.rate
            cap = (
                max(1.0, r * self.burst_s)
                if self.rate_for is not None or host in self._host_rate
                else self.burst
            )
            b = self._buckets[host] = TokenBucket(r, cap, self.clock)
        granted = 0
        for _ in range(n):
            if not b.try_take():
                break
            granted += 1
        return granted

    def refund(self, host: str, n: int = 1) -> None:
        """Return tokens consumed for requests that were not actually made
        (e.g. rows a global merge pushed back to the queue). No-op when
        limiting is disabled or the host has no bucket yet."""
        if self.rate <= 0:
            return
        b = self._buckets.get(host)
        if b is not None:
            b.tokens = min(b.burst, b.tokens + n)

    def set_host_rate(self, host: str, rate: float) -> None:
        """Override ONE host's budget (robots.txt Crawl-delay). Only ever
        tightens: a higher-than-current rate is ignored — Crawl-delay may
        slow a crawler down, never entitle it to go faster. Re-rates an
        existing bucket in place (tokens clamped to the new capacity).
        No-op when limiting is disabled (rate==0 bench/test mode keeps its
        determinism)."""
        if self.rate <= 0 or rate <= 0:
            return
        cur = self._host_rate.get(host)
        if cur is None:
            cur = self.rate_for(host) if self.rate_for is not None else self.rate
        if rate >= cur:
            return
        self._host_rate[host] = rate
        b = self._buckets.get(host)
        if b is not None:
            b.rate = rate
            b.burst = max(1.0, rate * self.burst_s)
            b.tokens = min(b.tokens, b.burst)

    @classmethod
    def from_delay_range(cls, min_ms: int, max_ms: int, workers: int, clock=time.monotonic):
        """Map the reference's delay config onto an equivalent aggregate rate:
        workers / mean_delay (config/config.go:89-92 defaults → 10/1.25s = 8/s)."""
        mean_s = ((min_ms + max_ms) / 2.0) / 1000.0
        rate = workers / mean_s if mean_s > 0 else 0.0
        return cls(rate=rate, burst=float(workers), clock=clock)
