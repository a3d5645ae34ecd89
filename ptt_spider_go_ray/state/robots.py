"""robots.txt gating (north-rule addition; the reference has none).

Minimal, deterministic robots parser: ``User-agent`` groups, ``Disallow`` /
``Allow`` prefix rules, longest-match-wins (the de-facto standard from the
public robots.txt RFC 9309). Cached per host inside whatever holds it (the
Fetcher actor or the frontier shard)."""

from __future__ import annotations

from urllib.parse import urlparse


class RobotsRules:
    def __init__(self, rules: list[tuple[str, bool]]):
        # rules: (path_prefix, allowed); longest prefix wins, default allow
        self.rules = sorted(rules, key=lambda r: -len(r[0]))

    def allowed(self, path: str) -> bool:
        for prefix, allow in self.rules:
            if prefix and path.startswith(prefix):
                return allow
        return True

    @classmethod
    def parse(cls, text: str, agent: str = "*") -> "RobotsRules":
        rules: list[tuple[str, bool]] = []
        applies = False
        saw_group = False
        for raw in (text or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if saw_group and applies and val != "*" and agent == "*":
                    # new group after ours closed
                    applies = False
                applies = val == "*" or val.lower() in agent.lower()
                saw_group = True
            elif key == "disallow" and applies:
                if val:
                    rules.append((val, False))
            elif key == "allow" and applies:
                if val:
                    rules.append((val, True))
        return cls(rules)

    @classmethod
    def allow_all(cls) -> "RobotsRules":
        return cls([])


class RobotsCache:
    """Per-host robots rules, fetched once via the provided fetch_fn
    (url -> (status, bytes)). Missing/failed robots ⇒ allow all."""

    def __init__(self, fetch_fn):
        self.fetch_fn = fetch_fn
        self._cache: dict[str, RobotsRules] = {}

    def allowed(self, url: str) -> bool:
        p = urlparse(url)
        host = (p.netloc or "").lower()
        rules = self._cache.get(host)
        if rules is None:
            try:
                status, body = self.fetch_fn(f"https://{host}/robots.txt")
                rules = (
                    RobotsRules.parse(body.decode("utf-8", "replace"))
                    if status == 200
                    else RobotsRules.allow_all()
                )
            except Exception:
                rules = RobotsRules.allow_all()
            self._cache[host] = rules
        return rules.allowed(p.path or "/")
