"""robots.txt (RFC 9309) parsing and matching, pure stdlib.

Crawl-derived corpora carry compliance obligations: a curation
pipeline that re-processes or re-publishes crawled pages needs to
evaluate the site's robots policy per URL. This implements the RFC
9309 Robots Exclusion Protocol from the public spec:

- groups: consecutive ``User-agent`` lines share the following rules;
  matching is the LONGEST user-agent token match, `*` as fallback;
- rules: ``Allow`` / ``Disallow`` path patterns with `*` wildcards and
  `$` end-anchor; the most specific (longest-pattern) rule wins, and
  on a length tie Allow wins (the spec's least-restrictive tiebreak);
- an empty Disallow means allow-all; unknown directives are ignored;
  parsing never raises (robots files in the wild are messy).

Reference parity: none — SURVEY §2.3 training-data scope. Matching is
a pure per-row function; use it inside Arrow-batched stages keyed by
(host, path) with the per-host policy broadcast or join-distributed.
"""

from __future__ import annotations

__all__ = ["RobotsPolicy"]


def _pattern_match(pattern: str, path: str) -> bool:
    """RFC 9309 path-pattern match: literal prefix with `*` matching
    any run (including empty) and a trailing `$` anchoring the end.
    Iterative greedy scan — no regex compilation per row.

    With `$`, the final literal is pinned to the path's END (not its
    first occurrence after the middles): '/*.json$' must match
    '/data/feed.json.json' even though '.json' also occurs earlier.
    Middle literals are then constrained to the prefix before that
    suffix; greedy leftmost placement is complete once the end is
    fixed, so no backtracking is needed."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    if not path.startswith(parts[0]):
        return False
    if len(parts) == 1:
        return path == parts[0] if anchored else True
    last = parts[-1]
    if anchored and last:
        if not path.endswith(last):
            return False
        limit = len(path) - len(last)
        mids = parts[1:-1]
    else:
        limit = len(path)
        mids = parts[1:] if not anchored else parts[1:-1]
    pos = len(parts[0])
    for part in mids:
        j = path.find(part, pos, limit)
        if j < 0:
            return False
        pos = j + len(part)
    return pos <= limit


class RobotsPolicy:
    """Parsed robots.txt: ``allowed(agent, path)`` per RFC 9309."""

    __slots__ = ("groups",)

    def __init__(self, groups: list[tuple[list[str], list[tuple[bool, str]]]]):
        self.groups = groups

    @classmethod
    def parse(cls, text: str) -> "RobotsPolicy":
        groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        agents: list[str] = []
        rules: list[tuple[bool, str]] = []
        in_agents = False

        def flush() -> None:
            nonlocal agents, rules
            if agents:
                groups.append((agents, rules))
            agents, rules = [], []

        for raw in text.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, val = line.partition(":")
            key = key.strip().lower()
            val = val.strip()
            if key == "user-agent":
                if not in_agents:
                    flush()
                    in_agents = True
                agents.append(val.lower())
            elif key in ("allow", "disallow"):
                in_agents = False
                if key == "disallow" and val == "":
                    # empty Disallow: allow-all — representable as a
                    # zero-length Allow (matches everything, loses
                    # every specificity contest, as the spec intends)
                    rules.append((True, ""))
                elif val:
                    rules.append((key == "allow", val))
            else:
                # sitemap/crawl-delay/unknown: RFC 9309 says such lines
                # MUST be ignored — in particular they do NOT terminate
                # a start-of-group run of User-agent lines, so
                # 'UA: a / Sitemap: … / UA: b / Disallow: /x' keeps a
                # and b in ONE group sharing the rules.
                pass
        flush()
        return cls(groups)

    def _group_for(self, agent: str) -> list[tuple[bool, str]] | None:
        """Longest user-agent token match; '*' is the fallback."""
        agent = agent.lower()
        best_len = -1
        best: list[tuple[bool, str]] | None = None
        star: list[tuple[bool, str]] | None = None
        for agents, rules in self.groups:
            for a in agents:
                if a == "*":
                    if star is None:
                        star = rules
                elif a and a in agent and len(a) > best_len:
                    best_len = len(a)
                    best = rules
        return best if best is not None else star

    def allowed(self, agent: str, path: str) -> bool:
        """True when ``agent`` may fetch ``path``. No matching group or
        no matching rule → allowed (the spec's default)."""
        rules = self._group_for(agent)
        if not rules:
            return True
        if not path.startswith("/"):
            path = "/" + path
        verdict = True
        best_len = -1
        for allow, pattern in rules:
            if _pattern_match(pattern, path):
                plen = len(pattern)
                if plen > best_len or (plen == best_len and allow and not verdict):
                    best_len = plen
                    verdict = allow
        return verdict
