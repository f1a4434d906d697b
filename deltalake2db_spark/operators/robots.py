"""robots.txt — parse + longest-match evaluation + URL screening.

The missing piece between WARC ingestion (``warc.py``) and URL
curation (``urls.py``): a compliant crawler-side screen.  Parsing and
matching follow the REP as specified in RFC 9309 (and Google's
documented semantics):

* groups are runs of ``User-agent`` lines followed by rules; a group
  applies to the most-specific matching agent token, falling back to
  ``*``;
* rule matching is LONGEST-MATCH-WINS over the path (with ``*``
  wildcards and ``$`` end anchors); on a length tie, ``allow`` wins;
* no matching rule means allowed; an empty ``Disallow:`` means
  allow-all;
* ``Crawl-delay`` and ``Sitemap`` are surfaced as metadata.

``filter_by_robots(urls_df, robots_df)`` is the Spark tier: robots
texts join the URL table on host (ONE host-keyed shuffle — the same
key the crawl is naturally partitioned by), and the matcher runs
map-side in ``mapInPandas`` with the parsed rule set memoized per
host within each batch.  Nothing corpus-sized broadcasts and nothing
re-shuffles: at crawl scale hosts are many but rules-per-host are
tiny, exactly this join's shape.

Reference scope: no ingestion tier in the reference (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_RULES = 10_000
_MAX_AGENTS = 1_000


def parse_robots(text: str) -> dict:
    """Parse a robots.txt body: ``{groups: {agent_lower: [(allow:
    bool, pattern: str), ...]}, crawl_delay: {agent: float},
    sitemaps: [str]}``.  Lines are ``field: value`` with ``#``
    comments; unknown fields are ignored; a ``User-agent`` line after
    rules starts a NEW group (RFC 9309 group building)."""
    groups: dict = {}
    delays: dict = {}
    sitemaps: list = []
    current: list = []       # agents of the group being built
    rules_open = False       # rules seen since the agent run started
    for raw in (text or "").splitlines()[: _MAX_RULES]:
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if rules_open or not current:
                if rules_open:
                    current = []
                rules_open = False
            agent = value.lower()
            if len(groups) < _MAX_AGENTS:
                current.append(agent)
                groups.setdefault(agent, [])
        elif field in ("allow", "disallow"):
            rules_open = True
            if not current:
                continue  # rules before any user-agent: ignored
            if field == "disallow" and value == "":
                continue  # empty Disallow == allow all (no rule)
            for agent in current:
                groups[agent].append((field == "allow", value))
        elif field == "crawl-delay":
            rules_open = True
            try:
                for agent in current:
                    delays[agent] = float(value)
            except ValueError:
                pass
        elif field == "sitemap":
            sitemaps.append(value)
    return {"groups": groups, "crawl_delay": delays,
            "sitemaps": sitemaps}


def _pattern_rx(pattern: str) -> re.Pattern:
    """robots pattern -> anchored regex: ``*`` is any run, ``$`` only
    at the end anchors; everything else is literal."""
    anchor = pattern.endswith("$")
    if anchor:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    rx = "^" + ".*".join(parts) + ("$" if anchor else "")
    return re.compile(rx)


def _rules_for(parsed: dict, agent: str) -> list:
    """The rule list applying to ``agent``: the longest user-agent
    token that is a substring of ``agent`` (Google's semantics),
    falling back to ``*``."""
    agent = (agent or "*").lower()
    groups = parsed["groups"]
    best = None
    for token in groups:
        if token != "*" and token in agent:
            if best is None or len(token) > len(best):
                best = token
    if best is None:
        best = "*" if "*" in groups else None
    return groups.get(best, []) if best is not None else []


def robots_allowed(
    parsed: dict, path: str, agent: str = "*"
) -> bool:
    """Longest-match-wins evaluation; allow wins length ties; no
    match means allowed."""
    if not path.startswith("/"):
        path = "/" + path
    best_len = -1
    best_allow = True
    for allow, pattern in _rules_for(parsed, agent):
        if _pattern_rx(pattern).match(path):
            # specificity = literal pattern length (RFC 9309 uses
            # octet length of the pattern)
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow


def filter_by_robots(
    urls_df: DataFrame,
    robots_df: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    keep_blocked: bool = False,
) -> DataFrame:
    """Screen a URL table against per-host robots.txt bodies:
    ``urls_df`` columns pass through plus ``allowed`` boolean (rows
    with no robots entry are allowed — the crawler convention for a
    missing/unfetchable robots.txt is allow-all).  ``keep_blocked``
    returns all rows with the verdict; default drops blocked rows.

    Shape: one host-keyed equi-join (the crawl's natural key), then a
    map-side ``mapInPandas`` evaluation with the parse memoized per
    host inside each batch.  The robots side is (host, small text) —
    never corpus-sized rows."""
    from .urls import url_parts

    parts = url_parts(url_col)
    tagged = urls_df.withColumn("__host", parts.host).withColumn(
        "__path",
        F.when(parts.path == "", F.lit("/")).otherwise(parts.path),
    )
    rb = robots_df.select(
        F.lower(F.col(host_col)).alias("__host"),
        F.col(robots_col).alias("__robots"),
    )
    joined = tagged.join(rb, "__host", "left")
    base_cols = urls_df.columns
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in urls_df.schema.fields
    ) + ", allowed boolean"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in it:
            verdicts = []
            for robots, path in zip(pdf["__robots"], pdf["__path"]):
                if robots is None:
                    verdicts.append(True)
                    continue
                # Key the memo by content: the cache outlives the
                # pandas batch, so an identity key (id()) could be
                # recycled by a different host's robots body in a
                # later batch and return stale rules. Hashing the
                # string is cheap next to parsing it. Bounded: a
                # partition spanning millions of hosts (each body up
                # to ~500 KB) must not accumulate them all — reset
                # past 4096 entries. After a sort-merge host join the
                # rows arrive host-clustered so evictions rarely
                # recur; under a broadcast join an interleaved reset
                # costs a re-parse, the safe side of the trade.
                parsed = cache.get(robots)
                if parsed is None:
                    if len(cache) >= 4096:
                        cache.clear()
                    parsed = parse_robots(robots)
                    cache[robots] = parsed
                verdicts.append(
                    robots_allowed(parsed, path or "/", agent)
                )
            out = pdf[base_cols].copy()
            out["allowed"] = verdicts
            yield out

    from .parallel import kernel_map

    if keep_blocked:
        return kernel_map(joined, batches, out_schema)

    # default (drop blocked rows): apply the verdict INSIDE the kernel
    # instead of a JVM filter+drop above it — same rows, but the
    # returned frame is then a pure kernel output, so a directly-
    # downstream extraction kernel (the crawl pipeline's HTML extract)
    # fuses with the robots evaluation into ONE Python stage
    # (parallel.kernel_map; guide §4.1).
    def batches_drop(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for out in batches(it):
            yield out.loc[out["allowed"], base_cols]

    drop_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in urls_df.schema.fields
    )
    return kernel_map(joined, batches_drop, drop_schema)
