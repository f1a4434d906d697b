"""robots.txt parser/matcher tests (RFC 9309 semantics) + the Spark
host-join screening tier."""

from __future__ import annotations

import pytest

from deltalake2db_spark.operators.robots import (
    filter_by_robots,
    parse_robots,
    robots_allowed,
)

TXT = """
# example
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /tmp/*.bak$
Crawl-delay: 2

User-agent: googlebot
User-agent: bingbot
Disallow: /nobots/
Allow:

Sitemap: https://ex.com/sitemap.xml
"""


def test_parse_and_match_semantics():
    p = parse_robots(TXT)
    assert p["sitemaps"] == ["https://ex.com/sitemap.xml"]
    assert p["crawl_delay"]["*"] == 2.0
    assert robots_allowed(p, "/") is True
    assert robots_allowed(p, "/private/x") is False
    assert robots_allowed(p, "/private/ok") is True  # longest match
    assert robots_allowed(p, "/private/okno") is True
    assert robots_allowed(p, "/tmp/a.bak") is False  # wildcard+anchor
    assert robots_allowed(p, "/tmp/a.bakx") is True
    # the googlebot group is separate: * rules don't merge in
    assert robots_allowed(p, "/nobots/x") is True
    assert robots_allowed(p, "/nobots/x", "Googlebot/2.1") is False
    assert robots_allowed(p, "/private/x", "Googlebot/2.1") is True


def test_edge_cases():
    # empty Disallow == allow all
    p = parse_robots("User-agent: *\nDisallow:")
    assert robots_allowed(p, "/anything") is True
    # rules before any user-agent are ignored; junk lines tolerated
    p = parse_robots("Disallow: /x\njunk\nUser-agent: *\nDisallow: /y/")
    assert robots_allowed(p, "/x") is True
    assert robots_allowed(p, "/y/z") is False
    # a user-agent line after rules starts a NEW group
    p = parse_robots(
        "User-agent: a\nDisallow: /1/\nUser-agent: b\nDisallow: /2/"
    )
    assert robots_allowed(p, "/1/x", "a") is False
    assert robots_allowed(p, "/2/x", "a") is True
    assert robots_allowed(p, "/2/x", "b") is False
    # tie on pattern length: allow wins
    p = parse_robots("User-agent: *\nDisallow: /dirx\nAllow: /dir*$")
    assert robots_allowed(p, "/dirx") is True
    # empty / None bodies
    assert robots_allowed(parse_robots(""), "/a") is True
    assert robots_allowed(parse_robots(None), "/a") is True


def test_filter_by_robots_spark(spark):
    robots = spark.createDataFrame(
        [
            ("a.test", "User-agent: *\nDisallow: /sec/"),
            ("B.TEST", "User-agent: *\nDisallow: /"),
        ],
        ["host", "robots_txt"],
    )
    urls = spark.createDataFrame(
        [
            (0, "https://a.test/ok"),
            (1, "https://a.test/sec/x"),
            (2, "https://b.test/anything"),
            (3, "https://c.test/no-robots"),
            (4, "https://a.test"),  # empty path -> '/'
        ],
        ["url_id", "url"],
    )
    out = {
        r.url_id: r.allowed
        for r in filter_by_robots(
            urls, robots, keep_blocked=True
        ).collect()
    }
    assert out == {0: True, 1: False, 2: False, 3: True, 4: True}
    kept = sorted(
        r.url_id for r in filter_by_robots(urls, robots).collect()
    )
    assert kept == [0, 3, 4]


def test_large_bodies_cached_by_content_across_batches(spark):
    """Regression for the id()-keyed memo: two DISTINCT >256-char
    robots bodies flowing through consecutive 1-row Arrow batches must
    each be evaluated against their own rules — an identity cache key
    could be recycled between batches and return the wrong host's
    parse. Content keying makes this impossible."""
    filler = "\n".join(f"# pad {i}" for i in range(40))  # >256 chars
    body_a = f"{filler}\nUser-agent: *\nDisallow: /blocked-a/\n"
    body_b = f"{filler}\nUser-agent: *\nDisallow: /blocked-b/\n"
    assert len(body_a) > 256 and body_a != body_b
    robots = spark.createDataFrame(
        [("a.test", body_a), ("b.test", body_b)],
        ["host", "robots_txt"],
    )
    urls = spark.createDataFrame(
        [
            (0, "https://a.test/blocked-a/x"),
            (1, "https://a.test/blocked-b/x"),
            (2, "https://b.test/blocked-a/x"),
            (3, "https://b.test/blocked-b/x"),
        ],
        ["url_id", "url"],
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        out = {
            r.url_id: r.allowed
            for r in filter_by_robots(
                urls.coalesce(1), robots, keep_blocked=True
            ).collect()
        }
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    assert out == {0: False, 1: True, 2: True, 3: False}
