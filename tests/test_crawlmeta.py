"""Crawl-metadata sources: sitemap <loc> extraction, robots.txt group
parsing, and disallow filtering with longest-match Allow precedence.
Pure-Python expectations are hand-derived per the documented subset.
"""

from __future__ import annotations

import gzip

from ontology_mapping_spark.sources.crawlmeta import (
    filter_disallowed,
    read_sitemaps,
    robots_rules,
)

_SITEMAP = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://a.example/page1</loc><lastmod>2026-01-01</lastmod></url>
  <url><loc>
      http://a.example/page2
  </loc></url>
  <url><changefreq>daily</changefreq></url>
</urlset>
"""

_SITEMAP_INDEX = b"""<sitemapindex>
  <sitemap><loc>http://a.example/sitemap-a.xml.gz</loc></sitemap>
  <sitemap><loc>http://a.example/sitemap-b.xml.gz</loc></sitemap>
</sitemapindex>
"""


def test_read_sitemaps_plain_and_gz(spark, tmp_path):
    (tmp_path / "m.xml").write_bytes(_SITEMAP)
    (tmp_path / "idx.xml.gz").write_bytes(gzip.compress(_SITEMAP_INDEX))
    got = read_sitemaps(spark, str(tmp_path)).collect()
    urls = sorted(r.url for r in got)
    # whitespace-trimmed, multiline <loc> handled, entry without <loc>
    # contributes nothing; the index file's sitemap urls come through
    assert urls == [
        "http://a.example/page1",
        "http://a.example/page2",
        "http://a.example/sitemap-a.xml.gz",
        "http://a.example/sitemap-b.xml.gz",
    ]
    by_file = {r.url: r.sitemap for r in got}
    assert by_file["http://a.example/page1"].endswith("m.xml")


def test_sitemap_loc_xml_entities_unescaped(spark, tmp_path):
    # the protocol REQUIRES entity-escaping loc values; extraction must
    # undo it or query-string urls never join the crawl's real urls —
    # and a double-escaped &amp;lt; decodes to the literal text &lt;
    sm = (
        b"<urlset><url><loc>http://a.example/q?x=1&amp;y=2</loc></url>"
        b"<url><loc>http://a.example/odd?t=&amp;lt;b&amp;gt;&apos;</loc></url>"
        b"</urlset>"
    )
    (tmp_path / "e.xml").write_bytes(sm)
    urls = sorted(r.url for r in read_sitemaps(spark, str(tmp_path)).collect())
    assert urls == [
        "http://a.example/odd?t=&lt;b&gt;'",
        "http://a.example/q?x=1&y=2",
    ]
    from ontology_mapping_spark.sources.crawlmeta import sitemap_entries

    got = {r.url for r in sitemap_entries(spark, str(tmp_path)).collect()}
    assert "http://a.example/q?x=1&y=2" in got


_ROBOTS = """# comment line
User-agent: googlebot
Disallow: /google-only

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow:
allow: /lowercase-directive

User-agent: otherbot
Disallow: /other
"""


def test_xml_unescape_matches_stdlib_reference(spark):
    # the 5-entity unescape must agree with xml.sax.saxutils.unescape
    # (the stdlib reference for exactly this contract) on adversarial
    # inputs — double escapes, bare '&', unknown entities, truncated
    # entities; one Spark job scores the whole corpus
    from xml.sax.saxutils import unescape

    from pyspark.sql import functions as F

    from ontology_mapping_spark.sources.crawlmeta import _xml_unescape

    cases = [
        "a&amp;b", "&amp;amp;", "&amp;lt;", "&lt;&gt;&quot;&apos;&amp;",
        "x&unknown;y", "&", "&&amp;", "&amp", "q?x=1&amp;y=2&amp;z=%26",
        "", "plain", "&apos;&apos;", "&amp;&amp;", "a&gt;&amp;lt;b",
        "&quot;q&quot;&amp;r", "%26amp%3B", "&AMP;",  # entities are case-sensitive
    ]
    want = {c: unescape(c, {"&quot;": '"', "&apos;": "'"}) for c in cases}
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {
        r.s: r.u
        for r in df.select("s", _xml_unescape(F.col("s")).alias("u")).collect()
    }
    assert got == want


def test_robots_sitemap_records(spark):
    # Sitemap: records are group-independent (valid anywhere in the
    # file), case-insensitive on the token, comment-stripped, and absent
    # bodies contribute nothing; binary bodies decode like robots_rules
    from ontology_mapping_spark.sources.crawlmeta import robots_sitemaps

    body = (
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: http://a.example/sitemap.xml\n"
        "sitemap:http://a.example/sitemap2.xml.gz  # news feed\n"
        "User-agent: otherbot\n"
        "SITEMAP: http://a.example/deep/sm.xml\n"
    )
    df = spark.createDataFrame(
        [("a.example", body), ("b.example", "User-agent: *\nDisallow:\n")],
        "host string, body string",
    )
    got = sorted((r.host, r.sitemap) for r in robots_sitemaps(df).collect())
    assert got == [
        ("a.example", "http://a.example/deep/sm.xml"),
        ("a.example", "http://a.example/sitemap.xml"),
        ("a.example", "http://a.example/sitemap2.xml.gz"),
    ]
    bdf = spark.createDataFrame(
        [("c.example", body.encode())], "host string, body binary"
    )
    assert robots_sitemaps(bdf).count() == 3


def test_robots_rules_group_scoping(spark):
    df = spark.createDataFrame([("a.example", _ROBOTS)], "host string, body string")
    got = sorted(
        (r.rule, r.prefix) for r in robots_rules(df, agent="*").collect()
    )
    # only the '*' group binds: googlebot/otherbot rules drop, the empty
    # Disallow drops, case-insensitive 'allow:' parses
    assert got == [
        ("allow", "/lowercase-directive"),
        ("allow", "/private/ok"),
        ("disallow", "/private"),
    ]
    # RFC 9309 most-specific group: a named agent binds ONLY its own
    # group — the '*' group is ignored when a named group exists
    got_g = sorted(
        (r.rule, r.prefix)
        for r in robots_rules(df, agent="googlebot").collect()
    )
    assert got_g == [("disallow", "/google-only")]


def test_robots_rules_stacked_user_agents(spark):
    # consecutive User-agent lines form ONE group binding all of them
    body = "User-agent: adsbot\nUser-agent: mybot\nDisallow: /private\n"
    df = spark.createDataFrame([("a.example", body)], "host string, body string")
    for a in ("adsbot", "mybot"):
        got = [(r.rule, r.prefix) for r in robots_rules(df, agent=a).collect()]
        assert got == [("disallow", "/private")], a
    # and a rule line CLOSES the group: a later UA starts a new one
    body2 = "User-agent: adsbot\nDisallow: /a\nUser-agent: mybot\nDisallow: /b\n"
    df2 = spark.createDataFrame([("a.example", body2)], "host string, body string")
    got2 = [(r.rule, r.prefix) for r in robots_rules(df2, agent="mybot").collect()]
    assert got2 == [("disallow", "/b")]


def test_robots_empty_disallow_closes_group(spark):
    # RFC 9309: an empty ``Disallow:`` (allow-all) emits no rule but IS a
    # rule line — it ends the startgroupline run, so the next User-agent
    # begins a NEW group whose rules must not bind the earlier agents.
    body = (
        "User-agent: adsbot\nDisallow:\n"
        "User-agent: otherbot\nDisallow: /other\n"
    )
    df = spark.createDataFrame([("a.example", body)], "host string, body string")
    # adsbot's group is allow-all: no rules, and otherbot's /other must
    # NOT cross-bind to adsbot
    got_ads = [(r.rule, r.prefix) for r in robots_rules(df, agent="adsbot").collect()]
    assert got_ads == []
    got_other = [
        (r.rule, r.prefix) for r in robots_rules(df, agent="otherbot").collect()
    ]
    assert got_other == [("disallow", "/other")]


def test_robots_rules_case_insensitive_agent(spark):
    df = spark.createDataFrame(
        [("a.example", "User-agent: MyBot\nDisallow: /x\n")],
        "host string, body string",
    )
    got = [(r.rule, r.prefix) for r in robots_rules(df, agent="mybot").collect()]
    assert got == [("disallow", "/x")]


def test_robots_named_group_overrides_star_even_for_allows(spark):
    # the union of named + '*' groups was actively unsafe: a generic
    # '*' Allow must NOT override a named-agent Disallow
    body = (
        "User-agent: mybot\nDisallow: /secret\n\n"
        "User-agent: *\nAllow: /secret/x\n"
    )
    robots = spark.createDataFrame([("a.example", body)], "host string, body string")
    urls = spark.createDataFrame(
        [("http://a.example/secret/x/page",)], "url string"
    )
    kept = filter_disallowed(urls, robots_rules(robots, agent="mybot"))
    assert kept.count() == 0


def test_filter_disallowed_wildcards(spark):
    # RFC 9309 §2.2.3: '*' any-run, trailing '$' end anchor
    rules = spark.createDataFrame(
        [
            ("a.example", "disallow", "/*.pdf$"),
            ("a.example", "disallow", "/search*"),
            ("a.example", "disallow", "/tmp$"),
        ],
        "host string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [
            ("http://a.example/doc.pdf",),       # *.pdf$ -> drop
            ("http://a.example/doc.pdf.html",),  # $ anchor -> keep
            ("http://a.example/searching/x",),   # /search* -> drop
            ("http://a.example/tmp",),           # exact via $ -> drop
            ("http://a.example/tmpX",),          # $ anchor -> keep
            ("http://a.example/regex.chars(+)",),# literal metachars -> keep
        ],
        "url string",
    )
    got = sorted(r.url for r in filter_disallowed(urls, rules).collect())
    assert got == [
        "http://a.example/doc.pdf.html",
        "http://a.example/regex.chars(+)",
        "http://a.example/tmpX",
    ]


def test_filter_disallowed_longest_match(spark):
    rules = spark.createDataFrame(
        [
            ("a.example", "disallow", "/private"),
            ("a.example", "allow", "/private/ok"),
        ],
        "host string, rule string, prefix string",
    )
    urls = spark.createDataFrame(
        [
            ("http://a.example/public",),        # no rule matches -> keep
            ("http://a.example/private/x",),     # disallow -> drop
            ("http://a.example/private/ok/y",),  # longer allow -> keep
            ("http://b.example/private/x",),     # host without rules -> keep
            ("http://a.example",),               # empty path '/' -> keep
        ],
        "url string",
    )
    got = sorted(r.url for r in filter_disallowed(urls, rules).collect())
    assert got == [
        "http://a.example",
        "http://a.example/private/ok/y",
        "http://a.example/public",
        "http://b.example/private/x",
    ]


def test_filter_disallowed_root_block(spark):
    rules = spark.createDataFrame(
        [("a.example", "disallow", "/")], "host string, rule string, prefix string"
    )
    urls = spark.createDataFrame(
        [("http://a.example/x",), ("http://a.example",), ("http://b.example/x",)],
        "url string",
    )
    got = sorted(r.url for r in filter_disallowed(urls, rules).collect())
    assert got == ["http://b.example/x"]


def test_robots_binary_body_and_frontier_composition(spark):
    # binary robots bodies decode; the chain robots -> rules -> frontier
    # filter composes with crawl_frontier's output shape
    from ontology_mapping_spark.operators.linkgraph import crawl_frontier

    robots = spark.createDataFrame(
        [("h1.example", "User-agent: *\nDisallow: /no\n".encode())],
        "host string, body binary",
    )
    links = spark.createDataFrame(
        [("http://h1.example/ok",), ("http://h1.example/no/page",)],
        "dst_url string",
    )
    frontier = crawl_frontier(links, per_host=10)
    kept = filter_disallowed(frontier, robots_rules(robots), url_col="url")
    assert [r.url for r in kept.collect()] == ["http://h1.example/ok"]


def test_sitemap_discovery_loop_composition(spark, tmp_path):
    # the full discovery loop: robots bodies yield sitemap urls
    # (robots_sitemaps), the fetched files yield entries with lastmod
    # (sitemap_entries), and stale_urls schedules the recrawl — each
    # stage's output is the next stage's input shape, no glue needed
    from datetime import datetime, timezone

    from ontology_mapping_spark.sources.crawlmeta import (
        robots_sitemaps,
        sitemap_entries,
        stale_urls,
    )

    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /no\nSitemap: http://a.example/sm.xml\n")],
        "host string, body string",
    )
    sm_urls = {r.sitemap for r in robots_sitemaps(robots).collect()}
    assert sm_urls == {"http://a.example/sm.xml"}
    # "fetch" the discovered sitemap: write the file a crawler would GET
    (tmp_path / "sm.xml").write_bytes(
        b"<urlset>"
        b"<url><loc>http://a.example/fresh</loc><lastmod>2026-03-02</lastmod></url>"
        b"<url><loc>http://a.example/stale</loc><lastmod>2026-01-02</lastmod></url>"
        b"<url><loc>http://a.example/new</loc></url>"
        b"</urlset>"
    )
    entries = sitemap_entries(spark, str(tmp_path))
    captures = spark.createDataFrame(
        [
            ("http://a.example/fresh", datetime(2026, 2, 1, tzinfo=timezone.utc)),
            ("http://a.example/stale", datetime(2026, 2, 1, tzinfo=timezone.utc)),
        ],
        "url string, warc_ts timestamp",
    )
    got = sorted(r.url for r in stale_urls(entries, captures).collect())
    # fresh: lastmod after capture; new: never captured; stale: captured
    # after its lastmod -> not scheduled
    assert got == ["http://a.example/fresh", "http://a.example/new"]


def test_sitemap_entries_lastmod_pairing(spark, tmp_path):
    from ontology_mapping_spark.sources.crawlmeta import sitemap_entries

    xml = b"""<urlset>
      <url><loc>http://a.example/1</loc><lastmod>2026-02-01</lastmod></url>
      <url><loc>http://a.example/2</loc></url>
      <url><lastmod>2026-02-03</lastmod><loc>http://a.example/3</loc></url>
      <url><loc>http://a.example/4</loc>
           <lastmod>2026-02-04T05:06:07+02:00</lastmod></url>
    </urlset>"""
    (tmp_path / "m.xml").write_bytes(xml)
    got = {r.url: r.lastmod for r in sitemap_entries(spark, str(tmp_path)).collect()}
    # block scoping: the entry WITHOUT lastmod must not steal its
    # neighbour's (a flat loc/lastmod zip would mis-pair here)
    assert got["http://a.example/2"] is None
    assert got["http://a.example/1"].day == 1
    assert got["http://a.example/3"].day == 3
    # tz offset parses (UTC session: 05:06:07+02:00 == 03:06:07Z)
    assert (got["http://a.example/4"].hour, got["http://a.example/4"].day) == (3, 4)


def test_stale_urls_semantics(spark):
    from datetime import datetime

    from ontology_mapping_spark.sources.crawlmeta import stale_urls

    entries = spark.createDataFrame(
        [
            ("http://a/new", datetime(2026, 2, 1)),      # never captured
            ("http://a/fresh", datetime(2026, 1, 1)),    # captured later
            ("http://a/stale", datetime(2026, 3, 1)),    # captured earlier
            ("http://a/nolm", None),                     # captured, no lastmod
            ("http://a/nolm-new", None),                 # new, no lastmod
        ],
        "url string, lastmod timestamp",
    )
    captures = spark.createDataFrame(
        [
            ("http://a/fresh", datetime(2026, 2, 1)),
            ("http://a/stale", datetime(2026, 2, 1)),
            ("http://a/stale", datetime(2026, 1, 1)),    # older capture loses
            ("http://a/nolm", datetime(2026, 2, 1)),
        ],
        "url string, warc_ts timestamp",
    )
    got = sorted(r.url for r in stale_urls(entries, captures).collect())
    assert got == ["http://a/new", "http://a/nolm-new", "http://a/stale"]
