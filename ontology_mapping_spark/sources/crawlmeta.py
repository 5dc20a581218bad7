"""Crawl-metadata sources: sitemaps and robots.txt politeness rules.

The frontier loop (``linkgraph.crawl_frontier``) has two inputs besides
extracted links: URL lists the sites publish (sitemaps) and the paths
they forbid (robots.txt). Both are tiny-per-host, crawl-wide-large
tables — classic broadcast-side data — and both parse with pure
Catalyst string algebra (no Python in either path):

* :func:`read_sitemaps` — ``<loc>`` extraction over whole-file text
  reads (``.xml`` and ``.xml.gz``; Spark's text source inflates gzip
  transparently). Sitemap INDEX files list other sitemaps with the
  same ``<loc>`` tag — rows from an index are sitemap urls, and the
  caller fetches/recurses (no network here by design).
* :func:`robots_rules` — the documented robots subset: a
  ``User-agent:`` line opens a group; ``Disallow:``/``Allow:`` lines
  bind to the group when it names the crawler or ``*``; empty
  ``Disallow:`` means allow-all (dropped). Group state is a within-row
  ``F.aggregate`` over the split lines — robots bodies are hundreds of
  lines, so the per-element array append is bounded.
* :func:`filter_disallowed` — drop frontier urls whose PATH starts
  with any disallowed prefix for their host (longest-match Allow
  precedence within the same host, per the de-facto standard): rules
  collapse to one row per host (collect_list, broadcast), the url side
  never shuffles, and the verdict is a within-row array fold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOC_RE = r"(?s)<loc>\s*([^<]*?)\s*</loc>"
_PATH_RE = r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*([^#]*)"


def _xml_unescape(col: Column) -> Column:
    """Undo the XML entity escaping the sitemap protocol REQUIRES for
    ``<loc>`` values (a url with a query string is written
    ``a?x=1&amp;y=2``). Without this, extracted urls carry the literal
    ``&amp;`` and never join against the crawl's real urls. The five
    predefined entities; ``&amp;`` resolves LAST so ``&amp;lt;`` decodes
    to the literal text ``&lt;`` rather than ``<``."""
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def read_sitemaps(spark, path: str) -> DataFrame:
    """Sitemap / sitemap-index files -> (sitemap, url) rows.

    One row per ``<loc>`` entry; ``sitemap`` is the source file. Pure
    Catalyst: whole-file text scan + ``regexp_extract_all`` — the tag
    soup around ``<loc>`` (lastmod, changefreq, namespaces) never needs
    a real XML parser for this one field, and entries spanning lines
    parse fine under ``(?s)``."""
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("sitemap"),
            F.explode(
                F.regexp_extract_all("value", F.lit(LOC_RE), 1)
            ).alias("url"),
        )
        .select("sitemap", _xml_unescape(F.col("url")).alias("url"))
        .filter(F.col("url") != "")
    )


LASTMOD_RE = r"(?s)<lastmod>\s*([^<]*?)\s*</lastmod>"
_BLOCK_RE = r"(?s)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"


def sitemap_entries(spark, path: str) -> DataFrame:
    """Sitemap files -> (sitemap, url, lastmod) with ``lastmod`` parsed
    (NULL when the entry omits it — it is optional in the protocol).

    The per-entry pairing needs block scoping (a flat ``<loc>``/
    ``<lastmod>`` zip would mis-pair around entries missing one tag), so
    blocks extract first (``<url>``/``<sitemap>`` both), then the two
    fields within each block — still pure Catalyst. ``lastmod`` accepts
    the protocol's W3C datetime forms (date-only or timestamp with
    offset), which ``to_timestamp`` parses natively."""
    blocks = F.regexp_extract_all("value", F.lit(_BLOCK_RE), 1)
    b = F.col("b")
    return (
        spark.read.text(path, wholetext=True)
        .select(F.input_file_name().alias("sitemap"), F.explode(blocks).alias("b"))
        .select(
            "sitemap",
            _xml_unescape(F.trim(F.regexp_extract(b, LOC_RE, 1))).alias("url"),
            F.to_timestamp(
                F.nullif(F.regexp_extract(b, LASTMOD_RE, 1), F.lit(""))
            ).alias("lastmod"),
        )
        .filter(F.col("url") != "")
    )


def stale_urls(entries: DataFrame, captures: DataFrame) -> DataFrame:
    """Recrawl scheduling: sitemap entries whose content is newer than
    the last capture -> (url, lastmod, last_capture).

    Stale = never captured (new url — NULL ``last_capture``), or
    ``lastmod`` strictly after the latest capture. An entry WITHOUT a
    lastmod that has been captured is NOT stale (conservative: no
    freshness signal is not a recrawl order; cadence-based recrawl is
    the frontier's job). Shape: one partial+final max aggregate over
    captures, one join on the url key — both frontier-shaped."""
    last = captures.groupBy("url").agg(F.max("warc_ts").alias("last_capture"))
    return (
        entries.select("url", "lastmod")
        .join(last, "url", "left")
        .filter(
            F.col("last_capture").isNull()
            | (
                F.col("lastmod").isNotNull()
                & (F.col("lastmod") > F.col("last_capture"))
            )
        )
    )


def robots_rules(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, body) robots.txt table -> (host, rule, prefix) rows, per
    RFC 9309 group semantics.

    ``rule`` is ``allow`` or ``disallow``; ``prefix`` is the raw path
    pattern (wildcards resolve in :func:`filter_disallowed`).
    RFC-conformant points, each pinned by test:

    * CONSECUTIVE ``User-agent:`` lines form ONE group binding all the
      listed agents (a rule line closes the agent-accumulation phase;
      the next UA line after a rule starts a new group);
    * product tokens compare case-insensitively;
    * when any group names ``agent`` specifically, the ``*`` groups are
      IGNORED (most-specific-group rule) — even when the named group
      only allow-alls;
    * empty ``Disallow:`` (allow-all) contributes no rule but IS a rule
      line — it closes the agent-accumulation phase like any other rule,
      so the next ``User-agent:`` starts a fresh group; comments and
      unknown lines skip.

    The scan is a within-row fold over the split lines — acc =
    (collecting?, named-active?, star-active?, named-seen?, named
    rules, star rules); no shuffle, no Python."""
    agent_l = agent.lower()
    lines = F.split(F.col("body"), r"\r?\n")
    empty_rules = F.array().cast("array<struct<rule:string,prefix:string>>")

    def step(acc: Column, line: Column) -> Column:
        t = F.trim(F.regexp_replace(line, r"#.*$", ""))
        low = F.lower(t)
        ua = F.trim(F.regexp_extract(t, r"(?i)^user-agent:\s*(.*)$", 1))
        dis = F.trim(F.regexp_extract(t, r"(?i)^disallow:\s*(.*)$", 1))
        alw = F.trim(F.regexp_extract(t, r"(?i)^allow:\s*(.*)$", 1))
        is_ua = low.startswith("user-agent:")
        is_dis = low.startswith("disallow:") & (dis != "")
        is_alw = low.startswith("allow:") & (alw != "")
        is_rule = is_dis | is_alw
        # RFC 9309: ANY allow/disallow line (even an empty allow-all
        # ``Disallow:``) ends the startgroupline run — group closing must
        # not depend on whether the line emits a rule.
        is_rule_line = low.startswith("disallow:") | low.startswith("allow:")
        named_hit = F.lower(ua) == F.lit(agent_l)
        star_hit = ua == "*"
        new_group = is_ua & ~acc["collecting"]
        a_named = (
            F.when(new_group, named_hit)
            .when(is_ua, acc["a_named"] | named_hit)
            .otherwise(acc["a_named"])
        )
        a_star = (
            F.when(new_group, star_hit)
            .when(is_ua, acc["a_star"] | star_hit)
            .otherwise(acc["a_star"])
        )
        collecting = (
            F.when(is_ua, F.lit(True))
            .when(is_rule_line, F.lit(False))
            .otherwise(acc["collecting"])
        )
        entry = F.when(
            is_dis,
            F.array(F.struct(F.lit("disallow").alias("rule"), dis.alias("prefix"))),
        ).otherwise(
            F.array(F.struct(F.lit("allow").alias("rule"), alw.alias("prefix")))
        )
        named = F.concat(
            acc["named"],
            F.when(is_rule & a_named, entry).otherwise(empty_rules),
        )
        star = F.concat(
            acc["star"],
            F.when(is_rule & a_star, entry).otherwise(empty_rules),
        )
        return F.struct(
            collecting.alias("collecting"),
            a_named.alias("a_named"),
            a_star.alias("a_star"),
            (acc["named_seen"] | (is_ua & named_hit)).alias("named_seen"),
            named.alias("named"),
            star.alias("star"),
        )

    acc0 = F.struct(
        F.lit(False).alias("collecting"),
        F.lit(False).alias("a_named"),
        F.lit(False).alias("a_star"),
        F.lit(False).alias("named_seen"),
        empty_rules.alias("named"),
        empty_rules.alias("star"),
    )
    body = F.col("body")
    if dict(robots.dtypes).get("body") == "binary":
        body = F.decode(body, "UTF-8")
    folded = F.aggregate(lines, acc0, step)
    picked = F.when(folded["named_seen"], folded["named"]).otherwise(
        folded["star"]
    )
    return (
        robots.select("host", body.alias("body"))
        .select("host", F.explode(picked).alias("r"))
        .select(
            "host", F.col("r.rule").alias("rule"), F.col("r.prefix").alias("prefix")
        )
    )


def robots_sitemaps(robots: DataFrame) -> DataFrame:
    """(host, body) robots.txt table -> (host, sitemap) rows from the
    ``Sitemap:`` records (RFC 9309 §2.2.4 "other records"; the de-facto
    sitemap-discovery channel — crawlers learn sitemap urls HERE, then
    :func:`read_sitemaps`/:func:`sitemap_entries` parse the fetched
    files, closing the robots → sitemap → frontier loop).

    Per the sitemaps protocol the record is GROUP-INDEPENDENT (valid
    anywhere in the file, regardless of user-agent sections), so this is
    a flat line scan, not a fold: one regexp_extract_all over the body —
    pure Catalyst, zero Python, zero shuffle. The token compares
    case-insensitively; values are absolute urls by spec and pass
    through verbatim (trailing comments stripped)."""
    body = F.col("body")
    if dict(robots.dtypes).get("body") == "binary":
        body = F.decode(body, "UTF-8")
    urls = F.regexp_extract_all(
        body, F.lit(r"(?im)^[ \t]*sitemap:[ \t]*([^#\r\n]*)"), 1
    )
    return (
        robots.select("host", urls.alias("u"))
        .select("host", F.explode("u").alias("sitemap"))
        .select("host", F.trim("sitemap").alias("sitemap"))
        .filter(F.col("sitemap") != "")
    )


def _rule_regex(prefix: Column) -> Column:
    """Robots path pattern -> anchored Java regex (RFC 9309 §2.2.3):
    ``*`` matches any char run, a TRAILING ``$`` anchors the end, every
    other char is literal. A plain prefix compiles to ``^literal`` —
    exactly startswith — so the one matching code path covers both."""
    esc = F.regexp_replace(prefix, r"([.^+?(){}\[\]|\\])", r"\\$1")
    ends = prefix.endswith("$")
    body = F.when(ends, F.substring(esc, 1, F.length(esc) - 1)).otherwise(esc)
    body = F.replace(body, F.lit("$"), F.lit("\\$"))  # mid-pattern $ literal
    body = F.replace(body, F.lit("*"), F.lit(".*"))
    return F.concat(
        F.lit("^"), body, F.when(ends, F.lit("$")).otherwise(F.lit(""))
    )


def filter_disallowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop urls whose path a disallow rule covers — longest-match
    Allow precedence per RFC 9309 (an ``Allow:`` pattern at least as
    long as the longest matching ``Disallow:`` keeps the url;
    specificity = raw pattern length, the de-facto standard). Patterns
    resolve ``*``/trailing-``$`` wildcards via :func:`_rule_regex`. A
    host with no rules passes everything.

    Shape: rules collapse to one array per host with their regexes
    precompiled on the (tiny, broadcast) rules side; the url side joins
    on host and folds the array within-row ONCE per kind (the two fold
    results are materialized as columns — re-deriving them inside the
    boolean would re-run the O(|rules|) fold per reference); the
    frontier never shuffles."""
    per_host = rules.groupBy("host").agg(
        F.collect_list(
            F.struct(
                "rule",
                _rule_regex(F.col("prefix")).alias("rx"),
                F.length("prefix").alias("slen"),
            )
        ).alias("rs")
    )
    from ontology_mapping_spark.operators.linkgraph import host_of

    u = urls.withColumn("_host", host_of(url_col)).withColumn(
        "_path",
        F.coalesce(
            F.nullif(F.regexp_extract(F.col(url_col), _PATH_RE, 1), F.lit("")),
            F.lit("/"),
        ),
    )
    joined = u.join(
        F.broadcast(per_host.withColumnRenamed("host", "_host")), "_host", "left"
    )
    path = F.col("_path")

    def longest(rule: str) -> Column:
        # longest matching pattern of one kind; -1 when none matches
        return F.aggregate(
            F.col("rs"),
            F.lit(-1),
            lambda acc, r: F.when(
                (r["rule"] == rule)
                & F.regexp_like(path, r["rx"])
                & (r["slen"] > acc),
                r["slen"],
            ).otherwise(acc),
        )

    scored = joined.withColumn("_dis", longest("disallow")).withColumn(
        "_alw", longest("allow")
    )
    keep = (
        F.col("rs").isNull()
        | (F.col("_dis") < 0)
        | (F.col("_alw") >= F.col("_dis"))
    )
    return scored.filter(keep).drop("_host", "_path", "rs", "_dis", "_alw")
