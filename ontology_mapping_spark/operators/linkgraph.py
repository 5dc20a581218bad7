"""Web link-graph construction over Common-Crawl-style pages.

The north rule's final stage is *graph materialize* over a 10^12-page web
corpus. Besides the ontology graph (operators/graph.py), the other graph a
KG-construction pipeline materializes from raw pages is the **hyperlink
graph**: anchors are both edges (host-level link graph, PageRank authority
for triple-confidence weighting) and KG signals in their own right
(anchor-text alias mining is the classic source of entity surface forms —
the reference's label/synonym table, thesis/pre_processing_data.py:86-101,
plays the same role for ontologies).

Everything here is pure Catalyst — regexp extraction, string algebra,
joins and aggregates; no Python executes per row. Each operator has a
DuckDB oracle twin in queries.py (identical regex constants) and a
pure-Python twin in tests/test_linkgraph.py, so the three derivations
cross-check.

Scale notes (100 TB):
* ``extract_links`` is a projection + generator (explode) — no shuffle;
  the anchor regex runs inside whole-stage codegen on the decoded page
  bytes already in memory from the scan.
* ``link_graph`` / ``degrees`` are partial+final hash aggregates keyed on
  host — the classic map-side-combine shape (billions of links collapse
  to millions of host pairs before the exchange).
* ``pagerank`` is the textbook iterative DataFrame job: per iteration one
  shuffle join (ranks ⋈ edges on src) + one partial+final aggregate on
  dst, lineage cut per round via session.materialize. Hot dst hosts
  (everyone links to wikipedia.org) are exactly the skew the aggregate's
  map-side combine absorbs — the per-partition partial sums bound any
  reducer's input by the partition count, not the in-degree.

URL-resolution contract (documented subset of RFC 3986): fragments are
stripped; ``javascript:``/``mailto:``/other non-http(s) schemes drop;
protocol-relative ``//h/p`` inherits the base scheme; root-relative
``/p`` joins the base origin; other hrefs join the base *directory*
(no ``..`` dot-segment squashing — synthetic corpora here do not need
it and the oracle twin must stay expressible in both SQL dialects).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# One regex vocabulary, shared verbatim by the Spark engine, the DuckDB
# oracles (queries.py imports these constants) and the pytest twins.
# Both Java regex and RE2 accept the (?is)/(?i) inline flags and lazy
# quantifiers used here.
ANCHOR_RE = r"""(?is)<a\s[^>]*?href\s*=\s*["']([^"']*)["'][^>]*>(.*?)</a>"""
SCHEME_RE = r"(?i)^([a-z][a-z0-9+.\-]*):"
ORIGIN_RE = r"(?i)^([a-z][a-z0-9+.\-]*://[^/?#]*)"
HOST_RE = r"(?i)^[a-z][a-z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)"
BASEDIR_RE = r"(?i)^[a-z][a-z0-9+.\-]*://[^/?#]*(/[^?#]*)"
TAG_RE = r"<[^>]*>"


def host_of(url: Column | str) -> Column:
    """Lowercased registered host of a URL (userinfo and port stripped)."""
    url = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(url, HOST_RE, 1))


def clean_anchor(anchor: Column | str) -> Column:
    """Anchor display text: inner tags stripped, whitespace collapsed."""
    anchor = F.col(anchor) if isinstance(anchor, str) else anchor
    return F.trim(F.regexp_replace(F.regexp_replace(anchor, TAG_RE, " "), r"\s+", " "))


def resolve_href(base: Column, href: Column) -> Column:
    """Resolve ``href`` against the page URL per the module contract.

    Returns NULL for empty/fragment-only hrefs and non-http(s) schemes, so
    callers filter with ``isNotNull``.
    """
    h = F.trim(F.split(href, "#", 2).getItem(0))
    scheme = F.lower(F.regexp_extract(h, SCHEME_RE, 1))
    base_scheme = F.lower(F.regexp_extract(base, SCHEME_RE, 1))
    origin = F.regexp_extract(base, ORIGIN_RE, 1)
    base_path = F.regexp_extract(base, BASEDIR_RE, 1)
    basedir = F.when(
        F.length(base_path) > 0,
        F.concat(origin, F.regexp_replace(base_path, r"[^/]*$", "")),
    ).otherwise(F.concat(origin, F.lit("/")))
    return (
        F.when(h == "", F.lit(None).cast("string"))
        .when(scheme.isin("http", "https"), h)
        .when(scheme != "", F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat(base_scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(basedir, h))
    )


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, html) pages -> one row per resolvable anchor.

    Output: ``(url, href, anchor, dst_url)`` — href as written, anchor
    display text cleaned, dst_url resolved absolute http(s). ``html`` may
    be the input_hint's ``binary`` column (UTF-8 decoded here) or an
    already-decoded string.
    """
    html = F.col(html_col)
    if dict(pages.dtypes)[html_col] == "binary":
        html = F.decode(html, "UTF-8")
    zipped = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 1),
        F.regexp_extract_all(html, F.lit(ANCHOR_RE), 2),
    )
    out = (
        pages.select(F.col(url_col).alias("url"), F.explode(zipped).alias("z"))
        .select(
            "url",
            F.col("z")["0"].alias("href"),
            clean_anchor(F.col("z")["1"]).alias("anchor"),
        )
        .withColumn("dst_url", resolve_href(F.col("url"), F.col("href")))
    )
    return out.filter(F.col("dst_url").isNotNull())


def link_graph(links: DataFrame, self_loops: bool = False) -> DataFrame:
    """Extracted links -> host-level edge list ``(src_host, dst_host,
    n_links)``. Partial+final hash aggregate; rows with an unparseable
    host on either side are dropped."""
    e = links.select(
        host_of("url").alias("src_host"), host_of("dst_url").alias("dst_host")
    ).filter((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if not self_loops:
        e = e.filter(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(F.count("*").alias("n_links"))


def degrees(edges: DataFrame, src: str = "src_host", dst: str = "dst_host") -> DataFrame:
    """Distinct-neighbour in/out degree per node -> (node, out_deg, in_deg).

    Full outer join of the two one-sided aggregates on the shared ``node``
    name (USING-join, see the Spark 4.1 constraint-rewrite caveat in
    session.materialize's docstring)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    out_d = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))
    in_d = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        out_d.join(in_d, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
) -> DataFrame:
    """Fixed-iteration PageRank over a distinct edge set -> (node, rank).

    Semantics (shared exactly by the DuckDB oracle and the pure-Python
    test twin): uniform init 1/N; per iteration
    ``r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + dangling/N)``
    with the dangling mass (rank parked on nodes without out-edges)
    redistributed uniformly, so Σ rank stays 1 every iteration.

    Shape per iteration: one shuffle join of ranks onto edges keyed on
    src, one partial+final sum keyed on dst, plus a 1-row dangling
    aggregate broadcast back in — no driver round-trip inside the loop.
    Lineage is cut per round (session.materialize) exactly like
    transitive_closure; N is the one bounded driver scalar, computed once.
    """
    from ontology_mapping_spark.operators.graph import _cut

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("outdeg"))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iters):
        rk = ranks.join(outdeg, "node", "left")
        contrib = (
            e.join(rk.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("c"))
        )
        dangling = rk.filter(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        ranks = _cut(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dmass") / n)
                ).alias("rank"),
            )
        )
    return ranks


def anchor_aliases(links: DataFrame, min_count: int = 1) -> DataFrame:
    """Anchor-text alias mining: how the web names each target page.

    -> (alias, dst_url, n) with alias = lowercased cleaned anchor text,
    empty aliases dropped, pairs below ``min_count`` dropped. This is the
    surface-form table entity linking consumes — the web-scale analogue of
    the reference's label/synonym extraction."""
    out = (
        links.select(F.lower(F.col("anchor")).alias("alias"), "dst_url")
        .filter(F.col("alias") != "")
        .groupBy("alias", "dst_url")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        out = out.filter(F.col("n") >= min_count)
    return out


def filter_blocked_hosts(
    pages: DataFrame, blocked: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Drop pages whose host is a blocked domain or any subdomain of one.

    ``blocked`` is a 1-column (domain) DataFrame, small by contract
    (curation blocklists are thousands of rows) — broadcast to every
    executor so the anti-join never shuffles the page corpus."""
    pages_h = pages.withColumn("_host", host_of(url_col))
    cond = (F.col("_host") == F.col("domain")) | F.col("_host").endswith(
        F.concat(F.lit("."), F.col("domain"))
    )
    return pages_h.join(F.broadcast(blocked), cond, "left_anti").drop("_host")
