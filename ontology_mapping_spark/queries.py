"""Driver-contract query catalog: each entry pairs a Spark DataFrame
implementation (built from the engine's operators) with an ANSI-SQL oracle
DuckDB runs on the same parquet tables (CORRECTNESS gate).

Conventions that make the cross-engine value-hash exact:
* every computed column is aliased identically on both sides;
* float aggregates are rounded (6 dp unless noted); counts/sums cast to
  BIGINT;
* all rankings carry explicit deterministic tie-breaks;
* shared text normalization is the golden ``normalize`` in both dialects.

Synthetic graph convention (used by the graph-operator queries): the part
table induces a binary tree ``child=p_partkey, parent=p_partkey // 2`` for
p_partkey >= 2 — a deterministic, sf-scalable DAG both engines derive
identically. The connected-components forest drops edges of children
divisible by 13.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ontology_mapping_spark.functions.strings import token_jaccard_col, tokens_col
from ontology_mapping_spark.functions.vectors import cosine_col
from ontology_mapping_spark.operators import graph as G
from ontology_mapping_spark.operators.dedup import exact_dedup, minhash_signatures, simhash
from ontology_mapping_spark.operators.sampling import sample_per_group
from ontology_mapping_spark.operators.textstats import (
    LANG_STOPWORDS,
    quality_features,
    stopword_ratio,
    whitespace_token_count,
)
from ontology_mapping_spark.textnorm import normalize_col, normalize_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

# string-cast edge CTE shared by every graph oracle: the engine's
# _part_edges emits string ids, so the oracle must too or the driver's
# type-strict value hash diverges (round-1 sibling_2hop_join failure).
_EDGES_SQL = (
    "SELECT CAST(p_partkey AS VARCHAR) AS child, CAST(p_partkey // 2 AS VARCHAR) AS parent "
    "FROM part WHERE p_partkey >= 2"
)

_REGISTRY: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def registry() -> dict[str, QueryFn]:
    return dict(_REGISTRY)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)


# Redundant VARIANTS of operators whose family is already driver-covered.
# The driver's correctness gate checks at most 50 catalog entries; round 2
# registered 54 and the tail four (fold_accents, max_depth_per_side,
# mint_uris, normalization_ops_suite) silently fell out of the checked set.
# `curated_registry()` (what __spark_entry__.queries() exposes) therefore
# keeps exactly one entry per operator family and parks the variants here;
# they stay in the FULL registry, so the local gate (tools/check_queries.py)
# still value-checks every one of them, and each variant's equality with its
# primary is additionally pytest-pinned where it matters.
LOCAL_ONLY: frozenset = frozenset(
    {
        # family primary: blocking_token_join_capped (the production df-cap
        # form); salted==unsalted output equality pinned in test_candidates.py
        "blocking_token_join",
        "blocking_token_join_salted",
        # family primary: ann_ivf_topk (KMeans quantizer + recall@5 oracle);
        # the fixed-codebook variant keeps its exact SQL oracle locally
        "ann_ivf_fixed_topk",
        # subsumed by minhash_lsh_near_dups, which re-derives the same
        # md5-slice signatures as its first stage
        "minhash_token_signature",
        # family primary: embedding_lsh_near_dup (the corpus-scale
        # sign-LSH-blocked form, VERDICT r3 #6); this brute-force-probe
        # variant keeps its exact SQL oracle locally
        "embedding_near_dup_pairs",
        # sign-LSH ANN top-k: planted-top1 property checked locally; the
        # bucketing core is driver-covered via embedding_lsh_near_dup
        "ann_lsh_topk",
        # rolling-hash fingerprint family primary: winnow_fingerprints
        # (winnowing selects over the same k-gram hashes)
        "document_fingerprint",
        # containment detection builds on the driver-covered winnow
        # fingerprints; exact SQL oracle value-checked by the local gate
        "containment_pairs",
        # dedup-family variant (exact_dedup is the driver-covered primary);
        # oracle derives canonical urls independently of the regex chain
        "url_dedup_canonical",
        # dedup-family variant (line granularity); oracle re-derives
        # keep-first via a window, independent of the min-struct winner plan
        "line_dedup_corpus",
        # sampling-family variant (deterministic_sample is the driver-covered
        # primary); oracle recomputes the 52-bit md5 uniform independently
        "mixture_sample_sources",
        # shingle-join family variant (minhash_lsh_near_dups is the
        # driver-covered primary); oracle re-derives the contamination set
        "decontaminate_eval13",
        # text-quality family variant (token_quality_stats is the
        # driver-covered primary); identical RE2 regex chain both engines
        "pii_scrub",
        # composition of driver-covered signals (repetition_stats,
        # token_quality_stats, stopword_language_score) into one verdict
        "corpus_filter_verdicts",
        # normalization-op family variants (normalization_ops_suite is the
        # driver-covered primary; normalize_golden_hash pins the composed
        # golden contract) — parked round 4 to free curated slots for the
        # link-graph family
        "natural_word_order",
        "fold_accents",
        # link-graph family variants (extract_links_resolved and
        # pagerank_graph are the driver-covered primaries); each keeps its
        # independent arithmetic-derivation oracle in the local gate
        "link_graph_hosts",
        "host_degree_stats",
        "anchor_alias_mining",
        "blocked_host_filter",
        # crawler-feedback frontier (per-host budget window; composes
        # the link extraction + blocklist + seen-set ops)
        "crawl_frontier_budget",
        # robots politeness filter (within-row longest-match fold vs a
        # plain-predicate arithmetic oracle)
        "robots_disallow_filter",
        # sitemap-lastmod recrawl scheduling vs capture history
        "recrawl_stale_urls",
        # robots Sitemap: record extraction (group-independent line scan
        # vs a plain-arithmetic oracle that never runs the regex)
        "robots_sitemap_records",
        # parked round 4 for the relation-extraction primaries: the
        # membership-filter family keeps anti_join_exclusion curated (semi
        # join is its mirror — same broadcast-join shape, opposite keep
        # set), and the limit family keeps topk_per_group curated
        # (TakeOrderedAndProject vs WindowGroupLimit both plan-pinned in
        # BENCH.md)
        "semi_join_flag",
        "global_topn",
        # npmi weighting: same relation family as the two curated primaries
        "cooccurrence_npmi",
        # declarative join-path variant of pattern_relation_triples: keeps
        # the Catalyst sentence-mention path value-verified after the
        # curated primaries moved to the fused C sentence scan (round 5)
        "relation_triples_joinpath",
        # serialization sink: §2.1 family already holds a curated writer row
        "kg_ntriples_lines",
        # its named-graph twin (optional 4th term; NULL graph = 3-term
        # default-graph line), same character-exact DuckDB mirror
        "kg_nquads_lines",
        # argmax-per-group family: topk_per_group stays the curated primary
        "mention_disambiguation",
        # triple-pattern family: kg_bgp_match is the curated primary (the
        # conjunctive BGP compiler; a single-pattern scan is its 1-pattern
        # degenerate case, and the property-path form layers the
        # driver-covered transitive closure under the same compiler)
        "triple_pattern_scan",
        "kg_bgp_paths",
        "kg_bgp_optional",
        "kg_bgp_union",
        "kg_bgp_construct",
        # SPARQL algebra extensions on the same compiler: negation
        # (NOT EXISTS / MINUS), VALUES inline bindings, and the composite
        # path forms (inverse ^p, sequence p1/p2, alternation a|b) each
        # keep an exact SQL oracle in the local gate
        "kg_bgp_negation",
        "kg_bgp_values_minus",
        "kg_bgp_path_forms",
        "kg_bgp_path_optnps",
        # parked round 4 for the KG-maintenance primaries
        # (latest_capture_wins, kg_triple_merge): union_sides is a 2-row
        # union+tag the union shape of which every kg_bgp_* and kgmaint
        # query also exercises; max_depth_per_side shares the depths()
        # core with the curated node_depths
        "union_sides",
        "max_depth_per_side",
        # snapshot-diff variant of the kg_triple_merge family (same
        # full-outer-on-triple-key shape, status projection instead of
        # provenance arithmetic)
        "kg_triple_diff",
        # SHACL-lite validation: scan-filter-aggregate shapes already
        # driver-covered (group-count, anti-join, rlike); the composed
        # checker keeps its arithmetic-derivation oracle in the local gate
        "kg_shape_violations",
        # streaming-merge parity: the streaming family keeps
        # mentions_stream_parity curated; this foreachBatch-upsert twin of
        # kg_triple_merge stays in the local gate
        "kg_state_stream_parity",
        # sub-SELECT through the text front-end: the inner aggregate is
        # kg_select_agg's shape, the outer join the kg_bgp_match shape
        "kg_sparql_subselect",
        # positive FILTER EXISTS (left-semi twin of the curated
        # kg_bgp_match row's NOT EXISTS), with a sequence path inside the
        # EXISTS body; exact-SQL EXISTS oracle
        "kg_sparql_exists",
        # solution-driven DESCRIBE (semi-join node-set description)
        "kg_describe_set",
        # temporal as-of window filter: pure-Catalyst projection of the
        # kg_triple_merge family's provenance columns; exact SQL oracle
        "kg_state_as_of",
        # streaming-inference parity: the saturate_incremental-per-batch
        # twin of the curated kg_saturate_rdfs row; same recursive-CTE
        # oracle through the availableNow stream
        "kg_entail_stream_parity",
        # CC-family variant: the curated connected_components row covers
        # the star-contraction core; the incremental fold's full-recompute
        # oracle stays in the local gate (equivalence also property-pinned
        # in test_graph_ops.py)
        "incremental_components_merge",
        # parked for the SPARQL SELECT-modifier / UPDATE primaries
        # (kg_select_agg, kg_update_delete_insert): group_collect_labels'
        # collect-per-key core is kg_select_agg's group_concat; the 0-row
        # anti_join_exclusion's broadcast anti-join is the update row's
        # core shape with ~4k non-trivial rows
        "group_collect_labels",
        "anti_join_exclusion",
        # DISTINCT + ORDER + OFFSET/LIMIT paging slice: the ordered-limit
        # shape is curated via topk_per_group and kg_select_agg
        "kg_select_slice",
        # named-graph quad matching: same join machinery as the curated
        # kg_bgp_match, graph column as an extra join key; exact SQL
        # oracle in the local gate — and the WITH <g>-scoped update twin
        # of kg_update_delete_insert (update_quads)
        "kg_graph_quads",
        "kg_update_with_graph",
        # graph-management forms (CLEAR/DROP/ADD/COPY/MOVE): the ADD
        # retag-union-distinct is the representative; exact SQL oracle
        "kg_graph_management",
        # parked for the rule-inference primary (kg_saturate_rdfs):
        # derived_label's CASE projection recurs inside several curated
        # rows (stopword_language_score, token_quality_stats)
        "derived_label",
        # ---- round-5 rotation (VERDICT r4 #2): the heavyweight round-4
        # lifecycle primaries (kg_saturate_owl, kg_retract_entailment,
        # hits_graph, triangle_clustering, kg_sparql_text,
        # kg_sparql_update_text) moved INTO the curated catalog so the
        # driver's hard gate sees them; these six redundant variants,
        # each value-checked by the local gate on every commit, park to
        # keep the catalog at 50. ----
        # events-family rows: the JSON projection is filter_project's
        # get_json_object twin, the daily rollup is pricing_summary_agg's
        # partial+final agg shape over a date_trunc key
        "events_json_extract",
        "events_daily_rollup",
        # near-dup family keeps minhash_lsh_near_dups + the sign-LSH
        # embedding row curated; simhash's per-bit-vote core keeps its
        # exact SQL oracle in the local gate
        "simhash16",
        # vector-similarity family: embedding_topk_bruteforce (curated)
        # exercises the same JVM cosine; the pairwise projection parks
        "cosine_pairs",
        # sibling family keeps sibling_2hop_join curated; the shared
        # parent/child flag projection over the same 2-hop shape parks
        "sibling_shared_child_flags",
        # mention family keeps mention_detection_flagship (fused C kernel)
        # curated; the token-blocking join form shares the curated
        # blocking_token_join_capped plan shape (crossover between the
        # two forms is pinned in test_mentions.py)
        "mentions_join_scan",
    }
)


def curated_registry() -> dict[str, QueryFn]:
    """<= 50 driver-checked entries, one per operator family."""
    return {k: v for k, v in _REGISTRY.items() if k not in LOCAL_ONLY}


def curated_oracles() -> dict[str, str]:
    return {k: v for k, v in _ORACLES.items() if k not in LOCAL_ONLY}


# --------------------------------------------------------------------------
# §2.2 scans / filters / projections / derived columns
# --------------------------------------------------------------------------

@query(
    "filter_project",
    "SELECT o_orderkey, o_custkey FROM orders WHERE o_orderstatus = 'F'",
)
def q_filter_project(spark, sf):
    # positive-alignment filter+project (thesis/main.py:56,62)
    return (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey")
    )


@query(
    "derived_label",
    "SELECT o_orderkey, CAST(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS INT) AS label FROM orders",
)
def q_derived_label(spark, sf):
    # scalar predicate -> label column (thesis/main.py:54,61)
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") > 150000).cast("int").alias("label"),
    )


@query(
    "triple_pattern_scan",
    "SELECT event_id, user_id FROM events WHERE event_type = 'click'",
)
def q_triple_pattern_scan(spark, sf):
    # fixed-predicate triple-pattern scan (thesis/process_data_features.py:14)
    return (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id")
    )


# --------------------------------------------------------------------------
# §2.3 joins
# --------------------------------------------------------------------------

@query(
    "broadcast_lookup_join",
    """SELECT p.p_brand AS brand,
              CAST(count(*) AS BIGINT) AS n_items,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       GROUP BY p.p_brand""",
)
def q_broadcast_lookup_join(spark, sf):
    # per-pair dim lookup as broadcast hash join (thesis/process_data_features.py:147-149)
    li, part = _t(spark, sf, "lineitem"), _t(spark, sf, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


_NORM_DOC = normalize_sql("p_name", "duckdb")

@query(
    "blocking_token_join",
    f"""WITH s AS (SELECT p_partkey AS src, unnest(string_split({_NORM_DOC}, ' ')) AS token
                   FROM part WHERE p_partkey % 2 = 0),
            t AS (SELECT p_partkey AS tgt, unnest(string_split({_NORM_DOC}, ' ')) AS token
                   FROM part WHERE p_partkey % 2 = 1)
       SELECT DISTINCT s.src, t.tgt FROM s JOIN t USING (token)""",
)
def q_blocking_token_join(spark, sf):
    # the inverted-index blocking join (thesis/generate_candidates.py:99-124)
    from ontology_mapping_spark.operators.blocking import blocking_join
    from ontology_mapping_spark.config import PipelineConfig

    part = _t(spark, sf, "part").select(
        F.col("p_partkey").alias("uri"), normalize_col("p_name").alias("text")
    )
    src = part.filter(F.col("uri") % 2 == 0)
    tgt = part.filter(F.col("uri") % 2 == 1)
    cfg = PipelineConfig(max_token_df=None)
    return blocking_join(src, tgt, cfg)


@query(
    "blocking_token_join_salted",
    f"""WITH s AS (SELECT p_partkey AS src, unnest(string_split({_NORM_DOC}, ' ')) AS token
                   FROM part WHERE p_partkey % 2 = 0),
            t AS (SELECT p_partkey AS tgt, unnest(string_split({_NORM_DOC}, ' ')) AS token
                   FROM part WHERE p_partkey % 2 = 1)
       SELECT DISTINCT s.src, t.tgt FROM s JOIN t USING (token)""",
)
def q_blocking_token_join_salted(spark, sf):
    """Targeted skew-salted form of the blocking join (north rule:
    "skew-key salting on hot entities"): tokens whose df_src x df_tgt
    fan-out exceeds the threshold get an S-way source-hash salt (the
    explode replicates only THEIR target postings), the cold majority
    joins plain. Same oracle as blocking_token_join — salting must be
    invisible in the result."""
    from ontology_mapping_spark.operators.blocking import hot_salted_blocking_join
    from ontology_mapping_spark.config import PipelineConfig

    part = _t(spark, sf, "part").select(
        F.col("p_partkey").alias("uri"), normalize_col("p_name").alias("text")
    )
    src = part.filter(F.col("uri") % 2 == 0)
    tgt = part.filter(F.col("uri") % 2 == 1)
    cfg = PipelineConfig(max_token_df=None, salt_buckets=8)
    # low threshold so real tokens actually take the salted path at sf0.01
    return hot_salted_blocking_join(src, tgt, cfg, hot_pairs_threshold=2000)


@query(
    "sibling_2hop_join",
    f"""WITH e AS ({_EDGES_SQL})
       SELECT e1.child AS a, e2.child AS b
       FROM e e1 JOIN e e2 ON e1.parent = e2.parent AND e1.child <> e2.child""",
)
def q_sibling_2hop_join(spark, sf):
    # sibling lookup as 2-hop self-join (thesis/generate_candidates.py:137-139)
    edges = _part_edges(spark, sf)
    return G.siblings(edges)


@query(
    "anti_join_exclusion",
    "SELECT c_custkey FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
)
def q_anti_join(spark, sf):
    # membership anti-filter (thesis/generate_candidates.py:130-131)
    return (
        _t(spark, sf, "customer")
        .join(
            _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_anti",
        )
        .select("c_custkey")
    )


@query(
    "semi_join_flag",
    "SELECT DISTINCT c.c_custkey FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def q_semi_join(spark, sf):
    # shared-parent existence flag pattern (thesis/pre_processing_data.py:270-273)
    return (
        _t(spark, sf, "customer")
        .join(
            _t(spark, sf, "orders").select(F.col("o_custkey").alias("c_custkey")),
            "c_custkey",
            "left_semi",
        )
        .select("c_custkey")
    )


@query(
    "left_label_join",
    """SELECT c.c_custkey,
              CAST(CASE WHEN count(o.o_orderkey) > 0 THEN 1 ELSE 0 END AS INT) AS label
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey""",
)
def q_left_label_join(spark, sf):
    # positive-label assignment via left join (thesis/generate_candidates.py:13-31)
    c, o = _t(spark, sf, "customer"), _t(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg((F.count("o_orderkey") > 0).cast("int").alias("label"))
    )


@query(
    "canonical_pair_order",
    """SELECT DISTINCT least(l_partkey, l_suppkey) AS lo, greatest(l_partkey, l_suppkey) AS hi
       FROM lineitem""",
)
def q_canonical_pair(spark, sf):
    # symmetric pair canonicalization (thesis/generate_candidates.py:14-19)
    from ontology_mapping_spark.operators.sampling import canonical_pair

    li = _t(spark, sf, "lineitem")
    lo, hi = canonical_pair(F.col("l_partkey"), F.col("l_suppkey"))
    return li.select(lo.alias("lo"), hi.alias("hi")).distinct()


# --------------------------------------------------------------------------
# §2.4 aggregations
# --------------------------------------------------------------------------

@query(
    "group_collect_labels",
    """SELECT p_brand AS uri, string_agg(DISTINCT p_type, '|' ORDER BY p_type) AS labels
       FROM part GROUP BY p_brand""",
)
def q_group_collect(spark, sf):
    # collect labels per subject (thesis/process_data_features.py:12-24)
    return (
        _t(spark, sf, "part")
        .groupBy(F.col("p_brand").alias("uri"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("p_type")), "|").alias("labels")
        )
    )


@query(
    "pricing_summary_agg",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 6) AS avg_qty,
              round(avg(l_discount), 6) AS avg_disc,
              CAST(count(*) AS BIGINT) AS count_order
       FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def q_pricing_summary(spark, sf):
    # the classic partial+final hash aggregate (metric averaging family,
    # thesis/main.py:135-145)
    return (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "classification_report_agg",
    """WITH preds AS (
           SELECT CAST(p_size > 25 AS INT) AS label, CAST(p_retailprice > 1400 AS INT) AS prediction
           FROM part),
       cm AS (SELECT label, prediction, count(*) AS n FROM preds GROUP BY 1, 2),
       cls AS (SELECT DISTINCT label AS class FROM cm UNION SELECT DISTINCT prediction FROM cm),
       tp AS (SELECT label AS class, n AS tp FROM cm WHERE label = prediction),
       sup AS (SELECT label AS class, CAST(sum(n) AS BIGINT) AS support FROM cm GROUP BY 1),
       prd AS (SELECT prediction AS class, sum(n) AS n_pred FROM cm GROUP BY 1)
       SELECT CAST(cls.class AS VARCHAR) AS class,
              round(coalesce(coalesce(tp.tp, 0) * 1.0 / nullif(prd.n_pred, 0), 0), 6) AS precision,
              round(coalesce(coalesce(tp.tp, 0) * 1.0 / nullif(sup.support, 0), 0), 6) AS recall,
              coalesce(sup.support, 0) AS support
       FROM cls LEFT JOIN tp USING (class) LEFT JOIN sup USING (class) LEFT JOIN prd USING (class)""",
)
def q_classification_report(spark, sf):
    # classification_report as groupBy aggregation (thesis/main.py:124)
    from ontology_mapping_spark.ml.evaluate import classification_report

    preds = _t(spark, sf, "part").select(
        (F.col("p_size") > 25).cast("int").alias("label"),
        (F.col("p_retailprice") > 1400).cast("int").alias("prediction"),
    )
    rep = classification_report(preds)
    return rep.filter(~F.col("class").isin("accuracy", "macro avg", "weighted avg")).select(
        "class",
        F.round("precision", 6).alias("precision"),
        F.round("recall", 6).alias("recall"),
        "support",
    )


# --------------------------------------------------------------------------
# §2.5 sort / top-k / sampling / set ops
# --------------------------------------------------------------------------

@query(
    "topk_per_group",
    """SELECT l_orderkey, l_linenumber, CAST(rk AS INT) AS rank FROM (
         SELECT l_orderkey, l_linenumber,
                row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rk
         FROM lineitem) WHERE rk <= 3""",
)
def q_topk_per_group(spark, sf):
    # per-source top-k (thesis/generate_candidates.py:64-67); Spark >=3.5
    # rewrites the row_number filter to a per-partition group limit
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        _t(spark, sf, "lineitem")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("l_orderkey", "l_linenumber", "rank")
    )


@query(
    "global_topn",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""",
)
def q_global_topn(spark, sf):
    # hard row cap with deterministic order (thesis/pre_processing_data.py:300-301)
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "deterministic_sample",
    """SELECT l_orderkey, l_linenumber FROM (
         SELECT l_orderkey, l_linenumber,
                row_number() OVER (
                  PARTITION BY l_orderkey
                  ORDER BY md5(concat(
                    CAST(length(CAST(l_orderkey AS VARCHAR)) AS VARCHAR), ':', l_orderkey, '|',
                    CAST(length(CAST(l_linenumber AS VARCHAR)) AS VARCHAR), ':', l_linenumber, '|', '42'))
                ) AS rk
         FROM lineitem) WHERE rk <= 2""",
)
def q_deterministic_sample(spark, sf):
    # the canonical md5-ordered sampler replacing random.sample
    # (thesis/generate_candidates.py:127,144)
    li = _t(spark, sf, "lineitem")
    return sample_per_group(
        li, ["l_orderkey"], ["l_orderkey", "l_linenumber"], 2, seed=42
    ).select("l_orderkey", "l_linenumber")


@query(
    "mixture_sample_sources",
    """WITH u AS (SELECT doc_id, source,
             CAST(('0x' || substr(md5(
                 CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR)
                   || ':' || doc_id || '|42'), 1, 13)) AS BIGINT)
               / 4503599627370496.0 AS u
           FROM documents)
       SELECT doc_id, source FROM u
       WHERE u < CASE
           WHEN source IN ('src0','src1','src2','src3','src4') THEN 0.9
           WHEN source IN ('src5','src6','src7','src8','src9') THEN 0.5
           WHEN source IN ('src10','src11','src12','src13','src14') THEN 0.2
           ELSE 0.0 END""",
)
def q_mixture_sample(spark, sf):
    """Training-mixture (domain-reweighting) sampling: keep each source at
    its configured rate via a deterministic md5-derived uniform — a pure
    zero-shuffle projection, byte-identical on any cluster size. The
    oracle recomputes the identical 52-bit uniform from the same injective
    key encoding, so a hash, encoding, or rate-lookup bug diverges."""
    from ontology_mapping_spark.operators.sampling import mixture_sample

    rates = {f"src{i}": 0.9 for i in range(5)}
    rates |= {f"src{i}": 0.5 for i in range(5, 10)}
    rates |= {f"src{i}": 0.2 for i in range(10, 15)}
    return mixture_sample(
        _t(spark, sf, "documents"), rates, hash_cols=["doc_id"]
    ).select("doc_id", "source")


@query(
    "dedup_exact",
    """SELECT doc_id FROM (
         SELECT doc_id, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
         FROM documents) WHERE rk = 1""",
)
def q_dedup_exact(spark, sf):
    # exact dedup via hash-groupBy (training-data op; dedup family)
    return exact_dedup(_t(spark, sf, "documents")).select("doc_id")


@query(
    "union_sides",
    """SELECT side, CAST(count(*) AS BIGINT) AS n FROM (
         SELECT CASE WHEN p_partkey % 2 = 0 THEN 'src' ELSE 'tgt' END AS side FROM part)
       GROUP BY side""",
)
def q_union_sides(spark, sf):
    # two-ontology union with side tag (thesis/main.py:45-46)
    part = _t(spark, sf, "part")
    src = part.filter(F.col("p_partkey") % 2 == 0).withColumn("side", F.lit("src"))
    tgt = part.filter(F.col("p_partkey") % 2 == 1).withColumn("side", F.lit("tgt"))
    return src.unionByName(tgt).groupBy("side").agg(F.count("*").alias("n"))


# --------------------------------------------------------------------------
# §2.6 graph operators (synthetic part-tree: child=p, parent=p//2, p>=2)
# --------------------------------------------------------------------------

def _part_edges(spark, sf) -> DataFrame:
    return (
        _t(spark, sf, "part")
        .filter(F.col("p_partkey") >= 2)
        .select(
            F.col("p_partkey").cast("string").alias("child"),
            F.floor(F.col("p_partkey") / 2).cast("bigint").cast("string").alias("parent"),
        )
    )


@query(
    "transitive_closure",
    f"""WITH RECURSIVE e AS ({_EDGES_SQL}),
       anc(node, ancestor, dist) AS (
         SELECT child, parent, 1 FROM e
         UNION
         SELECT a.node, e.parent, a.dist + 1 FROM anc a JOIN e ON a.ancestor = e.child)
       SELECT node, ancestor, CAST(max(dist) AS INT) AS dist FROM anc GROUP BY node, ancestor""",
)
def q_transitive_closure(spark, sf):
    # the materialized-once ancestor table via path-doubling self-joins
    # (engine form of nx.ancestors, thesis/process_data_features.py:127-128)
    return G.transitive_closure(_part_edges(spark, sf))


@query(
    "node_depths",
    f"""WITH RECURSIVE e AS ({_EDGES_SQL}),
       anc(node, ancestor, dist) AS (
         SELECT child, parent, 1 FROM e
         UNION
         SELECT a.node, e.parent, a.dist + 1 FROM anc a JOIN e ON a.ancestor = e.child),
       nodes AS (SELECT child AS node FROM e UNION SELECT parent FROM e)
       SELECT n.node, CAST(coalesce(max(a.dist), 0) AS INT) AS depth
       FROM nodes n LEFT JOIN anc a ON a.node = n.node GROUP BY n.node""",
)
def q_node_depths(spark, sf):
    # longest-path depths (canonical max-parent semantics of
    # thesis/process_data_features.py:116-120; see SURVEY §2.6 wrinkle)
    edges = _part_edges(spark, sf)
    return G.depths(edges)


_FOREST_SQL = (
    "SELECT CAST(p_partkey AS VARCHAR) AS u, CAST(p_partkey // 2 AS VARCHAR) AS v "
    "FROM part WHERE p_partkey >= 2 AND p_partkey % 13 <> 0"
)

@query(
    "connected_components",
    f"""WITH RECURSIVE e0 AS ({_FOREST_SQL}),
       verts AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
       und AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       reach(node, r) AS (
         SELECT node, node FROM verts
         UNION
         SELECT reach.node, und.v FROM reach JOIN und ON reach.r = und.u)
       SELECT node, min(r) AS component FROM reach GROUP BY node""",
)
def q_connected_components(spark, sf):
    # large-star/small-star CC (canonicalization stage; generalizes the
    # exactMatch overlap check, thesis/pre_processing_data.py:337-341)
    forest = (
        _t(spark, sf, "part")
        .filter((F.col("p_partkey") >= 2) & (F.col("p_partkey") % 13 != 0))
        .select(
            F.col("p_partkey").cast("string").alias("u"),
            F.floor(F.col("p_partkey") / 2).cast("bigint").cast("string").alias("v"),
        )
    )
    return G.connected_components(forest)


@query(
    "shared_ancestor_stats",
    f"""WITH RECURSIVE e AS ({_EDGES_SQL}),
       anc(node, ancestor) AS (
         SELECT child, parent FROM e
         UNION
         SELECT a.node, e.parent FROM anc a JOIN e ON a.ancestor = e.child),
       pairs AS (SELECT CAST(p_partkey AS VARCHAR) AS src, CAST(p_partkey + 1 AS VARCHAR) AS tgt
                 FROM part WHERE p_partkey % 20 = 0 AND p_partkey >= 2),
       cnt AS (SELECT node, count(*) AS n_anc FROM anc GROUP BY node),
       shared AS (
         SELECT p.src, p.tgt, count(*) AS shared_anc
         FROM pairs p JOIN anc a1 ON a1.node = p.src JOIN anc a2 ON a2.node = p.tgt AND a2.ancestor = a1.ancestor
         GROUP BY p.src, p.tgt)
       SELECT p.src, p.tgt,
              CAST(coalesce(s.shared_anc, 0) AS BIGINT) AS shared_anc,
              round(coalesce(s.shared_anc, 0) * 1.0 /
                    nullif(coalesce(c1.n_anc, 0) + coalesce(c2.n_anc, 0) - coalesce(s.shared_anc, 0), 0), 6)
                AS ancestor_jaccard
       FROM pairs p
       LEFT JOIN shared s ON s.src = p.src AND s.tgt = p.tgt
       LEFT JOIN cnt c1 ON c1.node = p.src
       LEFT JOIN cnt c2 ON c2.node = p.tgt""",
)
def q_shared_ancestor_stats(spark, sf):
    # ancestor-set intersection via the closure (thesis/process_data_features.py:139-154)
    from ontology_mapping_spark.operators.features import ancestor_pair_stats

    closure = G.transitive_closure(_part_edges(spark, sf))
    pairs = (
        _t(spark, sf, "part")
        .filter((F.col("p_partkey") % 20 == 0) & (F.col("p_partkey") >= 2))
        .select(
            F.col("p_partkey").cast("string").alias("src"),
            (F.col("p_partkey") + 1).cast("string").alias("tgt"),
        )
    )
    st = ancestor_pair_stats(pairs, closure)
    union = F.col("n_anc_src") + F.col("n_anc_tgt") - F.col("shared_anc")
    return st.select(
        "src",
        "tgt",
        F.col("shared_anc").cast("bigint").alias("shared_anc"),
        F.round(
            F.when(union > 0, F.col("shared_anc").cast("double") / union),
            6,
        ).alias("ancestor_jaccard"),
    )


# --------------------------------------------------------------------------
# §2.7 string / math scalar functions
# --------------------------------------------------------------------------

_PAIRS_SQL = """pairs AS (
    SELECT a.p_partkey AS id_a, {norm_a} AS la, {norm_b} AS lb
    FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    WHERE a.p_partkey % 2 = 0)""".format(
    norm_a=normalize_sql("a.p_name", "duckdb"), norm_b=normalize_sql("b.p_name", "duckdb")
)


def _part_pairs(spark, sf) -> DataFrame:
    a = _t(spark, sf, "part").select(
        F.col("p_partkey").alias("id_a"), normalize_col("p_name").alias("la")
    ).filter(F.col("id_a") % 2 == 0)
    b = _t(spark, sf, "part").select(
        (F.col("p_partkey") - 1).alias("id_a"), normalize_col("p_name").alias("lb")
    )
    return a.join(b, "id_a")


@query(
    "lexical_features",
    f"""WITH {_PAIRS_SQL}
       SELECT id_a,
              CAST(la = lb AS INT) AS exact_string_match,
              CAST(levenshtein(la, lb) AS INT) AS levenshtein_distance,
              round(len(list_intersect(list_distinct(string_split(la, ' ')), list_distinct(string_split(lb, ' ')))) * 1.0 /
                    nullif(len(list_distinct(list_concat(string_split(la, ' '), string_split(lb, ' ')))), 0), 6)
                AS weighted_jaccard,
              CAST(len(list_intersect(list_distinct(string_split(la, ' ')), list_distinct(string_split(lb, ' ')))) AS INT)
                AS shared_tokens_count
       FROM pairs""",
)
def q_lexical_features(spark, sf):
    # exact match / levenshtein / token jaccard / shared tokens
    # (thesis/process_data_features.py:156-171)
    p = _part_pairs(spark, sf)
    return p.select(
        "id_a",
        (F.col("la") == F.col("lb")).cast("int").alias("exact_string_match"),
        F.levenshtein("la", "lb").cast("int").alias("levenshtein_distance"),
        F.round(token_jaccard_col(F.col("la"), F.col("lb")), 6).alias("weighted_jaccard"),
        F.size(F.array_intersect(tokens_col(F.col("la")), tokens_col(F.col("lb"))))
        .cast("int")
        .alias("shared_tokens_count"),
    )


@query(
    "normalize_golden_hash",
    f"SELECT doc_id, md5({normalize_sql('text', 'duckdb')}) AS h FROM documents",
)
def q_normalize_golden(spark, sf):
    # the byte-identical normalize contract, cross-engine
    # (thesis/process_data_features.py:183-187)
    return _t(spark, sf, "documents").select(
        "doc_id", F.md5(normalize_col("text")).alias("h")
    )


@query(
    "natural_word_order",
    """SELECT p_partkey,
              array_to_string(list_reverse(list_filter(
                  string_split_regex(p_name, '\\s?,\\s?'), x -> x <> ' ')), ' ') AS reordered
       FROM part""",
)
def q_natural_word_order(spark, sf):
    # comma-segment reversal (thesis/normalization.py:333-348)
    from ontology_mapping_spark.functions.strings import natural_word_order_col

    return _t(spark, sf, "part").select(
        "p_partkey", natural_word_order_col("p_name").alias("reordered")
    )


@query(
    "cosine_pairs",
    """SELECT a.vec_id AS id_a,
              round(list_cosine_similarity(
                      list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 5) AS cos
       FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
       WHERE a.vec_id % 2 = 0""",
)
def q_cosine_pairs(spark, sf):
    # cosine similarity (thesis/process_data_features.py:104-105), JVM-side
    emb = _t(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")).filter(
        F.col("id_a") % 2 == 0
    )
    b = emb.select((F.col("vec_id") - 1).alias("id_a"), F.col("embedding").alias("vb"))
    return a.join(b, "id_a").select(
        "id_a", F.round(cosine_col(F.col("va"), F.col("vb")), 5).alias("cos")
    )


# --------------------------------------------------------------------------
# training-data ops: dedup sketches, text stats (documents table)
# --------------------------------------------------------------------------

@query(
    "minhash_token_signature",
    f"""WITH toks AS (
         SELECT doc_id, unnest(list_distinct(string_split({normalize_sql('text', 'duckdb')}, ' '))) AS tok
         FROM documents)
       SELECT doc_id,
              min(md5(concat('0|', tok))) AS h0,
              min(md5(concat('1|', tok))) AS h1,
              min(md5(concat('2|', tok))) AS h2,
              min(md5(concat('3|', tok))) AS h3
       FROM toks GROUP BY doc_id""",
)
def q_minhash_tokens(spark, sf):
    # token-level MinHash signature (dedup family; md5 permutations)
    docs = _t(spark, sf, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(normalize_col("text"), " "))).alias("tok"),
    )
    return toks.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("tok")))).alias(f"h{i}")
            for i in range(4)
        ]
    )


def _simhash_sql(bits: int = 16) -> str:
    # per-bit vote sum over the distinct-token LIST (not an unnest/GROUP
    # BY): votes = (#tokens voting 1) - (#others) = 2*hits - len. Every
    # document keeps a row — an empty/NULL normalized text votes nothing
    # and fingerprints as 0, matching the engine's within-row fold (the
    # unnest form silently dropped empty docs from the output).
    votes = []
    for i in range(bits):
        votes.append(
            f"CAST(2 * len(list_filter(tk, x -> substr(md5(x), {i + 1}, 1) IN "
            f"('8','9','a','b','c','d','e','f'))) - len(tk) > 0 AS INT) * {1 << i}"
        )
    expr = " + ".join(votes)
    return f"""WITH t AS (
         SELECT doc_id, COALESCE(list_filter(list_distinct(string_split({normalize_sql('text', 'duckdb')}, ' ')), x -> x <> ''), []) AS tk
         FROM documents)
       SELECT doc_id, CAST({expr} AS BIGINT) AS simhash FROM t"""


@query("simhash16", _simhash_sql(16))
def q_simhash(spark, sf):
    # 16-bit SimHash fingerprints (dedup family)
    return simhash(_t(spark, sf, "documents"), bits=16)


@query(
    "stopword_language_score",
    f"""WITH t AS (SELECT doc_id, string_split({normalize_sql('text', 'duckdb')}, ' ') AS toks FROM documents)
       SELECT doc_id,
              round(len(list_filter(toks, x -> list_contains({LANG_STOPWORDS['en']!r}, x))) * 1.0 /
                    nullif(len(toks), 0), 6) AS en_stopword_ratio
       FROM t""",
)
def q_stopword_language(spark, sf):
    # stopword-profile language scoring (text-analysis family)
    return _t(spark, sf, "documents").select(
        "doc_id", F.round(stopword_ratio(F.col("text"), "en"), 6).alias("en_stopword_ratio")
    )


@query(
    "token_quality_stats",
    f"""SELECT doc_id,
              CAST(CASE WHEN {normalize_sql('text', 'duckdb')} = '' THEN 0
                   ELSE len(string_split({normalize_sql('text', 'duckdb')}, ' ')) END AS INT) AS n_tokens,
              round(coalesce(len(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) * 1.0 / nullif(len(text), 0), 0), 6) AS alpha_ratio,
              round(coalesce(len(regexp_replace(text, '[^\\p{{N}}]', '', 'g')) * 1.0 / nullif(len(text), 0), 0), 6) AS digit_ratio
       FROM documents""",
)
def q_token_quality(spark, sf):
    # token counting + quality ratios (text-analysis family)
    docs = _t(spark, sf, "documents")
    qf = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        whitespace_token_count(F.col("text")).alias("n_tokens"),
        F.round(qf["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(qf["digit_ratio"], 6).alias("digit_ratio"),
    )


@query(
    "document_fingerprint",
    f"SELECT doc_id, md5({normalize_sql('text', 'duckdb')}) AS fp, "
    f"CAST(n_chars AS BIGINT) AS n_chars FROM documents",
)
def q_document_fingerprint(spark, sf):
    # whole-document fingerprint (rolling-hash family's exact member)
    from ontology_mapping_spark.operators.textstats import fingerprint

    return _t(spark, sf, "documents").select(
        "doc_id", fingerprint(F.col("text")).alias("fp"), F.col("n_chars")
    )


# --------------------------------------------------------------------------
# events: time windows + JSON props
# --------------------------------------------------------------------------

@query(
    "events_daily_rollup",
    """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(value), 4) AS total_value
       FROM events GROUP BY 1, 2""",
)
def q_events_daily(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy(
            F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@query(
    "events_json_extract",
    """SELECT event_type, CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
       FROM events GROUP BY event_type""",
)
def q_events_json(spark, sf):
    return (
        _t(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("int")).cast("bigint").alias("sum_k")
        )
    )


# --------------------------------------------------------------------------
# similarity search (embeddings table)
# --------------------------------------------------------------------------

@query(
    "embedding_topk_bruteforce",
    """WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       scored AS (
         SELECT q.q_id, c.vec_id AS c_id,
                list_cosine_similarity(q.qv, c.embedding) AS cos
         FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.q_id),
       ranked AS (
         SELECT q_id, c_id,
                row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
         FROM scored)
       SELECT q_id, c_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5""",
)
def q_embedding_topk(spark, sf):
    # brute-force cosine top-k baseline (similarity-search family); ids and
    # ranks only — the float scores stay engine-internal
    from ontology_mapping_spark.operators.similarity import cosine_topk_bruteforce

    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec"))
    out = cosine_topk_bruteforce(queries_df, corpus, k=6)
    # drop self-matches then re-rank 1..5 deterministically
    w = Window.partitionBy("q_id").orderBy(F.col("rank"))
    return (
        out.filter(F.col("q_id") != F.col("c_id"))
        .withColumn("rank2", F.row_number().over(w))
        .filter(F.col("rank2") <= 5)
        .select("q_id", "c_id", F.col("rank2").cast("int").alias("rank"))
    )


# --------------------------------------------------------------------------
# flagship: mention detection over documents with a derived phrase table
# --------------------------------------------------------------------------

_FLAGSHIP_SQL = f"""WITH d AS (
      SELECT doc_id, {normalize_sql('text', 'duckdb')} AS ntext FROM documents),
    toks AS (SELECT doc_id, string_split(ntext, ' ') AS toks FROM d),
    bigrams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(toks), 2)),
               i -> toks[i] || ' ' || toks[i + 1]))) AS phrase
      FROM toks WHERE len(toks) >= 2),
    vocab AS (
      SELECT phrase, count(DISTINCT doc_id) AS df FROM bigrams
      GROUP BY phrase HAVING count(DISTINCT doc_id) >= 30),
    hits AS (
      SELECT b.doc_id, b.phrase FROM bigrams b JOIN vocab v USING (phrase))
    SELECT doc_id, phrase FROM hits"""


@query("mention_detection_flagship", _FLAGSHIP_SQL)
def q_mentions_flagship(spark, sf):
    """Degenerate S3 slice over the documents corpus: derive a phrase
    vocabulary (bigrams with document frequency >= 30 — the 'ontology
    labels'), then emit (doc_id, phrase) mentions via the token-bigram
    blocking pattern (SURVEY §7 minimum end-to-end slice).

    Default form is the scale-safe partial/final hash aggregate +
    broadcast-vocab join (map-side combine absorbs hot phrases); the
    single-shuffle window form is the small-corpus opt-in — see
    frequent_phrase_mentions for the crossover discussion."""
    from ontology_mapping_spark.operators.textstats import frequent_phrase_mentions

    return frequent_phrase_mentions(_t(spark, sf, "documents"), n=2, min_df=30)


# --------------------------------------------------------------------------
# rows-only entries (no SQL-expressible oracle; driver records row counts)
# --------------------------------------------------------------------------

def _minhash_lsh_sql(num_hashes: int = 16, bands: int = 8, n: int = 3) -> str:
    """Full MinHash->banded-LSH->verify oracle, generated from the same
    constants as the Spark query (md5-slice hash lanes, band hashes,
    exact-Jaccard verification)."""
    rpb = num_hashes // bands
    hash_cols = ", ".join(
        f"list_min(list_transform(sh, s -> substr(md5('{j}|' || s), {8 * k + 1}, 8))) AS h{4 * j + k}"
        for j in range((num_hashes + 3) // 4)
        for k in range(4)
    )
    band_rows = ", ".join(
        "STRUCT_PACK(band := {b}, bh := md5(concat_ws('|', {hs})))".format(
            b=b, hs=", ".join(f"h{b * rpb + r}" for r in range(rpb))
        )
        for b in range(bands)
    )
    shingle_expr = "concat_ws(' ', " + ", ".join(
        f"toks[CAST(i+{d} AS INT)]" for d in range(n)
    ) + ")"
    return f"""WITH alld AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text || ' near duplicate suffix'
        FROM documents WHERE doc_id % 50 = 0),
      t AS (SELECT doc_id, string_split({normalize_sql('text', 'duckdb')}, ' ') AS toks FROM alld),
      sh_t AS (SELECT doc_id, CASE WHEN len(toks) >= {n}
           THEN list_distinct(list_transform(range(1, len(toks) - {n} + 2), i -> {shingle_expr}))
           ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
      sigs AS (SELECT doc_id, sh, {hash_cols} FROM sh_t),
      banded AS (SELECT doc_id, unnest([{band_rows}], recursive := true) FROM sigs),
      cands AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM banded x JOIN banded y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id),
      verified AS (SELECT c.a, c.b,
           len(list_intersect(sa.sh, sb.sh)) * 1.0 / len(list_distinct(list_concat(sa.sh, sb.sh))) AS j
           FROM cands c JOIN sh_t sa ON sa.doc_id = c.a JOIN sh_t sb ON sb.doc_id = c.b)
      SELECT a, b, round(j, 6) AS jaccard FROM verified WHERE j >= 0.5"""


def _decontaminate_sql(n: int = 13) -> str:
    """Eval-set n-gram decontamination oracle: re-derives the n-token
    shingles (same normalize + whole-text-fallback rules) and the
    contaminated-id set relationally."""
    shingle_expr = "concat_ws(' ', " + ", ".join(
        f"toks[CAST(i+{d} AS INT)]" for d in range(n)
    ) + ")"
    return f"""WITH t AS (
        SELECT doc_id, string_split({normalize_sql('text', 'duckdb')}, ' ') AS toks
        FROM documents),
      sh AS (SELECT doc_id, CASE WHEN len(toks) >= {n}
           THEN list_distinct(list_transform(range(1, len(toks) - {n} + 2), i -> {shingle_expr}))
           ELSE [array_to_string(toks, ' ')] END AS sh FROM t),
      g AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
      ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
      bad AS (SELECT DISTINCT g.doc_id FROM g JOIN ev USING (gram))
      SELECT d.doc_id FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM bad)"""


@query("decontaminate_eval13", _decontaminate_sql())
def q_decontaminate(spark, sf):
    """GPT-3/PaLM-style benchmark decontamination: every 50th document
    plays the held-out eval set; train docs sharing ANY 13-token shingle
    with it (including the eval copies themselves) drop. The oracle
    re-derives shingles and the contamination set relationally — gram
    hashing, broadcast semi-join, and the short-doc fallback all diverge
    the hash if wrong."""
    from ontology_mapping_spark.operators.dedup import decontaminate

    docs = _t(spark, sf, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    return decontaminate(docs, ev).select("doc_id")


@query("minhash_lsh_near_dups", _minhash_lsh_sql())
def q_minhash_lsh(spark, sf):
    # full MinHash->banded-LSH->verify near-dup pipeline; the DuckDB oracle
    # re-derives signatures, band buckets and exact Jaccard from the same
    # md5-slice scheme
    from ontology_mapping_spark.operators.dedup import near_dup_pairs_minhash

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" near duplicate suffix")).alias("text"),
    )
    return near_dup_pairs_minhash(
        docs.unionByName(planted), threshold=0.5, num_hashes=16, bands=8
    ).select("a", "b", F.round("jaccard", 6).alias("jaccard"))


@query(
    "ann_ivf_fixed_topk",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       cent AS (SELECT CAST(vec_id AS INT) AS list_id, v AS center FROM e WHERE vec_id < 8),
       assigned AS (
         SELECT vec_id AS c_id, v, list_id FROM (
           SELECT e.vec_id, e.v, c.list_id,
                  row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_cosine_similarity(e.v, c.center) DESC, c.list_id) AS ar
           FROM e CROSS JOIN cent c) WHERE ar = 1),
       q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
       probes AS (
         SELECT q_id, qv, list_id FROM (
           SELECT q.q_id, q.qv, c.list_id,
                  row_number() OVER (PARTITION BY q.q_id
                      ORDER BY list_cosine_similarity(q.qv, c.center) DESC, c.list_id) AS pr
           FROM q CROSS JOIN cent c) WHERE pr <= 3),
       scored AS (SELECT p.q_id, a.c_id, list_cosine_similarity(p.qv, a.v) AS cos
                  FROM probes p JOIN assigned a USING (list_id)),
       ranked AS (SELECT q_id, c_id,
                         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, c_id) AS rank
                  FROM scored)
       SELECT q_id, c_id, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5""",
)
def q_ann_ivf_fixed(spark, sf):
    # IVF ANN with a deterministic fixed codebook (first-8 vectors — the
    # standard cheap sample init), fully SQL-reproducible: assignment,
    # probe selection and in-list ranking all re-derived by the oracle
    from ontology_mapping_spark.operators.similarity import ann_ivf_topk

    emb = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("v").alias("vec"))
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("list_id"), F.col("v").alias("center")
    )
    queries_df = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("vec")
    )
    out = ann_ivf_topk(queries_df, corpus, k=5, nprobe=3, centroids=cents)
    return out.select("q_id", "c_id", F.col("rank").cast("int").alias("rank"))


@query(
    "ann_ivf_topk",
    """SELECT vec_id AS q_id, CAST(TRUE AS BOOLEAN) AS recall_ok
       FROM embeddings WHERE vec_id < 5""",
)
def q_ann_ivf(spark, sf):
    """IVF ANN with the KMeans coarse quantizer. KMeans itself is not
    SQL-reproducible, so the oracle checks the property that matters: for
    every query, IVF top-5 must recover >= 3 of the exact brute-force
    top-5 (recall@5 >= 0.6 with nprobe=6 of 8 lists; the synthetic
    embeddings are near-uniform, the hardest case for a coarse quantizer,
    so the probe budget is generous — measured min recall is 3/5 at
    sf0.001, 4/5 at sf0.01 and sf0.1). The engine computes
    both sides and emits one (q_id, recall_ok) row per query; a recall dip
    flips recall_ok to false and the value hash diverges."""
    from ontology_mapping_spark.operators.similarity import (
        ann_ivf_topk,
        cosine_topk_bruteforce,
    )

    emb = _t(spark, sf, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("vec")
    )
    corpus = emb.select(F.col("vec_id").alias("c_id"), F.col("embedding").alias("vec"))
    ivf = ann_ivf_topk(queries_df, corpus, k=5, n_centroids=8, nprobe=6)
    brute = cosine_topk_bruteforce(queries_df, corpus, k=5)
    hits = (
        brute.select("q_id", "c_id")
        .join(ivf.select("q_id", "c_id", F.lit(1).alias("hit")), ["q_id", "c_id"], "left")
        .groupBy("q_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"))
    )
    return hits.select("q_id", (F.col("n_hits") >= 3).alias("recall_ok"))


_SHINGLE3_CTE = f"""t AS (SELECT doc_id, string_split({normalize_sql('text', 'duckdb')}, ' ') AS toks FROM documents),
      sh_t AS (SELECT doc_id, CASE WHEN len(toks) >= 3
           THEN list_distinct(list_transform(range(1, len(toks) - 1),
                i -> concat_ws(' ', toks[CAST(i AS INT)], toks[CAST(i+1 AS INT)], toks[CAST(i+2 AS INT)])))
           ELSE [array_to_string(toks, ' ')] END AS sh FROM t)"""


@query(
    "ngram_jaccard_pairs",
    f"""WITH {_SHINGLE3_CTE}
       SELECT sa.doc_id AS a, sb.doc_id AS b,
              round(len(list_intersect(sa.sh, sb.sh)) * 1.0 /
                    len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
       FROM sh_t sa JOIN sh_t sb ON sb.doc_id = sa.doc_id + 1
       WHERE sa.doc_id % 2 = 0""",
)
def q_ngram_jaccard(spark, sf):
    # exact n-gram-shingle Jaccard as a standalone scoring kernel
    # (dedup family; the verification stage of the MinHash pipeline)
    from ontology_mapping_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf, "documents")
    pairs = docs.select(F.col("doc_id").alias("a"), (F.col("doc_id") + 1).alias("b")).filter(
        F.col("a") % 2 == 0
    )
    return ngram_jaccard_pairs(docs, pairs).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


@query(
    "embedding_near_dup_pairs",
    """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       planted AS (SELECT vec_id + 1000000 AS vec_id,
              list_transform(range(1, len(v) + 1), i -> v[CAST(i AS INT)] + 0.1 * v[CAST(len(v) - i + 1 AS INT)]) AS v
              FROM e WHERE vec_id % 10 = 0)
       SELECT p.vec_id AS a, e.vec_id AS b,
              round(list_cosine_similarity(p.v, e.v), 5) AS cos
       FROM planted p CROSS JOIN e
       WHERE list_cosine_similarity(p.v, e.v) >= 0.8""",
)
def q_embedding_near_dups(spark, sf):
    # embedding-cosine near-dup (dedup family): deterministic planted
    # near-dups (v + 0.1*reverse(v), cos ~0.995 vs next-best ~0.49 —
    # no threshold-boundary float risk), brute-force probe form
    from ontology_mapping_spark.functions.arrays import bind
    from ontology_mapping_spark.operators.dedup import near_dup_pairs_embedding

    emb = _t(spark, sf, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    planted = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        bind(
            F.col("v"),
            lambda v: F.zip_with(v, F.reverse(v), lambda a, b: a + F.lit(0.1) * b),
        ).alias("v"),
    )
    out = near_dup_pairs_embedding(
        base, threshold=0.8, id_col="vec_id", vec_col="v", queries=planted
    )
    return out.select("a", "b", F.round("cos", 5).alias("cos"))


def _planted_embeddings(spark, sf, every: int = 10, eps: float = 0.02):
    """(base, planted): planted vec = v + eps*reverse(v) for vec_id % every
    == 0, id shifted by 1_000_000 — cos(planted, base) ~= 1-eps^2/2 vs
    next-best ~0.49 on the near-uniform synthetic embeddings."""
    from ontology_mapping_spark.functions.arrays import bind

    base = _t(spark, sf, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    planted = base.filter(F.col("vec_id") % every == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        bind(
            F.col("v"),
            lambda v: F.zip_with(v, F.reverse(v), lambda a, b: a + F.lit(eps) * b),
        ).alias("v"),
    )
    return base, planted


@query(
    "embedding_lsh_near_dup",
    """SELECT vec_id AS a, CAST(TRUE AS BOOLEAN) AS found_ok
       FROM embeddings WHERE vec_id % 10 = 0 ORDER BY a""",
)
def q_embedding_lsh_near_dup(spark, sf):
    """Corpus-scale embedding near-dup: sign-LSH bucket blocking (seeded
    hyperplanes as Catalyst literals, bucket equi-join — never n^2) + exact
    cosine verify. LSH bucketing is not SQL-expressible, so the oracle
    checks the property that matters (the ann_ivf_topk recall pattern):
    every planted near-dup pair (cos ~0.9996 at eps=0.02 vs next-best
    ~0.49) must be recovered. With nbits=8, tables=4 the per-pair miss
    probability is ~(1-(1-theta/pi)^8)^4 ~= 2e-5, and the seeded planes
    make the outcome deterministic per sf — verified all-found at
    sf0.001/0.01/0.1. A recall dip flips found_ok and the hash diverges."""
    from ontology_mapping_spark.operators.dedup import near_dup_pairs_embedding

    base, planted = _planted_embeddings(spark, sf)
    corpus = base.unionByName(planted)
    found = near_dup_pairs_embedding(
        corpus, threshold=0.99, id_col="vec_id", vec_col="v",
        dim=64, nbits=8, tables=4,
    )
    want = base.filter(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("a"), (F.col("vec_id") + 1000000).alias("b")
    )
    hit = found.select("a", "b", F.lit(1).alias("hit"))
    return (
        want.join(hit, ["a", "b"], "left")
        .select("a", F.col("hit").isNotNull().alias("found_ok"))
        .orderBy("a")
    )


@query(
    "ann_lsh_topk",
    """SELECT vec_id + 1000000 AS q_id, CAST(TRUE AS BOOLEAN) AS top1_ok
       FROM embeddings WHERE vec_id % 100 = 0 ORDER BY q_id""",
)
def q_ann_lsh_topk(spark, sf):
    """Sign-LSH ANN top-k (similarity.ann_lsh_topk): each planted query's
    true base vector must come back at rank 1 (uniform embeddings are
    adversarial for sign-LSH recall@k on NON-near neighbors, so the
    planted-top1 property is the meaningful, stable check)."""
    from ontology_mapping_spark.operators.similarity import ann_lsh_topk

    base, planted = _planted_embeddings(spark, sf, every=100)
    queries_df = planted.select(F.col("vec_id").alias("q_id"), F.col("v").alias("vec"))
    corpus = base.select(F.col("vec_id").alias("c_id"), F.col("v").alias("vec"))
    top = ann_lsh_topk(queries_df, corpus, dim=64, k=5, nbits=8, tables=4)
    return (
        top.filter(F.col("rank") == 1)
        .select(
            "q_id",
            (F.col("c_id") == F.col("q_id") - 1000000).alias("top1_ok"),
        )
        .orderBy("q_id")
    )


@query(
    "parent_similarity_maxcos",
    f"""WITH lbl AS (SELECT CAST(p_partkey AS VARCHAR) AS uri, {normalize_sql('p_name', 'duckdb')} AS ntext FROM part),
       toks AS (SELECT uri, unnest(string_split(ntext, ' ')) AS tok FROM lbl),
       h AS (SELECT uri,
               ('0x' || substr(sha256(tok), 1, 8))::BIGINT % 16 AS idx,
               CASE WHEN ('0x' || substr(sha256(tok), 10, 1))::BIGINT % 2 = 1 THEN 1 ELSE -1 END AS s
             FROM toks WHERE tok <> ''),
       sp AS (SELECT uri, idx, SUM(s) AS v FROM h GROUP BY uri, idx),
       nrm AS (SELECT uri, sqrt(SUM(v * v)) AS n FROM sp GROUP BY uri),
       e AS (SELECT CAST(p_partkey AS VARCHAR) AS child, CAST(p_partkey // 2 AS VARCHAR) AS parent
             FROM part WHERE p_partkey >= 2
             UNION
             SELECT CAST(p_partkey AS VARCHAR), CAST(p_partkey // 3 AS VARCHAR)
             FROM part WHERE p_partkey >= 3),
       pairs AS (SELECT CAST(p_partkey AS VARCHAR) AS src, CAST(p_partkey + 1 AS VARCHAR) AS tgt
                 FROM part WHERE p_partkey % 20 = 0 AND p_partkey >= 2),
       pp AS (SELECT p.src, p.tgt, e1.parent AS pa, e2.parent AS pb
              FROM pairs p JOIN e e1 ON e1.child = p.src JOIN e e2 ON e2.child = p.tgt),
       dots AS (SELECT pp.src, pp.tgt, pp.pa, pp.pb, COALESCE(SUM(s1.v * s2.v), 0) AS dot
                FROM pp
                LEFT JOIN sp s1 ON s1.uri = pp.pa
                LEFT JOIN sp s2 ON s2.uri = pp.pb AND s2.idx = s1.idx
                GROUP BY pp.src, pp.tgt, pp.pa, pp.pb),
       cosv AS (SELECT d.src, d.tgt,
                       CASE WHEN n1.n > 0 AND n2.n > 0 THEN d.dot / (n1.n * n2.n) ELSE 0 END AS c
                FROM dots d JOIN nrm n1 ON n1.uri = d.pa JOIN nrm n2 ON n2.uri = d.pb)
       SELECT src, tgt, round(MAX(c), 6) AS parent_similarity
       FROM cosv GROUP BY src, tgt""",
)
def q_parent_similarity(spark, sf):
    """Parent-pair max cosine (thesis/pre_processing_data.py:257-267) with a
    fully SQL-reproducible embedding: a signed hashed bag-of-words whose
    entries are INTEGER token counts (sha256-derived index and sign), so
    dot products and norms are bit-exact in both engines — the float32
    pandas-UDF embedding stays the production path, this query pins the
    operator's join/aggregation semantics."""
    from ontology_mapping_spark.functions.arrays import bind
    from ontology_mapping_spark.operators.features_ext import parent_similarity

    part = _t(spark, sf, "part")
    lbl = part.select(
        F.col("p_partkey").cast("string").alias("uri"),
        normalize_col("p_name").alias("ntext"),
    )
    toks = lbl.select("uri", F.explode(F.split("ntext", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    sha = F.sha2(F.col("tok"), 256)
    hx = toks.select(
        "uri",
        (F.conv(F.substring(sha, 1, 8), 16, 10).cast("long") % 16).alias("idx"),
        F.when(
            F.conv(F.substring(sha, 10, 1), 16, 10).cast("long") % 2 == 1, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("s"),
    )
    sp = hx.groupBy("uri", "idx").agg(F.sum("s").alias("v"))
    emb = sp.groupBy("uri").agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "v"))).alias("m")
    ).select(
        "uri",
        bind(
            F.col("m"),
            lambda m: F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda d: F.coalesce(
                    F.element_at(m, d.cast("long")), F.lit(0)
                ).cast("double"),
            ),
        ).alias("vec"),
    )
    e1 = part.filter(F.col("p_partkey") >= 2).select(
        F.col("p_partkey").cast("string").alias("child"),
        F.floor(F.col("p_partkey") / 2).cast("bigint").cast("string").alias("parent"),
    )
    e2 = part.filter(F.col("p_partkey") >= 3).select(
        F.col("p_partkey").cast("string").alias("child"),
        F.floor(F.col("p_partkey") / 3).cast("bigint").cast("string").alias("parent"),
    )
    edges2 = e1.unionByName(e2).distinct()
    pairs = part.filter((F.col("p_partkey") % 20 == 0) & (F.col("p_partkey") >= 2)).select(
        F.col("p_partkey").cast("string").alias("src"),
        (F.col("p_partkey") + 1).cast("string").alias("tgt"),
    )
    out = parent_similarity(pairs, edges2, emb)
    return out.select("src", "tgt", F.round("parent_similarity", 6).alias("parent_similarity"))


def _winnow_sql(k: int = 8, w: int = 4) -> str:
    return f"""WITH d AS (SELECT doc_id, {normalize_sql('text', 'duckdb')} AS n FROM documents),
      g AS (SELECT doc_id, CASE WHEN length(n) >= {k}
           THEN list_transform(range(1, length(n) - {k} + 2), i -> md5(substr(n, CAST(i AS INT), {k})))
           ELSE [md5(n)] END AS grams FROM d),
      m AS (SELECT doc_id, list_distinct(CASE WHEN len(grams) >= {w}
           THEN list_transform(range(0, len(grams) - {w} + 1),
                i -> list_min(grams[CAST(i + 1 AS INT):CAST(i + {w} AS INT)]))
           ELSE [list_min(grams)] END) AS fps FROM g)
      SELECT doc_id, unnest(fps) AS fp FROM m"""


@query("winnow_fingerprints", _winnow_sql())
def q_winnow(spark, sf):
    # winnowing local fingerprints (window-min over k-gram hash sequences)
    from ontology_mapping_spark.operators.textstats import winnow_fingerprints

    return winnow_fingerprints(_t(spark, sf, "documents"))


def _containment_sql(k: int = 8, w: int = 4, min_shared: int = 30) -> str:
    # the winnow CTE over documents + planted substring-halves, then the
    # fingerprint-overlap self-join containment_pairs re-expresses
    return f"""WITH base AS (SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 2000000 AS doc_id, substr(text, 1, 120) AS text
           FROM documents WHERE doc_id % 100 = 0),
      d AS (SELECT doc_id, {normalize_sql('text', 'duckdb')} AS n FROM base),
      g AS (SELECT doc_id, CASE WHEN length(n) >= {k}
           THEN list_transform(range(1, length(n) - {k} + 2), i -> md5(substr(n, CAST(i AS INT), {k})))
           ELSE [md5(n)] END AS grams FROM d),
      m AS (SELECT doc_id, list_distinct(CASE WHEN len(grams) >= {w}
           THEN list_transform(range(0, len(grams) - {w} + 1),
                i -> list_min(grams[CAST(i + 1 AS INT):CAST(i + {w} AS INT)]))
           ELSE [list_min(grams)] END) AS fps FROM g),
      fp AS (SELECT doc_id, unnest(fps) AS f FROM m),
      sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fps FROM fp GROUP BY doc_id),
      shared AS (SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared_fps
                 FROM fp x JOIN fp y ON x.f = y.f AND x.doc_id < y.doc_id
                 GROUP BY x.doc_id, y.doc_id
                 HAVING count(*) >= {min_shared})
      SELECT s.a, s.b, s.shared_fps,
             round(s.shared_fps * 1.0 / least(sa.n_fps, sb.n_fps), 6) AS containment
      FROM shared s
      JOIN sizes sa ON sa.doc_id = s.a
      JOIN sizes sb ON sb.doc_id = s.b"""


@query(
    "url_dedup_canonical",
    """WITH u AS (SELECT doc_id,
             'https://example' || (doc_id % 20) || '.com/path/' || (doc_id % 50)
               || '?id=' || (doc_id % 25) AS url_canon
           FROM documents)
       SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, url_canon
       FROM u GROUP BY url_canon""",
)
def q_url_dedup(spark, sf):
    """URL canonicalization + dedup. The engine canonicalizes MESSY urls
    (mixed-case scheme/host, www, default port, tracking params, trailing
    slash, fragment) built deterministically from doc_id; the oracle
    derives the expected canonical form directly from the same generator
    parameters — an independent derivation, so a canonicalization bug on
    any step diverges the hash."""
    from ontology_mapping_spark.operators.dedup import url_dedup

    messy = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Example"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".COM:443/path/"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("/?utm_source=feed&id="),
            (F.col("doc_id") % 25).cast("string"),
            F.lit("&utm_campaign=x#sec"),
        ).alias("url"),
    )
    return url_dedup(messy).select("doc_id", "url_canon")


@query(
    "line_dedup_corpus",
    """WITH planted AS (SELECT doc_id,
             'Top Banner Advertisement Line' || chr(10) || text || chr(10)
               || 'ok' || chr(10) || 'Copyright Footer Variant ' || (doc_id % 5) AS t
           FROM documents),
      l AS (SELECT doc_id,
             CAST(unnest(range(0, len(s))) AS BIGINT) AS pos, unnest(s) AS line
           FROM (SELECT doc_id, string_split(t, chr(10)) AS s FROM planted)),
      f AS (SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
           FROM l),
      k AS (SELECT doc_id, pos, line,
             (rn = 1 OR length(trim(line)) < 10) AS keep FROM f)
      SELECT doc_id,
             coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '')
               AS clean_text,
             CAST(count(*) FILTER (keep) AS BIGINT) AS n_lines_kept,
             CAST(count(*) AS BIGINT) AS n_lines_total
      FROM k GROUP BY doc_id""",
)
def q_line_dedup(spark, sf):
    """C4-style corpus-wide line dedup: a banner line shared by ALL docs,
    a footer shared by each doc_id%5 stratum, and an exempt short line are
    planted around every document; only the globally-first doc keeps each
    shared line. The oracle re-derives keep-first with a window over the
    raw line text — independent of the engine's min-struct groupBy winner
    plan, so a winner-selection or reassembly-order bug diverges."""
    from ontology_mapping_spark.operators.dedup import line_dedup

    planted = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("Top Banner Advertisement Line\n"),
            F.col("text"),
            F.lit("\nok\nCopyright Footer Variant "),
            (F.col("doc_id") % 5).cast("string"),
        ).alias("text"),
    )
    return line_dedup(planted, min_chars=10).select(
        "doc_id",
        F.col("text").alias("clean_text"),
        "n_lines_kept",
        "n_lines_total",
    )


@query(
    "pii_scrub",
    r"""WITH planted AS (SELECT doc_id,
             text || ' contact user' || (doc_id % 50) || '@example' || (doc_id % 7)
                  || '.org or +1415555' || (doc_id % 9000 + 1000)
                  || ' from 10.1.' || (doc_id % 256) || '.' || (doc_id % 100) AS t
           FROM documents),
      e AS (SELECT doc_id,
             regexp_replace(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t,
             len(regexp_extract_all(t, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS n_email
           FROM planted),
      i AS (SELECT doc_id, n_email,
             regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t,
             len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip
           FROM e),
      p AS (SELECT doc_id, n_email, n_ip,
             regexp_replace(t, '\+\d{9,15}', '<PHONE>', 'g') AS t,
             len(regexp_extract_all(t, '\+\d{9,15}')) AS n_phone
           FROM i)
      SELECT doc_id, t AS clean_text,
             CAST(n_email AS INT) AS n_email, CAST(n_ip AS INT) AS n_ip,
             CAST(n_phone AS INT) AS n_phone
      FROM p""",
)
def q_pii_scrub(spark, sf):
    """PII scrubbing (emails / IPv4 / international phones) with per-class
    counts: deterministic PII planted into every document, RE2-compatible
    patterns, so the DuckDB oracle runs the IDENTICAL regex chain."""
    from ontology_mapping_spark.functions.strings import scrub_pii_cols

    planted = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit("@example"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".org or +1415555"),
            (F.col("doc_id") % 9000 + 1000).cast("string"),
            F.lit(" from 10.1."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 100).cast("string"),
        ).alias("t"),
    )
    cols = scrub_pii_cols(F.col("t"))
    return planted.select(
        "doc_id",
        cols["clean_text"].alias("clean_text"),
        cols["n_email"].alias("n_email"),
        cols["n_ip"].alias("n_ip"),
        cols["n_phone"].alias("n_phone"),
    )


@query("containment_pairs", _containment_sql())
def q_containment(spark, sf):
    """Near-containment via winnow-fingerprint overlap (the application
    winnowing exists for): planted substring-halves of every 100th doc
    must surface as high-containment pairs; the oracle re-derives the
    fingerprints, the overlap self-join and the containment ratio."""
    from ontology_mapping_spark.operators.dedup import containment_pairs

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    planted = docs.filter(F.col("doc_id") % 100 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.substring(F.col("text"), 1, 120).alias("text"),
    )
    out = containment_pairs(docs.unionByName(planted), min_shared=30)
    return out.select(
        "a", "b", "shared_fps", F.round("containment", 6).alias("containment")
    )


@query(
    "media_feature_plumbing",
    """SELECT CAST(doc_id AS VARCHAR) AS media_id, 'image' AS kind,
              concat_ws(',', CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 1, 4))::BIGINT AS VARCHAR), CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 5, 4))::BIGINT AS VARCHAR), CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 9, 4))::BIGINT AS VARCHAR), CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 13, 4))::BIGINT AS VARCHAR), CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 17, 4))::BIGINT AS VARCHAR), CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 21, 4))::BIGINT AS VARCHAR), CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 25, 4))::BIGINT AS VARCHAR), CAST(('0x' || substr(md5('0|' || COALESCE(text, '')), 29, 4))::BIGINT AS VARCHAR)) AS feature_str,
              CAST(octet_length(encode(COALESCE(text, ''))) AS INT) AS n_bytes
       FROM documents WHERE doc_id < 50""",
)
def q_media(spark, sf):
    """Multimodal plumbing demo: documents' text bytes ride as opaque
    binary payloads through the Arrow-batched mapInPandas feature
    extractor. The fake decode kernel is md5-slice-derived (integer-exact
    in float32), so the oracle value-checks every lane; the array is
    projected to a comma-joined string because the driver's pandas
    canonicalizer cannot sort list columns."""
    from ontology_mapping_spark.operators.multimodal import extract_media_features

    docs = _t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    media = docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
    )
    feats = extract_media_features(media, dim=8)
    return feats.select(
        "media_id",
        "kind",
        F.array_join(
            F.transform("feature", lambda x: x.cast("bigint").cast("string")), ","
        ).alias("feature_str"),
        "n_bytes",
    )


@query(
    "corpus_filter_verdicts",
    f"""WITH d AS (SELECT doc_id, text, COALESCE({normalize_sql('text', 'duckdb')}, '') AS n FROM documents),
      t AS (SELECT doc_id, text, list_filter(string_split(n, ' '), x -> x <> '') AS toks FROM d),
      base AS (SELECT doc_id, text, len(toks) AS n_tokens,
                      len(list_distinct(toks)) AS n_distinct, toks FROM t),
      b AS (SELECT doc_id, toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] AS bg
            FROM base, unnest(range(1, len(toks))) AS u(i) WHERE n_tokens >= 2),
      topb AS (SELECT doc_id, MAX(c) AS top_bigram_count
               FROM (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg)
               GROUP BY doc_id),
      sig AS (SELECT base.doc_id, CAST(n_tokens AS INT) AS n_tokens,
             round(CASE WHEN n_tokens > 0 THEN n_distinct * 1.0 / n_tokens ELSE 0 END, 6) AS distinct_token_frac,
             round(CASE WHEN n_tokens >= 2 THEN COALESCE(top_bigram_count, 0) * 1.0 / (n_tokens - 1) ELSE 0 END, 6) AS top_bigram_frac,
             round(len(list_filter(toks, x -> list_contains({LANG_STOPWORDS['en']!r}, x))) * 1.0 /
                   nullif(len(toks), 0), 6) AS stopword_ratio,
             round(coalesce(len(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) * 1.0 / nullif(len(text), 0), 0), 6) AS alpha_ratio
           FROM base LEFT JOIN topb USING (doc_id))
      SELECT doc_id, n_tokens, distinct_token_frac, top_bigram_frac,
             stopword_ratio, alpha_ratio,
             (n_tokens >= 10 AND n_tokens <= 100000
              AND distinct_token_frac >= 0.3 AND top_bigram_frac <= 0.2
              AND stopword_ratio >= 0.01 AND alpha_ratio >= 0.5) AS keep
      FROM sig""",
)
def q_corpus_filter(spark, sf):
    """The composed C4/Gopher-style cleaning pass (corpus_filter): one
    within-row projection emitting every signal + the keep verdict
    (445/55 split at sf0.01 under the defaults). The oracle re-derives
    all signals relationally and applies the same rounded-threshold
    conjunction."""
    from ontology_mapping_spark.operators.textstats import corpus_filter

    out = corpus_filter(_t(spark, sf, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "distinct_token_frac",
        "top_bigram_frac",
        "stopword_ratio",
        "alpha_ratio",
        "keep",
    )


@query(
    "repetition_stats",
    f"""WITH d AS (SELECT doc_id, COALESCE({normalize_sql('text', 'duckdb')}, '') AS n FROM documents),
      t AS (SELECT doc_id, list_filter(string_split(n, ' '), x -> x <> '') AS toks FROM d),
      base AS (SELECT doc_id, len(toks) AS n_tokens,
                      len(list_distinct(toks)) AS n_distinct, toks FROM t),
      b AS (SELECT doc_id, toks[CAST(i AS INT)] || ' ' || toks[CAST(i + 1 AS INT)] AS bg
            FROM base, unnest(range(1, len(toks))) AS u(i) WHERE n_tokens >= 2),
      topb AS (SELECT doc_id, MAX(c) AS top_bigram_count
               FROM (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg)
               GROUP BY doc_id)
      SELECT base.doc_id, CAST(n_tokens AS INT) AS n_tokens,
             round(CASE WHEN n_tokens > 0 THEN n_distinct * 1.0 / n_tokens ELSE 0 END, 6) AS distinct_token_frac,
             CAST(COALESCE(top_bigram_count, 0) AS INT) AS top_bigram_count,
             round(CASE WHEN n_tokens >= 2 THEN COALESCE(top_bigram_count, 0) * 1.0 / (n_tokens - 1) ELSE 0 END, 6) AS top_bigram_frac
      FROM base LEFT JOIN topb USING (doc_id)""",
)
def q_repetition_stats(spark, sf):
    """Gopher-family repetition quality signals (text-analysis family).
    The engine computes everything WITHIN the row (array_sort + linear
    aggregate over a (prev, run, best) struct — zero shuffle for per-doc
    stats at any corpus size); the oracle re-derives the same numbers the
    relational way (explode + two GROUP BYs), so agreement checks the
    algebra, not the plan."""
    from ontology_mapping_spark.operators.textstats import repetition_stats

    out = repetition_stats(_t(spark, sf, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        "distinct_token_frac",
        F.col("top_bigram_count").cast("int").alias("top_bigram_count"),
        "top_bigram_frac",
    )


# shared by mentions_join_scan (batch) and mentions_stream_parity
# (Structured Streaming): both engines must match the SAME oracle, which is
# the strongest driver-checkable form of batch/stream parity.
_MENTIONS_SCAN_SQL = f"""WITH ph AS (
        SELECT CAST(doc_id AS VARCHAR) AS uri,
               array_to_string(list_filter(string_split({normalize_sql('text', 'duckdb')}, ' '), x -> x <> '')[1:2], ' ') AS phrase
        FROM documents WHERE doc_id % 20 = 0),
      ph2 AS (SELECT uri, phrase, list_filter(string_split(phrase, ' '), x -> x <> '') AS pt
              FROM ph WHERE phrase <> ''),
      d AS (SELECT CAST(doc_id AS VARCHAR) AS url,
                   list_filter(string_split({normalize_sql('text', 'duckdb')}, ' '), x -> x <> '') AS toks
            FROM documents),
      hits AS (
        SELECT d.url, ph2.uri, ph2.phrase AS surface,
               CASE WHEN len(toks) >= len(pt) THEN
                 len(list_filter(range(1, len(toks) - len(pt) + 2),
                     i -> toks[CAST(i AS INT):CAST(i + len(pt) - 1 AS INT)] = pt))
               ELSE 0 END AS n_hits
        FROM d CROSS JOIN ph2)
      SELECT DISTINCT url, uri, surface, CAST(n_hits AS INT) AS n_hits
      FROM hits WHERE n_hits > 0"""


@query("mentions_join_scan", _MENTIONS_SCAN_SQL)
def q_mentions_join_scan(spark, sf):
    """The core declarative mention detector (mentions_via_join: first-token
    blocking + JVM whole-phrase verify) driver-verified on the shared
    tables: 2-token document prefixes act as the ontology labels, the
    documents corpus as the pages. The oracle re-counts overlap-safe
    start positions with list lambdas — same n_hits contract the trie and
    streaming paths share (phrase_hit_count_expr)."""
    from ontology_mapping_spark.operators.mentions import mentions_via_join

    docs = _t(spark, sf, "documents")
    # every 20th document's 2-token prefix acts as an ontology label —
    # guaranteed to occur (at least in its own document), so the gate
    # checks real hit counts, not an empty result
    phrases = _doc_prefix_phrases(docs)
    pages = _t(spark, sf, "documents").select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    out = mentions_via_join(pages, phrases)
    return out.select("url", "uri", "surface", F.col("n_hits").cast("int").alias("n_hits"))


_CAP = 200

@query(
    "blocking_token_join_capped",
    f"""WITH s0 AS (SELECT DISTINCT p_partkey AS src, unnest(string_split({_NORM_DOC}, ' ')) AS token
                    FROM part WHERE p_partkey % 2 = 0),
        hs AS (SELECT token FROM s0 GROUP BY token HAVING count(*) > {_CAP}),
        s AS (SELECT * FROM s0 WHERE token NOT IN (SELECT token FROM hs)),
        t0 AS (SELECT DISTINCT p_partkey AS tgt, unnest(string_split({_NORM_DOC}, ' ')) AS token
               FROM part WHERE p_partkey % 2 = 1),
        ht AS (SELECT token FROM t0 GROUP BY token HAVING count(*) > {_CAP}),
        t AS (SELECT * FROM t0 WHERE token NOT IN (SELECT token FROM ht))
       SELECT DISTINCT s.src, t.tgt FROM s JOIN t USING (token)""",
)
def q_blocking_token_join_capped(spark, sf):
    # the scale form of the blocking join: tokens hotter than max_token_df
    # are dropped per side (stop-word df-cap, SURVEY §4 item 3) — bounds the
    # quadratic blowup the naive inverted index suffers on hot tokens
    from ontology_mapping_spark.operators.blocking import blocking_join
    from ontology_mapping_spark.config import PipelineConfig

    part = _t(spark, sf, "part").select(
        F.col("p_partkey").alias("uri"), normalize_col("p_name").alias("text")
    )
    src = part.filter(F.col("uri") % 2 == 0)
    tgt = part.filter(F.col("uri") % 2 == 1)
    return blocking_join(src, tgt, PipelineConfig(max_token_df=_CAP))


@query(
    "lca_depth_overlap",
    f"""WITH RECURSIVE e AS ({_EDGES_SQL}),
       anc(node, ancestor, dist) AS (
         SELECT child, parent, 1 FROM e
         UNION
         SELECT a.node, e.parent, a.dist + 1 FROM anc a JOIN e ON a.ancestor = e.child),
       depth AS (SELECT node, max(dist) AS d FROM anc GROUP BY node),
       pairs AS (SELECT CAST(p_partkey AS VARCHAR) AS src, CAST(p_partkey + 1 AS VARCHAR) AS tgt
                 FROM part WHERE p_partkey % 20 = 0 AND p_partkey >= 2),
       common AS (
         SELECT p.src, p.tgt, a1.ancestor
         FROM pairs p JOIN anc a1 ON a1.node = p.src
                      JOIN anc a2 ON a2.node = p.tgt AND a2.ancestor = a1.ancestor),
       lca AS (SELECT c.src, c.tgt, max(coalesce(d.d, 0)) AS lca_depth, count(*) AS n_common
               FROM common c LEFT JOIN depth d ON d.node = c.ancestor GROUP BY c.src, c.tgt)
       SELECT p.src, p.tgt,
              CAST(coalesce(l.lca_depth, 0) AS INT) AS lca_depth,
              round(coalesce(l.n_common, 0) * 1.0 /
                    nullif(greatest(coalesce(d1.d, 0), coalesce(d2.d, 0)), 0), 6)
                AS hierarchical_overlap_ratio
       FROM pairs p
       LEFT JOIN lca l ON l.src = p.src AND l.tgt = p.tgt
       LEFT JOIN depth d1 ON d1.node = p.src
       LEFT JOIN depth d2 ON d2.node = p.tgt""",
)
def q_lca_depth_overlap(spark, sf):
    # LCA depth (thesis/pre_processing_data.py:226-236) + hierarchical
    # overlap ratio (:247-254) from the materialized closure
    from ontology_mapping_spark.operators.features_ext import lca_depth, overlap_ratio

    edges = _part_edges(spark, sf)
    closure = G.transitive_closure(edges)
    depths = G.depths(edges, closure)
    pairs = (
        _t(spark, sf, "part")
        .filter((F.col("p_partkey") % 20 == 0) & (F.col("p_partkey") >= 2))
        .select(
            F.col("p_partkey").cast("string").alias("src"),
            (F.col("p_partkey") + 1).cast("string").alias("tgt"),
        )
    )
    l = lca_depth(pairs, closure, depths)
    o = overlap_ratio(pairs, closure, depths)
    out = l.join(o, ["src", "tgt"])
    return out.select(
        "src",
        "tgt",
        F.col("lca_depth").cast("int").alias("lca_depth"),
        # oracle emits NULL when both nodes have depth 0 (never happens on
        # this tree: every pair node is below the root)
        F.round("hierarchical_overlap_ratio", 6).alias("hierarchical_overlap_ratio"),
    )


@query(
    "sibling_shared_child_flags",
    f"""WITH e AS ({_EDGES_SQL}),
       pairs AS (SELECT CAST(p_partkey AS VARCHAR) AS src, CAST(p_partkey + 1 AS VARCHAR) AS tgt
                 FROM part WHERE p_partkey % 10 = 0 AND p_partkey >= 2),
       sib AS (SELECT DISTINCT e1.child AS src, e2.child AS tgt
               FROM e e1 JOIN e e2 ON e1.parent = e2.parent),
       shc AS (SELECT DISTINCT e1.parent AS src, e2.parent AS tgt
               FROM e e1 JOIN e e2 ON e1.child = e2.child)
       SELECT p.src, p.tgt,
              CAST(CASE WHEN s.src IS NOT NULL THEN 1 ELSE 0 END AS INT) AS sibling_score,
              CAST(CASE WHEN c.src IS NOT NULL THEN 1 ELSE 0 END AS INT) AS shared_child
       FROM pairs p
       LEFT JOIN sib s ON s.src = p.src AND s.tgt = p.tgt
       LEFT JOIN shc c ON c.src = p.src AND c.tgt = p.tgt""",
)
def q_sibling_flags(spark, sf):
    # sibling score (:270-273) + shared-narrower flag (:333) as semi-join flags
    from ontology_mapping_spark.operators.features_ext import (
        shared_child_flag,
        sibling_score,
    )

    edges = _part_edges(spark, sf)
    pairs = (
        _t(spark, sf, "part")
        .filter((F.col("p_partkey") % 10 == 0) & (F.col("p_partkey") >= 2))
        .select(
            F.col("p_partkey").cast("string").alias("src"),
            (F.col("p_partkey") + 1).cast("string").alias("tgt"),
        )
    )
    s = sibling_score(pairs, edges)
    c = shared_child_flag(pairs, edges)
    return s.join(c, ["src", "tgt"]).select(
        "src", "tgt",
        F.col("sibling_score").cast("int").alias("sibling_score"),
        F.col("shared_child").cast("int").alias("shared_child"),
    )


@query(
    "hierarchical_distance",
    f"""WITH RECURSIVE e AS ({_EDGES_SQL}),
       dn(src, dst, dist) AS (
         SELECT parent, child, 1 FROM e
         UNION
         SELECT dn.src, e.child, dn.dist + 1 FROM dn JOIN e ON e.parent = dn.dst),
       pairs AS (SELECT CAST(p_partkey AS VARCHAR) AS src, CAST(p_partkey * 4 AS VARCHAR) AS tgt
                 FROM part WHERE p_partkey >= 2 AND p_partkey % 7 = 0
                 UNION ALL
                 SELECT CAST(p_partkey AS VARCHAR), CAST(p_partkey + 1 AS VARCHAR)
                 FROM part WHERE p_partkey >= 2 AND p_partkey % 11 = 0)
       SELECT p.src, p.tgt, CAST(min(d.dist) AS INT) AS hierarchical_distance
       FROM pairs p LEFT JOIN dn d ON d.src = p.src AND d.dst = p.tgt
       GROUP BY p.src, p.tgt""",
)
def q_hierarchical_distance(spark, sf):
    # shortest-path length with unreachable -> NULL (np.inf in the
    # reference, thesis/pre_processing_data.py:216-223)
    from ontology_mapping_spark.operators.features_ext import hierarchical_distance

    part = _t(spark, sf, "part")
    p1 = part.filter((F.col("p_partkey") >= 2) & (F.col("p_partkey") % 7 == 0)).select(
        F.col("p_partkey").cast("string").alias("src"),
        (F.col("p_partkey") * 4).cast("string").alias("tgt"),
    )
    p2 = part.filter((F.col("p_partkey") >= 2) & (F.col("p_partkey") % 11 == 0)).select(
        F.col("p_partkey").cast("string").alias("src"),
        (F.col("p_partkey") + 1).cast("string").alias("tgt"),
    )
    pairs = p1.unionByName(p2)
    out = hierarchical_distance(pairs, _part_edges(spark, sf), max_hops=24)
    return out.select(
        "src", "tgt", F.col("hierarchical_distance").cast("int").alias("hierarchical_distance")
    )


def _greek_sql(expr: str) -> str:
    from ontology_mapping_spark.functions.strings import GREEK_MAP

    out = expr
    for ch, name in GREEK_MAP.items():
        out = f"replace({out}, '{ch}', '{name}')"
    return out


def _typo_sql(expr: str) -> str:
    from ontology_mapping_spark.functions.strings import TYPOGRAPHIC_MAP

    out = expr
    for ch, rep in TYPOGRAPHIC_MAP.items():
        r = rep.replace("'", "''")
        out = f"replace({out}, '{ch}', '{r}')"
    return out


_DECORATED = "concat(p_name, ' α-Receptor β2 – “x” (qualifier)')"
_NORM_OPS_SQL = (
    "SELECT p_partkey, md5(trim(regexp_replace("
    "regexp_replace("
    + _typo_sql(_greek_sql(_DECORATED))
    + r", '\s*?\(.*?\)\s*?$', '', 'g')"
    + r", '\s{2,}', ' ', 'g'))) AS h FROM part"
)


@query("normalization_ops_suite", _NORM_OPS_SQL)
def q_normalization_ops(spark, sf):
    # the thesis/normalization.py operator chain: greek (:190-246) ->
    # typographic (:248-258) -> end-qualifier strip (:260-272) ->
    # whitespace collapse (:274-283), over a deterministically decorated
    # string so every op fires
    from ontology_mapping_spark.functions.strings import (
        remove_qualifiers_col,
        remove_whitespace_col,
        replace_greek_col,
        replace_typographic_col,
    )

    decorated = F.concat(F.col("p_name"), F.lit(" α-Receptor β2 – “x” (qualifier)"))
    out = remove_whitespace_col(
        remove_qualifiers_col(
            replace_typographic_col(replace_greek_col(decorated)), end_only=True
        )
    )
    return _t(spark, sf, "part").select("p_partkey", F.md5(out).alias("h"))


@query(
    "max_depth_per_side",
    f"""WITH RECURSIVE e AS ({_EDGES_SQL}),
       anc(node, ancestor, dist) AS (
         SELECT child, parent, 1 FROM e
         UNION
         SELECT a.node, e.parent, a.dist + 1 FROM anc a JOIN e ON a.ancestor = e.child),
       nodes AS (SELECT child AS node FROM e UNION SELECT parent FROM e),
       depth AS (SELECT n.node, coalesce(max(a.dist), 0) AS d
                 FROM nodes n LEFT JOIN anc a ON a.node = n.node GROUP BY n.node)
       SELECT CASE WHEN CAST(node AS BIGINT) % 2 = 0 THEN 'src' ELSE 'tgt' END AS side,
              CAST(max(d) AS INT) AS max_depth
       FROM depth GROUP BY 1""",
)
def q_max_depth_per_side(spark, sf):
    # per-ontology-side max depth — the norm_depth denominator
    # (thesis/process_data_features.py:121-124)
    edges = _part_edges(spark, sf)
    d = G.depths(edges)
    return (
        d.withColumn(
            "side",
            F.when(F.col("node").cast("bigint") % 2 == 0, "src").otherwise("tgt"),
        )
        .groupBy("side")
        .agg(F.max("depth").cast("int").alias("max_depth"))
    )


@query(
    "mint_uris",
    """SELECT p_partkey,
              concat('kg:', substr(sha256(concat(
                  CAST(length(p_name) AS VARCHAR), ':', p_name, '|',
                  CAST(length(p_brand) AS VARCHAR), ':', p_brand)), 1, 40)) AS minted
       FROM part""",
)
def q_mint_uris(spark, sf):
    # deterministic sha2 id minting replacing uuid4
    # (thesis/pre_processing_data.py:70,114,118 / normalization.py:144-151)
    from ontology_mapping_spark.sources.readers import mint_uri

    return _t(spark, sf, "part").select(
        "p_partkey", mint_uri("kg:", "p_name", "p_brand").alias("minted")
    )


@query(
    "fold_accents",
    """SELECT p_partkey, strip_accents(concat(p_name, ' émigré naïve São')) AS folded
       FROM part""",
)
def q_fold_accents(spark, sf):
    # accent folding (thesis/normalization.py:350-359) — stdlib NFD twin,
    # oracle: DuckDB strip_accents
    from ontology_mapping_spark.functions.strings import make_fold_accents_udf

    udf = make_fold_accents_udf()
    return _t(spark, sf, "part").select(
        "p_partkey",
        udf(F.concat(F.col("p_name"), F.lit(" émigré naïve São"))).alias("folded"),
    )

def _doc_prefix_phrases(docs: DataFrame) -> DataFrame:
    """Every 20th document's 2-token normalized prefix as an ontology label
    (uri = doc_id) — the shared phrase table of the batch mentions_join_scan
    and the streaming parity query."""
    toks = F.filter(F.split(normalize_col("text"), " "), lambda t: t != "")
    return (
        docs.filter(F.col("doc_id") % 20 == 0)
        .select(
            F.col("doc_id").cast("string").alias("uri"),
            F.array_join(F.slice(toks, 1, 2), " ").alias("phrase"),
        )
        .filter(F.col("phrase") != "")
    )


@query("mentions_stream_parity", _MENTIONS_SCAN_SQL)
def q_mentions_stream_parity(spark, sf):
    """Structured-Streaming gate row: the streaming mention detector
    (streaming/mentions_stream.py, availableNow trigger) run to completion
    over a web_pages drop synthesized from the documents table, checked
    against the SAME SQL oracle as the batch mentions_join_scan. Batch and
    stream share phrase_token_table/phrase_hit_count_expr, and this row
    proves end-to-end parity under the driver's value hash.

    The html column is the escaped document text wrapped in a minimal page:
    escape -> extract_text (tag strip + entity unescape) round-trips the
    text exactly, so the oracle can stay on documents.text."""
    import shutil
    import tempfile

    from ontology_mapping_spark.streaming.mentions_stream import (
        stream_mentions,
        stream_pages,
    )

    docs = _t(spark, sf, "documents")
    esc = F.coalesce(F.col("text"), F.lit(""))
    for raw, rep in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")):
        esc = F.replace(esc, F.lit(raw), F.lit(rep))
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), esc, F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        F.lit("en").alias("lang"),
    )
    phrases = _doc_prefix_phrases(docs)
    tmp = tempfile.mkdtemp(prefix="omsp_stream_parity_")
    try:
        pages.coalesce(4).write.mode("overwrite").parquet(f"{tmp}/in")
        m = stream_mentions(stream_pages(spark, f"{tmp}/in"), phrases)
        (
            m.select(
                "url", "uri", "surface", F.col("n_hits").cast("int").alias("n_hits")
            )
            .writeStream.format("parquet")
            .option("path", f"{tmp}/out")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        out = spark.read.schema(
            "url string, uri string, surface string, n_hits int"
        ).parquet(f"{tmp}/out")
        # materialize before the tmp dir is deleted: the caller holds a lazy
        # DataFrame that must outlive the sink files (localCheckpoint is the
        # right tool here — a one-session gate query, not cluster state)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# web link graph (north rule "graph materialize"; operators/linkgraph.py)
# --------------------------------------------------------------------------
# The documents table stands in for the pages corpus: each doc_id plants a
# deterministic page whose anchors exercise every href-resolution branch
# (root-relative, absolute cross-host, protocol-relative, directory-relative,
# plus dropped fragment/mailto/ftp anchors). The oracles derive the EXPECTED
# links by doc_id arithmetic — fully independent of the engine's regex
# pipeline, so extraction, cleaning and resolution are all value-checked.

# shared arithmetic CTE: the per-doc link-plant parameters
_LG_D = (
    "SELECT doc_id, CAST(doc_id AS VARCHAR) ds, CAST(doc_id % 37 AS VARCHAR) k37, "
    "CAST(doc_id % 11 AS VARCHAR) k11, CAST(doc_id % 7 AS VARCHAR) k7, "
    "CAST(doc_id % 53 AS VARCHAR) k53, CAST(doc_id % 3 AS VARCHAR) k3, "
    "CAST(doc_id + 1 AS VARCHAR) dn FROM documents"
)
_LG_U = (
    f"SELECT *, 'https://h' || k37 || '.example.com/d/' || ds || '/page.html' AS url "
    f"FROM ({_LG_D})"
)


def _linkgraph_pages(spark: SparkSession, sf: str) -> DataFrame:
    """The deterministic synthetic pages whose planted anchors the link
    oracles re-derive arithmetically. html is encoded to binary so the
    engine's input_hint decode path is the one under test."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    url = F.concat(
        F.lit("https://h"), s(d % 37), F.lit(".example.com/d/"), s(d), F.lit("/page.html")
    )
    html = F.concat(
        F.lit('<html><body><nav><A HREF="/cat/'), s(d % 11),
        F.lit('.html">Category <b>'), s(d % 11), F.lit("</b></A></nav>"),
        F.lit("<a href='https://h"), s(d % 7), F.lit(".example.org/t/"), s(d % 53),
        F.lit("'>Topic "), s(d % 53), F.lit("</a>"),
        F.lit('<a href="//cdn'), s(d % 3), F.lit('.example.net/lib.js">cdn</a>'),
        F.lit('<a href="../n/'), s(d + 1), F.lit('.html">next\npage</a>'),
        F.lit('<a href="#top">top</a><a href="mailto:x@y.z">mail</a>'),
        F.lit('<a href="ftp://h0.example.com/f">ftp</a></body></html>'),
    )
    return _t(spark, sf, "documents").select(
        url.alias("url"), F.encode(html, "UTF-8").alias("html")
    )


@query(
    "extract_links_resolved",
    f"""WITH u AS ({_LG_U})
    SELECT url, '/cat/' || k11 || '.html' AS href, 'Category ' || k11 AS anchor,
           'https://h' || k37 || '.example.com/cat/' || k11 || '.html' AS dst_url FROM u
    UNION ALL SELECT url, 'https://h' || k7 || '.example.org/t/' || k53,
           'Topic ' || k53, 'https://h' || k7 || '.example.org/t/' || k53 FROM u
    UNION ALL SELECT url, '//cdn' || k3 || '.example.net/lib.js', 'cdn',
           'https://cdn' || k3 || '.example.net/lib.js' FROM u
    UNION ALL SELECT url, '../n/' || dn || '.html', 'next page',
           'https://h' || k37 || '.example.com/d/' || ds || '/../n/' || dn || '.html' FROM u""",
)
def q_extract_links(spark, sf):
    # href + anchor extraction (case-insensitive, multiline, nested tags in
    # the display text) and URL resolution against the page url; fragment /
    # mailto / non-http-scheme anchors must vanish. Oracle plants the
    # expected rows arithmetically — no regex on the oracle side.
    from ontology_mapping_spark.operators.linkgraph import extract_links

    return extract_links(_linkgraph_pages(spark, sf))


@query(
    "recrawl_stale_urls",
    """WITH e AS (
      SELECT 'u' || p_partkey AS url,
             CASE WHEN p_partkey % 5 = 0 THEN NULL
                  ELSE CAST('2026-01-' ||
                       lpad(CAST((p_partkey % 27) + 1 AS VARCHAR), 2, '0')
                       AS TIMESTAMP) END AS lastmod,
             CASE WHEN p_partkey % 3 = 0
                  THEN CAST('2026-01-15' AS TIMESTAMP) END AS last_capture
      FROM part)
    SELECT url, lastmod, last_capture FROM e
    WHERE last_capture IS NULL
       OR (lastmod IS NOT NULL AND lastmod > last_capture)""",
)
def q_recrawl_stale(spark, sf):
    # recrawl scheduling: planted sitemap entries (day-of-month from the
    # key, every 5th missing lastmod) against a capture history (every
    # 3rd url captured twice, max 2026-01-15). Stale = never captured,
    # or lastmod strictly newer; captured-without-lastmod is NOT stale.
    # The oracle re-derives the verdict with plain predicates.
    from ontology_mapping_spark.sources.crawlmeta import stale_urls

    k = F.col("p_partkey")
    day = F.lpad(((k % 27) + 1).cast("string"), 2, "0")
    entries = _t(spark, sf, "part").select(
        F.concat(F.lit("u"), k.cast("string")).alias("url"),
        F.when(
            k % 5 != 0,
            F.to_timestamp(F.concat(F.lit("2026-01-"), day)),
        ).alias("lastmod"),
    )
    cap = _t(spark, sf, "part").filter(k % 3 == 0)
    captures = cap.select(
        F.concat(F.lit("u"), k.cast("string")).alias("url"),
        F.to_timestamp(F.lit("2026-01-15")).alias("warc_ts"),
    ).unionAll(
        cap.select(
            F.concat(F.lit("u"), k.cast("string")).alias("url"),
            F.to_timestamp(F.lit("2026-01-10")).alias("warc_ts"),
        )
    )
    return stale_urls(entries, captures).select("url", "lastmod", "last_capture")


@query(
    "robots_disallow_filter",
    """WITH u AS (
      SELECT 'http://h' || (p_partkey % 5) || '.example/p' || (p_partkey % 7) AS url,
             'h' || (p_partkey % 5) || '.example' AS host,
             '/p' || (p_partkey % 7) AS path
      FROM part)
    SELECT url FROM u
    WHERE host <> 'h2.example'
      AND NOT (host = 'h1.example' AND path LIKE '/p1%')""",
)
def q_robots_filter(spark, sf):
    # politeness filter over planted urls (5 hosts x 7 paths): h2 is
    # root-blocked, h1 blocks /p1, h3 has an equal-length allow/disallow
    # tie on /p2 (allow wins, >= semantics) — the oracle re-derives the
    # keep set from the arithmetic with plain predicates, never running
    # the rule fold.
    from ontology_mapping_spark.sources.crawlmeta import filter_disallowed

    k = F.col("p_partkey")
    urls = _t(spark, sf, "part").select(
        F.concat(
            F.lit("http://h"), (k % 5).cast("string"),
            F.lit(".example/p"), (k % 7).cast("string"),
        ).alias("url")
    )
    rules = spark.createDataFrame(
        [
            ("h1.example", "disallow", "/p1"),
            ("h2.example", "disallow", "/"),
            ("h3.example", "disallow", "/p2"),
            ("h3.example", "allow", "/p2"),
        ],
        "host string, rule string, prefix string",
    )
    return filter_disallowed(urls, rules).select("url")


@query(
    "robots_sitemap_records",
    """WITH hosts AS (SELECT DISTINCT p_partkey % 10 AS k FROM part)
    SELECT 'h' || k || '.example' AS host,
           'http://h' || k || '.example/sm1.xml' AS sitemap
    FROM hosts WHERE k % 5 <> 0
    UNION ALL
    SELECT 'h' || k || '.example',
           'http://h' || k || '.example/sm2.xml.gz'
    FROM hosts WHERE k % 2 = 0
    UNION ALL
    SELECT 'h' || k || '.example',
           'http://h' || k || '.example/deep/sm.xml'
    FROM hosts WHERE k % 3 = 0""",
)
def q_robots_sitemaps(spark, sf):
    # sitemap-discovery records planted arithmetically into synthesized
    # robots bodies (10 hosts; every non-multiple-of-5 gets a canonical
    # 'Sitemap:' line, evens a lowercase no-space comment-bearing one,
    # multiples of 3 an upper-case one) — the engine runs the real line
    # scan over the bodies; the oracle re-derives the rows from the same
    # key arithmetic and never sees a robots body at all.
    from ontology_mapping_spark.sources.crawlmeta import robots_sitemaps

    k = F.col("k")
    hosts = (
        _t(spark, sf, "part")
        .select((F.col("p_partkey") % 10).alias("k"))
        .distinct()
    )
    host = F.concat(F.lit("h"), k.cast("string"), F.lit(".example"))
    origin = F.concat(F.lit("http://"), host)
    body = F.concat(
        F.lit("User-agent: *\nDisallow: /private\n"),
        F.when(
            k % 5 != 0,
            F.concat(F.lit("Sitemap: "), origin, F.lit("/sm1.xml\n")),
        ).otherwise(F.lit("")),
        F.when(
            k % 2 == 0,
            F.concat(
                F.lit("sitemap:"), origin, F.lit("/sm2.xml.gz  # news\n")
            ),
        ).otherwise(F.lit("")),
        F.when(
            k % 3 == 0,
            F.concat(F.lit("SITEMAP: "), origin, F.lit("/deep/sm.xml\n")),
        ).otherwise(F.lit("")),
    )
    robots = hosts.select(host.alias("host"), body.alias("body"))
    return robots_sitemaps(robots)


@query(
    "crawl_frontier_budget",
    """WITH raw AS (
      SELECT 'h' || (p_partkey % 37) || '.example.com' AS host,
             'http://h' || (p_partkey % 37) || '.example.com/p' || (p_partkey % 11) AS url
      FROM part),
    cand AS (SELECT host, url, CAST(count(*) AS BIGINT) AS n_refs
             FROM raw GROUP BY host, url),
    kept AS (SELECT * FROM cand
             WHERE url NOT LIKE '%/p0' AND host <> 'h3.example.com'),
    ranked AS (SELECT host, url, n_refs,
               row_number() OVER (PARTITION BY host
                                  ORDER BY n_refs DESC, url) AS rk
               FROM kept)
    SELECT host, url, n_refs, CAST(rk AS INT) AS rank
    FROM ranked WHERE rk <= 3""",
)
def q_crawl_frontier(spark, sf):
    # crawler-feedback stage: planted destination urls (37 hosts x 11
    # paths, multiplicity from the key spread) minus a seen set (every
    # '/p0' url) minus one blocked host, then a per-host budget of 3 by
    # (n_refs desc, url). The oracle re-derives everything from the same
    # key arithmetic with its own window.
    from ontology_mapping_spark.operators.linkgraph import crawl_frontier

    k = F.col("p_partkey")
    links = _t(spark, sf, "part").select(
        F.concat(
            F.lit("http://h"), (k % 37).cast("string"),
            F.lit(".example.com/p"), (k % 11).cast("string"),
        ).alias("dst_url")
    )
    seen = links.filter(F.col("dst_url").endswith("/p0")).select(
        F.col("dst_url").alias("url")
    ).distinct()
    blocked = spark.createDataFrame([("h3.example.com",)], "domain string")
    out = crawl_frontier(links, seen=seen, blocked=blocked, per_host=3)
    return out.select("host", "url", F.col("n_refs").cast("long").alias("n_refs"), "rank")


@query(
    "link_graph_hosts",
    f"""WITH d AS ({_LG_D}), e AS (
      SELECT 'h' || k37 || '.example.com' AS s, 'h' || k7 || '.example.org' AS t FROM d
      UNION ALL
      SELECT 'h' || k37 || '.example.com', 'cdn' || k3 || '.example.net' FROM d)
    SELECT s AS src_host, t AS dst_host, CAST(count(*) AS BIGINT) AS n_links
    FROM e GROUP BY s, t""",
)
def q_link_graph_hosts(spark, sf):
    # host-level edge aggregation; the root-relative and directory-relative
    # links resolve to the page's own host and must drop as self-loops
    from ontology_mapping_spark.operators.linkgraph import extract_links, link_graph

    out = link_graph(extract_links(_linkgraph_pages(spark, sf)))
    return out.select("src_host", "dst_host", F.col("n_links").cast("long").alias("n_links"))


@query(
    "host_degree_stats",
    f"""WITH d AS ({_LG_D}), e AS (SELECT DISTINCT s, t FROM (
      SELECT 'h' || k37 || '.example.com' AS s, 'h' || k7 || '.example.org' AS t FROM d
      UNION ALL
      SELECT 'h' || k37 || '.example.com', 'cdn' || k3 || '.example.net' FROM d)),
    o AS (SELECT s AS node, count(*) AS od FROM e GROUP BY s),
    i AS (SELECT t AS node, count(*) AS idg FROM e GROUP BY t)
    SELECT coalesce(o.node, i.node) AS node,
           CAST(coalesce(o.od, 0) AS BIGINT) AS out_deg,
           CAST(coalesce(i.idg, 0) AS BIGINT) AS in_deg
    FROM o FULL OUTER JOIN i ON o.node = i.node""",
)
def q_host_degrees(spark, sf):
    from ontology_mapping_spark.operators.linkgraph import (
        degrees,
        extract_links,
        link_graph,
    )

    out = degrees(link_graph(extract_links(_linkgraph_pages(spark, sf))))
    return out.select(
        "node",
        F.col("out_deg").cast("long").alias("out_deg"),
        F.col("in_deg").cast("long").alias("in_deg"),
    )


@query(
    "anchor_alias_mining",
    f"""WITH u AS ({_LG_U}), a AS (
      SELECT 'category ' || k11 AS alias,
             'https://h' || k37 || '.example.com/cat/' || k11 || '.html' AS dst_url FROM u
      UNION ALL SELECT 'topic ' || k53, 'https://h' || k7 || '.example.org/t/' || k53 FROM u
      UNION ALL SELECT 'cdn', 'https://cdn' || k3 || '.example.net/lib.js' FROM u
      UNION ALL SELECT 'next page',
             'https://h' || k37 || '.example.com/d/' || ds || '/../n/' || dn || '.html' FROM u)
    SELECT alias, dst_url, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY alias, dst_url""",
)
def q_anchor_aliases(spark, sf):
    # anchor-text alias mining: the web-scale surface-form table entity
    # linking consumes (lowercased cleaned anchor -> target url, support n)
    from ontology_mapping_spark.operators.linkgraph import anchor_aliases, extract_links

    out = anchor_aliases(extract_links(_linkgraph_pages(spark, sf)))
    return out.select("alias", "dst_url", F.col("n").cast("long").alias("n"))


@query(
    "blocked_host_filter",
    """SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN 'https://h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com/p'
              ELSE 'https://sub.h' || CAST(doc_id % 37 AS VARCHAR) || '.example.com/p'
         END AS url
       FROM documents WHERE doc_id % 37 NOT IN (3, 7)""",
)
def q_blocked_hosts(spark, sf):
    # broadcast domain-blocklist anti-join: exact host match on even docs,
    # subdomain suffix match on odd docs ('sub.h3.example.com' ends with
    # '.h3.example.com'); the corpus side never shuffles
    from ontology_mapping_spark.operators.linkgraph import filter_blocked_hosts

    d = F.col("doc_id")
    url = F.when(
        d % 2 == 0,
        F.concat(F.lit("https://h"), (d % 37).cast("string"), F.lit(".example.com/p")),
    ).otherwise(
        F.concat(F.lit("https://sub.h"), (d % 37).cast("string"), F.lit(".example.com/p"))
    )
    pages = _t(spark, sf, "documents").select("doc_id", url.alias("url"))
    blocked = spark.createDataFrame(
        [("h3.example.com",), ("h7.example.com",)], "domain string"
    )
    return filter_blocked_hosts(pages, blocked)


_PR_EDGES_SQL = (
    "SELECT DISTINCT src, dst FROM ("
    "SELECT CAST(p_partkey AS VARCHAR) AS src, CAST(p_partkey // 2 AS VARCHAR) AS dst "
    "FROM part WHERE p_partkey >= 2 "
    "UNION ALL SELECT CAST(p_partkey AS VARCHAR), CAST((p_partkey * 7 + 3) % 211 AS VARCHAR) "
    "FROM part) t WHERE src <> dst"
)


def _pagerank_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank the oracle runs: same semantics as
    operators/linkgraph.pagerank (uniform init, dangling mass redistributed
    uniformly), one (dangling, contrib, rank) CTE triple per iteration."""
    d = repr(damping)
    parts = [
        f"WITH e AS ({_PR_EDGES_SQL})",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "od AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS odeg FROM e GROUP BY src)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for k in range(iters):
        parts.append(
            f"d{k} AS (SELECT coalesce(sum(r.rank), 0) AS dm FROM r{k} r "
            f"LEFT JOIN od ON od.node = r.node WHERE od.node IS NULL)"
        )
        parts.append(
            f"c{k} AS (SELECT e.dst AS node, sum(r.rank / od.odeg) AS c FROM e "
            f"JOIN r{k} r ON r.node = e.src JOIN od ON od.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"r{k + 1} AS (SELECT n.node, (1.0 - {d}) / (SELECT n FROM nn) + {d} * "
            f"(coalesce(c.c, 0) + (SELECT dm FROM d{k}) / (SELECT n FROM nn)) AS rank "
            f"FROM nodes n LEFT JOIN c{k} c ON n.node = c.node)"
        )
    # epsilon shift before rounding: PageRank's decimal algebra (0.85/0.15,
    # tree /2) lands shared leaf values EXACTLY on 8-dp half-boundaries
    # (measured: 1.3875e-05 at sf0.1), where the two engines' 1e-17
    # summation noise rounds opposite ways; +1e-12 moves every exact-decimal
    # value safely off the boundary while noise can't straddle the shift
    return ", ".join(parts) + (
        f" SELECT node, round(rank + 1e-12, 8) AS rank FROM r{iters}"
    )


@query("pagerank_graph", _pagerank_sql())
def q_pagerank(spark, sf):
    # 5-iteration PageRank over the deterministic part-derived web graph
    # (tree rule + modular rule: hubs, dangling leaves, cycles). The oracle
    # unrolls the same iteration algebra in SQL; 8-dp rounding absorbs
    # cross-engine float summation order.
    from ontology_mapping_spark.operators.linkgraph import pagerank

    k = F.col("p_partkey")
    p = _t(spark, sf, "part")
    a = p.filter(k >= 2).select(
        k.cast("string").alias("src_host"),
        F.floor(k / 2).cast("string").alias("dst_host"),
    )
    b = p.select(
        k.cast("string").alias("src_host"),
        ((k * 7 + 3) % 211).cast("string").alias("dst_host"),
    )
    edges = a.union(b).filter(F.col("src_host") != F.col("dst_host"))
    pr = pagerank(edges, iters=5, damping=0.85)
    # same +1e-12 epsilon shift as the oracle (see _pagerank_sql)
    return pr.select("node", F.round(F.col("rank") + F.lit(1e-12), 8).alias("rank"))


def _hits_sql(iters: int = 5) -> str:
    """Unrolled fixed-iteration HITS the oracle runs: same semantics as
    operators/linkgraph.hits (hubs init 1.0; authority = in-sum of hubs,
    L2-normalize; hub = out-sum of authorities, L2-normalize), one
    (raw-auth, normalized-auth, raw-hub, normalized-hub) CTE quadruple
    per iteration. Every CTE is MATERIALIZED: each normalize step
    references its input 3x (CASE guard, divide, scalar-subquery norm),
    so DuckDB's default inline-per-reference CTEs would re-evaluate the
    chain ~3^(2*iters) times (observed as an fd explosion re-opening the
    parquet scan); materialization keeps the oracle linear like the
    engine."""
    parts = [
        f"WITH e AS MATERIALIZED ({_PR_EDGES_SQL})",
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "h0 AS MATERIALIZED (SELECT node, 1.0 AS hub FROM nodes)",
    ]
    for k in range(iters):
        parts.append(
            f"ra{k} AS MATERIALIZED (SELECT e.dst AS node, sum(h.hub) AS a FROM e "
            f"JOIN h{k} h ON h.node = e.src GROUP BY e.dst)"
        )
        parts.append(
            f"na{k} AS MATERIALIZED (SELECT node, CASE WHEN "
            f"(SELECT sqrt(sum(a * a)) FROM ra{k}) > 0 THEN "
            f"a / (SELECT sqrt(sum(a * a)) FROM ra{k}) ELSE 0 END AS a "
            f"FROM ra{k})"
        )
        parts.append(
            f"rh{k + 1} AS MATERIALIZED (SELECT e.src AS node, sum(na.a) AS hub FROM e "
            f"JOIN na{k} na ON na.node = e.dst GROUP BY e.src)"
        )
        parts.append(
            f"h{k + 1} AS MATERIALIZED (SELECT node, CASE WHEN "
            f"(SELECT sqrt(sum(hub * hub)) FROM rh{k + 1}) > 0 THEN "
            f"hub / (SELECT sqrt(sum(hub * hub)) FROM rh{k + 1}) ELSE 0 END AS hub "
            f"FROM rh{k + 1})"
        )
    # same +1e-12 epsilon shift as _pagerank_sql (see its comment): moves
    # any exact-decimal value off the 8-dp half-boundary before rounding
    return ", ".join(parts) + (
        f" SELECT n.node, round(coalesce(h.hub, 0) + 1e-12, 8) AS hub, "
        f"round(coalesce(na.a, 0) + 1e-12, 8) AS authority "
        f"FROM nodes n LEFT JOIN h{iters} h ON h.node = n.node "
        f"LEFT JOIN na{iters - 1} na ON na.node = n.node"
    )


@query("hits_graph", _hits_sql())
def q_hits(spark, sf):
    # 5-iteration Kleinberg HITS over the SAME deterministic part-derived
    # web graph as pagerank_graph (tree rule + modular rule: hubs,
    # dangling leaves, cycles — leaves exercise authority-0/hub-0 lanes).
    # The oracle unrolls the same iteration algebra in SQL; 8-dp rounding
    # + the pagerank epsilon shift absorb cross-engine summation order.
    from ontology_mapping_spark.operators.linkgraph import hits

    k = F.col("p_partkey")
    p = _t(spark, sf, "part")
    a = p.filter(k >= 2).select(
        k.cast("string").alias("src_host"),
        F.floor(k / 2).cast("string").alias("dst_host"),
    )
    b = p.select(
        k.cast("string").alias("src_host"),
        ((k * 7 + 3) % 211).cast("string").alias("dst_host"),
    )
    edges = a.union(b).filter(F.col("src_host") != F.col("dst_host"))
    ha = hits(edges, iters=5)
    return ha.select(
        "node",
        F.round(F.col("hub") + F.lit(1e-12), 8).alias("hub"),
        F.round(F.col("authority") + F.lit(1e-12), 8).alias("authority"),
    )


@query(
    "triangle_clustering",
    """WITH raw AS (
      SELECT CAST(p_partkey AS VARCHAR) AS s,
             CAST(p_partkey // 2 AS VARCHAR) AS t
      FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT CAST(p_partkey AS VARCHAR),
             CAST((p_partkey * 7 + 3) % 211 AS VARCHAR) FROM part
    ), und AS (
      SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
      FROM raw WHERE s <> t
    ), deg AS (
      SELECT n AS node, CAST(count(*) AS BIGINT) AS degree FROM (
        SELECT a AS n FROM und UNION ALL SELECT b FROM und) GROUP BY n
    ), tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM und e1
      JOIN und e2 ON e2.a = e1.b
      JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
    ), tc AS (
      SELECT n AS node, CAST(count(*) AS BIGINT) AS triangles FROM (
        SELECT x AS n FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY n
    )
    SELECT deg.node, deg.degree,
           COALESCE(tc.triangles, 0) AS triangles,
           CASE WHEN deg.degree >= 2
                THEN round(2.0 * COALESCE(tc.triangles, 0)
                           / (deg.degree * (deg.degree - 1)), 8)
                ELSE 0.0 END AS clustering
    FROM deg LEFT JOIN tc USING (node)""",
)
def q_triangle_clustering(spark, sf):
    # degree-oriented triangle counting + local clustering coefficient
    # (linkgraph.triangles) over the same deterministic part-derived web
    # graph as the pagerank_graph row (tree rule + modular rule gives
    # genuine triangles where a tree edge closes a modular wedge). The
    # oracle enumerates each triangle once by lexicographic 3-way join —
    # a DIFFERENT orientation than the engine's (degree, node) order, so
    # the equality also pins orientation-independence of the counts.
    from ontology_mapping_spark.operators.linkgraph import triangles

    k = F.col("p_partkey")
    p = _t(spark, sf, "part")
    a = p.filter(k >= 2).select(
        k.cast("string").alias("src_host"),
        F.floor(k / 2).cast("string").alias("dst_host"),
    )
    b = p.select(
        k.cast("string").alias("src_host"),
        ((k * 7 + 3) % 211).cast("string").alias("dst_host"),
    )
    t = triangles(a.union(b))
    return t.select(
        "node",
        "degree",
        "triangles",
        F.round("clustering", 8).alias("clustering"),
    )


# --------------------------------------------------------------------------
# relation extraction (north rule "triple extraction"; operators/relations.py)
# --------------------------------------------------------------------------
# Planted-corpus convention: each document contributes three sentences with
# known entity mentions — an 'is a' Hearst pattern, a 'part of' pattern and
# a plain co-occurrence — so the oracles derive the expected triples by
# doc_id arithmetic, independent of the engine's sentence splitter, folding
# and between-text algebra.

_REL_VOCAB = 13


def _relations_inputs(spark: SparkSession, sf: str) -> tuple[DataFrame, DataFrame]:
    d = F.col("doc_id")
    ent = lambda k: F.concat(F.lit("entity "), k.cast("string"))  # noqa: E731
    text = F.concat(
        F.lit("Alpha "), ent(d % _REL_VOCAB),
        F.lit(" is a "), ent((d + 5) % _REL_VOCAB), F.lit(" in the corpus. "),
        ent((d + 1) % _REL_VOCAB),
        F.lit(" part of "), ent((d + 7) % _REL_VOCAB), F.lit(" sometimes. "),
        ent((d + 2) % _REL_VOCAB),
        F.lit(" and "), ent((d + 3) % _REL_VOCAB), F.lit(" appear together."),
    )
    pages = _t(spark, sf, "documents").select(
        F.concat(F.lit("d"), d.cast("string")).alias("url"), text.alias("text")
    )
    k = F.col("id")
    phrases = spark.range(_REL_VOCAB).select(
        F.concat(F.lit("uri:"), k.cast("string")).alias("uri"),
        F.concat(F.lit("entity "), k.cast("string")).alias("phrase"),
    )
    return pages, phrases


_REL_D = (
    f"SELECT CAST(doc_id % {_REL_VOCAB} AS VARCHAR) a, "
    f"CAST((doc_id + 5) % {_REL_VOCAB} AS VARCHAR) b, "
    f"CAST((doc_id + 1) % {_REL_VOCAB} AS VARCHAR) c, "
    f"CAST((doc_id + 7) % {_REL_VOCAB} AS VARCHAR) dd, "
    f"CAST((doc_id + 2) % {_REL_VOCAB} AS VARCHAR) e, "
    f"CAST((doc_id + 3) % {_REL_VOCAB} AS VARCHAR) f FROM documents"
)


@query(
    "pattern_relation_triples",
    f"""WITH d AS ({_REL_D}), t AS (
      SELECT 'uri:' || a AS subj, 'kg:isA' AS pred, 'uri:' || b AS obj FROM d
      UNION ALL SELECT 'uri:' || c, 'kg:partOf', 'uri:' || dd FROM d)
    SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY subj, pred, obj""",
)
def q_pattern_relations(spark, sf):
    # Hearst-pattern typed triples from the text between two mentions;
    # the 'and' sentence must contribute nothing here
    from ontology_mapping_spark.operators.relations import (
        pattern_relations,
        sentence_mention_groups,
    )

    pages, phrases = _relations_inputs(spark, sf)
    out = pattern_relations(sentence_mention_groups(pages, phrases))
    return out.select("subj", "pred", "obj", F.col("n").cast("long").alias("n"))


@query(
    "relation_triples_joinpath",
    f"""WITH d AS ({_REL_D}), t AS (
      SELECT 'uri:' || a AS subj, 'kg:isA' AS pred, 'uri:' || b AS obj FROM d
      UNION ALL SELECT 'uri:' || c, 'kg:partOf', 'uri:' || dd FROM d)
    SELECT subj, pred, obj, CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY subj, pred, obj""",
)
def q_relation_triples_joinpath(spark, sf):
    # the declarative Catalyst variant of pattern_relation_triples
    # (sentence explode + broadcast first-token join): keeps the join path
    # value-verified by the local gate while the driver primary exercises
    # the fused C sentence scan; native==join parity is also pytest-pinned
    from ontology_mapping_spark.operators.relations import (
        pattern_relations,
        sentence_mention_groups,
    )

    pages, phrases = _relations_inputs(spark, sf)
    out = pattern_relations(sentence_mention_groups(pages, phrases, impl="join"))
    return out.select("subj", "pred", "obj", F.col("n").cast("long").alias("n"))


@query(
    "sentence_cooccurrence",
    f"""WITH d AS ({_REL_D}), p AS (
      SELECT least('uri:' || a, 'uri:' || b) AS s, greatest('uri:' || a, 'uri:' || b) AS o FROM d
      UNION ALL SELECT least('uri:' || c, 'uri:' || dd), greatest('uri:' || c, 'uri:' || dd) FROM d
      UNION ALL SELECT least('uri:' || e, 'uri:' || f), greatest('uri:' || e, 'uri:' || f) FROM d)
    SELECT s AS subj, o AS obj, CAST(count(*) AS BIGINT) AS n_sents
    FROM p GROUP BY s, o""",
)
def q_sentence_cooccurrence(spark, sf):
    # the generic relatedTo edge list: unordered concept pairs per sentence,
    # counted over the corpus (distant-supervision co-occurrence signal)
    from ontology_mapping_spark.operators.relations import (
        cooccurrence_edges,
        sentence_mention_groups,
    )

    pages, phrases = _relations_inputs(spark, sf)
    out = cooccurrence_edges(sentence_mention_groups(pages, phrases))
    return out.select("subj", "obj", F.col("n_sents").cast("long").alias("n_sents"))


_REL_D_ID = "SELECT doc_id, " + _REL_D[len("SELECT ") :]  # keep doc_id for sentence keys


@query(
    "cooccurrence_npmi",
    f"""WITH d AS ({_REL_D_ID}), s AS (
      SELECT doc_id, 0 AS sent, 'uri:' || a AS u FROM d
      UNION ALL SELECT doc_id, 0, 'uri:' || b FROM d
      UNION ALL SELECT doc_id, 1, 'uri:' || c FROM d
      UNION ALL SELECT doc_id, 1, 'uri:' || dd FROM d
      UNION ALL SELECT doc_id, 2, 'uri:' || e FROM d
      UNION ALL SELECT doc_id, 2, 'uri:' || f FROM d),
    ent AS (SELECT u, CAST(count(*) AS DOUBLE) AS n FROM s GROUP BY u),
    tot AS (SELECT CAST(count(*) AS DOUBLE) AS nt
            FROM (SELECT DISTINCT doc_id, sent FROM s)),
    p AS (
      SELECT least('uri:'||a,'uri:'||b) AS s1, greatest('uri:'||a,'uri:'||b) AS o1 FROM d
      UNION ALL SELECT least('uri:'||c,'uri:'||dd), greatest('uri:'||c,'uri:'||dd) FROM d
      UNION ALL SELECT least('uri:'||e,'uri:'||f), greatest('uri:'||e,'uri:'||f) FROM d),
    cooc AS (SELECT s1 AS subj, o1 AS obj, CAST(count(*) AS DOUBLE) AS n
             FROM p GROUP BY s1, o1)
    SELECT subj, obj, CAST(cooc.n AS BIGINT) AS n_sents,
      ROUND(CASE WHEN cooc.n = nt THEN 1.0
            ELSE LN((cooc.n/nt) / ((es.n/nt) * (eo.n/nt))) / -LN(cooc.n/nt) END, 6) AS npmi
    FROM cooc JOIN ent es ON es.u = subj JOIN ent eo ON eo.u = obj, tot""",
)
def q_cooccurrence_npmi(spark, sf):
    # NPMI-weighted co-occurrence edges (distant-supervision noise filter);
    # the oracle re-derives per-entity and total sentence counts from the
    # planted doc_id arithmetic, independent of the engine's mention algebra
    from ontology_mapping_spark.operators.relations import (
        relation_confidence,
        sentence_mention_groups,
    )

    pages, phrases = _relations_inputs(spark, sf)
    out = relation_confidence(sentence_mention_groups(pages, phrases))
    return out.select(
        "subj",
        "obj",
        F.col("n_sents").cast("long").alias("n_sents"),
        F.round("npmi", 6).alias("npmi"),
    )


# --------------------------------------------------------------------------
# N-Triples serialization sink (sources/rdf.py)
# --------------------------------------------------------------------------

def _nt_sanitize_sql(x: str) -> str:
    # GENERATED from the sink's own table (sources/rdf.IRI_SANITIZE) —
    # no hand-copied mirror that can drift
    from ontology_mapping_spark.sources.rdf import IRI_SANITIZE

    def sql_str(ch: str) -> str:
        if len(ch) == 1 and ord(ch) < 32:
            return f"chr({ord(ch)})"
        return "'" + ch.replace("'", "''") + "'"

    out = x
    for ch, enc in IRI_SANITIZE:
        out = f"replace({out}, {sql_str(ch)}, {sql_str(enc)})"
    return out


def _nt_term_sql(col: str) -> str:
    # mirror of sources/rdf.term_expr: absolute IRI > known prefix > literal
    esc = (
        "replace(replace(replace(replace(replace(" + col + ","
        " '\\', '\\\\'), '\"', '\\\"'), chr(10), '\\n'),"
        " chr(13), '\\r'), chr(9), '\\t')"
    )
    out = "'\"' || " + esc + " || '\"'"
    prefixes = {
        "kg": "http://example.org/kg#",
        "src": "http://example.org/src/",
        "tgt": "http://example.org/tgt/",
        "uri": "http://example.org/id/",
    }
    for p, ns in sorted(prefixes.items(), reverse=True):
        expanded = _nt_sanitize_sql(
            f"'{ns}' || substr({col}, {len(p) + 2})"
        )
        out = (
            f"CASE WHEN {col} LIKE '{p}:%' THEN '<' || {expanded} || '>' "
            f"ELSE {out} END"
        )
    return (
        f"CASE WHEN regexp_matches({col}, '^[A-Za-z][A-Za-z0-9+.\\-]*://')"
        f" THEN '<' || {_nt_sanitize_sql(col)} || '>' ELSE {out} END"
    )


@query(
    "kg_ntriples_lines",
    f"""WITH t AS (
      SELECT 'src:C' || CAST(doc_id % 7 AS VARCHAR) AS s,
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'kg:isA' WHEN 1 THEN 'kg:partOf'
             ELSE 'http://purl.org/dc/terms/relation' END AS p,
        CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN 'tgt:C' || CAST(doc_id % 5 AS VARCHAR)
             WHEN 1 THEN 'https://example.org/p?q=a b'
             WHEN 2 THEN 'say "hi"' || chr(10) || 'tab' || chr(9) || 'back\\slash'
             ELSE 'plain words ' || CAST(doc_id % 5 AS VARCHAR) END AS o
      FROM documents)
    SELECT {_nt_term_sql('s')} || ' ' || {_nt_term_sql('p')} || ' ' ||
           {_nt_term_sql('o')} || ' .' AS line,
           CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY 1""",
)
def q_kg_ntriples(spark, sf):
    # serialization exercises all three term branches (absolute IRI,
    # prefix expansion with sanitizing, escaped literal) against a DuckDB
    # oracle that re-implements the documented contract character by
    # character
    from ontology_mapping_spark.sources.rdf import ntriples_lines

    d = F.col("doc_id")
    t = _t(spark, sf, "documents").select(
        F.concat(F.lit("src:C"), (d % 7).cast("string")).alias("subject"),
        F.when(d % 3 == 0, F.lit("kg:isA"))
        .when(d % 3 == 1, F.lit("kg:partOf"))
        .otherwise(F.lit("http://purl.org/dc/terms/relation"))
        .alias("predicate"),
        F.when(d % 4 == 0, F.concat(F.lit("tgt:C"), (d % 5).cast("string")))
        .when(d % 4 == 1, F.lit("https://example.org/p?q=a b"))
        .when(d % 4 == 2, F.lit('say "hi"\ntab\tback\\slash'))
        .otherwise(F.concat(F.lit("plain words "), (d % 5).cast("string")))
        .alias("object"),
    )
    return ntriples_lines(t).groupBy("line").agg(F.count("*").cast("long").alias("n"))


@query(
    "kg_nquads_lines",
    f"""WITH t AS (
      SELECT 'src:C' || CAST(doc_id % 7 AS VARCHAR) AS s,
        'kg:isA' AS p,
        CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN 'tgt:C' || CAST(doc_id % 5 AS VARCHAR)
             WHEN 1 THEN 'https://example.org/p?q=a b'
             ELSE 'say "hi"' || chr(10) || 'quad' END AS o,
        CASE CAST(doc_id % 4 AS INT)
             WHEN 0 THEN NULL
             WHEN 1 THEN 'kg:asserted'
             WHEN 2 THEN 'https://example.org/g/' || CAST(doc_id % 2 AS VARCHAR)
             ELSE 'g1' END AS g
      FROM documents)
    SELECT {_nt_term_sql('s')} || ' ' || {_nt_term_sql('p')} || ' ' ||
           {_nt_term_sql('o')} ||
           CASE WHEN g IS NULL THEN ' .'
                ELSE ' ' || {_nt_term_sql('g')} || ' .' END AS line,
           CAST(count(*) AS BIGINT) AS n
    FROM t GROUP BY 1""",
)
def q_kg_nquads(spark, sf):
    # the named-graph sink (sources/rdf.nquads_lines): NULL graphs emit
    # spec-valid 3-term (default-graph) lines, named graphs append the
    # optional fourth term; exercises every term branch (prefix
    # expansion, absolute IRI with sanitize, escaped literal, bare-name
    # graph label) against the same character-exact DuckDB mirror as
    # kg_ntriples_lines
    from ontology_mapping_spark.sources.rdf import nquads_lines

    d = F.col("doc_id")
    t = _t(spark, sf, "documents").select(
        F.when(d % 4 == 0, F.lit(None).cast("string"))
        .when(d % 4 == 1, F.lit("kg:asserted"))
        .when(
            d % 4 == 2,
            F.concat(F.lit("https://example.org/g/"), (d % 2).cast("string")),
        )
        .otherwise(F.lit("g1"))
        .alias("graph"),
        F.concat(F.lit("src:C"), (d % 7).cast("string")).alias("subject"),
        F.lit("kg:isA").alias("predicate"),
        F.when(d % 3 == 0, F.concat(F.lit("tgt:C"), (d % 5).cast("string")))
        .when(d % 3 == 1, F.lit("https://example.org/p?q=a b"))
        .otherwise(F.lit('say "hi"\nquad'))
        .alias("object"),
    )
    return nquads_lines(t).groupBy("line").agg(
        F.count("*").cast("long").alias("n")
    )


# --------------------------------------------------------------------------
# mention disambiguation (operators/disambig.py)
# --------------------------------------------------------------------------

@query(
    "mention_disambiguation",
    """WITH pages AS (
      SELECT 'd' || CAST(doc_id AS VARCHAR) AS url,
             'ctx ' || CAST(doc_id % 9 AS VARCHAR) AS text
      FROM documents),
    m AS (
      SELECT 'd' || CAST(doc_id AS VARCHAR) AS url,
             'cand:' || CAST(doc_id % 5 AS VARCHAR) AS uri, 's' AS surface
      FROM documents
      UNION ALL
      SELECT 'd' || CAST(doc_id AS VARCHAR),
             'cand:' || CAST((doc_id + 2) % 5 AS VARCHAR), 's'
      FROM documents),
    vecs AS (
      SELECT 'cand:' || CAST(r AS VARCHAR) AS uri,
             CAST(r AS DOUBLE) AS v1, CAST(r * r % 7 AS DOUBLE) AS v2,
             1.0 AS v3
      FROM range(5) t(r)),
    pv AS (
      SELECT url, CAST(length(text) % 9 AS DOUBLE) AS p1,
             CAST(length(text) % 7 AS DOUBLE) AS p2, 1.0 AS p3
      FROM pages),
    scored AS (
      SELECT m.url, m.surface, m.uri,
        (p1*v1 + p2*v2 + p3*v3) /
        (sqrt(p1*p1 + p2*p2 + p3*p3) * sqrt(v1*v1 + v2*v2 + v3*v3)) AS score
      FROM m JOIN pv ON pv.url = m.url JOIN vecs ON vecs.uri = m.uri)
    SELECT url, surface, uri, ROUND(score, 6) AS score
    FROM scored
    QUALIFY row_number() OVER (
      PARTITION BY url, surface ORDER BY score DESC, uri DESC) = 1""",
)
def q_mention_disambiguation(spark, sf):
    # context-cosine argmax per ambiguous (url, surface); the embedder is
    # injected as a SQL-derivable Catalyst function so DuckDB re-derives
    # page vectors, concept vectors, the cosine and the deterministic
    # (score, uri) tie-break independently
    from ontology_mapping_spark.operators.disambig import disambiguate_mentions

    d = F.col("doc_id")
    url = F.concat(F.lit("d"), d.cast("string"))
    pages = _t(spark, sf, "documents").select(
        url.alias("url"),
        F.concat(F.lit("ctx "), (d % 9).cast("string")).alias("text"),
    )
    cand = lambda k: F.concat(F.lit("cand:"), k.cast("string"))  # noqa: E731
    m1 = _t(spark, sf, "documents").select(
        url.alias("url"), cand(d % 5).alias("uri"), F.lit("s").alias("surface")
    )
    m2 = _t(spark, sf, "documents").select(
        url.alias("url"), cand((d + 2) % 5).alias("uri"), F.lit("s").alias("surface")
    )
    r = F.col("id")
    vecs = spark.range(5).select(
        cand(r).alias("uri"),
        F.array(
            r.cast("double"), (r * r % 7).cast("double"), F.lit(1.0)
        ).alias("vec"),
    )

    def embed(c):
        return F.array(
            (F.length(c) % 9).cast("double"),
            (F.length(c) % 7).cast("double"),
            F.lit(1.0),
        )

    out = disambiguate_mentions(m1.unionByName(m2), pages, vecs, embed_udf=embed)
    return out.select("url", "surface", "uri", F.round("score", 6).alias("score"))


# --------------------------------------------------------------------------
# KG querying (operators/kgquery.py): SPARQL-style BGP over the triple table
# --------------------------------------------------------------------------

def _part_tree_broader(spark, sf):
    """The synthetic part-tree 'broader' edges (p:k -> p:k//2) the
    kg_bgp_* gate queries share."""
    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    return part.filter(pk >= 2).select(
        F.concat(F.lit("p:"), pk.cast("string")).alias("subject"),
        F.lit("broader").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
        ).alias("object"),
    )


def _part_tree_labels(spark, sf):
    """The part-tree 'label' triples (p:k -> p_name) paired with
    :func:`_part_tree_broader`."""
    part = _t(spark, sf, "part")
    return part.select(
        F.concat(F.lit("p:"), F.col("p_partkey").cast("string")).alias(
            "subject"
        ),
        F.lit("label").alias("predicate"),
        F.col("p_name").alias("object"),
    )


@query(
    "kg_bgp_match",
    """WITH tr AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS subject,
             'broader' AS predicate,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS object
      FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'label', p_name FROM part)
    SELECT a.subject AS x, l.object AS xl, a.object AS y, b.object AS z
    FROM tr a
    JOIN tr b ON b.predicate = 'broader' AND b.subject = a.object
    JOIN tr l ON l.predicate = 'label' AND l.subject = a.subject
    WHERE a.predicate = 'broader'""",
)
def q_kg_bgp(spark, sf):
    # conjunctive query over the constructed KG: grandparent-with-label
    # BGP {?x broader ?y. ?y broader ?z. ?x label ?xl} compiled to
    # variable-joins by operators/kgquery.bgp_match; the oracle is the
    # literal SQL self-join the compiler must agree with
    from ontology_mapping_spark.operators.kgquery import bgp_match

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return bgp_match(
        tr,
        [("?x", "broader", "?y"), ("?y", "broader", "?z"), ("?x", "label", "?xl")],
    )


@query(
    "kg_bgp_paths",
    """WITH RECURSIVE edges AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS child,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS parent
      FROM part WHERE p_partkey >= 2
    ), clo AS (
      SELECT child AS x, parent AS a FROM edges
      UNION
      SELECT c.x, e.parent AS a FROM clo c JOIN edges e ON e.child = c.a
    )
    SELECT clo.x AS x, clo.a AS a, p.p_name AS al
    FROM clo JOIN part p ON 'p:' || CAST(p.p_partkey AS VARCHAR) = clo.a""",
)
def q_kg_bgp_paths(spark, sf):
    # SPARQL 1.1 property path {?x broader+ ?a . ?a label ?al} over the
    # same synthetic part-tree KG as kg_bgp_match: the 'broader+' predicate
    # resolves through the distributed path-doubling closure
    # (kgquery.with_path_closures), then joins the label pattern; the
    # oracle re-derives reachability with a recursive CTE.
    from ontology_mapping_spark.operators.kgquery import bgp_match_paths

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return bgp_match_paths(
        tr,
        [("?x", "broader+", "?a"), ("?a", "label", "?al")],
    )


@query(
    "kg_bgp_optional",
    """WITH br AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS x,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS y
      FROM part WHERE p_partkey >= 2
    ), lab AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS s, p_name AS xl
      FROM part WHERE p_partkey % 3 <> 0
    )
    SELECT br.x AS x, lab.xl AS xl, br.y AS y
    FROM br LEFT JOIN lab ON lab.s = br.x
    WHERE br.y LIKE 'p:1%'""",
)
def q_kg_bgp_optional(spark, sf):
    # SPARQL OPTIONAL + FILTER over the part-tree KG: every third node has
    # no label triple, so the optional group null-pads exactly where the
    # oracle's LEFT JOIN does; the FILTER compiles to a Catalyst predicate
    # over the bound variable columns.
    from ontology_mapping_spark.operators.kgquery import bgp_match

    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    node = F.concat(F.lit("p:"), pk.cast("string"))
    broader = part.filter(pk >= 2).select(
        node.alias("subject"),
        F.lit("broader").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
        ).alias("object"),
    )
    labels = part.filter(pk % 3 != 0).select(
        node.alias("subject"),
        F.lit("label").alias("predicate"),
        F.col("p_name").alias("object"),
    )
    return bgp_match(
        broader.unionByName(labels),
        [("?x", "broader", "?y")],
        optional=[[("?x", "label", "?xl")]],
        filter_expr="y LIKE 'p:1%'",
    )


@query(
    "kg_bgp_union",
    """WITH tr AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS subject,
             'broader' AS predicate,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS object
      FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'label', p_name FROM part)
    SELECT subject AS x, object AS l, CAST(NULL AS VARCHAR) AS y
    FROM tr WHERE predicate = 'label'
    UNION ALL
    SELECT subject AS x, CAST(NULL AS VARCHAR) AS l, object AS y
    FROM tr WHERE predicate = 'broader'""",
)
def q_kg_bgp_union(spark, sf):
    # SPARQL UNION: branches bind different variable sets (l vs y) and
    # null-pad each other — a plan-level union of two filtered scans,
    # no shuffle (pinned in test_kgquery.py).
    from ontology_mapping_spark.operators.kgquery import bgp_union

    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    node = F.concat(F.lit("p:"), pk.cast("string"))
    broader = part.filter(pk >= 2).select(
        node.alias("subject"),
        F.lit("broader").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
        ).alias("object"),
    )
    labels = part.select(
        node.alias("subject"),
        F.lit("label").alias("predicate"),
        F.col("p_name").alias("object"),
    )
    return bgp_union(
        broader.unionByName(labels),
        [[("?x", "label", "?l")], [("?x", "broader", "?y")]],
    )


# --------------------------------------------------------------------------
# KG maintenance (operators/kgmaint.py): recrawl dedup, upsert, snapshot diff
# --------------------------------------------------------------------------

@query(
    "latest_capture_wins",
    """SELECT url, warc_ts, okey, price FROM (
      SELECT 'u:' || CAST(o_custkey % 500 AS VARCHAR) AS url,
             o_orderdate AS warc_ts,
             o_orderkey AS okey,
             ROUND(o_totalprice, 6) AS price,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey % 500
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) t WHERE rn = 1""",
)
def q_latest_capture_wins(spark, sf):
    # recrawl semantics: orders stand in for repeated captures of the same
    # url (o_custkey % 500 -> many captures per url); newest o_orderdate
    # wins, o_orderkey is the deterministic tie-break. The engine's
    # struct-max aggregate must agree with the oracle's window row_number.
    from ontology_mapping_spark.operators.kgmaint import latest_captures

    caps = _t(spark, sf, "orders").select(
        F.concat(
            F.lit("u:"), (F.col("o_custkey") % 500).cast("string")
        ).alias("url"),
        F.col("o_orderdate").alias("warc_ts"),
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice"), 6).alias("price"),
    )
    return latest_captures(caps, tie_cols=["okey"])


_KG_EXISTING_SQL = """
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS subject,
             'broader' AS predicate,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS object,
             DATE '2024-01-01' AS first_seen,
             DATE '2024-01-31' AS last_seen,
             CAST(p_partkey % 3 + 1 AS BIGINT) AS support
      FROM part WHERE p_partkey >= 2"""

_KG_OBS_SQL = """
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS subject,
             'broader' AS predicate,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS object,
             DATE '2024-02-01' + CAST(p_partkey % 28 AS INTEGER) AS ts
      FROM part WHERE p_partkey >= 2 AND p_partkey % 2 = 0
      UNION ALL
      SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'broader',
             'p:' || CAST(p_partkey // 2 AS VARCHAR),
             DATE '2024-02-01' + CAST(p_partkey % 11 AS INTEGER)
      FROM part WHERE p_partkey >= 2 AND p_partkey % 2 = 0
      UNION ALL
      SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'seen_in',
             'crawl-2024-02', DATE '2024-02-15'
      FROM part WHERE p_partkey % 7 = 0"""


def _kg_existing(spark, sf):
    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    return part.filter(pk >= 2).select(
        F.concat(F.lit("p:"), pk.cast("string")).alias("subject"),
        F.lit("broader").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
        ).alias("object"),
        F.to_date(F.lit("2024-01-01")).alias("first_seen"),
        F.to_date(F.lit("2024-01-31")).alias("last_seen"),
        (pk % 3 + 1).cast("long").alias("support"),
    )


def _kg_delta(spark, sf):
    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    node = F.concat(F.lit("p:"), pk.cast("string"))
    parent = F.concat(
        F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
    )
    feb = F.to_date(F.lit("2024-02-01"))
    reobs = part.filter((pk >= 2) & (pk % 2 == 0))
    a = reobs.select(
        node.alias("subject"),
        F.lit("broader").alias("predicate"),
        parent.alias("object"),
        F.date_add(feb, (pk % 28).cast("int")).alias("ts"),
    )
    b = reobs.select(
        node.alias("subject"),
        F.lit("broader").alias("predicate"),
        parent.alias("object"),
        F.date_add(feb, (pk % 11).cast("int")).alias("ts"),
    )
    c = part.filter(pk % 7 == 0).select(
        node.alias("subject"),
        F.lit("seen_in").alias("predicate"),
        F.lit("crawl-2024-02").alias("object"),
        F.to_date(F.lit("2024-02-15")).alias("ts"),
    )
    return a.unionByName(b).unionByName(c)


@query(
    "kg_triple_merge",
    f"""WITH existing AS ({_KG_EXISTING_SQL}
    ), obs AS ({_KG_OBS_SQL}
    ), d AS (
      SELECT subject, predicate, object,
             MIN(ts) AS d_first, MAX(ts) AS d_last,
             CAST(COUNT(*) AS BIGINT) AS d_support
      FROM obs GROUP BY subject, predicate, object
    )
    SELECT COALESCE(e.subject, d.subject) AS subject,
           COALESCE(e.predicate, d.predicate) AS predicate,
           COALESCE(e.object, d.object) AS object,
           CAST(CASE WHEN e.first_seen IS NULL THEN d.d_first
                WHEN d.d_first IS NULL THEN e.first_seen
                ELSE LEAST(e.first_seen, d.d_first) END AS VARCHAR)
             AS first_seen,
           CAST(CASE WHEN e.last_seen IS NULL THEN d.d_last
                WHEN d.d_last IS NULL THEN e.last_seen
                ELSE GREATEST(e.last_seen, d.d_last) END AS VARCHAR)
             AS last_seen,
           CAST(COALESCE(e.support, 0) + COALESCE(d.d_support, 0) AS BIGINT)
             AS support
    FROM existing e FULL OUTER JOIN d
      ON e.subject = d.subject AND e.predicate = d.predicate
     AND e.object = d.object""",
)
def q_kg_triple_merge(spark, sf):
    # crawl-over-crawl KG upsert: the January KG (part-tree triples with
    # provenance) absorbs a February observation batch — even-key edges
    # re-observed twice (support accumulates, last_seen extends) plus new
    # 'seen_in' triples (delta-only provenance); one pre-aggregated
    # full-outer merge on the triple key (operators/kgmaint.merge_triples)
    from ontology_mapping_spark.operators.kgmaint import merge_triples

    merged = merge_triples(_kg_existing(spark, sf), _kg_delta(spark, sf))
    # gate projection: provenance dates as ISO strings so the type-strict
    # value hash agrees with the oracle's CAST(date AS VARCHAR)
    return merged.select(
        "subject",
        "predicate",
        "object",
        F.col("first_seen").cast("string").alias("first_seen"),
        F.col("last_seen").cast("string").alias("last_seen"),
        "support",
    )


@query(
    "kg_triple_diff",
    f"""WITH old AS (
      SELECT DISTINCT subject, predicate, object FROM ({_KG_EXISTING_SQL}) e
    ), new AS (
      SELECT DISTINCT subject, predicate, object FROM ({_KG_OBS_SQL}) o
    )
    SELECT COALESCE(o.subject, n.subject) AS subject,
           COALESCE(o.predicate, n.predicate) AS predicate,
           COALESCE(o.object, n.object) AS object,
           CASE WHEN o.subject IS NULL THEN 'added'
                WHEN n.subject IS NULL THEN 'removed'
                ELSE 'kept' END AS status
    FROM old o FULL OUTER JOIN new n
      ON o.subject = n.subject AND o.predicate = n.predicate
     AND o.object = n.object""",
)
def q_kg_triple_diff(spark, sf):
    # snapshot audit: which triples did the February crawl add / drop /
    # keep vs the January KG (operators/kgmaint.triple_diff)
    from ontology_mapping_spark.operators.kgmaint import triple_diff

    return triple_diff(
        _kg_existing(spark, sf),
        _kg_delta(spark, sf).select("subject", "predicate", "object"),
    )


@query(
    "kg_shape_violations",
    """WITH labelviol AS (
      SELECT 'labelled' AS rule,
             'p:' || CAST(p_partkey AS VARCHAR) AS node,
             'count label = 0 < min 1' AS detail
      FROM part
      -- focus nodes are KG SUBJECTS: p_partkey 0 (present in testdata)
      -- has neither a broader edge (k >= 2) nor a label (k % 3 = 0), so
      -- it is outside the focus set and cannot violate
      WHERE p_partkey % 3 = 0 AND p_partkey >= 2
    ), parentviol AS (
      SELECT DISTINCT 'parent-labelled' AS rule,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS node,
             'object of broader is not a subject of label' AS detail
      FROM part WHERE p_partkey >= 2 AND (p_partkey // 2) % 3 = 0
    ), shapeviol AS (
      SELECT DISTINCT 'node-id-shape' AS rule,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS node,
             'object of broader !~ /^p:[0-9]{2,}$/' AS detail
      FROM part WHERE p_partkey >= 2 AND p_partkey // 2 < 10
    )
    SELECT * FROM labelviol
    UNION ALL SELECT * FROM parentviol
    UNION ALL SELECT * FROM shapeviol""",
)
def q_kg_shape_violations(spark, sf):
    # SHACL-lite validation of the part-tree KG (labels withheld from
    # every third node): cardinality (min/max), range membership
    # (broader targets must be labelled), and literal shape (node-id
    # regex); 'single-parent' is clean by construction — the oracle
    # re-derives every violation set arithmetically.
    from ontology_mapping_spark.operators.kgvalidate import (
        ShapeRule,
        validate_kg,
    )

    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    node = F.concat(F.lit("p:"), pk.cast("string"))
    broader = part.filter(pk >= 2).select(
        node.alias("subject"),
        F.lit("broader").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
        ).alias("object"),
    )
    labels = part.filter(pk % 3 != 0).select(
        node.alias("subject"),
        F.lit("label").alias("predicate"),
        F.col("p_name").alias("object"),
    )
    rules = [
        ShapeRule("labelled", "label", min_count=1),
        ShapeRule("single-parent", "broader", max_count=1),
        ShapeRule(
            "parent-labelled", "broader", object_in_subjects_of="label"
        ),
        ShapeRule(
            "node-id-shape", "broader", object_pattern="^p:[0-9]{2,}$"
        ),
    ]
    return validate_kg(broader.unionByName(labels), rules)


@query(
    "incremental_components_merge",
    f"""WITH RECURSIVE e0 AS ({_FOREST_SQL}),
       verts AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
       und AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
       reach(node, r) AS (
         SELECT node, node FROM verts
         UNION
         SELECT reach.node, und.v FROM reach JOIN und ON reach.r = und.u)
       SELECT node, min(r) AS component FROM reach GROUP BY node""",
)
def q_incremental_components(spark, sf):
    # crawl-cadence CC maintenance: components are built from 4/5 of the
    # forest, then the remaining fifth arrives as a delta batch and is
    # folded in through the quotient graph (graph.incremental_components);
    # the oracle is the FULL recompute over all edges — the two must be
    # identical under the min-member-id convention.
    part = _t(spark, sf, "part").filter(
        (F.col("p_partkey") >= 2) & (F.col("p_partkey") % 13 != 0)
    )
    edges = part.select(
        F.col("p_partkey").cast("string").alias("u"),
        F.floor(F.col("p_partkey") / 2).cast("bigint").cast("string").alias("v"),
        (F.col("p_partkey") % 5 == 0).alias("is_delta"),
    )
    initial = edges.filter(~F.col("is_delta")).select("u", "v")
    delta = edges.filter(F.col("is_delta")).select("u", "v")
    assign = G.connected_components(initial)
    return G.incremental_components(assign, delta)


@query(
    "kg_bgp_construct",
    """WITH tr AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS subject,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS object
      FROM part WHERE p_partkey >= 2
    ), g AS (
      SELECT DISTINCT a.subject AS x, b.object AS z
      FROM tr a JOIN tr b ON b.subject = a.object
    )
    SELECT x AS subject, 'grandparent' AS predicate, z AS object FROM g
    UNION ALL
    SELECT z AS subject, 'grandchild' AS predicate, x AS object FROM g""",
)
def q_kg_bgp_construct(spark, sf):
    # SPARQL CONSTRUCT as rule inference: materialize grandparent /
    # grandchild edges from two broader hops over the part-tree KG
    # (kgquery.bgp_construct); graph semantics — duplicate solutions
    # collapse — mirrored by the oracle's DISTINCT two-hop core.
    from ontology_mapping_spark.operators.kgquery import bgp_construct

    return bgp_construct(
        _part_tree_broader(spark, sf),
        [("?x", "broader", "?y"), ("?y", "broader", "?z")],
        [("?x", "grandparent", "?z"), ("?z", "grandchild", "?x")],
    )


@query(
    "kg_bgp_negation",
    """WITH br AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS x,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS y
      FROM part WHERE p_partkey >= 2)
    SELECT b.x AS x, b.y AS y FROM br b
    WHERE NOT EXISTS (SELECT 1 FROM br c WHERE c.y = b.x)""",
)
def q_kg_bgp_negation(spark, sf):
    # SPARQL FILTER NOT EXISTS over the part-tree KG: edges whose child is
    # a LEAF — {?x broader ?y . FILTER NOT EXISTS {?z broader ?x}} —
    # compiled to a left-anti join on the shared variable
    # (kgquery.bgp_match not_exists); the oracle is the literal SQL
    # NOT EXISTS the anti-join must agree with.
    from ontology_mapping_spark.operators.kgquery import bgp_match

    return bgp_match(
        _part_tree_broader(spark, sf),
        [("?x", "broader", "?y")],
        not_exists=[[("?z", "broader", "?x")]],
    )


@query(
    "kg_bgp_values_minus",
    """WITH lab AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS x, p_name AS l
      FROM part),
    v(x, tag) AS (VALUES ('p:2', 'two'), ('p:5', 'five'), ('p:7', 'seven'))
    SELECT lab.l AS l, v.tag AS tag, lab.x AS x
    FROM lab JOIN v ON v.x = lab.x
    WHERE NOT EXISTS (
      SELECT 1 FROM part c
      WHERE c.p_partkey >= 2 AND c.p_partkey // 2 = 1
        AND 'p:' || CAST(c.p_partkey AS VARCHAR) = lab.x)""",
)
def q_kg_bgp_values_minus(spark, sf):
    # SPARQL VALUES + MINUS: labelled nodes restricted to an inline
    # binding table (which also EXTENDS solutions with a ?tag column),
    # minus the children of p:1 — {?x label ?l . VALUES (?x ?tag) {...}
    # MINUS {?x broader p:1}} (kgquery.bgp_match values/minus); the
    # oracle joins a literal VALUES table and re-states MINUS as
    # NOT EXISTS (equivalent here: ?x is always bound).
    from ontology_mapping_spark.operators.kgquery import bgp_match

    tr = _part_tree_broader(spark, sf).unionByName(
        _part_tree_labels(spark, sf)
    )
    return bgp_match(
        tr,
        [("?x", "label", "?l")],
        minus=[[("?x", "broader", "p:1")]],
        values=[
            {"x": "p:2", "tag": "two"},
            {"x": "p:5", "tag": "five"},
            {"x": "p:7", "tag": "seven"},
        ],
    )


@query(
    "kg_bgp_path_forms",
    """SELECT 'p:' || CAST(p_partkey // 2 AS VARCHAR) AS x, p_name AS l
    FROM part WHERE p_partkey >= 2""",
)
def q_kg_bgp_path_forms(spark, sf):
    # Composite SPARQL 1.1 path forms: inverse + sequence in one
    # predicate — {?x ^broader/label ?l} walks broader BACKWARD (parent
    # to child, a pattern rewrite with subject/object swapped) then the
    # child's label through a fresh existential variable
    # (kgquery.expand_path_patterns); the oracle states the composed walk
    # directly: every child contributes (its parent, its label).
    from ontology_mapping_spark.operators.kgquery import bgp_match_paths

    tr = _part_tree_broader(spark, sf).unionByName(
        _part_tree_labels(spark, sf)
    )
    return bgp_match_paths(tr, [("?x", "^broader/label", "?l")])


@query(
    "kg_state_stream_parity",
    f"""WITH obs AS ({_KG_OBS_SQL}
    )
    SELECT subject, predicate, object,
           CAST(CAST(MIN(ts) AS TIMESTAMP) AS VARCHAR) AS first_seen,
           CAST(CAST(MAX(ts) AS TIMESTAMP) AS VARCHAR) AS last_seen,
           CAST(COUNT(*) AS BIGINT) AS support
    FROM obs GROUP BY subject, predicate, object""",
)
def q_kg_state_stream_parity(spark, sf):
    """Streaming KG-state gate row: the same observation batch the batch
    merge row (kg_triple_merge) consumes is written as a multi-file drop,
    streamed through stream_upsert_kg_state (availableNow, several
    micro-batches, foreachBatch upsert with the atomic _commit marker),
    and the final state must equal the one-shot relational aggregation —
    the strongest driver-checkable batch/stream merge parity."""
    import shutil
    import tempfile

    from ontology_mapping_spark.streaming.kg_state_stream import (
        stream_observations,
        stream_upsert_kg_state,
    )

    obs = _kg_delta(spark, sf).select(
        "subject", "predicate", "object", F.col("ts").cast("timestamp").alias("ts")
    )
    tmp = tempfile.mkdtemp(prefix="omsp_kgstate_stream_")
    try:
        obs.repartition(6).write.mode("overwrite").parquet(f"{tmp}/obs")
        q = stream_upsert_kg_state(
            stream_observations(spark, f"{tmp}/obs", max_files_per_trigger=2),
            f"{tmp}/state",
            f"{tmp}/ckpt",
        )
        q.awaitTermination()
        out = spark.read.parquet(f"{tmp}/state").select(
            "subject",
            "predicate",
            "object",
            F.col("first_seen").cast("string").alias("first_seen"),
            F.col("last_seen").cast("string").alias("last_seen"),
            "support",
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# shared CTE for the SPARQL SELECT-modifier / UPDATE gate rows: the same
# synthetic part-tree KG as kg_bgp_* (broader edges + label triples)
_KG_TREE_SQL = """tr AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS subject,
             'broader' AS predicate,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS object
      FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'label', p_name FROM part)"""


@query(
    "kg_select_agg",
    f"""WITH {_KG_TREE_SQL}
    SELECT object AS y,
           CAST(COUNT(*) AS BIGINT) AS n,
           string_agg(subject, ';' ORDER BY subject) AS kids,
           CAST(SUM(CAST(substring(subject, 3) AS BIGINT)) AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(substring(subject, 3) AS BIGINT)), 6) AS mean_k
    FROM tr WHERE predicate = 'broader'
    GROUP BY object HAVING COUNT(*) >= 2
    ORDER BY n DESC, y LIMIT 100""",
)
def q_kg_select_agg(spark, sf):
    # SPARQL SELECT with the full modifier pipeline (kgquery.bgp_select):
    # children per parent through {?x broader ?y}, BIND lifting the child
    # id to a number, GROUP BY ?y with COUNT / SUM / AVG / GROUP_CONCAT,
    # HAVING, ORDER BY (total — n ties break on the unique ?y), LIMIT.
    # Plan: one map-side-combined hash aggregate + TakeOrderedAndProject;
    # the oracle is the literal SQL. group_concat determinism is pinned
    # by sorting the group in BOTH engines (sort_array / ORDER BY inside
    # string_agg); floats round to 6dp per the gate convention.
    from ontology_mapping_spark.operators.kgquery import bgp_select

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    out = bgp_select(
        tr,
        [("?x", "broader", "?y")],
        bind=[("?k", "CAST(substring(x, 3) AS BIGINT)")],
        group_by=["?y"],
        aggregates=[
            ("count", "*", "?n"),
            ("group_concat:;", "?x", "?kids"),
            ("sum", "?k", "?sum_k"),
            ("avg", "?k", "?mean_k"),
        ],
        having="n >= 2",
        order_by=["?n DESC", "?y"],
        limit=100,
    )
    return out.withColumn("mean_k", F.round(F.col("mean_k"), 6))


@query(
    "kg_select_slice",
    f"""WITH {_KG_TREE_SQL}
    SELECT DISTINCT subject AS x FROM tr WHERE predicate = 'broader'
    ORDER BY x LIMIT 25 OFFSET 7""",
)
def q_kg_select_slice(spark, sf):
    # SPARQL DISTINCT + ORDER BY + OFFSET/LIMIT slice (the paging idiom):
    # distinct makes ?x unique, so the order is total and the slice is
    # deterministic at any parallelism. Plan: hash-distinct, then the
    # ordered slice ships offset+limit together in one merge.
    from ontology_mapping_spark.operators.kgquery import bgp_select

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return bgp_select(
        tr,
        [("?x", "broader", "?y")],
        select=["?x"],
        distinct=True,
        order_by=["?x"],
        offset=7,
        limit=25,
    )


@query(
    "kg_update_delete_insert",
    f"""WITH {_KG_TREE_SQL},
    sols AS (
      SELECT subject AS x, object AS y FROM tr
      WHERE predicate = 'broader'
        AND CAST(substring(subject, 3) AS INT) % 2 = 0),
    del AS (SELECT DISTINCT x AS subject, 'broader' AS predicate, y AS object
            FROM sols),
    ins AS (SELECT DISTINCT y AS subject, 'narrower' AS predicate, x AS object
            FROM sols),
    doomed AS (SELECT * FROM del UNION SELECT * FROM ins)
    SELECT t.subject, t.predicate, t.object FROM tr t
    WHERE NOT EXISTS (
      SELECT 1 FROM doomed d
      WHERE d.subject = t.subject AND d.predicate = t.predicate
        AND d.object = t.object)
    UNION ALL
    SELECT subject, predicate, object FROM ins""",
)
def q_kg_update_delete_insert(spark, sf):
    # SPARQL UPDATE (kgquery.update_graph): DELETE {?x broader ?y}
    # INSERT {?y narrower ?x} WHERE {?x broader ?y . FILTER(even ?x)} —
    # even-keyed edges are retargeted to their inverse predicate in one
    # broadcast anti-join over the graph scan plus a plan-level union
    # (set semantics: every copy of a deleted triple drops, each inserted
    # triple lands exactly once). The oracle restates the update
    # relationally: NOT EXISTS against the delete- and insert-sets, then
    # the insert rows union back in.
    from ontology_mapping_spark.operators.kgquery import update_graph

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return update_graph(
        tr,
        [("?x", "broader", "?y")],
        delete=[("?x", "broader", "?y")],
        insert=[("?y", "narrower", "?x")],
        filter_expr="CAST(substring(x, 3) AS INT) % 2 = 0",
    )


@query(
    "kg_saturate_rdfs",
    """WITH RECURSIVE sub AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS c,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS d
      FROM part WHERE p_partkey >= 2
    ), clo AS (
      SELECT c, d FROM sub
      UNION
      SELECT clo.c, sub.d FROM clo JOIN sub ON sub.c = clo.d
    ), inst AS (
      SELECT 'i:' || CAST(p_partkey AS VARCHAR) AS x,
             'p:' || CAST(p_partkey AS VARCHAR) AS c
      FROM part WHERE p_partkey % 7 = 0
    )
    SELECT x AS subject, 'type' AS predicate, c AS object FROM inst
    UNION
    SELECT i.x, 'type', clo.d FROM inst i JOIN clo ON clo.c = i.c""",
)
def q_kg_saturate_rdfs(spark, sf):
    # Datalog-style rule saturation (operators/kginfer.saturate): RDFS
    # subclass transitivity + type inheritance applied semi-naive to
    # fixpoint over the part-tree (p:k subClassOf p:k//2) with planted
    # instances (i:k type p:k for k % 7 == 0); the gate checks the type
    # slice of the saturated graph against a recursive-CTE oracle.
    # Semi-naive transitivity doubles reach per round, so the ~11-level
    # tree converges in ~5 delta rounds.
    from ontology_mapping_spark.operators.kginfer import rdfs_rules, saturate

    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    sub = part.filter(pk >= 2).select(
        F.concat(F.lit("p:"), pk.cast("string")).alias("subject"),
        F.lit("subClassOf").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
        ).alias("object"),
    )
    inst = part.filter(pk % 7 == 0).select(
        F.concat(F.lit("i:"), pk.cast("string")).alias("subject"),
        F.lit("type").alias("predicate"),
        F.concat(F.lit("p:"), pk.cast("string")).alias("object"),
    )
    sat = saturate(
        sub.unionByName(inst), rdfs_rules(sub_class="subClassOf")
    )
    return sat.filter(F.col("predicate") == "type")


@query(
    "kg_retract_entailment",
    """WITH RECURSIVE sub AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS c,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS d
      FROM part WHERE p_partkey >= 2 AND p_partkey % 5 <> 0
    ), clo AS (
      SELECT c, d FROM sub
      UNION
      SELECT clo.c, sub.d FROM clo JOIN sub ON sub.c = clo.d
    ), inst AS (
      SELECT 'i:' || CAST(p_partkey AS VARCHAR) AS x,
             'p:' || CAST(p_partkey AS VARCHAR) AS c
      FROM part WHERE p_partkey % 7 = 0
    )
    SELECT c AS subject, 'subClassOf' AS predicate, d AS object FROM clo
    UNION
    SELECT x, 'type', c FROM inst
    UNION
    SELECT i.x, 'type', clo.d FROM inst i JOIN clo ON clo.c = i.c""",
)
def q_kg_retract_entailment(spark, sf):
    # DRed delete-and-rederive (kginfer.retract_incremental): saturate the
    # FULL part-tree + instances, then retract every subclass edge whose
    # child key is divisible by 5 — the oracle re-saturates the remaining
    # base from scratch (recursive CTE), so the row pins overdeletion
    # (closure paths through a cut edge vanish), rederivation (paths
    # around surviving ancestors return), and type-inheritance cascade in
    # one equivalence. Equivalence with full re-saturation is also
    # property-pinned at unit scale in tests/test_kginfer.py.
    from ontology_mapping_spark.operators.kginfer import (
        rdfs_rules,
        retract_incremental,
        saturate,
    )

    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    sub = part.filter(pk >= 2).select(
        F.concat(F.lit("p:"), pk.cast("string")).alias("subject"),
        F.lit("subClassOf").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
        ).alias("object"),
    )
    inst = part.filter(pk % 7 == 0).select(
        F.concat(F.lit("i:"), pk.cast("string")).alias("subject"),
        F.lit("type").alias("predicate"),
        F.concat(F.lit("p:"), pk.cast("string")).alias("object"),
    )
    asserted = sub.unionByName(inst)
    rules = rdfs_rules(sub_class="subClassOf")
    sat = saturate(asserted, rules)
    removals = sub.filter(pk % 5 == 0)
    return retract_incremental(
        sat, asserted, removals, rules, assume_distinct=True
    )


# the parity-split quad table (part tree in two named graphs) the three
# named-graph gate rows share — ONE definition, Spark and SQL sides
_PARITY_QUADS_SQL = """q AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN 'g:even' ELSE 'g:odd' END AS graph,
             'p:' || CAST(p_partkey AS VARCHAR) AS subject,
             'broader' AS predicate,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS object
      FROM part WHERE p_partkey >= 2
      UNION ALL
      SELECT CASE WHEN p_partkey % 2 = 0 THEN 'g:even' ELSE 'g:odd' END,
             'p:' || CAST(p_partkey AS VARCHAR), 'label', p_name FROM part)"""


def _parity_quads(spark, sf):
    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    g = F.when(pk % 2 == 0, F.lit("g:even")).otherwise(F.lit("g:odd"))
    return (
        part.filter(pk >= 2)
        .select(
            g.alias("graph"),
            F.concat(F.lit("p:"), pk.cast("string")).alias("subject"),
            F.lit("broader").alias("predicate"),
            F.concat(
                F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string")
            ).alias("object"),
        )
        .unionByName(
            part.select(
                g.alias("graph"),
                F.concat(F.lit("p:"), pk.cast("string")).alias("subject"),
                F.lit("label").alias("predicate"),
                F.col("p_name").alias("object"),
            )
        )
    )


@query(
    "kg_update_with_graph",
    f"""WITH {_PARITY_QUADS_SQL},
    sols AS (SELECT subject AS x, object AS y FROM q
             WHERE graph = 'g:even' AND predicate = 'broader'),
    ins AS (SELECT DISTINCT y AS subject, 'narrower' AS predicate,
                   x AS object FROM sols)
    SELECT graph, subject, predicate, object FROM q WHERE graph <> 'g:even'
    UNION ALL
    SELECT 'g:even', subject, predicate, object FROM q
    WHERE graph = 'g:even' AND predicate <> 'broader'
    UNION ALL
    SELECT 'g:even', subject, predicate, object FROM ins""",
)
def q_kg_update_with_graph(spark, sf):
    # WITH <g>-scoped SPARQL UPDATE (kgquery.update_quads via the text
    # front-end): only the g:even graph's broader edges retarget to
    # their inverse; g:odd and the scoped graph's labels pass through
    # untouched. The plan splits the scan into the scoped partition and
    # the passthrough rest — nothing outside the named graph shuffles.
    from ontology_mapping_spark.operators.sparql_text import sparql_update

    return sparql_update(
        _parity_quads(spark, sf),
        """WITH g:even DELETE { ?x broader ?y . }
           INSERT { ?y narrower ?x . } WHERE { ?x broader ?y . }""",
    )


@query(
    "kg_graph_management",
    f"""WITH {_PARITY_QUADS_SQL},
    dst AS (
      SELECT 'g:even' AS graph, subject, predicate, object FROM q
      WHERE graph = 'g:even'
      UNION
      SELECT 'g:even', subject, predicate, object FROM q
      WHERE graph = 'g:odd')
    SELECT graph, subject, predicate, object FROM q WHERE graph = 'g:odd'
    UNION ALL
    SELECT graph, subject, predicate, object FROM dst""",
)
def q_kg_graph_management(spark, sf):
    # SPARQL graph management (kgquery.copy_graph via the text
    # front-end): ADD g:odd TO g:even — the odd graph's triples union
    # into the even graph with set semantics while the source stays; one
    # scan split by graph membership plus one distinct over the target
    # graph only. The oracle restates the retag-union-distinct.
    from ontology_mapping_spark.operators.sparql_text import sparql_update

    return sparql_update(
        _parity_quads(spark, sf), "ADD GRAPH g:odd TO GRAPH g:even"
    )


@query(
    "kg_saturate_owl",
    """WITH RECURSIVE sub AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS c,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS d
      FROM part WHERE p_partkey >= 2
    ), clo AS (
      SELECT c, d FROM sub
      UNION
      SELECT clo.c, sub.d FROM clo JOIN sub ON sub.c = clo.d
    ), inv AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS c,
             'p:' || CAST(p_partkey // 2 AS VARCHAR) AS d
      FROM part WHERE p_partkey >= 2 AND p_partkey % 3 = 0
    ), adj AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS a,
             'p:' || CAST(p_partkey + 1 AS VARCHAR) AS b
      FROM part WHERE p_partkey % 5 = 0
    )
    SELECT 'anc' AS subject, 'type' AS predicate,
           'TransitiveProperty' AS object
    UNION ALL SELECT 'adj', 'type', 'SymmetricProperty'
    UNION ALL SELECT 'childOf', 'inverseOf', 'parentOf'
    UNION ALL SELECT c, 'anc', d FROM clo
    UNION ALL SELECT c, 'childOf', d FROM inv
    UNION ALL SELECT d, 'parentOf', c FROM inv
    UNION ALL SELECT a, 'adj', b FROM adj
    UNION ALL SELECT b, 'adj', a FROM adj""",
)
def q_kg_saturate_owl(spark, sf):
    # schema-driven OWL-lite entailment (kginfer.owl_rules): the graph
    # DECLARES 'anc' transitive, 'adj' symmetric, and 'childOf' the
    # inverse of 'parentOf' as ordinary triples; saturation derives the
    # anc closure (semi-naive delta∘delta = path doubling), the reversed
    # adj edges, and the parentOf inverses in one fixpoint. The oracle
    # restates each family relationally (recursive CTE for the closure).
    from ontology_mapping_spark.operators.kginfer import owl_rules, saturate

    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    pid = F.concat(F.lit("p:"), pk.cast("string"))
    parent = F.concat(F.lit("p:"), F.floor(pk / 2).cast("bigint").cast("string"))
    anc = part.filter(pk >= 2).select(
        pid.alias("subject"), F.lit("anc").alias("predicate"),
        parent.alias("object"),
    )
    child_of = part.filter((pk >= 2) & (pk % 3 == 0)).select(
        pid.alias("subject"), F.lit("childOf").alias("predicate"),
        parent.alias("object"),
    )
    adj = part.filter(pk % 5 == 0).select(
        pid.alias("subject"), F.lit("adj").alias("predicate"),
        F.concat(F.lit("p:"), (pk + 1).cast("string")).alias("object"),
    )
    decls = spark.createDataFrame(
        [
            ("anc", "type", "TransitiveProperty"),
            ("adj", "type", "SymmetricProperty"),
            ("childOf", "inverseOf", "parentOf"),
        ],
        "subject string, predicate string, object string",
    )
    kg = anc.unionByName(child_of).unionByName(adj).unionByName(decls)
    return saturate(kg, owl_rules())


@query(
    "kg_graph_quads",
    f"""WITH {_PARITY_QUADS_SQL}
    SELECT a.graph AS g, a.subject AS x, l.object AS xl
    FROM q a JOIN q l
      ON l.graph = a.graph AND l.predicate = 'label' AND l.subject = a.subject
    WHERE a.predicate = 'broader'""",
)
def q_kg_graph_quads(spark, sf):
    # named-graph (quad) matching: the part-tree split into two named
    # graphs by key parity; the BGP {GRAPH ?g {?x broader ?y . ?x label
    # ?xl}} joins both patterns WITHIN one graph via the shared ?g —
    # exactly the SQL same-graph self-join the oracle states. A constant
    # graph term would prune to one partition of a graph-partitioned
    # quad table (asserted-vs-entailed layers, one graph per crawl).
    from ontology_mapping_spark.operators.kgquery import bgp_match

    return bgp_match(
        _parity_quads(spark, sf),
        [("?g", "?x", "broader", "?y"), ("?g", "?x", "label", "?xl")],
        select=["?g", "?x", "?xl"],
    )


@query(
    "kg_entail_stream_parity",
    """WITH RECURSIVE sub AS (
      SELECT 'p:' || CAST(p_partkey AS VARCHAR) AS c,
             'p:' || CAST(p_partkey // 16 AS VARCHAR) AS d
      FROM part WHERE p_partkey >= 2
    ), clo AS (
      SELECT c, d FROM sub
      UNION
      SELECT clo.c, sub.d FROM clo JOIN sub ON sub.c = clo.d
    ), inst AS (
      SELECT 'i:' || CAST(p_partkey AS VARCHAR) AS x,
             'p:' || CAST(p_partkey AS VARCHAR) AS c
      FROM part WHERE p_partkey % 7 = 0
    )
    SELECT x AS subject, 'type' AS predicate, c AS object FROM inst
    UNION
    SELECT i.x, 'type', clo.d FROM inst i JOIN clo ON clo.c = i.c""",
)
def q_kg_entail_stream_parity(spark, sf):
    """Streaming entailment gate row: the same part-tree + instances the
    batch saturation row (kg_saturate_rdfs) consumes arrive as a
    multi-file observation drop, streamed through stream_entail_kg_state
    (availableNow, several micro-batches, saturate_incremental per batch
    with the atomic swap + replay marker) — the final saturated state's
    type slice must equal the one-shot recursive-CTE closure: the
    strongest driver-checkable batch/stream INFERENCE parity."""
    import shutil
    import tempfile

    from ontology_mapping_spark.operators.kginfer import rdfs_rules
    from ontology_mapping_spark.streaming.kg_state_stream import (
        stream_entail_kg_state,
        stream_observations,
    )

    part = _t(spark, sf, "part")
    pk = F.col("p_partkey")
    # fan-out 16 tree (depth 2 at sf0.001) instead of the binary tree the
    # batch row kg_saturate_rdfs climbs: THIS row's signal is the
    # stream/batch parity of the incremental plumbing (cold saturate +
    # fold + atomic swap + replay marker), not saturation depth — and the
    # gate's wall time is micro-batches x saturation rounds x fixed job
    # overhead (VERDICT r4 #7: was 24s of the sf0.001 gate)
    sub = part.filter(pk >= 2).select(
        F.concat(F.lit("p:"), pk.cast("string")).alias("subject"),
        F.lit("subClassOf").alias("predicate"),
        F.concat(
            F.lit("p:"), F.floor(pk / 16).cast("bigint").cast("string")
        ).alias("object"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    inst = part.filter(pk % 7 == 0).select(
        F.concat(F.lit("i:"), pk.cast("string")).alias("subject"),
        F.lit("type").alias("predicate"),
        F.concat(F.lit("p:"), pk.cast("string")).alias("object"),
        F.to_timestamp(F.lit("2026-01-02 00:00:00")).alias("ts"),
    )
    rules = rdfs_rules(sub_class="subClassOf", rdf_type="type")
    tmp = tempfile.mkdtemp(prefix="omsp_entail_stream_")
    try:
        # 4 files / 2 per trigger = TWO micro-batches: one cold saturate +
        # one incremental fold — the minimum that still exercises both
        # sides of the stream_entail_kg_state state machine. Instances
        # land FIRST (older mod time -> first trigger) so the cold batch
        # converges in one round and the subclass tree arrives as the
        # incremental fold; parity holds for ANY file-to-batch split —
        # the ordering only trims gate wall time (VERDICT r4 #7)
        inst.repartition(2).write.mode("overwrite").parquet(f"{tmp}/obs")
        sub.repartition(2).write.mode("append").parquet(f"{tmp}/obs")
        q = stream_entail_kg_state(
            stream_observations(spark, f"{tmp}/obs", max_files_per_trigger=2),
            f"{tmp}/state",
            f"{tmp}/ckpt",
            rules,
        )
        q.awaitTermination()
        out = (
            spark.read.parquet(f"{tmp}/state")
            .filter(F.col("predicate") == "type")
            .select("subject", "predicate", "object")
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "kg_state_as_of",
    f"""WITH obs AS ({_KG_OBS_SQL}
    ), state AS (
      SELECT subject, predicate, object,
             MIN(ts) AS first_seen, MAX(ts) AS last_seen
      FROM obs GROUP BY subject, predicate, object)
    SELECT subject, predicate, object FROM state
    WHERE first_seen <= DATE '2024-02-10' AND last_seen >= DATE '2024-02-10'""",
)
def q_kg_state_as_of(spark, sf):
    # temporal point-in-time query over the provenance state
    # (kgmaint.as_of): the same observation batch the merge rows consume,
    # aggregated to (first_seen, last_seen) windows, filtered to the
    # triples whose window covers 2024-02-10 — one pushed-down Catalyst
    # conjunction; the oracle restates the window filter literally.
    from ontology_mapping_spark.operators.kgmaint import as_of

    state = _kg_delta(spark, sf).groupBy("subject", "predicate", "object").agg(
        F.min("ts").alias("first_seen"), F.max("ts").alias("last_seen")
    )
    return as_of(state, "2024-02-10")


@query(
    "kg_sparql_text",
    f"""WITH {_KG_TREE_SQL}
    SELECT object AS y,
           CAST(COUNT(*) AS BIGINT) AS n,
           string_agg(subject, ';' ORDER BY subject) AS kids
    FROM tr WHERE predicate = 'broader'
    GROUP BY object HAVING COUNT(*) >= 2
    ORDER BY n DESC, y LIMIT 100""",
)
def q_kg_sparql_text(spark, sf):
    # the SPARQL TEXT front-end (operators/sparql_text.sparql): the same
    # grouped/ordered analytics as kg_select_agg, but parsed from an
    # actual SPARQL query string — proving a triple-store user can paste
    # their query and get the identical Catalyst plan the algebra builds.
    from ontology_mapping_spark.operators.sparql_text import sparql

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return sparql(
        tr,
        """SELECT ?y (COUNT(*) AS ?n) (GROUP_CONCAT(?x; SEPARATOR=";") AS ?kids)
           WHERE { ?x broader ?y . }
           GROUP BY ?y HAVING(?n >= 2) ORDER BY DESC(?n) ?y LIMIT 100""",
    )


@query(
    "kg_sparql_update_text",
    f"""WITH {_KG_TREE_SQL},
    sols AS (
      SELECT subject AS x, object AS y FROM tr
      WHERE predicate = 'broader'
        AND CAST(substring(subject, 3) AS INT) % 2 = 0),
    del AS (SELECT DISTINCT x AS subject, 'broader' AS predicate, y AS object
            FROM sols),
    ins AS (SELECT DISTINCT y AS subject, 'narrower' AS predicate, x AS object
            FROM sols),
    doomed AS (SELECT * FROM del UNION SELECT * FROM ins)
    SELECT t.subject, t.predicate, t.object FROM tr t
    WHERE NOT EXISTS (
      SELECT 1 FROM doomed d
      WHERE d.subject = t.subject AND d.predicate = t.predicate
        AND d.object = t.object)
    UNION ALL
    SELECT subject, predicate, object FROM ins""",
)
def q_kg_sparql_update_text(spark, sf):
    # the SPARQL UPDATE TEXT front-end (sparql_text.sparql_update): the
    # identical retarget-to-inverse update as kg_update_delete_insert,
    # but parsed from an actual SPARQL UPDATE request string — same
    # broadcast-anti-join + plan-level-union physical plan, same oracle.
    from ontology_mapping_spark.operators.sparql_text import sparql_update

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return sparql_update(
        tr,
        """DELETE { ?x broader ?y . }
           INSERT { ?y narrower ?x . }
           WHERE { ?x broader ?y .
                   FILTER(CAST(SUBSTRING(?x, 3) AS INT) % 2 = 0) }""",
    )


@query(
    "kg_bgp_path_optnps",
    f"""WITH {_KG_TREE_SQL},
    nodes AS (SELECT subject AS n FROM tr UNION SELECT object FROM tr),
    hop AS (SELECT subject AS x, object AS y FROM tr
            WHERE predicate = 'broader'
            UNION SELECT n, n FROM nodes),
    lab AS (SELECT subject AS x, object AS l FROM tr
            WHERE predicate = 'label')
    SELECT hop.x, hop.y, lab.l FROM hop JOIN lab USING (x)""",
)
def q_kg_bgp_path_optnps(spark, sf):
    # the two remaining SPARQL 1.1 path forms, through the text
    # front-end: 'broader?' (zero-or-one hop: the edge scan plus the
    # per-node identity, distinct — SPARQL path solutions are node
    # pairs) joined with '!broader' (negated property set: the
    # complement scan, here the label edges). Both derived relations are
    # single filtered passes unioned under the composite predicate — no
    # joins beyond the BGP's own. The oracle restates them as CTEs.
    from ontology_mapping_spark.operators.sparql_text import sparql

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return sparql(
        tr, "SELECT ?x ?y ?l WHERE { ?x broader? ?y ; !broader ?l . }"
    )


@query(
    "kg_describe_set",
    f"""WITH {_KG_TREE_SQL},
    n AS (SELECT subject FROM tr WHERE predicate = 'broader'
          AND object = 'p:1')
    SELECT t.subject, t.predicate, t.object FROM tr t
    WHERE t.subject IN (SELECT subject FROM n)
    UNION ALL
    SELECT t.subject, t.predicate, t.object FROM tr t
    WHERE t.object IN (SELECT subject FROM n)
      AND t.subject NOT IN (SELECT subject FROM n)""",
)
def q_kg_describe_set(spark, sf):
    # DESCRIBE ?x WHERE { ?x broader p:1 }: concise-bounded description
    # of a solution-driven node SET (kgquery.describe_nodes) — two
    # semi-joins (by subject; by object for rows not already matched by
    # subject) preserve triple multiplicity with no whole-table distinct;
    # the node set is dimension-sized, so AQE broadcasts it. The oracle
    # restates the same subject-first union.
    from ontology_mapping_spark.operators.sparql_text import sparql

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return sparql(tr, "DESCRIBE ?x WHERE { ?x broader p:1 . }")


@query(
    "kg_sparql_exists",
    f"""WITH {_KG_TREE_SQL}
    SELECT t.subject AS x, t.object AS l FROM tr t
    WHERE t.predicate = 'label'
      AND EXISTS (
        SELECT 1 FROM tr b JOIN tr b2 ON b.object = b2.subject
        WHERE b.predicate = 'broader' AND b2.predicate = 'broader'
          AND b.subject = t.subject)""",
)
def q_kg_sparql_exists(spark, sf):
    # positive FILTER EXISTS through the text front-end: labelled nodes
    # that have a GRANDPARENT — the EXISTS body is a sequence path
    # (broader/broader), so this row pins both the left-semi compilation
    # (solutions are kept, never multiplied, by the distinct-projected
    # semi join) and path expansion inside an existence group. Plan: the
    # label scan semi-joined to the two-hop self-join, dimension-sized
    # per node fan-out. The oracle is the literal SQL EXISTS.
    from ontology_mapping_spark.operators.sparql_text import sparql

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return sparql(
        tr,
        """SELECT ?x ?l WHERE {
             ?x label ?l .
             FILTER EXISTS { ?x broader/broader ?g . }
           }""",
    )


@query(
    "kg_sparql_subselect",
    f"""WITH {_KG_TREE_SQL},
    e AS (SELECT subject AS x, object AS y FROM tr WHERE predicate = 'broader'),
    c AS (SELECT object AS y, CAST(COUNT(*) AS BIGINT) AS n
          FROM tr WHERE predicate = 'broader' GROUP BY object)
    SELECT e.x, e.y, c.n FROM e JOIN c USING (y)""",
)
def q_kg_sparql_subselect(spark, sf):
    # SPARQL 1.1 sub-SELECT through the text front-end: every broader
    # edge annotated with its parent's child-count — the inner SELECT
    # evaluates bottom-up (map-side-combined aggregate) and joins back on
    # the exported ?y with no broadcast hint (AQE picks the strategy from
    # the aggregate's runtime size). The oracle states the same two-level
    # query as a CTE join.
    from ontology_mapping_spark.operators.sparql_text import sparql

    tr = _part_tree_broader(spark, sf).unionByName(_part_tree_labels(spark, sf))
    return sparql(
        tr,
        """SELECT ?x ?y ?n WHERE {
             ?x broader ?y .
             { SELECT ?y (COUNT(*) AS ?n) WHERE { ?z broader ?y . }
               GROUP BY ?y }
           }""",
    )
