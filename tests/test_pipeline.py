"""End-to-end pipeline: P/R gates + resume semantics (SURVEY.md §5 items 3-4)."""

import pytest
from pyspark.sql import functions as F

from ontology_mapping_spark.config import PipelineConfig
from ontology_mapping_spark.fixtures import fixture_dataframes, make_fixture
from ontology_mapping_spark.ml.evaluate import triple_pr
from ontology_mapping_spark.operators.mentions import label_phrases
from ontology_mapping_spark.plans.pipeline import run_pipeline
from tests import oracle
from tests.test_mentions import naive_mentions, _phrase_rows


@pytest.fixture(scope="module")
def e2e(spark, tmp_path_factory):
    fx = make_fixture(n_pairs=80, n_extra_per_side=30, n_pages=200, seed=42)
    triples, train, test, pages = fixture_dataframes(spark, fx)
    workdir = str(tmp_path_factory.mktemp("pipeline"))
    cfg = PipelineConfig(idf_negatives=20, neighbour_negatives=10)
    res = run_pipeline(
        spark, triples, train, test, pages, workdir, cfg, n_estimators=20
    )
    return fx, res, (triples, train, test, pages), workdir, cfg


def test_mention_triples_match_oracle_exactly(spark, e2e):
    fx, res, _, _, cfg = e2e
    pages_rows = [(p["url"], p["text"]) for p in fx.web_pages if p["lang"] == "en"]
    want_rows = naive_mentions(pages_rows, _phrase_rows(fx))
    want = spark.createDataFrame(
        [(uri, "kg:mentionedIn", url) for (url, uri, _ph) in want_rows],
        "subject string, predicate string, object string",
    )
    pr = triple_pr(res.mention_triples, want)
    assert pr["precision"] == 1.0 and pr["recall"] == 1.0, pr


def test_link_quality_meets_baseline(spark, e2e):
    _, res, _, _, _ = e2e
    rep = {r["class"]: r for r in res.report.collect()}
    match = rep["1"]
    assert match["precision"] >= 0.95, dict(match.asDict())
    assert match["recall"] >= 0.95, dict(match.asDict())


def test_emitted_triples_nonempty_and_canonical(spark, e2e):
    fx, res, _, _, cfg = e2e
    kinds = {
        r["predicate"]
        for r in res.triples.select("predicate").distinct().collect()
    }
    assert "kg:mentionedIn" in kinds and "kg:sameAs" in kinds
    # the fixture plants two-mention relation sentences, so the S7 relation
    # stage must contribute typed entity-entity triples
    assert kinds & {"kg:isA", "kg:partOf", "kg:locatedIn"}, kinds
    assert res.triples.count() > 0


def test_resume_skips_stages_and_is_identical(spark, e2e):
    fx, res, dfs, workdir, cfg = e2e
    triples, train, test, pages = dfs
    before = {
        (r["subject"], r["predicate"], r["object"]) for r in res.triples.collect()
    }
    res2 = run_pipeline(
        spark, triples, train, test, pages, workdir, cfg, n_estimators=20
    )
    # every stage skipped on the second run
    assert all(ev == "skipped" for _, ev in res2.runner.events), res2.runner.events
    assert res2.model is None  # training skipped too
    after = {
        (r["subject"], r["predicate"], r["object"]) for r in res2.triples.collect()
    }
    assert before == after


def test_manifests_record_lineage_and_metrics(spark, e2e):
    _, res, _, _, _ = e2e
    m = res.runner.manifest("kg_triples")
    assert m["rows"] > 0
    assert m["inputs"] == ["mentions", "components", "predictions", "relations"]
    assert sum(m["partition_metrics"].values()) == m["rows"]
    assert res.runner.manifest("closure")["inputs"] == ["edges"]


def test_synth_pages_distributed_deterministic_any_parallelism(spark):
    """The distributed corpus generator must yield byte-identical rows at
    any partition count (per-page-id rng — the property that makes a
    synthetic 10^12-row table reproducible across cluster sizes), match
    the WEB_PAGES schema, and share make_fixture's content shape."""
    from ontology_mapping_spark import schemas
    from ontology_mapping_spark.fixtures import (
        make_fixture,
        synth_pages_distributed,
    )

    fx = make_fixture(n_pairs=12, n_extra_per_side=6, n_pages=0)
    a = synth_pages_distributed(spark, 300, fx.pref_labels, seed=7, partitions=3)
    b = synth_pages_distributed(spark, 300, fx.pref_labels, seed=7, partitions=17)
    assert a.schema == schemas.WEB_PAGES
    rows_a = {r["url"]: r for r in a.collect()}
    rows_b = {r["url"]: r for r in b.collect()}
    assert rows_a == rows_b and len(rows_a) == 300
    # content shape: langs, planted mentions present, html wraps text
    langs = {r["lang"] for r in rows_a.values()}
    assert langs <= {"en", "de"} and "en" in langs
    some = rows_a["https://example.org/p/00000000"]
    assert some["text"] in some["html"].decode("utf-8")
    # a different seed changes content
    c = synth_pages_distributed(spark, 300, fx.pref_labels, seed=8, partitions=3)
    assert {r["url"]: r for r in c.collect()} != rows_a


def test_distributed_gold_matches_pages_and_recall_is_one(spark):
    """The gold twin must replay exactly what the page generator planted
    (same per-page-id rng), be partition-independent, and the mention
    pipeline must re-find every planted pair — the corpus-scale form of
    the planted-gold recall contract (tools/eval_mentions_scale.py)."""
    from ontology_mapping_spark.fixtures import (
        fixture_dataframes,
        make_fixture,
        synth_gold_mentions_distributed,
        synth_pages_distributed,
    )
    from ontology_mapping_spark.operators.labels import extract_labels
    from ontology_mapping_spark.operators.mentions import (
        label_phrases,
        mentions_from_html,
    )

    fx = make_fixture(n_pairs=15, n_extra_per_side=5, n_pages=0, seed=7)
    kw = dict(seed=7, mentions_per_page=(0, 4), filler_sentences=(2, 5))
    pages = synth_pages_distributed(spark, 250, fx.pref_labels, partitions=4, **kw)
    gold = synth_gold_mentions_distributed(
        spark, 250, fx.pref_labels, partitions=4, **kw
    )
    g2 = synth_gold_mentions_distributed(
        spark, 250, fx.pref_labels, partitions=13, **kw
    )
    gold_rows = sorted((r["url"], r["uri"]) for r in gold.collect())
    assert gold_rows == sorted((r["url"], r["uri"]) for r in g2.collect())
    assert gold_rows, "fixture should plant at least one mention"
    # every gold url is an 'en' page whose text contains the planted label
    texts = {r["url"]: (r["text"], r["lang"]) for r in pages.collect()}
    for url, uri in gold_rows:
        text, lang = texts[url]
        assert lang == "en" and fx.pref_labels[uri] in text
    # the pipeline re-finds every planted pair (recall 1.0)
    triples, _, _, _ = fixture_dataframes(spark, fx)
    detected = {
        (r["url"], r["uri"])
        for r in mentions_from_html(
            pages, label_phrases(extract_labels(triples))
        ).collect()
    }
    missing = set(gold_rows) - detected
    assert not missing, f"planted mentions missed: {sorted(missing)[:5]}"


def test_kg_lifecycle_end_to_end(spark, e2e, tmp_path):
    """The emitted KG is a living artifact: upsert it into the provenance
    state, validate shapes, query it with the SPARQL layer, and derive new
    triples — the full lifecycle on the real pipeline output."""
    from pyspark.sql import functions as F

    from ontology_mapping_spark.operators.kgquery import bgp_construct, bgp_match
    from ontology_mapping_spark.operators.kgvalidate import (
        ShapeRule,
        validation_report,
    )
    from ontology_mapping_spark.operators.kgmaint import upsert_observations

    _fx, res, _, _, _cfg = e2e
    # maintain: the crawl lands in the provenance state
    state = str(tmp_path / "kg_state")
    obs = res.triples.select(
        "subject", "predicate", "object",
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    n_state = upsert_observations(spark, state, obs)
    assert n_state == res.triples.distinct().count()
    kg = spark.read.parquet(state).select("subject", "predicate", "object")

    # validate: emitted predicates are well-formed; sameAs endpoints exist
    rep = {
        r["rule"]: r["violations"]
        for r in validation_report(
            kg,
            [
                ShapeRule("known-predicates", "kg:sameAs",
                          object_pattern=r"^.+$"),
                ShapeRule("mention-pages-nonempty", "kg:mentionedIn",
                          object_pattern=r"^.+$"),
            ],
        ).collect()
    }
    assert rep == {"known-predicates": 0, "mention-pages-nonempty": 0}

    # query: sameAs pairs whose subject also has a mention, via one BGP
    linked_mentioned = bgp_match(
        kg, [("?s", "kg:sameAs", "?t"), ("?s", "kg:mentionedIn", "?pg")]
    )
    assert linked_mentioned.count() > 0

    # construct: lift mentions across sameAs onto the target concept and
    # check the derived graph is queryable
    derived = bgp_construct(
        kg,
        [("?s", "kg:sameAs", "?t"), ("?s", "kg:mentionedIn", "?pg")],
        [("?t", "kg:mentionedIn", "?pg")],
    )
    assert derived.count() == linked_mentioned.select("t", "pg").distinct().count()
    assert bgp_match(derived, [("?t", "kg:mentionedIn", "?pg")]).count() > 0


def test_entailment_stage_on_pipeline_output(spark, e2e):
    """--entail's layer: kg_entailment_rules saturated over the emitted KG
    ∪ ontology gives sameAs symmetry, cross-link mention lifting, and
    subClassOf transitivity — derived-only, disjoint from the asserted
    graph, and resumable through the runner's manifest chain."""
    from ontology_mapping_spark.operators.kginfer import (
        entailed_triples,
        kg_entailment_rules,
    )

    _fx, res, (triples, *_rest), _wd, cfg = e2e
    asserted = res.triples.unionByName(
        triples.select("subject", "predicate", "object")
    )
    ent = res.runner.materialize(
        "entailment",
        lambda: entailed_triples(asserted, kg_entailment_rules(cfg.predicates)),
        ["kg_triples"],
    )
    ent.cache()
    key = ["subject", "predicate", "object"]
    # derived-only: disjoint from the asserted graph
    assert ent.join(asserted.distinct(), on=key, how="inner").count() == 0
    same_as, mentions = cfg.predicates["same_as"], cfg.predicates["mentions"]
    links = res.triples.filter(F.col("predicate") == same_as)
    # every accepted link has its symmetric twin in the entailment layer
    flipped = links.select(
        F.col("object").alias("subject"),
        F.col("predicate"),
        F.col("subject").alias("object"),
    )
    only_asserted = flipped.join(res.triples, on=key, how="left_anti")
    assert (
        only_asserted.join(ent, on=key, how="left_anti").count() == 0
    ), "a sameAs twin is missing from the entailment layer"
    # mention lifting happened: some target concept inherited a page
    lifted = ent.filter(F.col("predicate") == mentions)
    assert lifted.count() > 0
    # and it closed the components: the pipeline canonicalizes mention
    # subjects to component reps while links keep raw endpoints, so ONLY
    # the sym+trans sameAs closure connects endpoints to their rep's
    # pages — after entailment, both endpoints of every accepted link
    # must carry identical mention sets
    union_kg = asserted.unionByName(ent)
    pages_of = {
        r["subject"]: frozenset(r["pages"])
        for r in union_kg.filter(F.col("predicate") == mentions)
        .groupBy("subject")
        .agg(F.collect_set("object").alias("pages"))
        .collect()
    }
    n_checked = 0
    for r in links.select("subject", "object").collect():
        x, y = r["subject"], r["object"]
        if x in pages_of or y in pages_of:
            assert pages_of.get(x) == pages_of.get(y), (x, y)
            n_checked += 1
    assert n_checked > 0
    # resumable: a second materialize with the same lineage skips the build
    again = res.runner.materialize(
        "entailment",
        lambda: (_ for _ in ()).throw(AssertionError("must resume, not rebuild")),
        ["kg_triples"],
    )
    assert again.count() == ent.count()
    assert ("entailment", "skipped") in res.runner.events
