"""Streaming mention extraction == batch mention extraction (availableNow)."""

import os

from pyspark.sql import functions as F

from ontology_mapping_spark.operators.labels import extract_labels
from ontology_mapping_spark.operators.mentions import label_phrases, mentions_via_join
from ontology_mapping_spark.sources.pages import extracted_pages
from ontology_mapping_spark.streaming.mentions_stream import (
    run_stream_to_parquet,
    stream_mention_counts,
    stream_mentions,
    stream_pages,
)


def test_stream_equals_batch(spark, fx_dfs, tmp_path):
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "mentions_out")
    ckpt = str(tmp_path / "ckpt")
    # write the fixture pages as 4 file drops
    fx_dfs["pages"].repartition(4).write.parquet(in_dir)
    phrases = label_phrases(extract_labels(fx_dfs["triples"])).cache()

    q = run_stream_to_parquet(spark, in_dir, phrases, out_dir, ckpt)
    q.awaitTermination(300)

    got = spark.read.parquet(out_dir)
    batch = mentions_via_join(extracted_pages(fx_dfs["pages"]), phrases)
    g = {(r["url"], r["uri"], r["surface"], r["n_hits"]) for r in got.collect()}
    b = {(r["url"], r["uri"], r["surface"], r["n_hits"]) for r in batch.collect()}
    assert g == b and len(g) > 0

    # restart with no new files -> no duplicates (exactly-once resume)
    q2 = run_stream_to_parquet(spark, in_dir, phrases, out_dir, ckpt)
    q2.awaitTermination(120)
    again = spark.read.parquet(out_dir).count()
    assert again == len(g)


def test_windowed_counts_plan_is_streaming(spark, fx_dfs, tmp_path):
    in_dir = str(tmp_path / "pages_in2")
    fx_dfs["pages"].limit(20).write.parquet(in_dir)
    phrases = label_phrases(extract_labels(fx_dfs["triples"]))
    m = stream_mentions(stream_pages(spark, in_dir), phrases)
    counts = stream_mention_counts(m)
    assert counts.isStreaming
    assert set(counts.columns) == {"window_start", "window_end", "uri", "n_mentions"}


def test_stateful_milestones_accumulate_across_batches(spark, fx_dfs, tmp_path):
    from ontology_mapping_spark.streaming.mentions_stream import (
        stream_concept_milestones,
    )

    in_dir = str(tmp_path / "m_in")
    ckpt = str(tmp_path / "m_ckpt")
    phrases = label_phrases(extract_labels(fx_dfs["triples"])).cache()
    # batch ground truth: lifetime totals per concept
    batch = mentions_via_join(extracted_pages(fx_dfs["pages"]), phrases)
    totals = {
        r["uri"]: r["t"]
        for r in batch.groupBy("uri").agg(F.sum("n_hits").alias("t")).collect()
    }
    # stream the same pages in 4 single-file microbatches so state must
    # carry across triggers (maxFilesPerTrigger=4 in stream_pages, so use
    # 8 files to force >= 2 batches)
    fx_dfs["pages"].repartition(8).write.parquet(in_dir)
    m = stream_mentions(stream_pages(spark, in_dir), phrases)
    out = stream_concept_milestones(m, milestones=(1, 5, 20))
    q = (
        out.writeStream.format("memory")
        .queryName("milestones")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("select * from milestones").collect()
    got = {(r["uri"], r["milestone"]) for r in rows}
    want = {
        (uri, m)
        for uri, t in totals.items()
        for m in (1, 5, 20)
        if t >= m
    }
    assert got == want and len(want) > 0
    # each milestone fires exactly once (state, not per-batch recompute)
    assert len(rows) == len(got)


def test_stream_parity_gate_query(spark):
    """The mentions_stream_parity catalog entry (availableNow stream over a
    synthesized web_pages drop) must emit exactly the batch
    mentions_join_scan result set — they share one SQL oracle at the
    driver, so pin the equality locally too."""
    from ontology_mapping_spark import queries as q

    sf = "/root/testdata/sf0.001"
    reg = q.registry()
    got = {tuple(r) for r in reg["mentions_stream_parity"](spark, sf).collect()}
    want = {tuple(r) for r in reg["mentions_join_scan"](spark, sf).collect()}
    assert got == want and len(got) > 0


def test_stream_relations_equals_batch(spark, fx_dfs, tmp_path):
    """Stateless streaming relation extraction == the batch aggregate:
    per-(subj, pred, obj) triple counts over the same pages drop must be
    identical (the two share typed_triples_expr; the streaming mention
    scan is the within-row vocabulary literal form)."""
    from ontology_mapping_spark.operators.relations import (
        fold_sentence,
        pattern_relations,
        sentence_mentions,
        split_sentences,
    )
    from ontology_mapping_spark.streaming.relations_stream import (
        stream_relation_counts,
        stream_relation_triples,
    )

    in_dir = str(tmp_path / "rel_in")
    ckpt = str(tmp_path / "rel_ckpt")
    fx_dfs["pages"].repartition(4).write.parquet(in_dir)
    phrases = (
        label_phrases(extract_labels(fx_dfs["triples"]))
        .select("uri", fold_sentence("phrase").alias("phrase"))
        .cache()
    )

    rel = stream_relation_triples(stream_pages(spark, in_dir), phrases)
    assert rel.isStreaming
    q = (
        rel.writeStream.format("memory")
        .queryName("rel_triples")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["subj"], r["pred"], r["obj"]): r["n"]
        for r in spark.sql(
            "select subj, pred, obj, count(*) n from rel_triples"
            " group by subj, pred, obj"
        ).collect()
    }
    batch_pages = extracted_pages(fx_dfs["pages"]).select("url", "text")
    batch = pattern_relations(
        sentence_mentions(split_sentences(batch_pages), phrases)
    )
    want = {(r["subj"], r["pred"], r["obj"]): r["n"] for r in batch.collect()}
    assert got == want and len(want) > 0
    # windowed-count form compiles streaming and keeps the triple key
    counts = stream_relation_counts(rel)
    assert counts.isStreaming
    assert {"subj", "pred", "obj", "n"} <= set(counts.columns)


# --------------------------------------------------------------------------
# streaming KG state upsert (continuous construction; batch==stream merge)
# --------------------------------------------------------------------------

def test_stream_upsert_equals_batch_merge(spark, tmp_path):
    import datetime as dt

    from ontology_mapping_spark.operators.kgmaint import upsert_observations
    from ontology_mapping_spark.streaming.kg_state_stream import (
        merged_batch_id,
        stream_observations,
        stream_upsert_kg_state,
    )

    TS = dt.datetime
    obs_dir = str(tmp_path / "obs")
    rows = [
        ("a", "p", "b", TS(2024, 1, 1)),
        ("a", "p", "b", TS(2024, 1, 2)),
        ("c", "p", "d", TS(2024, 1, 3)),
        ("a", "p", "b", TS(2024, 2, 1)),
        ("e", "p", "f", TS(2024, 2, 2)),
        ("c", "p", "d", TS(2024, 2, 3)),
    ]
    all_obs = spark.createDataFrame(
        rows, "subject string, predicate string, object string, ts timestamp"
    )
    # one file per observation -> maxFilesPerTrigger=2 forces 3 microbatches
    for i, r in enumerate(rows):
        spark.createDataFrame(
            [r], "subject string, predicate string, object string, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(f"{obs_dir}/f{i}")
    # the file-stream source lists leaf files; point it at the glob
    state = str(tmp_path / "state")
    q = stream_upsert_kg_state(
        stream_observations(spark, f"{obs_dir}/f*", max_files_per_trigger=2),
        state,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = {
        (r["subject"], r["object"]): (str(r["first_seen"]), str(r["last_seen"]), r["support"])
        for r in spark.read.parquet(state).collect()
    }
    # reference: the SAME observations merged in one batch
    ref_state = str(tmp_path / "ref_state")
    upsert_observations(spark, ref_state, all_obs)
    want = {
        (r["subject"], r["object"]): (str(r["first_seen"]), str(r["last_seen"]), r["support"])
        for r in spark.read.parquet(ref_state).collect()
    }
    assert got == want
    assert got[("a", "b")][2] == 3  # support accumulated across batches

    # exactly-once: the commit marker rides in the state dir, and a
    # replayed (stale) batch id is a no-op
    last = merged_batch_id(state)
    assert last is not None and last >= 1
    from ontology_mapping_spark.operators.kgmaint import merge_triples  # noqa: F401
    before = got
    # rerun the whole stream on the same checkpoint: no new files -> no
    # batches -> state unchanged
    q2 = stream_upsert_kg_state(
        stream_observations(spark, f"{obs_dir}/f*", max_files_per_trigger=2),
        state,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    after = {
        (r["subject"], r["object"]): (str(r["first_seen"]), str(r["last_seen"]), r["support"])
        for r in spark.read.parquet(state).collect()
    }
    assert after == before


def test_fresh_checkpoint_restart_is_not_mistaken_for_replay(spark, tmp_path):
    """Batch ids restart at 0 under a new checkpointLocation; the replay
    guard is scoped to the checkpoint that wrote the marker, so a
    reprocess with a fresh checkpoint must merge its batches, not skip
    them as 'already seen'."""
    import datetime as dt

    from ontology_mapping_spark.streaming.kg_state_stream import (
        merged_batch_id,
        stream_observations,
        stream_upsert_kg_state,
    )

    TS = dt.datetime
    state = str(tmp_path / "state")

    def _run(obs_dir: str, rows, ckpt: str):
        for i, r in enumerate(rows):
            spark.createDataFrame(
                [r],
                "subject string, predicate string, object string, ts timestamp",
            ).coalesce(1).write.mode("overwrite").parquet(f"{obs_dir}/f{i}")
        q = stream_upsert_kg_state(
            stream_observations(spark, f"{obs_dir}/f*", max_files_per_trigger=1),
            state,
            ckpt,
        )
        q.awaitTermination(120)

    _run(
        str(tmp_path / "obs1"),
        [("a", "p", "b", TS(2024, 1, 1)), ("c", "p", "d", TS(2024, 1, 2))],
        str(tmp_path / "ckpt1"),
    )
    assert merged_batch_id(state) is not None  # marker exists (raw read)
    # NEW data, NEW checkpoint: micro-batch ids restart at 0 — the old
    # guard (id <= recorded id) would silently drop this batch
    _run(
        str(tmp_path / "obs2"),
        [("x", "p", "y", TS(2024, 2, 1))],
        str(tmp_path / "ckpt2"),
    )
    got = {
        (r["subject"], r["object"]): r["support"]
        for r in spark.read.parquet(state).collect()
    }
    assert ("x", "y") in got, "fresh-checkpoint batch was wrongly skipped"
    assert got == {("a", "b"): 1, ("c", "d"): 1, ("x", "y"): 1}
    # the guard is scoped: the marker answers for its own checkpoint only
    assert merged_batch_id(state, str(tmp_path / "ckpt2")) == 0
    assert merged_batch_id(state, str(tmp_path / "ckpt1")) is None


def test_stream_entail_equals_one_shot_saturate(spark, tmp_path):
    """The saturated-KG stream (saturate_incremental per micro-batch,
    atomic swap + replay guard) converges to the same fixpoint as one-shot
    saturation over all observations."""
    import datetime as dt

    from ontology_mapping_spark.operators.kginfer import rdfs_rules, saturate
    from ontology_mapping_spark.streaming.kg_state_stream import (
        stream_entail_kg_state,
        stream_observations,
    )

    TS = dt.datetime
    rows = [
        # batch-shaped arrival: hierarchy first, then instances, then a
        # late subtree that extends existing chains
        ("b", "subClassOf", "a", TS(2024, 1, 1)),
        ("c", "subClassOf", "a", TS(2024, 1, 1)),
        ("d", "subClassOf", "b", TS(2024, 1, 2)),
        ("x1", "type", "d", TS(2024, 1, 3)),
        ("x2", "type", "c", TS(2024, 1, 3)),
        ("e", "subClassOf", "d", TS(2024, 2, 1)),
        ("x3", "type", "e", TS(2024, 2, 2)),
    ]
    obs_dir = str(tmp_path / "obs")
    for i, r in enumerate(rows):
        spark.createDataFrame(
            [r], "subject string, predicate string, object string, ts timestamp"
        ).coalesce(1).write.mode("overwrite").parquet(f"{obs_dir}/f{i}")
    state = str(tmp_path / "sat_state")
    rules = rdfs_rules(sub_class="subClassOf", rdf_type="type")
    q = stream_entail_kg_state(
        stream_observations(spark, f"{obs_dir}/f*", max_files_per_trigger=2),
        state,
        str(tmp_path / "ckpt"),
        rules,
    )
    q.awaitTermination(180)
    got = {
        (r["subject"], r["predicate"], r["object"])
        for r in spark.read.parquet(state).collect()
    }
    all_triples = spark.createDataFrame(
        [(s, p, o) for s, p, o, _ in rows],
        "subject string, predicate string, object string",
    )
    want = {
        (r["subject"], r["predicate"], r["object"])
        for r in saturate(all_triples, rules).collect()
    }
    assert got == want
    # the late chain crossed batches: x3 inherits the whole ancestor line
    assert {("x3", "type", c) for c in ("e", "d", "b", "a")} <= got
    # re-running the drained stream on the same checkpoint is a no-op
    q2 = stream_entail_kg_state(
        stream_observations(spark, f"{obs_dir}/f*", max_files_per_trigger=2),
        state,
        str(tmp_path / "ckpt"),
        rules,
    )
    q2.awaitTermination(180)
    got2 = {
        (r["subject"], r["predicate"], r["object"])
        for r in spark.read.parquet(state).collect()
    }
    assert got2 == got


def test_stream_upsert_per_row_guard_survives_marker_loss(spark, tmp_path):
    """The streaming sink also passes a lineage-scoped batch_id down to
    merge_triples' per-ROW guard, so a state restored from a raw copy
    WITHOUT its _commit.json marker still cannot double-count support
    when the last batch is re-merged (the marker is the first guard;
    this is the second)."""
    import datetime as dt
    import os

    from ontology_mapping_spark.operators.kgmaint import upsert_observations
    from ontology_mapping_spark.streaming.kg_state_stream import (
        stream_observations,
        stream_upsert_kg_state,
    )

    TS = dt.datetime
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    obs_dir = str(tmp_path / "obs")
    rows = [("a", "p", "b", TS(2024, 1, 1)), ("a", "p", "b", TS(2024, 1, 2))]
    spark.createDataFrame(
        rows, "subject string, predicate string, object string, ts timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(f"{obs_dir}/f0")
    q = stream_upsert_kg_state(
        stream_observations(spark, f"{obs_dir}/f*", max_files_per_trigger=1),
        state,
        ckpt,
    )
    q.awaitTermination(120)
    got = {
        (r["subject"], r["object"]): (r["support"], r["last_batch_id"])
        for r in spark.read.parquet(state).collect()
    }
    lineage_id = f"{os.path.realpath(ckpt)}#0"
    assert got == {("a", "b"): (2, lineage_id)}
    # lose the marker (raw-copy restore), replay the same batch through
    # the same merge core with the sink's lineage-scoped id: no-op
    os.remove(os.path.join(state, "_commit.json"))
    batch = spark.createDataFrame(
        rows, "subject string, predicate string, object string, ts timestamp"
    )
    upsert_observations(spark, state, batch, batch_id=lineage_id)
    after = {
        (r["subject"], r["object"]): r["support"]
        for r in spark.read.parquet(state).collect()
    }
    assert after == {("a", "b"): 2}, "replayed batch double-counted support"
