"""KG maintenance: recrawl dedup, provenance upsert, snapshot diff.

Semantics pinned on hand-computed cases plus the plan-shape guarantees
(struct-max aggregate, not a window sort; single full-outer join).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.kgmaint import (
    latest_captures,
    merge_triples,
    triple_diff,
)

D = dt.date


@pytest.fixture(scope="module")
def captures(spark):
    rows = [
        ("u1", D(2024, 1, 1), "old"),
        ("u1", D(2024, 3, 1), "new"),
        ("u2", D(2024, 2, 2), "only"),
        # u3: timestamp tie -> tie_cols must decide
        ("u3", D(2024, 5, 5), "a"),
        ("u3", D(2024, 5, 5), "b"),
    ]
    return spark.createDataFrame(rows, "url string, warc_ts date, body string")


def test_latest_capture_wins(captures):
    got = {r["url"]: (r["warc_ts"], r["body"])
           for r in latest_captures(captures, tie_cols=["body"]).collect()}
    assert got == {
        "u1": (D(2024, 3, 1), "new"),
        "u2": (D(2024, 2, 2), "only"),
        "u3": (D(2024, 5, 5), "b"),  # tie broken by body DESC
    }


def test_latest_capture_deterministic_without_tie_cols(captures):
    # no explicit tie columns: the payload-hash tie-break is deterministic,
    # so repeated runs agree with themselves
    a = latest_captures(captures).collect()
    b = latest_captures(captures).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) == 3


def test_latest_capture_plan_is_aggregate_not_window(captures):
    plan = (
        latest_captures(captures)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan


def test_latest_capture_unknown_column_raises(captures):
    with pytest.raises(ValueError, match="not in frame"):
        latest_captures(captures, tie_cols=["nope"])


@pytest.fixture(scope="module")
def kg(spark):
    rows = [
        ("a", "broader", "b", D(2024, 1, 1), D(2024, 2, 1), 3),
        ("c", "broader", "d", D(2024, 1, 5), D(2024, 1, 5), 1),
    ]
    return spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, "
        "first_seen date, last_seen date, support long",
    )


@pytest.fixture(scope="module")
def delta(spark):
    rows = [
        # re-observes (a, broader, b) twice
        ("a", "broader", "b", D(2024, 3, 1)),
        ("a", "broader", "b", D(2024, 3, 9)),
        # brand-new triple, observed once
        ("x", "label", "why", D(2024, 3, 2)),
    ]
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string, ts date"
    )


def test_merge_triples_cases(kg, delta):
    got = {
        (r["subject"], r["predicate"], r["object"]): (
            r["first_seen"], r["last_seen"], r["support"])
        for r in merge_triples(kg, delta).collect()
    }
    assert got == {
        # re-observed: first_seen kept, last_seen extended, support += 2
        ("a", "broader", "b"): (D(2024, 1, 1), D(2024, 3, 9), 5),
        # untouched: unchanged
        ("c", "broader", "d"): (D(2024, 1, 5), D(2024, 1, 5), 1),
        # new: delta's own min/max/count
        ("x", "label", "why"): (D(2024, 3, 2), D(2024, 3, 2), 1),
    }


def test_merge_triples_idempotent_timestamps(kg, delta):
    once = merge_triples(kg, delta)
    twice = merge_triples(once, delta)
    row = {
        (r["subject"], r["predicate"], r["object"]): r
        for r in twice.collect()
    }[("a", "broader", "b")]
    # same first/last either way; support doubles the delta contribution
    assert (row["first_seen"], row["last_seen"]) == (D(2024, 1, 1), D(2024, 3, 9))
    assert row["support"] == 7


def test_merge_output_schema_matches_existing(kg, delta):
    assert merge_triples(kg, delta).columns == kg.columns


def test_triple_diff(spark, kg):
    new = spark.createDataFrame(
        [
            ("a", "broader", "b"),   # kept
            ("x", "label", "why"),   # added
            ("x", "label", "why"),   # duplicate row must not duplicate diff
        ],
        "subject string, predicate string, object string",
    )
    got = {
        (r["subject"], r["predicate"], r["object"]): r["status"]
        for r in triple_diff(kg, new).collect()
    }
    assert got == {
        ("a", "broader", "b"): "kept",
        ("c", "broader", "d"): "removed",
        ("x", "label", "why"): "added",
    }
    assert triple_diff(kg, new).count() == 3


def test_update_kg_state_two_crawls(spark, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.submit_pipeline import update_kg_state

    state = str(tmp_path / "kg_state")
    crawl1 = spark.createDataFrame(
        [("a", "p", "b"), ("a", "p", "b"), ("c", "p", "d")],
        "subject string, predicate string, object string",
    )
    n1 = update_kg_state(spark, state, crawl1, "2024-01-01 00:00:00")
    assert n1 == 2  # distinct triples; duplicate observation folds in
    crawl2 = spark.createDataFrame(
        [("a", "p", "b"), ("x", "p", "y")],
        "subject string, predicate string, object string",
    )
    n2 = update_kg_state(spark, state, crawl2, "2024-02-01 00:00:00")
    assert n2 == 3
    got = {
        (r["subject"], r["object"]): (
            str(r["first_seen"]), str(r["last_seen"]), r["support"])
        for r in spark.read.parquet(state).collect()
    }
    assert got[("a", "b")] == ("2024-01-01 00:00:00", "2024-02-01 00:00:00", 3)
    assert got[("c", "d")] == ("2024-01-01 00:00:00", "2024-01-01 00:00:00", 1)
    assert got[("x", "y")] == ("2024-02-01 00:00:00", "2024-02-01 00:00:00", 1)
    # previous state kept as rollback
    prev = {
        (r["subject"], r["object"]) for r in spark.read.parquet(state + ".prev").collect()
    }
    assert prev == {("a", "b"), ("c", "d")}


def test_merge_triples_plan_single_shuffle_join(kg, delta):
    plan = (
        merge_triples(kg, delta)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin"
    )
    assert joins == 1, plan  # ONE join on the triple key, nothing else
    # delta observation counts combine map-side before the shuffle
    assert "partial_min" in plan or "partial_count" in plan, plan


def test_bucketed_state_merge_shuffles_only_the_delta(spark, kg, delta, tmp_path):
    # the SCALING.md claim: with the state table bucketed by the triple
    # key, the provenance merge shuffles ONLY the crawl-sized delta — the
    # state side is read pre-partitioned (no Exchange above its scan)
    spark.sql("DROP TABLE IF EXISTS kg_state_bucketed")
    (
        kg.write.mode("overwrite")
        .bucketBy(8, "subject", "predicate", "object")
        .sortBy("subject", "predicate", "object")
        .saveAsTable("kg_state_bucketed")
    )
    try:
        state = spark.table("kg_state_bucketed")
        plan = (
            merge_triples(state, delta)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly ONE Exchange in the whole merge — the delta's
        # pre-aggregation shuffle; the bucketed state scan feeds the join
        # through a Sort alone
        assert plan.count("Exchange") == 1, plan
        assert "Bucketed: true" in plan, plan
        # and the join is still exactly one
        joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
        assert joins == 1, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS kg_state_bucketed")


# --------------------------------------------------------------------------
# batch-replay guard (optional last_batch_id column / merged_batch marker)
# --------------------------------------------------------------------------

def test_merge_triples_batch_id_replay_noop(kg, delta):
    once = merge_triples(kg, delta, batch_id="b1")
    assert "last_batch_id" in once.columns
    # re-merging the SAME batch over the guarded result changes nothing —
    # the crashed-driver-loop replay can no longer inflate support
    twice = merge_triples(once, delta, batch_id="b1")
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )
    # the hazard the guard closes: unguarded replay doubles support
    unguarded = merge_triples(merge_triples(kg, delta), delta)
    sup = {(r.subject, r.object): r.support for r in unguarded.collect()}
    assert sup[("a", "b")] == 3 + 2 + 2


def test_merge_triples_new_batch_still_applies(kg, delta):
    once = merge_triples(kg, delta, batch_id="b1")
    again = merge_triples(once, delta, batch_id="b2")
    got = {
        (r.subject, r.object): (r.support, r.last_batch_id)
        for r in again.collect()
    }
    assert got[("a", "b")] == (3 + 2 + 2, "b2")
    assert got[("c", "d")] == (1, None)  # untouched rows keep NULL
    assert got[("x", "why")] == (1 + 1, "b2")


def test_unguarded_merge_nulls_the_guard_column(kg, delta):
    # an unguarded merge over a guarded state NULLs last_batch_id on the
    # rows it touches — a later replay of b1 must not mistake the
    # unguarded change for its own and skip
    once = merge_triples(kg, delta, batch_id="b1")
    mixed = merge_triples(once, delta)
    lb = {(r.subject, r.object): r.last_batch_id for r in mixed.collect()}
    assert lb[("a", "b")] is None  # touched by the unguarded merge
    assert lb[("x", "why")] is None
    assert lb[("c", "d")] is None  # never touched, never guarded


# --------------------------------------------------------------------------
# swap-crash recovery + commit-marker merge semantics
# --------------------------------------------------------------------------

def _obs(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object string, ts timestamp"
    )


def test_crash_between_renames_rolls_forward(spark, tmp_path):
    """A kill between rename(state, prev) and rename(next, state) must not
    reset the KG: .next was fully committed (data + marker) before any
    rename, so recovery promotes it and the replayed batch is a no-op."""
    import json
    import os

    from ontology_mapping_spark.operators.kgmaint import (
        recover_state,
        upsert_observations,
    )

    state = str(tmp_path / "state")
    T = dt.datetime
    upsert_observations(
        spark, state, _obs(spark, [("a", "p", "b", T(2024, 1, 1))]),
        commit_meta={"batch_id": 0},
    )
    upsert_observations(
        spark, state, _obs(spark, [("c", "p", "d", T(2024, 2, 1))]),
        commit_meta={"batch_id": 1},
    )
    # reconstruct the exact crash window: live dir missing, old state at
    # .prev (left by the merge), committed new state at .next
    os.rename(state, state + ".next")
    assert os.path.isdir(state + ".prev") and not os.path.isdir(state)

    recover_state(state)
    got = {
        (r["subject"], r["object"]) for r in spark.read.parquet(state).collect()
    }
    assert got == {("a", "b"), ("c", "d")}  # NOT reset to empty/prev-only
    with open(os.path.join(state, "_commit.json")) as f:
        assert json.load(f)["batch_id"] == 1  # marker survived the window

    # a replay of batch 1 through the upsert path must not double support
    n = upsert_observations(
        spark, state, _obs(spark, [("e", "p", "f", T(2024, 3, 1))]),
        commit_meta={"batch_id": 2},
    )
    assert n == 3


def test_partial_first_write_is_dropped(spark, tmp_path):
    """A first-batch write that died mid-write (no .prev, no live state)
    leaves a partial .next — recovery discards it and the merge restarts
    from empty instead of promoting torn parquet."""
    import os

    from ontology_mapping_spark.operators.kgmaint import (
        recover_state,
        upsert_observations,
    )

    state = str(tmp_path / "state")
    os.makedirs(state + ".next")
    with open(os.path.join(state + ".next", "part-torn.parquet"), "wb") as f:
        f.write(b"\x00garbage")
    recover_state(state)
    assert not os.path.isdir(state) and not os.path.isdir(state + ".next")
    n = upsert_observations(
        spark, state, _obs(spark, [("a", "p", "b", dt.datetime(2024, 1, 1))])
    )
    assert n == 1


def test_commit_meta_merges_instead_of_clobbering(spark, tmp_path):
    """A batch crawl stamping crawl_ts must not erase the streaming replay
    guard's batch_id, and commit_meta=None carries the marker forward."""
    import json
    import os

    from ontology_mapping_spark.operators.kgmaint import upsert_observations

    state = str(tmp_path / "state")
    T = dt.datetime
    upsert_observations(
        spark, state, _obs(spark, [("a", "p", "b", T(2024, 1, 1))]),
        commit_meta={"batch_id": 6, "checkpoint": "/ck1"},
    )
    upsert_observations(
        spark, state, _obs(spark, [("c", "p", "d", T(2024, 2, 1))]),
        commit_meta={"crawl_ts": "2024-02-01"},
    )
    with open(os.path.join(state, "_commit.json")) as f:
        meta = json.load(f)
    assert meta == {
        "batch_id": 6, "checkpoint": "/ck1", "crawl_ts": "2024-02-01"
    }
    upsert_observations(
        spark, state, _obs(spark, [("e", "p", "f", T(2024, 3, 1))])
    )
    with open(os.path.join(state, "_commit.json")) as f:
        assert json.load(f) == meta  # None carries the marker forward


def test_as_of_window_semantics(spark):
    from ontology_mapping_spark.operators.kgmaint import as_of

    state = spark.createDataFrame(
        [
            ("a", "p", "b", "2024-01-01", "2024-03-01"),  # covers Feb
            ("c", "p", "d", "2024-02-15", "2024-02-20"),  # starts after
            ("e", "p", "f", "2024-01-01", "2024-01-31"),  # gone by Feb 10
        ],
        "subject string, predicate string, object string, fs string, ls string",
    ).select(
        "subject", "predicate", "object",
        F.to_date("fs").alias("first_seen"), F.to_date("ls").alias("last_seen"),
    )
    got = {r["subject"] for r in as_of(state, "2024-02-10").collect()}
    assert got == {"a"}
    # boundary days are inclusive on both ends
    assert {r["subject"] for r in as_of(state, "2024-02-15").collect()} == {"a", "c"}
    assert {r["subject"] for r in as_of(state, "2024-01-31").collect()} == {"a", "e"}


# --------------------------------------------------------------------------
# bucketed state lifecycle: sticky layout + whole-batch replay no-op
# --------------------------------------------------------------------------

def test_upsert_bucketed_state_sticky_and_replay_noop(spark, tmp_path):
    import json
    import os

    from ontology_mapping_spark.operators.kgmaint import (
        read_state,
        upsert_observations,
    )

    state = str(tmp_path / "kg_state_bkt")
    ts = dt.datetime
    obs1 = _obs(spark, [
        ("a", "p", "b", ts(2024, 1, 1)),
        ("a", "p", "b", ts(2024, 1, 2)),
        ("c", "p", "d", ts(2024, 1, 1)),
    ])
    n1 = upsert_observations(spark, state, obs1, batch_id="c1", buckets=8)
    assert n1 == 2
    # whole-batch replay: the marker short-circuit leaves the state alone
    n1b = upsert_observations(spark, state, obs1, batch_id="c1", buckets=8)
    assert n1b == 2
    sup = {
        (r.subject, r.object): r.support
        for r in spark.read.parquet(state).collect()
    }
    assert sup == {("a", "b"): 2, ("c", "d"): 1}
    # the bucketed layout is real: a merge against read_state's frame
    # scans the state pre-partitioned (Bucketed: true) and shuffles ONLY
    # the delta — exactly one Exchange in the whole plan
    obs2 = _obs(spark, [("a", "p", "b", ts(2024, 2, 1))])
    plan = (
        merge_triples(read_state(spark, state), obs2, batch_id="c2")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Bucketed: true" in plan, plan
    assert plan.count("Exchange") == 1, plan
    # sticky: the second crawl does NOT pass buckets= and still inherits
    # the layout from the commit marker
    n2 = upsert_observations(spark, state, obs2, batch_id="c2")
    assert n2 == 2
    meta = json.load(open(os.path.join(state, "_commit.json")))
    assert meta["buckets"] == 8
    assert meta["merged_batch"] == "c2"
    # (a bare scan hides bucket info when unused — autoBucketedScan —
    # so the layout is asserted through a merge plan again)
    obs3 = _obs(spark, [("c", "p", "d", ts(2024, 3, 1))])
    plan2 = (
        merge_triples(read_state(spark, state), obs3, batch_id="c3")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Bucketed: true" in plan2, plan2
    assert plan2.count("Exchange") == 1, plan2
    sup2 = {
        (r.subject, r.object): r.support
        for r in spark.read.parquet(state).collect()
    }
    assert sup2[("a", "b")] == 3


def test_predicate_stats_recorded_in_marker(spark, tmp_path):
    """record_predicate_stats=True commits per-predicate counts of the
    NEW state atomically with the data; state_predicate_stats reads them
    back; a stats-less rewrite invalidates rather than carrying stale
    counts; and the recorded dict equals kgquery.predicate_stats over
    the same state."""
    import datetime as _dt

    from ontology_mapping_spark.operators.kgmaint import (
        state_predicate_stats,
        upsert_observations,
    )
    from ontology_mapping_spark.operators.kgquery import predicate_stats

    def ts(*a):
        return _dt.datetime(*a)

    state = str(tmp_path / "state")
    obs1 = _obs(
        spark,
        [
            ("a", "type", "c", ts(2024, 1, 1)),
            ("b", "type", "c", ts(2024, 1, 1)),
            ("a", "rare", "x", ts(2024, 1, 1)),
        ],
    )
    upsert_observations(
        spark, state, obs1, batch_id="c1", record_predicate_stats=True
    )
    assert state_predicate_stats(state) == {"type": 2, "rare": 1}
    # a second crawl refreshes the counts to describe the merged state
    obs2 = _obs(
        spark,
        [
            ("c", "type", "d", ts(2024, 2, 1)),
            ("a", "type", "c", ts(2024, 2, 1)),  # existing: support only
        ],
    )
    upsert_observations(
        spark, state, obs2, batch_id="c2", record_predicate_stats=True
    )
    got = state_predicate_stats(state)
    assert got == {"type": 3, "rare": 1}
    assert got == predicate_stats(spark.read.parquet(state))
    # a stats-less rewrite must drop the (now-unverifiable) counts
    obs3 = _obs(spark, [("z", "other", "w", ts(2024, 3, 1))])
    upsert_observations(spark, state, obs3, batch_id="c3")
    assert state_predicate_stats(state) is None


def test_predicate_stats_corrupt_marker_degrades_to_none(spark, tmp_path):
    """Stats are advisory: a corrupt/truncated _commit.json (e.g. a
    half-written copy made outside the engine) must degrade to None —
    legacy join ordering — never raise into the query path (the
    kg_query --stats auto default reads it on every invocation)."""
    import datetime as _dt
    import os

    from ontology_mapping_spark.operators.kgmaint import (
        state_predicate_stats,
        upsert_observations,
    )

    state = str(tmp_path / "state")
    obs = _obs(
        spark, [("a", "type", "c", _dt.datetime(2024, 1, 1))]
    )
    upsert_observations(
        spark, state, obs, batch_id="c1", record_predicate_stats=True
    )
    assert state_predicate_stats(state) == {"type": 1}
    marker = os.path.join(state, "_commit.json")
    with open(marker, "w") as f:
        f.write('{"predicate_stats": {"type"')  # truncated mid-write
    assert state_predicate_stats(state) is None
