"""Continuous KG construction: stream observed triples into the
provenance-carrying state table.

The batch path merges one crawl at a time (tools/submit_pipeline.py
--kg-state); this module is its streaming twin — observations arrive as a
file stream and each micro-batch is upserted through the SAME
``kgmaint.upsert_observations`` core, so batch and streaming state tables
cannot drift semantically.

Exactly-once: Structured Streaming replays the last uncommitted batch
after a restart, and a replayed merge would double ``support``. The sink
therefore records the merged ``batch_id`` in ``_commit.json`` INSIDE the
state directory via ``upsert_observations(commit_meta=...)`` — the marker
is written into ``<path>.next`` before the rename, so "which batch is in
this state" commits atomically with the data, and a replayed batch id is
skipped by comparing against it. The marker also records WHICH checkpoint
wrote it: batch ids restart from 0 under a fresh checkpointLocation, so
the guard only fires within the same checkpoint lineage. (The
checkpoint's own WAL dedups file *inputs*; the marker dedups the *merge
side effect*.)

State-table compaction cadence: each merge rewrites the state table, so a
per-microbatch merge is right when batches are crawl-segment-sized. For
high-frequency streams, land observations with a plain append sink and
run the merge on a timer — the marker logic is unchanged.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

OBSERVATION_SCHEMA = T.StructType(
    [
        T.StructField("subject", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def stream_observations(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """Parquet file stream of (subject, predicate, object, ts)
    observations; ``max_files_per_trigger`` shapes micro-batch size so an
    availableNow run exercises multiple batches."""
    return (
        spark.readStream.schema(OBSERVATION_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def merged_batch_id(
    state_path: str, checkpoint_dir: str | None = None
) -> int | None:
    """The batch id recorded in the state's atomic commit marker, or None
    for a fresh/batch-built state.

    Micro-batch ids are only meaningful WITHIN one checkpoint lineage: a
    query restarted with a fresh checkpointLocation numbers its batches
    from 0 again, and guarding those against a marker left by an earlier
    lineage would silently drop genuinely new data. Pass the current
    ``checkpoint_dir`` to scope the answer: the recorded id is returned
    only when the marker was written by the same checkpoint; with
    ``checkpoint_dir=None`` the raw recorded id is returned (inspection).

    Checkpoint identity is ``os.path.realpath`` (symlinks resolve to one
    canonical path), but a RELATIVE checkpoint_dir still canonicalizes
    through the driver's cwd — pass absolute paths so a cwd change across
    restarts can't split one lineage into two. A marker that carries a
    batch_id but no checkpoint (written before lineage scoping existed)
    answers for ANY checkpoint: for a pre-existing state the conservative
    reading is "already merged" — skipping a replay is recoverable
    (re-drop the files under a fresh checkpoint), double-merging support
    is not; the next merge upgrades the marker in place.
    """
    from ontology_mapping_spark.operators.kgmaint import recover_state

    # repair the swap crash window FIRST: mid-window the marker is only in
    # .next, and reading "no marker" there would re-merge a committed batch
    recover_state(state_path)
    marker = os.path.join(state_path, "_commit.json")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        meta = json.load(f)
    if (
        checkpoint_dir is not None
        and "checkpoint" in meta
        and meta["checkpoint"] != os.path.realpath(checkpoint_dir)
    ):
        return None
    return meta.get("batch_id")


def stream_upsert_kg_state(
    observations: DataFrame, state_path: str, checkpoint_dir: str
):
    """Wire an observation stream into the KG state table; returns the
    StreamingQuery (caller awaits/stops). availableNow trigger: drains
    what exists and stops — the crawl-segment cadence; swap the trigger
    for a processing-time one for a long-lived query."""
    from ontology_mapping_spark.operators.kgmaint import upsert_observations

    def _sink(batch: DataFrame, batch_id: int) -> None:
        last = merged_batch_id(state_path, checkpoint_dir)
        if last is not None and batch_id <= last:
            return  # replayed batch: its merge already committed
        upsert_observations(
            batch.sparkSession,
            state_path,
            batch,
            # checkpoint identity scopes the replay guard to THIS query
            # lineage; a restart with a fresh checkpoint starts over at
            # batch 0 and must not be mistaken for a replay
            commit_meta={
                "batch_id": batch_id,
                "checkpoint": os.path.realpath(checkpoint_dir),
            },
            # second, per-ROW guard (merge_triples last_batch_id),
            # lineage-scoped so batch 0 of a NEW checkpoint never
            # collides with batch 0 of an old one: a state restored
            # from a raw copy WITHOUT its marker still cannot
            # double-count support on an immediate replay
            batch_id=f"{os.path.realpath(checkpoint_dir)}#{batch_id}",
            return_count=False,  # per-batch full state re-scan, discarded
        )

    return (
        observations.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_entail_kg_state(
    observations: DataFrame,
    state_path: str,
    checkpoint_dir: str,
    rules,
):
    """Continuously materialize the SATURATED KG: each micro-batch of
    observed triples is folded into the inference fixpoint at
    ``state_path`` via ``kginfer.saturate_incremental`` — only the new
    facts' consequences are derived, so per-batch cost tracks the crawl
    delta, not the accumulated graph (2-4x paired vs re-saturating at a
    2% delta; tools/stress_kginfer.py). The first batch cold-saturates.

    Exactly-once and crash safety are the provenance sink's machinery
    reused verbatim: the saturated set swaps in atomically with the
    batch-id marker (``kgmaint.swap_saturated_state``), replays are
    skipped within the same checkpoint lineage (``merged_batch_id``), and
    ``recover_state`` rolls the swap window forward. State schema is the
    plain distinct (subject, predicate, object) — directly queryable by
    the kgquery layer; parity with one-shot ``saturate`` over all
    observations is the gate row (kg_entail_stream_parity).
    """
    from ontology_mapping_spark.operators.kgmaint import (
        swap_saturated_state,
    )
    from ontology_mapping_spark.operators.kginfer import (
        saturate,
        saturate_incremental,
    )

    def _sink(batch: DataFrame, batch_id: int) -> None:
        last = merged_batch_id(state_path, checkpoint_dir)
        if last is not None and batch_id <= last:
            return  # replayed batch: its saturation already committed
        spark = batch.sparkSession
        triples = batch.select("subject", "predicate", "object")
        if os.path.isdir(state_path):
            current = spark.read.parquet(state_path).select(
                "subject", "predicate", "object"
            )
            # the state is this sink's own saturate output — distinct by
            # construction, so skip the per-batch full-graph dedup
            sat = saturate_incremental(
                current, triples, rules, assume_distinct=True
            )
        else:
            sat = saturate(triples, rules)
        swap_saturated_state(
            state_path,
            sat,
            commit_meta={
                "batch_id": batch_id,
                "checkpoint": os.path.realpath(checkpoint_dir),
            },
        )

    return (
        observations.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
