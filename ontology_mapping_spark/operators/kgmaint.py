"""KG maintenance: recrawl dedup, triple upsert, snapshot diff.

A Common-Crawl-style corpus is not static — every crawl re-captures pages
and the KG built from it must be maintainable, not rebuilt from zero. The
reference builds its artifact once (thesis/main.py runs end-to-end and
writes a final frame); at 10^12 documents the engine instead needs the
three idempotent maintenance primitives this module provides:

* ``latest_captures`` — recrawl semantics: many (url, warc_ts) captures of
  the same page, newest wins. One map-side-combinable ``max(struct)``
  aggregate — NO window sort: a window needs the same shuffle plus a full
  per-partition sort, while the struct-max folds in the combiner, so only
  one reduced row per url crosses the wire.
* ``merge_triples`` — upsert a delta batch of observed triples into the
  provenance-carrying KG table: new triples appear with the batch's
  timestamps, re-observed triples extend ``last_seen`` and accumulate
  ``support``. Delta is pre-aggregated per triple (partial agg), then ONE
  full-outer shuffle join on the triple key. At scale the KG table is
  bucketed by hash(subject, predicate, object) so the merge co-locates
  with the existing layout and only the (much smaller) delta shuffles.
* ``triple_diff`` — added / removed / kept between two KG snapshots, the
  audit primitive behind "what did this crawl change".

Support counts make the KG self-cleaning: downstream consumers threshold
``support`` (a triple seen once in 10^12 pages is noise; one seen 10^4
times is signal), which is the same confidence idea the reference encodes
in its ensemble vote (thesis/main.py:131) re-expressed as data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEY = ["subject", "predicate", "object"]


def latest_captures(
    pages: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Keep the newest capture per ``key_col``; deterministic under ties.

    Ordering is (ts_col DESC, tie_cols DESC, content-hash DESC): callers
    that need an oracle-reproducible tie-break pass explicit ``tie_cols``;
    the trailing xxhash64 over the payload makes the pick deterministic
    even when no tie column is given (two byte-identical captures tie to
    the same row either way).

    Plan shape: ``groupBy(key).agg(max(struct(...)))`` — partial aggregation
    combines map-side, so each url contributes ONE surviving row to the
    shuffle regardless of recrawl count; struct comparison is lexicographic
    so the big payload fields are only compared on full ties.
    """
    bad = [c for c in (key_col, ts_col, *tie_cols) if c not in pages.columns]
    if bad:
        raise ValueError(f"columns not in frame: {bad}")
    payload = [c for c in pages.columns if c != key_col]
    rest = [c for c in payload if c != ts_col and c not in tie_cols]
    content_tie = (
        F.xxhash64(*[F.col(c) for c in rest]) if rest else F.lit(0)
    )
    packed = F.struct(
        F.col(ts_col).alias(ts_col),
        *[F.col(c).alias(c) for c in tie_cols],
        content_tie.alias("__tie"),
        *[F.col(c).alias(c) for c in rest],
    )
    won = pages.groupBy(key_col).agg(F.max(packed).alias("__w"))
    return won.select(
        key_col, *[F.col(f"__w.{c}").alias(c) for c in payload]
    )


def merge_triples(
    existing: DataFrame, delta: DataFrame, batch_id: str | None = None
) -> DataFrame:
    """Upsert observed triples into the provenance-carrying KG table.

    ``existing``: (subject, predicate, object, first_seen, last_seen,
    support) — the KG as of the previous crawl. ``delta``: (subject,
    predicate, object, ts) — one row per OBSERVATION (the same triple may
    appear many times in a batch). Returns the merged table, same schema
    as ``existing``:

    * unseen triple  -> first_seen = min ts, last_seen = max ts,
      support = observation count;
    * re-observed    -> first_seen unchanged, last_seen extended,
      support accumulated;
    * not in delta   -> row unchanged (triples are never dropped here;
      retraction is a policy decision ``triple_diff`` supports upstream).

    Replay guard (``batch_id``): without it, merging the same delta twice
    doubles ``support`` (timestamps re-fix to the same values) — safe only
    when the caller skips completed stages (StageRunner) or carries the
    streaming batch marker. With ``batch_id`` set, the output carries a
    ``last_batch_id`` column and any existing row whose ``last_batch_id``
    equals the current batch passes through UNCHANGED — re-merging an
    already-applied batch is a per-row no-op, so a crashed driver loop
    that re-runs its most recent merge cannot inflate ``support``. The
    guard covers immediate replay (crash-recovery of the LAST batch);
    out-of-order historical replays still need the caller-side marker.
    An existing table without the column reads as all-NULL (never equal
    to a real batch id); an unguarded merge (``batch_id=None``) over a
    guarded table NULLs the column on the rows it touches — honest
    "last toucher unknown", so a later replayed batch never mistakes an
    unguarded change for its own.
    """
    has_col = "last_batch_id" in existing.columns
    d = delta.groupBy(*TRIPLE_KEY).agg(
        F.min("ts").alias("__d_first"),
        F.max("ts").alias("__d_last"),
        F.count(F.lit(1)).cast("long").alias("__d_support"),
    )
    merged = existing.join(d, on=TRIPLE_KEY, how="full_outer")
    if batch_id is None and not has_col:
        return merged.select(
            *TRIPLE_KEY,
            # least/greatest skip NULLs in Spark, so the one-sided rows
            # fall out of the same expressions as the matched rows
            F.least("first_seen", "__d_first").alias("first_seen"),
            F.greatest("last_seen", "__d_last").alias("last_seen"),
            (
                F.coalesce(F.col("support"), F.lit(0))
                + F.coalesce(F.col("__d_support"), F.lit(0))
            )
            .cast("long")
            .alias("support"),
        )
    prev_b = (
        F.col("last_batch_id")
        if has_col
        else F.lit(None).cast("string")
    )
    # eqNullSafe: a NULL last_batch_id (legacy row / unguarded toucher)
    # never matches a real batch id
    already = (
        prev_b.eqNullSafe(F.lit(batch_id))
        if batch_id is not None
        else F.lit(False)
    )
    touched = F.col("__d_support").isNotNull()
    return merged.select(
        *TRIPLE_KEY,
        F.when(already, F.col("first_seen"))
        .otherwise(F.least("first_seen", "__d_first"))
        .alias("first_seen"),
        F.when(already, F.col("last_seen"))
        .otherwise(F.greatest("last_seen", "__d_last"))
        .alias("last_seen"),
        F.when(already, F.col("support"))
        .otherwise(
            F.coalesce(F.col("support"), F.lit(0))
            + F.coalesce(F.col("__d_support"), F.lit(0))
        )
        .cast("long")
        .alias("support"),
        F.when(touched & ~already, F.lit(batch_id).cast("string"))
        .otherwise(prev_b)
        .alias("last_batch_id"),
    )


def as_of(state: DataFrame, ts) -> DataFrame:
    """Point-in-time view of the provenance state: the (subject,
    predicate, object) set whose observation window covers ``ts``
    (``first_seen <= ts <= last_seen``) — "what did the KG hold at crawl
    time t", the temporal-query face of the provenance columns.

    Semantics are deliberately conservative (closed-world on
    OBSERVATIONS): a triple not re-observed after its ``last_seen`` is
    excluded past that point even though absence of observation is not
    deletion evidence — for crawl-cadence states, "observed by a crawl
    covering t" is the honest readable contract, and callers wanting
    open-world persistence can filter on ``first_seen`` alone.

    Plan: a pure Catalyst conjunction — both bounds push to the
    parquet/Iceberg scan and prune row groups on the first_seen /
    last_seen min-max stats, so a historical query reads only the files
    whose window overlaps ``ts``."""
    lo = F.lit(ts).cast(state.schema["first_seen"].dataType)
    hi = F.lit(ts).cast(state.schema["last_seen"].dataType)
    return state.filter(
        (F.col("first_seen") <= lo) & (F.col("last_seen") >= hi)
    ).select(*TRIPLE_KEY)


def triple_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(subject, predicate, object, status) with status in
    {'added', 'removed', 'kept'} — the audit diff between two KG
    snapshots (what did this crawl change?).

    Both sides are reduced to DISTINCT triple keys first (diff is a set
    question; provenance columns are ignored), then one full-outer join on
    the triple key decides the status — the same single-shuffle shape as
    ``merge_triples``, bucket-friendly on the same key.
    """
    o = old.select(*TRIPLE_KEY).distinct().withColumn("__o", F.lit(1))
    n = new.select(*TRIPLE_KEY).distinct().withColumn("__n", F.lit(1))
    return o.join(n, on=TRIPLE_KEY, how="full_outer").select(
        *TRIPLE_KEY,
        F.when(F.col("__o").isNull(), F.lit("added"))
        .when(F.col("__n").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


def recover_state(state_path: str) -> None:
    """Repair the swap's crash window before any read of the state.

    ``upsert_observations`` fully materializes ``<path>.next`` (parquet
    AND the ``_commit.json`` marker) before the first rename, so a crash
    between ``rename(state, prev)`` and ``rename(next, state)`` leaves a
    missing live directory but a *committed* ``.next`` beside the old
    ``.prev`` — roll FORWARD by promoting ``.next``; its marker then makes
    a replay of the same batch a no-op. A missing state with ``.next`` but
    no ``.prev`` is a first-batch write that died mid-write (no rename had
    started), so the partial ``.next`` is dropped and the merge restarts
    from empty. Any leftover ``.next`` beside a live state is a dead
    partial write and is removed. Callers that *read* the marker
    (streaming/kg_state_stream.merged_batch_id) must recover first too,
    or a replayed batch would see "no marker" mid-window and re-merge.
    """
    import os
    import shutil

    nxt = state_path.rstrip("/") + ".next"
    prev = state_path.rstrip("/") + ".prev"
    if not os.path.isdir(state_path):
        if os.path.isdir(prev) and os.path.isdir(nxt):
            os.rename(nxt, state_path)
        elif os.path.isdir(prev):
            os.rename(prev, state_path)
    shutil.rmtree(nxt, ignore_errors=True)


def upsert_observations(
    spark,
    state_path: str,
    observations: DataFrame,
    commit_meta=None,
    return_count: bool = True,
    batch_id: str | None = None,
    buckets: int | None = None,
    record_predicate_stats: bool = False,
) -> int | None:
    """Merge a batch of (subject, predicate, object, ts) observations into
    the provenance-carrying KG state table at ``state_path`` (parquet
    directory); create it on first use. Returns the merged row count, or
    None when ``return_count=False`` (the count is a full re-scan of the
    state — per-micro-batch callers that discard it should opt out).

    Swap discipline: the merge plan reads the OLD state lazily, so the
    merged table is fully materialized to ``<path>.next`` before the old
    directory moves to ``<path>.prev`` (kept as rollback) and the new one
    renames into place; ``recover_state`` repairs the window between the
    two renames. On a real deployment this is the Iceberg table the
    north rule names and the swap is a catalog-atomic replace (StageRunner
    catalog mode, plans/stages.py); the rename pair is the local-filesystem
    equivalent. Shared by the spark-submit --kg-state path
    (tools/submit_pipeline.py) and the streaming foreachBatch sink
    (streaming/kg_state_stream.py).

    ``commit_meta`` MERGES over the existing marker (new keys win, absent
    keys survive), and ``commit_meta=None`` carries the old marker forward
    unchanged — so a batch crawl stamping ``crawl_ts`` can never erase the
    streaming sink's ``batch_id``/``checkpoint`` replay guard.

    ``batch_id`` (optional) is the batch-path replay guard: the id is
    recorded as ``merged_batch`` in the commit marker, and a re-run that
    presents the SAME id against a state whose marker already carries it
    returns without touching the state at all (whole-batch no-op — the
    streaming sink's ``merged_batch_id`` idea moved down into the batch
    primitive). The merge itself also runs with the per-row
    ``last_batch_id`` guard (see ``merge_triples``), so even a state
    whose marker was lost (e.g. restored from a raw copy) cannot double
    ``support`` on an immediate replay.

    ``buckets``: hash-bucket the state by the triple key (see
    ``_swap_in``); the layout is STICKY — once a state is bucketed,
    later upserts that don't pass ``buckets`` inherit the count from
    the commit marker and keep the layout, and the existing side of the
    merge is read through ``read_state`` so its scan is bucketed (the
    full-outer join then shuffles only the delta — plan-pinned in
    tests/test_kgmaint.py).
    """
    import os

    meta = _merged_marker_meta(state_path, commit_meta)
    if buckets is None:
        buckets = (meta or {}).get("buckets")
    if batch_id is not None:
        # the marker read below is POST-overlay (commit_meta keys win),
        # but callers never put "merged_batch" in commit_meta — the id
        # here is always the one the last successful merge stamped
        if (meta or {}).get("merged_batch") == batch_id and os.path.isdir(
            state_path
        ):
            return (
                spark.read.parquet(state_path).count()
                if return_count
                else None
            )
        meta = {**(meta or {}), "merged_batch": batch_id}
    if os.path.isdir(state_path):
        existing = read_state(spark, state_path)
    else:
        # first batch: an empty state with the exact merged schema, derived
        # from the observations so ts/support types can never drift
        existing = (
            observations.groupBy(*TRIPLE_KEY)
            .agg(
                F.min("ts").alias("first_seen"),
                F.max("ts").alias("last_seen"),
                F.count(F.lit(1)).cast("long").alias("support"),
            )
            .limit(0)
        )
    merged = merge_triples(existing, observations, batch_id=batch_id)
    _swap_in(
        state_path,
        merged,
        meta,
        buckets=buckets,
        record_predicate_stats=record_predicate_stats,
    )
    if not return_count:
        return None
    return spark.read.parquet(state_path).count()


def _state_table_name(state_path: str) -> str:
    """Session-catalog name for the bucketed state at ``state_path`` —
    deterministic per path so every reader in a session shares one
    registration."""
    import hashlib
    import os

    h = hashlib.md5(
        os.path.abspath(state_path).encode("utf-8")
    ).hexdigest()[:12]
    return f"kg_state_{h}"


def read_state(spark, state_path: str) -> DataFrame:
    """Read the KG state directory, preserving its bucket layout.

    A state written with ``buckets=N`` carries the bucket spec in its
    commit marker; bucket metadata itself lives in the session CATALOG
    (parquet files only encode the bucket id in their file names), so a
    fresh session must re-register the table before the scan reports
    ``Bucketed: true``. This helper does that re-registration — CREATE
    an external table CLUSTERED BY the triple key over the existing
    files (external: dropping the entry never deletes data) — and
    returns ``spark.table(...)``; a plain (unbucketed) state falls back
    to ``spark.read.parquet``. On a real deployment the persistent
    metastore/Iceberg catalog owns this permanently; the re-register is
    the in-memory-catalog equivalent.
    """
    import json
    import os

    recover_state(state_path)
    marker = os.path.join(state_path, "_commit.json")
    buckets = None
    if os.path.exists(marker):
        with open(marker) as f:
            buckets = json.load(f).get("buckets")
    if not buckets:
        return spark.read.parquet(state_path)
    name = _state_table_name(state_path)
    schema = spark.read.parquet(state_path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    keys = ", ".join(TRIPLE_KEY)
    loc = os.path.abspath(state_path)
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} ({cols}) USING parquet "
        f"CLUSTERED BY ({keys}) SORTED BY ({keys}) "
        f"INTO {int(buckets)} BUCKETS LOCATION '{loc}'"
    )
    return spark.table(name)


def _swap_in(
    state_path: str,
    df: DataFrame,
    meta: dict | None,
    buckets: int | None = None,
    record_predicate_stats: bool = False,
) -> None:
    """The atomic state swap: fully materialize ``df`` to ``<path>.next``
    (marker included), keep the old state at ``<path>.prev`` as rollback,
    rename into place. ``recover_state`` repairs the window between the
    renames. Shared by the provenance upsert above and the saturated-KG
    streaming sink (streaming/kg_state_stream.py).

    ``buckets``: write the state hash-bucketed by the triple key (the
    SCALING.md layout — the next merge's full-outer join then shuffles
    ONLY the delta). Bucketed writes need a catalog entry, so the frame
    goes through a throwaway EXTERNAL table whose LOCATION is ``.next``
    (the entry is dropped right after; external drop keeps the files) —
    the swap stays pure directory renames either way, and the bucket
    count rides in the commit marker for ``read_state`` to re-register.
    """
    import json
    import os
    import shutil

    nxt = state_path.rstrip("/") + ".next"
    prev = state_path.rstrip("/") + ".prev"
    if buckets:
        tmp = _state_table_name(state_path) + "__next"
        spark = df.sparkSession
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        keys = [k for k in TRIPLE_KEY]
        (
            df.write.mode("overwrite")
            .bucketBy(int(buckets), keys[0], *keys[1:])
            .sortBy(keys[0], *keys[1:])
            .option("path", os.path.abspath(nxt))
            .saveAsTable(tmp)
        )
        spark.sql(f"DROP TABLE IF EXISTS {tmp}")
        meta = {**(meta or {}), "buckets": int(buckets)}
    else:
        df.write.mode("overwrite").parquet(nxt)
        if meta and "buckets" in meta:
            # an explicit unbucketed rewrite drops the layout claim —
            # a stale "buckets" key would make read_state register
            # bucket metadata over plain files (wrong answers, silently)
            meta = {k: v for k, v in meta.items() if k != "buckets"}
    if record_predicate_stats:
        # per-predicate counts for statistics-driven BGP join ordering
        # (kgquery.predicate_stats), recomputed from the JUST-WRITTEN
        # files (one bounded partial+final aggregate over the new state;
        # the predicate domain is schema-sized) and committed in the same
        # marker — so the stats can never describe a different state than
        # the directory they sit in
        stats = {
            r["predicate"]: r["count"]
            for r in df.sparkSession.read.parquet(nxt)
            .groupBy("predicate")
            .count()
            .collect()
        }
        meta = {**(meta or {}), "predicate_stats": stats}
    elif meta and "predicate_stats" in meta:
        # a rewrite that did not refresh the stats must not carry stale
        # counts forward as if they described the new state
        meta = {k: v for k, v in meta.items() if k != "predicate_stats"}
    if meta is not None:
        # commit metadata travels INSIDE the swapped directory (underscore
        # files are invisible to the parquet reader), so "which batch is
        # merged" commits atomically with the data — the streaming sink's
        # exactly-once marker (streaming/kg_state_stream.py)
        with open(os.path.join(nxt, "_commit.json"), "w") as f:
            json.dump(meta, f)
    if os.path.isdir(state_path):
        shutil.rmtree(prev, ignore_errors=True)
        os.rename(state_path, prev)
    os.rename(nxt, state_path)


def _merged_marker_meta(state_path: str, commit_meta: dict | None) -> dict | None:
    """Repair the swap window, then merge ``commit_meta`` over the state's
    existing ``_commit.json`` (new keys win, absent keys survive;
    ``commit_meta=None`` carries the old marker forward unchanged) — the
    marker discipline shared by the provenance upsert and the
    saturated-KG sink."""
    import json
    import os

    recover_state(state_path)
    marker = os.path.join(state_path, "_commit.json")
    meta = None
    if os.path.exists(marker):
        with open(marker) as f:
            meta = json.load(f)
    if commit_meta is not None:
        meta = {**(meta or {}), **commit_meta}
    return meta


def swap_saturated_state(
    state_path: str,
    triples: DataFrame,
    commit_meta: dict | None = None,
    record_predicate_stats: bool = False,
) -> None:
    """Replace the saturated-KG state (a plain distinct (subject,
    predicate, object) parquet dir) under the same swap + marker
    discipline as ``upsert_observations`` — the persistence half of the
    streaming entailment sink."""
    _swap_in(
        state_path,
        triples.select(*TRIPLE_KEY),
        _merged_marker_meta(state_path, commit_meta),
        record_predicate_stats=record_predicate_stats,
    )


def state_predicate_stats(state_path: str) -> dict | None:
    """The per-predicate counts recorded in the state's commit marker by
    the last merge/swap that ran with ``record_predicate_stats=True``, or
    None (never recorded, or invalidated by a stats-less rewrite). Feed
    the result to ``kgquery.bgp_*``/``sparql_text.sparql`` as ``stats=``
    for estimated-cardinality join ordering without re-scanning the
    state — the "stored in the state manifest" half of the
    predicate-stats contract (the other half is
    ``kgquery.predicate_stats`` for ad-hoc tables)."""
    import json
    import os

    recover_state(state_path)
    marker = os.path.join(state_path, "_commit.json")
    if not os.path.exists(marker):
        return None
    try:
        with open(marker) as f:
            return json.load(f).get("predicate_stats")
    except (OSError, ValueError):
        # stats are advisory: an unreadable/corrupt marker (e.g. a
        # half-written copy made outside the engine) degrades to the
        # legacy constants-count ordering, never a query failure
        return None
