"""Forward-chaining rule saturation (Datalog-style inference) over the KG.

The reference pipeline consumes ontology hierarchies whose semantics are
RDFS-shaped (subclass transitivity, type inheritance — the ancestor sets
of thesis/pre_processing_data.py:216-223 are exactly the subclass
closure); this module makes that inference a first-class, *general*
operator: a rule is the same (patterns, template) pair as
``kgquery.bgp_construct``, and :func:`saturate` applies a rule SET to
fixpoint, so derived triples can themselves fire further rules
(transitivity, property hierarchies, domain/range typing, sameAs-style
propagation — anything monotone and recursive).

Evaluation is SEMI-NAIVE, the standard Datalog trick re-expressed on
DataFrames: in round r a rule with k patterns is evaluated k times, the
i-th evaluation pointing pattern i at the round-(r-1) DELTA and the rest
at the full relation. Every solution that uses at least one new triple is
found by the evaluation where that triple sits in the delta slot;
solutions using only old triples were found in an earlier round — so per-
round work is proportional to NEW facts, not to the accumulated graph.
Round 1 seeds delta = the whole input (full naive evaluation once).

Scale shape (10^12 triples): after round 1 the delta is small (new facts
only), so each delta-anchored scan is dimension-sized and AQE plans the
joins against the big relation as broadcast joins at runtime; the anti-
join that extracts the fresh delta is keyed on the full triple and the
accumulated relation is lineage-cut per round (``session.materialize`` —
local blocks by default, reliable checkpoints under executor churn, same
tradeoff as graph.connected_components). Termination is guaranteed for
range-restricted rules (every template variable bound by the patterns —
enforced by ``_instantiate_templates``): derived terms are drawn from the
finite set of existing terms plus rule constants, so the Herbrand base is
finite; ``max_iters`` bounds runaway rule sets and overflow raises rather
than returning a silently incomplete closure.
"""

from __future__ import annotations

import contextlib
import threading
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.kgquery import (
    Pattern,
    _compile_bgp,
    _instantiate_templates,
    _strip_iri,
)
from ontology_mapping_spark.session import materialize

# a rule: body (conjunctive patterns) => head (template triples)
Rule = tuple[Sequence[Pattern], Sequence[Pattern]]

_KEY = ["subject", "predicate", "object"]


def saturate(
    triples: DataFrame,
    rules: Sequence[Rule],
    max_iters: int = 20,
    broadcast_min_constants: int = 2,
) -> DataFrame:
    """Apply ``rules`` to ``triples`` until no rule derives a new triple;
    return the saturated graph (input ∪ everything derivable), as a triple
    SET (inference is set-semantic: a fact is a fact once).

    Raises ``RuntimeError`` if the fixpoint is not reached within
    ``max_iters`` rounds — an incomplete closure returned silently would
    poison every downstream join. For the two-hop transitivity rule,
    semi-naive delta∘delta composition IS path doubling: reach doubles
    per round, so a depth-D hierarchy converges in O(log D) rounds.
    Do NOT pre-seed with ``graph.transitive_closure`` hoping to help:
    measured at 300k edges (tools/stress_kginfer.py), the seeded path is
    slower in nearly every pass (0.3-1.0× vs cold) — the seed re-does
    the same doubling work and then pays a naive confirmation round over
    the closure-sized input instead of the edge-sized one. For folding a
    small batch of NEW facts into an existing fixpoint, use
    :func:`saturate_incremental` (2-4× faster than re-saturating,
    paired, at a 2% delta).
    """
    _check_rules(rules)
    total = materialize(triples.select(*_KEY).distinct())
    return _semi_naive_rounds(
        total, total, rules, max_iters, broadcast_min_constants
    )


_CP_CONF = "spark.sql.constraintPropagation.enabled"
_cp_lock = threading.Lock()
# keyed PER SparkSession (confs are per-session: a foreachBatch-cloned
# session has its own conf, so one global refcount would leave a second
# concurrent session unprotected — and restore the first session's saved
# value onto the last exiter's session)
_cp_state: dict[int, dict] = {}


@contextlib.contextmanager
def _constraint_propagation_off(spark):
    """Refcounted toggle of the session-global constraint-propagation
    conf: Spark confs have no scoping WITHIN a session, so two concurrent
    saturations on one session (two threads, a saturation beside another
    job) must not let the first `finally` restore the conf while the
    second is mid-loop. The refcount is per SparkSession — each session's
    LAST exit restores the value seen by that session's FIRST entry.
    Plans of unrelated queries planned on the same session during a
    saturation still lose inferred filters — that is inherent to a
    session-global conf and documented here rather than hidden."""
    key = id(spark)
    with _cp_lock:
        st = _cp_state.get(key)
        if st is None:
            st = _cp_state[key] = {
                "count": 0,
                "prev": spark.conf.get(_CP_CONF, "true"),
            }
            spark.conf.set(_CP_CONF, "false")
        st["count"] += 1
    try:
        yield
    finally:
        with _cp_lock:
            st = _cp_state[key]
            st["count"] -= 1
            if st["count"] == 0:
                spark.conf.set(_CP_CONF, st["prev"])
                del _cp_state[key]


def _check_rules(rules: Sequence[Rule]) -> None:
    if not rules:
        raise ValueError("saturate needs at least one rule")
    for patterns, template in rules:
        if not patterns or not template:
            raise ValueError("each rule needs body patterns and a head template")


def _semi_naive_rounds(
    total: DataFrame,
    delta: DataFrame,
    rules: Sequence[Rule],
    max_iters: int,
    broadcast_min_constants: int,
    delta_rows: int | None = None,
    small_delta_rows: int = 500_000,
) -> DataFrame:
    """The shared fixpoint loop: ``total`` is the known fact set (already
    distinct + materialized), ``delta`` the facts not yet propagated
    through the rules (⊆ total). Cold saturation seeds delta = total;
    incremental saturation seeds delta = the truly-new facts only.

    Two shapes keep the accumulated graph from dominating round cost
    (measured in tools/stress_kginfer.py):

    * ``total`` is never re-materialized — it stays a plan-level union of
      the materialized seed plus each round's materialized delta (every
      union child is lineage-cut, so the plan depth is bounded by the
      round count, not the data);
    * when the previous delta was small (``delta_rows`` known and under
      ``small_delta_rows``), the fresh-fact extraction swaps the
      sort-merge anti-join (which shuffles the whole graph) for a
      broadcast-semi intersection: the graph is SCANNED once against the
      broadcast derived set, and both joins' build sides are
      derived-sized. The big relation is never shuffled in a
      small-delta round — the crawl-cadence fast path.

    Constraint propagation is disabled for the loop's actions (and
    restored after) — but only when some rule carries a VARIABLE
    predicate: Spark 4.1's ``UnionBase.rewriteConstraints`` throws
    ``key not found: attr`` on the filtered-scan-over-union plans the
    delta-anchored evaluation builds in exactly that case, while
    constant-predicate rule sets optimize fine and keep the inferred
    filters. The frame returned to the caller is safe with propagation
    back on — every union child is a checkpointed LogicalRDD with no
    constraints to rewrite.
    """
    from ontology_mapping_spark.operators.kgquery import is_var

    has_var_pred = any(
        is_var(term[1])
        for patterns, template in rules
        for term in list(patterns) + list(template)
    )
    if not has_var_pred:
        return _semi_naive_loop(
            total, delta, rules, max_iters, broadcast_min_constants,
            delta_rows, small_delta_rows,
        )
    with _constraint_propagation_off(total.sparkSession):
        return _semi_naive_loop(
            total, delta, rules, max_iters, broadcast_min_constants,
            delta_rows, small_delta_rows,
        )


def _delta_round(
    full: DataFrame,
    delta: DataFrame,
    rules: Sequence[Rule],
    broadcast_min_constants: int,
) -> DataFrame:
    """One semi-naive rule round: for every rule and every body position,
    evaluate the body with THAT position anchored on ``delta`` and the
    rest on ``full``, instantiate the head templates, and union (bag —
    callers dedup). Shared by the forward fixpoint
    (:func:`_semi_naive_loop`) and overdeletion (:func:`_overdelete`) so
    the delta-anchored evaluation strategy cannot drift between them."""
    parts: list[DataFrame] = []
    for patterns, template in rules:
        for i in range(len(patterns)):
            sources: list[DataFrame | None] = [None] * len(patterns)
            sources[i] = delta
            sols, _bound = _compile_bgp(
                full,
                patterns,
                allow_product=False,
                broadcast_min_constants=broadcast_min_constants,
                sources=sources,
            )
            parts.append(_instantiate_templates(sols, template))
    derived = parts[0]
    for p_ in parts[1:]:
        derived = derived.unionByName(p_)
    return derived


def _semi_naive_loop(
    total: DataFrame,
    delta: DataFrame,
    rules: Sequence[Rule],
    max_iters: int,
    broadcast_min_constants: int,
    delta_rows: int | None,
    small_delta_rows: int,
) -> DataFrame:
    for _ in range(max_iters):
        derived = _delta_round(total, delta, rules, broadcast_min_constants)
        # fresh = facts not already known; total and delta stay disjointly
        # built, so the union below needs no re-dedup
        if delta_rows is not None and delta_rows <= small_delta_rows:
            # the small-delta fast path: the graph is SCANNED against a
            # broadcast of the derived set (semi), and the fresh facts
            # come from a broadcast anti against that intersection — the
            # big relation is never shuffled. derived is deliberately
            # checkpointed only UNDER a join (materializing the bare
            # template-union plan trips Spark 4.1's constraint rewrite,
            # "key not found: attr", when a variable-predicate rule is in
            # play — the same bug family the graph fixpoints dodge with
            # USING joins).
            d_set = derived.distinct()
            if d_set.count() <= 4 * small_delta_rows:
                # re-evaluating the (cheap, delta-anchored) derived plan
                # per consumer beats one checkpoint of it; the count
                # guards the broadcast against hot-key rule fan-out.
                # `known` (graph ∩ derived) has exactly ONE consumer, so
                # it stays a plan — a nested broadcast build inside the
                # delta job — instead of its own materialization: same
                # single scan of the graph, one Spark job per round
                # fewer (the fixed job cost is what dominates
                # crawl-cadence micro-batches)
                known = total.join(F.broadcast(d_set), on=_KEY, how="left_semi")
                delta = materialize(
                    d_set.join(F.broadcast(known), on=_KEY, how="left_anti")
                )
            else:
                delta = materialize(d_set.join(total, on=_KEY, how="left_anti"))
        else:
            delta = materialize(
                derived.distinct().join(total, on=_KEY, how="left_anti")
            )
        delta_rows = delta.count()
        if delta_rows == 0:
            return total
        # hybrid accumulation: after a BIG round the next round re-scans
        # everything anyway, so compact the union into one well-partitioned
        # checkpoint; after a small round, a plan-level union of the
        # already-materialized pieces skips rewriting the whole graph
        # (the crawl-cadence win — measured in tools/stress_kginfer.py)
        if delta_rows > small_delta_rows:
            total = materialize(total.unionByName(delta))
        else:
            total = total.unionByName(delta)
    raise RuntimeError(
        f"saturation did not converge within max_iters={max_iters} rounds; "
        "raise max_iters (deep derivation chains) or check the rule set"
    )


def saturate_incremental(
    saturated: DataFrame,
    delta: DataFrame,
    rules: Sequence[Rule],
    max_iters: int = 20,
    broadcast_min_constants: int = 2,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fold a batch of NEW asserted triples into an ALREADY-SATURATED
    graph, deriving only the delta's consequences — the crawl-cadence
    shape (the inference twin of ``kgmaint.incremental_components``):
    equal to ``saturate(saturated ∪ delta, rules)`` whenever ``saturated``
    is in fact a fixpoint of ``rules`` (the caller's contract — this is
    NOT checked, because checking costs exactly the naive full round this
    function exists to skip; equivalence is property-pinned in
    tests/test_kginfer.py).

    Work scales with the delta's derivation frontier, not the graph: the
    first round evaluates each rule only with a body position anchored on
    the truly-new facts (delta minus already-known, one anti-join), so a
    crawl adding 2% of the triples pays a fraction of the cold-saturation
    cost (2.1-4.3× faster, paired — tools/stress_kginfer.py) instead of
    re-deriving the whole closure. Pass ``assume_distinct=True`` when
    ``saturated`` is known to be a distinct triple set (anything a
    previous saturate/swap wrote): it skips a defensive full-graph
    distinct — a per-call hash-exchange + checkpoint of the accumulated
    graph that would otherwise dominate small-delta cost.
    """
    _check_rules(rules)
    if assume_distinct:
        # the saturated state usually comes straight from a previous
        # saturate/swap (distinct by construction, e.g. the per-batch
        # streaming sink reading its own parquet state): skipping the
        # defensive distinct skips a full hash-exchange + checkpoint of
        # the accumulated graph PER CALL — the dominant per-batch cost
        # at scale. The caller owns the claim.
        base = saturated.select(*_KEY)
    else:
        base = materialize(saturated.select(*_KEY).distinct())
    # fresh = delta − base. The naive left-anti would put the WHOLE
    # accumulated graph through a sort-merge shuffle (anti-join build
    # sides don't broadcast the probe); crawl-cadence deltas are tiny,
    # so use the loop's own small-delta idiom instead: scan the graph
    # ONCE against the broadcast delta (semi), then anti the delta
    # against that intersection — both build sides delta-sized, the
    # graph never shuffles. Past the broadcast cap, fall back.
    d_set = materialize(delta.select(*_KEY).distinct())
    n_d = d_set.count()
    if n_d <= _BROADCAST_CAP_ROWS:
        known = base.join(F.broadcast(d_set), on=_KEY, how="left_semi")
        fresh = materialize(
            d_set.join(F.broadcast(known), on=_KEY, how="left_anti")
        )
    else:
        fresh = materialize(d_set.join(base, on=_KEY, how="left_anti"))
    n_fresh = fresh.count()
    if n_fresh == 0:
        return base
    total = base.unionByName(fresh)
    return _semi_naive_rounds(
        total,
        fresh,
        rules,
        max_iters,
        broadcast_min_constants,
        delta_rows=n_fresh,
    )


def retract_incremental(
    saturated: DataFrame,
    asserted: DataFrame,
    removals: DataFrame,
    rules: Sequence[Rule],
    max_iters: int = 20,
    broadcast_min_constants: int = 2,
    assume_distinct: bool = False,
) -> DataFrame:
    """Fold a batch of RETRACTED asserted triples out of an ALREADY-
    SATURATED graph — delete-and-rederive (DRed), the deletion twin of
    :func:`saturate_incremental`: equal to
    ``saturate(asserted − removals, rules)`` whenever ``saturated ==
    saturate(asserted, rules)`` (the caller's contract, property-pinned
    in tests/test_kginfer.py, not checked here for the same cost reason).
    Recrawls don't only add facts — a page revision can withdraw the
    support for a triple (kgmaint.latest_captures replaces captures), and
    naively re-saturating the whole graph per retraction is the cost this
    function exists to skip.

    Three stages, each scaled to the retraction's blast radius:

    1. OVERDELETE — semi-naive over the deletion set D: seed D with the
       actually-removed asserted triples, then per round anchor one body
       position of each rule at the round's delta with the REST at the
       original (pre-deletion) saturated graph — any one-step consequence
       of a suspect fact is itself suspect. Work tracks |D|'s frontier,
       not the graph (delta-anchored scans are deletion-sized; AQE
       broadcasts them against the big relation at runtime).
    2. REDERIVE SEED — facts in D with an ALTERNATIVE derivation wholly
       inside the surviving graph G0 = saturated − D must come back. One
       head-targeted round per rule over G0: every body pattern that
       binds a head variable is pre-restricted by a broadcast semi-join
       against D's projection of that variable (constants of the head
       template filter D first), so the scans are D-sized when D is
       small — never a full naive round over the graph. Asserted
       overdeleted facts that were not themselves removed re-enter here
       for free (put-back).
    3. PROPAGATE — the seed continues through the shared semi-naive loop
       (:func:`_semi_naive_rounds`): rederived facts may support further
       rederivations, and every head derivable from the growing total is
       legitimately in the final closure (⊆ the original saturation, so
       termination is inherited).

    Retracting a triple that is still DERIVABLE from the surviving
    asserted facts is a no-op on the closure (it rederives); retracting a
    derived-only triple (never asserted) is a no-op on the asserted base
    and hence on the result. Raises ``RuntimeError`` on ``max_iters``
    overflow in either fixpoint, same contract as :func:`saturate`.
    """
    _check_rules(rules)
    if assume_distinct:
        sat = saturated.select(*_KEY)
    else:
        sat = materialize(saturated.select(*_KEY).distinct())
    asserted = asserted.select(*_KEY)
    removals = materialize(removals.select(*_KEY).distinct())
    removals_hinted = _maybe_broadcast(removals, removals.count())
    # only retractions of facts actually asserted matter; removing a
    # derived-only triple cannot change the closure
    removed0 = materialize(
        asserted.join(removals_hinted, on=_KEY, how="left_semi").distinct()
    )
    if removed0.isEmpty():
        return sat
    asserted_after = asserted.join(removals_hinted, on=_KEY, how="left_anti")

    from ontology_mapping_spark.operators.kgquery import is_var

    has_var_pred = any(
        is_var(term[1])
        for patterns, template in rules
        for term in list(patterns) + list(template)
    )
    ctx = (
        _constraint_propagation_off(saturated.sparkSession)
        if has_var_pred
        else contextlib.nullcontext()
    )
    with ctx:
        deleted = _overdelete(
            sat, removed0, rules, max_iters, broadcast_min_constants
        )
        g0 = materialize(deleted.surviving)
        suspects = _maybe_broadcast(deleted.suspects, deleted.n_suspects)
        put_back = asserted_after.join(suspects, on=_KEY, how="left_semi")
        seed = materialize(
            put_back.unionByName(
                _rederive_candidates(
                    g0,
                    suspects,
                    deleted.n_suspects,
                    rules,
                    broadcast_min_constants,
                )
            ).distinct()
        )
        n_seed = seed.count()
        if n_seed == 0:
            return g0
        return _semi_naive_loop(
            g0.unionByName(seed),
            seed,
            rules,
            max_iters,
            broadcast_min_constants,
            delta_rows=n_seed,
            small_delta_rows=500_000,
        )


class _Overdeleted:
    """suspects = the overdeletion set D (with its known row count);
    surviving = saturated − D."""

    def __init__(self, suspects: DataFrame, surviving: DataFrame, n: int):
        self.suspects = suspects
        self.surviving = surviving
        self.n_suspects = n


# above this, the suspect/delta set stops being broadcast and the joins
# fall back to shuffles — same order as _semi_naive_loop's 4x guard
_BROADCAST_CAP_ROWS = 2_000_000


def _maybe_broadcast(df: DataFrame, n_rows: int) -> DataFrame:
    return F.broadcast(df) if n_rows <= _BROADCAST_CAP_ROWS else df


def _overdelete(
    sat: DataFrame,
    removed0: DataFrame,
    rules: Sequence[Rule],
    max_iters: int,
    broadcast_min_constants: int,
) -> _Overdeleted:
    """Semi-naive overdeletion: accumulate every triple with SOME
    derivation touching a removed fact. Other body positions scan the
    ORIGINAL saturated graph — a derivation through a fact that is itself
    suspect still taints its head (DRed overapproximates; rederivation
    repairs). Heads are ⊆ sat by the fixpoint contract, so D never
    escapes the graph and the loop terminates on |sat|."""
    suspects = removed0
    n_suspects = removed0.count()
    delta = removed0
    for _ in range(max_iters):
        derived = _delta_round(sat, delta, rules, broadcast_min_constants)
        delta = materialize(
            derived.distinct().join(
                _maybe_broadcast(suspects, n_suspects),
                on=_KEY,
                how="left_anti",
            )
        )
        n_delta = delta.count()
        if n_delta == 0:
            return _Overdeleted(
                suspects,
                sat.join(
                    _maybe_broadcast(suspects, n_suspects),
                    on=_KEY,
                    how="left_anti",
                ),
                n_suspects,
            )
        # suspects stay deletion-sized (≤ blast radius), so plan-level
        # union of materialized rounds is the cheap accumulation
        suspects = suspects.unionByName(delta)
        n_suspects += n_delta
    raise RuntimeError(
        f"overdeletion did not converge within max_iters={max_iters} "
        "rounds; raise max_iters or check the rule set"
    )


def _rederive_candidates(
    g0: DataFrame,
    suspects: DataFrame,
    n_suspects: int,
    rules: Sequence[Rule],
    broadcast_min_constants: int,
) -> DataFrame:
    """One head-targeted rule round over the surviving graph: derivations
    whose body lies entirely in g0 and whose head is a suspect. For each
    rule, each body pattern binding a head variable is pre-restricted to
    the suspect set's projection of that variable (suspects filtered by
    the head template's constant positions first), via broadcast
    left-semi — so when the blast radius is small, every scan in the
    round is suspect-sized, not graph-sized. Patterns sharing no head
    variable scan g0 in full (they are the rule's context — unavoidable,
    but they join against already-restricted sides)."""
    from ontology_mapping_spark.operators.kgquery import is_var

    pos_cols = ("subject", "predicate", "object")
    parts: list[DataFrame] = []
    for patterns, template in rules:
        # head-variable projections from the suspect set: restrict
        # suspects by the template triple's constant positions, project
        # the variable's column; a variable used by several template
        # triples gets the union (a superset restriction is still sound)
        proj: dict[str, DataFrame] = {}
        for tmpl in template:
            cand = suspects
            for col, term in zip(pos_cols, tmpl):
                if not is_var(term) and not term.startswith("_:"):
                    # stored facts carry BARE iris (_instantiate_templates
                    # strips '<...>'), so the suspect filter must too — a
                    # verbatim '<iri>' constant would match zero suspects
                    # and silently disable rederivation for the rule
                    cand = cand.filter(F.col(col) == F.lit(_strip_iri(term)))
            for col, term in zip(pos_cols, tmpl):
                if is_var(term):
                    name = term[1:]
                    p = cand.select(F.col(col).alias(name))
                    proj[name] = (
                        p if name not in proj else proj[name].unionByName(p)
                    )
        proj = {k: v.distinct() for k, v in proj.items()}
        sources: list[DataFrame | None] = []
        for pat in patterns:
            src: DataFrame | None = None
            for col, term in zip(pos_cols, pat):
                if is_var(term) and term[1:] in proj:
                    restr = proj[term[1:]].withColumnRenamed(term[1:], col)
                    # each projection has <= n_suspects rows, so the same
                    # cap gates it as gates the suspect set itself — a
                    # closure-sized blast radius must NOT force a
                    # driver-collected build side (it falls back to a
                    # shuffle join like every other big-delta path here)
                    src = (g0 if src is None else src).join(
                        _maybe_broadcast(restr, n_suspects),
                        on=col,
                        how="left_semi",
                    )
            sources.append(src)
        sols, _bound = _compile_bgp(
            g0,
            patterns,
            allow_product=False,
            broadcast_min_constants=broadcast_min_constants,
            sources=sources,
        )
        parts.append(_instantiate_templates(sols, template))
    derived = parts[0]
    for p_ in parts[1:]:
        derived = derived.unionByName(p_)
    # only suspects matter: anything else the round derives is ⊆ g0
    # (the caller passes the suspect set already broadcast-hinted when
    # it is small enough)
    return derived.distinct().join(suspects, on=_KEY, how="left_semi")


def rdfs_rules(
    sub_class: str = "subClassOf",
    rdf_type: str = "type",
    sub_property: str | None = None,
    domain: str | None = None,
    range_: str | None = None,
) -> list[Rule]:
    """The classic RDFS entailment core as a ``saturate`` rule set, over
    whatever predicate vocabulary the KG actually uses (the pipeline's
    hierarchy predicate is 'broader'; pass ``sub_class='broader'``).

    Always included (rdfs11, rdfs9):

    * ``(?c sub ?d) ∧ (?d sub ?e) → (?c sub ?e)``  — subclass transitivity
    * ``(?x type ?c) ∧ (?c sub ?d) → (?x type ?d)`` — type inheritance

    Opt-in (each needs a variable-predicate scan, one extra pattern
    evaluation per round):

    * ``sub_property`` (rdfs7+5): ``(?x ?p ?y) ∧ (?p subProp ?q) →
      (?x ?q ?y)`` and subProperty transitivity;
    * ``domain`` (rdfs2): ``(?x ?p ?y) ∧ (?p domain ?c) → (?x type ?c)``;
    * ``range_`` (rdfs3): ``(?x ?p ?y) ∧ (?p range ?c) → (?y type ?c)``.
    """
    rules: list[Rule] = [
        (
            [("?c", sub_class, "?d"), ("?d", sub_class, "?e")],
            [("?c", sub_class, "?e")],
        ),
        (
            [("?x", rdf_type, "?c"), ("?c", sub_class, "?d")],
            [("?x", rdf_type, "?d")],
        ),
    ]
    if sub_property is not None:
        rules.append(
            (
                [("?p", sub_property, "?q"), ("?q", sub_property, "?r")],
                [("?p", sub_property, "?r")],
            )
        )
        rules.append(
            (
                [("?x", "?p", "?y"), ("?p", sub_property, "?q")],
                [("?x", "?q", "?y")],
            )
        )
    if domain is not None:
        rules.append(
            (
                [("?x", "?p", "?y"), ("?p", domain, "?c")],
                [("?x", rdf_type, "?c")],
            )
        )
    if range_ is not None:
        rules.append(
            (
                [("?x", "?p", "?y"), ("?p", range_, "?c")],
                [("?y", rdf_type, "?c")],
            )
        )
    return rules


def owl_rules(
    rdf_type: str = "type",
    inverse_of: str | None = "inverseOf",
    symmetric_class: str | None = "SymmetricProperty",
    transitive_class: str | None = "TransitiveProperty",
) -> list[Rule]:
    """OWL-lite property-characteristic entailment, SCHEMA-DRIVEN: unlike
    :func:`rdfs_rules` (where the caller names the predicates), these
    rules read the property declarations from the GRAPH ITSELF — add
    ``(near inverseOf far)`` or ``(adj type SymmetricProperty)`` as
    ordinary triples and the corresponding instance facts follow at the
    next saturation, with no engine reconfiguration:

    * inverseOf (owl:inverseOf, both directions):
      ``(?x ?p ?y) ∧ (?p inv ?q) → (?y ?q ?x)`` and
      ``(?x ?q ?y) ∧ (?p inv ?q) → (?y ?p ?x)``;
    * symmetric (owl:SymmetricProperty):
      ``(?x ?p ?y) ∧ (?p type Sym) → (?y ?p ?x)``;
    * transitive (owl:TransitiveProperty):
      ``(?x ?p ?y) ∧ (?y ?p ?z) ∧ (?p type Trans) → (?x ?p ?z)`` —
      semi-naive delta∘delta composition doubles reach per round, so a
      depth-D relation converges in O(log D) rounds exactly like the
      dedicated closure.

    Every rule carries a variable-predicate body pattern, so each costs
    one extra delta-anchored evaluation per round (and the loop runs with
    constraint propagation toggled off, see ``_semi_naive_rounds``). The
    declaration pattern is dimension-sized — AQE broadcasts it — and the
    instance scan stays the one big pass per round. Pass ``None`` to drop
    a family. Compose with :func:`rdfs_rules` by list concatenation.
    """
    rules: list[Rule] = []
    if inverse_of is not None:
        rules.append(
            (
                [("?x", "?p", "?y"), ("?p", inverse_of, "?q")],
                [("?y", "?q", "?x")],
            )
        )
        rules.append(
            (
                [("?x", "?q", "?y"), ("?p", inverse_of, "?q")],
                [("?y", "?p", "?x")],
            )
        )
    if symmetric_class is not None:
        rules.append(
            (
                [("?x", "?p", "?y"), ("?p", rdf_type, symmetric_class)],
                [("?y", "?p", "?x")],
            )
        )
    if transitive_class is not None:
        rules.append(
            (
                [
                    ("?x", "?p", "?y"),
                    ("?y", "?p", "?z"),
                    ("?p", rdf_type, transitive_class),
                ],
                [("?x", "?p", "?z")],
            )
        )
    if not rules:
        raise ValueError("owl_rules: every rule family is disabled")
    return rules


def kg_entailment_rules(predicates: dict[str, str]) -> list[Rule]:
    """The entailment layer the PIPELINE's emitted KG warrants, over the
    configured predicate vocabulary (config.PipelineConfig.predicates):

    * sameAs symmetry — ``(?x sameAs ?y) → (?y sameAs ?x)`` (the accepted
      alignment links are emitted one-directional, src→tgt);
    * sameAs transitivity — with symmetry this closes each alignment
      component, which is LOAD-BEARING for lifting: the pipeline
      canonicalizes every mentionedIn subject to its connected-component
      representative (plans/pipeline.py build_out), while the sameAs
      links keep the RAW src→tgt endpoints — only the sym+trans closure
      connects each raw endpoint to the rep that actually holds the
      mentions (the rep is itself a component member, so the closure
      always reaches it);
    * mention lifting — ``(?x sameAs ?y) ∧ (?x mentionedIn ?p) →
      (?y mentionedIn ?p)``: through the closed sameAs relation, every
      aligned concept inherits its component's pages;
    * subclass transitivity over the hierarchy predicate, for callers who
      saturate the emitted KG UNIONED with the ontology triples.
    """
    same_as = predicates["same_as"]
    mentions = predicates["mentions"]
    sub = predicates["subclass"]
    return [
        ([("?x", same_as, "?y")], [("?y", same_as, "?x")]),
        (
            [("?x", same_as, "?y"), ("?y", same_as, "?z")],
            [("?x", same_as, "?z")],
        ),
        (
            [("?x", same_as, "?y"), ("?x", mentions, "?p")],
            [("?y", mentions, "?p")],
        ),
        (
            [("?c", sub, "?d"), ("?d", sub, "?e")],
            [("?c", sub, "?e")],
        ),
    ]


def entailed_triples(
    triples: DataFrame, rules: Sequence[Rule], max_iters: int = 20
) -> DataFrame:
    """Only the DERIVED triples (saturation minus input) — the usual shape
    for materializing an inference layer next to the asserted graph (so
    re-runs stay idempotent and provenance stays separable, e.g. written
    as its own partition by ``kgmaint``/StageRunner)."""
    sat = saturate(triples, rules, max_iters=max_iters)
    return sat.join(
        triples.select(*_KEY).distinct(), on=_KEY, how="left_anti"
    )
