"""SPARQL-style basic-graph-pattern (BGP) matching over the emitted KG.

The pipeline's end product is a flat (subject, predicate, object) triple
table (plans/pipeline.py ``kg_triples``; the reference's final artifact is
the same flat triple frame, thesis/process_data_features.py:98-102). A KG
you cannot query is a dead artifact: this module compiles a useful
SPARQL subset to DataFrame plans, so the constructed graph is directly
consumable from Spark without a separate triple store:

* ``bgp_match``       — conjunctive triple patterns (BGP, bag semantics)
                        with OPTIONAL groups, FILTER expressions,
                        FILTER EXISTS / FILTER NOT EXISTS / MINUS
                        existence tests, and VALUES inline bindings;
* ``bgp_union``       — UNION of pattern groups (null-padded bag union);
* ``bgp_match_paths`` — SPARQL 1.1 property paths: 'pred+'/'pred*'
                        through the distributed transitive closure,
                        inverse '^pred', sequence 'p1/p2', alternation
                        'a|b';
* ``bgp_construct``   — CONSTRUCT: rule-based materialization of new
                        triples from solutions (optionally over paths);
* ``bgp_ask``         — ASK: lazy existence test, LIMIT-1-bounded;
* ``describe_node``   — DESCRIBE: depth-1 bounded description scan;
* ``bgp_select`` /
  ``solution_modifiers`` — SELECT with the full modifier pipeline:
                        BIND, GROUP BY + aggregates (COUNT/SUM/AVG/MIN/
                        MAX/SAMPLE/GROUP_CONCAT), HAVING, DISTINCT,
                        ORDER BY, OFFSET/LIMIT — aggregates map-side-
                        combined, ordered LIMIT a TakeOrderedAndProject;
* ``update_graph``    — UPDATE: DELETE/INSERT WHERE as one broadcast
                        anti-join + plan-level union (set semantics,
                        idempotent);
* GRAPH / named graphs — every matcher accepts 4-term ``(g, s, p, o)``
                        patterns over a quad table (a ``graph`` column:
                        asserted vs entailed layers, one graph per
                        crawl); constant graphs scope + partition-prune,
                        variable graphs bind and join like any variable,
                        3-term patterns read the union of graphs.

Scale notes (10^12-triple KG):
* Each pattern compiles to ONE filtered scan of the triple table. Constant
  terms become Catalyst filters that push down to the parquet scan; with
  the triple table partitioned by predicate (the standard triple-store
  layout — predicates are few, subjects/objects are many), a
  constant-predicate pattern prunes to a single partition.
* Join order is greedy most-selective-first: patterns with more constant
  terms bind first — or, when per-predicate counts are supplied
  (``stats=predicate_stats(triples)``), by estimated cardinality, which
  at store scale correctly orders a huge-but-bound ``rdf:type`` pattern
  AFTER a rare-predicate one. Every subsequent pattern must share >=1
  variable with the already-bound set — a disconnected BGP would be a
  cartesian product and raises unless ``allow_product=True``.
* A pattern with >=2 constants is a node-neighborhood slice ((s,p,?o) /
  (?s,p,o)), bounded by one node's fan-out — dimension-sized by
  construction — so it gets a broadcast hint; single-constant patterns
  shuffle-join on the shared variable.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Pattern = tuple[str, str, str]

_POS = ("subject", "predicate", "object")


def is_var(term: str) -> bool:
    """A term is a variable iff it starts with '?' (SPARQL surface syntax)."""
    return term.startswith("?")


def is_iri_ref(term: str) -> bool:
    """'<...>'-wrapped term: an opaque IRI constant, per SPARQL surface
    syntax. The wrapper is the escape hatch that keeps real-world IRI
    predicates (which legally contain '/', and could contain '^'/'|'/'+')
    out of the property-path mini-grammar; the stored triple value is the
    BARE iri — the brackets are stripped before matching.

    ONE iri only: '<' / '>' are illegal inside an IRI, so a composite
    path term like '<a>|<b>' or '<a>/<b>' (internal brackets) is NOT an
    iri-ref — treating it as one would filter on the literal composite
    string and silently match nothing."""
    return (
        len(term) >= 2
        and term.startswith("<")
        and term.endswith(">")
        and "<" not in term[1:-1]
        and ">" not in term[1:-1]
    )


def _strip_iri(term: str) -> str:
    return term[1:-1] if is_iri_ref(term) else term


def _split_outside_iri(p: str, sep: str) -> list[str]:
    """Split a path term on ``sep`` at bracket depth 0 only — separators
    inside a '<...>' iri wrapper (e.g. the '/' of 'http://') are data."""
    parts: list[str] = []
    buf: list[str] = []
    depth = 0
    for ch in p:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth = max(depth - 1, 0)
        if ch == sep and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _pattern_df(
    triples: DataFrame,
    pat: Pattern,
    idx: int,
    var_pred_source: DataFrame | None = None,
) -> tuple[DataFrame, set[str]]:
    """One triple/quad pattern -> (DataFrame with one column per variable,
    variable-name set). Constants filter; a variable repeated within the
    pattern (e.g. (?x, p, ?x)) adds an intra-row equality filter and binds
    one column.

    A 4-term pattern is SPARQL's ``GRAPH`` form, ``(g, s, p, o)`` — the
    table must carry a ``graph`` column (a quad store: e.g. the asserted
    vs entailed layers, or one named graph per crawl). A constant graph
    term scopes the scan to that graph (and prunes to its partition when
    the quad table is partitioned by graph — the standard layout); a
    variable binds the graph name into the solution; patterns within one
    BGP share a ``?g`` exactly like any other join variable. 3-term
    patterns over a quad table match triples in ANY graph (SPARQL's
    default-graph-as-union reading). A NULL graph value marks the
    DEFAULT graph (the N-Quads reader's 3-term lines): matched by 3-term
    patterns, but never by ``GRAPH ?g`` — a variable cannot bind to
    nothing — nor by any constant graph term.

    ``var_pred_source``: alternate table for patterns whose PREDICATE is a
    variable. ``bgp_match_paths`` augments the triple table with synthetic
    'pred+'/'pred*' closure rows; those are the path relation, not part of
    the dataset (SPARQL 1.1 §9.1), so a ?p scan must read the original
    table or it would bind fabricated predicates."""
    if len(pat) == 4:
        if "graph" not in triples.columns:
            raise ValueError(
                f"4-term (GRAPH) pattern {pat!r} needs a 'graph' column on "
                f"the table (got columns {triples.columns})"
            )
        positions: tuple[str, ...] = ("graph",) + _POS
    elif len(pat) == 3:
        positions = _POS
    else:
        raise ValueError(f"pattern must be (s, p, o) or (g, s, p, o), got {pat!r}")
    df = triples
    if var_pred_source is not None and is_var(pat[-2]):
        df = var_pred_source
    if len(pat) == 4 and is_var(pat[0]):
        # a variable never binds the default graph's NULL marker
        df = df.filter(F.col("graph").isNotNull())
    first_pos_of: dict[str, str] = {}
    for pos, term in zip(positions, pat):
        if is_var(term):
            name = term[1:]
            if not name:
                raise ValueError(f"empty variable name in pattern {pat!r}")
            if name in first_pos_of:
                df = df.filter(F.col(first_pos_of[name]) == F.col(pos))
            else:
                first_pos_of[name] = pos
        else:
            df = df.filter(F.col(pos) == F.lit(_strip_iri(term)))
    cols = [F.col(pos).alias(name) for name, pos in first_pos_of.items()]
    if not cols:
        # fully-ground pattern: contributes an existence check (1 row per
        # matching triple under bag semantics, consistent with SQL joins);
        # per-pattern column name so two ground patterns don't collide
        return df.select(F.lit(True).alias(f"__ground_{idx}__")), set()
    return df.select(*cols), set(first_pos_of)


def predicate_stats(triples: DataFrame) -> dict[str, int]:
    """Per-predicate triple counts for statistics-driven BGP join ordering.

    One partial+final groupBy collected to the driver: the predicate
    domain is schema-sized by RDF nature (10^2-10^4 predicates even at
    10^12 triples), so this is a bounded driver aggregate. Compute it
    once per session — or once per crawl, persisted in the KG state
    manifest next to the merge output — and pass it to ``bgp_match`` /
    ``bgp_union`` as ``stats``. Worth it because the constants-count
    heuristic inverts at scale: a bound-predicate pattern over
    ``rdf:type`` can be the LARGEST relation in the store while another
    1-constant pattern selects three rows."""
    return {
        r["predicate"]: r["count"]
        for r in triples.groupBy("predicate").count().collect()
    }


def values_frame(spark, rows: list[dict]) -> DataFrame:
    """Inline-VALUES rows (dicts, UNDEF as None) -> DataFrame with an
    explicit all-string schema. Schema inference would crash on a column
    that is UNDEF in every row ('Some of types cannot be determined') —
    a legal SPARQL inline table, not a user error."""
    from pyspark.sql import types as T

    if not rows:
        raise ValueError(
            "empty VALUES rows: pass a DataFrame with the declared "
            "variable columns (zero rows) instead — a bare [] carries "
            "no variable names"
        )
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    return spark.createDataFrame([tuple(r.get(c) for c in cols) for r in rows], schema)


def _join_values(
    out: DataFrame, vdf: DataFrame, bound: set[str], nullable: set[str]
) -> tuple[DataFrame, set[str]]:
    """Join an inline VALUES table into a solution frame with SPARQL
    compatibility semantics: a row is compatible when every shared
    variable is EQUAL or UNBOUND on either side — UNDEF (NULL) is a
    wildcard, which a plain equi-join would silently drop (NULL never
    equals anything). The fast broadcast-hash equi-join is kept whenever
    no wildcard can occur (no NULL in the inline table's shared columns,
    no OPTIONAL-nullable shared solution variable); otherwise the tiny
    broadcast table joins on the compatibility condition and the merged
    binding is coalesce(solution, row)."""
    vshared = sorted(set(vdf.columns) & bound)
    vnew = sorted(set(vdf.columns) - bound)
    if not vshared:
        return out.crossJoin(F.broadcast(vdf)), set(vdf.columns)
    nullable_shared = [v for v in vshared if v in nullable]
    undef_cond = None
    for v in vshared:
        c = F.col(v).isNull()
        undef_cond = c if undef_cond is None else undef_cond | c
    has_undef = bool(vdf.where(undef_cond).head(1))
    if not has_undef and not nullable_shared:
        return out.join(F.broadcast(vdf), on=vshared, how="inner"), set(vdf.columns)
    ren = vdf
    for v in vdf.columns:
        ren = ren.withColumnRenamed(v, f"__v_{v}")
    cond = None
    for v in vshared:
        c = F.col(f"__v_{v}").isNull() | (F.col(f"__v_{v}") == F.col(v))
        if v in nullable:
            c = c | F.col(v).isNull()
        cond = c if cond is None else cond & c
    joined = out.join(F.broadcast(ren), cond, "inner")
    sel = []
    for c in out.columns:
        if c in vshared:
            sel.append(F.coalesce(F.col(c), F.col(f"__v_{c}")).alias(c))
        else:
            sel.append(F.col(c))
    for v in vnew:
        sel.append(F.col(f"__v_{v}").alias(v))
    return joined.select(*sel), set(vdf.columns)


def _estimate_predicate(pred: str, stats, total: float) -> float:
    """Estimated row count of the relation a constant predicate TERM
    scans, mirroring the property-path mini-grammar the compilers use
    (``with_path_closures`` / ``_pattern_df``): synthetic terms estimate
    from their member predicates' base counts — a closure relation is AT
    LEAST its base relation and must never be mistaken for the empty
    scan a truly absent plain predicate is (est 0 would seed the join
    order with the largest relation in the query). A plain predicate
    absent from the stats really is an empty scan: 0.

    * ``<iri>``        — opaque: exact per-predicate count
    * ``^elt``         — inverse: same count as ``elt``
    * ``p+``           — one-or-more closure: 4 × base (≥ base; only the
                         ORDER matters, so the multiplier is uncritical)
    * ``p*`` / ``p?``  — adds the identity pair per node: + ``total``
    * ``a|b``          — alternation: sum of branch counts
    * ``!p``/``!(…)``  — negated set: ``total`` minus member counts
    """
    if is_iri_ref(pred):
        return float(stats.get(_strip_iri(pred), 0))
    if pred.startswith("^"):
        return _estimate_predicate(pred[1:], stats, total)
    if pred.startswith("!"):
        inner = pred[1:]
        if inner.startswith("(") and inner.endswith(")"):
            inner = inner[1:-1]
        members = sum(
            _estimate_predicate(m, stats, total)
            for m in inner.split("|")
            if m
        )
        return max(total - members, 0.0)
    if len(pred) > 1 and pred[-1] in "+*?":
        base = _estimate_predicate(pred[:-1], stats, total)
        est = base if pred[-1] == "?" else base * 4.0
        if pred[-1] in "*?":
            est += total
        return est
    if "|" in pred:
        return sum(
            _estimate_predicate(b, stats, total)
            for b in pred.split("|")
            if b
        )
    return float(stats.get(pred, 0))


def _estimate_pattern(pat: Pattern, stats, total: float) -> float:
    """Crude-but-monotone cardinality estimate for join ordering: the
    per-predicate relation estimate when the predicate is constant
    (``_estimate_predicate`` — path-grammar-aware), the table total for
    a variable predicate; each OTHER constant term (subject/object/
    graph) is assumed to keep ~10% of rows. Only the resulting ORDER
    matters, so the damping constant is uncritical; constants-count
    stays the tiebreak in the sort key."""
    pred = pat[-2]
    base = total if is_var(pred) else _estimate_predicate(pred, stats, total)
    n_other = sum(
        0 if is_var(t) else 1
        for k, t in enumerate(pat)
        if k != len(pat) - 2
    )
    return base * (0.1 ** n_other)


def _compile_bgp(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    allow_product: bool,
    broadcast_min_constants: int,
    var_pred_source: DataFrame | None = None,
    sources: Sequence[DataFrame | None] | None = None,
    stats=None,
) -> tuple[DataFrame, set[str]]:
    """Compile one conjunctive pattern group to (solution DataFrame with one
    column per bound variable, bound-variable set). Shared by the required
    part of ``bgp_match``, each OPTIONAL group, and each UNION branch.

    ``sources`` optionally overrides the scanned table per pattern
    position (None entries fall back to ``triples``) — the hook
    semi-naive rule evaluation (operators/kginfer) uses to point exactly
    one pattern at the delta relation.

    ``stats`` (per-predicate counts, see :func:`predicate_stats`) switches
    the greedy join order from most-constants-first to estimated-
    cardinality-first (:func:`_estimate_pattern`), with constants-count as
    the tiebreak — without stats the legacy order is unchanged."""
    if not patterns:
        raise ValueError("BGP needs at least one pattern")
    if sources is not None and len(sources) != len(patterns):
        raise ValueError("sources must align 1:1 with patterns")
    n_const = [sum(0 if is_var(t) else 1 for t in p) for p in patterns]
    est = None
    if stats is not None:
        total = float(max(sum(stats.values()), 1))
        est = [_estimate_pattern(p, stats, total) for p in patterns]

    def order_key(i: int):
        # smaller = joined earlier. Legacy (no stats): most constants,
        # input order on ties — identical selections to the old max().
        if est is not None:
            return (est[i], -n_const[i], i)
        return (-n_const[i], i)

    var_sets: list[set[str]] = []
    dfs: list[DataFrame] = []
    for idx, p in enumerate(patterns):
        src = triples
        if sources is not None and sources[idx] is not None:
            src = sources[idx]
        df, vs = _pattern_df(src, p, idx, var_pred_source)
        # the broadcast hint counts subject/predicate/object constants
        # ONLY: the ">=2 constants is a node-neighborhood slice" rationale
        # does not extend to a 4-term pattern's graph constant — (g, ?s,
        # <pred>, ?o) is an entire predicate relation within one graph,
        # relation-sized, and force-broadcasting it OOMs the driver
        n_spo_const = sum(0 if is_var(t) else 1 for t in p[-3:])
        if n_spo_const >= broadcast_min_constants:
            df = F.broadcast(df)
        dfs.append(df)
        var_sets.append(vs)

    remaining = list(range(len(patterns)))
    # seed with the most selective pattern; prefer one with variables so
    # the connectivity walk can grow from it — ground patterns are pure
    # existence checks and join in at any point
    with_vars = [i for i in remaining if var_sets[i]]
    start = min(with_vars or remaining, key=order_key)
    remaining.remove(start)
    out, bound = dfs[start], set(var_sets[start])
    while remaining:
        # ground patterns (no variables) are exempt from the disconnected
        # check: their solution multiplicity multiplies in via crossJoin,
        # exactly SPARQL bag semantics for an existence pattern
        connected = [i for i in remaining if (var_sets[i] & bound) or not var_sets[i]]
        if connected:
            # among connected candidates keep the most selective one: its
            # scan is smallest, so the running join stays small
            i = min(connected, key=order_key)
            shared = sorted(var_sets[i] & bound)
            if shared:
                # USING-column join (shared names, no aliases) — also
                # avoids Spark 4.1's constraint-rewrite bug on cross-name
                # equality joins under localCheckpoint
                out = out.join(dfs[i], on=shared, how="inner")
            else:
                out = out.crossJoin(dfs[i])
        else:
            if not allow_product:
                raise ValueError(
                    "disconnected BGP (no shared variable with the bound set "
                    f"{sorted(bound)}); pass allow_product=True to allow the "
                    "cartesian product"
                )
            i = min(remaining, key=order_key)
            out = out.crossJoin(dfs[i])
        remaining.remove(i)
        bound |= var_sets[i]
    ground_cols = [c for c in out.columns if c.startswith("__ground_")]
    if ground_cols:
        out = out.drop(*ground_cols)
    return out, bound


def _project(
    out: DataFrame, bound: set[str], select: Sequence[str] | None
) -> DataFrame:
    if not bound:
        # all-ground BGP: one `matched` row per solution (multiplicity =
        # product of the ground triples' multiplicities)
        return out.select(F.lit(True).alias("matched"))
    if select is not None:
        names = [s[1:] if s.startswith("?") else s for s in select]
        missing = [n for n in names if n not in bound]
        if missing:
            raise ValueError(f"select references unbound variables: {missing}")
        return out.select(*names)
    return out.select(*sorted(bound))


def bgp_match(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    select: Sequence[str] | None = None,
    allow_product: bool = False,
    broadcast_min_constants: int = 2,
    optional: Sequence[Sequence[Pattern]] = (),
    filter_expr: str | Sequence[str] | None = None,
    var_pred_source: DataFrame | None = None,
    exists: Sequence[Sequence[Pattern]] = (),
    not_exists: Sequence[Sequence[Pattern]] = (),
    minus: Sequence[Sequence[Pattern]] = (),
    values: DataFrame | Sequence[dict] | None = None,
    subqueries: Sequence[DataFrame] = (),
    stats: dict | None = None,
) -> DataFrame:
    """Match a conjunctive basic graph pattern against a triple table.

    ``triples`` has columns (subject, predicate, object); ``patterns`` is a
    non-empty sequence of (s, p, o) terms where '?name' marks a variable
    and anything else is a constant ('<...>'-wrapped constants match the
    bare IRI inside, per SPARQL surface syntax — and in
    ``bgp_match_paths`` the wrapper also shields IRIs containing
    '/', '^', '|', '+', '*' from path interpretation). Returns one row
    per solution mapping
    (bag semantics: duplicate triples produce duplicate solutions, exactly
    as the equivalent SQL self-join would), one column per variable, or
    the ``select`` projection.

    ``optional`` is a sequence of pattern groups, each a SPARQL
    ``OPTIONAL { ... }``: the group is compiled as its own BGP and
    left-outer-joined to the running solution on the shared variables
    (SPARQL's left-associative leftjoin), so its variables null-pad where
    the group has no match. Each group must share >=1 variable with what
    is already bound — an unshared OPTIONAL would be a left cross product.
    An entry may also be ``{'patterns': [...], 'filters': [...]}`` for
    ``OPTIONAL { ... FILTER(...) }`` bodies whose filter ranges over the
    group's own variables (applied to the group before the left join —
    see the inline note for why that is exact).

    ``filter_expr`` is one SQL boolean expression (or a sequence applied
    conjunctively) over the variable columns — SPARQL ``FILTER`` after all
    joins; NULL (unbound) evaluates to not-kept, matching SPARQL's
    error-drops-solution rule.

    ``var_pred_source``: alternate scan table for variable-PREDICATE
    patterns (see ``_pattern_df``; used by ``bgp_match_paths`` to keep
    synthetic closure rows out of ?p bindings).

    ``exists`` is a sequence of pattern groups, each a SPARQL
    ``FILTER EXISTS { ... }``: a solution is kept only when the group
    matches under its bindings — compiled as its own BGP and
    LEFT-SEMI-joined on the shared variables (the group's private
    variables are existential, and a semi join can never multiply
    solution rows). ``not_exists`` is its negation, SPARQL
    ``FILTER NOT EXISTS { ... }``: the identical compilation
    LEFT-ANTI-joined instead. For both, each group must share >=1
    variable with the bound set, else the test degenerates to a
    constant.

    ``minus`` is SPARQL ``MINUS``: same anti-join, except a group sharing
    NO variable removes nothing (per spec, disjoint domains are never
    incompatible) instead of raising.

    Unbound (NULL) shared variables follow the spec for all three forms:
    only BOUND variables substitute into an EXISTS/NOT EXISTS body, so a
    NULL shared variable is FREE there (wildcard), while MINUS
    compatibility additionally needs >=1 shared variable actually bound
    on both sides. Columns that can be NULL are tracked (OPTIONAL
    padding, VALUES/sub-SELECT contributions); when none of the shared
    variables is nullable the test stays a plain equi semi/anti join,
    otherwise it compiles to a broadcast nested-loop join against the
    DISTINCT-projected binding set of the body.

    ``values`` is SPARQL ``VALUES``: an inline solution table (DataFrame
    whose columns are variable names, or a sequence of dicts) inner-joined
    on its shared variables — broadcast, since VALUES blocks are
    inline-sized by definition. Columns not yet bound extend the solution;
    a values table sharing no variable is the spec's cartesian extension.

    ``subqueries`` is SPARQL's sub-SELECT: each DataFrame is a
    bottom-up-evaluated solution table (columns = its projected variable
    names) joined into the group on the shared variables. Unlike
    ``values`` the join carries NO broadcast hint — a sub-SELECT can be
    arbitrarily large, so AQE picks the strategy from runtime stats (the
    common aggregate-to-a-scalar idiom, e.g. ``(MAX(?d) AS ?m)`` with no
    shared variable, becomes a 1-row broadcast nested-loop extension).
    Join-NULL caveat (honest scoping): the negation forms (EXISTS /
    NOT EXISTS / MINUS) and VALUES implement SPARQL's unbound-
    compatibility for nullable shared variables (substitution semantics
    and the UNDEF-wildcard join respectively); SUBQUERY joins and
    OPTIONAL-chained joins do NOT — a shared variable that is unbound
    (NULL via an earlier OPTIONAL) matches nothing under Spark's
    equi-join NULL semantics, where SPARQL's compatibility would match
    everything. The equi-join is what keeps these joins hash-based at
    10^12 rows (the compatibility condition is a nested-loop shape);
    FILTER(bound(?v)) first when chaining OPTIONAL-bound variables into
    a later OPTIONAL or sub-SELECT — documented divergence.

    ``stats``: optional per-predicate counts (:func:`predicate_stats`)
    switching the greedy join order to estimated-cardinality-first —
    compute once per session/crawl; at 10^12 triples a constant-predicate
    pattern over ``rdf:type`` can be the largest relation, not the most
    selective, and the constants-count heuristic orders it wrong.
    """
    out, bound = _compile_bgp(
        triples, patterns, allow_product, broadcast_min_constants,
        var_pred_source, stats=stats,
    )
    # columns that can hold NULL (unbound) in some solution rows: vars
    # introduced by OPTIONAL null-padding, plus anything VALUES (UNDEF)
    # or a sub-SELECT (its own optionals) contributes. Tracked so the
    # EXISTS/NOT EXISTS/MINUS joins below can switch to SPARQL's
    # substitution semantics (unbound = free) exactly where needed —
    # treating a never-null column as nullable would only cost plan
    # shape, never correctness, so the VALUES/subquery accounting is
    # deliberately conservative.
    nullable: set[str] = set()
    for grp in optional:
        if isinstance(grp, dict):
            # {'patterns': [...], 'filters': [...]}: SPARQL's leftjoin
            # with a filter over the GROUP'S OWN variables — equivalent
            # to filtering the group before the left join (shared
            # variables are equal across compatible solutions, so
            # pre-join filtering on them is also exact). A filter
            # naming a variable the group does not bind raises at
            # analysis (unresolved column) — the cross-group leftjoin
            # condition is deliberately out of scope.
            grp, gfilters = grp["patterns"], grp.get("filters", ())
        else:
            gfilters = ()
        g, gvars = _compile_bgp(
            triples, grp, allow_product, broadcast_min_constants,
            var_pred_source, stats=stats,
        )
        for e in gfilters:
            g = g.filter(F.expr(e))
        if not gvars:
            raise ValueError(
                f"OPTIONAL group {grp!r} binds no variables; a ground "
                "existence check belongs in the required patterns"
            )
        shared = sorted(gvars & bound)
        if not shared:
            raise ValueError(
                f"OPTIONAL group {grp!r} shares no variable with the bound "
                f"set {sorted(bound)} — a left cross product"
            )
        out = out.join(g, on=shared, how="left")
        nullable |= gvars - bound
        bound |= gvars
    if values is not None:
        vdf = (
            values
            if isinstance(values, DataFrame)
            else values_frame(triples.sparkSession, list(values))
        )
        out, vcols = _join_values(out, vdf, bound, nullable)
        nullable |= vcols - bound
        bound |= vcols
    for sq in subqueries:
        sshared = sorted(set(sq.columns) & bound)
        if sshared:
            out = out.join(sq, on=sshared, how="inner")
        else:
            # the spec's cartesian extension; no broadcast hint — see above
            out = out.crossJoin(sq)
        nullable |= set(sq.columns) - bound
        bound |= set(sq.columns)
    for kind, groups_, how in (
        ("EXISTS", exists, "left_semi"),
        ("NOT EXISTS", not_exists, "left_anti"),
        ("MINUS", minus, "left_anti"),
    ):
        for grp in groups_:
            g, gvars = _compile_bgp(
                triples, grp, allow_product, broadcast_min_constants,
                var_pred_source, stats=stats,
            )
            shared = sorted(gvars & bound)
            if not shared:
                if kind == "MINUS":
                    continue  # disjoint domains: MINUS removes nothing
                raise ValueError(
                    f"{kind} group {grp!r} shares no variable with the "
                    f"bound set {sorted(bound)} — the test would be constant"
                )
            # the group's private variables are existential: project to the
            # shared key before the semi/anti-join so they can't multiply
            # (or under-remove) rows
            proj = g.select(*shared).distinct()
            null_shared = [v for v in shared if v in nullable]
            if not null_shared:
                out = out.join(proj, on=shared, how=how)
                continue
            # a shared variable can be NULL (unbound) in some rows.
            # SPARQL substitution semantics: only BOUND variables
            # substitute into the EXISTS body — an unbound one is free,
            # so it must act as a wildcard, which a plain equi-join
            # (NULL matches nothing) gets wrong. MINUS differs again:
            # compatibility plus a NON-EMPTY shared domain, so at least
            # one shared variable must be actually bound AND equal.
            # The OR-with-isNull condition makes this a broadcast
            # nested-loop join; the build side is the projected DISTINCT
            # binding set of the existence body (selective by nature),
            # hinted broadcast explicitly.
            gg = proj.select(
                *[F.col(v).alias(f"__ex_{v}") for v in shared]
            )
            cond = None
            for v in shared:
                eq = F.col(v) == F.col(f"__ex_{v}")
                term = (eq | F.col(v).isNull()) if v in nullable else eq
                cond = term if cond is None else (cond & term)
            if kind == "MINUS":
                some_bound = None
                for v in shared:
                    nn = F.col(v).isNotNull()
                    some_bound = nn if some_bound is None else (some_bound | nn)
                cond = cond & some_bound
            out = out.join(F.broadcast(gg), on=cond, how=how)
    if filter_expr is not None:
        exprs = [filter_expr] if isinstance(filter_expr, str) else filter_expr
        for e in exprs:
            out = out.filter(F.expr(e))
    return _project(out, bound, select)


def bgp_union(
    triples: DataFrame,
    groups: Sequence[Sequence[Pattern]],
    select: Sequence[str] | None = None,
    allow_product: bool = False,
    broadcast_min_constants: int = 2,
    paths: bool = False,
    max_iters: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """SPARQL ``UNION``: the bag union of each group's solution set.

    Groups are compiled independently (each may bind a different variable
    set); a variable bound in only some branches null-pads in the others
    (``unionByName(allowMissingColumns=True)``), exactly SPARQL's
    set-of-mappings union. Distributed shape: a UNION is plan-level —
    Spark unions the child plans with no shuffle of its own.

    ``paths=True`` resolves property-path predicates inside the branches
    (the ``bgp_match_paths`` treatment: one closure-augmented scan shared
    by every branch, variable-predicate patterns kept on the original
    table, sequence-path existentials dropped per branch before the
    union so they never null-pad across branches)."""
    if not groups:
        raise ValueError("UNION needs at least one group")
    if paths:
        counter = [0]
        groups = [expand_path_patterns(g, counter) for g in groups]
        scan = with_path_closures(
            triples, [p for g in groups for p in g], max_iters=max_iters
        )
        var_pred_source = triples
    else:
        scan, var_pred_source = triples, None
    sols: list[DataFrame] = []
    all_bound: set[str] = set()
    for grp in groups:
        g, gvars = _compile_bgp(
            scan, grp, allow_product, broadcast_min_constants,
            var_pred_source, stats=stats,
        )
        public = {v for v in gvars if not v.startswith("__path")}
        if not public:
            raise ValueError(f"UNION branch {grp!r} binds no variables")
        sols.append(_project(g, gvars, None).drop(*(gvars - public)))
        all_bound |= public
    out = sols[0]
    for s in sols[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return _project(out, all_bound, select)


def expand_path_patterns(
    patterns: Sequence[Pattern], counter: list[int]
) -> list[Pattern]:
    """Rewrite composite property-path predicates into primitive patterns.

    Handled purely as pattern algebra (zero plan cost):

    * sequence ``p1/p2/...`` — chained patterns through fresh existential
      variables (``?__pathN``; the prefix is reserved and dropped from the
      default projection by ``bgp_match_paths``);
    * inverse ``^p`` — subject/object swap of that pattern (``^`` inverts
      the whole remaining element, so ``^p+`` is the inverse closure —
      closure and inverse commute).

    Trailing ``+``/``*`` closures and ``a|b`` alternations survive the
    rewrite as predicate terms for ``with_path_closures`` to materialize.
    ``counter`` is a 1-element mutable list so fresh variables stay unique
    across the required / OPTIONAL / negation groups of one query.
    """
    out: list[Pattern] = []
    for pat in patterns:
        if len(pat) != 3:
            raise ValueError(
                f"property paths are defined over the default graph; got a "
                f"{len(pat)}-term pattern {pat!r} — pre-filter the quad "
                "table to one graph and use 3-term patterns"
            )
        s, p, o = pat
        # '^<iri>' is inverse-of-opaque: check iri-ref-ness past the '^'
        core = p[1:] if (not is_var(p) and p.startswith("^")) else p
        # sequence detection is bracket-aware: '/' INSIDE a '<iri>' is
        # part of the iri (http://...), only a top-level '/' is a hop
        # separator — '<http://a>/<http://b>' is a two-hop sequence of
        # opaque iris, not one giant predicate name
        elems = (
            None
            if is_var(p) or is_iri_ref(core)
            else _split_outside_iri(p, "/")
        )
        if elems is None or len(elems) == 1:
            steps = [(s, p, o)]
        else:
            if len(_split_outside_iri(p, "|")) > 1:
                # SPARQL precedence: '|' binds LOOSEST, so 'a|b/c' is
                # a|(b/c) — not expressible by this flat splitter; make
                # the ambiguity loud instead of guessing
                raise ValueError(
                    f"mixed alternation and sequence in one path ({p!r}) "
                    "is not supported; rewrite as a UNION of path groups"
                )
            if any(not e for e in elems):
                raise ValueError(
                    f"empty element in path {p!r}; write IRI predicates "
                    "containing '/' as '<iri>' to keep them opaque"
                )
            hops = [s]
            for _ in elems[:-1]:
                hops.append(f"?__path{counter[0]}")
                counter[0] += 1
            hops.append(o)
            steps = [
                (hops[i], e, hops[i + 1]) for i, e in enumerate(elems)
            ]
        for ss, pp, oo in steps:
            if (
                not is_var(pp)
                and pp.startswith("^")
                and (is_iri_ref(pp[1:]) or "|" not in pp)
            ):
                # whole-element inverse; '^a|b' is NOT whole-element —
                # SPARQL binds '^' tighter than '|', so it stays a term
                # and the alternation parser inverts the ^a branch only
                out.append((oo, pp[1:], ss))
            else:
                out.append((ss, pp, oo))
    return out


def with_path_closures(
    triples: DataFrame, patterns: Sequence[Pattern], max_iters: int = 20
) -> DataFrame:
    """Augment a triple table with the derived relations (closures and
    alternations) every property-path predicate in ``patterns`` needs.

    A constant predicate ending in '+' (one-or-more hops) or '*'
    (zero-or-more) is a SPARQL 1.1 property path: for each such predicate
    the base relation's transitive closure is materialized ONCE via the
    distributed path-doubling fixpoint (operators/graph.transitive_closure,
    O(log diameter) shuffle rounds) and unioned in under the path predicate
    itself — so the pattern stays an ordinary constant-predicate scan and
    the BGP compiler is unchanged. '*' additionally unions the identity
    pair for every node of the KG (SPARQL zero-length path semantics).

    Path solutions are DISTINCT node pairs (per the SPARQL spec: a path
    predicate never multiplies solutions by route count), and the closure
    assumes the hierarchy-shaped DAGs the engine computes closures for
    elsewhere — a cycle is bounded by ``max_iters`` doublings.
    """
    from ontology_mapping_spark.operators import graph as G

    path_preds = {
        p
        for (_s, p, _o) in patterns
        if not is_var(p)
        and not is_iri_ref(p)
        and len(p) > 1
        and p[-1] in "+*"
    }
    aug = triples
    # the distinct node set feeds every '*' and '?' identity union; build
    # ONE plan and share the object across predicates — the identical
    # distinct subtrees then canonicalize to the same exchange and Spark's
    # ReuseExchange evaluates the full-table union+distinct once per
    # query instead of once per '*'/'?' predicate (plan stays lazy: no
    # eager checkpoint at compile time)
    _nodes_cache: list[DataFrame | None] = [None]

    def _all_nodes() -> DataFrame:
        if _nodes_cache[0] is None:
            _nodes_cache[0] = (
                triples.select(F.col("subject").alias("n"))
                .unionByName(triples.select(F.col("object").alias("n")))
                .distinct()
            )
        return _nodes_cache[0]

    for pp in sorted(path_preds):
        base = pp[:-1]
        if "|" in base and not is_iri_ref(base):
            raise ValueError(
                f"closure over an alternation ({pp!r}) is not supported; "
                "rewrite as a UNION of path groups"
            )
        if base.startswith("!"):
            raise ValueError(
                f"closure over a negated property set ({pp!r}) is not "
                "supported"
            )
        edges = triples.filter(F.col("predicate") == _strip_iri(base)).select(
            F.col("subject").alias("child"), F.col("object").alias("parent")
        )
        clo = G.transitive_closure(edges, max_iters=max_iters)
        pairs = clo.select(
            F.col("node").alias("subject"),
            F.lit(pp).alias("predicate"),
            F.col("ancestor").alias("object"),
        )
        if pp.endswith("*"):
            nodes = _all_nodes()
            pairs = pairs.unionByName(
                nodes.select(
                    F.col("n").alias("subject"),
                    F.lit(pp).alias("predicate"),
                    F.col("n").alias("object"),
                )
            ).distinct()
            # distinct: a node on a cycle reaches itself through the
            # one-or-more closure AND the zero-length identity row; the
            # pair must still be ONE solution (closure output is already
            # pair-distinct, so only the '*' union needs this)
        aug = aug.unionByName(pairs.select("subject", "predicate", "object"))
    # alternation 'a|b' (branches plain or inverse): the derived relation
    # is the plan-level union of the branch scans under the composite
    # predicate term — the pattern then stays a constant-predicate scan.
    # Bag semantics: SPARQL path alternation is a bag union of the
    # branches, so no dedup here.
    alt_preds = {
        p
        for (_s, p, _o) in patterns
        if not is_var(p)
        and not is_iri_ref(p)
        and "|" in p
        and p not in path_preds
        and not p.startswith("!")  # '!(a|b)' is a negated set, below
    }
    for ap in sorted(alt_preds):
        rows = None
        for branch in ap.split("|"):
            if not branch:
                raise ValueError(f"empty branch in alternation {ap!r}")
            if branch[-1] in "+*?":
                raise ValueError(
                    f"closure/zero-or-one inside alternation ({branch!r} in "
                    f"{ap!r}) is not supported; rewrite as a UNION of path "
                    "groups"
                )
            if "!" in branch:
                raise ValueError(
                    f"negated property set inside alternation ({branch!r} "
                    f"in {ap!r}) is not supported; fold the members into "
                    "one '!(...)' set or rewrite as a UNION of path groups"
                )
            inv = branch.startswith("^")
            name = _strip_iri(branch[1:] if inv else branch)
            scan = triples.filter(F.col("predicate") == name)
            part = scan.select(
                F.col("object" if inv else "subject").alias("subject"),
                F.lit(ap).alias("predicate"),
                F.col("subject" if inv else "object").alias("object"),
            )
            rows = part if rows is None else rows.unionByName(part)
        aug = aug.unionByName(rows)
    # zero-or-one 'p?': the base scan plus the identity pair for every
    # node, DISTINCT (SPARQL path solutions are node pairs, and a
    # self-loop must not double with its identity row). Same shape as
    # the '*' zero-length handling, minus the closure.
    opt_preds = {
        p
        for (_s, p, _o) in patterns
        if not is_var(p)
        and not is_iri_ref(p)
        and len(p) > 1
        and p.endswith("?")
    }
    for op_ in sorted(opt_preds):
        base = op_[:-1]
        if base[-1] in "+*?|)" or base.startswith(("!", "^")):
            raise ValueError(
                f"'?' must follow a plain or '<iri>' predicate, got {op_!r}"
            )
        scan = triples.filter(F.col("predicate") == _strip_iri(base)).select(
            "subject", F.lit(op_).alias("predicate"), "object"
        )
        nodes = _all_nodes()
        rows = scan.unionByName(
            nodes.select(
                F.col("n").alias("subject"),
                F.lit(op_).alias("predicate"),
                F.col("n").alias("object"),
            )
        ).distinct()
        aug = aug.unionByName(rows.select("subject", "predicate", "object"))
    # negated property set '!p' / '!(p1|p2|^q)': the complement scan —
    # forward edges whose predicate is NOT in the forward member set,
    # plus reversed edges whose predicate is NOT in the inverse member
    # set (SPARQL 1.1 NPS: a pure-forward set has no inverse part and
    # vice versa). One filtered pass per direction, no joins.
    neg_preds = set()
    for _s, p, _o in patterns:
        if is_var(p) or is_iri_ref(p):
            continue
        if "!" in p and not p.startswith("!"):
            raise ValueError(
                f"'!' inside a composite path ({p!r}) is not supported; a "
                "negated property set stands alone (optionally inverse "
                "members inside: '!(a|^b)')"
            )
        if p.startswith("!"):
            neg_preds.add(p)
    for np_ in sorted(neg_preds):
        inner = np_[1:]
        if inner.startswith("(") and inner.endswith(")"):
            inner = inner[1:-1]
        elif "|" in inner:
            # SPARQL binds '!' tighter than '|': '!a|b' is (!a)|b, which
            # this flat handler cannot express — demand parens or a UNION
            raise ValueError(
                f"ambiguous '!' beside alternation ({np_!r}): parenthesize "
                "the negated set ('!(a|b)') or rewrite as a UNION of path "
                "groups"
            )
        members = inner.split("|")
        if not inner or any(not m or m == "^" for m in members):
            raise ValueError(f"empty member in negated property set {np_!r}")
        for m in members:
            core = _strip_iri(m[1:] if m.startswith("^") else m)
            if any(c in "+*/?!^" for c in core):
                raise ValueError(
                    f"negated property set members must be plain or inverse "
                    f"predicates, got {m!r} in {np_!r}"
                )
        fwd = [_strip_iri(m) for m in members if not m.startswith("^")]
        inv = [_strip_iri(m[1:]) for m in members if m.startswith("^")]
        parts = []
        if fwd:
            parts.append(
                triples.filter(~F.col("predicate").isin(fwd)).select(
                    "subject", F.lit(np_).alias("predicate"), "object"
                )
            )
        if inv:
            parts.append(
                triples.filter(~F.col("predicate").isin(inv)).select(
                    F.col("object").alias("subject"),
                    F.lit(np_).alias("predicate"),
                    F.col("subject").alias("object"),
                )
            )
        rows = parts[0]
        for pt in parts[1:]:
            rows = rows.unionByName(pt)
        aug = aug.unionByName(rows.select("subject", "predicate", "object"))
    return aug


def bgp_match_paths(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    select: Sequence[str] | None = None,
    allow_product: bool = False,
    max_iters: int = 20,
    optional: Sequence[Sequence[Pattern]] = (),
    filter_expr: str | Sequence[str] | None = None,
    exists: Sequence[Sequence[Pattern]] = (),
    not_exists: Sequence[Sequence[Pattern]] = (),
    minus: Sequence[Sequence[Pattern]] = (),
    values: DataFrame | Sequence[dict] | None = None,
    subqueries: Sequence[DataFrame] = (),
    stats: dict | None = None,
) -> DataFrame:
    """``bgp_match`` with SPARQL 1.1 property-path predicates resolved:

    * ``pred+`` / ``pred*``  — one-or-more / zero-or-more hops, through
      the distributed transitive closure;
    * ``pred?``              — zero-or-one hop (base scan plus the
      identity pair per node, distinct);
    * ``^pred``              — inverse (pure pattern rewrite; composes
      with a trailing closure, e.g. ``^broader+``);
    * ``p1/p2/...``          — sequence, chained through fresh
      existential variables (never projected);
    * ``a|b``                — alternation of plain/inverse predicates
      (bag union of the branch scans);
    * ``!p`` / ``!(p1|^q)``  — negated property set (complement scans,
      forward and/or inverse per the member directions).

    Paths work the same inside OPTIONAL and negation groups. Variable-
    predicate patterns in the same BGP scan the ORIGINAL table
    (``var_pred_source``): synthetic closure/alternation rows are the
    path relation, not dataset triples, and must not bind a ?p."""
    counter = [0]
    patterns = expand_path_patterns(patterns, counter)

    def _expand_opt(g):
        if isinstance(g, dict):
            return {**g, "patterns": expand_path_patterns(g["patterns"], counter)}
        return expand_path_patterns(g, counter)

    optional = [_expand_opt(g) for g in optional]
    exists = [expand_path_patterns(g, counter) for g in exists]
    not_exists = [expand_path_patterns(g, counter) for g in not_exists]
    minus = [expand_path_patterns(g, counter) for g in minus]
    all_patterns = list(patterns)
    for grp in (*optional, *exists, *not_exists, *minus):
        all_patterns.extend(grp["patterns"] if isinstance(grp, dict) else grp)
    out = bgp_match(
        with_path_closures(triples, all_patterns, max_iters=max_iters),
        patterns,
        select=select,
        allow_product=allow_product,
        optional=optional,
        filter_expr=filter_expr,
        var_pred_source=triples,
        exists=exists,
        not_exists=not_exists,
        minus=minus,
        values=values,
        subqueries=subqueries,
        stats=stats,
    )
    # sequence rewrites bind reserved ?__pathN existentials; they are not
    # part of the query's projection
    synth = [c for c in out.columns if c.startswith("__path")]
    if synth and len(synth) == len(out.columns):
        # every endpoint was ground: keep existence semantics (one row
        # per solution), mirroring the all-ground BGP contract
        return out.select(F.lit(True).alias("matched"))
    return out.drop(*synth)


def bgp_construct(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    template: Sequence[Pattern],
    allow_product: bool = False,
    optional: Sequence[Sequence[Pattern]] = (),
    filter_expr: str | Sequence[str] | None = None,
    distinct: bool = True,
    paths: bool = False,
    exists: Sequence[Sequence[Pattern]] = (),
    not_exists: Sequence[Sequence[Pattern]] = (),
    minus: Sequence[Sequence[Pattern]] = (),
    values: DataFrame | Sequence[dict] | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """SPARQL ``CONSTRUCT``: materialize new triples from BGP solutions —
    the engine's rule-based inference primitive (e.g. derive
    ``grandparent`` edges from two ``broader`` hops, or lift a
    same-as + label pair into a label for the canonical node).

    ``template`` is a sequence of (s, p, o) terms: '?name' substitutes the
    solution binding, anything else is a constant. Every template triple
    is emitted once per solution (then deduplicated — SPARQL CONSTRUCT
    produces a GRAPH, i.e. a triple set; pass ``distinct=False`` to keep
    the solution bag when feeding support-counting downstream, e.g.
    ``kgmaint.merge_triples``). Solutions with an unbound (NULL) variable
    in a template position drop that template triple, per the SPARQL spec.

    The output schema is (subject, predicate, object) — directly
    unionable into the KG, mergeable via kgmaint, and queryable by
    ``bgp_match``. Plan shape: the solution join tree from ``bgp_match``
    plus one projection per template triple unioned plan-level; dedup is
    one hash aggregate on the triple key.

    ``paths=True`` routes matching through ``bgp_match_paths`` so rules
    can range over property paths (e.g. lift ``broader+`` into a
    materialized ``ancestor`` edge). ``not_exists``/``minus``/``values``
    pass through to the matcher.
    """
    if not template:
        raise ValueError("CONSTRUCT needs at least one template triple")
    matcher = bgp_match_paths if paths else bgp_match
    sols = matcher(
        triples,
        patterns,
        allow_product=allow_product,
        optional=optional,
        filter_expr=filter_expr,
        exists=exists,
        not_exists=not_exists,
        minus=minus,
        values=values,
        stats=stats,
    )
    out = _instantiate_templates(sols, template)
    return out.distinct() if distinct else out


def _instantiate_templates(
    sols: DataFrame, template: Sequence[Pattern]
) -> DataFrame:
    """Emit one (subject, predicate, object) row per solution per template
    triple (bag — callers dedup where graph-set semantics apply).
    Solutions with an unbound (NULL) variable in a template position drop
    that template triple, per the SPARQL spec. Shared by ``bgp_construct``
    and the UPDATE forms (``update_graph``).

    A ``_:label`` template term is a BLANK NODE: one fresh node per
    solution (the SPARQL CONSTRUCT reification idiom — ``_:m type
    Mention . _:m of ?x``), minted DETERMINISTICALLY as the label plus
    the xxhash64 of the full solution binding, so template triples
    sharing a label within one solution share the node, re-runs are
    reproducible, and duplicate solutions collapse to one node (the only
    choice consistent with CONSTRUCT's graph-set output; a rule engine
    re-deriving the same solution converges instead of minting forever).
    """
    bound = set(sols.columns)
    # hash the JSON of the full binding, not the raw columns: xxhash64
    # folds NULL arguments into nothing, so (x='a', y=NULL) and (x=NULL,
    # y='a') would collide and fuse two solutions' blank nodes; to_json
    # keeps field names and drops only null fields — injective over the
    # fixed column set
    if bound:
        bnode_seed = F.to_json(F.struct(*[F.col(c) for c in sorted(bound)]))
    else:
        bnode_seed = F.lit("")

    def term(t: str):
        if is_var(t):
            name = t[1:]
            if name not in bound:
                raise ValueError(
                    f"template variable {t!r} is not bound by the patterns "
                    f"(bound: {sorted(bound)})"
                )
            return F.col(name)
        if t.startswith("_:") and len(t) > 2:
            return F.concat(
                F.lit(t + "_"), F.xxhash64(bnode_seed).cast("string")
            )
        return F.lit(_strip_iri(t))

    parts = []
    for tpl in template:
        if len(tpl) != 3:
            raise ValueError(
                f"CONSTRUCT/UPDATE templates emit triples; got a "
                f"{len(tpl)}-term template {tpl!r}"
            )
        s, p, o = tpl
        row = sols.select(
            term(s).alias("subject"),
            term(p).alias("predicate"),
            term(o).alias("object"),
        )
        # SPARQL: a template triple with an unbound term is not produced
        row = row.filter(
            F.col("subject").isNotNull()
            & F.col("predicate").isNotNull()
            & F.col("object").isNotNull()
        )
        parts.append(row)
    out = parts[0]
    for p_ in parts[1:]:
        out = out.unionByName(p_)
    return out


def bgp_ask(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    allow_product: bool = False,
    paths: bool = False,
    optional: Sequence[Sequence[Pattern]] = (),
    filter_expr: str | Sequence[str] | None = None,
    exists: Sequence[Sequence[Pattern]] = (),
    not_exists: Sequence[Sequence[Pattern]] = (),
    minus: Sequence[Sequence[Pattern]] = (),
    values: DataFrame | Sequence[dict] | None = None,
    subqueries: Sequence[DataFrame] = (),
    stats: dict | None = None,
) -> DataFrame:
    """SPARQL ``ASK``: does at least one solution exist?

    Returns a LAZY one-column DataFrame ``(ask: boolean)`` with exactly
    one row — true or false — so the existence test stays a plan until
    the caller acts on it (``.first()["ask"]`` for the scalar). Plan
    shape: the solution tree capped by LIMIT 1 (Spark stops the scan at
    the first produced row — a CollectLimit, not a full count), then a
    count-nonzero projection; cost is bounded by finding ONE solution,
    not enumerating all of them.
    """
    matcher = bgp_match_paths if paths else bgp_match
    sols = matcher(
        triples,
        patterns,
        allow_product=allow_product,
        optional=optional,
        filter_expr=filter_expr,
        exists=exists,
        not_exists=not_exists,
        minus=minus,
        values=values,
        subqueries=subqueries,
        stats=stats,
    )
    return ask_plan(sols)


def ask_plan(sols: DataFrame) -> DataFrame:
    """The existence-plan tail shared by every ASK route (``bgp_ask``
    and the text front-end's ASK-over-UNION): LIMIT 1 caps the solution
    tree (a CollectLimit — the scan stops at the first produced row),
    then a count-nonzero projection yields the single boolean ``ask``
    row. Kept in one place so the plan shape and column name can never
    diverge between routes."""
    return (
        sols.limit(1)
        .select(F.lit(1).alias("__one"))
        .agg((F.count("__one") > 0).alias("ask"))
    )


_AGG_FUNCS = (
    "count",
    "count_distinct",
    "sum",
    "sum_distinct",
    "avg",
    "avg_distinct",
    "min",
    "max",
    "sample",
    "group_concat",
    "group_concat_distinct",
)


def _var_name(term: str) -> str:
    """'?x' -> 'x' (plain names pass through, for symmetry with select=)."""
    return term[1:] if term.startswith("?") else term


def _agg_column(func: str, var: str, alias: str):
    """One SPARQL aggregate -> a Spark aggregate Column.

    ``func`` is one of ``_AGG_FUNCS``; ``group_concat`` takes an optional
    separator after ':' (``'group_concat:;'``; the SPARQL default is a
    single space). Determinism choices, pinned here because the gate
    hashes values: GROUP_CONCAT sorts its group before joining (SPARQL
    leaves the order undefined — an undefined order is useless for a
    reproducible pipeline), and SAMPLE is the group minimum (the spec
    allows any member; min is the one choice that is retry- and
    partitioning-stable). Every form is partial-aggregable, so Spark
    runs it map-side-combined (partial_... + merge_...)."""
    name = _var_name(alias)
    sep = " "
    if ":" in func and func.split(":", 1)[0] in (
        "group_concat",
        "group_concat_distinct",
    ):
        func, _, sep = func.partition(":")
    if func not in _AGG_FUNCS:
        raise ValueError(
            f"unknown aggregate {func!r}; expected one of {_AGG_FUNCS} "
            "(group_concat[_distinct] may carry ':<sep>')"
        )
    if var == "*":
        if func != "count":
            raise ValueError(f"'*' is only valid with count, got {func!r}")
        return F.count(F.lit(1)).alias(name)
    # SPARQL allows aggregates over expressions, not just variables:
    # anything beyond a plain name is Spark SQL over the variable columns
    arg = _var_name(var)
    plain = bool(re.fullmatch(r"\w+", arg))
    col = F.col(arg) if plain else F.expr(arg)
    if func == "count":
        return F.count(col).alias(name)
    if func == "count_distinct":
        return F.count_distinct(col).alias(name)
    if func == "sum_distinct":
        return F.sum_distinct(col).alias(name)
    if func == "avg_distinct":
        return F.expr(f"avg(DISTINCT {arg})").alias(name)
    if func == "sample":
        return F.min(col).alias(name)
    if func == "group_concat":
        return F.array_join(F.sort_array(F.collect_list(col)), sep).alias(
            name
        )
    if func == "group_concat_distinct":
        return F.array_join(F.sort_array(F.collect_set(col)), sep).alias(
            name
        )
    return getattr(F, func)(col).alias(name)


def solution_modifiers(
    sols: DataFrame,
    *,
    bind: Sequence[tuple[str, str]] | None = None,
    group_by: Sequence[str] | None = None,
    aggregates: Sequence[tuple[str, str, str]] | None = None,
    having: str | None = None,
    select: Sequence[str] | None = None,
    distinct: bool = False,
    order_by: Sequence[str] | None = None,
    limit: int | None = None,
    offset: int | None = None,
) -> DataFrame:
    """SPARQL 1.1 solution modifiers over a solution DataFrame (one column
    per variable — the output of ``bgp_match`` / ``bgp_union`` /
    ``bgp_match_paths``, or any DataFrame shaped like one).

    Applied in the spec's evaluation order (SPARQL 1.1 §18.2.4-18.2.5):

    * ``bind`` — ordered (``?var``, sql_expr) pairs, each a SPARQL
      ``BIND(expr AS ?var)``: the expression (over the columns bound so
      far, including earlier binds) extends every solution. This is where
      plain-literal objects become numbers for sum/avg
      (``("?w", "CAST(weight AS DOUBLE)")``).
    * ``group_by`` + ``aggregates`` — ``aggregates`` is a sequence of
      (func, ?var-or-'*', ?alias) triples, func in ``_AGG_FUNCS``
      (``group_concat`` may carry ':<sep>'). ``aggregates`` without
      ``group_by`` is the single-group form (one global row);
      ``group_by`` without ``aggregates`` is rejected (SPARQL projects
      only grouped/aggregated variables — an implicit SAMPLE would hide a
      bug). ``having`` filters groups by an SQL expression over the
      grouped keys and aggregate aliases.
    * ``select`` — projection (defaults to everything bound).
    * ``distinct`` — DISTINCT over the projection.
    * ``order_by`` — '?var' / '?var DESC' keys. Callers wanting a
      deterministic LIMIT slice must make the order total (add tiebreak
      keys): ties under a partial order are partitioning-dependent.
    * ``offset`` / ``limit`` — the slice of the ordered sequence.

    Deviation from the spec's letter, for a reason: the spec orders the
    sequence BEFORE projecting/deduplicating; this compiles DISTINCT
    first, then ORDER BY — identical results whenever the order keys are
    projected (which SPARQL itself requires of DISTINCT queries), and it
    lets Spark plan ORDER BY + LIMIT as a TakeOrderedAndProject (per-
    partition top-k, one singleton merge — no global sort) instead of
    sorting before a shuffling dedup.

    Scale notes: every aggregate here is partial-aggregable (incl.
    group_concat's collect_list), so the groupBy is one hash-partition
    exchange with map-side combine; a bare LIMIT without ORDER BY is a
    CollectLimit (scan stops early); OFFSET ships with its LIMIT in one
    GlobalLimit — rows are skipped at the merge, never materialized."""
    out = sols
    if bind:
        for v, e in bind:
            name = _var_name(v)
            if name in out.columns:
                raise ValueError(
                    f"BIND target ?{name} is already bound (SPARQL forbids "
                    "rebinding); project it away first"
                )
            out = out.withColumn(name, F.expr(e))
    if aggregates:
        keys = [_var_name(g) for g in (group_by or ())]
        missing = [k for k in keys if k not in out.columns]
        if missing:
            raise ValueError(f"group_by references unbound variables: {missing}")
        aggs = [_agg_column(f, v, a) for (f, v, a) in aggregates]
        out = out.groupBy(*keys).agg(*aggs)
        if having is not None:
            out = out.filter(F.expr(having))
    elif group_by:
        raise ValueError(
            "group_by without aggregates: SPARQL projects only grouped or "
            "aggregated variables — add aggregates, or use distinct=True "
            "for plain dedup"
        )
    elif having is not None:
        raise ValueError("HAVING requires aggregation (SPARQL 1.1 §18.2.4.4)")
    if select is not None:
        names = [_var_name(s) for s in select]
        missing = [n for n in names if n not in out.columns]
        if missing:
            raise ValueError(f"select references unbound variables: {missing}")
        out = out.select(*names)
    if distinct:
        out = out.distinct()
    if order_by:
        keys = []
        for o in order_by:
            parts = o.split()
            if len(parts) > 2 or (
                len(parts) == 2 and parts[1].upper() not in ("ASC", "DESC")
            ):
                raise ValueError(f"order_by key must be '?var [ASC|DESC]', got {o!r}")
            c = F.col(_var_name(parts[0]))
            keys.append(
                c.desc() if len(parts) == 2 and parts[1].upper() == "DESC" else c.asc()
            )
        out = out.orderBy(*keys)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def bgp_select(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    *,
    paths: bool = False,
    allow_product: bool = False,
    optional: Sequence[Sequence[Pattern]] = (),
    filter_expr: str | Sequence[str] | None = None,
    exists: Sequence[Sequence[Pattern]] = (),
    not_exists: Sequence[Sequence[Pattern]] = (),
    minus: Sequence[Sequence[Pattern]] = (),
    values: DataFrame | Sequence[dict] | None = None,
    subqueries: Sequence[DataFrame] = (),
    bind: Sequence[tuple[str, str]] | None = None,
    group_by: Sequence[str] | None = None,
    aggregates: Sequence[tuple[str, str, str]] | None = None,
    having: str | None = None,
    select: Sequence[str] | None = None,
    distinct: bool = False,
    order_by: Sequence[str] | None = None,
    limit: int | None = None,
    offset: int | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """SPARQL ``SELECT`` with the full modifier pipeline: match the BGP
    (``bgp_match``, or ``bgp_match_paths`` when ``paths=True``), then apply
    BIND / GROUP BY-aggregates / HAVING / projection / DISTINCT /
    ORDER BY / OFFSET / LIMIT via :func:`solution_modifiers`.

    The analytics face of the KG: "top 10 entities by mention count",
    "labels per class, alphabetized", "average depth by branch" are each
    one call — and one Spark job whose aggregate runs map-side-combined
    and whose ordered LIMIT is a TakeOrderedAndProject, exactly the plan
    you would hand-write at 10^12 triples."""
    matcher = bgp_match_paths if paths else bgp_match
    sols = matcher(
        triples,
        patterns,
        allow_product=allow_product,
        optional=optional,
        filter_expr=filter_expr,
        exists=exists,
        not_exists=not_exists,
        minus=minus,
        values=values,
        subqueries=subqueries,
        stats=stats,
    )
    return solution_modifiers(
        sols,
        bind=bind,
        group_by=group_by,
        aggregates=aggregates,
        having=having,
        select=select,
        distinct=distinct,
        order_by=order_by,
        limit=limit,
        offset=offset,
    )


def update_graph(
    triples: DataFrame,
    patterns: Sequence[Pattern],
    delete: Sequence[Pattern] = (),
    insert: Sequence[Pattern] = (),
    *,
    paths: bool = False,
    allow_product: bool = False,
    optional: Sequence[Sequence[Pattern]] = (),
    filter_expr: str | Sequence[str] | None = None,
    exists: Sequence[Sequence[Pattern]] = (),
    not_exists: Sequence[Sequence[Pattern]] = (),
    minus: Sequence[Sequence[Pattern]] = (),
    values: DataFrame | Sequence[dict] | None = None,
    subqueries: Sequence[DataFrame] = (),
    bind: Sequence[tuple[str, str]] | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """SPARQL UPDATE ``DELETE { } INSERT { } WHERE { }`` over the triple
    table: returns the post-update graph (the caller owns persistence —
    write it back through ``kgmaint.upsert_observations`` / StageRunner
    for the atomic-swap + lineage story).

    One solution pass feeds BOTH templates (matching SPARQL's evaluate-
    WHERE-once-then-apply semantics — an inserted triple can never match
    its own WHERE, and a deleted one still instantiates the INSERT
    template). ``delete`` defaults to the shorthand ``DELETE WHERE``
    (the patterns themselves are the delete template) when ``insert`` is
    empty; pass both for the rename/rewrite idiom (e.g. retarget every
    edge of a deprecated predicate).

    Set semantics, as RDF Update specifies graphs: DELETE removes every
    copy of a matched triple (anti-join on the full key), and INSERT
    normalizes each of its triples to exactly one copy (existing
    duplicates of an inserted triple collapse) — so an update is
    idempotent: re-running it yields the identical graph.

    ``bind`` is SPARQL ``BIND``: (``?var``, Spark-SQL expression)
    pairs computed over the solutions AFTER the match (the same
    contract as the SELECT pipeline — a FILTER cannot reference a BIND
    variable), so templates can mint computed values. ``subqueries``
    passes through to the matcher.

    Plan shape at 10^12 triples: the delete- and insert-sets are
    solution-sized (dimension-sized, from a selective WHERE), so the
    update is ONE broadcast anti-join over the graph scan — triples
    matching either set drop, then the insert-set unions back in
    plan-level. The graph is scanned once and never shuffled."""
    if "graph" in triples.columns:
        # the delete key and the insert schema are (s, p, o): applied to a
        # quad table the anti-join would silently drop matched triples
        # from EVERY named graph, and a non-empty insert would fail late
        # on the 3-vs-4-column union — refuse loudly instead
        raise ValueError(
            "update_graph is triple-scoped; for a quad table, filter to "
            "one graph first and re-attach the graph column to the result"
        )
    if not delete and not insert:
        if paths:
            raise ValueError(
                "DELETE WHERE shorthand cannot range over property paths "
                "(closure rows are derived, not dataset triples); pass an "
                "explicit delete template"
            )
        delete = tuple(patterns)
    for pat in delete:
        for t in pat:
            if isinstance(t, str) and t.startswith("_:"):
                raise ValueError(
                    "blank nodes cannot appear in a DELETE template "
                    "(SPARQL UPDATE forbids them; a fresh node can never "
                    "name an existing triple)"
                )
    matcher = bgp_match_paths if paths else bgp_match
    sols = matcher(
        triples,
        patterns,
        allow_product=allow_product,
        optional=optional,
        filter_expr=filter_expr,
        exists=exists,
        not_exists=not_exists,
        minus=minus,
        values=values,
        subqueries=subqueries,
        stats=stats,
    )
    if bind:
        for var, expr in bind:
            sols = sols.withColumn(_var_name(var), F.expr(expr))
    return apply_update(triples, sols, delete=delete, insert=insert)


def apply_update(
    triples: DataFrame,
    sols: DataFrame,
    delete: Sequence[Pattern] = (),
    insert: Sequence[Pattern] = (),
) -> DataFrame:
    """Apply SPARQL UPDATE templates to a PRECOMPUTED solution table —
    the tail of :func:`update_graph`, public so callers whose WHERE is
    not a single BGP (a UNION of groups, a hand-built solution frame)
    get the identical set-semantics apply step. ``sols`` has one column
    per variable; both templates instantiate against it once
    (evaluate-WHERE-once semantics), then the same broadcast anti-join +
    plan-level union as ``update_graph``."""
    if "graph" in triples.columns:
        # same guard as update_graph: the delete key and insert schema
        # are (s, p, o), so against a quad table the anti-join would
        # silently drop matched triples from EVERY named graph (and a
        # non-empty insert dies late on the 3-vs-4-column union)
        raise ValueError(
            "apply_update is triple-scoped; for a quad table, filter to "
            "one graph first and re-attach the graph column to the result"
        )
    for pat in delete:
        for t in pat:
            if isinstance(t, str) and t.startswith("_:"):
                raise ValueError(
                    "blank nodes cannot appear in a DELETE template "
                    "(SPARQL UPDATE forbids them; a fresh node can never "
                    "name an existing triple)"
                )
    key = ["subject", "predicate", "object"]
    doomed = (
        _instantiate_templates(sols, delete).distinct() if delete else None
    )
    fresh = (
        _instantiate_templates(sols, insert).distinct() if insert else None
    )
    # one anti-join removes both the deleted triples and any existing
    # copies of the inserted ones (multiplicity normalization); deletes
    # apply before inserts, so a triple in both templates survives once
    drop = doomed if fresh is None else (
        fresh if doomed is None else doomed.unionByName(fresh).distinct()
    )
    out = triples.join(F.broadcast(drop), on=key, how="left_anti")
    if fresh is not None:
        out = out.unionByName(fresh)
    return out


def update_quads(
    quads: DataFrame,
    graph: str,
    patterns: Sequence[Pattern],
    delete: Sequence[Pattern] = (),
    insert: Sequence[Pattern] = (),
    **kwargs,
) -> DataFrame:
    """``update_graph`` scoped to ONE named graph of a quad table (the
    SPARQL ``WITH <g>`` form): the WHERE patterns match inside the graph,
    the delete/insert templates apply inside it, and every other graph's
    rows pass through untouched (null-graph rows included). Returns the
    post-update QUAD table.

    Plan: the scan splits into the scoped graph (one partition under the
    standard partition-by-graph layout — the filter prunes to it) and
    the passthrough rest; the scoped side runs the usual solution-sized
    broadcast anti-join + plan-level union, then re-attaches the graph
    constant. Nothing outside the named graph is read twice or shuffled.
    """
    if "graph" not in quads.columns:
        raise ValueError(
            "update_quads needs a quad table with a 'graph' column; for a "
            "plain triple table use update_graph"
        )
    g = _strip_iri(graph)
    scoped = quads.filter(F.col("graph") == g).select(
        "subject", "predicate", "object"
    )
    rest = quads.filter(~F.col("graph").eqNullSafe(g))
    out = update_graph(scoped, patterns, delete=delete, insert=insert, **kwargs)
    return rest.select("graph", "subject", "predicate", "object").unionByName(
        out.select(
            F.lit(g).alias("graph"), "subject", "predicate", "object"
        )
    )


def _require_quads(quads: DataFrame, what: str) -> None:
    if "graph" not in quads.columns:
        raise ValueError(
            f"{what} needs a quad table with a 'graph' column"
        )


def _graph_pred(graph: str | None):
    """Membership predicate for one graph; None is the default graph
    (null-graph rows), matching SPARQL's DEFAULT keyword."""
    col = F.col("graph")
    return col.isNull() if graph is None else col.eqNullSafe(_strip_iri(graph))


def clear_graph(quads: DataFrame, graph: str | None) -> DataFrame:
    """SPARQL ``CLEAR GRAPH <g>`` / ``CLEAR DEFAULT`` (``graph=None``):
    drop every triple of one graph — a single pushed-down filter scan.
    This engine has no graph registry (graphs exist exactly while they
    hold triples), so ``DROP`` is the same operation."""
    _require_quads(quads, "clear_graph")
    return quads.filter(~_graph_pred(graph))


def clear_named(quads: DataFrame) -> DataFrame:
    """``CLEAR NAMED``: keep only the default (null-graph) rows."""
    _require_quads(quads, "clear_named")
    return quads.filter(F.col("graph").isNull())


def clear_all(quads: DataFrame) -> DataFrame:
    """``CLEAR ALL``: the empty quad table (schema preserved)."""
    _require_quads(quads, "clear_all")
    return quads.filter(F.lit(False))


def copy_graph(
    quads: DataFrame,
    src: str | None,
    dst: str | None,
    mode: str = "copy",
) -> DataFrame:
    """SPARQL graph management between two graphs of one quad table
    (``None`` = the default graph on either side):

    * ``mode='copy'`` — ``COPY src TO dst``: dst is replaced by src's
      triples;
    * ``mode='move'`` — ``MOVE src TO dst``: copy, then src drops;
    * ``mode='add'``  — ``ADD src TO dst``: src's triples union into
      dst, set semantics (an added triple lands once).

    Plan: one scan split by graph membership (partition-pruned under a
    graph-partitioned layout), a retag projection for the copied rows,
    and for ``add`` one distinct over dst only. Copying a graph onto
    itself is the identity, per spec."""
    _require_quads(quads, "copy_graph")
    if mode not in ("copy", "move", "add"):
        raise ValueError(f"mode must be copy/move/add, got {mode!r}")
    s = None if src is None else _strip_iri(src)
    d = None if dst is None else _strip_iri(dst)
    if s == d:
        return quads
    src_rows = quads.filter(_graph_pred(s))
    retagged = src_rows.select(
        F.lit(d).cast("string").alias("graph"),
        "subject",
        "predicate",
        "object",
    )
    rest = quads.filter(~_graph_pred(s) & ~_graph_pred(d))
    if mode == "add":
        dst_new = (
            quads.filter(_graph_pred(d)).select(
                "graph", "subject", "predicate", "object"
            )
            .unionByName(retagged)
            .distinct()
        )
    else:
        dst_new = retagged
    out = rest.select("graph", "subject", "predicate", "object").unionByName(
        dst_new
    )
    if mode != "move":
        out = out.unionByName(
            src_rows.select("graph", "subject", "predicate", "object")
        )
    return out


def _ground_df(triples: DataFrame, rows: Sequence[tuple]) -> DataFrame:
    """Driver-literal (subject, predicate, object) rows -> a 3-column
    DataFrame in the triple table's session, '<iri>' wrapping stripped.
    Update-data blocks are query-sized by construction (they are typed
    text), so this is always broadcast-sized."""
    if "graph" in triples.columns:
        raise ValueError(
            "ground updates are triple-scoped; for a quad table, filter "
            "to one graph first and re-attach the graph column"
        )
    clean = []
    for s, p, o in rows:
        for t in (s, p, o):
            if is_var(t):
                raise ValueError(
                    f"ground update data cannot contain variables: {t!r}"
                )
            if t.startswith("_:"):
                # DELETE DATA forbids bnodes outright (SPARQL 1.1: a
                # fresh node can never name an existing triple); INSERT
                # DATA's fresh-bnode semantics would need per-request
                # minting — inserting the literal label would silently
                # alias every request's '_:b'. Loud in both cases.
                raise ValueError(
                    f"blank node {t!r} in ground update data is not "
                    "supported; use an INSERT-WHERE '_:label' template "
                    "for fresh-node minting"
                )
        clean.append((_strip_iri(s), _strip_iri(p), _strip_iri(o)))
    return triples.sparkSession.createDataFrame(
        clean, schema="subject string, predicate string, object string"
    )


def insert_data(triples: DataFrame, rows: Sequence[tuple]) -> DataFrame:
    """SPARQL ``INSERT DATA``: add ground triples, set semantics — an
    existing copy of an inserted triple collapses to exactly one row, so
    the update is idempotent (same contract as ``update_graph``).

    Plan: one broadcast anti-join over the graph scan drops any existing
    copies, then the driver-literal rows union back in. The graph is
    scanned once and never shuffled."""
    fresh = _ground_df(triples, rows).distinct()
    key = ["subject", "predicate", "object"]
    return triples.join(F.broadcast(fresh), on=key, how="left_anti").unionByName(
        fresh
    )


def delete_data(triples: DataFrame, rows: Sequence[tuple]) -> DataFrame:
    """SPARQL ``DELETE DATA``: remove every copy of each ground triple —
    one broadcast anti-join, single graph scan, no shuffle."""
    doomed = _ground_df(triples, rows)
    key = ["subject", "predicate", "object"]
    return triples.join(F.broadcast(doomed), on=key, how="left_anti")


def describe_node(triples: DataFrame, node: str) -> DataFrame:
    """SPARQL ``DESCRIBE <node>`` (concise-bounded-description, depth 1):
    every triple in which the node appears as subject or object.

    One OR-filtered scan of the triple table — both disjuncts push down
    to the parquet/Iceberg scan, and with the subject-or-object value as
    a constant the row-group min/max stats prune most files. '<...>'
    wrapping is accepted and stripped, as everywhere else.
    """
    n = _strip_iri(node)
    return triples.filter(
        (F.col("subject") == F.lit(n)) | (F.col("object") == F.lit(n))
    )


def describe_nodes(
    triples: DataFrame, nodes: DataFrame | Sequence[str]
) -> DataFrame:
    """``DESCRIBE`` for a node SET — either driver-literal names (the
    multi-node ``DESCRIBE <a> <b>`` form: one OR-of-isin filtered scan,
    both member filters pushed down) or a one-column DataFrame of node
    ids (the ``DESCRIBE ?x WHERE { ... }`` form: the solutions' node set
    is dimension-sized relative to the graph, so the description is two
    semi-joins — by subject, and by object for rows not already matched
    by subject — preserving triple multiplicity without a whole-table
    distinct; AQE broadcasts the node set when it is small).
    """
    if not isinstance(nodes, DataFrame):
        names = [_strip_iri(n) for n in nodes]
        if not names:
            raise ValueError("describe_nodes needs at least one node")
        return triples.filter(
            F.col("subject").isin(names) | F.col("object").isin(names)
        )
    if len(nodes.columns) != 1:
        raise ValueError(
            f"describe_nodes expects a one-column node DataFrame, got "
            f"{nodes.columns}"
        )
    col = nodes.columns[0]
    ns = nodes.select(F.col(col).alias("subject")).distinct()
    no = ns.withColumnRenamed("subject", "object")  # reuse one distinct
    by_s = triples.join(ns, "subject", "left_semi")
    by_o_only = triples.join(no, "object", "left_semi").join(
        ns, "subject", "left_anti"
    )
    return by_s.unionByName(by_o_only)
