"""SPARQL text front-end: parse a SPARQL query STRING into the kgquery
algebra and return the DataFrame plan.

The algebra layer (operators/kgquery, operators/kginfer) is the engine's
contract; this module adds the surface a triple-store user actually
types, covering exactly the constructs the algebra implements:

* query forms — ``SELECT`` (DISTINCT, aggregate projections, expression
  projections), ``ASK``, ``CONSTRUCT`` (incl. the ``CONSTRUCT WHERE``
  shorthand), ``DESCRIBE`` (one or more nodes, and/or ``?var``s bound by
  a ``WHERE`` group);
* update forms (``sparql_update``) — ``INSERT DATA`` / ``DELETE DATA``
  (ground triples), ``DELETE WHERE``, ``DELETE { } INSERT { } WHERE
  { }`` (either template optional; the WHERE group accepts the full
  pattern surface including a whole-group UNION — compiled to
  ``bgp_union`` + ``apply_update`` — plus BIND (template-usable computed
  columns) and ``{ SELECT ... }`` sub-SELECTs; the DELETE WHERE
  shorthand stays plain-patterns-only per the spec, and WITH-scoped
  updates reject UNION/sub-SELECT rather than silently escaping the
  graph scope), ``WITH <g>`` scoping a WHERE-form
  update to one named graph of a quad table, the graph-management forms
  ``CLEAR``/``DROP``/``CREATE``/``ADD``/``COPY``/``MOVE`` (each one
  filter/union scan), and ``;``-separated operation sequences folding
  the graph left to right;
* group graph patterns — triple patterns (property-path predicates pass
  through verbatim to the path compiler; ``;``/``,``
  predicate-object/object-list abbreviations desugar to full patterns),
  ``OPTIONAL { }`` (the body may carry its own ``FILTER``s over its
  own variables — applied to the body before the left join, which is
  exact for body-local filters; a filter naming an outer-only variable
  raises), ``FILTER(expr)``, ``FILTER EXISTS { }`` /
  ``FILTER NOT EXISTS { }``,
  ``MINUS { }``, ``VALUES`` (inline data, ``UNDEF`` supported),
  ``GRAPH term { }`` (4-term quad patterns), ``{ SELECT ... }``
  sub-SELECTs (evaluated bottom-up, joined on shared variables with no
  broadcast hint — AQE picks the strategy), and ``{ A } UNION { B }``
  (as the whole group body);
* solution modifiers — ``GROUP BY`` / ``HAVING`` / ``ORDER BY`` (with
  ``ASC()``/``DESC()``) / ``LIMIT`` / ``OFFSET``, plus a trailing
  ``VALUES`` clause (joins the WHERE solutions, the parameterized-query
  idiom); aggregate arguments may be full expressions and accept
  ``DISTINCT``;
* ``PREFIX`` declarations — a DECLARED prefix expands ``foo:bar`` to
  ``<iri+bar>``; an undeclared qname stays a literal constant (this
  engine's KGs legitimately use raw ids like ``p:1``).

FILTER/BIND/HAVING expression bodies are Spark SQL over the variable
columns with SPARQL spellings translated: ``?var`` → column name,
``&&``/``||`` → ``AND``/``OR``, and the common SPARQL builtins mapped to
their Spark twins (REGEX→regexp_like, STRLEN→length, UCASE/LCASE→
upper/lower, STRSTARTS/STRENDS→startswith/endswith, CONTAINS→contains).
Everything else Spark SQL accepts is accepted — a deliberate superset.

Out of scope (raise loudly, never mis-parse): federation (SERVICE),
``GRAPH`` blocks inside update templates (scope with ``WITH`` instead),
``USING``/``LOAD``. Parsing is driver-side string
work on a
query-sized input — zero effect on the distributed plan, which is
byte-identical to the equivalent hand-built algebra call (pinned by
tests/test_sparql_text.py twins).
"""

from __future__ import annotations

import contextvars
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ontology_mapping_spark.operators.kgquery import (
    apply_update,
    ask_plan,
    bgp_ask,
    bgp_construct,
    bgp_select,
    bgp_union,
    delete_data,
    describe_node,
    describe_nodes,
    insert_data,
    is_iri_ref,
    is_var,
    clear_all,
    clear_graph,
    clear_named,
    copy_graph,
    solution_modifiers,
    update_graph,
    update_quads,
)

_AGG_NAMES = {
    "count": "count",
    "sum": "sum",
    "avg": "avg",
    "min": "min",
    "max": "max",
    "sample": "sample",
    "group_concat": "group_concat",
}

_FUNC_MAP = {
    "regex": "regexp_like",
    # NO 'replace' mapping: Spark SQL has its own literal replace() and
    # the superset contract ('everything Spark SQL accepts is accepted')
    # must not silently change its semantics — write regexp_replace for
    # SPARQL's regex-based REPLACE
    "strlen": "length",
    "substr": "substring",  # both 1-based
    "ucase": "upper",
    "lcase": "lower",
    "strstarts": "startswith",
    "strends": "endswith",
    "contains": "contains",
    "str": "string",
}

_PATH_CHARS = set("+*/|^?!")


class SparqlSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|\#[^\n]*)            # whitespace / comment
  | (?P<string>"(?:[^"\\]|\\.)*")   # quoted literal
  | (?P<iri><[^<>\s]*>)             # <iri>
  | (?P<punct>[{}();,])             # braces / parens / list separators
  | (?P<dot>\.(?=\s|}|$))           # statement dot (never inside a qname)
  | (?P<word>[^\s{}()"#;,]+)        # everything else: vars, terms, keywords
    """,
    re.VERBOSE,
)


def _tokenize(text: str) -> list[str]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise SparqlSyntaxError(f"cannot tokenize at: {text[pos:pos+30]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        tok = m.group()
        if m.lastgroup == "string" and pos < len(text) and (
            text[pos] == "@" or text.startswith("^^", pos)
        ):
            # a split '@en' / '^^xsd:int' word token would be silently
            # consumed as a pattern TERM downstream — garbage patterns,
            # empty results. Raise loudly per the parser contract.
            raise SparqlSyntaxError(
                f"language-tagged / datatyped literal at "
                f"{text[m.start():pos + 12]!r}: the engine stores plain "
                "strings — strip the @lang / ^^type suffix"
            )
        if m.lastgroup == "word" and tok.endswith(".") and len(tok) > 1:
            out.extend([tok[:-1], "."])
        else:
            out.append(tok)
    return out


class _Cursor:
    def __init__(self, toks: list[str]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> str | None:
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SparqlSyntaxError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, want: str) -> str:
        t = self.next()
        if t.upper() != want.upper():
            raise SparqlSyntaxError(f"expected {want!r}, got {t!r}")
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t is not None and t.upper() in {k.upper() for k in kws}


# ---------------------------------------------------------------------------
# expression capture / translation
# ---------------------------------------------------------------------------


def _capture_parens(cur: _Cursor) -> str:
    """Consume a balanced '(' ... ')' token run, returning the inner text
    (tokens joined by spaces — fine for Spark SQL)."""
    cur.expect("(")
    depth, parts = 1, []
    while depth:
        t = cur.next()
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
            if not depth:
                break
        parts.append(t)
    return " ".join(parts)


_STRING_LIT_RE = re.compile(r"'(?:[^'\\]|\\.)*'|\"(?:[^\"\\]|\\.)*\"")


def _translate_expr(expr: str) -> str:
    """SPARQL spellings -> Spark SQL over variable columns.

    Every rewrite is applied OUTSIDE quoted string literals only — the
    naive whole-string substitutions turned ``"a?b"`` into ``"ab"``,
    ``"x&&y"`` into ``"x AND y"``, and renamed function-looking text
    inside literals, silently changing comparison values."""

    def _outside(segment: str) -> str:
        segment = re.sub(r"\?(\w+)", r"\1", segment)
        segment = segment.replace("&&", " AND ").replace("||", " OR ")
        # BOUND(?v) has no Spark twin function — it is the null test (the
        # FILTER(BOUND(?v)) idiom the OPTIONAL-negation caveats prescribe)
        segment = re.sub(
            r"\bbound\s*\(\s*(\w+)\s*\)",
            r"(\1 IS NOT NULL)",
            segment,
            flags=re.IGNORECASE,
        )
        for sparql_fn, spark_fn in _FUNC_MAP.items():
            segment = re.sub(
                rf"\b{sparql_fn}\s*\(", spark_fn + "(", segment,
                flags=re.IGNORECASE,
            )
        return segment

    parts: list[str] = []
    last = 0
    for m in _STRING_LIT_RE.finditer(expr):
        parts.append(_outside(expr[last:m.start()]))
        parts.append(m.group(0))  # literal: byte-identical pass-through
        last = m.end()
    parts.append(_outside(expr[last:]))
    return "".join(parts)


# ---------------------------------------------------------------------------
# terms and patterns
# ---------------------------------------------------------------------------


def _term(tok: str, prefixes: dict[str, str]) -> str:
    """One RDF term token -> the kgquery term string. Declared prefixes
    expand to '<iri>'; quoted literals drop their quotes; everything else
    passes through (vars, <iri>s, raw constants, path expressions)."""
    if tok.startswith('"') and tok.endswith('"'):
        return tok[1:-1].replace('\\"', '"').replace("\\\\", "\\")
    if ":" in tok and not is_var(tok) and not is_iri_ref(tok):
        pfx, _, local = tok.partition(":")
        if pfx in prefixes:
            return f"<{prefixes[pfx]}{local}>"
    return tok


def _pred_term(cur: _Cursor, prefixes: dict[str, str]) -> str:
    """A predicate-position term: like ``_term``, plus the negated
    property set forms — ``!p`` (one token) and ``!( a | ^b )`` (the
    parenthesized members reassemble into one ``!(...)`` path term,
    each member prefix-expanded)."""
    tok = cur.peek()
    if tok == "!" and cur.peek(1) == "(":
        cur.next()
        inner = _capture_parens(cur).replace(" ", "")
        members = [
            ("^" + _term(m[1:], prefixes)) if m.startswith("^")
            else _term(m, prefixes)
            for m in inner.split("|")
            if m
        ]
        return "!(" + "|".join(members) + ")"
    tok = cur.next()
    if tok.startswith("!") and len(tok) > 1:
        body = tok[1:]
        if body.startswith("^"):
            return "!^" + _term(body[1:], prefixes)
        return "!" + _term(body, prefixes)
    if tok == "a":
        # SPARQL grammar: bare 'a' in verb position IS rdf:type — grammar,
        # not a name, so it must not silently scan a predicate named 'a'.
        # (Inside a negated property set the members stay verbatim.)
        return "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    return _term(tok, prefixes)


def _branches_any_path(branches: list[list[tuple]]) -> bool:
    return any(_has_path(p[-2]) for br in branches for p in br)


def _has_path(p: str) -> bool:
    return (
        not is_var(p)
        and not is_iri_ref(p)
        and any(c in _PATH_CHARS for c in p)
    )


class _Group:
    """One parsed group graph pattern."""

    def __init__(self):
        self.patterns: list[tuple] = []
        self.optional: list[list[tuple]] = []
        self.optional_filters: list[list[str]] = []
        self.filters: list[str] = []
        self.exists: list[list[tuple]] = []
        self.not_exists: list[list[tuple]] = []
        self.minus: list[list[tuple]] = []
        self.values_vars: list[str] | None = None
        self.values_rows: list[dict] | None = None
        self.binds: list[tuple[str, str]] = []
        self.union_branches: list[list[tuple]] | None = None
        self.subqueries: list[DataFrame] = []

    def any_path(self) -> bool:
        groups = [
            self.patterns,
            *self.optional,
            *self.exists,
            *self.not_exists,
            *self.minus,
        ]
        return any(_has_path(p[-2]) for g in groups for p in g)


def _parse_po_tail(cur: _Cursor, prefixes, graph: str | None, s: str, p: str,
                   pats: list[tuple]) -> None:
    """Desugar SPARQL ';' (predicate-object list) and ',' (object list)
    abbreviations into full patterns sharing the subject (and, for ',',
    the predicate) — pure parse-time sugar; the algebra sees the same
    pattern list a fully-written query produces."""
    while cur.at_kw(";", ","):
        sep = cur.next()
        if sep == ";":
            # the grammar allows empty ';' slots and a trailing ';'
            if cur.at_kw(".", "}", ";"):
                continue
            p = _pred_term(cur, prefixes)
        elif cur.at_kw(".", "}", ";", ",") or cur.peek() is None:
            raise SparqlSyntaxError("',' object list needs an object term")
        o = _term(cur.next(), prefixes)
        pats.append((graph, s, p, o) if graph is not None else (s, p, o))


def _parse_triples_block(cur: _Cursor, prefixes, graph: str | None) -> list[tuple]:
    """Plain triple (or quad, when inside GRAPH) patterns until '}'."""
    pats: list[tuple] = []
    while not cur.at_kw("}"):
        s = _term(cur.next(), prefixes)
        p = _pred_term(cur, prefixes)
        o = _term(cur.next(), prefixes)
        pats.append((graph, s, p, o) if graph is not None else (s, p, o))
        _parse_po_tail(cur, prefixes, graph, s, p, pats)
        if cur.at_kw("."):
            cur.next()
    return pats


def _optional_arg(g: "_Group"):
    """The algebra's ``optional=`` argument: plain pattern lists, or the
    {'patterns', 'filters'} dict form for OPTIONAL bodies carrying their
    own FILTERs."""
    return [
        {"patterns": pats, "filters": fs} if fs else pats
        for pats, fs in zip(g.optional, g.optional_filters)
    ]


def _is_plain_group(g: "_Group") -> bool:
    """True when the group is ONLY triple patterns — every other group
    feature (nested union, OPTIONAL, FILTER, negation, VALUES, BIND,
    sub-SELECT) would be silently discarded by a caller that consumes
    just ``g.patterns``, so such callers must reject non-plain groups."""
    return not (
        g.union_branches
        or g.optional
        or g.filters
        or g.exists
        or g.not_exists
        or g.minus
        or g.binds
        or g.subqueries
        or g.values_rows is not None
    )


def _parse_group(
    triples: DataFrame, cur: _Cursor, prefixes: dict[str, str]
) -> _Group:
    cur.expect("{")
    g = _Group()
    # pure union form: { {A} UNION {B} ... } — but '{ SELECT' opens a
    # sub-SELECT, handled in the main loop
    if cur.at_kw("{") and (cur.peek(1) or "").upper() != "SELECT":
        branches = []
        sub = _parse_group(triples, cur, prefixes)
        if not _is_plain_group(sub):
            raise SparqlSyntaxError("UNION branches must be plain triple groups")
        branches.append(sub.patterns)
        while cur.at_kw("UNION"):
            cur.next()
            sub = _parse_group(triples, cur, prefixes)
            if not _is_plain_group(sub):
                raise SparqlSyntaxError("UNION branches must be plain triple groups")
            branches.append(sub.patterns)
        cur.expect("}")
        if len(branches) == 1:
            raise SparqlSyntaxError(
                "a braced subgroup is only supported as a UNION branch "
                "or a '{ SELECT ... }' subquery"
            )
        g.union_branches = branches
        return g
    while True:
        t = cur.peek()
        if t is None:
            raise SparqlSyntaxError("unterminated group (missing '}')")
        up = t.upper()
        if up == "}":
            cur.next()
            return g
        if up == "OPTIONAL":
            cur.next()
            sub = _parse_group(triples, cur, prefixes)
            # an OPTIONAL body may carry its own FILTERs (over the
            # body's variables); every other nested feature would be
            # silently dropped, so reject it loudly
            sub_filters, sub.filters = sub.filters, []
            if not _is_plain_group(sub):
                raise SparqlSyntaxError(
                    "OPTIONAL bodies must be plain triple groups "
                    "(FILTER over the body's own variables allowed)"
                )
            g.optional.append(sub.patterns)
            g.optional_filters.append(sub_filters)
        elif up == "FILTER":
            cur.next()
            if cur.at_kw("NOT"):
                cur.next()
                cur.expect("EXISTS")
                sub = _parse_group(triples, cur, prefixes)
                if not _is_plain_group(sub):
                    raise SparqlSyntaxError(
                        "NOT EXISTS bodies must be plain triple groups"
                    )
                g.not_exists.append(sub.patterns)
            elif cur.at_kw("EXISTS"):
                cur.next()
                sub = _parse_group(triples, cur, prefixes)
                if not _is_plain_group(sub):
                    raise SparqlSyntaxError(
                        "EXISTS bodies must be plain triple groups"
                    )
                g.exists.append(sub.patterns)
            else:
                g.filters.append(_translate_expr(_capture_parens(cur)))
        elif up == "MINUS":
            cur.next()
            sub = _parse_group(triples, cur, prefixes)
            if not _is_plain_group(sub):
                raise SparqlSyntaxError(
                    "MINUS bodies must be plain triple groups"
                )
            g.minus.append(sub.patterns)
        elif up == "BIND":
            cur.next()
            inner = _capture_parens(cur)
            m = re.match(r"(?s)^(.*)\s+AS\s+\?(\w+)\s*$", inner, re.IGNORECASE)
            if not m:
                raise SparqlSyntaxError(f"BIND needs '(expr AS ?var)', got ({inner})")
            g.binds.append(("?" + m.group(2), _translate_expr(m.group(1))))
        elif up == "VALUES":
            cur.next()
            g.values_vars, g.values_rows = _parse_values(cur, prefixes)
        elif up == "GRAPH":
            cur.next()
            gterm = _term(cur.next(), prefixes)
            cur.expect("{")
            # reuse the plain block parser with the graph term attached;
            # the block stops AT '}' without consuming it
            g.patterns.extend(_parse_triples_block(cur, prefixes, gterm))
            cur.expect("}")
        elif up == "{":
            if (cur.peek(1) or "").upper() == "SELECT":
                # sub-SELECT: evaluate bottom-up, join on shared variables
                cur.next()
                cur.next()
                g.subqueries.append(
                    _parse_select_query(
                        triples, cur, prefixes, stop_at_brace=True
                    )
                )
                cur.expect("}")
                if (cur.peek() or "").upper() == "UNION":
                    # without this, UNION/'{' would be consumed as triple
                    # TERMS — garbage patterns, silently empty results
                    raise SparqlSyntaxError(
                        "UNION over a '{ SELECT ... }' subquery is not "
                        "supported; run the branches as separate queries"
                    )
            else:
                raise SparqlSyntaxError(
                    "nested groups are only supported as UNION branches, "
                    "OPTIONAL/MINUS/NOT EXISTS bodies, or '{ SELECT ... }' "
                    "subqueries"
                )
        else:
            # plain triples up to the next keyword or '}'
            s = _term(cur.next(), prefixes)
            p = _pred_term(cur, prefixes)
            o = _term(cur.next(), prefixes)
            g.patterns.append((s, p, o))
            _parse_po_tail(cur, prefixes, None, s, p, g.patterns)
            if cur.at_kw("."):
                cur.next()


def _strip_brackets(t: str) -> str:
    return t[1:-1] if is_iri_ref(t) else t


def _parse_values(cur: _Cursor, prefixes) -> tuple[list[str], list[dict]]:
    """The body of a VALUES block (cursor positioned after the VALUES
    keyword): '?v { a b }' or '( ?v ?w ) { (a b) (UNDEF c) }'."""
    vars_: list[str] = []
    if cur.at_kw("("):
        cur.next()
        while not cur.at_kw(")"):
            vars_.append(cur.next())
        cur.next()
    else:
        vars_.append(cur.next())
    vars_ = [v[1:] if v.startswith("?") else v for v in vars_]
    cur.expect("{")
    rows: list[dict] = []
    while not cur.at_kw("}"):
        if cur.at_kw("("):
            cur.next()
            vals = []
            while not cur.at_kw(")"):
                vals.append(cur.next())
            cur.next()
        else:
            vals = [cur.next()]
        if len(vals) != len(vars_):
            raise SparqlSyntaxError(
                f"VALUES row arity {len(vals)} != vars {len(vars_)}"
            )
        rows.append(
            {
                v: (
                    None
                    if val.upper() == "UNDEF"
                    else _strip_brackets(_term(val, prefixes))
                )
                for v, val in zip(vars_, vals)
            }
        )
    cur.next()
    return vars_, rows


# ---------------------------------------------------------------------------
# query forms
# ---------------------------------------------------------------------------


def _parse_prefixes(cur: _Cursor) -> dict[str, str]:
    prefixes: dict[str, str] = {}
    while cur.at_kw("PREFIX"):
        cur.next()
        name = cur.next()
        if not name.endswith(":"):
            raise SparqlSyntaxError(f"PREFIX name must end with ':', got {name!r}")
        iri = cur.next()
        if not is_iri_ref(iri):
            raise SparqlSyntaxError(f"PREFIX iri must be '<...>', got {iri!r}")
        prefixes[name[:-1]] = iri[1:-1]
    return prefixes


def _parse_projection(cur: _Cursor):
    """SELECT items until WHERE/{: plain ?vars, '*', aggregate items
    '( FUNC(?v) AS ?alias )', or expression items '( expr AS ?alias )'."""
    select: list[str] = []
    aggregates: list[tuple[str, str, str]] = []
    binds: list[tuple[str, str]] = []
    star = False
    while not cur.at_kw("WHERE", "{"):
        t = cur.peek()
        if t is None:
            raise SparqlSyntaxError("SELECT without WHERE")
        if t == "*":
            cur.next()
            star = True
            continue
        if t.startswith("?"):
            select.append(cur.next())
            continue
        if t == "(":
            inner = _capture_parens(cur)
            m = re.match(r"(?s)^(.*)\s+AS\s+\?(\w+)\s*$", inner, re.IGNORECASE)
            if not m:
                raise SparqlSyntaxError(f"projection needs '(... AS ?v)': ({inner})")
            body, alias = m.group(1).strip(), m.group(2)
            am = re.match(r"^(\w+)\s*\((.*)\)\s*$", body, re.DOTALL)
            fname = am.group(1).lower() if am else None
            if am and fname in _AGG_NAMES:
                arg = am.group(2).strip()
                distinct = False
                if re.match(r"(?i)^distinct\b", arg):
                    distinct = True
                    arg = arg[len("distinct"):].strip()
                sep = None
                sm = re.match(
                    r'(?is)^(.*?);\s*separator\s*=\s*"((?:[^"\\]|\\.)*)"\s*$', arg
                )
                if sm:
                    arg, sep = sm.group(1).strip(), sm.group(2)
                func = _AGG_NAMES[fname]
                if distinct:
                    if func == "count":
                        func = "count_distinct"
                    elif func in ("sum", "avg", "group_concat"):
                        func += "_distinct"
                    # min/max/sample: DISTINCT cannot change the result
                if func.startswith("group_concat") and sep is not None:
                    func = f"{func}:{sep}"
                if arg != "*" and not re.fullmatch(r"\?\w+", arg):
                    # aggregate over an expression, not a bare variable
                    arg = _translate_expr(arg)
                aggregates.append((func, arg, "?" + alias))
                select.append("?" + alias)
            else:
                binds.append(("?" + alias, _translate_expr(body)))
                select.append("?" + alias)
            continue
        raise SparqlSyntaxError(f"unexpected token in SELECT list: {t!r}")
    return (None if star else select), aggregates, binds


def _parse_modifiers(
    cur: _Cursor, prefixes=None, *, stop_at_brace: bool = False
):
    group_by: list[str] = []
    having: str | None = None
    order_by: list[str] = []
    limit = offset = None
    postfix_values: tuple[list[str], list[dict]] | None = None
    while cur.peek() is not None:
        if stop_at_brace and cur.peek() == "}":
            break
        t = cur.next().upper()
        if t == "VALUES":
            # the trailing ValuesClause (parameterized-query idiom);
            # spec joins it AFTER grouping/HAVING, before projection —
            # the caller picks the join point accordingly
            if postfix_values is not None:
                raise SparqlSyntaxError(
                    "multiple trailing VALUES clauses are not valid SPARQL"
                )
            postfix_values = _parse_values(cur, prefixes or {})
            continue
        if t == "GROUP":
            cur.expect("BY")
            while cur.peek() is not None and cur.peek().startswith("?"):
                group_by.append(cur.next())
        elif t == "HAVING":
            having = _translate_expr(_capture_parens(cur))
        elif t == "ORDER":
            cur.expect("BY")
            while cur.peek() is not None and (
                cur.peek().startswith("?") or cur.at_kw("ASC", "DESC")
            ):
                if cur.at_kw("ASC", "DESC"):
                    d = cur.next().upper()
                    order_by.append(f"?{_capture_parens(cur).lstrip('?')} {d}")
                else:
                    order_by.append(cur.next())
        elif t == "LIMIT":
            limit = int(cur.next())
        elif t == "OFFSET":
            offset = int(cur.next())
        else:
            raise SparqlSyntaxError(f"unexpected token after WHERE group: {t!r}")
    return group_by, having, order_by, limit, offset, postfix_values


def _finish_form(cur: _Cursor, prefixes, g: "_Group | None") -> None:
    """End of an ASK/CONSTRUCT/DESCRIBE: accept the grammar's optional
    trailing VALUES clause (merged into the group — these forms have no
    grouping stage, so the join point is spec-equivalent) when ``g`` is
    given, then require the query text to be exhausted — leftover tokens
    silently ignored would be a mis-parse."""
    if g is not None and cur.at_kw("VALUES"):
        cur.next()
        if g.values_rows is not None:
            raise SparqlSyntaxError(
                "both an in-group VALUES and a trailing VALUES clause; "
                "use one (the algebra joins a single inline table)"
            )
        g.values_vars, g.values_rows = _parse_values(cur, prefixes)
    if cur.peek() is not None:
        raise SparqlSyntaxError(
            f"unexpected token after the query: {cur.peek()!r}"
        )


# per-predicate counts for statistics-driven BGP join ordering
# (kgquery.predicate_stats), scoped to ONE plan construction: a
# contextvar instead of threading a parameter through the recursive
# parser (groups contain sub-SELECTs contain groups). Plans are built
# eagerly inside sparql()/sparql_update(), so the reset in the wrapper
# cannot race the (lazy) execution.
_QUERY_STATS: contextvars.ContextVar = contextvars.ContextVar(
    "sparql_query_stats", default=None
)


def sparql(triples: DataFrame, query: str, stats: dict | None = None) -> DataFrame:
    """Run a SPARQL query STRING against a triple (or quad) table; returns
    the same lazy DataFrame the equivalent kgquery algebra call builds
    (ASK returns the one-row boolean frame; CONSTRUCT returns new
    triples). See the module docstring for the supported subset.

    ``stats``: optional per-predicate counts
    (``kgquery.predicate_stats``) switching every BGP in the query to
    estimated-cardinality join ordering — compute once per
    session/crawl; at 10^12 triples a bound ``rdf:type`` pattern can be
    the largest relation, not the most selective."""
    tok = _QUERY_STATS.set(stats)
    try:
        return _sparql_query(triples, query)
    finally:
        _QUERY_STATS.reset(tok)


def _sparql_query(triples: DataFrame, query: str) -> DataFrame:
    cur = _Cursor(_tokenize(query))
    prefixes = _parse_prefixes(cur)
    form = cur.next().upper()

    if form == "DESCRIBE":
        terms: list[str] = []
        while cur.peek() is not None and not cur.at_kw("WHERE", "{"):
            terms.append(_term(cur.next(), prefixes))
        if not terms:
            raise SparqlSyntaxError("DESCRIBE needs at least one node or ?var")
        vars_ = [t for t in terms if is_var(t)]
        consts = [t for t in terms if not is_var(t)]
        if cur.peek() is None:
            if vars_:
                raise SparqlSyntaxError(
                    "DESCRIBE ?var needs a WHERE group binding it"
                )
            if len(consts) == 1:
                return describe_node(triples, consts[0])
            return describe_nodes(triples, consts)
        if cur.at_kw("WHERE"):
            cur.next()
        if not vars_:
            raise SparqlSyntaxError(
                "DESCRIBE ... WHERE needs at least one ?var to bind"
            )
        g = _parse_group(triples, cur, prefixes)
        if g.union_branches or g.subqueries:
            raise SparqlSyntaxError(
                "UNION / sub-SELECT in a DESCRIBE WHERE is not supported"
            )
        _finish_form(cur, prefixes, None)
        sols = bgp_select(
            triples,
            g.patterns,
            paths=g.any_path(),
            optional=_optional_arg(g),
            filter_expr=g.filters or None,
            exists=g.exists,
            not_exists=g.not_exists,
            minus=g.minus,
            values=g.values_rows or None,
            bind=g.binds or None,
            select=vars_,
            stats=_QUERY_STATS.get(),
        )
        node_df = None
        for v in vars_:
            part = sols.select(F.col(v.lstrip("?")).alias("n"))
            node_df = part if node_df is None else node_df.unionByName(part)
        if consts:
            cdf = triples.sparkSession.createDataFrame(
                [(_strip_brackets(c),) for c in consts], "n string"
            )
            node_df = node_df.unionByName(cdf)
        return describe_nodes(triples, node_df)

    if form == "ASK":
        if cur.at_kw("WHERE"):
            cur.next()
        g = _parse_group(triples, cur, prefixes)
        if g.union_branches:
            _finish_form(cur, prefixes, g)
            if g.values_rows is not None:
                raise SparqlSyntaxError(
                    "VALUES alongside a whole-group UNION is not supported; "
                    "put the VALUES inside a non-union group"
                )
            sols = bgp_union(
                triples,
                g.union_branches,
                paths=_branches_any_path(g.union_branches),
                stats=_QUERY_STATS.get(),
            )
            return ask_plan(sols)
        _finish_form(cur, prefixes, g)
        return bgp_ask(
            triples,
            g.patterns,
            paths=g.any_path(),
            stats=_QUERY_STATS.get(),
            optional=_optional_arg(g),
            filter_expr=g.filters or None,
            exists=g.exists,
            not_exists=g.not_exists,
            minus=g.minus,
            values=g.values_rows or None,
            subqueries=g.subqueries,
        )

    if form == "CONSTRUCT":
        if cur.at_kw("WHERE"):
            # SPARQL 1.1 'CONSTRUCT WHERE { }' shorthand: the pattern set
            # IS the template; the spec restricts the group to plain
            # triples, enforced below
            cur.next()
            g = _parse_group(triples, cur, prefixes)
            if not _is_plain_group(g):
                raise SparqlSyntaxError(
                    "CONSTRUCT WHERE shorthand allows only plain triple "
                    "patterns; use the full CONSTRUCT { } WHERE { } form"
                )
            if g.any_path():
                raise SparqlSyntaxError(
                    "property paths cannot appear in a CONSTRUCT WHERE "
                    "template; use the full CONSTRUCT { } WHERE { } form"
                )
            _finish_form(cur, prefixes, g)
            return bgp_construct(
                triples, g.patterns, g.patterns,
                values=g.values_rows or None,
                stats=_QUERY_STATS.get(),
            )
        cur.expect("{")
        template = _parse_triples_block(cur, prefixes, None)
        cur.expect("}")
        for pat in template:
            if _has_path(pat[1]):
                raise SparqlSyntaxError(
                    f"property path in a CONSTRUCT template: {pat[1]!r} "
                    "(templates emit concrete triples)"
                )
        cur.expect("WHERE")
        g = _parse_group(triples, cur, prefixes)
        if g.union_branches:
            raise SparqlSyntaxError("CONSTRUCT over UNION is not supported")
        if g.subqueries:
            raise SparqlSyntaxError("sub-SELECT is only supported in SELECT groups")
        _finish_form(cur, prefixes, g)
        return bgp_construct(
            triples,
            g.patterns,
            template,
            paths=g.any_path(),
            stats=_QUERY_STATS.get(),
            optional=_optional_arg(g),
            filter_expr=g.filters or None,
            exists=g.exists,
            not_exists=g.not_exists,
            minus=g.minus,
            values=g.values_rows or None,
        )

    if form != "SELECT":
        raise SparqlSyntaxError(f"unsupported query form {form!r}")
    return _parse_select_query(triples, cur, prefixes)


def _parse_select_query(
    triples: DataFrame,
    cur: _Cursor,
    prefixes: dict[str, str],
    *,
    stop_at_brace: bool = False,
) -> DataFrame:
    """The body of a SELECT (cursor positioned after the SELECT keyword) —
    also the sub-SELECT entry, where parsing stops at the closing '}'."""
    distinct = False
    if cur.at_kw("DISTINCT"):
        cur.next()
        distinct = True
    select, aggregates, proj_binds = _parse_projection(cur)
    if select == []:
        raise SparqlSyntaxError("SELECT needs a projection (?vars, items, or *)")
    if cur.at_kw("WHERE"):
        cur.next()
    g = _parse_group(triples, cur, prefixes)
    group_by, having, order_by, limit, offset, postfix_values = (
        _parse_modifiers(cur, prefixes, stop_at_brace=stop_at_brace)
    )
    if postfix_values is not None:
        if g.values_rows is not None:
            raise SparqlSyntaxError(
                "both an in-group VALUES and a trailing VALUES clause; "
                "use one (the algebra joins a single inline table)"
            )
        if g.union_branches is not None:
            raise SparqlSyntaxError(
                "VALUES alongside a whole-group UNION is not supported; "
                "put the VALUES inside a non-union group"
            )
        if group_by or aggregates:
            # SPARQL 18.2.4.3: the final ValuesClause joins AFTER
            # grouping and HAVING, BEFORE projection — evaluate the
            # grouped solutions first, then join the inline table
            sols = bgp_select(
                triples,
                g.patterns,
                paths=g.any_path(),
                optional=_optional_arg(g),
                filter_expr=g.filters or None,
                exists=g.exists,
                not_exists=g.not_exists,
                minus=g.minus,
                subqueries=g.subqueries,
                bind=(g.binds + proj_binds) or None,
                group_by=group_by or None,
                aggregates=aggregates or None,
                having=having,
                stats=_QUERY_STATS.get(),
            )
            from ontology_mapping_spark.operators.kgquery import (
                _join_values,
                values_frame,
            )

            vdf = values_frame(
                triples.sparkSession, list(postfix_values[1])
            )
            # aggregate outputs are never NULL-able bindings here, so
            # nullable=∅; UNDEF wildcards in the inline table still match
            sols, _vcols = _join_values(
                sols, vdf, set(sols.columns), set()
            )
            return solution_modifiers(
                sols,
                select=select,
                distinct=distinct,
                order_by=order_by or None,
                limit=limit,
                offset=offset,
            )
        # no grouping: joining inside the WHERE is equivalent (an inner
        # join commutes with the conjunctive filters)
        g.values_vars, g.values_rows = postfix_values

    if g.union_branches is not None:
        if g.subqueries:
            raise SparqlSyntaxError(
                "sub-SELECT alongside UNION is not supported"
            )
        if g.values_rows is not None:
            raise SparqlSyntaxError(
                "VALUES alongside a whole-group UNION is not supported; "
                "put the VALUES inside a non-union group"
            )
        sols = bgp_union(
            triples,
            g.union_branches,
            paths=_branches_any_path(g.union_branches),
            stats=_QUERY_STATS.get(),
        )
        return solution_modifiers(
            sols,
            bind=(g.binds + proj_binds) or None,
            group_by=group_by or None,
            aggregates=aggregates or None,
            having=having,
            select=select,
            distinct=distinct,
            order_by=order_by or None,
            limit=limit,
            offset=offset,
        )
    return bgp_select(
        triples,
        g.patterns,
        paths=g.any_path(),
        optional=_optional_arg(g),
        filter_expr=g.filters or None,
        exists=g.exists,
        not_exists=g.not_exists,
        minus=g.minus,
        values=g.values_rows or None,
        subqueries=g.subqueries,
        bind=(g.binds + proj_binds) or None,
        group_by=group_by or None,
        aggregates=aggregates or None,
        having=having,
        select=select,
        distinct=distinct,
        order_by=order_by or None,
        limit=limit,
        offset=offset,
        stats=_QUERY_STATS.get(),
    )


# ---------------------------------------------------------------------------
# update forms
# ---------------------------------------------------------------------------


def _parse_template(cur: _Cursor, prefixes, *, what: str) -> list[tuple]:
    """A '{ ... }' triple template (DELETE/INSERT template or DATA
    block): plain triples with ';'/',' abbreviations; GRAPH rejected
    loudly (updates are triple-scoped, matching update_graph)."""
    cur.expect("{")
    pats: list[tuple] = []
    while not cur.at_kw("}"):
        if cur.at_kw("GRAPH"):
            raise SparqlSyntaxError(
                f"GRAPH in {what} is not supported: updates are "
                "triple-scoped (filter a quad table to one graph first)"
            )
        s = _term(cur.next(), prefixes)
        p = _term(cur.next(), prefixes)
        o = _term(cur.next(), prefixes)
        pats.append((s, p, o))
        _parse_po_tail(cur, prefixes, None, s, p, pats)
        if cur.at_kw("."):
            cur.next()
    cur.next()
    return pats


def _apply_where_update(
    triples: DataFrame, cur: _Cursor, prefixes, delete, insert,
    *, shorthand: bool = False, graph: str | None = None,
) -> DataFrame:
    cur.expect("WHERE")
    g = _parse_group(triples, cur, prefixes)
    for pats in (delete, insert):
        for pat in pats:
            if _has_path(pat[1]):
                raise SparqlSyntaxError(
                    f"property path in an update template: {pat[1]!r}"
                )
    if not shorthand and not delete and not insert:
        # explicitly EMPTY templates ('DELETE { } WHERE { ... }'): SPARQL
        # evaluates the WHERE and applies nothing — a legal no-op, which
        # must NOT fall into update_graph's DELETE WHERE shorthand (that
        # would delete every matched triple)
        return triples
    if shorthand and (g.subqueries or g.binds):
        # DELETE WHERE's group is its own template: the spec restricts
        # it to plain quad patterns
        raise SparqlSyntaxError(
            "sub-SELECT / BIND in a DELETE WHERE shorthand update WHERE "
            "is not supported (the pattern set is the template); pass "
            "explicit templates"
        )
    if graph is not None and g.subqueries:
        # the sub-SELECT was parsed against the FULL quad table; running
        # it inside WITH <g> would silently escape the graph scope
        raise SparqlSyntaxError(
            "sub-SELECT in a WITH-scoped update WHERE is not supported"
        )
    if g.union_branches:
        # a whole-group UNION WHERE: compute the union solutions, then
        # the same apply step (evaluate-WHERE-once) via apply_update
        if shorthand:
            raise SparqlSyntaxError(
                "DELETE WHERE shorthand cannot range over UNION (the "
                "pattern set is the template); pass explicit templates"
            )
        if graph is not None:
            raise SparqlSyntaxError(
                "UNION in a WITH-scoped update WHERE is not supported"
            )
        sols = bgp_union(
            triples,
            g.union_branches,
            paths=_branches_any_path(g.union_branches),
            stats=_QUERY_STATS.get(),
        )
        return apply_update(triples, sols, delete=delete, insert=insert)
    kwargs = dict(
        delete=delete,
        insert=insert,
        paths=g.any_path(),
        optional=_optional_arg(g),
        filter_expr=g.filters or None,
        exists=g.exists,
        not_exists=g.not_exists,
        minus=g.minus,
        values=g.values_rows or None,
        subqueries=g.subqueries,
        bind=g.binds or None,
        stats=_QUERY_STATS.get(),
    )
    if graph is not None:
        return update_quads(triples, graph, g.patterns, **kwargs)
    return update_graph(triples, g.patterns, **kwargs)


def _graph_ref(cur: _Cursor, prefixes) -> str | None:
    """'GRAPH <g>' / '<g>' / 'DEFAULT' in a graph-management form;
    DEFAULT is the null graph (None)."""
    if cur.at_kw("DEFAULT"):
        cur.next()
        return None
    if cur.at_kw("GRAPH"):
        cur.next()
    return _strip_brackets(_term(cur.next(), prefixes))


def _parse_one_update(triples: DataFrame, cur: _Cursor, prefixes) -> DataFrame:
    kw = cur.next().upper()
    if kw in ("CLEAR", "DROP", "CREATE", "ADD", "COPY", "MOVE"):
        # graph-management forms (one filter/union scan each; this
        # engine has no graph registry, so DROP==CLEAR and CREATE is
        # the no-op of a graph that exists exactly while it has triples)
        if cur.at_kw("SILENT"):
            cur.next()
        if kw == "CREATE":
            cur.expect("GRAPH")
            _term(cur.next(), prefixes)
            return triples
        if kw in ("CLEAR", "DROP"):
            if cur.at_kw("ALL"):
                cur.next()
                return clear_all(triples)
            if cur.at_kw("NAMED"):
                cur.next()
                return clear_named(triples)
            return clear_graph(triples, _graph_ref(cur, prefixes))
        src = _graph_ref(cur, prefixes)
        cur.expect("TO")
        dst = _graph_ref(cur, prefixes)
        return copy_graph(triples, src, dst, mode=kw.lower())
    graph: str | None = None
    if kw == "WITH":
        # 'WITH <g>' scopes the WHERE and both templates to one named
        # graph of a quad table (update_quads)
        graph = _term(cur.next(), prefixes)
        if "graph" not in triples.columns:
            raise SparqlSyntaxError(
                "WITH <graph> needs a quad table (a 'graph' column)"
            )
        kw = cur.next().upper()
    if kw == "INSERT":
        if cur.at_kw("DATA"):
            if graph is not None:
                raise SparqlSyntaxError(
                    "WITH does not apply to INSERT DATA (spec: data forms "
                    "name graphs via GRAPH blocks, which this engine's "
                    "ground updates do not support)"
                )
            cur.next()
            return insert_data(
                triples, _parse_template(cur, prefixes, what="INSERT DATA")
            )
        insert = _parse_template(cur, prefixes, what="an INSERT template")
        return _apply_where_update(
            triples, cur, prefixes, (), insert, graph=graph
        )
    if kw == "DELETE":
        if cur.at_kw("DATA"):
            if graph is not None:
                raise SparqlSyntaxError(
                    "WITH does not apply to DELETE DATA (spec: data forms "
                    "name graphs via GRAPH blocks, which this engine's "
                    "ground updates do not support)"
                )
            cur.next()
            return delete_data(
                triples, _parse_template(cur, prefixes, what="DELETE DATA")
            )
        if cur.at_kw("WHERE"):
            # DELETE WHERE shorthand: the patterns are the delete template
            return _apply_where_update(
                triples, cur, prefixes, (), (), shorthand=True, graph=graph
            )
        delete = _parse_template(cur, prefixes, what="a DELETE template")
        insert: list[tuple] = []
        if cur.at_kw("INSERT"):
            cur.next()
            insert = _parse_template(cur, prefixes, what="an INSERT template")
        return _apply_where_update(
            triples, cur, prefixes, delete, insert, graph=graph
        )
    raise SparqlSyntaxError(
        f"unsupported update form {kw!r} (supported: [WITH <g>] INSERT/"
        "DELETE WHERE forms, INSERT DATA, DELETE DATA)"
    )


def sparql_update(
    triples: DataFrame, update: str, stats: dict | None = None
) -> DataFrame:
    """Run a SPARQL UPDATE request STRING against the triple table and
    return the post-update graph (lazy; the caller owns persistence —
    write it back through kgmaint/StageRunner for the atomic-swap +
    lineage story, exactly as with ``kgquery.update_graph``).

    ``;``-separated operation sequences fold the graph left to right —
    each operation's WHERE evaluates against the previous operation's
    result, matching SPARQL 1.1's sequential-execution semantics. Every
    operation is set-semantics and idempotent (see update_graph /
    insert_data), so the composed plan is one scan of the base graph
    with a chain of broadcast anti-joins and driver-literal unions —
    still shuffle-free at 10^12 triples.

    ``stats`` as in :func:`sparql` (join ordering for the WHERE groups)."""
    tok = _QUERY_STATS.set(stats)
    try:
        return _sparql_update_ops(triples, update)
    finally:
        _QUERY_STATS.reset(tok)


def _sparql_update_ops(triples: DataFrame, update: str) -> DataFrame:
    cur = _Cursor(_tokenize(update))
    prefixes = _parse_prefixes(cur)
    out = triples
    ran = False
    while cur.peek() is not None:
        prefixes.update(_parse_prefixes(cur))
        if cur.peek() is None:
            break
        out = _parse_one_update(out, cur, prefixes)
        ran = True
        if cur.at_kw(";"):
            cur.next()
        elif cur.peek() is not None:
            raise SparqlSyntaxError(
                f"expected ';' between update operations, got {cur.peek()!r}"
            )
    if not ran:
        raise SparqlSyntaxError("empty update request")
    return out
