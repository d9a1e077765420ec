"""Cypher-subset parser: ``MATCH <pattern>(, <pattern>)* RETURN <vars>``.

Reference front-end: the openCypher parser feeding QueryGraph.fromAST
(g4s-optimizer/.../optim/QueryGraph.scala:26-99). The supported surface is
exactly the reference's (SURVEY §2.7): pattern chains with single optional
label per node, optional edge variable, one-or-more edge types
(``:X|Y``), directed (OUT `->` / IN `<-`) and undirected (`-[]-`,
the reference's declared-but-unwired Direction.Both, Direction.scala:6)
edges, multiple comma-separated paths, multi-binding RETURN. Anything
else raises, like the reference's MatchError.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .tokenizer import CypherLexError, split_punct, split_top_level, tokenize


@dataclass(frozen=True)
class PatternEdge:
    src: str          # binding name of the edge's source (graph direction)
    dst: str
    types: tuple[str, ...]  # empty = any type
    # variable-length path bounds (extension): -[:X*1..3]-> gives (1, 3);
    # plain edges are (1, 1); -[:X*2]-> gives (2, 2); unbounded forms
    # (*, *n.., *..m with open lower end) use max_hops=None = closure
    # to fixpoint
    min_hops: int = 1
    max_hops: int | None = 1
    # edge variable (extension): -[e:X]-> binds e for WHERE predicates on
    # edge properties and RETURN e.prop (the reference parser accepts the
    # variable, QueryGraph.scala:76-83, but has no predicate surface)
    name: str | None = None
    # undirected -[]- (the reference's Direction.Both, Direction.scala:6 —
    # declared there but never produced by its front-end): matches the
    # edge in either orientation; the planner scans the symmetrized set
    undirected: bool = False


@dataclass(frozen=True)
class PropFilter:
    """WHERE predicate `binding.prop <op> literal` — an extension beyond
    the reference surface (which has no WHERE at all, SURVEY §2.7).
    ``clause`` records which MATCH clause owns the predicate (0 = the
    required MATCH, i ≥ 1 = the i-th OPTIONAL MATCH): openCypher scopes a
    WHERE to its clause, so an optional clause's predicate must only
    restrict that optional group, never the required matches."""

    binding: str
    prop: str
    op: str  # = <> != < <= > >=
    value: str | float
    is_num: bool
    clause: int = 0
    # scalar function wrapping the property (extension):
    # tolower | toupper | trim (string compare) | size (numeric length).
    # Still scan-pushed — the function applies inside the node-set
    # filter; selectivity is unestimated (planner keeps its upper bound).
    fn: str | None = None


@dataclass(frozen=True)
class AggItem:
    """RETURN aggregate (extension): count(b), sum/avg/min/max(b.prop)
    evaluated as a double over the distinct matches, or the same over an
    edge variable's typed property (on_edge=True, e.g. sum(e.weight))."""

    func: str  # count | sum | avg | min | max | collect | stdev | percentilecont
    binding: str
    prop: str | None  # None for count
    alias: str
    on_edge: bool = False
    # DISTINCT aggregates over the VALUES (openCypher): sum/avg/count
    # switch to the distinct form; min/max/collect treat it as a no-op
    distinct: bool = False
    # percentileCont's quantile argument
    param: float | None = None


@dataclass(frozen=True)
class ExprItem:
    """RETURN arithmetic expression (extension): a +-*/ tree over
    ``binding.prop`` leaves (node bindings; evaluated as doubles) and
    numeric literals, optionally wrapped in one aggregate —
    e.g. ``sum(l.extendedprice * (1 - l.discount)) AS rev``. The alias
    is mandatory (an expression has no natural column name).

    ``expr`` nodes: ("num", float) | ("prop", binding, prop) |
    ("op", "+-*/", left, right) | ("neg", operand)."""

    agg: str | None  # None | sum | avg | min | max
    expr: tuple
    alias: str


def expr_prop_leaves(expr: tuple) -> list[tuple[str, str]]:
    """All (binding, prop) leaves of an ExprItem tree, in order."""
    kind = expr[0]
    if kind == "prop":
        return [(expr[1], expr[2])]
    if kind == "num":
        return []
    if kind in ("neg",):
        return expr_prop_leaves(expr[1])
    if kind == "strlen":
        return [(expr[1], expr[2])]
    if kind == "fn1":
        return expr_prop_leaves(expr[2])
    if kind == "case":
        out = []
        for cond_l, _op, _lit, then_e in expr[1]:
            out += expr_prop_leaves(cond_l) + expr_prop_leaves(then_e)
        if expr[2] is not None:
            out += expr_prop_leaves(expr[2])
        return out
    return expr_prop_leaves(expr[2]) + expr_prop_leaves(expr[3])


@dataclass
class QueryGraph:
    """Bindings + directed typed edges + return set
    (QueryGraph.scala:15-22), plus extensions beyond the reference
    surface: WHERE prop filters, property returns, aggregates
    (count/sum/avg/min/max), ORDER BY, LIMIT."""

    labels: dict[str, str | None] = field(default_factory=dict)  # binding -> label
    # multi-label nodes (extension): ``(n:A:B)`` binds the FIRST label in
    # ``labels`` (drives cardinality estimates) and the rest here; the
    # planner intersects the label sets (a node with several labels is
    # several (id, label) rows in the store)
    extra_labels: dict[str, tuple[str, ...]] = field(default_factory=dict)
    edges: list[PatternEdge] = field(default_factory=list)
    # OPTIONAL MATCH groups (extension): each group is left-joined to the
    # required match on its shared bindings; unmatched rows keep NULLs
    optionals: list[list[PatternEdge]] = field(default_factory=list)
    # bindings introduced by the required MATCH clause (empty = all labels,
    # for QueryGraphs built by hand in tests)
    match_bindings: set[str] = field(default_factory=set)
    # OPTIONAL-stage demotion (WITH ... OPTIONAL MATCH ...): the carried
    # rows ARE the required match set — the planner must not scan any
    # binding standalone, and every pattern group left-joins onto carry
    carry_required: bool = False
    returns: list[str] = field(default_factory=list)
    # property access in RETURN: (binding, prop, alias); values are strings
    # (the props map is map<string,string>)
    prop_returns: list[tuple[str, str, str]] = field(default_factory=list)
    # edge-variable property access in RETURN: (edge_name, prop, alias) —
    # resolved against the typed edge columns (weight), not the props map
    edge_prop_returns: list[tuple[str, str, str]] = field(default_factory=list)
    filters: list[PropFilter] = field(default_factory=list)
    # WHERE predicates on edge variables — pushed into the edge scan
    edge_filters: list[PropFilter] = field(default_factory=list)
    # WHERE disjunctions (extension): CNF conjuncts with >1 atom.
    # or_filters: every atom on the SAME node binding — pushed into that
    # binding's scan as one OR-combined predicate. cross_filters: atoms
    # span bindings — applied after the join that binds them all
    # (required MATCH only).
    or_filters: list[tuple[PropFilter, ...]] = field(default_factory=list)
    cross_filters: list[tuple[PropFilter, ...]] = field(default_factory=list)
    # pattern predicates (extension): WHERE [NOT] (a)-[:T]->(b) chains —
    # existence as a semi-join, negation as an anti-join of the probe
    # pattern projected to its bindings shared with the MATCH. The
    # pattern's own (possibly anonymous, possibly labeled) bindings live
    # in ``labels`` but never in ``match_bindings``, so the planner
    # neither returns nor scans them standalone.
    pattern_filters: list[tuple[tuple[PatternEdge, ...], bool]] = field(
        default_factory=list
    )
    # path bindings (extension): ``p = (a)-[:T*]->(b)`` names the pattern;
    # value = indices into ``edges``. Only ``length(p)`` is consumable:
    # per distinct endpoint match it is the MINIMUM total hop count
    # (fixed edges contribute their hop count, var-length edges the
    # shortest walk) — the deterministic reading consistent with
    # ANY_PAIR existence semantics (openCypher's per-path multiplicity
    # contradicts the engine's distinct-match model).
    paths: dict[str, tuple[int, ...]] = field(default_factory=dict)
    # path bindings inside OPTIONAL MATCH clauses (round-7): name ->
    # (optional-group index, edge indices within that group); length(p)
    # is NULL for unmatched rows
    opt_paths: dict[str, tuple[int, tuple[int, ...]]] = field(default_factory=dict)
    path_lengths: list[tuple[str, str]] = field(default_factory=list)  # (path, alias)
    aggregates: list[AggItem] = field(default_factory=list)
    # arithmetic RETURN items (extension): see ExprItem
    expr_returns: list[ExprItem] = field(default_factory=list)
    # scalar string functions over property returns (extension; the
    # reference has NO scalar library, SURVEY §2.7): (fn, binding, prop,
    # alias) with fn in {tolower, toupper, trim}
    string_fn_returns: list[tuple[str, str, str, str]] = field(default_factory=list)
    # coalesce(b.prop, 'default') RETURN items (round-7): the NULL-fill
    # companion of OPTIONAL MATCH — (binding, prop, default, alias)
    coalesce_returns: list[tuple[str, str, str, str]] = field(default_factory=list)
    # id(n) RETURN items (round-8): (binding, alias) — the binding's node
    # id projected under the alias (ids ARE the binding columns)
    id_returns: list[tuple[str, str]] = field(default_factory=list)
    # string-concatenation RETURN items (round-8): `a.p + '_' + b.q AS x`
    # — (parts, alias) where parts is a tuple of ("prop", binding, prop)
    # and ("lit", text) nodes; NULL-propagating like openCypher's +
    concat_returns: list[tuple[tuple, str]] = field(default_factory=list)
    # keys(n) / properties(n) RETURN items (round-8): (binding, alias,
    # with_values) — sorted comma-joined key list, or k=v pair list
    # (scalar-contract rendering of openCypher's list/map, like labels)
    keys_returns: list[tuple[str, str, bool]] = field(default_factory=list)
    # labels(n) RETURN items (round-8): (binding, alias) — the node's
    # label set rendered as a sorted comma-joined STRING (openCypher
    # returns a list; the driver contract is scalar columns only —
    # same deviation as collect()'s sorted rendering)
    labels_returns: list[tuple[str, str]] = field(default_factory=list)
    # arithmetic WHERE predicates (extension): (lhs_expr, op, rhs_expr)
    # applied after the required chain binds every referenced binding
    # (the cross_filters slot; they cannot push to any single scan).
    # A literal comparison stores its RHS as a ("num", v) node.
    expr_filters: list[tuple[tuple, str, tuple]] = field(default_factory=list)
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (column, desc)
    # full ORDER BY sequence incl. property items (extension):
    # ("col", name, desc) | ("prop", binding, prop, desc) — order_by
    # keeps the plain columns only (back-compat; used when no prop item)
    order_items: list[tuple] = field(default_factory=list)
    skip: int | None = None  # SKIP n (extension): row offset after ORDER BY
    limit: int | None = None


_NODE = re.compile(
    r"\(\s*(?P<name>[A-Za-z_][A-Za-z0-9_]*)?\s*"
    r"(?P<labels>(?::\s*[A-Za-z_][A-Za-z0-9_]*)*)\s*\)"
)
_EDGE = re.compile(
    r"(?P<left><)?-\s*\[\s*(?P<name>[A-Za-z_][A-Za-z0-9_]*)?\s*"
    r"(?::\s*(?P<types>[A-Za-z_][A-Za-z0-9_]*(?:\s*\|\s*[A-Za-z_][A-Za-z0-9_]*)*))?\s*"
    r"(?:\*\s*(?P<lo>\d+)?\s*(?P<range>\.\.)?\s*(?P<hi>\d+)?\s*)?\]\s*-(?P<right>>)?"
)


class CypherParseError(ValueError):
    pass


_COND = re.compile(
    r"^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?P<op><>|!=|<=|>=|=|<|>)\s*"
    r"(?P<val>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*$"
)
# IS [NOT] NULL (round-7): a property absent from the props map is NULL
_COND_NULL = re.compile(
    r"(?is)^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+IS\s+(?P<neg>NOT\s+)?NULL\s*$"
)
# string predicates + IN lists (extension): STARTS WITH / ENDS WITH /
# CONTAINS take one quoted string; IN takes a bracket list of literals
# and expands to an equality OR-group (reusing the scan-pushdown path)
_COND_STR = re.compile(
    r"(?is)^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"(?P<op>STARTS\s+WITH|ENDS\s+WITH|CONTAINS)\s+"
    r"(?P<val>'[^']*'|\"[^\"]*\")\s*$"
)
# scalar function over a property in WHERE (extension):
# toLower/toUpper/trim(b.p) <op> 'str'  |  size(b.p) <op> number
_COND_EXISTS = re.compile(
    r"(?is)^\s*exists\s*\(\s*"
    r"(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)
_COND_FN = re.compile(
    r"(?is)^\s*(?P<fn>toLower|toUpper|trim|size|reverse|substring|left|right|toFloat|toInteger|toString)\s*\(\s*"
    r"(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:,\s*(?P<a1>\d+)\s*)?(?:,\s*(?P<a2>\d+)\s*)?\)\s*"
    r"(?P<op><>|!=|<=|>=|=|<|>)\s*"
    r"(?P<val>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*$"
)
# regex predicate (openCypher =~): FULL-string match, per the spec —
# the planner anchors the pattern (^(?:pat)$) before Spark's partial
# rlike; oracles use regexp_full_match. Patterns must stay in the
# Java∩RE2-portable subset (no lookaround) for oracle parity.
_COND_REGEX = re.compile(
    r"(?is)^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"=~\s*(?P<val>'[^']*'|\"[^\"]*\")\s*$"
)
_COND_IN = re.compile(
    r"(?is)^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s+"
    r"IN\s*\[(?P<list>[^\]]*)\]\s*$"
)
# id(b) <op> integer (round-8): point/range lookups on the node id —
# still a scan-pushed PropFilter; the store maps the \x1did sentinel to
# the physical id column (no props access)
_COND_ID = re.compile(
    r"(?is)^\s*id\s*\(\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*"
    r"(?P<op><>|!=|<=|>=|=|<|>)\s*(?P<val>-?\d+)\s*$"
)
ID_PROP = "\x1did"
_IN_ITEM = re.compile(r"^\s*('[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*$")


def _encode_scalar_fn(fn: str, a1: str | None, a2: str | None, ctx: str) -> str:
    """Validate arity and encode a scalar function + integer args as the
    US-separated spec store.apply_scalar_fn evaluates. substring takes
    (start[, length]) 0-based per openCypher; left/right take (n)."""
    if fn == "substring":
        if a1 is None:
            raise CypherParseError(f"substring() needs a start index: {ctx!r}")
        return f"substring\x1f{a1}\x1f{a2 or ''}"
    if fn in ("left", "right"):
        if a1 is None or a2 is not None:
            raise CypherParseError(f"{fn}() takes exactly (b.prop, n): {ctx!r}")
        return f"{fn}\x1f{a1}"
    if a1 is not None or a2 is not None:
        raise CypherParseError(f"{fn}() takes a single property: {ctx!r}")
    return fn


def _arith_op_present(s: str) -> bool:
    """An arithmetic operator acting BETWEEN operands, decided on the
    token stream (round-15): an operator inside a string literal no
    longer counts, so ``c.name = 'a-b'`` stays a plain literal filter
    (scan pushdown) instead of detouring through the expression path.
    A leading unary sign does not count either, so ``c.x > -5`` stays
    a literal filter; ``a.x - 5`` (operator between operands) counts.
    Unlexable fragments keep the old raw scan as the fallback."""
    t = s.strip()
    try:
        toks = tokenize(t)
    except CypherLexError:
        if t.startswith("-"):
            t = t[1:]
        return re.search(r"[-+*/]", t) is not None
    for i, tok in enumerate(toks):
        if tok.kind == "punct" and tok.text in ("+", "-", "*", "/"):
            if i == 0 and tok.text == "-":
                continue
            return True
    return False


_CMP_TOKENS = {"<=", ">=", "<>", "!=", "=", "<", ">"}


def _top_cmps(c: str) -> tuple[list[tuple[int, int, str]], bool]:
    """Comparison-operator occurrences OUTSIDE string literals and
    CASE...END spans, via the token stream (round-15): a cmp inside a
    literal (``'a>b'``) or a CASE arm never splits, ``=~`` is one token
    and never yields its ``=``, and nested CASE pairs correctly (the
    old raw-text scan used a non-greedy regex and matched literal
    interiors). Returns ``([(start, end, op), ...], case_present)``."""
    try:
        toks = tokenize(c)
    except CypherLexError:
        return [], False
    out: list[tuple[int, int, str]] = []
    case_depth = 0
    case_present = False
    for i, t in enumerate(toks):
        if t.kind == "word":
            u = t.text.upper()
            if u == "CASE":
                case_depth += 1
                case_present = True
            elif u == "END" and case_depth:
                case_depth -= 1
        elif t.kind == "punct" and t.text in _CMP_TOKENS and case_depth == 0:
            out.append((t.pos, t.end, t.text))
        elif (
            t.kind == "punct"
            and t.text == "<-"
            and case_depth == 0
            and i + 1 < len(toks)
            and toks[i + 1].kind == "num"
        ):
            # the lexer is greedy on relationship arrows, so '<-5'
            # (meaning '< -5', spaceless) arrives as one '<-' token;
            # a number right after can only read as '<' plus unary
            # minus in predicate position (ADVICE r15) — split so the
            # RHS keeps the sign
            out.append((t.pos, t.pos + 1, "<"))
    return out, case_present


def _cmp_numeric_split(c: str) -> tuple[str, str, str, bool] | None:
    """Decompose ``<expr> <cmp> <numeric literal>`` on token spans
    (round-16, VERDICT r15 #4 — retiring the last raw-text comparison
    split, the old non-greedy ``(?P<lhs>.+?)(op)(num)$`` regex that
    could match a comparator inside a string literal): returns
    ``(lhs_text, op, val_text, case_present)`` when the conjunct's
    LAST top-level comparator is followed by nothing but a (signed)
    numeric literal, else None. Only the last comparator can qualify —
    any earlier one's tail contains the later comparator, which is not
    numeric — so this is exactly the split the backtracking regex
    computed, minus its literal-interior matches. The spaceless
    ``<-5`` lexer-greed case arrives pre-split from _top_cmps."""
    cmps, case_present = _top_cmps(c)
    if not cmps:
        return None
    s0, e0, op0 = cmps[-1]
    rhs = c[e0:]
    try:
        rtoks = tokenize(rhs)
    except CypherLexError:
        return None
    if len(rtoks) == 1 and rtoks[0].kind == "num":
        val = rtoks[0].text
    elif (
        len(rtoks) == 2
        and rtoks[0].kind == "punct"
        and rtoks[0].text == "-"
        and rtoks[1].kind == "num"
    ):
        val = "-" + rtoks[1].text
    else:
        return None
    return c[:s0], op0, val, case_present


_STATEMENT_CLAUSES = {
    "RETURN": ("RETURN",),
    "ORDER BY": ("ORDER", "BY"),
    "SKIP": ("SKIP",),
    "LIMIT": ("LIMIT",),
}
# the clause order the statement grammar admits (each at most once,
# RETURN mandatory) — openCypher's read-statement tail
_CLAUSE_RANK = {"RETURN": 0, "ORDER BY": 1, "SKIP": 2, "LIMIT": 3}


def parse(query: str) -> QueryGraph:
    """Statement-level split runs on the token stream (round-14,
    tokenizer.py): clause keywords inside string literals or in
    identifier positions (``o.skip``, ``AS limit``) never split. A bare
    binding actually NAMED like a tail keyword (``RETURN skip``) is the
    one deliberate non-goal — treat those words as reserved, as
    openCypher effectively does."""
    q = query.strip()
    try:
        toks = tokenize(q)
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    if not toks or not toks[0].is_word("MATCH") or len(toks) < 2:
        raise CypherParseError(
            f"unsupported query (expected MATCH ... RETURN ...): {query!r}"
        )
    try:
        segs = split_top_level(q, toks, _STATEMENT_CLAUSES)
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    head = segs[0]
    clauses: dict[str, str] = {}
    rank = -1
    for name, text in segs[1:]:
        if name in clauses or _CLAUSE_RANK[name] <= rank:
            raise CypherParseError(
                f"misplaced or duplicate {name} clause: {query!r}"
            )
        rank = _CLAUSE_RANK[name]
        clauses[name] = text
    if head[0] is not None or "RETURN" not in clauses:
        raise CypherParseError(
            f"unsupported query (expected MATCH ... RETURN ...): {query!r}"
        )
    body = head[1][toks[0].end :].strip()  # head text minus the MATCH keyword
    if not body:
        raise CypherParseError(f"empty MATCH pattern: {query!r}")
    for k in ("SKIP", "LIMIT"):
        if k in clauses and not re.fullmatch(r"\d+", clauses[k]):
            # an empty body usually means the word appeared as a bare
            # binding ('RETURN skip') — say so (ADVICE r14): SKIP /
            # LIMIT / RETURN / ORDER are reserved at top level here
            hint = (
                " (SKIP/LIMIT/RETURN/ORDER are reserved words — rename"
                " the binding or alias it)"
                if not clauses[k]
                else ""
            )
            raise CypherParseError(
                f"{k} expects a non-negative integer literal: "
                f"{clauses[k]!r}{hint}"
            )
    qg = QueryGraph()
    _parse_clauses(body, qg)
    _parse_returns(qg, clauses["RETURN"])
    _parse_order_limit(
        qg, clauses.get("ORDER BY"), clauses.get("LIMIT"), clauses.get("SKIP")
    )
    return qg


def split_with(query: str) -> list[str] | None:
    """Split a query on top-level WITH keywords (the stage separators of a
    Cypher pipeline — an extension beyond the reference surface, which has
    no WITH). Returns None when the query has no top-level WITH; string
    literals, bracketed groups, identifier positions (``a.with``,
    ``AS with``) and the WITH inside a STARTS WITH / ENDS WITH string
    predicate never split (token-stream scan, round-14)."""
    q = query.strip()
    try:
        toks = tokenize(q)
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None

    def not_string_op(ts, i):
        return not (i > 0 and ts[i - 1].is_word("STARTS", "ENDS"))

    try:
        segs = split_top_level(
            q, toks, {"WITH": ("WITH",)}, extra_guard=not_string_op
        )
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    if len(segs) <= 1:
        return None
    parts = [text for _, text in segs]
    if any(not p for p in parts):
        raise CypherParseError(f"dangling WITH: {query!r}")
    return parts


def _parse_clauses(body: str, qg: QueryGraph) -> None:
    """Parse `pattern [WHERE ...] (OPTIONAL MATCH pattern [WHERE ...])*`
    into qg's bindings/edges/filters (everything left of RETURN)."""
    anon = 0

    def fresh() -> str:
        nonlocal anon
        anon += 1
        return f"_anon{anon}"

    # clause list: required MATCH first, then zero or more OPTIONAL MATCH;
    # each clause is `patterns [WHERE conds]` and WHERE scoping follows
    # clause order (a clause's WHERE may only reference bindings bound so
    # far, like openCypher). Token-stream split (round-14): an OPTIONAL
    # MATCH inside a string literal or sub-pattern parens never splits.
    try:
        btoks = tokenize(body)
        clauses = [
            text
            for _, text in split_top_level(
                body, btoks, {"OPTIONAL MATCH": ("OPTIONAL", "MATCH")}
            )
        ]
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    for ci, clause in enumerate(clauses):
        # clause-level WHERE boundary on the token stream (round-15 —
        # the old non-greedy regex split at the FIRST ' WHERE ', so a
        # string literal containing it broke the clause): WHERE inside
        # literals/brackets/identifier positions never splits
        clause = clause.strip()
        try:
            ctoks = tokenize(clause)
            wsegs = split_top_level(clause, ctoks, {"WHERE": ("WHERE",)})
        except CypherLexError as e:
            raise CypherParseError(str(e)) from None
        if len(wsegs) > 2:
            raise CypherParseError(f"multiple WHERE in one clause: {clause!r}")
        patterns_text = wsegs[0][1].strip()
        where_text = wsegs[1][1].strip() if len(wsegs) == 2 else None
        if where_text == "":
            raise CypherParseError(f"empty WHERE in: {clause!r}")
        if not patterns_text:
            raise CypherParseError(f"empty MATCH clause in: {body!r}")
        target = qg.edges
        if ci > 0:
            target = []
            qg.optionals.append(target)
        clause_bound: set[str] = set()
        for pattern in _split_patterns(patterns_text):
            pm_ = re.match(r"^(?P<pname>[A-Za-z_][A-Za-z0-9_]*)\s*=\s*(?P<rest>.+)$", pattern)
            pname = None
            if pm_:
                pname, pattern = pm_.group("pname"), pm_.group("rest")
                # shortestPath((a)-[*]->(b)) (extension): under ANY_PAIR
                # distinct-match semantics the match set of shortestPath
                # equals plain reachability (every connected pair has a
                # shortest path), and length(p) is ALREADY the minimum
                # hop count — so the wrapper only needs stripping
                sp = re.match(r"(?is)^shortestPath\s*\(\s*(?P<inner>\(.+)\)\s*$", pattern)
                if sp:
                    pattern = sp.group("inner")
                if not pattern.startswith("("):
                    raise CypherParseError(f"unsupported path expression: {pm_.group('rest')!r}")
                if (
                    pname in qg.paths or pname in qg.opt_paths
                    or pname in qg.labels or pname in _edge_names(qg)
                ):
                    raise CypherParseError(f"path name collides with another binding: {pname!r}")
            start = len(target)
            _parse_pattern(pattern, qg, target, fresh, clause_bound)
            if pname is not None:
                if ci > 0:
                    # path binding inside an OPTIONAL MATCH (round-7):
                    # length(p) left-joins with the group, NULL unmatched
                    qg.opt_paths[pname] = (
                        ci - 1, tuple(range(start, len(target)))
                    )
                else:
                    qg.paths[pname] = tuple(range(start, len(target)))
        if ci == 0:
            qg.match_bindings = set(qg.labels)
        elif not target:
            raise CypherParseError("OPTIONAL MATCH needs at least one pattern edge")
        if where_text:
            enames = _edge_names(qg)
            clause_enames = {e.name for e in target if e.name}

            def check_binding(b: str, cond: str) -> None:
                if b not in qg.labels and b not in enames:
                    raise CypherParseError(f"WHERE references unbound variable: {b!r}")
                # clause scoping: the planner applies a clause's predicates
                # to that clause's own pattern only, so a predicate on a
                # binding outside the clause would be silently dropped —
                # reject it instead (correlated optional WHERE unsupported)
                if b not in clause_bound and b not in clause_enames:
                    raise CypherParseError(
                        f"WHERE in clause {ci} references {b!r}, which is not part of "
                        "that clause's pattern (correlated clause predicates unsupported)"
                    )

            def atoms_of(cond: str) -> list[PropFilter]:
                nlm = _COND_NULL.match(cond) or _COND_EXISTS.match(cond)
                if nlm:
                    check_binding(nlm.group("b"), cond)
                    # exists(b.prop) (openCypher 9) == b.prop IS NOT NULL;
                    # NOT exists(...) arrives here with neg set by the
                    # boolean splitter's NOT handling
                    op = "is_not_null" if nlm.groupdict().get("neg") or (
                        "exists" in nlm.re.pattern
                    ) else "is_null"
                    return [PropFilter(
                        nlm.group("b"), nlm.group("p"), op, None, False,
                        clause=ci,
                    )]
                fm = _COND_FN.match(cond)
                if fm:
                    check_binding(fm.group("b"), cond)
                    fn = fm.group("fn").lower()
                    fn = _encode_scalar_fn(fn, fm.group("a1"), fm.group("a2"), cond)
                    raw = fm.group("val")
                    if raw[0] in "'\"":
                        value, is_num = raw[1:-1], False
                    else:
                        value, is_num = float(raw), True
                    numeric_fns = ("size", "tofloat", "tointeger")
                    if fn in numeric_fns and not is_num:
                        raise CypherParseError(
                            f"{fm.group('fn')}() compares against a number: {cond!r}"
                        )
                    if fn not in numeric_fns and is_num:
                        raise CypherParseError(
                            f"{fm.group('fn')}() compares against a string: {cond!r}"
                        )
                    return [PropFilter(
                        fm.group("b"), fm.group("p"), fm.group("op"),
                        value, is_num, clause=ci, fn=fn,
                    )]
                wm = _COND.match(cond)
                if wm:
                    check_binding(wm.group("b"), cond)
                    raw = wm.group("val")
                    if raw[0] in "'\"":
                        value, is_num = raw[1:-1], False
                    else:
                        value, is_num = float(raw), True
                    return [PropFilter(
                        wm.group("b"), wm.group("p"), wm.group("op"),
                        value, is_num, clause=ci,
                    )]
                idm = _COND_ID.match(cond)
                if idm:
                    b = idm.group("b")
                    check_binding(b, cond)
                    if b not in qg.labels:
                        raise CypherParseError(
                            f"id() in WHERE needs a node variable: {b!r}"
                        )
                    return [PropFilter(
                        b, ID_PROP, idm.group("op"),
                        float(idm.group("val")), True, clause=ci,
                    )]
                rx = _COND_REGEX.match(cond)
                if rx:
                    check_binding(rx.group("b"), cond)
                    # anchor HERE (openCypher =~ is a full match): the
                    # planner's op lambdas receive the value as a lit()
                    # Column, so the pattern must arrive ready-to-use
                    return [PropFilter(
                        rx.group("b"), rx.group("p"), "regex",
                        f"^(?:{rx.group('val')[1:-1]})$", False, clause=ci,
                    )]
                sm = _COND_STR.match(cond)
                if sm:
                    check_binding(sm.group("b"), cond)
                    op = re.sub(r"\s+", "_", sm.group("op").lower())  # starts_with etc.
                    return [PropFilter(
                        sm.group("b"), sm.group("p"), op,
                        sm.group("val")[1:-1], False, clause=ci,
                    )]
                im = _COND_IN.match(cond)
                if im:
                    check_binding(im.group("b"), cond)
                    atoms = []
                    items = _split_patterns(im.group("list"))
                    if not im.group("list").strip():
                        raise CypherParseError(f"empty IN list: {cond!r}")
                    for item in items:
                        vm = _IN_ITEM.match(item)
                        if not vm:
                            raise CypherParseError(f"unsupported IN list item: {item!r}")
                        raw = vm.group(1)
                        if raw[0] in "'\"":
                            value, is_num = raw[1:-1], False
                        else:
                            value, is_num = float(raw), True
                        atoms.append(PropFilter(
                            im.group("b"), im.group("p"), "=", value, is_num, clause=ci
                        ))
                    return atoms
                raise CypherParseError(f"unsupported WHERE condition: {cond!r}")

            # WHERE is CNF: conjuncts split on top-level AND, each conjunct
            # an optionally-parenthesized disjunction. SQL precedence makes
            # a bare `a AND b OR c` mean `(a AND b) OR c`, which CNF-first
            # splitting would silently mis-read — so OR groups must be
            # parenthesized whenever ANDs are present.
            conjuncts = _split_bool(where_text, "AND")
            for conj in conjuncts:
                c, parenthesized = _strip_outer_parens(conj)
                # pattern predicate conjunct: [NOT] (..)-[..]-(..) — the
                # leading paren plus an edge bracket distinguishes it from
                # a parenthesized OR group (already stripped above)
                pm = re.match(r"(?is)^(?P<neg>NOT\s+)?(?P<pat>\(.*)$", c)
                if pm and re.search(r"-\s*\[", pm.group("pat")):
                    if ci > 0:
                        raise CypherParseError(
                            "pattern predicates in OPTIONAL MATCH WHERE are unsupported"
                        )
                    tmp: list[PatternEdge] = []
                    _parse_pattern(pm.group("pat"), qg, tmp, fresh, set())
                    if not any(
                        b in clause_bound for e2 in tmp for b in (e2.src, e2.dst)
                    ):
                        raise CypherParseError(
                            "pattern predicate must reference a bound binding"
                        )
                    qg.pattern_filters.append((tuple(tmp), bool(pm.group("neg"))))
                    continue
                em = _cmp_numeric_split(c)
                if em and (
                    (_arith_op_present(em[0]) and "." in em[0]) or em[3]
                ):
                    # arithmetic predicate: expr <op> numeric literal
                    lhs_txt, cmp_op, cmp_val, _case = em
                    if ci > 0:
                        raise CypherParseError(
                            "arithmetic WHERE in OPTIONAL MATCH is unsupported"
                        )
                    toks = _tokenize_expr(lhs_txt)
                    node, end = _parse_arith(toks)
                    if end != len(toks):
                        raise CypherParseError(f"trailing tokens in WHERE expression: {c!r}")
                    leaves = expr_prop_leaves(node)
                    if not leaves:
                        raise CypherParseError(f"WHERE expression has no property: {c!r}")
                    for b, _pp in leaves:
                        check_binding(b, c)
                        if b in enames:
                            raise CypherParseError(
                                "arithmetic WHERE over edge variables is unsupported"
                            )
                    qg.expr_filters.append(
                        (node, cmp_op, ("num", float(cmp_val)))
                    )
                    continue
                # expr-vs-expr comparison (extension): split at the FIRST
                # comparison operator OUTSIDE any CASE...END span (a CASE
                # right of the outer comparison, e.g. `a.x > CASE WHEN
                # b.y = 1 ...`, has internal comparisons that must not
                # split; arithmetic itself has none). Token-stream scan
                # (round-15): cmps inside string literals never match.
                cmps, case_present = _top_cmps(c)
                if cmps and "." in c and (
                    case_present
                    or _arith_op_present(c[:cmps[0][0]])
                    or _arith_op_present(c[cmps[0][1]:])
                    or re.match(r"(?i)\s*(?:abs|round|ceil|floor|sqrt)\s*\(", c)
                ):
                    first_start, first_end, first_op = cmps[0]
                    lhs_txt, rhs_txt = c[:first_start], c[first_end:]
                    try:
                        lt = _tokenize_expr(lhs_txt)
                        ln, le = _parse_arith(lt)
                        rt = _tokenize_expr(rhs_txt)
                        rn, re_ = _parse_arith(rt)
                        ok = le == len(lt) and re_ == len(rt)
                    except CypherParseError:
                        ok = False
                    if ok:
                        leaves = expr_prop_leaves(ln) + expr_prop_leaves(rn)
                        if leaves:
                            if ci > 0:
                                raise CypherParseError(
                                    "arithmetic WHERE in OPTIONAL MATCH is unsupported"
                                )
                            for b, _pp in leaves:
                                check_binding(b, c)
                                if b in enames:
                                    raise CypherParseError(
                                        "arithmetic WHERE over edge variables is unsupported"
                                    )
                            qg.expr_filters.append((ln, first_op, rn))
                            continue
                disjuncts = _split_bool(c, "OR")
                if len(disjuncts) > 1 and len(conjuncts) > 1 and not parenthesized:
                    raise CypherParseError(
                        "parenthesize OR groups when mixing AND and OR: "
                        f"ambiguous conjunct {conj!r}"
                    )
                atoms = [a for d in disjuncts for a in atoms_of(d)]
                if len(atoms) == 1:
                    pf = atoms[0]
                    (qg.edge_filters if pf.binding in enames else qg.filters).append(pf)
                    continue
                if any(a.binding in enames for a in atoms):
                    raise CypherParseError(
                        "OR over edge-variable predicates is unsupported"
                    )
                bindings = {a.binding for a in atoms}
                if len(bindings) == 1:
                    qg.or_filters.append(tuple(atoms))
                else:
                    if ci > 0:
                        raise CypherParseError(
                            "cross-binding OR in OPTIONAL MATCH WHERE is unsupported"
                        )
                    qg.cross_filters.append(tuple(atoms))


_EXPR_TOKEN = re.compile(
    r"\s*(?:(?P<kw>(?i:CASE|WHEN|THEN|ELSE|END)\b)"
    r"|(?P<fnword>(?i:size|abs|round|ceil|floor|sqrt)\b)"
    r"|(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<str>'[^']*')"
    r"|(?P<prop>[A-Za-z_][A-Za-z0-9_]*\.[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<cmp><=|>=|<>|=|<|>)"
    r"|(?P<op>[-+*/()]))"
)


def _tokenize_expr(s: str) -> list[tuple[str, object]]:
    toks, pos = [], 0
    while pos < len(s):
        m = _EXPR_TOKEN.match(s, pos)
        if not m:
            if s[pos:].strip() == "":
                break
            raise CypherParseError(f"bad token in expression at: {s[pos:]!r}")
        if m.group("kw") is not None:
            toks.append(("kw", m.group("kw").upper()))
        elif m.group("fnword") is not None:
            toks.append(("fn", m.group("fnword").upper()))
        elif m.group("num") is not None:
            toks.append(("num", float(m.group("num"))))
        elif m.group("str") is not None:
            toks.append(("str", m.group("str")[1:-1]))
        elif m.group("prop") is not None:
            b, p = m.group("prop").split(".")
            toks.append(("prop", (b, p)))
        elif m.group("cmp") is not None:
            toks.append(("cmp", m.group("cmp")))
        else:
            toks.append(("op", m.group("op")))
        pos = m.end()
    return toks


def _parse_arith(toks: list, pos: int = 0) -> tuple[tuple, int]:
    """Precedence-climbing: expr := term (('+'|'-') term)*;
    term := factor (('*'|'/') factor)*;
    factor := num | binding.prop | '(' expr ')' | '-' factor."""

    def case_expr(i):
        """CASE WHEN <expr cmp literal> THEN <expr> [WHEN ...]
        [ELSE <expr>] END (extension): the conditional-aggregate
        primitive (TPC-H Q12/Q14 CASE-bucket shape)."""
        whens = []
        while i < len(toks) and toks[i] == ("kw", "WHEN"):
            cond_l, i = expr(i + 1)
            if i >= len(toks) or toks[i][0] != "cmp":
                raise CypherParseError("CASE WHEN needs a comparison")
            cmp_op = toks[i][1]
            i += 1
            if i >= len(toks) or toks[i][0] not in ("num", "str"):
                raise CypherParseError("CASE WHEN compares against a literal")
            lit = toks[i]
            i += 1
            if i >= len(toks) or toks[i] != ("kw", "THEN"):
                raise CypherParseError("CASE WHEN without THEN")
            then_e, i = expr(i + 1)
            whens.append((cond_l, cmp_op, lit, then_e))
        if not whens:
            raise CypherParseError("CASE without WHEN")
        else_e = None
        if i < len(toks) and toks[i] == ("kw", "ELSE"):
            else_e, i = expr(i + 1)
        if i >= len(toks) or toks[i] != ("kw", "END"):
            raise CypherParseError("CASE without END")
        return ("case", tuple(whens), else_e), i + 1

    def factor(i):
        if i >= len(toks):
            raise CypherParseError("expression ends unexpectedly")
        kind, val = toks[i]
        if kind == "kw" and val == "CASE":
            return case_expr(i + 1)
        if kind == "fn" and val == "SIZE":
            # size(b.prop): string length as a numeric leaf
            if (
                i + 3 >= len(toks) or toks[i + 1] != ("op", "(")
                or toks[i + 2][0] != "prop" or toks[i + 3] != ("op", ")")
            ):
                raise CypherParseError("size() takes exactly one binding.prop")
            b, p = toks[i + 2][1]
            return ("strlen", b, p), i + 4
        if kind == "fn":
            # numeric scalar functions (round-8): abs/round/ceil/floor/
            # sqrt over any sub-expression -> ("fn1", name, child)
            if i + 1 >= len(toks) or toks[i + 1] != ("op", "("):
                raise CypherParseError(f"{val.lower()}() needs parentheses")
            node, j = expr(i + 2)
            if j >= len(toks) or toks[j] != ("op", ")"):
                raise CypherParseError(f"unbalanced parentheses in {val.lower()}()")
            return ("fn1", val.lower(), node), j + 1
        if kind == "num":
            return ("num", val), i + 1
        if kind == "prop":
            return ("prop", val[0], val[1]), i + 1
        if kind == "op" and val == "(":
            node, j = expr(i + 1)
            if j >= len(toks) or toks[j] != ("op", ")"):
                raise CypherParseError("unbalanced parentheses in expression")
            return node, j + 1
        if kind == "op" and val == "-":
            node, j = factor(i + 1)
            return ("neg", node), j
        raise CypherParseError(f"unexpected token in expression: {val!r}")

    def term(i):
        node, i = factor(i)
        while i < len(toks) and toks[i][0] == "op" and toks[i][1] in "*/":
            op = toks[i][1]
            rhs, i = factor(i + 1)
            node = ("op", op, node, rhs)
        return node, i

    def expr(i):
        node, i = term(i)
        while i < len(toks) and toks[i][0] == "op" and toks[i][1] in "+-":
            op = toks[i][1]
            rhs, i = term(i + 1)
            node = ("op", op, node, rhs)
        return node, i

    return expr(pos)


def _try_parse_expr_item(qg: QueryGraph, item: str) -> bool:
    """Arithmetic RETURN item `[agg(] expr [)] AS alias` — attempted only
    after every simpler form failed. Leaves must be node-binding props
    (edge props: return the edge value by name and compute downstream)."""
    am = re.fullmatch(
        r"(?is)\s*(?:(?P<fn>sum|avg|min|max)\s*\((?P<inner>.+)\)|(?P<bare>.+?))"
        r"\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s*",
        item,
    )
    if not am:
        raise CypherParseError(
            f"arithmetic RETURN item needs an AS alias: {item!r}"
        )
    body = am.group("inner") if am.group("fn") else am.group("bare")
    toks = _tokenize_expr(body)
    node, end = _parse_arith(toks)
    if end != len(toks):
        raise CypherParseError(f"trailing tokens in expression: {item!r}")
    leaves = expr_prop_leaves(node)
    if not leaves:
        raise CypherParseError(f"expression has no property reference: {item!r}")
    for b, _ in leaves:
        if b not in qg.labels:
            raise CypherParseError(
                f"expression references unbound or non-node variable: {b!r}"
            )
    qg.expr_returns.append(
        ExprItem(am.group("fn").lower() if am.group("fn") else None, node,
                 am.group("alias"))
    )
    return True


def _parse_returns(qg: QueryGraph, returns: str) -> None:
    """Parse a RETURN / WITH item list into qg's return fields."""
    # RETURN DISTINCT is accepted and is a no-op: match results are
    # already distinct endpoint combinations (ANY_PAIR existence
    # semantics, Readme.md:66-70 returns a Set)
    returns_src = re.sub(r"(?is)^\s*DISTINCT\s+", "", returns)
    # paren-aware split: coalesce(b.prop, 'x') carries a comma inside
    for item in _split_patterns(returns_src):
        name = item.strip()
        if name == "*":
            # RETURN *: every named (non-anonymous) binding of the match,
            # in name order — pattern-filter-only bindings are excluded
            # like any other non-match binding
            scope = qg.match_bindings or set(qg.labels)
            named = sorted(b for b in scope if not b.startswith("_anon"))
            if not named:
                raise CypherParseError("RETURN * with no named bindings")
            qg.returns.extend(b for b in named if b not in qg.returns)
            continue
        sm = re.fullmatch(r"(?i)count\s*\(\s*\*\s*\)(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?", name)
        if sm:
            # count(*) counts the distinct matches themselves
            qg.aggregates.append(AggItem("count", "*", None, sm.group("alias") or "count_star"))
            continue
        lm = re.fullmatch(
            r"(?i)length\s*\(\s*(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*\)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if lm:
            pn = lm.group("p")
            if pn not in qg.paths and pn not in qg.opt_paths:
                raise CypherParseError(f"length() of unknown path: {pn!r}")
            qg.path_lengths.append((pn, lm.group("alias") or f"len_{pn}"))
            continue
        cm = re.fullmatch(
            r"(?i)(?P<fn>count|sum|avg|min|max|collect|stDev|stDevP)\s*\(\s*"
            r"(?P<dist>DISTINCT\s+)?(?P<arg>[A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\.(?P<p>[A-Za-z_][A-Za-z0-9_]*))?\s*\)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if cm:
            fn, arg, prop = cm.group("fn").lower(), cm.group("arg"), cm.group("p")
            dist = cm.group("dist") is not None
            if arg not in qg.labels:
                # edge-variable property aggregate: sum/avg/min/max/
                # collect(e.prop) over the typed edge columns
                if arg in _edge_names(qg) and fn != "count":
                    if prop is None:
                        raise CypherParseError(
                            f"{fn}() needs a property: {fn}({arg}.<prop>)"
                        )
                    if dist:
                        raise CypherParseError(
                            "DISTINCT edge-property aggregates are unsupported"
                        )
                    alias = cm.group("alias") or f"{fn}_{arg}_{prop}"
                    qg.aggregates.append(AggItem(fn, arg, prop, alias, on_edge=True))
                    continue
                raise CypherParseError(f"{fn}() of unbound variable: {arg!r}")
            if fn == "count":
                # count(b.prop) counts matches whose property is non-NULL
                # (openCypher parity, VERDICT r6 #8); count(b) counts all;
                # count(DISTINCT ...) counts the distinct values
                alias = cm.group("alias") or (
                    f"count_{arg}" if prop is None else f"count_{arg}_{prop}"
                )
            elif fn == "collect":
                # collect(b) / collect(b.prop): the SORTED DISTINCT value
                # list — openCypher's collect() with the deterministic
                # reading existence semantics imply (a bag ordered by
                # arrival would be nondeterministic under distinct-match
                # evaluation); DISTINCT is therefore a no-op
                alias = cm.group("alias") or (
                    f"collect_{arg}" if prop is None else f"collect_{arg}_{prop}"
                )
            else:
                if prop is None:
                    raise CypherParseError(f"{fn}() needs a property: {fn}({arg}.<prop>)")
                alias = cm.group("alias") or f"{fn}_{arg}_{prop}"
            qg.aggregates.append(AggItem(fn, arg, prop, alias, distinct=dist))
            continue
        pcm = re.fullmatch(
            r"(?i)percentile(?P<kind>Cont|Disc)\s*\(\s*"
            r"(?P<arg>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*,\s*"
            r"(?P<q>0?\.\d+|0|1(?:\.0*)?)\s*\)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if pcm:
            arg = pcm.group("arg")
            if arg not in qg.labels:
                raise CypherParseError(f"percentile of unbound variable: {arg!r}")
            kind = "percentilecont" if pcm.group("kind").lower() == "cont" else "percentiledisc"
            alias = pcm.group("alias") or f"{kind}_{arg}_{pcm.group('p')}"
            qg.aggregates.append(
                AggItem(kind, arg, pcm.group("p"), alias, param=float(pcm.group("q")))
            )
            continue
        clm = re.fullmatch(
            r"(?i)coalesce\s*\(\s*"
            r"(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*,\s*"
            r"(?P<dflt>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*\)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if clm:
            b = clm.group("b")
            if b not in qg.labels:
                raise CypherParseError(f"coalesce() of unbound or non-node variable: {b!r}")
            raw = clm.group("dflt")
            dflt = raw[1:-1] if raw[0] in "'\"" else raw  # props are strings
            alias = clm.group("alias") or f"coalesce_{b}_{clm.group('p')}"
            qg.coalesce_returns.append((b, clm.group("p"), dflt, alias))
            continue
        sfm = re.fullmatch(
            r"(?i)(?P<fn>toLower|toUpper|trim|reverse|substring|left|right|toFloat|toInteger|toString)\s*\(\s*"
            r"(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*"
            r"(?:,\s*(?P<a1>\d+)\s*)?(?:,\s*(?P<a2>\d+)\s*)?\)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if sfm:
            b, fn = sfm.group("b"), sfm.group("fn").lower()
            if b not in qg.labels:
                raise CypherParseError(f"{fn}() of unbound or non-node variable: {b!r}")
            spec = _encode_scalar_fn(fn, sfm.group("a1"), sfm.group("a2"), name)
            alias = sfm.group("alias") or f"{fn}_{b}_{sfm.group('p')}"
            qg.string_fn_returns.append((spec, b, sfm.group("p"), alias))
            continue
        rpm = re.fullmatch(
            r"(?i)replace\s*\(\s*"
            r"(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*,\s*"
            r"'(?P<x>[^']*)'\s*,\s*'(?P<y>[^']*)'\s*\)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if rpm:
            b = rpm.group("b")
            if b not in qg.labels:
                raise CypherParseError(f"replace() of unbound or non-node variable: {b!r}")
            alias = rpm.group("alias") or f"replace_{b}_{rpm.group('p')}"
            qg.string_fn_returns.append(
                (f"replace\x1f{rpm.group('x')}\x1f{rpm.group('y')}", b, rpm.group("p"), alias)
            )
            continue
        ccm = None
        if re.search(r"'[^']*'|\"[^\"]*\"", name):
            # a quoted literal + a top-level '+' = string concatenation
            # (must run BEFORE the arithmetic branch, which would try to
            # evaluate the chain as numbers)
            ccm = re.fullmatch(
                r"(?is)(?P<body>.+?)\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)",
                name,
            )
            if ccm and "+" not in _strip_quoted(ccm.group("body")):
                ccm = None
        if ccm:
            parts = []
            for piece in _split_plus_quoted(ccm.group("body")):
                if piece and piece[0] in "'\"" and piece[-1] == piece[0]:
                    parts.append(("lit", piece[1:-1]))
                    continue
                ppm = re.fullmatch(
                    r"(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)",
                    piece,
                )
                if not ppm:
                    raise CypherParseError(
                        f"string concatenation takes b.prop and quoted "
                        f"literals only: {piece!r}"
                    )
                if ppm.group("b") not in qg.labels:
                    raise CypherParseError(
                        f"concat of unbound or non-node variable: {ppm.group('b')!r}"
                    )
                parts.append(("prop", ppm.group("b"), ppm.group("p")))
            qg.concat_returns.append((tuple(parts), ccm.group("alias")))
            continue
        gfm = re.fullmatch(
            r"(?i)(?P<fn>id|labels|type|keys|properties)\s*\(\s*"
            r"(?P<b>[A-Za-z_][A-Za-z0-9_]*)\s*\)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if gfm:
            # graph-introspection functions (round-8): id(n) projects the
            # binding's node id; labels(n) the sorted comma-joined label
            # string (scalar-contract rendering of openCypher's list);
            # type(r) rides the edge-property path — `type` is a physical
            # column of the edge table, so the scan carries it for free
            fn, b = gfm.group("fn").lower(), gfm.group("b")
            alias = gfm.group("alias") or f"{fn}_{b}"
            if fn == "type":
                if b not in _edge_names(qg):
                    raise CypherParseError(f"type() of non-edge variable: {b!r}")
                qg.edge_prop_returns.append((b, "type", alias))
            elif b not in qg.labels:
                raise CypherParseError(f"{fn}() of unbound or non-node variable: {b!r}")
            elif fn == "id":
                qg.id_returns.append((b, alias))
            elif fn == "labels":
                qg.labels_returns.append((b, alias))
            else:
                # keys()/properties(): sorted comma-joined rendering
                qg.keys_returns.append((b, alias, fn == "properties"))
            continue
        pm = re.fullmatch(
            r"(?i)(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)"
            r"(?:\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*))?",
            name,
        )
        if pm:
            b = pm.group("b")
            alias = pm.group("alias") or f"{b}_{pm.group('p')}"
            if b in qg.labels:
                qg.prop_returns.append((b, pm.group("p"), alias))
            elif b in _edge_names(qg):
                qg.edge_prop_returns.append((b, pm.group("p"), alias))
            else:
                raise CypherParseError(f"return of unbound variable: {b!r}")
            continue
        if (
            (re.search(r"[+*/-]", name) and "." in name)
            or re.search(r"(?i)\bCASE\s+WHEN\b", name)
            or re.match(r"(?i)\s*(?:abs|round|ceil|floor|sqrt)\s*\(", name)
        ):
            _try_parse_expr_item(qg, name)
            continue
        am = re.fullmatch(
            r"(?i)(?P<n>[A-Za-z_][A-Za-z0-9_]*)\s+AS\s+"
            r"(?P<a>[A-Za-z_][A-Za-z0-9_]*)",
            name,
        )
        if am and am.group("n") in qg.labels:
            # RETURN b AS alias (round-8): the binding's id column under
            # a new name — shares id()'s zero-cost projection path (the
            # shape UNION sides need to line their columns up)
            qg.id_returns.append((am.group("n"), am.group("a")))
            continue
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise CypherParseError(f"unsupported return item: {name!r}")
        if name in qg.paths or name in qg.opt_paths:
            raise CypherParseError(
                f"cannot return path {name!r} itself; only length({name}) is supported"
            )
        if name not in qg.labels:
            raise CypherParseError(f"return of unbound variable: {name!r}")
        qg.returns.append(name)
    if not (
        qg.returns or qg.prop_returns or qg.edge_prop_returns or qg.aggregates
        or qg.path_lengths or qg.expr_returns or qg.string_fn_returns
        or qg.coalesce_returns or qg.id_returns or qg.labels_returns
        or qg.concat_returns or qg.keys_returns
    ):
        raise CypherParseError("empty RETURN")


_PARAM = re.compile(r"\$(?P<name>[A-Za-z_][A-Za-z0-9_]*)")


def bind_params(query: str, params: dict | None) -> str:
    """Substitute ``$name`` parameters with literals before parsing
    (openCypher query parameters; the reference surface has none).
    Values render as: str -> single-quoted (rejecting embedded quotes —
    the grammar's literals carry no escapes), int/float -> plain
    numeric, list -> bracket list of the same renderings (for IN).
    Parameters inside quoted literals are left alone. A ``$name`` with
    no binding raises; unused bindings are ignored (openCypher)."""
    params = params or {}

    def render(v) -> str:
        if isinstance(v, bool):
            raise CypherParseError(
                "boolean parameters are unsupported (props are strings)"
            )
        if isinstance(v, str):
            if "'" in v or '"' in v:
                raise CypherParseError(
                    f"string parameter contains a quote (literals carry "
                    f"no escapes): {v!r}"
                )
            return f"'{v}'"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, (list, tuple)):
            return "[" + ", ".join(render(x) for x in v) + "]"
        raise CypherParseError(f"unsupported parameter type: {type(v).__name__}")

    out, i, inq = [], 0, None
    while i < len(query):
        ch = query[i]
        if inq:
            out.append(ch)
            if ch == inq:
                inq = None
            i += 1
            continue
        if ch in "'\"":
            inq = ch
            out.append(ch)
            i += 1
            continue
        if ch == "$":
            m = _PARAM.match(query, i)
            if not m:
                raise CypherParseError(f"bad parameter reference at: {query[i:i+20]!r}")
            name = m.group("name")
            if name not in params:
                raise CypherParseError(f"missing query parameter: ${name}")
            out.append(render(params[name]))
            i = m.end()
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _strip_quoted(s: str) -> str:
    """The string with quoted spans removed — for operator detection
    outside literals."""
    return re.sub(r"'[^']*'|\"[^\"]*\"", "", s)


def _split_plus_quoted(s: str) -> list[str]:
    """Split a concat body on top-level '+' via the token stream
    (round-15): '+' inside a quoted literal or a bracket group never
    splits. Empty parts are kept — the piece grammar downstream rejects
    them with its own error, as before."""
    try:
        parts = split_punct(s, tokenize(s), "+")
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    return [p.strip() for p in parts]


def out_columns(qg: QueryGraph) -> set[str]:
    """Names of the columns a planned qg emits (bindings + aliases)."""
    return (
        set(qg.returns)
        | {alias for _, _, alias in qg.prop_returns}
        | {alias for _, _, alias in qg.edge_prop_returns}
        | {a.alias for a in qg.aggregates}
        | {alias for _, alias in qg.path_lengths}
        | {it.alias for it in qg.expr_returns}
        | {a for _, _, _, a in qg.string_fn_returns}
        | {a for _, _, _, a in qg.coalesce_returns}
        | {a for _, a in qg.id_returns}
        | {a for _, a in qg.labels_returns}
        | {a for _, a in qg.concat_returns}
        | {a for _, a, _w in qg.keys_returns}
    )


def _parse_order_limit(
    qg: QueryGraph, orderby: str | None, limit: str | None, skip: str | None = None
) -> None:
    out_cols = out_columns(qg)
    if orderby:
        # token-stream comma split (round-15): empties kept so `a,,b`
        # still errors as an unsupported item, matching the old split
        try:
            ob_parts = split_punct(orderby, tokenize(orderby), ",")
        except CypherLexError as e:
            raise CypherParseError(str(e)) from None
        for part in ob_parts:
            om = re.fullmatch(r"(?i)\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)(?:\s+(?P<dir>ASC|DESC))?\s*", part)
            if om and om.group("col") in out_cols:
                desc = (om.group("dir") or "").upper() == "DESC"
                qg.order_by.append((om.group("col"), desc))
                qg.order_items.append(("col", om.group("col"), desc))
                continue
            # ORDER BY b.prop (extension): sort by a property without
            # returning it — resolved via the planner's props join and
            # dropped after LIMIT
            pm = re.fullmatch(
                r"(?i)\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)"
                r"(?:\s+(?P<dir>ASC|DESC))?\s*",
                part,
            )
            if pm:
                if pm.group("b") not in qg.labels:
                    raise CypherParseError(
                        f"ORDER BY property of unbound binding: {part!r}"
                    )
                qg.order_items.append((
                    "prop", pm.group("b"), pm.group("p"),
                    (pm.group("dir") or "").upper() == "DESC",
                ))
                continue
            if om:
                raise CypherParseError(
                    f"ORDER BY of non-returned column: {om.group('col')!r}"
                )
            raise CypherParseError(f"unsupported ORDER BY item: {part!r}")
    if skip:
        qg.skip = int(skip)
    if limit:
        qg.limit = int(limit)


def _split_bool(s: str, word: str) -> list[str]:
    """Split a WHERE fragment on a top-level boolean keyword (AND/OR)
    via the token stream (round-15, continuing the r14 statement-level
    migration one clause inward): the keyword inside a string literal,
    inside any bracket group — (), [] incl. IN-list brackets, {} — or
    in an identifier position (``a.and``, ``x AS or``) never splits;
    the per-predicate grammar inside each part stays regex."""
    try:
        toks = tokenize(s)
        segs = split_top_level(s, toks, {word: (word,)})
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    out = [text for _, text in segs]
    if any(not p for p in out):
        raise CypherParseError(f"dangling {word} in WHERE: {s!r}")
    return out


def _strip_outer_parens(s: str) -> tuple[str, bool]:
    """Remove one pair of parens if they wrap the whole conjunct; returns
    (stripped, was_parenthesized). Token-stream scan (round-15): a paren
    inside a string literal (`(c.name = ')')`) no longer miscounts;
    unlexable input keeps the old char scan."""
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        return s, False
    try:
        toks = tokenize(s)
    except CypherLexError:
        depth = 0
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    return s, False
        return s[1:-1].strip(), True
    depth = 0
    for i, t in enumerate(toks):
        if t.kind != "punct":
            continue
        if t.text == "(":
            depth += 1
        elif t.text == ")":
            depth -= 1
            if depth == 0 and i != len(toks) - 1:
                return s, False  # e.g. "(a) OR (b)" — parens don't wrap all
    return s[1:-1].strip(), True


def _edge_names(qg: QueryGraph) -> set[str]:
    return {e.name for e in qg.edges if e.name} | {
        e.name for g in qg.optionals for e in g if e.name
    }


def _parse_pattern(
    pattern: str, qg: QueryGraph, target: list[PatternEdge], fresh,
    clause_bound: set[str] | None = None,
) -> None:
    """Parse one node-edge-node chain, appending edges to `target`
    (qg.edges for MATCH, a group list for OPTIONAL MATCH). Node bindings
    named in this pattern are added to `clause_bound` (WHERE scoping)."""
    if clause_bound is None:
        clause_bound = set()
    pos = 0
    pattern = pattern.strip()
    nm = _NODE.match(pattern, pos)
    if not nm:
        raise CypherParseError(f"expected node at: {pattern[pos:]!r}")
    prev = _bind_node(qg, nm, fresh)
    clause_bound.add(prev)
    pos = nm.end()
    while pos < len(pattern):
        em = _EDGE.match(pattern, pos)
        if not em:
            raise CypherParseError(f"expected edge at: {pattern[pos:]!r}")
        if em.group("left") and em.group("right"):
            raise CypherParseError(
                "bidirected edges <-[]-> unsupported (reference is directed-only, "
                "QueryGraph.scala:76-83)"
            )
        pos = em.end()
        nm = _NODE.match(pattern, pos)
        if not nm:
            raise CypherParseError(f"expected node at: {pattern[pos:]!r}")
        cur = _bind_node(qg, nm, fresh)
        clause_bound.add(cur)
        pos = nm.end()
        types = tuple(t.strip() for t in em.group("types").split("|")) if em.group("types") else ()
        ename = em.group("name")
        if ename is not None and ename in qg.labels:
            raise CypherParseError(f"edge variable collides with node binding: {ename!r}")
        if ename is not None and ename in _edge_names(qg):
            # each edge variable binds one pattern edge; reuse would need
            # same-edge identity semantics the planner doesn't implement
            raise CypherParseError(f"edge variable reused across pattern edges: {ename!r}")
        lo, hi = 1, 1
        star = em.group(0).find("*") != -1
        if star:
            lo = int(em.group("lo")) if em.group("lo") else 1
            if em.group("range"):
                # *lo..hi; open upper end (*n..) = unbounded closure
                hi = int(em.group("hi")) if em.group("hi") else None
            elif em.group("lo") is not None:
                hi = lo  # *n = exactly n hops
            else:
                hi = None  # bare * = 1..unbounded
            if lo < 1 or (hi is not None and hi < lo):
                raise CypherParseError(f"invalid path bounds *{lo}..{hi}")
        if em.group("right"):  # (prev)-[:T]->(cur)
            target.append(PatternEdge(prev, cur, types, lo, hi, ename))
        elif em.group("left"):  # (prev)<-[:T]-(cur)
            target.append(PatternEdge(cur, prev, types, lo, hi, ename))
        else:  # (prev)-[:T]-(cur) — undirected, Direction.Both
            target.append(PatternEdge(prev, cur, types, lo, hi, ename, True))
        prev = cur


def _split_patterns(s: str) -> list[str]:
    """Split on top-level commas via the token stream (round-15,
    continuing the r14/r15 migration: one lexer, not three). A comma
    inside a string literal (round-8: a concat separator `', '` or an
    IN-list item is data, not a delimiter) or inside any bracket group
    — (), [], now also {} — never splits. Empty parts are dropped
    (trailing comma tolerated, as before)."""
    try:
        parts = split_punct(s, tokenize(s), ",")
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    return [p for p in (x.strip() for x in parts) if p]


def _bind_node(qg: QueryGraph, nm: re.Match, fresh) -> str:
    name = nm.group("name") or fresh()
    raw = nm.group("labels") or ""
    lbls = [l.strip() for l in raw.split(":") if l.strip()]
    label = lbls[0] if lbls else None
    extra = tuple(dict.fromkeys(lbls[1:]))  # dedup, keep order
    if name in qg.labels:
        if label is not None and qg.labels[name] is not None and qg.labels[name] != label:
            raise CypherParseError(f"conflicting labels for {name}")
        if label is not None:
            qg.labels[name] = label
    else:
        qg.labels[name] = label
    if extra:
        prev = qg.extra_labels.get(name, ())
        qg.extra_labels[name] = tuple(dict.fromkeys(prev + extra))
    return name
