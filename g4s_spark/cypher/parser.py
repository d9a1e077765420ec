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

from .tokenizer import (
    CypherLexError,
    Token,
    split_punct,
    split_top_level,
    tokenize,
)


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


# inline property maps (round-16, openCypher MapExpression): `{k: lit,
# ...}` on a pattern node or single-hop edge desugars to equality
# PropFilters. `[^{}]*` is the same no-nesting/no-quoted-brace contract
# as the CREATE/MERGE map grammar (planner._CREATE_NODE_PAT).
_NODE = re.compile(
    r"\(\s*(?P<name>[A-Za-z_][A-Za-z0-9_]*)?\s*"
    r"(?P<labels>(?::\s*[A-Za-z_][A-Za-z0-9_]*)*)\s*"
    r"(?:\{(?P<props>[^{}]*)\}\s*)?\)"
)
_EDGE = re.compile(
    r"(?P<left><)?-\s*\[\s*(?P<name>[A-Za-z_][A-Za-z0-9_]*)?\s*"
    r"(?::\s*(?P<types>[A-Za-z_][A-Za-z0-9_]*(?:\s*\|\s*[A-Za-z_][A-Za-z0-9_]*)*))?\s*"
    r"(?:\*\s*(?P<lo>\d+)?\s*(?P<range>\.\.)?\s*(?P<hi>\d+)?\s*)?"
    r"(?:\{(?P<props>[^{}]*)\}\s*)?\]\s*-(?P<right>>)?"
)


class CypherParseError(ValueError):
    """The ONLY exception the query front-end may raise (the fuzz suites
    assert no foreign exceptions escape — the reference throws a typed
    MatchError the same way)."""


ID_PROP = "\x1did"

# ---------------------------------------------------------------------------
# Per-predicate grammar on token spans (round-16, VERDICT r15 "what's
# missing #3" — retiring the _COND* regex family that round 7-13 grew).
# Every WHERE atom — b.p <cmp> literal, IS [NOT] NULL, exists(), scalar
# fn, =~, STARTS/ENDS WITH, CONTAINS, IN [...], id() — is now shape-
# matched on the token list, so a comparator or keyword INSIDE a string
# literal can never split or match, whitespace never matters, and the
# lexer-greedy '<-NUM' case ('c.x <-5' meaning '< -5', ADVICE r15) is
# normalized once for every shape instead of per-regex. The reference
# gets this from its openCypher front-end (reference build.sbt:117).
# Deliberate liberalizations vs the regexes (documented in the round-16
# corpus diff, scripts/predicate_corpus.py): a unary minus may be
# separated from its digits ('= - 5'), and a bracketed IN item yields
# "unsupported IN list item" instead of "unsupported WHERE condition".
# ---------------------------------------------------------------------------

# scalar functions admitted in fn(b.p[, i[, j]]) <cmp> literal position
_FN_WORDS = {
    "tolower", "toupper", "trim", "size", "reverse", "substring",
    "left", "right", "tofloat", "tointeger", "tostring",
}


def _split_arrow_lt(toks: list[Token]) -> list[Token]:
    """Re-emit a '<-' token immediately preceding a number as '<' plus
    '-' (the lexer is greedy on relationship arrows; in predicate
    position '<-5' can only read as '<' with a unary minus, ADVICE
    r15) so every downstream shape sees a plain comparator."""
    out: list[Token] = []
    for i, t in enumerate(toks):
        if (
            t.kind == "punct"
            and t.text == "<-"
            and i + 1 < len(toks)
            and toks[i + 1].kind == "num"
        ):
            out.append(Token("punct", "<", t.pos, t.pos + 1))
            out.append(Token("punct", "-", t.pos + 1, t.end))
        else:
            out.append(t)
    return out


def _prop_at(toks: list[Token], i: int) -> tuple[str, str, int] | None:
    """``b.p`` at toks[i:]: (binding, prop, next_index) or None."""
    if (
        i + 2 < len(toks)
        and toks[i].kind == "word"
        and toks[i + 1].kind == "punct"
        and toks[i + 1].text == "."
        and toks[i + 2].kind == "word"
    ):
        return toks[i].text, toks[i + 2].text, i + 3
    return None


def _lit_at(toks: list[Token], i: int) -> tuple[str, str, int] | None:
    """A scalar literal at toks[i:]: ('str'|'num', text, next_index) or
    None. String text is unquoted; a unary minus fuses with a following
    number token."""
    if i >= len(toks):
        return None
    t = toks[i]
    if t.kind == "str":
        return "str", t.text[1:-1], i + 1
    if t.kind == "num":
        return "num", t.text, i + 1
    if (
        t.kind == "punct"
        and t.text == "-"
        and i + 1 < len(toks)
        and toks[i + 1].kind == "num"
    ):
        return "num", "-" + toks[i + 1].text, i + 2
    return None


def _match_atom(toks: list[Token], cond: str):
    """Shape-match ONE predicate atom over its full token list; returns
    a tagged spec tuple, or None when no shape consumes every token
    (the caller raises the canonical "unsupported WHERE condition").
    Spec tags: plain / null / exists / fn / id / regex / strpred / in —
    one per retired _COND* regex."""
    toks = _split_arrow_lt(toks)
    n = len(toks)
    prop = _prop_at(toks, 0)
    if prop:
        b, p, j = prop
        if j >= n:
            return None
        t = toks[j]
        if t.kind == "punct" and t.text in _CMP_TOKENS:
            lit = _lit_at(toks, j + 1)
            if lit and lit[2] == n:
                return ("plain", b, p, t.text, lit[0], lit[1])
            return None
        if t.kind == "punct" and t.text == "=~":
            # openCypher =~ is a FULL-string match: the planner anchors
            # the pattern (^(?:pat)$) before Spark's partial rlike;
            # oracles use regexp_full_match. Patterns must stay in the
            # Java∩RE2-portable subset (no lookaround) for oracle parity.
            if j + 2 == n and toks[j + 1].kind == "str":
                return ("regex", b, p, toks[j + 1].text[1:-1])
            return None
        if t.is_word("IS"):
            # IS [NOT] NULL (round-7): a property absent from the props
            # map is NULL
            k = j + 1
            neg = k < n and toks[k].is_word("NOT")
            if neg:
                k += 1
            if k + 1 == n and toks[k].is_word("NULL"):
                return ("null", b, p, neg)
            return None
        if t.is_word("STARTS", "ENDS"):
            if (
                j + 3 == n
                and toks[j + 1].is_word("WITH")
                and toks[j + 2].kind == "str"
            ):
                op = "starts_with" if t.text.upper() == "STARTS" else "ends_with"
                return ("strpred", b, p, op, toks[j + 2].text[1:-1])
            return None
        if t.is_word("CONTAINS"):
            if j + 2 == n and toks[j + 1].kind == "str":
                return ("strpred", b, p, "contains", toks[j + 1].text[1:-1])
            return None
        if t.is_word("IN"):
            # IN [literals] expands to an equality OR-group (reusing the
            # scan-pushdown path). Comma-split the bracket interior;
            # empty segments are dropped (trailing/duplicate commas),
            # matching the retired _split_patterns behavior.
            if not (
                j + 1 < n
                and toks[j + 1].kind == "punct"
                and toks[j + 1].text == "["
                and toks[n - 1].kind == "punct"
                and toks[n - 1].text == "]"
            ):
                return None
            segs: list[list[Token]] = [[]]
            for t2 in toks[j + 2 : n - 1]:
                if t2.kind == "punct" and t2.text == ",":
                    segs.append([])
                else:
                    segs[-1].append(t2)
            items: list[tuple[str, str]] = []
            for seg in segs:
                if not seg:
                    continue
                lit = _lit_at(seg, 0)
                if lit is None or lit[2] != len(seg):
                    item = cond[seg[0].pos : seg[-1].end]
                    raise CypherParseError(f"unsupported IN list item: {item!r}")
                items.append((lit[0], lit[1]))
            return ("in", b, p, items)
        return None
    if toks and toks[0].kind == "word":
        head = toks[0].text
        u = head.lower()
        if u == "exists":
            # exists(b.prop) (openCypher 9) == b.prop IS NOT NULL
            if (
                n >= 3
                and toks[1].kind == "punct"
                and toks[1].text == "("
            ):
                inner = _prop_at(toks, 2)
                if (
                    inner
                    and inner[2] + 1 == n
                    and toks[inner[2]].kind == "punct"
                    and toks[inner[2]].text == ")"
                ):
                    return ("exists", inner[0], inner[1])
            return None
        if u == "id":
            # id(b) <op> integer (round-8): point/range lookups on the
            # node id — still a scan-pushed PropFilter; the store maps
            # the \x1did sentinel to the physical id column (no props)
            if (
                n >= 6
                and toks[1].kind == "punct"
                and toks[1].text == "("
                and toks[2].kind == "word"
                and toks[3].kind == "punct"
                and toks[3].text == ")"
                and toks[4].kind == "punct"
                and toks[4].text in _CMP_TOKENS
            ):
                lit = _lit_at(toks, 5)
                if (
                    lit
                    and lit[2] == n
                    and lit[0] == "num"
                    and "." not in lit[1]
                ):
                    return ("id", toks[2].text, toks[4].text, lit[1])
            return None
        if u in _FN_WORDS:
            # scalar function over a property (extension):
            # toLower/toUpper/trim(b.p) <op> 'str' | size(b.p) <op> num
            if not (n >= 2 and toks[1].kind == "punct" and toks[1].text == "("):
                return None
            inner = _prop_at(toks, 2)
            if not inner:
                return None
            b, p, k = inner
            args: list[str] = []
            while (
                len(args) < 2
                and k + 1 < n
                and toks[k].kind == "punct"
                and toks[k].text == ","
                and toks[k + 1].kind == "num"
                and "." not in toks[k + 1].text
            ):
                args.append(toks[k + 1].text)
                k += 2
            if not (k < n and toks[k].kind == "punct" and toks[k].text == ")"):
                return None
            k += 1
            if not (k < n and toks[k].kind == "punct" and toks[k].text in _CMP_TOKENS):
                return None
            op = toks[k].text
            lit = _lit_at(toks, k + 1)
            if lit and lit[2] == n:
                a1 = args[0] if args else None
                a2 = args[1] if len(args) > 1 else None
                return ("fn", head, b, p, a1, a2, op, lit[0], lit[1])
            return None
    return None


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
            _parse_pattern(pattern, qg, target, fresh, clause_bound, ci=ci)
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
                try:
                    ctoks = tokenize(cond)
                except CypherLexError as e:  # cond is a lexed-slice; belt+braces
                    raise CypherParseError(str(e)) from None
                # NOT <atom> (round-16): negation folds into the op —
                # under SQL 3VL every mapping is exact (NULL props drop
                # the row on both sides of the flip). NOT binds one atom;
                # a parenthesized group needs De Morgan the CNF splitter
                # doesn't do, and NOT IN would need an AND the OR-group
                # channel can't carry — both stay unsupported.
                neg = False
                cond_atom = cond
                if len(ctoks) > 1 and ctoks[0].is_word("NOT"):
                    neg = True
                    cond_atom = cond[ctoks[1].pos :]
                    ctoks = tokenize(cond_atom)  # re-lex: positions index cond_atom
                spec = _match_atom(ctoks, cond_atom)
                if spec is None:
                    raise CypherParseError(f"unsupported WHERE condition: {cond!r}")
                if neg:
                    atoms = _negate_atoms(
                        _apply_atom(spec, cond_atom, check_binding, qg, ci), cond
                    )
                    return atoms
                return _apply_atom(spec, cond_atom, check_binding, qg, ci)

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
                    _parse_pattern(
                        pm.group("pat"), qg, tmp, fresh, set(),
                        allow_props=False,
                    )
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


# ---------------------------------------------------------------------------
# RETURN/WITH item grammar on token spans (round-16, second migration
# chunk after the WHERE atoms: VERDICT r15 "what's missing #3" names
# the expression grammar). The twelve `re.fullmatch` item shapes are
# shape-matched on the token list instead: quoted-literal interiors are
# invisible, whitespace never matters (``sum ( a . age )`` now parses,
# a deliberate liberalization recorded in scripts/return_corpus.py's
# regex-vs-token diff), and the trailing ``AS alias`` is stripped once
# for every shape instead of per-regex. Two further liberalizations:
# replace() accepts double-quoted arguments like every other shape, and
# an arithmetic operator INSIDE a string literal no longer routes a
# junk item down the expression path (it falls to the canonical
# "unsupported return item" error instead).
# ---------------------------------------------------------------------------

_AGG_FNS = {"count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp"}
_EXPR_FN1_WORDS = {"abs", "round", "ceil", "floor", "sqrt"}
_INTROSPECT_FNS = {"id", "labels", "type", "keys", "properties"}


def _strip_ret_alias(toks: list[Token]) -> tuple[list[Token], str | None]:
    """Split a trailing ``AS alias`` off an item's token list. A bare
    ``AS x`` (empty body) is not an alias form — the caller falls
    through to the canonical unsupported-item error."""
    if len(toks) >= 3 and toks[-2].is_word("AS") and toks[-1].kind == "word":
        return toks[:-2], toks[-1].text
    return toks, None


def _ret_item_shape(toks: list[Token]):
    """Shape-match ONE aliased-stripped RETURN/WITH item body; returns a
    tagged spec tuple or None (caller tries concat, then the expression
    path, then the bare-binding forms). Tags: prop / count_star /
    length / agg / pct / coalesce / sfn / replace / ifn."""
    n = len(toks)
    pr = _prop_at(toks, 0)
    if pr and pr[2] == n:
        return ("prop", pr[0], pr[1])
    if not (
        n >= 3
        and toks[0].kind == "word"
        and toks[1].kind == "punct"
        and toks[1].text == "("
        and toks[n - 1].kind == "punct"
        and toks[n - 1].text == ")"
    ):
        return None
    fn_src = toks[0].text
    fnl = fn_src.lower()
    inner = toks[2 : n - 1]
    m = len(inner)
    if fnl == "count" and m == 1 and inner[0].kind == "punct" and inner[0].text == "*":
        return ("count_star",)
    if fnl == "length" and m == 1 and inner[0].kind == "word":
        return ("length", inner[0].text)
    if fnl in _AGG_FNS:
        k, dist = 0, False
        if m >= 2 and inner[0].is_word("DISTINCT"):
            k, dist = 1, True
        if m - k == 1 and inner[k].kind == "word":
            return ("agg", fnl, dist, inner[k].text, None)
        pr2 = _prop_at(inner, k)
        if pr2 and pr2[2] == m:
            return ("agg", fnl, dist, pr2[0], pr2[1])
        return None
    if fnl in ("percentilecont", "percentiledisc"):
        pr2 = _prop_at(inner, 0)
        if not pr2:
            return None
        k = pr2[2]
        if not (k < m and inner[k].kind == "punct" and inner[k].text == ","):
            return None
        if k + 2 == m and inner[k + 1].kind == "num":
            q = inner[k + 1].text
        elif (
            k + 3 == m
            and inner[k + 1].kind == "punct"
            and inner[k + 1].text == "."
            and inner[k + 2].kind == "num"
            and "." not in inner[k + 2].text
        ):
            q = "." + inner[k + 2].text  # '.9' lexes as '.' + '9'
        else:
            return None
        v = float(q)
        if not 0.0 <= v <= 1.0:  # out-of-range quantile: no shape, so the
            return None          # item falls to the canonical error
        return ("pct", fnl, pr2[0], pr2[1], v)
    if fnl == "coalesce":
        pr2 = _prop_at(inner, 0)
        if not pr2:
            return None
        k = pr2[2]
        if not (k < m and inner[k].kind == "punct" and inner[k].text == ","):
            return None
        lit = _lit_at(inner, k + 1)
        if lit and lit[2] == m:
            # props are stored as strings: a numeric default keeps its
            # source text, a quoted one its unquoted value
            return ("coalesce", pr2[0], pr2[1], lit[1])
        return None
    if fnl in _FN_WORDS:
        pr2 = _prop_at(inner, 0)
        if not pr2:
            return None
        b, p, k = pr2
        args: list[str] = []
        while (
            len(args) < 2
            and k + 1 < m
            and inner[k].kind == "punct"
            and inner[k].text == ","
            and inner[k + 1].kind == "num"
            and "." not in inner[k + 1].text
        ):
            args.append(inner[k + 1].text)
            k += 2
        if k != m:
            return None
        a1 = args[0] if args else None
        a2 = args[1] if len(args) > 1 else None
        return ("sfn", fnl, b, p, a1, a2)
    if fnl == "replace":
        pr2 = _prop_at(inner, 0)
        if not pr2:
            return None
        b, p, k = pr2
        strs: list[str] = []
        while (
            len(strs) < 2
            and k + 1 < m
            and inner[k].kind == "punct"
            and inner[k].text == ","
            and inner[k + 1].kind == "str"
        ):
            strs.append(inner[k + 1].text[1:-1])
            k += 2
        if k != m or len(strs) != 2:
            return None
        return ("replace", b, p, strs[0], strs[1])
    if fnl in _INTROSPECT_FNS and m == 1 and inner[0].kind == "word":
        return ("ifn", fnl, inner[0].text)
    return None


def _apply_ret_item(qg: QueryGraph, spec, name: str, alias: str | None) -> None:
    """Append one shape-matched RETURN/WITH item to qg, preserving the
    regex-era binding checks, default aliases, and error texts."""
    tag = spec[0]
    if tag == "prop":
        _, b, p = spec
        a = alias or f"{b}_{p}"
        if b in qg.labels:
            qg.prop_returns.append((b, p, a))
        elif b in _edge_names(qg):
            qg.edge_prop_returns.append((b, p, a))
        else:
            raise CypherParseError(f"return of unbound variable: {b!r}")
        return
    if tag == "count_star":
        # count(*) counts the distinct matches themselves
        qg.aggregates.append(AggItem("count", "*", None, alias or "count_star"))
        return
    if tag == "length":
        pn = spec[1]
        if pn not in qg.paths and pn not in qg.opt_paths:
            raise CypherParseError(f"length() of unknown path: {pn!r}")
        qg.path_lengths.append((pn, alias or f"len_{pn}"))
        return
    if tag == "agg":
        _, fn, dist, arg, prop = spec
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
                a = alias or f"{fn}_{arg}_{prop}"
                qg.aggregates.append(AggItem(fn, arg, prop, a, on_edge=True))
                return
            raise CypherParseError(f"{fn}() of unbound variable: {arg!r}")
        if fn == "count":
            # count(b.prop) counts matches whose property is non-NULL
            # (openCypher parity, VERDICT r6 #8); count(b) counts all;
            # count(DISTINCT ...) counts the distinct values
            a = alias or (
                f"count_{arg}" if prop is None else f"count_{arg}_{prop}"
            )
        elif fn == "collect":
            # collect(b) / collect(b.prop): the SORTED DISTINCT value
            # list — openCypher's collect() with the deterministic
            # reading existence semantics imply (a bag ordered by
            # arrival would be nondeterministic under distinct-match
            # evaluation); DISTINCT is therefore a no-op
            a = alias or (
                f"collect_{arg}" if prop is None else f"collect_{arg}_{prop}"
            )
        else:
            if prop is None:
                raise CypherParseError(f"{fn}() needs a property: {fn}({arg}.<prop>)")
            a = alias or f"{fn}_{arg}_{prop}"
        qg.aggregates.append(AggItem(fn, arg, prop, a, distinct=dist))
        return
    if tag == "pct":
        _, kind, arg, prop, q = spec
        if arg not in qg.labels:
            raise CypherParseError(f"percentile of unbound variable: {arg!r}")
        a = alias or f"{kind}_{arg}_{prop}"
        qg.aggregates.append(AggItem(kind, arg, prop, a, param=q))
        return
    if tag == "coalesce":
        _, b, p, dflt = spec
        if b not in qg.labels:
            raise CypherParseError(
                f"coalesce() of unbound or non-node variable: {b!r}"
            )
        qg.coalesce_returns.append((b, p, dflt, alias or f"coalesce_{b}_{p}"))
        return
    if tag == "sfn":
        _, fn, b, p, a1, a2 = spec
        if b not in qg.labels:
            raise CypherParseError(f"{fn}() of unbound or non-node variable: {b!r}")
        enc = _encode_scalar_fn(fn, a1, a2, name)
        qg.string_fn_returns.append((enc, b, p, alias or f"{fn}_{b}_{p}"))
        return
    if tag == "replace":
        _, b, p, x, y = spec
        if b not in qg.labels:
            raise CypherParseError(
                f"replace() of unbound or non-node variable: {b!r}"
            )
        qg.string_fn_returns.append(
            (f"replace\x1f{x}\x1f{y}", b, p, alias or f"replace_{b}_{p}")
        )
        return
    if tag == "ifn":
        # graph-introspection functions (round-8): id(n) projects the
        # binding's node id; labels(n) the sorted comma-joined label
        # string (scalar-contract rendering of openCypher's list);
        # type(r) rides the edge-property path — `type` is a physical
        # column of the edge table, so the scan carries it for free
        _, fn, b = spec
        a = alias or f"{fn}_{b}"
        if fn == "type":
            if b not in _edge_names(qg):
                raise CypherParseError(f"type() of non-edge variable: {b!r}")
            qg.edge_prop_returns.append((b, "type", a))
        elif b not in qg.labels:
            raise CypherParseError(f"{fn}() of unbound or non-node variable: {b!r}")
        elif fn == "id":
            qg.id_returns.append((b, a))
        elif fn == "labels":
            qg.labels_returns.append((b, a))
        else:
            # keys()/properties(): sorted comma-joined rendering
            qg.keys_returns.append((b, a, fn == "properties"))
        return
    raise CypherParseError(f"unsupported return item: {name!r}")  # unreachable


def _split_depth0_plus(toks: list[Token]) -> list[list[Token]]:
    """Token segments of a concat body between top-level '+' operators
    ('+' inside any bracket group never splits; a '+' inside a string
    literal is already literal-interior by lexing). Empty segments are
    kept — the piece grammar rejects them with its own error."""
    segs: list[list[Token]] = [[]]
    depth = 0
    for t in toks:
        if t.kind == "punct" and t.text in "([{":
            depth += 1
        elif t.kind == "punct" and t.text in ")]}":
            depth -= 1
        if t.kind == "punct" and t.text == "+" and depth == 0:
            segs.append([])
        else:
            segs[-1].append(t)
    return segs


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
        try:
            itoks = tokenize(name)
        except CypherLexError as e:  # item is a lexed slice; belt+braces
            raise CypherParseError(str(e)) from None
        body, alias = _strip_ret_alias(itoks)
        spec = _ret_item_shape(body) if body else None
        if spec is not None:
            _apply_ret_item(qg, spec, name, alias)
            continue
        # string concatenation: a quoted literal plus a top-level '+'
        # (checked BEFORE the arithmetic path, which would try to
        # evaluate the chain as numbers); the alias is mandatory — an
        # unaliased concat falls through to the expression path whose
        # needs-an-AS-alias error names the real fix
        if (
            alias is not None
            and any(t.kind == "str" for t in body)
            and any(t.kind == "punct" and t.text == "+" for t in body)
        ):
            parts = []
            for seg in _split_depth0_plus(body):
                if len(seg) == 1 and seg[0].kind == "str":
                    parts.append(("lit", seg[0].text[1:-1]))
                    continue
                pp = _prop_at(seg, 0)
                if not (pp and pp[2] == len(seg)):
                    piece = name[seg[0].pos : seg[-1].end] if seg else ""
                    raise CypherParseError(
                        f"string concatenation takes b.prop and quoted "
                        f"literals only: {piece!r}"
                    )
                if pp[0] not in qg.labels:
                    raise CypherParseError(
                        f"concat of unbound or non-node variable: {pp[0]!r}"
                    )
                parts.append(("prop", pp[0], pp[1]))
            qg.concat_returns.append((tuple(parts), alias))
            continue
        # arithmetic / CASE / math-fn items ride the expression path;
        # detection is token-level, so an operator inside a string
        # literal no longer routes a junk item here
        has_dot = any(t.kind == "punct" and t.text == "." for t in itoks)
        has_op = any(t.kind == "punct" and t.text in "+-*/" for t in itoks)
        has_case = any(
            t.is_word("CASE") and i + 1 < len(itoks) and itoks[i + 1].is_word("WHEN")
            for i, t in enumerate(itoks)
        )
        fn1_head = (
            len(itoks) >= 2
            and itoks[0].kind == "word"
            and itoks[0].text.lower() in _EXPR_FN1_WORDS
            and itoks[1].kind == "punct"
            and itoks[1].text == "("
        )
        if (has_op and has_dot) or has_case or fn1_head:
            _try_parse_expr_item(qg, name)
            continue
        if (
            alias is not None
            and len(body) == 1
            and body[0].kind == "word"
            and body[0].text in qg.labels
        ):
            # RETURN b AS alias (round-8): the binding's id column under
            # a new name — shares id()'s zero-cost projection path (the
            # shape UNION sides need to line their columns up)
            qg.id_returns.append((body[0].text, alias))
            continue
        if not (alias is None and len(body) == 1 and body[0].kind == "word"):
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
            # token shapes (round-16, with the WHERE/RETURN migrations):
            # `col [ASC|DESC]` over an output column, or `b.prop
            # [ASC|DESC]` (extension) — sort by a property without
            # returning it, resolved via the planner's props join and
            # dropped after LIMIT
            try:
                ptoks = tokenize(part)
            except CypherLexError as e:
                raise CypherParseError(str(e)) from None
            desc = False
            if ptoks and ptoks[-1].is_word("ASC", "DESC"):
                desc = ptoks[-1].text.upper() == "DESC"
                ptoks = ptoks[:-1]
            if len(ptoks) == 1 and ptoks[0].kind == "word":
                col = ptoks[0].text
                if col in out_cols:
                    qg.order_by.append((col, desc))
                    qg.order_items.append(("col", col, desc))
                    continue
                raise CypherParseError(
                    f"ORDER BY of non-returned column: {col!r}"
                )
            opr = _prop_at(ptoks, 0)
            if opr and opr[2] == len(ptoks):
                if opr[0] not in qg.labels:
                    raise CypherParseError(
                        f"ORDER BY property of unbound binding: {part!r}"
                    )
                qg.order_items.append(("prop", opr[0], opr[1], desc))
                continue
            raise CypherParseError(f"unsupported ORDER BY item: {part!r}")
    if skip:
        qg.skip = int(skip)
    if limit:
        qg.limit = int(limit)



_NEG_OP = {
    "=": "<>", "<>": "=", "!=": "=",
    "<": ">=", "<=": ">", ">": "<=", ">=": "<",
    "is_null": "is_not_null", "is_not_null": "is_null",
    "regex": "not_regex", "starts_with": "not_starts_with",
    "ends_with": "not_ends_with", "contains": "not_contains",
}


def _negate_atoms(atoms: list[PropFilter], cond: str) -> list[PropFilter]:
    """Fold a leading NOT into the atom's operator (round-16). A
    multi-atom result means an IN list — its negation is a conjunction
    the per-disjunct OR channel cannot carry, so it stays unsupported."""
    if len(atoms) != 1:
        raise CypherParseError(
            f"NOT IN is unsupported — spell it as <> conjuncts: {cond!r}"
        )
    f = atoms[0]
    return [PropFilter(
        f.binding, f.prop, _NEG_OP[f.op], f.value, f.is_num,
        clause=f.clause, fn=f.fn,
    )]


def _apply_atom(spec, cond: str, check_binding, qg: QueryGraph, ci: int) -> list[PropFilter]:
    """Turn a _match_atom spec into PropFilters, preserving the
    regex-era binding checks and error texts (extracted from the
    atoms_of closure when NOT folding landed, round-16)."""
    tag = spec[0]
    if tag in ("null", "exists"):
        b, p = spec[1], spec[2]
        check_binding(b, cond)
        # exists(b.prop) (openCypher 9) == b.prop IS NOT NULL
        op = (
            "is_not_null"
            if tag == "exists" or spec[3]
            else "is_null"
        )
        return [PropFilter(b, p, op, None, False, clause=ci)]
    if tag == "fn":
        _, fn_src, b, p, a1, a2, op, lk, lv = spec
        check_binding(b, cond)
        fn = _encode_scalar_fn(fn_src.lower(), a1, a2, cond)
        is_num = lk == "num"
        value = float(lv) if is_num else lv
        numeric_fns = ("size", "tofloat", "tointeger")
        if fn in numeric_fns and not is_num:
            raise CypherParseError(
                f"{fn_src}() compares against a number: {cond!r}"
            )
        if fn not in numeric_fns and is_num:
            raise CypherParseError(
                f"{fn_src}() compares against a string: {cond!r}"
            )
        return [PropFilter(
            b, p, op, value, is_num, clause=ci, fn=fn,
        )]
    if tag == "plain":
        _, b, p, op, lk, lv = spec
        check_binding(b, cond)
        is_num = lk == "num"
        value = float(lv) if is_num else lv
        return [PropFilter(b, p, op, value, is_num, clause=ci)]
    if tag == "id":
        _, b, op, lv = spec
        check_binding(b, cond)
        if b not in qg.labels:
            raise CypherParseError(
                f"id() in WHERE needs a node variable: {b!r}"
            )
        return [PropFilter(
            b, ID_PROP, op, float(lv), True, clause=ci,
        )]
    if tag == "regex":
        _, b, p, pat = spec
        check_binding(b, cond)
        # anchor HERE (openCypher =~ is a full match): the
        # planner's op lambdas receive the value as a lit()
        # Column, so the pattern must arrive ready-to-use
        return [PropFilter(
            b, p, "regex", f"^(?:{pat})$", False, clause=ci,
        )]
    if tag == "strpred":
        _, b, p, op, val = spec
        check_binding(b, cond)
        return [PropFilter(b, p, op, val, False, clause=ci)]
    if tag == "in":
        _, b, p, items = spec
        check_binding(b, cond)
        if not items:
            raise CypherParseError(f"empty IN list: {cond!r}")
        return [
            PropFilter(
                b, p, "=",
                float(lv) if lk == "num" else lv,
                lk == "num", clause=ci,
            )
            for lk, lv in items
        ]
    raise CypherParseError(f"unsupported WHERE condition: {cond!r}")


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


def _parse_prop_map(s: str) -> list[tuple[str, str | float, bool]]:
    """Inline property-map entries ``k: literal[, ...]`` (round-16,
    openCypher MapExpression — the reference front-end accepts these
    via its openCypher artifact, reference build.sbt:117): returns
    (key, value, is_num) triples with the same literal semantics as
    WHERE equality atoms. Token shapes throughout — a comma or colon
    inside a quoted value never splits."""
    entries: list[tuple[str, str | float, bool]] = []
    for entry in _split_patterns(s):
        try:
            toks = tokenize(entry)
        except CypherLexError as e:
            raise CypherParseError(str(e)) from None
        if (
            len(toks) >= 3
            and toks[0].kind == "word"
            and toks[1].kind == "punct"
            and toks[1].text == ":"
        ):
            lit = _lit_at(toks, 2)
            if lit and lit[2] == len(toks):
                kind, text = lit[0], lit[1]
                entries.append(
                    (toks[0].text, float(text) if kind == "num" else text,
                     kind == "num")
                )
                continue
        raise CypherParseError(f"unsupported pattern property entry: {entry!r}")
    return entries


def _parse_pattern(
    pattern: str, qg: QueryGraph, target: list[PatternEdge], fresh,
    clause_bound: set[str] | None = None, ci: int = 0,
    allow_props: bool = True,
) -> None:
    """Parse one node-edge-node chain, appending edges to `target`
    (qg.edges for MATCH, a group list for OPTIONAL MATCH). Node bindings
    named in this pattern are added to `clause_bound` (WHERE scoping).
    Inline property maps desugar to clause-``ci`` equality PropFilters;
    ``allow_props=False`` (pattern predicates) rejects them — a map
    there would wrongly constrain the whole match, not the semi-join."""
    if clause_bound is None:
        clause_bound = set()

    def desugar_node_props(nm: re.Match, binding: str) -> None:
        raw = nm.group("props")
        if raw is None:
            return
        if not allow_props:
            raise CypherParseError(
                "property maps in pattern predicates are unsupported"
            )
        for k, v, is_num in _parse_prop_map(raw):
            qg.filters.append(PropFilter(binding, k, "=", v, is_num, clause=ci))

    pos = 0
    pattern = pattern.strip()
    nm = _NODE.match(pattern, pos)
    if not nm:
        raise CypherParseError(f"expected node at: {pattern[pos:]!r}")
    prev = _bind_node(qg, nm, fresh)
    clause_bound.add(prev)
    desugar_node_props(nm, prev)
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
        desugar_node_props(nm, cur)
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
        # scan for '*' only up to the props map (a quoted prop value may
        # legitimately contain '*'); before round-16 the whole match was
        # quote-free so group(0).find sufficed
        star_end = em.start("props") if em.group("props") is not None else em.end()
        star = pattern.find("*", em.start(), star_end) != -1
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
        eprops = em.group("props")
        if eprops is not None:
            if not allow_props:
                raise CypherParseError(
                    "property maps in pattern predicates are unsupported"
                )
            if star:
                # a map on a var-length edge constrains EVERY hop — the
                # closure runner has no per-hop filter channel; spell it
                # as single hops or filter the expanded edges in WHERE
                raise CypherParseError(
                    "property maps on variable-length pattern edges are "
                    "unsupported"
                )
            entries = _parse_prop_map(eprops)
            if entries and ename is None:
                ename = fresh()  # filters are keyed by edge name
            for k, v, is_num in entries:
                qg.edge_filters.append(
                    PropFilter(ename, k, "=", v, is_num, clause=ci)
                )
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
