"""Cost-based pattern-match planner: QueryGraph -> DataFrame program.

Reference pipeline (SURVEY §3.1): QueryGraph -> LogicNode DFS
(LogicNode.scala:106-200) -> memo optimizer picking join order from label
statistics (Optimizer.scala:24-38) -> physical mxm chain
(Operator.scala:150-197).

Spark-first translation (SURVEY §7.1): instead of boolean matrices keyed
by (start, current) we carry one id column per binding through a chain of
equi-joins — strictly more capable (multi-binding RETURN needs no separate
Join/tuple-merge stage, cf. GrBTuples.scala:67-147) and it lets Catalyst
fuse the whole chain into whole-stage-codegen'd hash joins.

The reference's semantics we must preserve (SURVEY §7.3):
- ANY_PAIR existence semiring == duplicate elimination after every hop
  (Operator.scala:401-424): we project to the *live* bindings (returned or
  still needed by a pending pattern edge) and dropDuplicates after each
  join. This bounds every intermediate at |distinct live-binding tuples| —
  the reason the plan survives 100 TB instead of exploding with path
  multiplicity.
- Label filters are semi-joins (FilterMul, Operator.scala:298-324),
  broadcast when the label's cardinality is small.
- Join order is chosen by the reference's cost model (plans/cost.py) over
  edge-step estimates: type_card × src-label-sel × dst-label-sel — greedy
  smallest-first, which reproduces the OptimSpec plan flips for chain
  queries.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields as dc_fields, is_dataclass, replace as dc_replace

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

import re

from ..checkpointing import iter_checkpoint
from ..cypher.parser import (
    CypherParseError,
    ID_PROP,
    bind_params,
    expr_prop_leaves,
    PatternEdge,
    QueryGraph,
    _parse_clauses,
    _parse_returns,
    _split_bool,
    parse,
    split_with,
)
from ..graph.store import PropertyGraph, apply_scalar_fn
from .cost import expand_card, step_cost

BROADCAST_MAX_ROWS = 2_000_000  # label sets below this are broadcast


@dataclass
class PlannedQuery:
    df: DataFrame
    steps: list[tuple] = field(default_factory=list)  # for plan-shape tests
    cost: float = 0.0


_UNWIND = re.compile(
    r"(?is)^\s*UNWIND\s*(?:\[(?P<list>[^\]]*)\]"
    r"|range\s*\(\s*(?P<rng>-?\d+\s*,\s*-?\d+(?:\s*,\s*-?\d+)?)\s*\))"
    r"\s+AS\s+(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"\s+(?P<rest>.+)$"
)
_IN_ITEM = re.compile(r"^\s*('[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*$")
# trailing `UNWIND <carried-col|literal-list|range()> AS alias` inside a
# WITH stage (see _run_with_pipeline)
_UNWIND_TAIL = re.compile(
    r"(?is)\s+UNWIND\s+(?:(?P<src>[A-Za-z_][A-Za-z0-9_]*)"
    r"|\[(?P<lits>[^\]]*)\]"
    r"|range\s*\(\s*(?P<rng>-?\d+\s*,\s*-?\d+(?:\s*,\s*-?\d+)?)\s*\))"
    r"\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s*$"
)


# ranges that must materialize as a Python list (the WITH-tail UNWIND
# embeds them as a literal array) are capped so UNWIND range(0, 1e8)
# cannot OOM the driver; the leading-UNWIND path uses spark.range and
# has no cap (ADVICE r6)
_RANGE_LIST_CAP = 1_000_000


def _range_bounds(txt: str) -> tuple[int, int, int]:
    """openCypher range(start, end[, step]): INCLUSIVE of end; step
    defaults to 1 and must move toward end. Returns (start, stop, step)
    with stop exclusive, ready for range()/spark.range()."""
    parts = [int(p) for p in txt.split(",")]
    start, end = parts[0], parts[1]
    step = parts[2] if len(parts) > 2 else 1
    if step == 0 or (end - start) * step < 0:
        raise CypherParseError(f"range() step never reaches the end: {txt!r}")
    return start, end + (1 if step > 0 else -1), step


def _parse_range(txt: str) -> list[int]:
    start, stop, step = _range_bounds(txt)
    if abs(stop - start) // abs(step) > _RANGE_LIST_CAP:
        raise CypherParseError(
            f"range({txt}) exceeds {_RANGE_LIST_CAP} elements; use a "
            "leading UNWIND (distributed via spark.range) instead"
        )
    return list(range(start, stop, step))


def _parse_literal_list(items_txt: str) -> list:
    """The literal list of an UNWIND: quoted strings or numbers, one
    shared type."""
    from ..cypher.parser import _split_patterns

    vals = []
    for raw in _split_patterns(items_txt):
        m = _IN_ITEM.match(raw)
        if not m:
            raise CypherParseError(f"unsupported UNWIND list item: {raw!r}")
        tok = m.group(1)
        vals.append(tok[1:-1] if tok[0] in "'\"" else (
            float(tok) if "." in tok else int(tok)))
    if not vals:
        raise CypherParseError("UNWIND over an empty list")
    kinds = {type(v) for v in vals}
    if len(kinds) > 1:
        raise CypherParseError(f"mixed-type UNWIND list: {items_txt!r}")
    return vals


def _split_union(query: str) -> tuple[list[str], bool]:
    """Top-level UNION [ALL] segments (token-stream split, round-14 —
    a UNION inside a string literal or parens never splits). openCypher
    forbids mixing UNION and UNION ALL in one query; so do we."""
    from ..cypher.tokenizer import CypherLexError, split_top_level, tokenize

    q = query.strip()
    try:
        toks = tokenize(q)
        parts = split_top_level(q, toks, {"UNION": ("UNION",)})
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    if len(parts) <= 1:
        return [q], False
    alls = []
    segs = [parts[0][1]]
    for _, p in parts[1:]:
        m = re.match(r"(?is)^ALL\s+(?P<rest>.+)$", p)
        alls.append(bool(m))
        segs.append(m.group("rest") if m else p)
    if any(not s for s in segs):
        raise CypherParseError(f"dangling UNION in: {query!r}")
    if len(set(alls)) > 1:
        raise CypherParseError("cannot mix UNION and UNION ALL in one query")
    return segs, alls[0]


def run_cypher(
    graph: PropertyGraph,
    query: str,
    resolve: bool = False,
    params: dict | None = None,
) -> DataFrame:
    """Parse + plan + emit. Result: one column per returned binding holding
    node ids; with resolve=True, payload rows (id + label per binding,
    Readme.md:66-70 result semantics). Queries with top-level WITH run as
    a stage pipeline; UNION [ALL] combines same-shaped sub-queries; a
    leading UNWIND over a literal list cross-multiplies the match rows
    (all extensions beyond the reference surface). ``params`` binds
    ``$name`` query parameters as literals before parsing (round-8)."""
    if params is not None:
        query = bind_params(query, params)
    segs, union_all = _split_union(query)
    if len(segs) > 1:
        dfs = [run_cypher(graph, s, resolve=resolve) for s in segs]
        cols = sorted(dfs[0].columns)
        for d in dfs[1:]:
            if sorted(d.columns) != cols:
                raise CypherParseError(
                    f"UNION sides return different columns: {cols} vs {sorted(d.columns)}"
                )
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        # UNION dedups across sides; each side is already distinct under
        # the engine's existence semantics, so ALL only skips that final
        # cross-side dedup
        return out if union_all else out.dropDuplicates()
    um = _UNWIND.match(query)
    if um:
        return _run_unwind(graph, um, resolve)
    parts = split_with(query)
    if parts is not None:
        df, bindings = _run_with_pipeline(graph, parts)
    else:
        qg = parse(query)
        df = plan_match(graph, qg).df
        bindings = set(qg.labels)
    if resolve:
        # sorted comma-joined label SET per id (round-9): the same
        # aggregated lookup labels() uses — a multi-label node resolves
        # to one row carrying all its labels, never a fanout
        ldf = (
            graph.nodes.select("id", "label")
            .dropDuplicates(["id", "label"])
            .groupBy("id")
            .agg(
                F.concat_ws(",", F.sort_array(F.collect_set("label"))).alias("_lbls")
            )
        )
        for b in df.columns:
            if b not in bindings:
                continue
            df = df.join(
                ldf.select(F.col("id").alias(b), F.col("_lbls").alias(f"{b}_label")),
                on=b,
                how="left",
            )
    return df


def _stmt_verb_split(
    query: str, verbs: dict[str, tuple[str, ...]]
) -> tuple[str, str, str] | None:
    """Carve ``MATCH <body> <VERB> <tail>`` at the FIRST top-level verb
    keyword on the token stream (round-14, cypher/tokenizer.py): a verb
    inside a string literal (``WHERE a.s = '... DELETE ...'``) or in
    identifier position (``a.delete``) never splits — the lazy-regex
    statement splits this replaces cut at the first verb-shaped
    substring regardless. Returns (verb_name, body, tail), or None when
    the statement does not open with MATCH or carries no top-level
    verb."""
    from ..cypher.tokenizer import CypherLexError, scan_clauses, tokenize

    q = query.strip()
    try:
        toks = tokenize(q)
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    if not toks or not toks[0].is_word("MATCH") or len(toks) < 2:
        return None
    try:
        hits = scan_clauses(toks, verbs)
    except CypherLexError as e:
        raise CypherParseError(str(e)) from None
    # skip a hit at token 0 (the statement verb must FOLLOW the MATCH)
    hits = [h for h in hits if h[1] > 0]
    if not hits:
        return None
    name, _i, start, end = hits[0]
    body = q[toks[0].end : start].strip()
    return name, body, q[end:].strip()


# SET n:Label / REMOVE n:Label — label mutation (round-8)
_SET_LABEL_ITEM = re.compile(
    r"(?is)^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\s*:\s*"
    r"(?P<label>[A-Za-z_][A-Za-z0-9_]*)\s*$"
)
_SET_ITEM = re.compile(
    r"(?is)^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"=\s*(?P<val>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*$"
)
_SET_ITEM_ANY = re.compile(
    r"(?is)^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"=\s*(?P<rhs>.+?)\s*$"
)


_NUM_FNS = {
    "abs": F.abs, "round": F.round, "ceil": F.ceil,
    "floor": F.floor, "sqrt": F.sqrt,
}


def _num_fn_col(name: str, c: "F.Column") -> "F.Column":
    """Numeric scalar functions in expression trees (round-8) — results
    cast to double so ceil/floor (Spark: LONG) stay type-identical to
    the rest of the expression algebra and to the DuckDB oracles."""
    return _NUM_FNS[name](c).cast("double")


def _set_expr_col(node, binding: str) -> "F.Column":
    """Evaluate a SET expression RHS against the target node's own props
    map (``b.prop + 1``, property-from-property, size(), CASE). Leaves
    must reference the binding being SET — a cross-binding RHS would
    make the per-id update value ambiguous (one node, many match rows),
    so it is rejected at parse time."""
    kind = node[0]
    if kind == "num":
        return F.lit(node[1])
    if kind == "prop":
        return F.col("props").getItem(node[2]).cast("double")
    if kind == "neg":
        return -_set_expr_col(node[1], binding)
    if kind == "strlen":
        return F.length(F.col("props").getItem(node[2])).cast("double")
    if kind == "fn1":
        return _num_fn_col(node[1], _set_expr_col(node[2], binding))
    if kind == "case":
        return _case_col(
            node,
            lambda n: _set_expr_col(n, binding),
            lambda _b, p: F.col("props").getItem(p),
        )
    _, op, l, r = node
    lc, rc = _set_expr_col(l, binding), _set_expr_col(r, binding)
    return {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}[op]


def run_cypher_set(graph: PropertyGraph, query: str) -> PropertyGraph:
    """Mutation statement: ``MATCH pattern [WHERE ...] SET b.prop =
    value [, b2.prop2 = ...]`` — openCypher SET (extension; the
    reference declares no mutation at all, StatsStore.scala:172-177
    ``???``). Values are literals or arithmetic expressions over the
    SAME binding's properties (``SET b.cnt = b.cnt + 1``,
    property-from-property — VERDICT r6 #4); expression results are
    stored through the double→string rendering every other numeric
    prop uses. Returns the UPDATED graph (the input graph is untouched
    — immutable rewrite, like remove_*).

    Plan: the MATCH runs through the normal cost-based planner, each
    SET binding's matched id set projects out distinct, expression
    values resolve via ONE left join onto the node payload, and the
    props land via update_node_props' broadcast-merge join — so the
    match cost is one planned query and the write is
    Delta-MERGE-shaped."""
    sp = _stmt_verb_split(query, {"SET": ("SET",)})
    if sp is None or not sp[1] or not sp[2]:
        raise CypherParseError(
            f"SET statement must be MATCH ... SET b.prop = value: {query!r}"
        )
    _verb, _body, _sets = sp
    from ..cypher.parser import (
        _parse_arith,
        _split_patterns,
        _tokenize_expr,
        expr_prop_leaves,
    )

    # prop -> ("lit", str) | ("expr", tree), per binding
    sets: dict[str, dict[str, tuple]] = {}
    label_adds: list[tuple[str, str]] = []  # (binding, label) — SET n:L
    for item in _split_patterns(_sets):
        lm_ = _SET_LABEL_ITEM.match(item)
        if lm_:
            label_adds.append((lm_.group("b"), lm_.group("label")))
            continue
        sm = _SET_ITEM.match(item)
        if sm:
            raw = sm.group("val")
            val = raw[1:-1] if raw[0] in "'\"" else raw  # props map is string-valued
            sets.setdefault(sm.group("b"), {})[sm.group("p")] = ("lit", val)
            continue
        am = _SET_ITEM_ANY.match(item)
        if not am:
            raise CypherParseError(
                f"unsupported SET item (need b.prop = value): {item!r}"
            )
        b = am.group("b")
        toks = _tokenize_expr(am.group("rhs"))
        node, end = _parse_arith(toks)
        if end != len(toks):
            raise CypherParseError(f"trailing tokens in SET expression: {item!r}")
        for lb, _lp in expr_prop_leaves(node):
            if lb != b:
                raise CypherParseError(
                    f"SET expression may only reference the binding being "
                    f"set ({b!r}), got {lb!r}: {item!r}"
                )
        sets.setdefault(b, {})[am.group("p")] = ("expr", node)
    qg = QueryGraph()
    _parse_clauses(_body, qg)
    # edge-variable SET (round-7): `SET e.weight = <number>` overwrites
    # the matched edges' typed weight through update_edge_weights —
    # routed by the pattern edge the variable names
    edge_sets: dict[str, float] = {}
    edge_by_name = {e.name: e for e in qg.edges if e.name}
    for b in list(sets):
        if b in qg.labels:
            continue
        if b in edge_by_name:
            items_ = sets.pop(b)
            if set(items_) != {"weight"}:
                raise CypherParseError(
                    f"edge SET supports only {b}.weight (typed column); "
                    f"got: {sorted(items_)}"
                )
            kind, v = items_["weight"]
            if kind == "lit":
                try:
                    edge_sets[b] = ("lit", float(v))
                except ValueError:
                    raise CypherParseError(
                        f"edge weight must be numeric, got: {v!r}"
                    )
            else:
                # expression RHS (round-7): leaves must be THIS edge's
                # weight (`SET e.weight = e.weight * 2`)
                for lb, lp in expr_prop_leaves(v):
                    if lb != b or lp != "weight":
                        raise CypherParseError(
                            f"edge SET expression may only reference "
                            f"{b}.weight, got {lb}.{lp}"
                        )
                edge_sets[b] = ("expr", v)
            continue
        raise CypherParseError(f"SET references unbound binding: {b!r}")
    for b, _lbl in label_adds:
        if b not in qg.labels:
            raise CypherParseError(f"SET label references unbound binding: {b!r}")
        if b not in qg.returns:
            qg.returns.append(b)
    for b in sets:
        if b not in qg.returns:
            qg.returns.append(b)
    for en, (kind, _v) in edge_sets.items():
        e = edge_by_name[en]
        for nb in (e.src, e.dst):
            if nb not in qg.returns:
                qg.returns.append(nb)
        if kind == "expr":
            # the current weight rides the match as an edge-prop column
            qg.edge_prop_returns.append((en, "weight", f"_setw_{en}"))
    matched = plan_match(graph, qg).df
    out = graph

    def _edge_expr_col(node, alias: str):
        k = node[0]
        if k == "num":
            return F.lit(node[1])
        if k == "prop":
            return F.col(alias).cast("double")
        if k == "neg":
            return -_edge_expr_col(node[1], alias)
        if k == "fn1":
            return _num_fn_col(node[1], _edge_expr_col(node[2], alias))
        if k in ("strlen", "case"):
            raise CypherParseError(
                "size()/CASE are unsupported in edge SET expressions"
            )
        _, op, l, r = node
        lc, rc = _edge_expr_col(l, alias), _edge_expr_col(r, alias)
        return {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}[op]

    for en, (kind, v) in edge_sets.items():
        e = edge_by_name[en]
        if len(e.types) != 1:
            raise CypherParseError(
                f"edge SET needs exactly one edge type on {en!r}"
            )
        if kind == "lit":
            wcol = F.lit(v).cast("double")
            cols = [F.col(e.src).alias("src"), F.col(e.dst).alias("dst")]
        else:
            wcol = _edge_expr_col(v, f"_setw_{en}").cast("double")
            cols = [
                F.col(e.src).alias("src"), F.col(e.dst).alias("dst"),
                F.col(f"_setw_{en}"),
            ]
        upd = (
            matched.select(*cols)
            .withColumn("weight", wcol)
            .select("src", "dst", "weight")
            .dropDuplicates(["src", "dst"])
            .withColumn("type", F.lit(e.types[0]))
        )
        out = out.update_edge_weights(upd)
    for b, props in sets.items():
        upd = matched.select(F.col(b).alias("id")).dropDuplicates(["id"])
        if any(kind == "expr" for kind, _ in props.values()):
            # one left join onto the payload resolves every expression
            # leaf; multi-label nodes share one props map per id
            payload = graph.payload_nodes()
            upd = upd.join(payload, on="id", how="left")
        entries = []
        for k, (kind, v) in sorted(props.items()):
            entries.append(F.lit(k))
            if kind == "lit":
                entries.append(F.lit(v))
            else:
                entries.append(_set_expr_col(v, b).cast("string"))
        updates = upd.select("id", F.create_map(*entries).alias("props"))
        out = out.update_node_props(updates)
    # SET n:Label (round-8): matched ids gain the label's (id, label)
    # row (multi-label model; add_labels is an idempotent anti-join)
    for b, lbl in label_adds:
        out = out.add_labels(matched.select(F.col(b).alias("id")), lbl)
    return out


_REMOVE_ITEM = re.compile(
    r"^\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\.(?P<p>[A-Za-z_][A-Za-z0-9_]*)\s*$"
)


def run_cypher_delete(graph: PropertyGraph, query: str) -> PropertyGraph:
    """openCypher ``MATCH ... [DETACH] DELETE n[, e, ...]`` — the
    query-language surface of remove_vertices/remove_edges (extension;
    the reference declares removeNode/removeEdge but leaves them ``???``,
    StatsStore.scala:172-177). Targets are node bindings or edge
    variables from the MATCH. Per openCypher, a plain DELETE of a node
    that still has relationships (beyond those deleted by this same
    statement) raises; DETACH DELETE cascades incident edges. Returns
    the updated graph (immutable rewrite, like run_cypher_set).

    Plan shape: one planned MATCH; edge deletes are (src, dst, type)
    anti-joins, node deletes are the three-anti-join cascade of
    remove_vertices — all broadcastable semi-differences. The plain-
    DELETE constraint check is ONE limit(1) probe over the would-remain
    incident edges."""
    sp = _stmt_verb_split(
        query, {"DETACH DELETE": ("DETACH", "DELETE"), "DELETE": ("DELETE",)}
    )
    if (
        sp is None
        or not sp[1]
        or not re.fullmatch(
            r"[A-Za-z_][A-Za-z0-9_]*(?:\s*,\s*[A-Za-z_][A-Za-z0-9_]*)*", sp[2]
        )
    ):
        raise CypherParseError(
            f"DELETE statement must be MATCH ... [DETACH] DELETE targets: {query!r}"
        )
    _detach = sp[0] == "DETACH DELETE"
    qg = QueryGraph()
    _parse_clauses(sp[1], qg)
    edge_by_name = {e.name: e for e in qg.edges if e.name}
    targets = [t.strip() for t in sp[2].split(",")]
    node_targets, edge_targets = [], []
    for t in targets:
        if t in qg.labels:
            node_targets.append(t)
        elif t in edge_by_name:
            edge_targets.append(t)
        else:
            raise CypherParseError(f"DELETE references unbound binding: {t!r}")
    for t in node_targets:
        if t not in qg.returns:
            qg.returns.append(t)
    for en in edge_targets:
        e = edge_by_name[en]
        if len(e.types) != 1:
            raise CypherParseError(f"edge DELETE needs exactly one edge type on {en!r}")
        for nb in (e.src, e.dst):
            if nb not in qg.returns:
                qg.returns.append(nb)
    matched = plan_match(graph, qg).df
    out = graph
    deleted_edges = None
    for en in edge_targets:
        e = edge_by_name[en]
        rows = (
            matched.select(F.col(e.src).alias("src"), F.col(e.dst).alias("dst"))
            .dropDuplicates(["src", "dst"])
            .withColumn("type", F.lit(e.types[0]))
        )
        out = out.remove_edges(rows)
        deleted_edges = rows if deleted_edges is None else deleted_edges.unionByName(rows)
    if node_targets:
        ids = None
        for t in node_targets:
            part = matched.select(F.col(t).alias("id"))
            ids = part if ids is None else ids.unionByName(part)
        ids = ids.dropDuplicates(["id"])
        if not _detach:
            # openCypher: plain DELETE must not orphan relationships —
            # any incident edge that this statement does not itself
            # delete is an error (one limit(1) probe)
            remain = graph.edges
            if deleted_edges is not None:
                remain = remain.join(
                    F.broadcast(deleted_edges), on=["src", "dst", "type"], how="left_anti"
                )
            incident = remain.join(
                F.broadcast(ids.select(F.col("id").alias("src"))), on="src", how="left_semi"
            ).unionByName(
                remain.join(
                    F.broadcast(ids.select(F.col("id").alias("dst"))), on="dst", how="left_semi"
                )
            )
            if incident.limit(1).count():
                raise ValueError(
                    "cannot DELETE a node that still has relationships; "
                    "use DETACH DELETE"
                )
        out = out.remove_vertices(ids)
    return out


def run_cypher_remove(graph: PropertyGraph, query: str) -> PropertyGraph:
    """openCypher ``MATCH ... REMOVE n.prop[, ...]`` — drop property
    keys from matched nodes via remove_node_props (broadcast semi-join
    + map_filter; the nodes table never shuffles). A removed property
    reads back as NULL (the IS NULL / coalesce contract). Edge
    properties are typed columns here, so REMOVE on an edge variable is
    a typed error (SET e.weight to a new value instead)."""
    sp = _stmt_verb_split(query, {"REMOVE": ("REMOVE",)})
    if sp is None or not sp[1] or not sp[2]:
        raise CypherParseError(
            f"REMOVE statement must be MATCH ... REMOVE b.prop: {query!r}"
        )
    from ..cypher.parser import _split_patterns

    qg = QueryGraph()
    _parse_clauses(sp[1], qg)
    edge_names = {e.name for e in qg.edges if e.name}
    removes: dict[str, list[str]] = {}
    label_removes: list[tuple[str, str]] = []  # (binding, label)
    for item in _split_patterns(sp[2]):
        lm_ = _SET_LABEL_ITEM.match(item)
        if lm_:
            b = lm_.group("b")
            if b not in qg.labels:
                raise CypherParseError(
                    f"REMOVE label references unbound binding: {b!r}"
                )
            label_removes.append((b, lm_.group("label")))
            if b not in qg.returns:
                qg.returns.append(b)
            continue
        rm = _REMOVE_ITEM.match(item)
        if not rm:
            raise CypherParseError(f"unsupported REMOVE item (need b.prop): {item!r}")
        b = rm.group("b")
        if b in edge_names:
            raise CypherParseError(
                "REMOVE on an edge variable is unsupported (edge props are "
                "typed columns; SET e.weight instead)"
            )
        if b not in qg.labels:
            raise CypherParseError(f"REMOVE references unbound binding: {b!r}")
        removes.setdefault(b, []).append(rm.group("p"))
    for b in removes:
        if b not in qg.returns:
            qg.returns.append(b)
    matched = plan_match(graph, qg).df
    out = graph
    for b, keys in removes.items():
        out = out.remove_node_props(matched.select(F.col(b).alias("id")), keys)
    # REMOVE n:Label (round-8): drop the (id, label) rows; a node whose
    # last label goes leaves the store (incident edges removed with it)
    for b, lbl in label_removes:
        out = out.remove_labels(matched.select(F.col(b).alias("id")), lbl)
    return out


_MERGE_NODE_STMT = re.compile(
    r"(?is)^\s*MERGE\s+\(\s*(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*:\s*"
    r"(?P<label>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:\{(?P<props>[^}]*)\}\s*)?\)\s*(?P<tail>.*)$"
)
# tail-anchored (round-14): the MATCH body is carved off by
# _stmt_verb_split on the token stream; this matches what FOLLOWS the
# top-level MERGE keyword
_MERGE_EDGE_TAIL = re.compile(
    r"(?is)^\(\s*(?P<a>[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*"
    r"-\s*\[\s*(?P<en>[A-Za-z_][A-Za-z0-9_]*)?\s*:\s*"
    r"(?P<type>[A-Za-z_][A-Za-z0-9_]*)\s*\]\s*->\s*"
    r"\(\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*(?P<tail>.*)$"
)
_ON_CLAUSE = re.compile(r"(?is)\bON\s+(CREATE|MATCH)\s+SET\s+")
_PROP_ENTRY = re.compile(
    r"^\s*(?P<k>[A-Za-z_][A-Za-z0-9_]*)\s*:\s*"
    r"(?P<v>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*$"
)


def _parse_props_literal(s: str | None) -> dict[str, tuple]:
    """``{k: 'str', k2: 3}`` -> {k: ("str", v) | ("num", float)}. The
    props map is string-valued; numeric entries keep their literal text
    for storage and compare as doubles for matching (the same contract
    as WHERE literals, store.node_set)."""
    out: dict[str, tuple] = {}
    if s is None or not s.strip():
        return out
    from ..cypher.parser import _split_patterns

    for entry in _split_patterns(s):
        pm = _PROP_ENTRY.match(entry)
        if not pm:
            raise CypherParseError(f"unsupported MERGE property entry: {entry!r}")
        raw = pm.group("v")
        if raw[0] in "'\"":
            out[pm.group("k")] = ("str", raw[1:-1])
        else:
            out[pm.group("k")] = ("num", raw)
    return out


def _split_on_clauses(tail: str) -> tuple[list[str], list[str]]:
    """Split a MERGE tail into ON CREATE SET / ON MATCH SET item lists
    (each a list of raw ``b.prop = value`` strings)."""
    from ..cypher.parser import _split_patterns

    tail = tail.strip()
    if not tail:
        return [], []
    parts = _ON_CLAUSE.split(tail)
    if parts[0].strip():
        raise CypherParseError(
            f"unsupported trailing clause after MERGE pattern: {parts[0]!r}"
        )
    on_create: list[str] = []
    on_match: list[str] = []
    for kw, items in zip(parts[1::2], parts[2::2]):
        dst = on_create if kw.upper() == "CREATE" else on_match
        if dst:
            raise CypherParseError(f"duplicate ON {kw.upper()} SET clause")
        dst.extend(_split_patterns(items))
    return on_create, on_match


_CREATE_NODE_STMT = re.compile(r"(?is)^\s*CREATE\s+(?P<pats>\(.+\))\s*$")
_CREATE_NODE_PAT = re.compile(
    r"(?is)^\s*\(\s*(?P<name>[A-Za-z_][A-Za-z0-9_]*)?\s*:\s*"
    r"(?P<label>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:\{(?P<props>[^}]*)\}\s*)?\)\s*$"
)
# tail-anchored (round-14): matches what follows the top-level CREATE
# keyword once _stmt_verb_split carves off the MATCH body
_CREATE_EDGE_TAIL = re.compile(
    r"(?is)^\(\s*(?P<a>[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*"
    r"-\s*\[\s*:\s*(?P<type>[A-Za-z_][A-Za-z0-9_]*)\s*"
    r"(?:\{(?P<eprops>[^}]*)\}\s*)?\]\s*->\s*"
    r"\(\s*(?P<b>[A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$"
)


def run_cypher_create(graph: PropertyGraph, query: str) -> PropertyGraph:
    """openCypher CREATE (round-8; extension — the reference declares no
    mutation at all, StatsStore.scala:172-177 ``???``). Two forms:

    - ``CREATE (n:Label {props})[, (m:L2 {...}) ...]`` — unconditional
      node creation; ids assigned from next_id() in pattern order.
    - ``MATCH pattern [WHERE ...] CREATE (a)-[:T {weight: n}]->(b)`` —
      one T edge per DISTINCT matched (a, b) pair, with an optional
      literal weight. The engine's edge model carries existence
      semantics (pattern matching deduplicates), so unlike openCypher
      a re-run does NOT observably multiply matches — use MERGE for
      explicit match-or-create.

    Plan shape at scale: node form is a driver-literal append; edge
    form is one planned MATCH projected to the distinct endpoint pair
    plus an append — no shuffle beyond the match itself."""
    sp = _stmt_verb_split(query, {"CREATE": ("CREATE",)})
    em = _CREATE_EDGE_TAIL.match(sp[2]) if sp is not None and sp[1] else None
    if em:
        qg = parse(f"MATCH {sp[1]} RETURN {em.group('a')}, {em.group('b')}")
        matched = plan_match(graph, qg).df
        eprops = _parse_props_literal(em.group("eprops"))
        for k in eprops:
            if k != "weight":
                raise CypherParseError(
                    f"CREATE edge props support weight only, got: {k!r}"
                )
        pairs = matched.select(
            F.col(em.group("a")).alias("src"),
            F.col(em.group("b")).alias("dst"),
        ).dropDuplicates(["src", "dst"])
        rows = pairs.withColumn("type", F.lit(em.group("type")))
        if "weight" in eprops:
            rows = rows.withColumn(
                "weight", F.lit(float(eprops["weight"][1])).cast("double")
            )
        return graph.insert_edges(rows)
    nm = _CREATE_NODE_STMT.match(query)
    if not nm:
        raise CypherParseError(
            "CREATE statement must be `CREATE (n:Label {props})[, ...]` or "
            f"`MATCH ... CREATE (a)-[:T]->(b)`: {query!r}"
        )
    from ..cypher.parser import _split_patterns

    rows = []
    nid = graph.next_id()
    for pat in _split_patterns(nm.group("pats")):
        pm = _CREATE_NODE_PAT.match(pat)
        if not pm:
            raise CypherParseError(f"unsupported CREATE node pattern: {pat!r}")
        props = {
            k: v for k, (_kind, v) in _parse_props_literal(pm.group("props")).items()
        }
        rows.append((nid, pm.group("label"), props))
        nid += 1
    row_df = graph.spark.createDataFrame(
        rows, "id long, label string, props map<string,string>"
    )
    return graph.insert_vertices(row_df)


def run_cypher_merge(graph: PropertyGraph, query: str) -> PropertyGraph:
    """openCypher MERGE (match-or-create; extension — the reference
    declares no mutation at all, StatsStore.scala:172-177 ``???``),
    wiring the round-7 API verbs ``merge_vertices``/``merge_edges``
    into the Cypher front-end (VERDICT r7 #4). Two forms:

    - ``MERGE (n:Label {prop: lit, ...})`` — create the node iff no
      node with that label carries ALL the given property values;
      ``ON CREATE SET n.p = lit`` adds creation-only props,
      ``ON MATCH SET n.p = lit | expr`` updates pre-existing matches
      through the SET machinery (expression RHS over n's own props).
    - ``MATCH pattern [WHERE ...] MERGE (a)-[r:T]->(b)`` — for every
      distinct matched (a, b) pair ensure one T edge exists;
      ``ON CREATE SET r.weight = lit`` stamps created edges,
      ``ON MATCH SET r.weight = lit | expr-over-r.weight`` rewrites
      pre-existing ones via update_edge_weights.

    Both are idempotent: re-running the same MERGE (without ON MATCH
    mutations) is a no-op. Returns the updated graph (immutable
    rewrite, like run_cypher_set).

    Plan shape at scale: the edge form is one planned MATCH + a
    broadcastable anti-join append (merge_edges) + an optional
    broadcast upsert — Delta-MERGE-shaped, no driver materialization.
    The node form's existence probe is ONE limit(1) point-lookup
    action (the statement's semantics branch on existence; the
    created row itself is a literal)."""
    sp = _stmt_verb_split(query, {"MERGE": ("MERGE",)})
    if sp is not None and sp[1]:
        em = _MERGE_EDGE_TAIL.match(sp[2])
        if em:
            return _run_merge_edge(graph, sp[1], em)
    nm = _MERGE_NODE_STMT.match(query)
    if not nm:
        raise CypherParseError(
            "MERGE statement must be `MERGE (n:Label {props})` or "
            f"`MATCH ... MERGE (a)-[r:T]->(b)`: {query!r}"
        )
    name, label = nm.group("name"), nm.group("label")
    pattern_props = _parse_props_literal(nm.group("props"))
    on_create, on_match = _split_on_clauses(nm.group("tail"))

    def _parse_set_items(items: list[str], allow_expr: bool) -> dict[str, tuple]:
        from ..cypher.parser import _parse_arith, _tokenize_expr, expr_prop_leaves

        out: dict[str, tuple] = {}
        for item in items:
            sm = _SET_ITEM.match(item)
            if sm:
                if sm.group("b") != name:
                    raise CypherParseError(
                        f"MERGE SET item must target {name!r}: {item!r}"
                    )
                raw = sm.group("val")
                out[sm.group("p")] = ("lit", raw[1:-1] if raw[0] in "'\"" else raw)
                continue
            am = _SET_ITEM_ANY.match(item)
            if not (allow_expr and am and am.group("b") == name):
                raise CypherParseError(
                    f"unsupported MERGE SET item (need {name}.prop = "
                    f"{'value/expr' if allow_expr else 'literal'}): {item!r}"
                )
            toks = _tokenize_expr(am.group("rhs"))
            node, end = _parse_arith(toks)
            if end != len(toks):
                raise CypherParseError(f"trailing tokens in SET expression: {item!r}")
            for lb, _lp in expr_prop_leaves(node):
                if lb != name:
                    raise CypherParseError(
                        f"ON MATCH SET expression may only reference {name!r}, "
                        f"got {lb!r}: {item!r}"
                    )
            out[am.group("p")] = ("expr", node)
        return out

    create_sets = _parse_set_items(on_create, allow_expr=False)
    match_sets = _parse_set_items(on_match, allow_expr=True)

    # match: label scan + ALL pattern props equal (numerics as doubles —
    # the WHERE-literal contract)
    cand = graph.nodes.filter(F.col("label") == label)
    if pattern_props and "props" not in graph.nodes.columns:
        # no props column: nothing can match a props pattern — the
        # merge takes the create branch (insert_vertices adds the
        # column via unionByName)
        cand = cand.limit(0)
    else:
        for k, (kind, v) in pattern_props.items():
            c = F.col("props").getItem(k)
            cand = cand.filter(
                (c.cast("double") == float(v)) if kind == "num" else (c == v)
            )
    exists = bool(cand.select("id").limit(1).count())
    if not exists:
        nid = graph.next_id()
        props = {k: v for k, (_kind, v) in pattern_props.items()}
        props.update({k: v for k, (_kind, v) in create_sets.items()})
        row_df = graph.spark.createDataFrame(
            [(nid, label, props)], "id long, label string, props map<string,string>"
        )
        return graph.merge_vertices(row_df)
    if not match_sets:
        return graph
    # ON MATCH SET through the update_node_props broadcast upsert;
    # expression leaves resolve against the matched payload (same shape
    # as run_cypher_set's node path)
    upd = cand.select("id").dropDuplicates(["id"])
    if any(kind == "expr" for kind, _ in match_sets.values()):
        payload = graph.payload_nodes()
        upd = upd.join(payload, on="id", how="left")
    entries = []
    for k, (kind, v) in sorted(match_sets.items()):
        entries.append(F.lit(k))
        entries.append(
            F.lit(v) if kind == "lit" else _set_expr_col(v, name).cast("string")
        )
    return graph.update_node_props(upd.select("id", F.create_map(*entries).alias("props")))


def _run_merge_edge(
    graph: PropertyGraph, body: str, em: "re.Match"
) -> PropertyGraph:
    a, b, en, etype = em.group("a"), em.group("b"), em.group("en"), em.group("type")
    on_create, on_match = _split_on_clauses(em.group("tail"))

    def _parse_weight_items(items: list[str], allow_expr: bool):
        """MERGE edge SET items: ``r.weight = lit`` (and, on match, an
        arithmetic expression over r.weight). Returns None | ("lit", f)
        | ("expr", tree)."""
        if not items:
            return None
        from ..cypher.parser import _parse_arith, _tokenize_expr, expr_prop_leaves

        if len(items) > 1 or en is None:
            raise CypherParseError(
                "edge MERGE SET supports exactly one item on a named edge "
                f"variable ({en or '<unnamed>'}.weight)"
            )
        sm = _SET_ITEM.match(items[0])
        if sm:
            if (sm.group("b"), sm.group("p")) != (en, "weight"):
                raise CypherParseError(
                    f"edge MERGE SET must target {en}.weight: {items[0]!r}"
                )
            try:
                return ("lit", float(sm.group("val")))
            except ValueError:
                raise CypherParseError(f"edge weight must be numeric: {items[0]!r}")
        am = _SET_ITEM_ANY.match(items[0])
        if not (allow_expr and am and (am.group("b"), am.group("p")) == (en, "weight")):
            raise CypherParseError(
                f"unsupported edge MERGE SET item: {items[0]!r}"
            )
        toks = _tokenize_expr(am.group("rhs"))
        node, end = _parse_arith(toks)
        if end != len(toks):
            raise CypherParseError(f"trailing tokens in SET expression: {items[0]!r}")
        for lb, lp in expr_prop_leaves(node):
            if (lb, lp) != (en, "weight"):
                raise CypherParseError(
                    f"ON MATCH SET expression may only reference {en}.weight, "
                    f"got {lb}.{lp}"
                )
        return ("expr", node)

    create_w = _parse_weight_items(on_create, allow_expr=False)
    match_w = _parse_weight_items(on_match, allow_expr=True)

    qg = QueryGraph()
    _parse_clauses(body, qg)
    for nb in (a, b):
        if nb not in qg.labels:
            raise CypherParseError(f"MERGE endpoint {nb!r} is not bound by MATCH")
        if nb not in qg.returns:
            qg.returns.append(nb)
    matched = plan_match(graph, qg).df
    pairs = (
        matched.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .dropDuplicates(["src", "dst"])
        .withColumn("type", F.lit(etype))
    )
    rows = pairs
    if create_w is not None:
        rows = rows.withColumn("weight", F.lit(create_w[1]).cast("double"))
    out = graph.merge_edges(rows)
    if match_w is None:
        return out
    # ON MATCH applies to edges that existed BEFORE the merge: semi-join
    # the matched pairs against the pre-merge typed edge set
    pre = graph.edges.filter(F.col("type") == etype)
    existing = pairs.join(
        pre.select("src", "dst"), on=["src", "dst"], how="left_semi"
    )
    if match_w[0] == "lit":
        upd = existing.withColumn("weight", F.lit(match_w[1]).cast("double"))
    else:
        cur = "weight" if "weight" in pre.columns else None
        if cur is None:
            raise CypherParseError("graph edges carry no weight column")
        wsrc = pre.select("src", "dst", F.col("weight").alias("_curw")).dropDuplicates(
            ["src", "dst"]
        )

        def _eval(node):
            k = node[0]
            if k == "num":
                return F.lit(node[1])
            if k == "prop":
                return F.col("_curw").cast("double")
            if k == "neg":
                return -_eval(node[1])
            if k == "fn1":
                return _num_fn_col(node[1], _eval(node[2]))
            if k in ("strlen", "case"):
                raise CypherParseError(
                    "size()/CASE are unsupported in edge MERGE expressions"
                )
            _, op, l, r = node
            lc, rc = _eval(l), _eval(r)
            return {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}[op]

        upd = (
            existing.join(wsrc, on=["src", "dst"], how="left")
            .withColumn("weight", _eval(match_w[1]).cast("double"))
            .drop("_curw")
        )
    return out.update_edge_weights(upd.select("src", "dst", "type", "weight"))


def _case_col(node, eval_expr, raw_prop):
    """CASE evaluator shared by both expression contexts. String-literal
    comparisons require a bare prop condition (compared uncast); numeric
    comparisons evaluate the condition arithmetically as a double."""
    _, whens, else_e = node
    out = None
    for cond_l, cmp_op, lit, then_e in whens:
        if lit[0] == "str":
            if cond_l[0] != "prop":
                raise CypherParseError(
                    "CASE WHEN against a string literal needs a bare property"
                )
            c = _OPS[cmp_op](raw_prop(cond_l[1], cond_l[2]), F.lit(lit[1]))
        else:
            c = _OPS[cmp_op](eval_expr(cond_l), F.lit(lit[1]))
        t = eval_expr(then_e)
        out = F.when(c, t) if out is None else out.when(c, t)
    return out.otherwise(eval_expr(else_e)) if else_e is not None else out


def _run_unwind(graph: PropertyGraph, um: "re.Match", resolve: bool) -> DataFrame:
    """UNWIND [literals] AS x (chainable): a literal-list row generator
    cross-multiplied with the remaining query's (distinct) match rows —
    list duplicates are preserved, matching openCypher's row semantics
    for the generator itself. The unwound names must appear in RETURN to
    be emitted; WHERE conjuncts of the form `x <op> literal` over an
    unwound name filter the generator rows pre-join (see the lift
    below); other references to unwound names stay unsupported."""
    spark = graph.spark
    unwinds: list[tuple[str, DataFrame]] = []
    rest = None
    while um:
        name, items_txt, rest = um.group("name"), um.group("list"), um.group("rest")
        if um.group("rng") is not None:
            # distributed row generator — never a driver-side list, so
            # UNWIND range(0, 1e8) is fine here (ADVICE r6)
            start, stop, step = _range_bounds(um.group("rng"))
            unwinds.append(
                (name, spark.range(start, stop, step).select(F.col("id").alias(name)))
            )
        else:
            vals = _parse_literal_list(items_txt)
            dt = {str: "string", int: "long", float: "double"}[type(vals[0])]
            unwinds.append(
                (name, spark.createDataFrame([(v,) for v in vals], f"{name} {dt}"))
            )
        um = _UNWIND.match(rest)
    unames = {n for n, _ in unwinds}
    # WHERE conjuncts over unwound names (extension): `k <op> literal`
    # conjuncts lift out of the inner query and prune the GENERATOR
    # itself — a pre-join filter on the literal rows, the cheapest
    # possible placement. Only a single un-nested WHERE is rewritten
    # (an OPTIONAL MATCH's clause-scoped WHERE stays untouched).
    post: dict[str, list] = {}
    wm = re.match(
        r"(?is)^(?P<head>.*?)\bWHERE\s+(?P<w>.+?)(?P<tail>\s+RETURN\s+.+)$",
        rest.strip(),
    )
    if wm and not re.search(r"(?is)\b(?:OPTIONAL|MATCH)\b", wm.group("w")):
        kept_conjs = []
        for conj in _split_bool(wm.group("w"), "AND"):
            cm = _CARRY_COND.match(conj)
            if cm and cm.group("c") in unames:
                post.setdefault(cm.group("c"), []).append(cm)
            else:
                kept_conjs.append(conj)
        if post:
            mid = (" WHERE " + " AND ".join(kept_conjs)) if kept_conjs else " "
            rest = wm.group("head").rstrip() + mid + wm.group("tail")
    if post:
        filtered = []
        for name, vdf in unwinds:
            for cm in post.get(name, ()):
                raw = cm.group("val")
                if raw[0] in "'\"":
                    c, v = F.col(name), raw[1:-1]
                else:
                    c, v = F.col(name).cast("double"), float(raw)
                vdf = vdf.filter(_OPS[cm.group("op")](c, F.lit(v)))
            filtered.append((name, vdf))
        unwinds = filtered
    rm = re.match(r"(?is)^(?P<head>.*?)\bRETURN\s+(?P<items>.+)$", rest.strip())
    if not rm:
        raise CypherParseError(f"UNWIND query needs a RETURN clause: {rest!r}")
    # normalize items before matching against unwind names: `k AS kk`
    # and stray whitespace must alias the unwound column, not leak into
    # the inner match query (where `k` is unbound)
    kept: list[str] = []  # non-unwind items, passed to the inner query
    out_cols: list[str | None] = []  # RETURN-ordered output column names
    requested: dict[str, str] = {}  # unwind name -> output alias
    for item in (i.strip() for i in rm.group("items").split(",")):
        nm = _NAME_ITEM.match(item)
        if nm and nm.group("n") in unames:
            alias = nm.group("a") or nm.group("n")
            requested[nm.group("n")] = alias
            out_cols.append(alias)
            continue
        kept.append(item)
        am = re.search(r"(?is)\s+AS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$", item)
        out_cols.append(
            am.group(1) if am
            else (item if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", item) else None)
        )
    out = None
    if kept:
        inner = f"{rm.group('head')}RETURN {', '.join(kept)}"
        out = run_cypher(graph, inner, resolve=resolve)
    elif rm.group("head").strip():
        raise CypherParseError(
            "UNWIND with a MATCH body must RETURN at least one pattern binding"
        )
    kill = False  # a filtered-out NON-returned generator still empties rows
    for name, vdf in unwinds:
        alias = requested.get(name)
        if alias is None:
            if name in post and vdf.limit(1).count() == 0:
                kill = True
            continue
        vdf = vdf.withColumnRenamed(name, alias)
        out = vdf if out is None else out.crossJoin(F.broadcast(vdf))
    if out is None:
        raise CypherParseError("UNWIND query returned no columns")
    if kill:
        out = out.limit(0)
    # emit columns in RETURN-item order when every item's output name is
    # known and present (resolve=True adds payload columns — keep those)
    if all(c is not None for c in out_cols) and set(out_cols) <= set(out.columns):
        extras = [c for c in out.columns if c not in out_cols]
        out = out.select(*out_cols, *extras)
    return out


_OPS = {
    "=": lambda c, v: c == v,
    "<>": lambda c, v: c != v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
    # openCypher string predicates (extension)
    "starts_with": lambda c, v: c.startswith(v),
    "ends_with": lambda c, v: c.endswith(v),
    "contains": lambda c, v: c.contains(v),
    # IS [NOT] NULL (round-7)
    "is_null": lambda c, v: c.isNull(),
    "is_not_null": lambda c, v: c.isNotNull(),
    # =~ regex (round-8): the parser anchors the pattern (openCypher's
    # =~ is a FULL-string match; regexp alone is partial). regexp_like
    # accepts the lit() Column every call site passes (rlike is str-only)
    "regex": lambda c, v: F.regexp_like(c, v if isinstance(v, Column) else F.lit(v)),
    # negated string/regex predicates (round-16, WHERE NOT <atom>):
    # SQL-3VL `~` keeps NULL NULL, so NULL props drop the row either way
    "not_starts_with": lambda c, v: ~c.startswith(v),
    "not_ends_with": lambda c, v: ~c.endswith(v),
    "not_contains": lambda c, v: ~c.contains(v),
    "not_regex": lambda c, v: ~F.regexp_like(
        c, v if isinstance(v, Column) else F.lit(v)
    ),
}


# --------------------------------------------------------------------------
# WITH pipelines (extension beyond the reference surface, which has no WITH)
#
# `MATCH p0 WITH items0 [WHERE w0] MATCH p1 ... RETURN r` runs as staged
# plans: each stage is planned by plan_match with the previous stage's
# output as `carry` (inner-joined on shared bindings BEFORE the stage's
# aggregation — openCypher row piping). A WITH's WHERE filters the stage
# output (HAVING when the stage aggregated). Deviations, consistent with
# the engine's ANY_PAIR existence semantics: intermediate WITH stages are
# implicitly DISTINCT, and aggregates count distinct matches.
# --------------------------------------------------------------------------

_SEG = re.compile(
    r"(?is)^(?P<items>.+?)"
    r"(?:\s+WHERE\s+(?P<w>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<ob>.+?))?"
    r"(?:\s+SKIP\s+(?P<skipn>\d+))?"
    r"(?:\s+LIMIT\s+(?P<lim>\d+))?"
    r"\s+(?:MATCH\s+(?P<next>.+)|RETURN\s+(?P<ret>.+))$"
)
# a WITH stage with no MATCH/RETURN tail — consecutive WITHs
# (`WITH a, count(b) AS n WITH n, count(a) AS m ...`); the following
# stage runs carry-only (_run_carry_stage)
_SEG_BARE = re.compile(
    r"(?is)^(?P<items>.+?)"
    r"(?:\s+WHERE\s+(?P<w>.+?))?"
    r"(?:\s+ORDER\s+BY\s+(?P<ob>.+?))?"
    r"(?:\s+SKIP\s+(?P<skipn>\d+))?"
    r"(?:\s+LIMIT\s+(?P<lim>\d+))?$"
)
_TAIL = re.compile(
    r"(?is)^(?P<body>.+?)\s+RETURN\s+(?P<returns>.+?)"
    r"(?:\s+ORDER\s+BY\s+(?P<ob>.+?))?"
    r"(?:\s+SKIP\s+(?P<skip>\d+))?"
    r"(?:\s+LIMIT\s+(?P<lim>\d+))?\s*$"
)
_RET_TAIL = re.compile(
    r"(?is)^(?P<returns>.+?)"
    r"(?:\s+ORDER\s+BY\s+(?P<ob>.+?))?"
    r"(?:\s+SKIP\s+(?P<skip>\d+))?"
    r"(?:\s+LIMIT\s+(?P<lim>\d+))?\s*$"
)
_NAME_ITEM = re.compile(
    r"(?is)^(?P<n>[A-Za-z_][A-Za-z0-9_]*)"
    r"(?:\s+AS\s+(?P<a>[A-Za-z_][A-Za-z0-9_]*))?$"
)
_CARRY_COND = re.compile(
    r"^\s*(?P<c>[A-Za-z_][A-Za-z0-9_]*)\s*(?P<op><>|!=|<=|>=|=|<|>)\s*"
    r"(?P<val>'[^']*'|\"[^\"]*\"|-?\d+(?:\.\d+)?)\s*$"
)


_CARRY_EXPR_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<name>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[-+*/()]))"
)


def _carry_expr(text: str, cols: list[str]):
    """Arithmetic over carried columns for the final RETURN after a WITH
    pipeline (extension): `n_orders * 2`, `(a + b) / 2`, unary minus.
    Leaves are carried column names (evaluated as doubles, like every
    other expression context) and numeric literals; returns a Column."""
    toks: list[tuple[str, object]] = []
    pos = 0
    while pos < len(text):
        m = _CARRY_EXPR_TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise CypherParseError(
                f"bad token in RETURN expression at: {text[pos:]!r}"
            )
        if m.group("num") is not None:
            toks.append(("num", float(m.group("num"))))
        elif m.group("name") is not None:
            n = m.group("name")
            if n not in cols:
                raise CypherParseError(
                    f"final RETURN after WITH references unknown column: {n!r}"
                )
            toks.append(("col", n))
        else:
            toks.append(("op", m.group("op")))
        pos = m.end()

    def factor(i):
        if i >= len(toks):
            raise CypherParseError(f"RETURN expression ends unexpectedly: {text!r}")
        kind, val = toks[i]
        if kind == "num":
            return F.lit(val), i + 1
        if kind == "col":
            return F.col(val).cast("double"), i + 1
        if (kind, val) == ("op", "("):
            c, j = expr(i + 1)
            if j >= len(toks) or toks[j] != ("op", ")"):
                raise CypherParseError(f"unbalanced parentheses in: {text!r}")
            return c, j + 1
        if (kind, val) == ("op", "-"):
            c, j = factor(i + 1)
            return -c, j
        raise CypherParseError(f"unexpected token {val!r} in: {text!r}")

    def term(i):
        c, i = factor(i)
        while i < len(toks) and toks[i][0] == "op" and toks[i][1] in "*/":
            op = toks[i][1]
            rhs, i = factor(i + 1)
            c = (c * rhs) if op == "*" else (c / rhs)
        return c, i

    def expr(i):
        c, i = term(i)
        while i < len(toks) and toks[i][0] == "op" and toks[i][1] in "+-":
            op = toks[i][1]
            rhs, i = term(i + 1)
            c = (c + rhs) if op == "+" else (c - rhs)
        return c, i

    col, end = expr(0)
    if end != len(toks):
        raise CypherParseError(f"trailing tokens in RETURN expression: {text!r}")
    return col


def _carry_filter(df: DataFrame, where_text: str) -> DataFrame:
    """WITH ... WHERE over the carried columns: `col <op> literal`
    conjunctions (HAVING when the stage aggregated), or arithmetic
    comparisons over carried columns (`n * 2 >= m + 1`) via
    _carry_expr."""
    for conj in _split_bool(where_text, "AND"):
        m = _CARRY_COND.match(conj)
        if not m:
            cm = re.search(r"<=|>=|<>|!=|=|<|>", conj)
            if not cm:
                raise CypherParseError(
                    f"unsupported WITH WHERE condition: {conj!r}"
                )
            lhs = _carry_expr(conj[: cm.start()], df.columns)
            rhs = _carry_expr(conj[cm.end():], df.columns)
            df = df.filter(_OPS[cm.group(0)](lhs, rhs))
            continue
        col = m.group("c")
        if col not in df.columns:
            raise CypherParseError(f"WITH WHERE references unknown column: {col!r}")
        raw = m.group("val")
        if raw[0] in "'\"":
            c, v = F.col(col), raw[1:-1]
        else:
            c, v = F.col(col).cast("double"), float(raw)
        df = df.filter(_OPS[m.group("op")](c, F.lit(v)))
    return df


_CARRY_AGG = re.compile(
    r"(?is)^\s*(?P<fn>count|sum|avg|min|max|collect)\s*\(\s*"
    r"(?P<dist>DISTINCT\s+)?"
    r"(?:(?P<star>\*)|(?P<col>[A-Za-z_][A-Za-z0-9_]*))\s*\)"
    r"\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s*$"
)


def _run_carry_stage(carried: DataFrame | None, items_text: str) -> DataFrame:
    """A WITH/RETURN stage with NO new MATCH: pure projection or
    aggregation over the carried columns (extension). This enables the
    aggregate-of-aggregate idiom — e.g. the TPC-H Q13 count-of-counts,
    `WITH c, count(o) AS n WITH n, count(c) AS cnt` — which openCypher
    users reach for as soon as they group twice. Aggregates run over the
    carried rows (already distinct under the engine's existence
    semantics): count -> long, sum/avg -> double, min/max keep the
    carried column's type. Items may also be aliased arithmetic
    expressions over carried columns (they join the grouping keys)."""
    if carried is None:
        raise CypherParseError(
            "a carry-only WITH stage needs a previous WITH stage"
        )
    from ..cypher.parser import _split_patterns

    items_text = re.sub(r"(?is)^\s*DISTINCT\s+", "", items_text)
    if items_text.strip() == "*":
        return carried.dropDuplicates()
    items = _split_patterns(items_text)
    if not items:
        raise CypherParseError("empty WITH/RETURN item list")
    keys, key_names, aggs, agg_srcs = [], [], [], []
    for it in items:
        nm = _NAME_ITEM.match(it)
        if nm and nm.group("n") in carried.columns:
            a = nm.group("a") or nm.group("n")
            keys.append(F.col(nm.group("n")).alias(a))
            key_names.append(a)
            continue
        idm = re.fullmatch(
            r"(?i)id\s*\(\s*(?P<n>[A-Za-z_][A-Za-z0-9_]*)\s*\)"
            r"(?:\s+AS\s+(?P<a>[A-Za-z_][A-Za-z0-9_]*))?",
            it.strip(),
        )
        if idm and idm.group("n") in carried.columns:
            # id(x) over a carried binding column is the column itself
            # (binding columns ARE node ids) — round-8
            a = idm.group("a") or f"id_{idm.group('n')}"
            keys.append(F.col(idm.group("n")).alias(a))
            key_names.append(a)
            continue
        am = _CARRY_AGG.match(it)
        if am:
            fn, col, alias = am.group("fn").lower(), am.group("col"), am.group("alias")
            if col is not None and col not in carried.columns:
                raise CypherParseError(
                    f"aggregate references unknown carried column: {col!r}"
                )
            if fn == "count":
                if col is None:
                    src = F.count(F.lit(1))
                elif am.group("dist"):
                    # distinct VALUES of the column (carried rows are
                    # already distinct as tuples, not per column)
                    src = F.count_distinct(F.col(col))
                else:
                    src = F.count(F.col(col))
                aggs.append(src.cast("long").alias(alias))
            elif fn == "collect":
                if col is None:
                    raise CypherParseError("collect(*) is not a thing; name a column")
                # sorted distinct values — same deterministic reading as
                # the plan_match collect() aggregate
                aggs.append(F.sort_array(F.collect_set(F.col(col))).alias(alias))
            elif fn == "sum" and am.group("dist"):
                # sum over the distinct VALUES (VERDICT r6 #8); empty ->
                # 0 per openCypher (the OPTIONAL-stage unmatched case)
                aggs.append(
                    F.coalesce(
                        F.sum_distinct(F.col(col).cast("double")), F.lit(0.0)
                    ).alias(alias)
                )
            elif fn == "avg" and am.group("dist"):
                aggs.append(
                    F.expr(f"avg(DISTINCT CAST(`{col}` AS DOUBLE))").alias(alias)
                )
            elif fn == "sum":
                aggs.append(
                    F.coalesce(
                        F.sum(F.col(col).cast("double")), F.lit(0.0)
                    ).alias(alias)
                )
            elif fn == "avg":
                aggs.append(F.avg(F.col(col).cast("double")).alias(alias))
            else:
                # min/max: DISTINCT is a semantic no-op
                aggs.append(getattr(F, fn)(F.col(col)).alias(alias))
            if col is not None:
                agg_srcs.append(col)
            continue
        em = re.fullmatch(
            r"(?is)(?P<body>.+?)\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s*", it
        )
        if em:
            keys.append(
                _carry_expr(em.group("body"), carried.columns)
                .alias(em.group("alias"))
            )
            key_names.append(em.group("alias"))
            continue
        raise CypherParseError(
            f"carry-only WITH stage item must be a carried column, an "
            f"aggregate over one, or an aliased expression, got: {it!r}"
        )
    if not aggs:
        return carried.select(*keys).dropDuplicates()
    srcs = [c for c in dict.fromkeys(agg_srcs) if c not in key_names]
    pre = carried.select(*keys, *[F.col(c) for c in srcs])
    return pre.groupBy(*key_names).agg(*aggs) if key_names else pre.agg(*aggs)


def _new_out_col(qg: QueryGraph, marks: tuple[int, ...]) -> str:
    """Alias of the single item _parse_returns just appended."""
    lists = (
        [a.alias for a in qg.aggregates],
        [a for _, _, a in qg.prop_returns],
        [a for _, _, a in qg.edge_prop_returns],
        [a for _, a in qg.path_lengths],
        [it.alias for it in qg.expr_returns],
        [a for _, _, _, a in qg.string_fn_returns],
        [a for _, _, _, a in qg.coalesce_returns],
        [a for _, a in qg.id_returns],
        [a for _, a in qg.labels_returns],
        [a for _, a in qg.concat_returns],
        [a for _, a, _w in qg.keys_returns],
        list(qg.returns),
    )
    for prev_len, cur in zip(marks, lists):
        if len(cur) > prev_len:
            return cur[-1]
    raise CypherParseError("WITH item produced no output column")


def _run_stage(
    graph: PropertyGraph,
    match_body: str,
    items_text: str,
    carried: DataFrame | None,
    dedup: bool,
    optional: bool = False,
) -> tuple[DataFrame, QueryGraph, list[str]]:
    """Plan one pipeline stage: MATCH `match_body` carrying `carried`,
    projecting the WITH/RETURN `items_text`. Returns (df, qg, out cols).

    ``optional`` (VERDICT r6 #5): the stage is an OPTIONAL MATCH — its
    pattern is demoted to the first optional group and the carried rows
    become the required match set, so unmatched carried rows survive
    with NULLs for the stage's new bindings (and count(b) = 0)."""
    from ..cypher.parser import _split_patterns  # top-level comma split

    qg = QueryGraph()
    _parse_clauses(match_body, qg)
    if optional:
        if carried is None:
            raise CypherParseError(
                "OPTIONAL MATCH stage needs carried rows (a preceding WITH)"
            )
        if qg.cross_filters or qg.pattern_filters or getattr(qg, "expr_filters", ()):
            raise CypherParseError(
                "cross-binding / pattern / expression WHERE predicates are "
                "unsupported in an OPTIONAL MATCH stage (they would drop "
                "unmatched rows)"
            )
        if not qg.edges:
            raise CypherParseError(
                "OPTIONAL MATCH stage needs at least one pattern edge"
            )
        import dataclasses as _dc

        # demote the parsed required clause to the FIRST optional group;
        # clause-scoped WHERE predicates shift with their clause
        # (clause 0 -> 1, pre-existing optional clauses 1.. -> 2..)
        qg.optionals.insert(0, list(qg.edges))
        qg.edges = []
        qg.filters = [_dc.replace(pf, clause=pf.clause + 1) for pf in qg.filters]
        qg.edge_filters = [
            _dc.replace(pf, clause=pf.clause + 1) for pf in qg.edge_filters
        ]
        qg.or_filters = [
            tuple(_dc.replace(pf, clause=pf.clause + 1) for pf in grp)
            for grp in qg.or_filters
        ]
        qg.carry_required = True
    items_text = re.sub(r"(?is)^\s*DISTINCT\s+", "", items_text)
    if items_text.strip() == "*":
        # WITH * — every named binding of this match plus every carried
        # column rides through (openCypher's all-variables projection)
        names = sorted(
            b for b in qg.labels
            if not b.startswith("_anon")
            and (not qg.match_bindings or b in qg.match_bindings)
        )
        extra = [
            c for c in (carried.columns if carried is not None else [])
            if c not in names
        ]
        items_text = ", ".join(names + extra)
    items = _split_patterns(items_text)
    if not items:
        raise CypherParseError("empty WITH/RETURN item list")
    sel: list[tuple[str, str]] = []  # (source col, output alias)
    carry_srcs: list[str] = []
    for it in items:
        nm = _NAME_ITEM.match(it)
        if nm:
            n, a = nm.group("n"), nm.group("a")
            if n in qg.paths or n in qg.opt_paths:
                raise CypherParseError(f"cannot carry path {n!r}; use length({n})")
            if n in qg.labels:
                qg.returns.append(n)
                sel.append((n, a or n))
                continue
            if carried is not None and n in carried.columns:
                carry_srcs.append(n)
                sel.append((n, a or n))
                continue
            raise CypherParseError(f"WITH/RETURN references unknown name: {n!r}")
        marks = (
            len(qg.aggregates), len(qg.prop_returns),
            len(qg.edge_prop_returns), len(qg.path_lengths),
            len(qg.expr_returns), len(qg.string_fn_returns),
            len(qg.coalesce_returns), len(qg.id_returns),
            len(qg.labels_returns), len(qg.concat_returns),
            len(qg.keys_returns), len(qg.returns),
        )
        _parse_returns(qg, it)
        out = _new_out_col(qg, marks)
        sel.append((out, out))
    dummy_added = False
    if not (
        qg.returns or qg.prop_returns or qg.edge_prop_returns
        or qg.aggregates or qg.path_lengths or qg.expr_returns
        or qg.string_fn_returns or qg.coalesce_returns
        or qg.id_returns or qg.labels_returns or qg.concat_returns
        or qg.keys_returns
    ):
        # carried-only projection over a new pattern = existence check;
        # plan needs at least one emitted binding, then it is dropped
        # (the post-select dedup below restores distinctness)
        keys = [c for c in (carried.columns if carried is not None else [])
                if c in qg.labels]
        dummy = keys[0] if keys else next(iter(qg.labels))
        qg.returns.append(dummy)
        dummy_added = True
    carry_df = None
    if carried is not None:
        keys = [c for c in carried.columns if c in qg.labels]
        proj = list(dict.fromkeys(keys + carry_srcs))
        if proj:
            carry_df = carried.select(*proj)
            if len(proj) < len(carried.columns):
                carry_df = carry_df.dropDuplicates()
        else:
            # no shared binding and nothing carried forward: the carry
            # acts as a pure existence guard — empty carried rows must
            # still empty the result (openCypher row piping), so cross
            # join a single constant-probe row
            carry_df = carried.limit(1).select(F.lit(1).alias("_g4s_probe"))
    df = plan_match(graph, qg, carry=carry_df).df
    df = df.select(*[F.col(src).alias(dst) for src, dst in sel])
    if dedup or dummy_added:
        df = df.dropDuplicates()
    return df, qg, [dst for _, dst in sel]


def _order_limit(
    df: DataFrame, cols: list[str], ob: str | None, lim: str | None,
    skip: str | None = None,
) -> DataFrame:
    if ob:
        exprs = []
        for part in ob.split(","):
            om = re.fullmatch(
                r"(?i)\s*(?P<col>[A-Za-z_][A-Za-z0-9_]*)(?:\s+(?P<dir>ASC|DESC))?\s*", part
            )
            if om and om.group("col") in cols:
                c = F.col(om.group("col"))
                exprs.append(
                    c.desc() if (om.group("dir") or "").upper() == "DESC" else c.asc()
                )
                continue
            # arithmetic ORDER BY over the stage's columns (round-6):
            # `ORDER BY n * 2 DESC` via the carry-expression evaluator
            em = re.fullmatch(r"(?is)\s*(?P<body>.+?)(?:\s+(?P<dir>ASC|DESC))?\s*", part)
            try:
                c = _carry_expr(em.group("body"), cols)
            except CypherParseError:
                raise CypherParseError(f"unsupported ORDER BY item: {part!r}")
            exprs.append(
                c.desc() if (em.group("dir") or "").upper() == "DESC" else c.asc()
            )
        df = df.orderBy(*exprs)
    if skip:
        df = df.offset(int(skip))
    if lim:
        df = df.limit(int(lim))
    return df


def _run_with_pipeline(
    graph: PropertyGraph, parts: list[str]
) -> tuple[DataFrame, set[str]]:
    m0 = re.match(r"(?is)^\s*MATCH\s+(?P<body>.+)$", parts[0].strip())
    if not m0:
        raise CypherParseError("WITH pipeline must start with MATCH")
    pending_match: str | None = m0.group("body")
    pending_optional = False
    carried: DataFrame | None = None
    for seg in parts[1:]:
        sm = _SEG.match(seg.strip())
        bare = False
        if not sm:
            sm = _SEG_BARE.match(seg.strip())
            bare = sm is not None
            if not sm:
                raise CypherParseError(f"unsupported WITH stage: {seg!r}")
        items, w = sm.group("items"), sm.group("w")
        # `WITH ... OPTIONAL MATCH ...` (VERDICT r6 #5): _SEG stops at the
        # MATCH keyword, leaving the OPTIONAL marker as the tail of the
        # items (or the WHERE) text — strip it and flag the NEXT match
        # (which consumes this stage's carry) as an optional stage
        next_optional = False
        if items is not None and re.search(r"(?is)\bOPTIONAL\s*$", items):
            items = re.sub(r"(?is)\s*\bOPTIONAL\s*$", "", items)
            next_optional = True
        if w is not None and re.search(r"(?is)\bOPTIONAL\s*$", w):
            w = re.sub(r"(?is)\s*\bOPTIONAL\s*$", "", w)
            next_optional = True
        if sm.groupdict().get("ob") and re.search(
            r"(?is)\bOPTIONAL\s*$", sm.group("ob")
        ):
            raise CypherParseError(
                "OPTIONAL MATCH directly after ORDER BY is unsupported; "
                "add an intermediate WITH"
            )
        if next_optional and not items.strip():
            raise CypherParseError(
                "a WITH stage must project at least one item before "
                "OPTIONAL MATCH"
            )
        # `WITH ... [WHERE ...] UNWIND xs AS x [UNWIND ...]` — trailing
        # UNWINDs land at the end of the items (or WHERE) text because
        # UNWIND is not a _SEG stop word; strip them off and explode
        # after the stage head runs. This is the collected-list idiom
        # (`WITH collect(n) AS ns UNWIND ns AS x`) plus literal lists.
        unwind_chain: list[tuple[str | None, list | None, str]] = []

        def _strip_unwinds(text: str) -> str:
            while True:
                um = _UNWIND_TAIL.search(text)
                if not um:
                    return text
                lits = None
                if um.group("lits") is not None:
                    lits = _parse_literal_list(um.group("lits"))
                elif um.group("rng") is not None:
                    lits = _parse_range(um.group("rng"))
                unwind_chain.insert(
                    0, (um.group("src"), lits, um.group("alias"))
                )
                text = text[: um.start()]

        if w:
            w = _strip_unwinds(w)
        else:
            items = _strip_unwinds(items)

        def run_head(carried_df):
            # WITH head = items [WHERE] [ORDER BY] [LIMIT] — the
            # ORDER BY/LIMIT pair makes the stage a top-N selector.
            # pending_match None = the previous segment already consumed
            # its MATCH (consecutive WITHs): run carry-only.
            if pending_match is None:
                out = _run_carry_stage(carried_df, items)
            else:
                out, _, _ = _run_stage(
                    graph, pending_match, items, carried_df, dedup=True,
                    optional=pending_optional,
                )
            if w:
                out = _carry_filter(out, w)
            out = _order_limit(
                out, out.columns, sm.group("ob"), sm.group("lim"), sm.group("skipn")
            )
            for src, lits, alias in unwind_chain:
                if src is not None:
                    if src not in out.columns:
                        raise CypherParseError(
                            f"UNWIND references unknown carried column: {src!r}"
                        )
                    out = out.withColumn(alias, F.explode(F.col(src)))
                else:
                    out = out.withColumn(
                        alias, F.explode(F.array(*[F.lit(v) for v in lits]))
                    )
            return out

        if bare:
            carried = run_head(carried)
            pending_match = None
            pending_optional = False
            continue
        if sm.group("ret") is not None:
            # items WHERE w RETURN r — the WITH projects, then RETURN
            # selects names, arithmetic expressions (with mandatory AS
            # alias), or aggregates over the carried columns
            carried = run_head(carried)
            rm = _RET_TAIL.match(sm.group("ret"))
            ret_items = re.sub(r"(?is)^\s*DISTINCT\s+", "", rm.group("returns"))
            if ret_items.strip() == "*":
                # RETURN * after WITH = every carried column, as-is
                return _order_limit(
                    carried, carried.columns,
                    rm.group("ob"), rm.group("lim"), rm.group("skip"),
                ), set()
            if any(_CARRY_AGG.match(i) for i in ret_items.split(",")):
                df = _run_carry_stage(carried, ret_items)
                return _order_limit(
                    df, df.columns, rm.group("ob"), rm.group("lim"), rm.group("skip")
                ), set()
            sel_cols, cols = [], []
            for it in ret_items.split(","):
                it = it.strip()
                nm = _NAME_ITEM.match(it)
                if nm and nm.group("n") in carried.columns:
                    a = nm.group("a") or nm.group("n")
                    sel_cols.append(F.col(nm.group("n")).alias(a))
                    cols.append(a)
                    continue
                idm = re.fullmatch(
                    r"(?i)id\s*\(\s*(?P<n>[A-Za-z_][A-Za-z0-9_]*)\s*\)"
                    r"(?:\s+AS\s+(?P<a>[A-Za-z_][A-Za-z0-9_]*))?",
                    it,
                )
                if idm and idm.group("n") in carried.columns:
                    # id(x) over a carried binding = the column (round-8)
                    a = idm.group("a") or f"id_{idm.group('n')}"
                    sel_cols.append(F.col(idm.group("n")).alias(a))
                    cols.append(a)
                    continue
                am = re.fullmatch(
                    r"(?is)(?P<body>.+?)\s+AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s*",
                    it,
                )
                if not am:
                    raise CypherParseError(
                        f"final RETURN after WITH needs a carried column or an "
                        f"aliased expression over carried columns, got: {it!r}"
                    )
                sel_cols.append(
                    _carry_expr(am.group("body"), carried.columns)
                    .alias(am.group("alias"))
                )
                cols.append(am.group("alias"))
            df = carried.select(*sel_cols)
            return _order_limit(
                df, cols, rm.group("ob"), rm.group("lim"), rm.group("skip")
            ), set()
        nxt = sm.group("next")
        tm = _TAIL.match(nxt)
        if tm:
            # final stage: items pipe into MATCH body RETURN returns
            carried = run_head(carried)
            df, qg, cols = _run_stage(
                graph, tm.group("body"), tm.group("returns"), carried,
                dedup=False, optional=next_optional,
            )
            bindings = {c for c in cols if c in qg.labels}
            return _order_limit(
                df, cols, tm.group("ob"), tm.group("lim"), tm.group("skip")
            ), bindings
        carried = run_head(carried)
        pending_match = nxt
        pending_optional = next_optional
    raise CypherParseError("WITH pipeline has no RETURN")


def _edge_implies_label(qg: QueryGraph, stats, e, binding: str) -> bool:
    """True when every scanned edge of ``e``'s types provably ends at
    a ``label``-bearing node on ``binding``'s side(s) — the triplet
    counters give the exact test: for each type T,
    triplet(label, T, ·) == type_card(T) (resp. the dst orientation).
    Stats always describe the graph being planned (label-changing
    mutations rebuild them; only cardinality-neutral rewrites carry
    them over — store.py), so a True here means the label semi-join
    cannot drop a row. Restricted to plain 1-hop directed edges:
    undirected scans would need both orientations and var-length
    closures have interior hops. Requires stats.single_label: with
    multi-label nodes the triplet join counts an edge once per label
    *pair*, so the side-sum over triplet_counts is inflated by the
    other endpoint's extra labels and can equal type_card without
    full coverage (stats.py documents the cancellation case)."""
    if e.undirected or (e.min_hops, e.max_hops) != (1, 1):
        return False
    if stats.single_label is not True:
        return False
    label = qg.labels.get(binding)
    if label is None:
        return False
    tcs = stats.triplet_counts
    types = list(e.types) if e.types else list(stats.type_counts)
    if not tcs or not types:
        return False
    sides = [s for s, bb in ((0, e.src), (2, e.dst)) if bb == binding]
    for t in types:
        total = stats.type_counts.get(t, 0)
        if total == 0:
            return False
        for side in sides:
            have = sum(
                c for (sl, tt, dl), c in tcs.items()
                if tt == t and (sl if side == 0 else dl) == label
            )
            if have != total:
                return False
    return True


def _qg_referenced_strings(qg: QueryGraph) -> set[str]:
    """Every string reachable from the QueryGraph OUTSIDE the structural
    fields (labels / extra_labels / edges / match_bindings) — the
    conservative over-approximation of 'binding b is consumed somewhere'
    the tautological-edge eliminator tests against. Collecting aliases,
    property names, operators and literals too only ever ADDS names,
    which can only suppress an elimination, never unsoundly allow one."""
    out: set[str] = set()
    skip = {"labels", "extra_labels", "edges", "match_bindings"}

    def walk(v):
        if isinstance(v, str):
            out.add(v)
        elif isinstance(v, dict):
            for k, vv in v.items():
                walk(k)
                walk(vv)
        elif isinstance(v, (list, tuple, set, frozenset)):
            for vv in v:
                walk(vv)
        elif is_dataclass(v) and not isinstance(v, type):
            for f in dc_fields(v):
                walk(getattr(v, f.name))

    for f in dc_fields(qg):
        if f.name not in skip:
            walk(getattr(qg, f.name))
    # other edges' variable names are consumers too (edge_filters /
    # edge_prop_returns address edges by name); collect them so a binding
    # named like an edge variable is conservatively kept
    for e in qg.edges:
        if e.name is not None:
            out.add(e.name)
    return out


def _eliminate_tautological_edges(qg: QueryGraph, stats, steps: list) -> QueryGraph:
    """Stats-driven foreign-key hop elimination (round-16, guide §3):
    drop a pattern edge whose dead-side binding ``y`` is referenced
    nowhere else when the exact counters prove the hop cannot change the
    result set: (a) coverage — every scanned edge of the type ends at an
    ``L_x``-labelled node on the live side AND at an ``L_y``-labelled
    node on the dead side (triplet counts, same identity the semi_skip
    uses), and (b) participation — the type's distinct endpoint count on
    the live side equals ``|L_x|``, i.e. every candidate ``x`` has at
    least one such edge. Under the engine's distinct-match semantics
    (project + dropDuplicates to the needed bindings) the join is then
    an identity and the whole hop — scan, expand join, label semi-joins
    — vanishes. Eliminations cascade (a 2-hop chain returning only its
    far endpoint collapses to one label scan).

    Soundness gates: exact single type, plain 1-hop directed edge, no
    edge variable, no self-loop; ``y`` unreferenced anywhere (generic
    conservative scan incl. optionals / pattern filters / verbs — verb
    layers put their bindings in ``returns``), in no other edge, no
    extra labels; skip entirely under paths (edge indices), carried
    stages, count(*) (it counts distinct FULL-pattern matches), unknown
    endpoint stats, or multi-label graphs (the triplet identity is only
    valid under single_label — stats.py). The participation count is a
    raw countDistinct over the edge table (danglers included) but a
    dangling edge of the type also breaks coverage (it contributes no
    triplet row), so the pair of tests is sound together."""
    if (
        stats.single_label is not True
        or not getattr(stats, "endpoint_counts", None)
        or qg.paths
        or qg.opt_paths
        or qg.carry_required
        or any(a.binding == "*" for a in qg.aggregates)
    ):
        return qg
    referenced = _qg_referenced_strings(qg)
    qg = dc_replace(
        qg,
        labels=dict(qg.labels),
        edges=list(qg.edges),
        match_bindings=set(qg.match_bindings),
    )
    changed = True
    while changed:
        changed = False
        use: dict[str, int] = {}
        for e in qg.edges:
            for b in (e.src, e.dst):
                use[b] = use.get(b, 0) + 1
        for e in qg.edges:
            if (
                len(e.types) != 1
                or e.undirected
                or (e.min_hops, e.max_hops) != (1, 1)
                or e.name is not None
                or e.src == e.dst
            ):
                continue
            t = e.types[0]
            for y, x, side_x in ((e.dst, e.src, 0), (e.src, e.dst, 2)):
                if y in referenced or use.get(y, 0) != 1:
                    continue
                if qg.extra_labels.get(y):
                    continue
                ylab = qg.labels.get(y)
                if ylab is not None and not _edge_implies_label(qg, stats, e, y):
                    continue
                if qg.labels.get(x) is None or not _edge_implies_label(qg, stats, e, x):
                    continue
                if stats.endpoint_counts.get((t, side_x)) != stats.label_card(
                    qg.labels[x]
                ):
                    continue
                qg.edges.remove(e)
                qg.labels.pop(y, None)
                qg.match_bindings.discard(y)
                steps.append(("edge_elim", (e.src, e.dst), t, y))
                changed = True
                break
            if changed:
                break
    return qg


def plan_match(
    graph: PropertyGraph, qg: QueryGraph, carry: DataFrame | None = None
) -> PlannedQuery:
    """Plan one MATCH...RETURN stage. ``carry`` (WITH-pipeline extension)
    is the previous stage's output: its columns that name bindings of
    this stage become inner-join keys (openCypher row piping — carried
    rows restrict the new match), the rest ride along into the output
    and, when this stage aggregates, into the grouping keys."""
    stats = graph.stats
    steps: list[tuple] = []
    total_cost = 0.0

    # stats-driven FK hop elimination (round-16): rewrite the pattern
    # before any planning so join-order, label skips and projections are
    # all re-derived on the reduced graph. Carried stages are skipped —
    # the carry frame's columns can reference bindings the generic scan
    # cannot see.
    if carry is None:
        qg = _eliminate_tautological_edges(qg, stats, steps)

    # WHERE predicates are clause-scoped (openCypher): the required
    # MATCH's filters constrain the main chain; an OPTIONAL MATCH's
    # filters only restrict that optional group (unmatched rows keep
    # NULLs — they are never dropped from the required match set).
    filters_by_clause: dict[int, dict[str, list]] = {}
    for pf in qg.filters:
        filters_by_clause.setdefault(pf.clause, {}).setdefault(pf.binding, []).append(pf)
    edge_filters_by_clause: dict[int, dict[str, list]] = {}
    for pf in qg.edge_filters:
        edge_filters_by_clause.setdefault(pf.clause, {}).setdefault(pf.binding, []).append(pf)
    # same-binding OR groups, scan-pushed like conjunctive filters
    or_by_clause: dict[int, dict[str, list[tuple]]] = {}
    for grp in qg.or_filters:
        or_by_clause.setdefault(grp[0].clause, {}).setdefault(grp[0].binding, []).append(grp)
    clause_state = {"clause": 0}

    def filters_by_binding() -> dict[str, list]:
        return filters_by_clause.get(clause_state["clause"], {})

    def or_filters_by_binding() -> dict[str, list[tuple]]:
        return or_by_clause.get(clause_state["clause"], {})

    def node_set(binding: str) -> DataFrame:
        label = qg.labels.get(binding)
        ids = graph.node_set(
            label,
            filters_by_binding().get(binding, ()),
            or_filters_by_binding().get(binding, ()),
            qg.extra_labels.get(binding, ()),
        )
        # prop filters only shrink the set, so the label card is an upper
        # bound; unlabeled-but-filtered sets have no bound -> let AQE pick
        if label is not None and stats.label_card(label) < BROADCAST_MAX_ROWS:
            ids = F.broadcast(ids)
        return ids

    def constrain(df: DataFrame, binding: str, label_implied: bool = False) -> DataFrame:
        label = qg.labels.get(binding)
        nfs = filters_by_binding().get(binding, ())
        ors = or_filters_by_binding().get(binding, ())
        extra = qg.extra_labels.get(binding, ())
        if label is None and not nfs and not ors and not extra:
            return df
        if label_implied and not nfs and not ors and not extra:
            # the edge scan already guarantees the label (exact triplet
            # counts, _edge_implies_label): the semi-join is an identity
            # — skip its broadcast build + join pass (round-16)
            steps.append(("semi_skip", binding, label))
            return df
        steps.append(("semi", binding, label, len(nfs) + len(ors) + len(extra)))
        return df.join(
            node_set(binding).withColumnRenamed("id", binding), on=binding, how="left_semi"
        )

    def edge_implies_label(e, binding: str) -> bool:
        # module-level _edge_implies_label over THIS stage's (possibly
        # hop-eliminated) query graph and stats
        return _edge_implies_label(qg, stats, e, binding)

    # edge-variable property returns: (edge name) -> [(prop, out alias)]
    edge_prop_cols: dict[str, list[tuple[str, str]]] = {}
    for en, p, a in qg.edge_prop_returns:
        edge_prop_cols.setdefault(en, []).append((p, a))
    # edge-property aggregates materialize their value column on the edge
    # scan like returned edge props, under the _agg_ alias the aggregate
    # emitter consumes
    for ag in qg.aggregates:
        if ag.on_edge:
            edge_prop_cols.setdefault(ag.binding, []).append(
                (ag.prop, f"_agg_{ag.alias}")
            )
    edge_alias_set = {a for _, _, a in qg.edge_prop_returns}
    edge_agg_aliases = [f"_agg_{a.alias}" for a in qg.aggregates if a.on_edge]

    # length(p): var-length edges on a measured path carry a min-hop dist
    # column (computed inside the closure, see _var_length_pairs); fixed
    # edges contribute compile-time constants
    measured = {
        i for pn, _ in qg.path_lengths if pn in qg.paths for i in qg.paths[pn]
    }
    dist_alias_by_idx: dict[int, str] = {}
    dist_alias_by_id: dict[int, str] = {}
    for i in sorted(measured):
        e = qg.edges[i]
        if e.min_hops != (e.max_hops if e.max_hops is not None else -1):
            a = f"_pdist_{i}"
            dist_alias_by_idx[i] = a
            dist_alias_by_id[id(e)] = a
    # measured paths inside OPTIONAL MATCH groups (round-7): their
    # var-length edges carry a dist column through the group's left
    # join; (group idx, edge idx) -> alias
    opt_dist_alias: dict[tuple[int, int], str] = {}
    for pn, _ in qg.path_lengths:
        if pn not in qg.opt_paths:
            continue
        gi, idxs = qg.opt_paths[pn]
        for i in idxs:
            e = qg.optionals[gi][i]
            if e.min_hops != (e.max_hops if e.max_hops is not None else -1):
                a = f"_pdist_opt_{gi}_{i}"
                opt_dist_alias[(gi, i)] = a
                dist_alias_by_id[id(e)] = a

    def edge_prop_col(df: DataFrame, prop: str, cast_num: bool):
        """Resolve an edge property: typed edge column (weight) first,
        then the props map if the edge table carries one."""
        if prop in df.columns:
            return F.col(prop)
        if "props" in df.columns:
            c = F.col("props").getItem(prop)
            return c.cast("double") if cast_num else c
        raise ValueError(f"edge property {prop!r} not present on edges")

    def pred_sel(binding: str) -> float:
        """Product of WHERE-predicate selectivities on a binding, from
        the per-(label, prop) histograms (extension beyond the
        reference's label-frequency-only model — SURVEY §4.2). Unknown
        predicates contribute 1.0, keeping the estimate an upper bound
        exactly like the label card."""
        sel = 1.0
        for f in filters_by_binding().get(binding, ()):
            if f.fn is not None:
                continue  # function-wrapped prop: unestimated (bound kept)
            if f.prop == ID_PROP:
                # id(b) equality hits exactly one node of the label set
                if f.op == "=":
                    card = stats.label_card(qg.labels.get(binding))
                    if card:
                        sel *= 1.0 / card
                continue  # range/inequality on id: unestimated
            s = stats.pred_sel(
                graph.nodes, qg.labels.get(binding), f.prop, f.op, f.value, f.is_num
            )
            if s is not None:
                sel *= s
        # OR groups (incl. expanded IN lists): disjunction bounded by the
        # sum of atom fractions; an unestimable atom makes the whole
        # group unestimable (sum would silently under-count it)
        for grp in or_filters_by_binding().get(binding, ()):
            parts = [
                None if f.fn is not None else stats.pred_sel(
                    graph.nodes, qg.labels.get(binding), f.prop, f.op, f.value, f.is_num
                )
                for f in grp
            ]
            if all(p is not None for p in parts):
                sel *= min(1.0, sum(parts))
        return sel

    def edge_pred_sel(e: PatternEdge) -> float:
        """Product of edge-property predicate selectivities on the edge
        variable (weight histograms over the typed scan)."""
        if not e.name:
            return 1.0
        sel = 1.0
        for f in edge_filters_by_clause.get(clause_state["clause"], {}).get(e.name, ()):
            s = stats.edge_pred_sel(
                graph.typed_edges(list(e.types)), tuple(e.types),
                f.prop, f.op, f.value, f.is_num,
            )
            if s is not None:
                sel *= s
        return sel

    def edge_est(e: PatternEdge) -> float:
        # unbounded closures have no hop count; assume a deep-ish graph
        hops = e.max_hops if e.max_hops is not None else 8
        psel = pred_sel(e.src) * pred_sel(e.dst) * edge_pred_sel(e)
        if e.undirected:
            # symmetrized scan: twice the stored rows; directional triplet
            # counts don't apply (both orientations contribute)
            return expand_card(
                (stats.type_card(list(e.types)) or 1) * 2 * hops,
                1.0,
                stats.node_sel(qg.labels.get(e.src))
                * stats.node_sel(qg.labels.get(e.dst)) * psel,
            )
        # exact directional triplet count when a label constrains the hop
        # (StatsStore.scala:141-170,210-253); independence fallback.
        # WHERE predicates scale either path by their histogram fraction.
        tc = stats.triplet_card(
            qg.labels.get(e.src), list(e.types), qg.labels.get(e.dst)
        )
        if tc is not None:
            return expand_card(float(tc) * hops, 1.0, psel)
        return expand_card(
            (stats.type_card(list(e.types)) or 1) * hops,
            1.0,
            stats.node_sel(qg.labels.get(e.src))
            * stats.node_sel(qg.labels.get(e.dst)) * psel,
        )

    def is_constrained(binding: str) -> bool:
        return (
            qg.labels.get(binding) is not None
            or binding in filters_by_binding()
            or binding in or_filters_by_binding()
            or binding in qg.extra_labels
        )

    def node_sig(binding: str) -> tuple:
        """Constraint identity of a binding (labels + predicate set +
        OR-group set) — what makes two seeded scans interchangeable."""
        nfs = filters_by_binding().get(binding, ())
        ors = or_filters_by_binding().get(binding, ())
        return (
            qg.labels.get(binding),
            tuple(sorted(qg.extra_labels.get(binding, ()))),
            tuple(sorted((f.prop, f.op, str(f.value)) for f in nfs)),
            tuple(sorted(
                tuple(sorted((f.prop, f.op, str(f.value)) for f in grp)) for grp in ors
            )),
        )

    scan_memo: dict[tuple, DataFrame] = {}

    def edge_df(e: PatternEdge) -> DataFrame:
        raw = graph.typed_edges(list(e.types))
        # edge-property WHERE: applied directly on the typed edge scan —
        # the predicate reaches the source before any join (for
        # var-length edges it restricts every hop)
        efs = (
            edge_filters_by_clause.get(clause_state["clause"], {}).get(e.name, [])
            if e.name
            else []
        )
        props = edge_prop_cols.get(e.name, []) if e.name else []
        if props and (e.min_hops, e.max_hops) != (1, 1):
            raise ValueError("cannot return properties of a variable-length edge")
        alias_cols = [a for _, a in props]
        dist_alias = dist_alias_by_id.get(id(e))
        # seeding decision first — it is part of the scan's memo identity
        seeded: str | None = None
        seed_key = None
        if (e.min_hops, e.max_hops) != (1, 1):
            if is_constrained(e.src):
                seeded, seed_key = e.src, ("src", *node_sig(e.src))
            elif is_constrained(e.dst):
                seeded, seed_key = e.dst, ("dst", *node_sig(e.dst))
        # Shared sub-pattern memo (the reference's order-insensitive plan
        # signatures, LogicNode.scala:20-31, applied to scans): two pattern
        # edges with the same type set / hop bounds / filters / seed share
        # ONE DataFrame — for var-length edges that is a materialized
        # (checkpointed) closure computed once, not per branch.
        key = (
            tuple(e.types), e.min_hops, e.max_hops,
            tuple(sorted((f.prop, f.op, str(f.value)) for f in efs)),
            tuple(props), seed_key, clause_state["clause"], dist_alias is not None,
            e.undirected,
        )
        if key in scan_memo:
            base = scan_memo[key]
            steps.append(("scan_reuse", tuple(e.types), e.min_hops, e.max_hops))
        else:
            for f in efs:
                raw = raw.filter(
                    _OPS[f.op](edge_prop_col(raw, f.prop, f.is_num), F.lit(f.value))
                )
            if efs:
                steps.append(("edge_filter", e.name, len(efs)))
            base = raw.select(
                "src", "dst", *[edge_prop_col(raw, p, False).alias(a) for p, a in props]
            )
            if e.undirected:
                # Direction.Both (-[]-): the scan is the symmetrized edge
                # set — each stored edge matches in both orientations.
                # Symmetrizing BEFORE a var-length expansion makes the
                # closure walk the undirected graph, hop by hop.
                base = base.unionByName(
                    base.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst"),
                        *[F.col(a) for a in alias_cols],
                    )
                )
            if (e.min_hops, e.max_hops) != (1, 1):
                # Push the endpoint restriction INTO the iterative
                # expansion: closing over the whole graph and filtering
                # afterwards is the classic scale-killer (full-graph
                # transitive closure at 100 TB). Seed the frontier with the
                # constrained source node set — or, when only the
                # destination is constrained, run the closure over the
                # transposed edges seeded from the destination set
                # (transpose is a column swap, store.py:117-132).
                wd = dist_alias is not None
                if seeded == e.src:
                    base = _var_length_pairs(
                        base, e.min_hops, e.max_hops, sources=node_set(e.src),
                        with_dist=wd,
                    )
                elif seeded == e.dst:
                    t = base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
                    closed = _var_length_pairs(
                        t, e.min_hops, e.max_hops, sources=node_set(e.dst),
                        with_dist=wd,
                    )
                    base = closed.select(
                        F.col("dst").alias("src"), F.col("src").alias("dst"),
                        *([F.col("dist")] if wd else []),
                    )
                else:
                    base = _var_length_pairs(base, e.min_hops, e.max_hops, with_dist=wd)
                if seeded is not None:
                    steps.append(("closure_seed", seeded))
            scan_memo[key] = base
        extra = [F.col(a) for a in alias_cols]
        if dist_alias is not None:
            extra.append(F.col("dist").alias(dist_alias))
        if e.src == e.dst:  # self-loop pattern (a)-[:X]->(a)
            df = base.filter(F.col("src") == F.col("dst")).select(
                F.col("src").alias(e.src), *extra
            )
        else:
            df = base.select(F.col("src").alias(e.src), F.col("dst").alias(e.dst), *extra)
        # dict.fromkeys: deduped like a set but iteration order is fixed
        # (src first), so the two commuting semi-joins land in a stable
        # order across runs instead of varying with hash randomization.
        for b in dict.fromkeys((e.src, e.dst)):
            if b == seeded:
                continue  # restriction already applied inside the expansion
            df = constrain(df, b, label_implied=edge_implies_label(e, b))
        return df

    # bindings that appear in no pattern edge: plain label scans, joined in
    # at the end (cartesian across disconnected components is Cypher
    # semantics; the reference only emits connected patterns)
    edge_bindings = {b for e in qg.edges for b in (e.src, e.dst)}
    # carry_required (OPTIONAL-stage demotion): the carried rows are the
    # required set — nothing scans standalone
    required = (
        set() if qg.carry_required else (qg.match_bindings or set(qg.labels))
    )
    isolated = [b for b in qg.labels if b in required and b not in edge_bindings]

    df: DataFrame | None = None
    bound: set[str] = set()

    prop_bindings = [b for b, _, _ in qg.prop_returns] + [
        b for _, b, _, _ in qg.string_fn_returns
    ] + [b for b, _, _, _ in qg.coalesce_returns] + [
        b for b, _ in qg.id_returns
    ] + [b for b, _ in qg.labels_returns] + [
        p[1] for parts, _ in qg.concat_returns for p in parts if p[0] == "prop"
    ] + [b for b, _, _w in qg.keys_returns]
    agg_bindings = [
        a.binding for a in qg.aggregates if a.binding != "*" and not a.on_edge
    ]
    # arithmetic RETURN items: their prop leaves resolve like prop_returns
    expr_leaves = list(dict.fromkeys(
        leaf for it in qg.expr_returns for leaf in expr_prop_leaves(it.expr)
    ))
    expr_bindings = list(dict.fromkeys(b for b, _ in expr_leaves))

    opt_bindings = {b for g in qg.optionals for e in g for b in (e.src, e.dst)}
    # count(*) counts distinct full-pattern matches — no binding is ever dead
    star = any(a.binding == "*" for a in qg.aggregates)

    def base_need() -> set[str]:
        # optional groups left-join on their shared bindings later, so those
        # must survive the main chain's projections; returned edge-property
        # columns ride along like bindings (a match with a returned edge
        # value is distinct per value — openCypher's per-edge semantics)
        need = (
            set(qg.returns) | set(prop_bindings) | set(agg_bindings)
            | set(expr_bindings)
            | opt_bindings | edge_alias_set | set(edge_agg_aliases)
            | {a.binding for grp in qg.cross_filters for a in grp}
            | {b for ef in qg.expr_filters
               for b, _ in expr_prop_leaves(ef[0]) + expr_prop_leaves(ef[2])}
            | set(dist_alias_by_idx.values())
        )
        if star:
            need |= set(qg.labels)
        return need

    def build_tree(tree, outer: set[str]) -> DataFrame:
        """Execute a join tree from _choose_join_tree. ``outer`` =
        bindings the rest of the plan (sibling subtrees, later clauses)
        still needs — the tree-shaped generalization of the old loop's
        'bindings of edges not yet joined'. After every node the frame is
        projected to the live bindings and deduplicated (ANY_PAIR
        semantics, see module doc)."""
        nonlocal total_cost, bound
        is_join = isinstance(tree, tuple) and len(tree) == 3 and tree[0] == "J"
        if not is_join:
            e = tree
            est = edge_est(e)
            total_cost += step_cost(est)
            ndf = edge_df(e)
            bound |= set(ndf.columns)
            steps.append(("scan", (e.src, e.dst), e.types, est))
            live = sorted((base_need() | outer) & set(ndf.columns))
            ndf = ndf.select(*live).dropDuplicates(live)
            steps.append(("project_distinct", tuple(live)))
            return ndf
        _, lt, rt = tree
        lbind = {b for x in _subtree_edges(lt) for b in (x.src, x.dst)}
        rbind = {b for x in _subtree_edges(rt) for b in (x.src, x.dst)}
        ldf = build_tree(lt, outer | rbind)
        right_is_leaf = not (isinstance(rt, tuple) and len(rt) == 3 and rt[0] == "J")
        if right_is_leaf:
            # left-deep extension: join the raw edge frame, project after —
            # byte-identical steps to the pre-bushy planner for chain plans
            e = rt
            est = edge_est(e)
            total_cost += step_cost(est)
            ndf = edge_df(e)
            bound |= set(ndf.columns)
            shared = [c for c in ndf.columns if c in ldf.columns]
            if shared:
                out = ldf.join(ndf, on=shared, how="inner")
                steps.append(("expand", (e.src, e.dst), tuple(shared), est))
            else:
                out = ldf.crossJoin(ndf)
                steps.append(("cartesian", (e.src, e.dst), est))
        else:
            # bushy: the right arm is built (and projected) independently,
            # then the two sub-results join on their shared bindings
            rdf = build_tree(rt, outer | lbind)
            shared = [c for c in rdf.columns if c in ldf.columns]
            if shared:
                out = ldf.join(rdf, on=shared, how="inner")
                steps.append(("bushy_join", tuple(shared)))
            else:
                out = ldf.crossJoin(rdf)
                steps.append(("bushy_cartesian", tuple(sorted(rbind))))
        live = sorted((base_need() | outer) & set(out.columns))
        out = out.select(*live).dropDuplicates(live)
        steps.append(("project_distinct", tuple(live)))
        return out

    if qg.edges:
        tree, _ = _choose_join_tree(list(qg.edges), edge_est)
        df = build_tree(tree, set())

    for b in isolated:
        # scan the label's id set directly (label-pruned parquet / slim
        # cache) instead of the full union-of-tables node scan plus a
        # semi-join against that same set (round-16): identical id
        # multiset, one scan fewer — this is the hot path for patterns
        # reduced by the tautological-hop elimination above
        ids = graph.node_set(
            qg.labels.get(b),
            filters_by_binding().get(b, ()),
            or_filters_by_binding().get(b, ()),
            qg.extra_labels.get(b, ()),
        )
        scan = ids.withColumnRenamed("id", b).dropDuplicates([b])
        steps.append(("node_scan", b, qg.labels.get(b)))
        df = scan if df is None else df.crossJoin(scan)
        bound.add(b)

    carry_extras: list[str] = []
    if df is None and qg.carry_required and carry is not None:
        # OPTIONAL-stage base (WITH ... OPTIONAL MATCH, extension): there
        # is no required pattern — the carried rows are the required
        # match set, and the optional groups below left-join onto them.
        df = carry
        shared = [c for c in carry.columns if c in qg.labels]
        carry_extras = [c for c in carry.columns if c not in shared]
        bound |= set(shared)
        steps.append(("carry_base", tuple(shared), tuple(carry_extras)))
        carry = None

    assert df is not None, "empty pattern"

    # WITH-pipeline carry (extension): inner-join the previous stage's
    # rows on the shared bindings BEFORE aggregation/optionals, so this
    # stage's aggregates only count matches that survived the carried
    # WHERE — openCypher's row-piping semantics. No shared binding means
    # an explicit cartesian product, as in openCypher.
    if carry is not None:
        shared = [c for c in carry.columns if c in df.columns]
        carry_extras = [c for c in carry.columns if c not in shared]
        if shared:
            df = df.join(carry, on=shared, how="inner")
        else:
            df = df.crossJoin(carry)
        steps.append(("carry_join", tuple(shared), tuple(carry_extras)))

    # Pattern predicates (extension): WHERE (a)-[:T]->(b) is a left-semi
    # join of the match set against the probe pattern projected to the
    # shared bindings; NOT (...) is the left-anti twin. The probe chain
    # reuses edge_df (label constraints, var-length closures, scan memo)
    # and never joins the full probe result into the match — only its
    # distinct shared-binding projection crosses the join.
    for pf_edges, negated in qg.pattern_filters:
        pdf: DataFrame | None = None
        pbound: set[str] = set()
        for e in _choose_join_order(list(pf_edges), edge_est):
            ndf = edge_df(e)
            if pdf is None:
                pdf = ndf
            else:
                shared_p = [c for c in ndf.columns if c in pbound]
                pdf = (
                    pdf.join(ndf, on=shared_p, how="inner")
                    if shared_p else pdf.crossJoin(ndf)
                )
            pbound |= set(ndf.columns)
        shared_pf = sorted(pbound & bound & set(df.columns))
        if not shared_pf:
            raise ValueError("pattern predicate shares no binding with the match")
        probe = pdf.select(*shared_pf).dropDuplicates(shared_pf)
        df = df.join(
            probe, on=shared_pf, how="left_anti" if negated else "left_semi"
        )
        steps.append(
            ("pattern_filter", "anti" if negated else "semi", tuple(shared_pf))
        )

    # Cross-binding WHERE disjunctions (extension): cannot push to any one
    # scan, so they apply once the owning joins have bound every referenced
    # binding — i.e. right after the required chain. Props resolve via one
    # slim join per referenced binding; the filter then drops the temp
    # columns, so only match-surviving rows ever fetch props.
    for grp in qg.cross_filters:
        bs = sorted({a.binding for a in grp})
        if "props" not in graph.nodes.columns:
            raise ValueError("graph nodes carry no props column; WHERE unsupported")
        for b in bs:
            n = graph.payload_rows().select(
                F.col("id").alias(b), F.col("props").alias(f"_cf_{b}")
            )
            df = df.join(n, on=b, how="left")
        acc = None
        for a in grp:
            c = F.col(f"_cf_{a.binding}").getItem(a.prop)
            if a.is_num:
                c = c.cast("double")
            cc = _OPS[a.op](c, F.lit(a.value))
            acc = cc if acc is None else (acc | cc)
        df = df.filter(acc).drop(*[f"_cf_{b}" for b in bs])
        steps.append(("cross_filter", tuple(bs), len(grp)))

    # Arithmetic WHERE predicates (extension): evaluated over slim props
    # joins exactly like cross-binding disjunctions — the expression can
    # reference several bindings, so it applies after the required chain.
    for node, op, rhs in qg.expr_filters:
        bs = sorted({b for b, _ in expr_prop_leaves(node) + expr_prop_leaves(rhs)})
        if "props" not in graph.nodes.columns:
            raise ValueError("graph nodes carry no props column; WHERE unsupported")
        for b in bs:
            n = graph.payload_rows().select(
                F.col("id").alias(b), F.col("props").alias(f"_xf_{b}")
            )
            df = df.join(n, on=b, how="left")

        def _leaf(nd):
            kind = nd[0]
            if kind == "num":
                return F.lit(nd[1])
            if kind == "prop":
                return F.col(f"_xf_{nd[1]}").getItem(nd[2]).cast("double")
            if kind == "neg":
                return -_leaf(nd[1])
            if kind == "strlen":
                return F.length(F.col(f"_xf_{nd[1]}").getItem(nd[2])).cast("double")
            if kind == "fn1":
                return _num_fn_col(nd[1], _leaf(nd[2]))
            if kind == "case":
                return _case_col(
                    nd, _leaf, lambda b, p: F.col(f"_xf_{b}").getItem(p)
                )
            _, o, l, r = nd
            lc, rc = _leaf(l), _leaf(r)
            return {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}[o]

        df = df.filter(_OPS[op](_leaf(node), _leaf(rhs))).drop(*[f"_xf_{b}" for b in bs])
        steps.append(("expr_filter", tuple(bs), op))

    # OPTIONAL MATCH (extension): each group becomes its own distinct
    # match set, left-joined to the required matches on the shared
    # bindings — the relational reading of openCypher's optional
    # pattern (unmatched rows keep NULL for the group's new bindings).
    # The group is deduplicated to (shared + returned) bindings BEFORE
    # the left join, so optional multiplicity never multiplies the
    # required match set beyond real distinct matches.
    opt_group_nonshared: dict[int, list[str]] = {}
    for gi, group in enumerate(qg.optionals):
        gb = {b for e in group for b in (e.src, e.dst)}
        shared = sorted(gb & bound)
        if not shared:
            raise ValueError(
                "OPTIONAL MATCH pattern must share at least one binding with MATCH"
            )
        later = {b for g2 in qg.optionals[gi + 1:] for e in g2 for b in (e.src, e.dst)}
        galiases = {
            a for en2, _, a in qg.edge_prop_returns
            if en2 in {e.name for e in group if e.name}
        }
        # dist columns of measured optional paths ride the left join
        gdists = {
            opt_dist_alias[(gi, i)]
            for i in range(len(group)) if (gi, i) in opt_dist_alias
        }
        guard: set[str] = set()
        if not gdists and any(
            pn in qg.opt_paths and qg.opt_paths[pn][0] == gi
            for pn, _ in qg.path_lengths
        ):
            # a fixed-length measured path needs one non-shared column
            # as its NULL-for-unmatched indicator
            nonshared = sorted(gb - set(shared))
            if nonshared:
                guard = {nonshared[0]}
        keep = sorted(
            (gb & (set(qg.returns) | set(prop_bindings) | set(agg_bindings) | later))
            | set(shared) | galiases | gdists | guard
        )
        opt_group_nonshared[gi] = [c for c in keep if c not in shared]
        clause_state["clause"] = gi + 1  # this group's WHERE scope
        odf: DataFrame | None = None
        obound: set[str] = set()
        for e in _choose_join_order(group, edge_est):
            est = edge_est(e)
            total_cost += step_cost(est)
            ndf = edge_df(e)
            if odf is None:
                odf = ndf
            else:
                oshared = [c for c in ndf.columns if c in obound]
                odf = odf.join(ndf, on=oshared, how="inner") if oshared else odf.crossJoin(ndf)
            obound |= set(ndf.columns)
        odf = odf.select(*keep).dropDuplicates(keep)
        df = df.join(odf, on=shared, how="left")
        bound |= set(keep)
        steps.append(("optional", tuple(shared), tuple(keep)))
    clause_state["clause"] = 0

    # length(p) materializes once every referenced dist column is bound:
    # constants for fixed-hop edges + the min-hop dist of each var edge
    path_len_aliases: list[str] = []
    for pname, alias in qg.path_lengths:
        const = 0
        parts: list = []
        if pname in qg.opt_paths:
            # OPTIONAL path (round-7): NULL for unmatched rows — a
            # var-length dist part is NULL there already; a fixed-only
            # path guards on one of the group's non-shared columns
            gi, idxs = qg.opt_paths[pname]
            for i in idxs:
                e = qg.optionals[gi][i]
                if (gi, i) in opt_dist_alias:
                    parts.append(F.col(opt_dist_alias[(gi, i)]))
                else:
                    const += e.min_hops
            expr = F.lit(const).cast("long")
            for p in parts:
                expr = expr + p
            if not parts:
                gb2 = {b for e in qg.optionals[gi] for b in (e.src, e.dst)}
                guards = [
                    c for c in opt_group_nonshared.get(gi, ()) if c in gb2
                ]
                if not guards:
                    raise CypherParseError(
                        "length() of a fixed-length OPTIONAL path whose "
                        "bindings are all shared with MATCH is unsupported"
                    )
                expr = F.when(F.col(guards[0]).isNotNull(), expr)
            df = df.withColumn(alias, expr)
            path_len_aliases.append(alias)
            steps.append(("opt_path_length", pname, alias))
            continue
        for i in qg.paths[pname]:
            e = qg.edges[i]
            if i in dist_alias_by_idx:
                parts.append(F.col(dist_alias_by_idx[i]))
            else:
                const += e.min_hops
        expr = F.lit(const).cast("long")
        for p in parts:
            expr = expr + p
        df = df.withColumn(alias, expr)
        path_len_aliases.append(alias)
        steps.append(("path_length", pname, alias))

    # with count(*), every bound binding joins the distinct set, not just
    # the grouped/aggregated ones
    star_extra = [b for b in sorted(bound) if b in df.columns] if star else []
    needed = list(
        dict.fromkeys(
            qg.returns + prop_bindings + agg_bindings + expr_bindings
            + sorted(edge_alias_set) + edge_agg_aliases
            + path_len_aliases + star_extra + carry_extras
        )
    )
    out = df.select(*needed).dropDuplicates(needed)

    # Property resolution (extension): one join back to the nodes payload
    # per binding with property accesses — the Readme.md:66-70 "resolve to
    # payload rows" step, done lazily on the already-distinct match set so
    # the props map is only fetched for surviving ids.
    prop_cols: dict[str, list[tuple[str, str]]] = {}  # binding -> [(prop, outcol)]
    for b, p, a in qg.prop_returns:
        prop_cols.setdefault(b, []).append((p, a))
    # ORDER BY b.prop (extension): resolve the property as a helper
    # column, dropped after LIMIT. Restricted to returned bindings and
    # non-aggregating queries (else alias the property in RETURN).
    ob_aliases: dict[int, str] = {}
    for i, it in enumerate(qg.order_items):
        if it[0] != "prop":
            continue
        _, ob_b, ob_p, _d = it
        if qg.aggregates or any(x.agg is not None for x in qg.expr_returns):
            raise CypherParseError(
                "ORDER BY a property with aggregation: return the property "
                "with an alias and ORDER BY the alias"
            )
        if ob_b not in needed:
            raise CypherParseError(
                f"ORDER BY property of non-returned binding: {ob_b!r}"
            )
        a = f"_ob_{i}"
        prop_cols.setdefault(ob_b, []).append((ob_p, a))
        ob_aliases[i] = a
    for ag in qg.aggregates:
        if ag.prop is not None and not ag.on_edge:
            prop_cols.setdefault(ag.binding, []).append((ag.prop, f"_agg_{ag.alias}"))
    for b, pp in expr_leaves:
        prop_cols.setdefault(b, []).append((pp, f"_xp_{b}_{pp}"))
    for _fn, b, pp, a in qg.string_fn_returns:
        prop_cols.setdefault(b, []).append((pp, f"_sf_{a}"))
    for b, pp, _dflt, a in qg.coalesce_returns:
        prop_cols.setdefault(b, []).append((pp, f"_cl_{a}"))
    for parts, a in qg.concat_returns:
        for i, p in enumerate(parts):
            if p[0] == "prop":
                prop_cols.setdefault(p[1], []).append((p[2], f"_cc_{a}_{i}"))
    for b, cols in prop_cols.items():
        # Resolution is per DISTINCT (id, payload) row (round-9,
        # VERDICT r8 #4): a multi-label node (several LABEL rows, one
        # shared payload) projects its props ONCE per match — openCypher
        # semantics, no fanout. The driver testdata's duplicate
        # lineitem rows (same id, genuinely DISTINCT props; NOTES.md
        # "testdata quirk") survive the payload dedup, so the oracles'
        # per-raw-row aggregation still hash-matches.
        n = graph.payload_rows().select(
            F.col("id").alias(b), F.col("props").alias(f"_props_{b}")
        )
        out = out.join(n, on=b, how="left")
        for p, a in cols:
            out = out.withColumn(a, F.col(f"_props_{b}").getItem(p))
        out = out.drop(f"_props_{b}")
        steps.append(("resolve_props", b, tuple(p for p, _ in cols)))

    # arithmetic RETURN items (extension): evaluate the tree over the
    # resolved _xp_ leaf columns; non-aggregated items project like
    # prop_returns, aggregated items stage a value column for the agg
    def _expr_col(node):
        kind = node[0]
        if kind == "num":
            return F.lit(node[1])
        if kind == "prop":
            return F.col(f"_xp_{node[1]}_{node[2]}").cast("double")
        if kind == "neg":
            return -_expr_col(node[1])
        if kind == "strlen":
            return F.length(F.col(f"_xp_{node[1]}_{node[2]}")).cast("double")
        if kind == "fn1":
            return _num_fn_col(node[1], _expr_col(node[2]))
        if kind == "case":
            return _case_col(node, _expr_col, lambda b, p: F.col(f"_xp_{b}_{p}"))
        _, op, l, r = node
        lc, rc = _expr_col(l), _expr_col(r)
        return {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}[op]

    # id(b): the binding column IS the node id — a zero-cost projection
    id_aliases = []
    for b, a in qg.id_returns:
        out = out.withColumn(a, F.col(b))
        id_aliases.append(a)
    # labels(b): one per-id label-set lookup table (sorted comma-joined —
    # multi-label nodes are several (id,label) rows), left-joined per
    # binding like the props resolution above; shuffles on node id, the
    # same scale shape as resolve_props
    labels_aliases = []
    if qg.labels_returns:
        ldf = (
            graph.nodes.select("id", "label")
            .dropDuplicates(["id", "label"])
            .groupBy("id")
            .agg(
                F.concat_ws(",", F.sort_array(F.collect_set("label"))).alias("_lbls")
            )
        )
        for b, a in qg.labels_returns:
            out = out.join(
                ldf.select(F.col("id").alias(b), F.col("_lbls").alias(a)),
                on=b,
                how="left",
            )
            labels_aliases.append(a)
            steps.append(("resolve_labels", b))
    # keys(b)/properties(b): one props-map join per binding (deduped on
    # (id, payload) like every resolution join — a multi-label node
    # carries one shared payload), rendered sorted so the result is
    # deterministic
    keys_aliases = []
    for b, a, with_values in qg.keys_returns:
        n = graph.payload_rows().select(
            F.col("id").alias(b), F.col("props").alias(f"_kp_{a}")
        )
        out = out.join(n, on=b, how="left")
        if with_values:
            rendered = F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.map_entries(F.col(f"_kp_{a}"))),
                    lambda s: F.concat(s.key, F.lit("="), s.value),
                ),
            )
        else:
            rendered = F.concat_ws(
                ",", F.array_sort(F.map_keys(F.col(f"_kp_{a}")))
            )
        out = out.withColumn(a, rendered).drop(f"_kp_{a}")
        keys_aliases.append(a)
        steps.append(("resolve_keys", b, with_values))
    string_fn_aliases = []
    for fn, _b, _pp, a in qg.string_fn_returns:
        out = out.withColumn(a, apply_scalar_fn(fn, F.col(f"_sf_{a}")))
        string_fn_aliases.append(a)
    coalesce_aliases = []
    for _b, _pp, dflt, a in qg.coalesce_returns:
        out = out.withColumn(a, F.coalesce(F.col(f"_cl_{a}"), F.lit(dflt)))
        coalesce_aliases.append(a)
    # string concatenation (round-8): NULL-propagating like openCypher's
    # + (and SQL ||) — F.concat is NULL if any operand is NULL
    concat_aliases = []
    for parts, a in qg.concat_returns:
        cols = [
            F.lit(p[1]) if p[0] == "lit" else F.col(f"_cc_{a}_{i}")
            for i, p in enumerate(parts)
        ]
        out = out.withColumn(a, F.concat(*cols))
        concat_aliases.append(a)
    plain_expr_aliases = []
    for it in qg.expr_returns:
        col = _expr_col(it.expr)
        if it.agg is None:
            out = out.withColumn(it.alias, col)
            plain_expr_aliases.append(it.alias)
        else:
            out = out.withColumn(f"_agg_{it.alias}", col)
    group_cols = (
        qg.returns + [a for _, _, a in qg.prop_returns] + sorted(edge_alias_set)
        + path_len_aliases + plain_expr_aliases + string_fn_aliases
        + coalesce_aliases + concat_aliases + id_aliases + labels_aliases
        + keys_aliases + carry_extras
    )
    expr_aggs = [it for it in qg.expr_returns if it.agg is not None]
    if qg.aggregates or expr_aggs:
        # aggregates over distinct matches (existence semantics): rows are
        # already distinct over (returned + aggregated bindings); numeric
        # aggs evaluate the string prop as a double
        _FN = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
        aggs = []
        for ag in qg.aggregates:
            if ag.func == "count":
                if ag.binding == "*":
                    cnt = F.count(F.lit(1))
                elif ag.prop is not None:
                    # count(b.prop): non-NULL property values per group
                    # (the staged _agg_ column resolves like any other
                    # property aggregate) — VERDICT r6 #8; DISTINCT
                    # counts the distinct values instead
                    src = F.col(f"_agg_{ag.alias}")
                    cnt = F.count_distinct(src) if ag.distinct else F.count(src)
                else:
                    src = F.col(ag.binding)
                    cnt = F.count_distinct(src) if ag.distinct else F.count(src)
                aggs.append(cnt.alias(ag.alias))
            elif ag.func == "collect":
                src = (
                    F.col(ag.binding) if ag.prop is None
                    else F.col(f"_agg_{ag.alias}")
                )
                # sorted distinct values: collect() made deterministic
                aggs.append(F.sort_array(F.collect_set(src)).alias(ag.alias))
            elif ag.func in ("stdev", "stdevp"):
                # openCypher stDev (sample) / stDevP (population)
                f = F.stddev_samp if ag.func == "stdev" else F.stddev_pop
                aggs.append(f(F.col(f"_agg_{ag.alias}").cast("double")).alias(ag.alias))
            elif ag.func == "percentilecont":
                # sort-based interpolation — bit-identical to DuckDB's
                # quantile_cont (NOTES r5: percentiles are cross-engine
                # exact, unlike stddev)
                aggs.append(
                    F.percentile(
                        F.col(f"_agg_{ag.alias}").cast("double"), F.lit(ag.param)
                    ).alias(ag.alias)
                )
            elif ag.func == "percentiledisc":
                # the value at ceil(q·n) in sorted order — an actual
                # element, per openCypher percentileDisc; built from
                # sort_array(collect_list) so it stays deterministic
                vals = F.sort_array(
                    F.collect_list(F.col(f"_agg_{ag.alias}").cast("double"))
                )
                idx = F.greatest(
                    F.lit(1),
                    F.ceil(F.lit(ag.param) * F.size(vals)).cast("int"),
                )
                aggs.append(F.element_at(vals, idx).alias(ag.alias))
            else:
                src = F.col(f"_agg_{ag.alias}").cast("double")
                if ag.func == "sum" and ag.distinct:
                    c = F.coalesce(F.sum_distinct(src), F.lit(0.0))
                elif ag.func == "sum":
                    # openCypher: sum over no values is 0, not NULL —
                    # the case an OPTIONAL MATCH's unmatched rows hit
                    # (avg/min/max stay NULL, also per openCypher)
                    c = F.coalesce(F.sum(src), F.lit(0.0))
                elif ag.func == "avg" and ag.distinct:
                    c = F.expr(
                        f"avg(DISTINCT CAST(`_agg_{ag.alias}` AS DOUBLE))"
                    )
                else:
                    # min/max: DISTINCT is a semantic no-op
                    c = _FN[ag.func](src)
                aggs.append(c.alias(ag.alias))
        _EFN = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}
        for it in expr_aggs:
            c = _EFN[it.agg](F.col(f"_agg_{it.alias}"))
            if it.agg == "sum":
                c = F.coalesce(c, F.lit(0.0))
            aggs.append(c.alias(it.alias))
        out = out.groupBy(*group_cols).agg(*aggs) if group_cols else out.agg(*aggs)
        steps.append(("aggregate", tuple(
            [ag.alias for ag in qg.aggregates] + [it.alias for it in expr_aggs]
        )))
    elif (
        qg.prop_returns or qg.edge_prop_returns or qg.expr_returns
        or qg.string_fn_returns or qg.coalesce_returns
        or qg.id_returns or qg.labels_returns or qg.concat_returns
        or qg.keys_returns
    ):
        # distinct matches projected to properties; duplicates from shared
        # property values are kept (the match set, not the value set, is
        # what's distinct)
        out = out.select(*group_cols, *ob_aliases.values())
    if ob_aliases:
        # property sort keys are string-typed: numeric strings order by
        # their numeric cast first, the raw string second (deterministic
        # for non-numeric values; a pure tie-break for numeric ones)
        exprs = []
        for i, it in enumerate(qg.order_items):
            if it[0] == "col":
                c, d = F.col(it[1]), it[2]
                exprs.append(c.desc() if d else c.asc())
            else:
                a, d = ob_aliases[i], it[3]
                num = F.col(a).try_cast("double")
                exprs.append(num.desc() if d else num.asc())
                # raw-string secondary ONLY where the numeric cast fails:
                # numeric ties must NOT be broken by their string
                # rendering ('100' vs '100.0') or a LIMIT cut diverges
                # from the oracle's CAST-then-binding ordering (ADVICE
                # r6); non-numeric values keep a deterministic lexical
                # order.
                raw_sec = F.when(num.isNull(), F.col(a))
                exprs.append(raw_sec.desc() if d else raw_sec.asc())
        out = out.orderBy(*exprs)
        steps.append(("order_by", tuple(qg.order_items)))
    elif qg.order_by:
        out = out.orderBy(*[F.col(c).desc() if d else F.col(c).asc() for c, d in qg.order_by])
        steps.append(("order_by", tuple(qg.order_by)))
    if qg.skip is not None:
        out = out.offset(qg.skip)
        steps.append(("skip", qg.skip))
    if qg.limit is not None:
        out = out.limit(qg.limit)
        steps.append(("limit", qg.limit))
    if ob_aliases:
        out = out.drop(*ob_aliases.values())
    return PlannedQuery(out, steps, total_cost)


MAX_VAR_HOPS = 10
MAX_CLOSURE_ITERS = 64


def _var_length_pairs(
    edges: DataFrame, lo: int, hi: int | None, sources: DataFrame | None = None,
    with_dist: bool = False,
) -> DataFrame:
    """Distinct (src,dst) pairs connected by a directed walk of length in
    [lo, hi] — the variable-length path operator `-[:T*lo..hi]->`
    (extension; bounded iterative expand with per-step distinct, the
    ANY_PAIR trick again so intermediate size is pair-bounded, never
    walk-count-bounded).

    ``sources`` (optional, one ``id`` column) restricts the walk origins:
    the FIRST hop is semi-joined to the source set, so every later
    intermediate is bounded by |reachable-from-sources|, not |graph| —
    the pushed-down form of `(a:Label)-[*]->(x)`.

    ``with_dist`` adds a ``dist`` column = MINIMUM walk length per pair
    (functionally dependent on (src,dst), so it never multiplies rows) —
    the value behind ``length(p)``. In the closure it is free: semi-naive
    delta iteration discovers each pair first at its BFS depth.

    hi=None (bare `*` / `*n..`) runs a delta-iteration transitive
    closure: only newly discovered pairs are re-expanded each round
    (semi-naive evaluation), lineage truncated per iteration with
    iter_checkpoint (G4S_CHECKPOINT_DIR switches every loop in the
    package to reliable checkpoints for cluster mode). The loop
    terminates after at most graph-diameter rounds; MAX_CLOSURE_ITERS is
    a hard error, not a silent cap."""
    e = edges.dropDuplicates(["src", "dst"])
    seed = e
    if sources is not None:
        seed = e.join(
            sources.withColumnRenamed("id", "src"), on="src", how="left_semi"
        )
    if hi is not None:
        if hi > MAX_VAR_HOPS:
            raise ValueError(f"variable-length upper bound {hi} exceeds cap {MAX_VAR_HOPS}")
        walks = [seed]  # exact-k pair sets, k = 1..hi
        for _ in range(2, hi + 1):
            prev = walks[-1].select("src", F.col("dst").alias("mid"))
            step = (
                prev.join(e.select(F.col("src").alias("mid"), "dst"), on="mid")
                .select("src", "dst")
                .dropDuplicates(["src", "dst"])
            )
            walks.append(step)
        if with_dist:
            out = walks[lo - 1].withColumn("dist", F.lit(lo).cast("long"))
            for k, w in enumerate(walks[lo:], start=lo + 1):
                out = out.unionByName(w.withColumn("dist", F.lit(k).cast("long")))
            return out.groupBy("src", "dst").agg(F.min("dist").alias("dist"))
        out = walks[lo - 1]
        for w in walks[lo:]:
            out = out.unionByName(w)
        return out.dropDuplicates(["src", "dst"])

    e = e.cache()
    try:
        # frontier = exact-lo-hop pairs (walk semantics, same as bounded path)
        frontier = seed
        for _ in range(lo - 1):
            frontier = (
                frontier.select("src", F.col("dst").alias("mid"))
                .join(e.select(F.col("src").alias("mid"), "dst"), on="mid")
                .select("src", "dst")
                .dropDuplicates(["src", "dst"])
            )
        if with_dist:
            frontier = frontier.withColumn("dist", F.lit(lo).cast("long"))
        pairs = iter_checkpoint(frontier)
        frontier = pairs
        e_next = e.select(F.col("src").alias("mid"), "dst")
        depth = lo
        for _ in range(MAX_CLOSURE_ITERS):
            depth += 1
            new = (
                frontier.select("src", F.col("dst").alias("mid"))
                .join(e_next, on="mid")
                .select("src", "dst")
                .dropDuplicates(["src", "dst"])
                .join(pairs.select("src", "dst"), on=["src", "dst"], how="left_anti")
            )
            if with_dist:
                # first discovery == BFS depth == minimum walk length
                new = new.withColumn("dist", F.lit(depth).cast("long"))
            new = iter_checkpoint(new)
            if new.limit(1).count() == 0:
                break
            pairs = iter_checkpoint(pairs.unionByName(new))
            frontier = new
        else:
            raise RuntimeError(
                f"transitive closure did not converge within {MAX_CLOSURE_ITERS} iterations"
            )
    finally:
        # every retained round is checkpointed (lineage truncated), so
        # the edge cache is not needed after the loop — release it instead
        # of leaking cached blocks across the session's other queries
        e.unpersist()
    return pairs


def _subtree_edges(tree) -> list:
    """Leaves of a join tree in build order (left-to-right)."""
    if isinstance(tree, tuple) and len(tree) == 3 and tree[0] == "J":
        return _subtree_edges(tree[1]) + _subtree_edges(tree[2])
    return [tree]


def _choose_join_tree(edges, edge_est) -> tuple:
    """Join-SHAPE search under the reference cost model: DP over connected
    edge subsets exploring both left-deep extensions and bushy
    two-subtree joins — the reference memo's plan space, where groups are
    keyed by edge set and FilterExpandCommutative re-associates
    (L·R)·F ≡ L·(R·F) (Memo.scala:65-106,
    rules/trans/FilterExpandCommutative.scala:10-36).

    Returns (tree, cost). A tree is a PatternEdge leaf or ("J", l, r);
    cost = Σ 1.2·card over every join output plus the leaf scans
    (Operator.scala:116-148). For fork patterns (two multi-hop arms
    meeting at one binding) building each arm independently then joining
    beats hanging the second arm's edges off the first arm's running
    cardinality — the case a left-deep-only search cannot reach.

    Beyond MAX_EXHAUSTIVE edges: greedy cheapest-connected-first
    left-deep chain (same fallback as _choose_join_order). Disconnected
    patterns plan each connected component's tree, then fold with
    cartesian joins (Cypher comma semantics).
    """
    MAX_EXHAUSTIVE = 7
    if not edges:
        return None, 0.0
    if len(edges) == 1:
        return edges[0], step_cost(max(edge_est(edges[0]), 1e-9))

    # connected components over shared bindings: DP needs a connected set
    comps: list[list] = []
    for e in edges:
        eb = {e.src, e.dst}
        hit = [c for c in comps if any(eb & {x.src, x.dst} for x in c)]
        merged = [e]
        for c in hit:
            merged.extend(c)
            comps.remove(c)
        comps.append(merged)
    if len(comps) > 1:
        # preserve input edge order inside each component for stability;
        # cheapest component anchors the cartesian fold (smallest first,
        # matching the connected case's anchor rule)
        trees = sorted(
            (_choose_join_tree([e for e in edges if e in c], edge_est) for c in comps),
            key=lambda tc: tc[1],
        )
        tree, cost = trees[0]
        for t, c in trees[1:]:
            tree, cost = ("J", tree, t), cost + c  # executor renders crossJoin
        return tree, cost

    if len(edges) > MAX_EXHAUSTIVE:
        order = _choose_join_order(edges, edge_est)
        tree, cost = order[0], step_cost(max(edge_est(order[0]), 1e-9))
        card = max(edge_est(order[0]), 1e-9)
        for e in order[1:]:
            card = max(card * max(edge_est(e), 1e-9), 1.0)
            tree, cost = ("J", tree, e), cost + step_cost(card)
        return tree, cost

    n = len(edges)
    ests = [max(edge_est(e), 1e-9) for e in edges]
    full = (1 << n) - 1
    # bindings per subset, built from the subset's lowest bit + the rest
    binds: dict[int, frozenset] = {}
    for i in range(n):
        binds[1 << i] = frozenset((edges[i].src, edges[i].dst))
    for subset in range(1, full + 1):
        if subset not in binds:
            binds[subset] = binds[subset & -subset] | binds[subset & (subset - 1)]

    # memo: subset -> (cost, output_card, tree); only connected subsets
    # (joinable splits) ever get an entry, mirroring the reference memo's
    # group-per-edge-set identity
    best: dict[int, tuple[float, float, object]] = {
        1 << i: (step_cost(ests[i]), ests[i], edges[i]) for i in range(n)
    }
    for subset in sorted(range(1, full + 1), key=int.bit_count):
        if subset.bit_count() < 2:
            continue
        lowest = subset & -subset
        entry = None
        # canonical split enumeration: A always contains the lowest bit,
        # so each {A, B} partition is scored exactly once (B = subset\A
        # may be a single edge — that transition IS the left-deep step)
        a_mask = (subset - 1) & subset
        while a_mask:
            if a_mask & lowest:
                b_mask = subset ^ a_mask
                a, b = best.get(a_mask), best.get(b_mask)
                if a and b and (binds[a_mask] & binds[b_mask]):
                    card = max(a[1] * b[1], 1.0)
                    cost = a[0] + b[0] + step_cost(card)
                    if entry is None or cost < entry[0]:
                        # left = the side built (and projected) first.
                        # Two leaves: cheaper edge anchors, matching the
                        # old order's smallest-first chain start. A
                        # subtree joins a leaf: subtree left — that IS
                        # the left-deep extension step. Two subtrees:
                        # larger left, small side joins in.
                        a_leaf = not (isinstance(a[2], tuple) and a[2] and a[2][0] == "J")
                        b_leaf = not (isinstance(b[2], tuple) and b[2] and b[2][0] == "J")
                        if a_leaf and b_leaf:
                            l, r = (a, b) if a[1] <= b[1] else (b, a)
                        elif a_leaf != b_leaf:
                            l, r = (a, b) if b_leaf else (b, a)
                        else:
                            l, r = (a, b) if a[1] >= b[1] else (b, a)
                        entry = (cost, card, ("J", l[2], r[2]))
            a_mask = (a_mask - 1) & subset
        if entry is not None:
            best[subset] = entry
    cost, _, tree = best[full]
    return tree, cost


def _choose_join_order(edges, edge_est) -> list:
    """Join-order search under the reference cost model.

    The reference explores the full memo of plan shapes (MemoV2 /
    Columbia cascades, SURVEY §3.1-3.2, §4.1); our plan space is the
    order in which pattern edges join the chain. For ≤ MAX_EXHAUSTIVE
    edges we run a Selinger-style DP over connected edge subsets —
    exact under the cost model (cost = Σ 1.2·card_i, card_i =
    max(card_{i-1} · est_i, 1), Operator.scala:116-148) — and fall back
    to greedy smallest-first beyond that. Subset states double as the
    reference's order-insensitive plan signatures (LogicNode.scala:20-31):
    two orders reaching the same edge set share one memo entry.
    """
    MAX_EXHAUSTIVE = 7
    if len(edges) <= 1:
        return list(edges)
    if len(edges) > MAX_EXHAUSTIVE:
        # greedy: repeatedly take the cheapest edge connected to the chain
        remaining, order, bound = list(edges), [], set()
        while remaining:
            pool = [e for e in remaining if bound and (e.src in bound or e.dst in bound)] or remaining
            nxt = min(pool, key=edge_est)
            remaining.remove(nxt)
            order.append(nxt)
            bound.update((nxt.src, nxt.dst))
        return order

    ests = {i: max(edge_est(e), 1e-9) for i, e in enumerate(edges)}
    n = len(edges)
    full = (1 << n) - 1
    # memo: subset -> (total_cost, running_card, order as tuple of indices)
    best: dict[int, tuple[float, float, tuple[int, ...]]] = {}
    for i in range(n):
        best[1 << i] = (step_cost(ests[i]), ests[i], (i,))
    for subset in sorted(best.keys() | set(range(1, full + 1)), key=int.bit_count):
        if subset not in best:
            continue
        cost, card, order = best[subset]
        bound = {b for i in order for b in (edges[i].src, edges[i].dst)}
        for j in range(n):
            if subset & (1 << j):
                continue
            e = edges[j]
            connected = e.src in bound or e.dst in bound
            # disallow cartesian steps while connected options remain: try
            # connected extensions first; cartesian handled by falling back
            # when nothing is connected
            if not connected and any(
                not (subset & (1 << k)) and (edges[k].src in bound or edges[k].dst in bound)
                for k in range(n)
            ):
                continue
            new_card = max(card * ests[j], 1.0)
            new_cost = cost + step_cost(new_card)
            key = subset | (1 << j)
            if key not in best or new_cost < best[key][0]:
                best[key] = (new_cost, new_card, order + (j,))
    return [edges[i] for i in best[full][2]]


def explain_cypher(
    graph: PropertyGraph,
    query: str,
    params: dict | None = None,
    spark_plan: bool = False,
) -> str:
    """EXPLAIN for the Cypher front-end (round-8): the planner's
    logical step trace — scans (with reuse), label semi-joins, the
    chosen join order (chain vs bushy), optional groups, property
    resolution, aggregation, order/limit — plus the cost-model
    estimate, and optionally Spark's own plan underneath
    (``spark_plan=True``). Compound queries (UNION / leading UNWIND /
    WITH pipelines) explain each segment-planned DataFrame only at the
    Spark level; the single-MATCH form carries the full step trace.

    This is the user-facing twin of the plan-shape tests: the steps
    come from the SAME PlannedQuery.steps channel those tests pin, so
    what EXPLAIN prints is what the planner provably did."""
    if params is not None:
        query = bind_params(query, params)
    lines: list[str] = []
    segs, _union_all = _split_union(query)
    compound = len(segs) > 1 or _UNWIND.match(query) or split_with(query) is not None
    if compound:
        df = run_cypher(graph, query)
        lines.append(
            "compound query (UNION / UNWIND / WITH pipeline): stage-level "
            "step traces are internal; Spark plan reflects the composed job"
        )
        spark_plan = True
    else:
        qg = parse(query)
        planned = plan_match(graph, qg)
        df = planned.df
        lines.append(f"estimated cost: {planned.cost:,.1f}")
        for s in planned.steps:
            kind, args = s[0], s[1:]
            lines.append(f"  {kind}: " + ", ".join(repr(a) for a in args))
    if spark_plan:
        lines.append("-- spark physical plan --")
        lines.append(df._jdf.queryExecution().simpleString())
    return "\n".join(lines)
