"""GraphDB — the top-level facade mirroring the reference's pipeline entry
(g4s-matrix-graph/.../graph/GraphDB.scala:10-32: "parsing / optimising /
evaluating graph queries" — whose eval step the reference left commented
out; here the full pipeline runs).

    db = GraphDB(graph)
    db.query("MATCH (a:A)-[:X]->(b:B) RETURN b")        # ids per binding
    db.query(..., resolve=True)                          # + payload labels
    db.explain("MATCH ...")                              # planner steps

Result semantics follow the Readme traverser spec (Readme.md:66-70):
distinct rows over the returned bindings, resolvable to vertex payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .cypher.parser import parse, split_with
from .graph.store import PropertyGraph
from .plans.planner import (
    PlannedQuery,
    explain_cypher,
    plan_match,
    run_cypher,
    run_cypher_create,
    run_cypher_delete,
    run_cypher_merge,
    run_cypher_remove,
    run_cypher_set,
)


class GraphDB:
    def __init__(self, graph: PropertyGraph):
        self.graph = graph

    def query(
        self, cypher: str, resolve: bool = False, params: dict | None = None
    ) -> DataFrame:
        """``params`` binds ``$name`` query parameters (round-8)."""
        return run_cypher(self.graph, cypher, resolve=resolve, params=params)

    def update(self, cypher: str) -> "GraphDB":
        """Mutation statements — ``MATCH ... SET b.prop = value``,
        ``MERGE ...`` (with ON CREATE SET / ON MATCH SET), ``MATCH ...
        [DETACH] DELETE ...`` and ``MATCH ... REMOVE b.prop`` —
        returning a NEW GraphDB over the updated graph (immutable
        rewrite; see the run_cypher_* statement runners in plans).

        Verb routing scans a literal-masked copy of the statement
        (quoted spans blanked to a space so tokens never juxtapose):
        a DELETE/MERGE/... keyword INSIDE a string value — ``SET c.note
        = 'please DELETE'`` — must not hijack the route. The mask uses
        the SAME literal grammar the statement runners execute
        (``'[^']*'`` — no escapes), so routing and execution see
        identical spans by construction; a literal whose content merely
        ENDS in a backslash (``'dir\\'``) masks and executes fine
        (ADVICE r10 — the r10 blanket ``\\'`` rejection over-fired on
        it). A statement the grammar leaves with an unpaired quote —
        including the escaped-quote style it does not support
        (``'it\\'s a DELETE'`` parses as literal ``it\\`` + trailing
        garbage) — is REJECTED with a clear error rather than routed on
        a partially-masked text. The escape-aware mask is computed
        UNCONDITIONALLY and compared against the no-escape mask
        (ADVICE r11): an EVEN count of backslash-escaped quotes pairs
        up wrongly under the no-escape grammar and leaks literal
        content into the routing text with no unpaired quote left to
        trip the balance check — the mask-divergence check catches
        exactly that (the trailing-backslash ``'dir\\'`` literal still
        passes: its escape-aware mask retains an unpaired quote, so
        the masks diverge only where esc is NOT quote-free). The
        original text is what executes."""
        import re

        bare = re.sub(r"'[^']*'|\"[^\"]*\"", " ", cypher)
        esc = re.sub(r"'(?:\\.|[^'\\])*'|\"(?:\\.|[^\"\\])*\"", " ", cypher)
        esc_clean = "'" not in esc and '"' not in esc
        if "'" in bare or '"' in bare:
            if esc_clean:
                raise ValueError(
                    "update(): backslash-escaped quotes are not supported by "
                    "the literal grammar (every literal is '[^']*'); use the "
                    "other quote style for the literal"
                )
            raise ValueError(
                "update(): unbalanced string literal in statement — refusing "
                "to route a verb on a partially-masked text"
            )
        if esc_clean and esc != bare:
            # both masks quote-free but DIFFERENT: an even number of
            # escaped quotes paired up wrongly under the no-escape
            # grammar, leaking literal content into the routing text
            raise ValueError(
                "update(): backslash-escaped quotes are not supported by "
                "the literal grammar (every literal is '[^']*'); use the "
                "other quote style for the literal"
            )
        if re.match(r"(?is)^\s*MERGE\b", bare) or re.search(
            r"(?is)\bMERGE\s*\(", bare
        ):
            return GraphDB(run_cypher_merge(self.graph, cypher))
        if re.match(r"(?is)^\s*CREATE\b", bare) or re.search(
            r"(?is)\bCREATE\s*\(", bare
        ):
            return GraphDB(run_cypher_create(self.graph, cypher))
        if re.search(r"(?is)\b(?:DETACH\s+)?DELETE\b", bare):
            return GraphDB(run_cypher_delete(self.graph, cypher))
        if re.search(r"(?is)\bREMOVE\b", bare):
            return GraphDB(run_cypher_remove(self.graph, cypher))
        return GraphDB(run_cypher_set(self.graph, cypher))

    def plan(self, cypher: str) -> PlannedQuery:
        if split_with(cypher) is not None:
            raise ValueError(
                "plan()/explain() cover single-stage queries; WITH pipelines "
                "execute stage-by-stage via query() (each stage is a "
                "plan_match call with the previous stage's output as carry)"
            )
        return plan_match(self.graph, parse(cypher))

    def explain(
        self,
        cypher: str,
        params: dict | None = None,
        spark_plan: bool = False,
    ) -> str:
        """Step trace + cost estimate (round-8: now covers compound
        queries, $params, and an optional Spark physical plan — see
        plans.explain_cypher)."""
        return explain_cypher(
            self.graph, cypher, params=params, spark_plan=spark_plan
        )
