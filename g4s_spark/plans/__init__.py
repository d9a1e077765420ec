from .cost import expand_card, filter_card, step_cost
from .planner import (
    PlannedQuery,
    plan_match,
    run_cypher,
    explain_cypher,
    run_cypher_create,
    run_cypher_delete,
    run_cypher_merge,
    run_cypher_remove,
    run_cypher_set,
)

__all__ = [
    "run_cypher", "explain_cypher", "run_cypher_set", "run_cypher_merge", "run_cypher_create", "run_cypher_delete",
    "run_cypher_remove", "plan_match", "PlannedQuery", "expand_card",
    "filter_card", "step_cost",
]
