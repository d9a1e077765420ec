from .cost import expand_card, filter_card, step_cost
from .planner import PlannedQuery, plan_match, run_cypher

__all__ = ["run_cypher", "plan_match", "PlannedQuery", "expand_card", "filter_card", "step_cost"]
