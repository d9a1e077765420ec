"""Cost & cardinality model — the reference's formulas verbatim.

Reference (SURVEY §4.2):
- cost = 1.2 · outputCard + Σ childCost, leaves free
  (g4s-optimizer/.../optim/impls/Operator.scala:116-148,
   g4s-optimizer/.../columbia/CostModel.scala:5-13)
- Expand card  = max(lCard · rCard · sel, 1)
- Filter card  = min(lCard · rCard · sel, lCard)   ("a filter cannot
  increase cardinality", columbia/StatsCalculator.scala:51-93)
"""

from __future__ import annotations

COST_FACTOR = 1.2


def expand_card(l_card: float, r_card: float, sel: float) -> float:
    return max(l_card * r_card * sel, 1.0)


def filter_card(l_card: float, r_card: float, sel: float) -> float:
    return min(l_card * r_card * sel, l_card)


def step_cost(output_card: float) -> float:
    return COST_FACTOR * output_card
