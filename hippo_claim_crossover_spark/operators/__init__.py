"""Reusable, user-facing operator implementations.

``plans/`` declares the driver-checked queries; the composable building
blocks a user would import live here. Everything is pure DataFrame
transformations — no collect(), no driver-side loops (SURVEY.md §4.3).
"""

from hippo_claim_crossover_spark.operators.bucketing import (  # noqa: F401
    bucketed_join,
    write_bucketed,
)
from hippo_claim_crossover_spark.operators.joins import (  # noqa: F401
    asof_join,
    salted_join,
)
