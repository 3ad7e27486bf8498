"""Query-plan registry: every declared query from SURVEY.md §2a/§2b.

``ALL_SPECS`` maps query name → :class:`QuerySpec`; ``__spark_entry__.py``
derives the driver-facing ``queries()`` / ``oracle_sql()`` dicts from it.
"""

from __future__ import annotations

from hippo_claim_crossover_spark.plans import (
    asofq,
    crossover,
    dedup,
    extras,
    multimodalq,
    nested,
    relational,
    scalarq,
    similarity,
    text,
    timeseries,
    windows,
)
from hippo_claim_crossover_spark.plans.base import QuerySpec

# Declaration order matters: the driver's CORRECTNESS gate checks the first
# 50 entries of ``queries()`` in this order.  Modules whose queries have never
# had a driver row (r1/r2 checked the first 50 only) go first; the crossover /
# scalar / relational / window queries they displace are proven by two prior
# driver rounds plus the identical local gate (tools/check_oracle.py).
_MODULES = [nested, timeseries, text, dedup, similarity, multimodalq,
            asofq, extras, crossover, scalarq, relational, windows]

ALL_SPECS: dict[str, QuerySpec] = {}
for _m in _MODULES:
    overlap = ALL_SPECS.keys() & _m.SPECS.keys()
    assert not overlap, f"duplicate query names: {overlap}"
    ALL_SPECS.update(_m.SPECS)

__all__ = ["ALL_SPECS", "QuerySpec"]
