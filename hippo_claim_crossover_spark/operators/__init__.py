"""Reusable, user-facing operator implementations.

``plans/`` declares the driver-checked queries; the composable building
blocks a user would import live here. Everything is pure DataFrame
transformations — no collect(), no driver-side loops (SURVEY.md §4.3).
"""

from hippo_claim_crossover_spark.operators.bucketing import (  # noqa: F401
    bucketed_join,
    write_bucketed,
)
from hippo_claim_crossover_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    lsh_band_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from hippo_claim_crossover_spark.operators.joins import (  # noqa: F401
    asof_join,
    salted_join,
)
from hippo_claim_crossover_spark.operators.similarity import (  # noqa: F401
    cosine_topk,
    knn_blocked,
    srp_bucket,
)
from hippo_claim_crossover_spark.operators.text import (  # noqa: F401
    fingerprints,
    langid_scores,
    quality_metrics,
    token_counts,
)
