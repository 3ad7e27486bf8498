"""hippo_claim_crossover_spark — a PySpark-native analytics engine.

A from-scratch Spark reimplementation of the query/data-processing surface of
the reference ``CDC/hippo_claim_crossover`` gem (an X12 837P claim →
CMS-1500 denormalization pipeline, ``lib/hippo_claim_crossover.rb:1-319``),
generalized to batch analytical processing over Parquet star schemas, plus
the LLM-training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) mandated by the driver contract.

Design rules (SURVEY.md §4.3):
- DataFrame/SQL only in operator paths; no collect()/driver loops.
- Explicit schemas; Catalyst does pushdown/pruning/codegen.
- Broadcast small dims, AQE on, no O(n^2) defaults at scale.
"""

from hippo_claim_crossover_spark.session import get_spark
from hippo_claim_crossover_spark.io import load_table, load_tables

__all__ = ["get_spark", "load_table", "load_tables"]
__version__ = "0.1.0"
