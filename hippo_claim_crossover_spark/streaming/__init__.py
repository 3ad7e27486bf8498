from hippo_claim_crossover_spark.streaming.ops import (
    read_event_stream,
    sessionized,
    tumbling_agg,
    run_to_memory,
)
from hippo_claim_crossover_spark.streaming.stateful import (
    cumulative_user_profile,
)

__all__ = ["read_event_stream", "tumbling_agg", "sessionized",
           "run_to_memory", "cumulative_user_profile"]
