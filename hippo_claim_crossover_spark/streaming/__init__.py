from hippo_claim_crossover_spark.streaming.ops import (
    dedup_stream,
    interval_join,
    read_event_stream,
    run_to_memory,
    sessionized,
    tumbling_agg,
    write_foreach_batch,
)
from hippo_claim_crossover_spark.streaming.stateful import (
    cumulative_user_profile,
    profile_with_topk,
)

__all__ = ["read_event_stream", "tumbling_agg", "sessionized",
           "run_to_memory", "dedup_stream", "interval_join",
           "write_foreach_batch", "cumulative_user_profile",
           "profile_with_topk"]
