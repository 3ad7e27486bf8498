from hippo_claim_crossover_spark.functions.scalar import (
    fmt_diagnosis_code,
    fmt_postal_code,
    fmt_person_name,
    join_pointers,
    ruby_to_f,
    ruby_to_i,
    bool_eq,
    case_map,
    coalesce_pair,
)

__all__ = [
    "fmt_diagnosis_code",
    "fmt_postal_code",
    "fmt_person_name",
    "join_pointers",
    "ruby_to_f",
    "ruby_to_i",
    "bool_eq",
    "case_map",
    "coalesce_pair",
]
