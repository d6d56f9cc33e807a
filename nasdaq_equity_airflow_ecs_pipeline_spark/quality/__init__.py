from .expectations import (
    Check,
    run_suite,
    columns_match,
    not_null,
    unique,
    compound_unique,
    row_count_between,
    values_in_set,
    values_between,
    pair_a_ge_b,
    reference_suites,
)

__all__ = [
    "Check", "run_suite", "columns_match", "not_null", "unique",
    "compound_unique", "row_count_between", "values_in_set",
    "values_between", "pair_a_ge_b", "reference_suites",
]
