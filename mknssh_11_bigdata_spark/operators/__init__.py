"""Operators: relational core + LLM-data-pipeline extensions."""

from .relational import (  # noqa: F401
    bucketize,
    conditional_counts,
    cumulative_sum,
    histogram,
    membership_flag,
    null_profile,
    one_hot,
    top_k_per_group,
    top_n,
)
