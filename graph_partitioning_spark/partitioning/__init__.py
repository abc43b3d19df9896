"""Balanced streaming partitioning (FENNEL/LDG) + partition-quality metrics."""

from .fennel import FennelConfig, fennel_partition  # noqa: F401
from .metrics import (  # noqa: F401
    cut_metrics,
    loneliness_wavg,
    modularity,
    partition_populations,
    partition_sizes,
    quality_suite,
    rbse,
    waste,
)
