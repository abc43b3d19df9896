"""Balanced streaming partitioning (FENNEL/LDG) + partition-quality metrics."""

from .fennel import FennelConfig, fennel_partition  # noqa: F401
from .harness import best_of  # noqa: F401
from .metrics import (  # noqa: F401
    community_quality,
    cut_metrics,
    loneliness_wavg,
    modularity,
    partition_community_quality,
    partition_populations,
    partition_sizes,
    quality_suite,
    rbse,
    waste,
)
