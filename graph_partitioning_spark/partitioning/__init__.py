"""Balanced streaming partitioning (FENNEL/LDG) + partition-quality metrics."""

from .arrival import ArrivalConfig, simulate_arrivals  # noqa: F401
from .fennel import (  # noqa: F401
    FennelConfig,
    fennel_partition,
    foaf_reassign,
    modular_initial,
    place_singletons,
)
from .harness import best_of  # noqa: F401
from .multilevel import (  # noqa: F401
    MultilevelConfig,
    contract_map,
    contract_matching,
    hem_matching,
    lpa_coarsen,
    multilevel_partition,
    refine_boundary,
)
from .hypergraph import (  # noqa: F401
    clique_pins,
    hyperedge_weights,
    hypergraph_tcv,
    maximal_cliques,
    patoh_arrays,
    refine_tcv,
)
from .predict import predict_arrival_weights  # noqa: F401
from .metrics import (  # noqa: F401
    community_quality,
    cut_metrics,
    fscore,
    loneliness_wavg,
    nmi,
    modularity,
    partition_community_quality,
    partition_populations,
    permanence,
    partition_sizes,
    quality_suite,
    rbse,
    waste,
    wavg_permanence,
)
