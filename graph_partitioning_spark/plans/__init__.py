from .csr import (  # noqa: F401
    CSR_SCHEMA,
    build_csr_blocks,
    csr_degrees,
    local_label_propagation,
    local_votes,
)
