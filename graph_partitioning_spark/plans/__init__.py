from .csr import CSR_SCHEMA, build_csr_blocks, csr_degrees, local_votes  # noqa: F401
