from .pages import generate_pages, pages_schema, planted_edges, synthetic_edges  # noqa: F401
from .metis import read_metis  # noqa: F401
from .gml import parse_gml, read_gml  # noqa: F401
