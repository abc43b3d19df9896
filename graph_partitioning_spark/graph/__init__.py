from .edges import (  # noqa: F401
    assign_dense_ids,
    build_graph,
    build_vertex_dictionary,
    extract_edges,
    extract_links,
    weight_links,
    degrees,
    out_degrees,
    undirect,
)
from .pagerank import pagerank  # noqa: F401
from .components import connected_components  # noqa: F401
from .labelprop import label_propagation  # noqa: F401
from .triangles import (  # noqa: F401
    triangle_count,
    triangle_count_per_vertex,
    triangle_triples,
)
