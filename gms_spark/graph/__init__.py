from gms_spark.graph.build import (  # noqa: F401
    adjacency,
    assign_dense_ids,
    build_undirected,
    degree_rank,
    degrees,
    edges_from_pages,
    orient_by_rank,
    squish,
    symmetrize,
    vertices,
)
