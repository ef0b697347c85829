from stgcn_tpu.graph.adjacency import (
    NormalizationMode,
    Strategy,
    create_adjacency_matrices,
    get_normalized_adjacency,
    normalize,
    num_partitions,
)
from stgcn_tpu.graph import skeleton
