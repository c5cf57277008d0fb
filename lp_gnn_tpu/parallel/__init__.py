from .mesh import make_mesh, parse_mesh_shape
from .edge_partition import (
    partition_graph, PartitionedGraph, dist_apply, make_dist_train_step,
)
from .dp import stack_graphs, make_dp_train_step
