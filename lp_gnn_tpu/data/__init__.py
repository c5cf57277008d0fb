from .scaling import scaling, sparse_mat_div_by_vec
from .features import (
    cvt_to_features, expand_inf, cos_sim_vec_and_sparse_mat,
    count_nonzero_sparse_mat,
)
from .dataset import LPDataset, BipartiteGraph, process_raw_dir
from .batching import pad_graph, PaddedGraph, make_buckets, bucket_for
from .sampling import sample_subgraphs
from .generator import generate_dataset, generate_instance, GENERATORS
