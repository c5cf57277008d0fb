from .decode import (
    inference_gnn, inference_all_slacks, inference_gnn_sparsity,
    decode_topm_device, InferenceManager,
)
