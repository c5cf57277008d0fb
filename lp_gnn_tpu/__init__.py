"""lp-gnn-tpu: a TPU-native framework for learning smart initial simplex bases.

Re-implements, TPU-first (JAX/XLA/Pallas/pjit + a C++ simplex runtime), the
capabilities of vbdai/lp-gnn ("Smart Initial Basis Selection for Linear
Programs", ICML 2023):

- LP instances -> constraint/variable bipartite graphs with 8 features/side
  (reference: dataset.py:23-96)
- two-tower message-passing GNN classifying per-node simplex basis status
  (reference: arch.py:51-193)
- knowledge masking + top-m valid-basis decoding (reference: arch.py:129-141,
  val.py:106-124)
- basis export and warm-started simplex evaluation (reference:
  scripts/pred_basis.py, scripts/run_solver_from_basis.py)

Subpackages
-----------
- ``utils``     timing / logging / serialization / misc (reference utils.py L0)
- ``io``        MPS and .bas/.sol file formats (reference scripts/cvt_to_pkl.py)
- ``data``      scaling, features, dataset, batching, synthetic LP generators
- ``ops``       sparse bipartite ops: CSR SpMM/SDDMM (jnp reference + Pallas)
- ``models``    GCN_FC / GCN / deeper variants as pure-function pytree models
- ``train``     losses, optimizer, train loop, metrics
- ``infer``     basis decoding (top-m), prediction drivers
- ``parallel``  mesh/sharding, DP, edge-partitioned graph parallelism
- ``solver``    C++ bounded-variable revised simplex with basis warm start
- ``reporting`` results table and improvement-vs-baseline aggregation
"""

__version__ = "0.1.0"
