"""Device mesh construction (SURVEY.md §2.3: the TPU build's distribution
axes are ``dp`` — data parallel over graphs — and ``edge`` — edge-partitioned
execution of one large graph; the reference has no distribution at all,
train.py:81-83).

Multi-host: within a slice the mesh rides ICI; across hosts
:func:`maybe_init_distributed` connects processes over DCN via
``jax.distributed.initialize`` (SURVEY.md §5 comm-backend row), after which
``jax.devices()`` is global and the same mesh/shard_map code runs unchanged.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_init_distributed() -> bool:
    """Connect this process to a multi-host run when the LP_GNN_DIST_* env
    vars are set; no-op (returns False) otherwise.

    Env contract (explicit coordinator mode — works on CPU fleets and GPU;
    TPU pods can also rely on JAX's auto-detection and skip these):

        LP_GNN_DIST_COORD    host:port of process 0
        LP_GNN_DIST_NPROCS   total process count
        LP_GNN_DIST_PROC_ID  this process's rank

    Must run before the first JAX backend touch. After it returns True,
    ``jax.devices()`` lists every device in the job (local + remote over
    DCN) and meshes built from it produce cross-host collectives.

    Called from ``config.apply_platform_env`` so every CLI entry point
    (train.py, run_train_test.py, scripts/*) joins the job when the env
    contract is set; idempotent within a process (re-entry is a no-op).

    Data contract under multi-host: every process loads the same dataset
    and computes identical host-side batches (same seed, same order);
    numpy inputs to the jitted steps are the *global* values, and shard_map
    in_specs split them so each process's devices consume their shards
    (see scripts/dryrun_multihost.py for the launcher template)."""
    coord = os.environ.get("LP_GNN_DIST_COORD", "")
    if not coord:
        return False
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None and is_init():
        return True   # already connected (idempotent re-entry)
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["LP_GNN_DIST_NPROCS"]),
            process_id=int(os.environ["LP_GNN_DIST_PROC_ID"]))
    except RuntimeError as e:   # double-init on jax without is_initialized
        if "already initialized" not in str(e).lower():
            raise
    return True


def parse_mesh_shape(spec: str) -> dict[str, int]:
    """Parse "dp=2,edge=4" -> {"dp": 2, "edge": 4}."""
    out: dict[str, int] = {}
    if not spec:
        return out
    for part in spec.split(","):
        k, v = part.split("=")
        out[k.strip()] = int(v)
    return out


def make_mesh(shape: dict[str, int] | str | None = None,
              devices=None) -> Mesh:
    """Build a Mesh. Default: all devices on one ``edge`` axis."""
    if isinstance(shape, str):
        shape = parse_mesh_shape(shape)
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"edge": len(devices)}
    sizes = list(shape.values())
    assert int(np.prod(sizes)) <= len(devices), (shape, len(devices))
    devs = np.asarray(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(devs, tuple(shape.keys()))
