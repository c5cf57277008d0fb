"""Pallas TPU kernel for the chunked one-hot SpMM contraction.

The blocked SpMM (ops/spmm.py) splits into (1) an XLA gather building
per-edge messages and (2) a contraction of each chunk's K messages against a
(K, R) one-hot matrix plus cross-chunk accumulation. XLA materializes the
one-hot tensor and the per-chunk partials (B', R, D) in HBM between the
einsum and the chunk segment-sum; this kernel eliminates both: the one-hot
is built in registers and chunk partials accumulate in VMEM.

Structure: the grid iterates over chunks (Mosaic auto-pipelines the msg/id
block DMAs); the output BlockSpec maps each chunk to its destination block
via the scalar-prefetched chunk->block table, so consecutive chunks of one
block revisit the same VMEM output tile — the classic K-loop accumulation
pattern. The chunk order from data/batching.py is sorted by destination
block, which makes the revisit sequence contiguous.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per destination block: MUST equal the layout builder's tile height —
# blk_dst offsets and the R-1 padding fill are computed against it
from ..data.batching import BLOCK_R as R


def _kernel(blk_of, msg_ref, dst_ref, out_ref, *, K, D):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    prev = blk_of[jnp.maximum(c - 1, 0)]
    is_first = jnp.logical_or(c == 0, blk_of[c] != prev)

    @pl.when(is_first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ids = dst_ref[0]                                        # (1, K) int32
    onehot = (ids == jax.lax.broadcasted_iota(jnp.int32, (R, K), 0)
              ).astype(msg_ref.dtype)
    out_ref[:] += jax.lax.dot_general(
        onehot, msg_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    del nc


def chunk_contract(msg, blk_dst, blk_of_chunk, num_blocks, interpret=False):
    """Fused one-hot contraction + chunk accumulation.

    Args:
      msg: (B'*K, D) per-edge messages, chunk-major.
      blk_dst: (B', K) int32 local destination rows.
      blk_of_chunk: (B',) int32 destination block of each chunk
        (non-decreasing).
      num_blocks: static B.
    Returns: (B*R, D) float32.
    """
    Bp, K = blk_dst.shape
    D = msg.shape[-1]
    interpret = interpret or jax.default_backend() == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp,),
        in_specs=[
            pl.BlockSpec((K, D), lambda c, blk_of: (c, 0)),
            # ids as (B',1,K): a (1,1,K) block satisfies the tiling rule
            # (dims equal to the array's own dims are exempt)
            pl.BlockSpec((1, 1, K), lambda c, blk_of: (c, 0, 0)),
        ],
        out_specs=pl.BlockSpec((R, D), lambda c, blk_of: (blk_of[c], 0)),
    )
    out = pl.pallas_call(
        partial(_kernel, K=K, D=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * R, D), jnp.float32),
        interpret=interpret,
    )(blk_of_chunk, msg.reshape(Bp * K, D), blk_dst.reshape(Bp, 1, K))
    return out


def chunk_ptr_from_out(blk_out: np.ndarray, num_blocks: int) -> np.ndarray:
    """Host-side: chunk ranges per destination block from sorted blk_out."""
    cnt = np.bincount(np.asarray(blk_out), minlength=num_blocks)
    ptr = np.zeros(num_blocks + 1, np.int32)
    np.cumsum(cnt, out=ptr[1:])
    return ptr


def pallas_blocked_spmm(blk_src, blk_dst, blk_val, blk_out, x, num_blocks,
                        interpret=False):
    """Full SpMM: XLA gather + Pallas fused contraction.

    ``blk_out`` is the (B',) chunk->destination-block table (sorted).
    Feature dims are padded to the 128-lane tile (the 8-dim input-feature
    layer pays a padded first SpMM; hidden layers are already aligned)."""
    Bp, K = blk_src.shape
    D = x.shape[-1]
    msg = x[blk_src.reshape(-1)] * blk_val.reshape(-1)[:, None].astype(x.dtype)
    d_pad = -D % 128
    if d_pad:
        msg = jnp.pad(msg, ((0, 0), (0, d_pad)))
    out = chunk_contract(msg.reshape(Bp, K, D + d_pad), blk_dst, blk_out,
                         num_blocks, interpret=interpret)
    out = out.astype(x.dtype)
    return out[:, :D] if d_pad else out
