"""Pallas TPU kernel for the chunked one-hot SpMM contraction.

The blocked SpMM (ops/spmm.py) splits into (1) an XLA gather building
per-edge messages and (2) a contraction of each chunk's K messages against a
(K, R) one-hot matrix plus cross-chunk accumulation. XLA materializes the
per-chunk partials (B', R, D) in HBM between the einsum and the chunk
segment-sum; this kernel fuses both stages: each output row-block's chunks
are streamed through VMEM with double-buffered DMA and accumulated on the
MXU in fp32 without ever writing partials back to HBM.

Layout contract (data/batching.py block_layout): chunks of the same
destination block are contiguous, so ``chunk_ptr`` (B+1,) gives each block's
chunk range — the kernel's grid is over destination blocks, the inner loop
over that block's chunks.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 128  # rows per destination block (MXU tile)


def _kernel(ptr_ref, msg_hbm, dst_hbm, out_ref,
            acc, msg_buf, dst_buf, sem_msg, sem_dst, *, K, D):
    b = pl.program_id(0)
    start = ptr_ref[b]
    end = ptr_ref[b + 1]
    acc[:] = jnp.zeros(acc.shape, acc.dtype)

    nbuf = 2

    def dma_msg(slot, c):
        return pltpu.make_async_copy(
            msg_hbm.at[pl.ds(c * K, K), :], msg_buf.at[slot], sem_msg.at[slot])

    def dma_dst(slot, c):
        # int32 HBM->VMEM copies need 8-sublane alignment: fetch the whole
        # 8-row group containing chunk c; the kernel selects the row in VMEM
        return pltpu.make_async_copy(
            dst_hbm.at[pl.ds((c // 8) * 8, 8), :], dst_buf.at[slot],
            sem_dst.at[slot])

    @pl.when(start < end)
    def _():
        dma_msg(0, start).start()
        dma_dst(0, start).start()

    def body(c, _):
        i = c - start
        slot = i % nbuf
        nxt = (i + 1) % nbuf

        @pl.when(c + 1 < end)
        def _():
            dma_msg(nxt, c + 1).start()
            dma_dst(nxt, c + 1).start()

        dma_msg(slot, c).wait()
        dma_dst(slot, c).wait()
        ids = dst_buf[slot, pl.ds(c % 8, 1), :]          # (1, K) VMEM load
        # one-hot laid out (R, K): R on sublanes, K on lanes (128-aligned)
        onehot = (ids ==
                  jax.lax.broadcasted_iota(jnp.int32, (R, K), 0)
                  ).astype(jnp.float32)
        msg = msg_buf[slot].astype(jnp.float32)
        acc[:] += jax.lax.dot_general(
            onehot, msg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(start, end, body, 0)
    out_ref[:] = acc[:].astype(out_ref.dtype)


def chunk_contract(msg, blk_dst, chunk_ptr, num_blocks, interpret=False):
    """Fused one-hot contraction + chunk accumulation.

    Args:
      msg: (B'*K, D) per-edge messages, chunk-major.
      blk_dst: (B', K) int32 local destination rows.
      chunk_ptr: (B+1,) int32 chunk ranges per destination block.
      num_blocks: static B.
    Returns: (B*R, D).
    """
    Bp, K = blk_dst.shape
    D = msg.shape[-1]
    # the TPU Mosaic kernel has no CPU lowering; fall back to the
    # interpreter on host platforms (tests, multi-chip CPU simulation)
    interpret = interpret or jax.default_backend() == "cpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # msg stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # dst ids in HBM
        ],
        out_specs=pl.BlockSpec((R, D), lambda b, ptr: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, D), jnp.float32),
            pltpu.VMEM((2, K, D), msg.dtype),
            pltpu.VMEM((2, 8, K), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = partial(_kernel, K=K, D=D)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * R, D), msg.dtype),
        interpret=interpret,
    )(chunk_ptr, msg, blk_dst)
    return out


def chunk_ptr_from_out(blk_out: np.ndarray, num_blocks: int) -> np.ndarray:
    """Host-side: chunk ranges per destination block from sorted blk_out."""
    cnt = np.bincount(np.asarray(blk_out), minlength=num_blocks)
    ptr = np.zeros(num_blocks + 1, np.int32)
    np.cumsum(cnt, out=ptr[1:])
    return ptr


def pallas_blocked_spmm(blk_src, blk_dst, blk_val, chunk_ptr, x, num_blocks,
                        interpret=False):
    """Full SpMM: XLA gather + Pallas fused contraction.

    Feature dims are padded to the 128-lane tile (the 8-dim input-feature
    layer pays a padded first SpMM; hidden layers are already aligned)."""
    Bp, K = blk_src.shape
    D = x.shape[-1]
    msg = x[blk_src.reshape(-1)] * blk_val.reshape(-1)[:, None].astype(x.dtype)
    d_pad = -D % 128
    if d_pad:
        msg = jnp.pad(msg, ((0, 0), (0, d_pad)))
    # pad the chunk axis to a multiple of 8 so the 8-row dst-id DMA groups
    # never run off the end
    b_pad = -Bp % 8
    if b_pad:
        blk_dst = jnp.pad(blk_dst, ((0, b_pad), (0, 0)), constant_values=0)
    out = chunk_contract(msg, blk_dst, chunk_ptr, num_blocks,
                         interpret=interpret)
    return out[:, :D] if d_pad else out
