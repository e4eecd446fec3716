"""Device-resident memory bank as explicit functional state.

The reference mutates module attributes mid-step under no_grad
(modeling.py:222-249) and pre-fills the bank each epoch from a second
dataloader (utils/memory_bank.py:80-229).  Here the bank is a fixed-capacity
pytree carried through the jitted train step (donated buffer), with:

  * capacity M = mb_batch × global batch size — the honest quantity (the
    reference's --memory_size flag is dead; capacity freezes at the size of
    the epoch-start fill),
  * FIFO refresh: the current batch is prepended and the tail dropped,
  * an epoch-start fill that writes encoder features slice-by-slice.

All arrays are fp32 with static shapes; no host↔device traffic after fill.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class MemoryBank(NamedTuple):
    ind: jnp.ndarray      # [M] int32 sample ids
    feat_t: jnp.ndarray   # [M, T, E]
    feat_v: jnp.ndarray   # [M, F, E]
    mask_t: jnp.ndarray   # [M, T]
    mask_v: jnp.ndarray   # [M, F]


def create(capacity: int, max_words: int, max_frames: int,
           embed_dim: int, feat_dtype=jnp.float32) -> MemoryBank:
    """`feat_dtype` is the STORAGE dtype of the feature tensors (cast on
    every fill/FIFO write — fifo_update/write_slice take old.dtype).  bf16
    halves the bank's HBM and the bank-similarity streaming traffic; the
    bank is no_grad state refreshed every step (modeling.py:222-249), so
    the quantization never accumulates.  Masks/ids keep exact dtypes."""
    feat_dtype = jnp.dtype(feat_dtype)
    return MemoryBank(
        ind=jnp.full((capacity,), -1, jnp.int32),
        feat_t=jnp.zeros((capacity, max_words, embed_dim), feat_dtype),
        feat_v=jnp.zeros((capacity, max_frames, embed_dim), feat_dtype),
        mask_t=jnp.zeros((capacity, max_words), jnp.float32),
        mask_v=jnp.zeros((capacity, max_frames), jnp.float32),
    )


def fifo_update(bank: MemoryBank, ind, feat_t, feat_v, mask_t, mask_v) -> MemoryBank:
    """Prepend the current batch, drop the tail (modeling.py:236-249)."""
    cap = bank.ind.shape[0]

    def push(old, new):
        return jnp.concatenate(
            [jax.lax.stop_gradient(new.astype(old.dtype)), old], axis=0)[:cap]

    return MemoryBank(
        ind=push(bank.ind, ind),
        feat_t=push(bank.feat_t, feat_t),
        feat_v=push(bank.feat_v, feat_v),
        mask_t=push(bank.mask_t, mask_t),
        mask_v=push(bank.mask_v, mask_v),
    )


def write_slice(bank: MemoryBank, offset: int, ind, feat_t, feat_v,
                mask_t, mask_v) -> MemoryBank:
    """Epoch-start fill: write one encoded batch at `offset` (python int or
    traced scalar — dynamic_update_slice either way)."""

    def wr(old, new):
        return jax.lax.dynamic_update_slice_in_dim(
            old, jax.lax.stop_gradient(new.astype(old.dtype)), offset, axis=0)

    return MemoryBank(
        ind=wr(bank.ind, ind),
        feat_t=wr(bank.feat_t, feat_t),
        feat_v=wr(bank.feat_v, feat_v),
        mask_t=wr(bank.mask_t, mask_t),
        mask_v=wr(bank.mask_v, mask_v),
    )


def place_bank(bank: MemoryBank, placement: str, mesh=None) -> MemoryBank:
    """Move the carried bank to its configured home between steps
    (cfg.train.bank_placement; no-op for 'device').  'host' parks the bank
    in pinned host memory — bank-sized HBM becomes activation headroom and
    the train step streams it through PCIe (bertadam.place_moments is the
    sibling for optimizer moments; same backend support rules)."""
    if placement != "host":
        return bank
    from .bertadam import host_offload_supported, moments_sharding
    if not host_offload_supported():
        raise ValueError(
            "bank_placement='host' needs a TPU/GPU backend (the CPU "
            "backend cannot round-trip pinned_host buffers through "
            "donated steps)")
    s = moments_sharding("pinned_host", mesh)
    return MemoryBank(*(jax.device_put(x, s) for x in bank))


def bank_to_memory(bank: MemoryBank, kind: str, mesh=None) -> MemoryBank:
    """In-jit transfer of every bank leaf to the given memory kind
    ('device' before compute, 'pinned_host' before carrying out)."""
    from .bertadam import moments_sharding
    s = moments_sharding(kind, mesh)
    return MemoryBank(*(jax.device_put(x, s) for x in bank))
