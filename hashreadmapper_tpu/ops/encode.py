"""Sequence encoding primitives (device / JAX).

The canonical on-device representation is an int8 tensor of bases in
{0:A, 1:C, 2:G, 3:T} with a per-sequence length vector; storage uses the
reference's left-justified 2-bit packing (16 bases per uint32, base i at bits
30 - 2*(i % 16) of word i // 16; reference: include/sequencehelpers.hpp:178-275)
so binary artifacts are interchangeable with the reference's and goldens match.

The 3N ("C->T collapsed") converters mirror SequenceHelpers (reference:
include/sequencehelpers.hpp:543-578); the G->A variant is the RC-strand
counterpart used by the bisulfite-aware index.
"""

from __future__ import annotations

import jax.numpy as jnp

BASES_PER_UINT32 = 16


def num_packed_words(length: int) -> int:
    return (length + BASES_PER_UINT32 - 1) // BASES_PER_UINT32


def pack_2bit(bases: jnp.ndarray) -> jnp.ndarray:
    """[N, L] int8 bases (0..3) -> [N, ceil(L/16)] uint32, reference layout.

    Padding positions (beyond a sequence's length) must already be zeroed by
    the caller if bit-exact parity with reference-packed buffers is needed.
    """
    n, length = bases.shape
    nwords = num_packed_words(length)
    padded = jnp.zeros((n, nwords * BASES_PER_UINT32), dtype=jnp.uint32)
    padded = padded.at[:, :length].set(bases.astype(jnp.uint32))
    padded = padded.reshape(n, nwords, BASES_PER_UINT32)
    shifts = jnp.uint32(30) - jnp.uint32(2) * jnp.arange(
        BASES_PER_UINT32, dtype=jnp.uint32)
    return jnp.sum(padded << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def unpack_2bit(packed: jnp.ndarray, length: int) -> jnp.ndarray:
    """[N, W] uint32 -> [N, length] int8 bases in 0..3."""
    n, nwords = packed.shape
    shifts = jnp.uint32(30) - jnp.uint32(2) * jnp.arange(
        BASES_PER_UINT32, dtype=jnp.uint32)
    expanded = (packed[:, :, None] >> shifts[None, None, :]) & jnp.uint32(3)
    return expanded.reshape(n, nwords * BASES_PER_UINT32)[:, :length].astype(
        jnp.int8)


def revcomp_bases(bases: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Length-aware reverse complement of padded base rows.

    Positions >= length are preserved as-is at the tail (values there are
    don't-care; callers must keep using the same lengths).
    Complement is 3 - b (A<->T, C<->G), matching
    SequenceHelpers::complementBase (reference: sequencehelpers.hpp:76-129).
    """
    n, maxlen = bases.shape
    idx = jnp.arange(maxlen)[None, :]
    # reversed index within the valid prefix: length - 1 - i, clamped for pads
    src = jnp.clip(lengths[:, None] - 1 - idx, 0, maxlen - 1)
    rc = 3 - jnp.take_along_axis(bases, src, axis=1)
    return jnp.where(idx < lengths[:, None], rc, bases).astype(bases.dtype)


def three_n_c_to_t(bases: jnp.ndarray) -> jnp.ndarray:
    """C(1) -> T(3); the forward-strand bisulfite collapse."""
    return jnp.where(bases == 1, jnp.int8(3), bases).astype(bases.dtype)


def three_n_g_to_a(bases: jnp.ndarray) -> jnp.ndarray:
    """G(2) -> A(0); the reverse-strand bisulfite collapse."""
    return jnp.where(bases == 2, jnp.int8(0), bases).astype(bases.dtype)
