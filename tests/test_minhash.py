"""Canonical k-mers and minhash signatures vs the oracle."""

import random

import jax.numpy as jnp
import numpy as np

from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.ops import minhash


def _pad(seqs, maxlen):
    bases = np.zeros((len(seqs), maxlen), dtype=np.int8)
    lengths = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        enc = oracle.encode_bases(s)
        bases[i, :len(enc)] = enc
        lengths[i] = len(enc)
    return jnp.array(bases), jnp.array(lengths)


def _random_seqs(n, lo, hi, seed):
    rng = random.Random(seed)
    return ["".join(rng.choice("ACGT") for _ in range(rng.randint(lo, hi)))
            for _ in range(n)]


def test_canonical_kmers_matches_oracle():
    for k in (4, 16):
        seqs = _random_seqs(10, k, 40, seed=k)
        maxlen = 48
        bases, lengths = _pad(seqs, maxlen)
        (hi, lo), valid = minhash.canonical_kmers(bases, lengths, k)
        hi, lo, valid = np.asarray(hi), np.asarray(lo), np.asarray(valid)
        for i, s in enumerate(seqs):
            want = oracle.canonical_kmers(oracle.encode_bases(s), k)
            got = [(int(hi[i, p]) << 32) | int(lo[i, p])
                   for p in range(len(want))]
            assert got == want, (k, s)
            assert valid[i, :len(want)].all()
            assert not valid[i, len(want):].any()


def test_canonical_kmers_k_above_16():
    k = 24  # kmer spans the 32-bit boundary
    seqs = _random_seqs(6, k, 60, seed=99)
    maxlen = 64
    bases, lengths = _pad(seqs, maxlen)
    (hi, lo), _ = minhash.canonical_kmers(bases, lengths, k)
    hi, lo = np.asarray(hi), np.asarray(lo)
    for i, s in enumerate(seqs):
        want = oracle.canonical_kmers(oracle.encode_bases(s), k)
        got = [(int(hi[i, p]) << 32) | int(lo[i, p]) for p in range(len(want))]
        assert got == want


def test_signatures_match_oracle():
    k = 16
    hash_ids = list(range(16))
    seqs = _random_seqs(20, 20, 120, seed=7) + ["ACG"]  # one too-short read
    maxlen = 128
    bases, lengths = _pad(seqs, maxlen)
    sig, valid = minhash.minhash_signatures(
        bases, lengths, k, jnp.array(hash_ids, dtype=jnp.uint32))
    sig, valid = np.asarray(sig), np.asarray(valid)
    for i, s in enumerate(seqs):
        want = oracle.minhash_signature(oracle.encode_bases(s), k, hash_ids)
        if want is None:
            assert not valid[i]
            assert (sig[i] == minhash.SIG_SENTINEL).all()
        else:
            assert valid[i]
            assert [int(x) for x in sig[i]] == want, s


def test_signatures_small_k():
    k = 8
    hash_ids = [0, 3, 17]
    seqs = _random_seqs(8, 10, 50, seed=11)
    bases, lengths = _pad(seqs, 64)
    sig, _ = minhash.minhash_signatures(
        bases, lengths, k, jnp.array(hash_ids, dtype=jnp.uint32))
    sig = np.asarray(sig)
    for i, s in enumerate(seqs):
        want = oracle.minhash_signature(oracle.encode_bases(s), k, hash_ids)
        assert [int(x) for x in sig[i]] == want
