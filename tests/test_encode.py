"""Device encode ops vs the pure-python oracle."""

import random

import jax.numpy as jnp
import numpy as np

from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.io import readstore
from hashreadmapper_tpu.ops import encode


def _random_reads(n, maxlen, seed=0):
    rng = random.Random(seed)
    seqs = []
    for _ in range(n):
        length = rng.randint(1, maxlen)
        seqs.append("".join(rng.choice("ACGT") for _ in range(length)))
    return seqs


def _pad_bases(seqs, maxlen):
    bases = np.zeros((len(seqs), maxlen), dtype=np.int8)
    lengths = np.zeros(len(seqs), dtype=np.int32)
    for i, s in enumerate(seqs):
        enc = oracle.encode_bases(s)
        bases[i, :len(enc)] = enc
        lengths[i] = len(enc)
    return bases, lengths


def test_pack_matches_oracle_layout():
    seqs = _random_reads(20, 50)
    maxlen = 64
    bases, lengths = _pad_bases(seqs, maxlen)
    packed = np.asarray(encode.pack_2bit(jnp.array(bases)))
    for i, s in enumerate(seqs):
        want = oracle.pack_2bit(oracle.encode_bases(s))
        got = [int(w) for w in packed[i][:len(want)]]
        assert got == want, s


def test_pack_unpack_roundtrip():
    seqs = _random_reads(32, 100, seed=1)
    maxlen = 112
    bases, lengths = _pad_bases(seqs, maxlen)
    packed = encode.pack_2bit(jnp.array(bases))
    unpacked = np.asarray(encode.unpack_2bit(packed, maxlen))
    assert (unpacked == bases).all()


def test_revcomp_matches_oracle():
    seqs = _random_reads(25, 40, seed=2)
    maxlen = 48
    bases, lengths = _pad_bases(seqs, maxlen)
    rc = np.asarray(encode.revcomp_bases(jnp.array(bases), jnp.array(lengths)))
    for i, s in enumerate(seqs):
        want = oracle.revcomp_bases(oracle.encode_bases(s))
        assert list(rc[i, :len(s)]) == want, s


def test_three_n():
    bases = jnp.array([[0, 1, 2, 3, 1]], dtype=jnp.int8)
    assert list(np.asarray(encode.three_n_c_to_t(bases))[0]) == [0, 3, 2, 3, 3]
    assert list(np.asarray(encode.three_n_g_to_a(bases))[0]) == [0, 1, 0, 3, 1]


def test_readstore_pack_and_n_replacement():
    # Non-ACGT bases replaced round-robin A,C,G,T with persistent counter
    raw = np.zeros((2, 8), dtype=np.uint8)
    raw[0, :6] = np.frombuffer(b"ANNTGN", dtype=np.uint8)
    raw[1, :4] = np.frombuffer(b"NNca", dtype=np.uint8)
    bases, ambiguous, ncount = readstore.preprocess_batch(raw, 0)
    # read0: A,N->A,N->C,T,G,N->G ; read1: N->T,N->A,c->C,a->A
    assert list(bases[0, :6]) == [0, 0, 1, 3, 2, 2]
    assert list(bases[1, :4]) == [3, 0, 1, 0]
    assert ambiguous.tolist() == [True, True]
    assert ncount == 5 % 4

    # oracle cross-check
    rep = oracle.NReplacer()
    s0, a0 = rep("ANNTGN")
    s1, a1 = rep("NNca")
    assert oracle.encode_bases(s0) == list(bases[0, :6])
    assert oracle.encode_bases(s1) == list(bases[1, :4])


def test_readstore_roundtrip(tmp_path):
    seqs = _random_reads(10, 30, seed=3)
    fasta = tmp_path / "reads.fa"
    with open(fasta, "w") as fh:
        for i, s in enumerate(seqs):
            fh.write(f">r{i}\n{s}\n")
    store = readstore.ReadStorage.from_files([str(fasta)])
    assert store.num_reads == len(seqs)
    for i, s in enumerate(seqs):
        assert store.get_sequence_str(i) == s
    path = tmp_path / "store.npz"
    store.save(str(path))
    loaded = readstore.ReadStorage.load(str(path))
    assert (loaded.packed == store.packed).all()
    assert (loaded.lengths == store.lengths).all()
