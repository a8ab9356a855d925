"""Pallas murmur-minhash kernel vs the XLA formulation (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from hashreadmapper_tpu.ops import minhash
from hashreadmapper_tpu.ops import minhash_pallas as mp
from hashreadmapper_tpu.ops import u64


@pytest.mark.parametrize("k,f", [(16, 16), (16, 3), (11, 16), (1, 2)])
def test_sig_min_murmur_matches_xla(k, f):
    rng = np.random.default_rng(42 + k + f)
    n, maxlen = 256, 100
    bases = rng.integers(0, 4, size=(n, maxlen)).astype(np.int8)
    lengths = rng.integers(0, maxlen + 1, size=n).astype(np.int32)
    lengths[:8] = [0, k - 1, k, maxlen, 1, k + 1, maxlen - 1, k]
    hash_ids = np.arange(f, dtype=np.uint32)

    sig_ref, valid_ref = minhash.minhash_signatures(
        jnp.asarray(bases), jnp.asarray(lengths), k, jnp.asarray(hash_ids),
        canonical=False)

    (_, clo), _ = minhash.forward_kmers(jnp.asarray(bases),
                                        jnp.asarray(lengths), k)
    got = mp.sig_min_murmur(clo, jnp.asarray(lengths), k,
                            jnp.asarray(hash_ids), interpret=True)
    mask = np.uint32(minhash.kmer_mask_py(k))
    want = np.asarray(sig_ref)
    have = np.where(np.asarray(valid_ref)[:, None],
                    np.asarray(got) & mask if k < 16 else np.asarray(got),
                    np.uint32(minhash.SIG_SENTINEL))
    np.testing.assert_array_equal(have, want)


@pytest.mark.parametrize("mode", ["fwd", "canon", "both"])
def test_sigs_from_bases_matches_xla(mode):
    rng = np.random.default_rng(5)
    k, f, n, maxlen = 16, 6, 256, 100
    bases = rng.integers(0, 4, size=(n, maxlen)).astype(np.int8)
    lengths = rng.integers(0, maxlen + 1, size=n).astype(np.int32)
    lengths[:4] = [0, k - 1, k, maxlen]
    hash_ids = np.arange(f, dtype=np.uint32)
    bd, ld, hd = (jnp.asarray(bases), jnp.asarray(lengths),
                  jnp.asarray(hash_ids))

    got = np.asarray(mp.sigs_from_bases(bd, ld, k, hd, mode=mode,
                                        interpret=True))
    from hashreadmapper_tpu.ops import encode
    if mode == "canon":
        want, _ = minhash.minhash_signatures(bd, ld, k, hd, canonical=True)
        ref = np.asarray(want)
        have = np.where(lengths[:, None] >= k, got,
                        np.uint32(minhash.SIG_SENTINEL))
        np.testing.assert_array_equal(have, ref)
    elif mode == "fwd":
        want, _ = minhash.minhash_signatures(bd, ld, k, hd, canonical=False)
        have = np.where(lengths[:, None] >= k, got,
                        np.uint32(minhash.SIG_SENTINEL))
        np.testing.assert_array_equal(have, np.asarray(want))
    else:
        w1, _ = minhash.minhash_signatures(bd, ld, k, hd, canonical=False)
        rc = encode.revcomp_bases(bd, ld)
        w2, _ = minhash.minhash_signatures(rc, ld, k, hd, canonical=False)
        have = np.where(lengths[:, None] >= k, got,
                        np.uint32(minhash.SIG_SENTINEL))
        np.testing.assert_array_equal(have[:, :f], np.asarray(w1))
        np.testing.assert_array_equal(have[:, f:], np.asarray(w2))


@pytest.mark.parametrize("mirror", [False, True])
def test_signatures_3n_pair_fallback_is_engine_formulation(mirror):
    """The XLA fallback of signatures_3n_pair must equal the engine's
    original two-call formulation (collapse + revcomp + collapse)."""
    from hashreadmapper_tpu.ops import encode
    rng = np.random.default_rng(11)
    k, f, n, maxlen = 16, 16, 128, 128
    bases = rng.integers(0, 4, size=(n, maxlen)).astype(np.int8)
    lengths = rng.integers(k, 101, size=n).astype(np.int32)
    hash_ids = np.arange(f, dtype=np.uint32)
    bd, ld, hd = (jnp.asarray(bases), jnp.asarray(lengths),
                  jnp.asarray(hash_ids))
    got, v = minhash.signatures_3n_pair(bd, ld, k, hd, mirror=mirror)
    rc = encode.revcomp_bases(bd, ld)
    if mirror:
        first = jnp.where(rc == 1, jnp.int8(3), rc)
        second = jnp.where(bd == 2, jnp.int8(0), bd)
    else:
        first = jnp.where(bd == 1, jnp.int8(3), bd)
        second = jnp.where(rc == 2, jnp.int8(0), rc)
    s1, _ = minhash.minhash_signatures(first, ld, k, hd, canonical=False)
    s2, _ = minhash.minhash_signatures(second, ld, k, hd, canonical=False)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.concatenate([s1, s2], axis=1))


def test_sig_min_murmur_vs_py_oracle():
    """Direct single-row check against the pure-python murmur."""
    rng = np.random.default_rng(7)
    k, f, n, maxlen = 16, 4, 128, 40
    bases = rng.integers(0, 4, size=(n, maxlen)).astype(np.int8)
    lengths = np.full(n, maxlen, np.int32)
    hash_ids = np.arange(f, dtype=np.uint32)
    (_, clo), _ = minhash.forward_kmers(jnp.asarray(bases),
                                        jnp.asarray(lengths), k)
    got = np.asarray(mp.sig_min_murmur(clo, jnp.asarray(lengths), k,
                                       jnp.asarray(hash_ids),
                                       interpret=True))
    clo_np = np.asarray(clo)
    for r in range(0, n, 37):
        for fi in range(f):
            h = min(u64.murmur64_py(int(clo_np[r, p]) + fi)
                    for p in range(maxlen - k + 1))
            assert got[r, fi] == np.uint32(h & 0xFFFFFFFF)
