"""3N bisulfite-aware seeding (config 2): maps fully-converted BS reads."""

import random

import numpy as np

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.pipeline.engine import CoarseMapper


def _simulate_bs(seed, n_reads, chrom_len, read_len, bs_rate):
    rng = random.Random(seed)
    chrom = "".join(rng.choice("ACGT") for _ in range(chrom_len))
    reads, truth = [], []
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for _ in range(n_reads):
        start = rng.randrange(0, chrom_len - read_len)
        frag = list(chrom[start:start + read_len])
        rc = rng.random() < 0.5
        if rc:  # directional protocol: the sequenced strand is RC(g), and
            frag = [comp[c] for c in reversed(frag)]
        # bisulfite converts Cs ON THE SEQUENCED STRAND
        seq = [("T" if (c == "C" and rng.random() < bs_rate) else c)
               for c in frag]
        reads.append("".join(seq))
        truth.append((start, rc))
    return chrom, reads, truth


def _map(chrom, reads, opts):
    genome = Genome(["chr3N"], [chrom])
    mapper = CoarseMapper(genome, opts)
    maxlen = opts.max_read_length
    bases = np.zeros((len(reads), maxlen), dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int32)
    for i, r in enumerate(reads):
        e = oracle.encode_bases(r)
        bases[i, :len(e)] = e
        lens[i] = len(e)
    return mapper.map_reads(bases, lens, emulate_read_key_drop=False)


def test_fully_converted_reads_map_in_3n_mode():
    chrom, reads, truth = _simulate_bs(3, 60, 4000, 80, bs_rate=1.0)
    base = dict(kmer_length=16, num_hash_functions=16, window_size=128,
                min_table_hits=4, batchsize=64, max_hamming_percent=0.05,
                probe_cap=64, candidates_per_read_cap=32, max_read_length=96)

    # parity mode: full conversion destroys raw k-mer identity
    res_par = _map(chrom, reads, ProgramOptions(**base))
    mapped_par = int((res_par.orientation != 3).sum())

    # 3N mode: collapse makes converted reads exact again
    res_3n = _map(chrom, reads, ProgramOptions(three_n_seeding=True, **base))
    mapped_3n = int((res_3n.orientation != 3).sum())

    assert mapped_par <= len(reads) * 0.2, mapped_par
    assert mapped_3n >= len(reads) * 0.9, mapped_3n

    # positions must reconstruct the true start, orientation must match
    for i, (start, rc) in enumerate(truth):
        if res_3n.orientation[i] == 3:
            continue
        assert res_3n.position[i] + res_3n.shift[i] == start, i
        want_ori = 2 if rc else 1
        assert res_3n.orientation[i] == want_ori, i
        # full conversion + matching collapse space => 0 mismatches
        assert res_3n.hamming[i] == 0, i


def test_partial_conversion_and_both_strands():
    chrom, reads, truth = _simulate_bs(11, 50, 3000, 70, bs_rate=0.5)
    opts = ProgramOptions(
        three_n_seeding=True, kmer_length=16, num_hash_functions=16,
        window_size=128, min_table_hits=4, batchsize=64,
        max_hamming_percent=0.05, probe_cap=64, candidates_per_read_cap=32,
        max_read_length=80)
    res = _map(chrom, reads, opts)
    mapped = int((res.orientation != 3).sum())
    assert mapped >= len(truth) * 0.75, mapped
    ok = sum(1 for i, (s, rc) in enumerate(truth)
             if res.orientation[i] != 3
             and res.position[i] + res.shift[i] == s)
    assert ok == mapped


def test_three_n_through_default_map_reads():
    """Driver-path regression: map_reads defaults (drop emulation on) must
    work in 3N mode (the drop mask is parity-only; the 3N index has 2F
    tables)."""
    chrom, reads, truth = _simulate_bs(7, 20, 2000, 60, bs_rate=0.6)
    opts = ProgramOptions(
        three_n_seeding=True, kmer_length=16, num_hash_functions=16,
        window_size=128, min_table_hits=4, batchsize=32,
        max_hamming_percent=0.05, probe_cap=32, candidates_per_read_cap=16,
        max_read_length=64)
    genome = Genome(["c"], [chrom])
    mapper = CoarseMapper(genome, opts)
    bases = np.zeros((len(reads), 64), dtype=np.int8)
    lens = np.zeros(len(reads), dtype=np.int32)
    for i, r in enumerate(reads):
        e = oracle.encode_bases(r)
        bases[i, :len(e)] = e
        lens[i] = len(e)
    res = mapper.map_reads(bases, lens)  # defaults: emulate_read_key_drop=True
    assert int((res.orientation != 3).sum()) >= len(reads) * 0.8


def test_directional_protocol_assumption():
    """3N probes the directional strands only: C->T in READ space maps;
    G->A-in-read-space reads (undirectional/PBAT strands) do not — the
    documented capability boundary (README 3N bullet, ROADMAP #10)."""
    import numpy as np
    from hashreadmapper_tpu.config import ProgramOptions
    from hashreadmapper_tpu.io.genome import Genome
    from hashreadmapper_tpu.pipeline.engine import CoarseMapper

    rng = np.random.default_rng(41)
    chrom_bases = rng.integers(0, 4, size=100_000, dtype=np.int8)
    genome = Genome(["chrD"],
                    ["".join(np.array(list("ACGT"))[chrom_bases])])
    starts = rng.integers(0, 100_000 - 100, size=128)
    frag = chrom_bases[starts[:, None] + np.arange(100)[None, :]].copy()
    # directional: C->T applied in read space (fwd reads here)
    fwd = frag.copy()
    conv = (fwd == 1) & (rng.random(fwd.shape) < 0.9)
    fwd[conv] = 3
    # PBAT-like: G->A in read space
    pbat = frag.copy()
    conv = (pbat == 2) & (rng.random(pbat.shape) < 0.9)
    pbat[conv] = 0
    opts = ProgramOptions(
        kmer_length=16, num_hash_functions=8, window_size=128,
        min_table_hits=2, batchsize=128, max_hamming_percent=0.05,
        probe_cap=8, candidates_per_read_cap=8, max_read_length=128,
        three_n_seeding=True)
    m = CoarseMapper(genome, opts)
    lens = np.full(128, 100, dtype=np.int32)
    r_fwd = m.map_reads(fwd.astype(np.int8), lens)
    r_pbat = m.map_reads(pbat.astype(np.int8), lens)
    assert (r_fwd.orientation != 3).mean() > 0.9
    assert (r_pbat.orientation != 3).mean() < 0.1
