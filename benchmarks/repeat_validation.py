"""Repeat-structure validation (the reference's evaluation methodology on
repeat-rich genomes).

The reference's evaluation design exists because of real-genome repeat
pathology: compare1 tolerates repeat-region mappings by comparing genome
ranges (reference: evaluation/compare1.cpp:146-183) and the window-hit
collector measures per-window candidate recall (reference:
include/windowhitstatisticcollector.hpp:42-61).  This benchmark points the
ported tools (eval/compare.py, eval/window_stats.py) at synthetic genomes
with planted repeat structure and characterizes the production caps
(probe_cap / candidates_per_read_cap / pair+tail budgets) where
probe_overflow is no longer zero: is the unmapped tail cap-limited or
true-ambiguity-limited?

Profiles:
  moderate  20 Mbp: 5% tandem arrays (20-2000 bp units), 10% dispersed
            duplications (1-10 kb blocks at ~98.5% identity), 2%
            low-complexity ((AT)n / homopolymer tracts)
  heavy     20 Mbp: the same plus an Alu-like 300 bp element family pasted
            to ~25% genome share at 1-5% divergence

Reads: 100 bp, 90% C->T converted in READ space, 50% RC, 0.5% subs,
sampled UNIFORMLY (so repeat regions are sampled at their genome share).

Usage: python benchmarks/repeat_validation.py [profile] [n_reads]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

GENOME_MBP = 20
READ_LEN = 100


def synth_repeat_genome(rng, profile):
    g_len = GENOME_MBP * 1_000_000
    g = rng.integers(0, 4, size=g_len, dtype=np.int8)
    spans = []   # (kind, start, end)

    def plant(block, pos):
        end = min(g_len, pos + len(block))
        g[pos:end] = block[:end - pos]
        return end

    # tandem arrays: ~5% of the genome
    budget = int(0.05 * g_len)
    while budget > 0:
        unit = rng.integers(0, 4, size=int(rng.integers(20, 2000)),
                            dtype=np.int8)
        copies = int(rng.integers(5, 51))
        arr = np.tile(unit, copies)[:50_000]
        pos = int(rng.integers(0, g_len - len(arr)))
        end = plant(arr, pos)
        spans.append(("tandem", pos, end))
        budget -= end - pos

    # dispersed duplications: ~10%, 1-10 kb blocks, ~1.5% divergence
    budget = int(0.10 * g_len)
    while budget > 0:
        blen = int(rng.integers(1000, 10001))
        src = int(rng.integers(0, g_len - blen))
        block = g[src:src + blen].copy()
        mut = rng.random(blen) < 0.015
        block[mut] = rng.integers(0, 4, int(mut.sum()))
        pos = int(rng.integers(0, g_len - blen))
        end = plant(block, pos)
        spans.append(("dup", pos, end))
        budget -= blen

    # low-complexity tracts: ~2%
    budget = int(0.02 * g_len)
    while budget > 0:
        tlen = int(rng.integers(100, 2000))
        kind = rng.integers(0, 3)
        if kind == 0:
            tract = np.tile(np.array([0, 3], np.int8), tlen // 2 + 1)[:tlen]
        elif kind == 1:
            tract = np.full(tlen, int(rng.integers(0, 4)), np.int8)
        else:
            tract = np.tile(np.array([1, 0, 2], np.int8), tlen // 3 + 1)[:tlen]
        pos = int(rng.integers(0, g_len - tlen))
        end = plant(tract, pos)
        spans.append(("lowc", pos, end))
        budget -= tlen

    if profile == "heavy":
        # Alu-like dispersed family: 300 bp consensus to ~25% share
        consensus = rng.integers(0, 4, size=300, dtype=np.int8)
        budget = int(0.25 * g_len)
        while budget > 0:
            el = consensus.copy()
            div = rng.uniform(0.01, 0.05)
            mut = rng.random(300) < div
            el[mut] = rng.integers(0, 4, int(mut.sum()))
            pos = int(rng.integers(0, g_len - 300))
            end = plant(el, pos)
            spans.append(("alu", pos, end))
            budget -= 300

    return g, spans


def make_reads(rng, g, n_reads):
    g_len = len(g)
    starts = rng.integers(0, g_len - READ_LEN, size=n_reads)
    reads = g[starts[:, None] + np.arange(READ_LEN)[None, :]].copy()
    sub = rng.random(reads.shape) < 0.005
    reads[sub] = rng.integers(0, 4, int(sub.sum()))
    rc = rng.random(n_reads) < 0.5
    reads[rc] = 3 - reads[rc][:, ::-1]
    conv = (reads == 1) & (rng.random(reads.shape) < 0.9)
    reads[conv] = 3
    return reads, starts, rc


def run_config(genome, reads, lengths, opts, label, collect=False):
    from hashreadmapper_tpu.pipeline.engine import CoarseMapper
    t0 = time.time()
    mapper = CoarseMapper(genome, opts)
    t_build = time.time() - t0
    padded = np.pad(reads, ((0, 0), (0, opts.max_read_length - READ_LEN))
                    ).astype(np.int8)
    t0 = time.time()
    res = mapper.map_reads(padded, lengths, collect_candidates=collect)
    t_map = time.time() - t0
    n_mapped = int((res.orientation != 3).sum())
    print(f"[{label}] build {t_build:.1f}s map {t_map:.1f}s "
          f"mapped {n_mapped}/{len(lengths)} "
          f"({100*n_mapped/len(lengths):.2f}%) stats={res.stats}",
          flush=True)
    return mapper, res


def main():
    from hashreadmapper_tpu.config import ProgramOptions
    from hashreadmapper_tpu.eval.compare import (MapperRecord, TruthRecord,
                                                 compare_mappings)
    from hashreadmapper_tpu.eval import window_stats as ws
    from hashreadmapper_tpu.io.genome import Genome

    profile = sys.argv[1] if len(sys.argv) > 1 else "moderate"
    n_reads = int(sys.argv[2]) if len(sys.argv) > 2 else 49152

    rng = np.random.default_rng(13)
    t0 = time.time()
    g, spans = synth_repeat_genome(rng, profile)
    share = {}
    for kind, a, b in spans:
        share[kind] = share.get(kind, 0) + (b - a)
    print(f"genome {GENOME_MBP} Mbp profile={profile}: repeat shares "
          f"{ {k: f'{100*v/len(g):.1f}%' for k, v in share.items()} } "
          f"({time.time()-t0:.1f}s)", flush=True)
    chrom = np.frombuffer(b"ACGT", np.uint8)[g].tobytes().decode()
    genome = Genome([f"rep_{profile}"], [chrom])
    reads, starts, rc = make_reads(rng, g, n_reads)
    lengths = np.full(n_reads, READ_LEN, np.int32)

    def opts_for(probe_cap, kcap, budg):
        return ProgramOptions(
            kmer_length=16, num_hash_functions=16, window_size=128,
            min_table_hits=4, batchsize=4096, max_hamming_percent=0.05,
            probe_cap=probe_cap, candidates_per_read_cap=kcap,
            max_read_length=128, threads=4, three_n_seeding=True,
            shd_pairs_per_read_budget=budg,
            probe_tail_budget_per_read=budg)

    # production config, with candidate collection for window stats
    mapper, res = run_config(genome, reads, lengths, opts_for(16, 8, 4),
                             "production", collect=True)

    # concordance, repeat-tolerant (compare1 semantics)
    truth = [TruthRecord(i, (0x10 if rc[i] else 0), genome.names[0],
                         int(starts[i])) for i in range(n_reads)]
    mapped_recs = [MapperRecord(i, int(res.orientation[i]), genome.names[0],
                                int(res.position[i]), int(res.shift[i]),
                                READ_LEN) for i in range(n_reads)]
    st = compare_mappings(genome, truth, mapped_recs,
                          max_mismatches_between_regions=30)
    st.print_histogram()
    n_mapped = int((res.orientation != 3).sum())
    print(f"concordant (exact or repeat-equivalent): {st.concordant()}"
          f"/{n_mapped} mapped = {100*st.concordant()/max(1,n_mapped):.2f}%",
          flush=True)

    # window-hit stats (candidate recall after hashing+vote)
    truth_w = ws.truth_windows_from_alignments(
        genome, 128, 16, [(i, 0, int(starts[i]), READ_LEN)
                          for i in range(n_reads)])
    ids, _ori = mapper.last_candidates
    win_chrom = np.asarray(mapper.table.win_chrom)
    stride = 128 - 16 + 1
    win_wid = np.asarray(mapper.table.win_pos) // stride
    cand = [row[row != 0xFFFFFFFF] for row in ids]
    coll = ws.collect_from_candidates(genome, 128, 16, truth_w, cand,
                                      win_chrom, win_wid)
    print(f"window stats: {coll.report()}", flush=True)

    # cap sweep: is the unmapped/unconcordant tail cap-limited?
    for probe_cap, kcap, budg in ((32, 16, 8), (64, 32, 16)):
        _, res2 = run_config(genome, reads, lengths,
                             opts_for(probe_cap, kcap, budg),
                             f"caps {probe_cap}/{kcap}/{budg}")
        m2 = [MapperRecord(i, int(res2.orientation[i]), genome.names[0],
                           int(res2.position[i]), int(res2.shift[i]),
                           READ_LEN) for i in range(n_reads)]
        st2 = compare_mappings(genome, truth, m2,
                               max_mismatches_between_regions=30)
        nm2 = int((res2.orientation != 3).sum())
        print(f"  -> concordant {st2.concordant()}/{nm2} mapped "
              f"(+{nm2 - n_mapped} mapped vs production)", flush=True)


if __name__ == "__main__":
    main()
