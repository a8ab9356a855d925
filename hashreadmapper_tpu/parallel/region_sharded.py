"""Genome-region sharding: each device indexes a slice of the genome.

The scaling mode for genomes whose window index exceeds one device's HBM
(whole GRCh38: ~27.5M windows x 16 tables).  Chromosomes are binned into
regions (balanced greedy by length); every device builds/holds the window
index of ITS region only, read batches are replicated across regions, and
the global best hit per read is the lexicographic minimum over
(hamming, global window id) — an associative, deterministic reduce, so
results are independent of the region count (SURVEY.md §5 "multi-host merge
semantics" requirement) and EQUAL to the single-device engine's (binning
whole chromosomes keeps every window's sequence, signature, and extension
clamping bit-identical).

This realizes the reference's genome-streaming axis (SURVEY.md §2.3 last
row) as a partition instead of a stream; communication is one small
per-read-result merge per batch instead of the reference's per-batch P2P
candidate broadcasts.  Intra-chromosome cuts (for genomes dominated by one
chromosome) additionally need read-length margins at the cut points —
planned, see PERF.md.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import numpy as np

from ..config import ProgramOptions
from ..io.genome import Genome
from ..pipeline.engine import CoarseMapper, CoarseResults, SENTINEL
from ..ops import shd


def bin_chromosomes(genome: Genome, n_regions: int) -> List[List[int]]:
    """Balanced greedy binning of chromosome ids by length."""
    order = sorted(range(genome.num_chromosomes),
                   key=lambda c: -genome.chromosome_length(c))
    loads = [0] * n_regions
    bins: List[List[int]] = [[] for _ in range(n_regions)]
    for c in order:
        r = min(range(n_regions), key=lambda i: loads[i])
        bins[r].append(c)
        loads[r] += genome.chromosome_length(c)
    for b in bins:
        b.sort()  # keep genome order within a region
    return bins


class RegionShardedMapper:
    """One CoarseMapper per region + deterministic cross-region merge.

    Per-region mappers are placed on distinct devices via
    jax.default_device; the merge is a pure argmin reduction (host-side
    here; its collective form over a "region" mesh axis is a drop-in for
    multi-host pods)."""

    def __init__(self, genome: Genome, opts: ProgramOptions, n_regions: int,
                 devices=None):
        assert n_regions <= genome.num_chromosomes, (
            "region sharding bins whole chromosomes; use fewer regions "
            "than chromosomes (intra-chromosome cuts are planned)")
        self.opts = opts
        self.genome = genome
        self.n_regions = n_regions
        devs = (jax.devices()[:n_regions] if devices is None else devices)
        assert len(devs) >= n_regions
        self.bins = bin_chromosomes(genome, n_regions)

        # global window-ordinal offset of each chromosome
        self.chrom_gwin_base = np.zeros(genome.num_chromosomes, dtype=np.int64)
        t = 0
        for c in range(genome.num_chromosomes):
            self.chrom_gwin_base[c] = t
            t += genome.num_windows_in_chromosome(
                c, opts.kmer_length, opts.window_size)

        self.mappers = []
        for r, chroms in enumerate(self.bins):
            sub = Genome([genome.names[c] for c in chroms],
                         [genome.sequence_str(c) for c in chroms])
            with jax.default_device(devs[r]):
                self.mappers.append((CoarseMapper(sub, opts), chroms, sub))

    def map_reads(self, read_bases: np.ndarray,
                  read_lengths: np.ndarray) -> CoarseResults:
        opts = self.opts
        n = len(read_lengths)
        out = CoarseResults(
            orientation=np.full(n, shd.NONE, dtype=np.int8),
            hamming=np.zeros(n, dtype=np.int32),
            shift=np.zeros(n, dtype=np.int32),
            chromosome_id=np.zeros(n, dtype=np.int32),
            position=np.zeros(n, dtype=np.int32),
            global_window_id=np.full(n, SENTINEL, dtype=np.uint32),
            stats={"probe_overflow": 0, "vote_overflow": 0})
        best_key = np.full(n, 2**62, dtype=np.int64)

        # phase 1: ENQUEUE every region's device work without any host
        # sync — async dispatch lets each region's device queue execute
        # concurrently (replaces the serial per-region loop; reference
        # analog: per-GPU private streams, multigpuminhasher.cuh:641-738)
        pending = []
        for mapper, chroms, sub in self.mappers:
            mapper.ensure_empty_drops()
            all_bases, all_lens, all_valid, n_pad = \
                mapper.stage_reads_device(read_bases, read_lengths)
            packed_dev, ovf_dev, _ = mapper._map_reads_device(
                all_bases, all_lens, all_valid, n_pad, opts.batchsize)
            pending.append((packed_dev, ovf_dev, chroms, sub))

        # phase 2: fetch per-region results (device work already done or
        # in flight) and merge by the deterministic (hamming, global
        # window ordinal) key
        for packed_dev, ovf_dev, chroms, sub in pending:
            packed = np.asarray(packed_dev)[:n]
            ovf = np.asarray(ovf_dev)
            out.stats["probe_overflow"] += int(ovf[0])
            out.stats["vote_overflow"] += int(ovf[1])
            ori = packed[:, 0].astype(np.int8)
            ham = packed[:, 1]
            shift = packed[:, 2]
            lc = packed[:, 3]
            pos = packed[:, 4]
            gwin_local = packed[:, 5]
            mapped = ori != shd.NONE
            chrom_map = np.array(chroms, dtype=np.int32)
            # local global_window_id -> genome-global window ordinal
            sub_bases = np.zeros(sub.num_chromosomes + 1, dtype=np.int64)
            for i in range(sub.num_chromosomes):
                sub_bases[i + 1] = sub_bases[i] + \
                    sub.num_windows_in_chromosome(
                        i, opts.kmer_length, opts.window_size)
            local_in_chrom = np.where(
                mapped, gwin_local.astype(np.int64) - sub_bases[lc], 0)
            gwin_global = np.where(
                mapped,
                self.chrom_gwin_base[chrom_map[lc]] + local_in_chrom, 2**62)
            key = np.where(mapped,
                           (ham.astype(np.int64) << 40) + gwin_global,
                           2**62)
            better = key < best_key
            best_key = np.where(better, key, best_key)
            out.orientation[better] = ori[better]
            out.hamming[better] = ham[better]
            out.shift[better] = shift[better]
            out.position[better] = pos[better]
            out.chromosome_id[better] = chrom_map[lc][better]
            out.global_window_id[better] = gwin_global[better].astype(
                np.uint32)
        return out
