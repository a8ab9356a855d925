"""Multi-device coarse mapping: sharded index + data-parallel read streaming.

TPU-native re-expression of the reference's multi-GPU layer:

  * hash-table sharding over the "table" mesh axis mirrors
    MultiGpuMinhasher::Layout::EvenShare round-robining tables over GPUs
    (reference: include/gpu/multigpuminhasher.cuh:277-303); the reference's
    cudaMemcpyPeerAsync broadcast + partial-result merge (:650-755) becomes
    an implicit replicated query batch + jax.lax.all_gather over ICI;
  * read-batch sharding over the "data" mesh axis mirrors the read-storage
    row sharding of MultiGpu2dArray (multigpuarray.cuh:1315-1345);
  * the per-read best-hit merge stays device-local because each read's
    candidates are complete after the table all_gather.

The genome and window geometry are replicated (the per-host replication
fast path, like SingleGpuMinhasher::makeCopy, singlegpuminhasher.cuh:289);
genome-region sharding over a third axis is the planned path for
whole-GRCh38 indexes that exceed one device's HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ProgramOptions
from ..index import minhash_index as mi
from ..io.genome import Genome
from ..ops import minhash, shd
from ..pipeline.engine import CoarseMapper

SENTINEL = np.uint32(0xFFFFFFFF)


def make_mesh(data: int, table: int,
              devices: Optional[np.ndarray] = None) -> Mesh:
    if devices is None:
        devs = np.array(jax.devices()[:data * table]).reshape(data, table)
    else:
        devs = np.asarray(devices).reshape(data, table)
    return Mesh(devs, axis_names=("data", "table"))


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map
    kwargs = dict(mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    try:
        return shard_map(fn, check_vma=False, **kwargs)
    except TypeError:
        return shard_map(fn, check_rep=False, **kwargs)


class ShardedCoarseMapper:
    """Table-sharded, data-parallel coarse mapper over a 2D mesh."""

    def __init__(self, genome: Genome, opts: ProgramOptions, mesh: Mesh):
        self.mesh = mesh
        self.opts = opts
        n_table = mesh.shape["table"]
        # 3N mode doubles the table count (CT + GA key spaces, engine.py)
        self.n_tables = opts.num_hash_functions * (
            2 if opts.three_n_seeding else 1)
        assert self.n_tables % n_table == 0, (
            "table count must divide evenly over the table axis")
        # geometry only — the index is built per table shard below, so no
        # device ever stages the full table set (the reference's
        # MultiGpuMinhasher also inserts into each GPU's own tables,
        # multigpuminhasher.cuh:391-483; contrast the reference's staging-
        # free incremental build, gpuminhasherconstruction.cu:123-242)
        self.base = CoarseMapper(genome, opts, build_index=False)
        table_spec = NamedSharding(mesh, P("table"))
        repl = NamedSharding(mesh, P())
        self.keys, self.offsets, self.values, self.num_keys = \
            self._build_index_sharded()
        # cuckoo direct-probe shards (host-built from the shard keys, put
        # back with the table sharding — never staged whole on one device)
        self._use_cuckoo = False
        self.cuckoo_bits = 0
        self.cuckoo_seeds = (0, 0)
        built = None
        if opts.probe_cap < 1023:
            built = mi.build_cuckoo_arrays(
                np.asarray(self.keys), np.asarray(self.offsets),
                np.asarray(self.num_keys), int(self.values.shape[1]))
        if built is not None:
            ck, payload, bits, seeds = built
            self.cuckoo_keys = jax.device_put(ck, table_spec)
            self.cuckoo_payload = jax.device_put(payload, table_spec)
            self.cuckoo_bits = bits
            self.cuckoo_seeds = seeds
            self._use_cuckoo = True
        else:
            # shape placeholders keep the shard_map arity uniform
            dummy = np.zeros((self.n_tables, 2), dtype=np.uint32)
            self.cuckoo_keys = jax.device_put(dummy, table_spec)
            self.cuckoo_payload = jax.device_put(dummy, table_spec)
        self.genome_hi = jax.device_put(self.base.table.genome_hi, repl)
        self.genome_lo = jax.device_put(self.base.table.genome_lo, repl)
        self.win_pos = jax.device_put(self.base.table.win_pos, repl)
        self.win_chrom = jax.device_put(self.base.table.win_chrom, repl)
        self.chrom_offset = jax.device_put(self.base.table.chrom_offset, repl)
        self.chrom_len = jax.device_put(self.base.table.chrom_len, repl)
        self.hash_ids = jax.device_put(
            jnp.asarray(self.base.hash_ids), repl)
        f = self.n_tables
        self.dropped_keys = jax.device_put(
            jnp.full((f, 1), jnp.uint32(0xFFFFFFFF)), table_spec)
        self.dropped_num = jax.device_put(
            jnp.zeros((f,), dtype=jnp.int32), table_spec)
        self._step = self._build_step()

    def _build_index_sharded(self, sig_batch: int = 4096):
        """Per-shard device CSR build: the window stream is hashed in
        superbatches, signatures land column-sharded over the "table" axis,
        and each shard sorts/compacts ONLY its own tables under shard_map —
        the full index never exists on any single device.
        (Reference analog: per-GPU incremental inserts + local compaction,
        gpuminhasherconstruction.cu:123-242, singlegpuminhasher.cuh:380-526.)
        """
        opts = self.opts
        mesh = self.mesh
        col_sh = NamedSharding(mesh, P(None, "table"))
        repl = NamedSharding(mesh, P())
        hash_ids = jnp.arange(opts.num_hash_functions, dtype=jnp.uint32)

        from ..pipeline.engine import window_bases_device
        sig_parts, valid_parts = [], []
        for gstart, lens, n in self.base.iter_window_superbatch_starts(
                sig_batch):
            bdev = window_bases_device(
                self.base.table.genome_concat, jnp.asarray(gstart),
                opts.window_size)
            ldev = jnp.asarray(lens)
            if opts.three_n_seeding:
                s_ct, v = minhash.minhash_signatures_chunked(
                    jnp.where(bdev == 1, jnp.int8(3), bdev), ldev,
                    opts.kmer_length, hash_ids, sig_batch, canonical=False)
                s_ga, _ = minhash.minhash_signatures_chunked(
                    jnp.where(bdev == 2, jnp.int8(0), bdev), ldev,
                    opts.kmer_length, hash_ids, sig_batch, canonical=False)
                s = jnp.concatenate([s_ct, s_ga], axis=1)     # [n, 2F]
            else:
                s, v = minhash.minhash_signatures_chunked(
                    bdev, ldev, opts.kmer_length, hash_ids, sig_batch)
            # only this (bounded) superbatch is ever resident unsharded
            sig_parts.append(jax.device_put(s[:n], col_sh))
            valid_parts.append(jax.device_put(v[:n], repl))

        concat = jax.jit(lambda *xs: jnp.concatenate(xs, axis=0),
                         out_shardings=col_sh)
        concat_r = jax.jit(lambda *xs: jnp.concatenate(xs, axis=0),
                           out_shardings=repl)
        sigs = concat(*sig_parts) if len(sig_parts) > 1 else sig_parts[0]
        valid = (concat_r(*valid_parts) if len(valid_parts) > 1
                 else valid_parts[0])

        def build_local(sigs_local, valid_repl):
            return jax.vmap(mi._build_one_table_device,
                            in_axes=(1, None))(sigs_local, valid_repl)

        mapped = _shard_map(build_local, mesh,
                            in_specs=(P(None, "table"), P()),
                            out_specs=(P("table"),) * 4)
        return jax.jit(mapped)(sigs, valid)

    def index_memory_per_device(self) -> dict:
        """Bytes of index shard data per device (accounting hook for the
        no-full-index-staging invariant)."""
        out = {}
        for arr in (self.keys, self.offsets, self.values, self.num_keys):
            for s in arr.addressable_shards:
                d = str(s.device)
                out[d] = out.get(d, 0) + int(np.prod(s.data.shape)) * \
                    s.data.dtype.itemsize
        return out

    def set_read_drops(self, read_sigs: np.ndarray,
                       read_valid: np.ndarray) -> None:
        assert not self.opts.three_n_seeding, (
            "read-key-drop emulation is a parity-mode feature (the 3N index "
            "has no reference counterpart to emulate, see engine.map_reads)")
        dk, dn = mi.build_dropped_keys(
            read_sigs, read_valid, self.opts.max_results_per_map)
        table_spec = NamedSharding(self.mesh, P("table"))
        self.dropped_keys = jax.device_put(jnp.asarray(dk), table_spec)
        self.dropped_num = jax.device_put(jnp.asarray(dn), table_spec)
        self._step = self._build_step()  # dropped shapes may have changed

    def _build_step(self):
        opts = self.opts
        mesh = self.mesh

        def step(keys, offsets, values, num_keys, cuckoo_k, cuckoo_p,
                 dropped_keys, dropped_num,
                 genome_hi, genome_lo, win_pos, win_chrom, chrom_offset,
                 chrom_len, hash_ids, read_bases, read_len, read_valid):
            """Runs per (data, table) shard via shard_map."""
            b, lr = read_bases.shape
            kcap = opts.candidates_per_read_cap

            if opts.three_n_seeding:
                # CT sigs of the read + GA sigs of its RC (engine.py:259-270)
                from ..ops import encode
                read_ct = jnp.where(read_bases == 1, jnp.int8(3), read_bases)
                rc = encode.revcomp_bases(read_bases, read_len)
                rc_ga = jnp.where(rc == 2, jnp.int8(0), rc)
                sig_ct, sig_valid = minhash.minhash_signatures(
                    read_ct, read_len, opts.kmer_length, hash_ids,
                    canonical=False)
                sig_ga, _ = minhash.minhash_signatures(
                    rc_ga, read_len, opts.kmer_length, hash_ids,
                    canonical=False)
                sigs = jnp.concatenate([sig_ct, sig_ga], axis=1)   # [B, 2F]
            else:
                sigs, sig_valid = minhash.minhash_signatures(
                    read_bases, read_len, opts.kmer_length, hash_ids)
            sig_valid = sig_valid & read_valid

            # probe only the local tables with the matching sig columns
            n_table = jax.lax.axis_size("table")
            t_idx = jax.lax.axis_index("table")
            f_local = self.n_tables // n_table
            tail_budget = b * opts.probe_tail_budget_per_read
            cuckoo_kw = {}
            if self._use_cuckoo:
                cuckoo_kw = dict(cuckoo=(cuckoo_k, cuckoo_p),
                                 cuckoo_bits=self.cuckoo_bits,
                                 cuckoo_seeds=self.cuckoo_seeds)

            def probe_gather(sig_block):
                local_sigs = jax.lax.dynamic_slice_in_dim(
                    sig_block, t_idx * f_local, f_local, axis=1)
                if tail_budget > 0:
                    cl, nl, td = mi.probe_tables(
                        keys, offsets, values, num_keys, local_sigs,
                        sig_valid, opts.probe_cap,
                        dropped_keys=(dropped_keys, dropped_num),
                        fnc_layout=True, tail_budget=tail_budget,
                        **cuckoo_kw)
                else:
                    cl, nl = mi.probe_tables(
                        keys, offsets, values, num_keys, local_sigs,
                        sig_valid, opts.probe_cap,
                        dropped_keys=(dropped_keys, dropped_num),
                        fnc_layout=True, **cuckoo_kw)
                    td = jnp.int32(0)
                # merge per-table partials: the reference P2P-gathers
                # per-GPU counts/values (multigpuminhasher.cuh:740-907);
                # here one all_gather over ICI re-assembles [F, N, C]
                return (jax.lax.all_gather(cl, "table", axis=0, tiled=True),
                        jax.lax.all_gather(nl, "table", axis=0, tiled=True),
                        td)

            cand, counts, tail_drops = probe_gather(sigs)
            if opts.undirectional:
                # PBAT strands: mirrored query spaces vs the same tables
                # (engine.py's undirectional block, sharded)
                rc_ct = jnp.where(rc == 1, jnp.int8(3), rc)
                read_ga = jnp.where(read_bases == 2, jnp.int8(0),
                                    read_bases)
                sig_rcct, _ = minhash.minhash_signatures(
                    rc_ct, read_len, opts.kmer_length, hash_ids,
                    canonical=False)
                sig_rga, _ = minhash.minhash_signatures(
                    read_ga, read_len, opts.kmer_length, hash_ids,
                    canonical=False)
                sigs_u = jnp.concatenate([sig_rcct, sig_rga], axis=1)
                cand_u, counts_u, td_u = probe_gather(sigs_u)
                cand = jnp.concatenate([cand, cand_u], axis=0)
                counts = jnp.concatenate([counts, counts_u], axis=0)
                tail_drops = tail_drops + td_u

            ids, hit_cnt, num_kept = mi.vote_candidates_fnc_auto(
                cand, opts.min_table_hits, kcap)

            from ..pipeline.engine import coarse_pairs_best
            (out_ori32, out_ham, out_shift, out_chrom, out_pos, best_gwin,
             has, _ori, _strand, pair_drops) = coarse_pairs_best(
                ids, read_bases, read_len, opts, lr, genome_hi, genome_lo,
                win_pos, win_chrom, chrom_offset, chrom_len)
            out_ori = out_ori32.astype(jnp.int8)
            out_gwin = jnp.where(has, best_gwin.astype(jnp.uint32),
                                 jnp.uint32(0xFFFFFFFF))
            overflow = (jnp.sum(counts > opts.probe_cap)
                        + jnp.sum(num_kept > kcap) + pair_drops)
            # counts/num_kept/pair_drops are identical on every table shard
            # (computed from gathered data): the psum-mean keeps the output
            # replicated for shard_map's rep checking.  tail_drops is a
            # pre-gather per-shard quantity: a true psum.
            overflow = (jax.lax.psum(overflow, "table")
                        // jax.lax.axis_size("table")
                        + jax.lax.psum(tail_drops, "table"))
            return (out_ori, out_ham, out_shift, out_chrom, out_pos,
                    out_gwin, overflow)

        data_spec = P("data")
        table_spec = P("table")
        repl = P()
        mapped = _shard_map(
            step, mesh,
            in_specs=(table_spec, table_spec, table_spec, table_spec,
                      table_spec, table_spec, table_spec, table_spec,
                      repl, repl, repl, repl, repl, repl, repl,
                      data_spec, data_spec, data_spec),
            out_specs=(data_spec,) * 6 + (repl,))
        return jax.jit(mapped)

    def map_batch(self, read_bases: jnp.ndarray, read_len: jnp.ndarray,
                  read_valid: jnp.ndarray):
        return self._step(
            self.keys, self.offsets, self.values, self.num_keys,
            self.cuckoo_keys, self.cuckoo_payload,
            self.dropped_keys, self.dropped_num,
            self.genome_hi, self.genome_lo, self.win_pos, self.win_chrom,
            self.chrom_offset, self.chrom_len, self.hash_ids,
            read_bases, read_len, read_valid)

    def map_reads(self, read_bases: np.ndarray, read_lengths: np.ndarray):
        """Host driver over data-parallel batches (batch = batchsize *
        data-axis size rows)."""
        opts = self.opts
        n, lr = read_bases.shape
        if lr < opts.max_read_length:
            read_bases = np.pad(
                read_bases, ((0, 0), (0, opts.max_read_length - lr)))
        d = self.mesh.shape["data"]
        bsz = opts.batchsize * d
        data_sh = NamedSharding(self.mesh, P("data"))

        out_ori = np.full(n, shd.NONE, dtype=np.int8)
        out_ham = np.zeros(n, dtype=np.int32)
        out_shift = np.zeros(n, dtype=np.int32)
        out_chrom = np.zeros(n, dtype=np.int32)
        out_pos = np.zeros(n, dtype=np.int32)
        out_gwin = np.full(n, SENTINEL, dtype=np.uint32)
        overflow = 0
        for start in range(0, n, bsz):
            stop = min(start + bsz, n)
            nb = stop - start
            chunk = read_bases[start:stop]
            lens = read_lengths[start:stop]
            valid = np.ones(nb, dtype=bool)
            if nb < bsz:
                chunk = np.pad(chunk, ((0, bsz - nb), (0, 0)))
                lens = np.pad(lens, (0, bsz - nb))
                valid = np.pad(valid, (0, bsz - nb))
            args = [jax.device_put(jnp.asarray(x), data_sh)
                    for x in (chunk, lens, valid)]
            ori, ham, shf, chrom, pos, gwin, ovf = self.map_batch(*args)
            out_ori[start:stop] = np.asarray(ori)[:nb]
            out_ham[start:stop] = np.asarray(ham)[:nb]
            out_shift[start:stop] = np.asarray(shf)[:nb]
            out_chrom[start:stop] = np.asarray(chrom)[:nb]
            out_pos[start:stop] = np.asarray(pos)[:nb]
            out_gwin[start:stop] = np.asarray(gwin)[:nb]
            overflow += int(ovf)
        return (out_ori, out_ham, out_shift, out_chrom, out_pos, out_gwin,
                overflow)
