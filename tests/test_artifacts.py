"""Artifact caching: binary reads, window-index save/load, PE interleave."""

import random

import numpy as np

from hashreadmapper_tpu.config import ProgramOptions
from hashreadmapper_tpu.cpu import oracle
from hashreadmapper_tpu.io import fastx
from hashreadmapper_tpu.io.genome import Genome
from hashreadmapper_tpu.io.readstore import ReadStorage
from hashreadmapper_tpu.pipeline.engine import CoarseMapper


def test_index_save_load_roundtrip(tmp_path):
    rng = random.Random(1)
    chrom = "".join(rng.choice("ACGT") for _ in range(1500))
    genome = Genome(["c"], [chrom])
    opts = ProgramOptions(
        kmer_length=12, num_hash_functions=8, window_size=64,
        min_table_hits=2, batchsize=16, probe_cap=32,
        candidates_per_read_cap=16, max_read_length=32)
    m1 = CoarseMapper(genome, opts)
    path = str(tmp_path / "index.npz")
    m1.save_index(path)

    m2 = CoarseMapper(genome, opts, load_index_from=path)
    reads = []
    for _ in range(20):
        s = rng.randrange(1470)
        reads.append(oracle.encode_bases(chrom[s:s + 30]))
    bases = np.zeros((20, 32), dtype=np.int8)
    lens = np.zeros(20, dtype=np.int32)
    for i, r in enumerate(reads):
        bases[i, :len(r)] = r
        lens[i] = len(r)
    r1 = m1.map_reads(bases.copy(), lens.copy())
    r2 = m2.map_reads(bases.copy(), lens.copy())
    np.testing.assert_array_equal(r1.orientation, r2.orientation)
    np.testing.assert_array_equal(r1.position, r2.position)


def test_paired_end_interleave(tmp_path):
    f1 = tmp_path / "r1.fq"
    f2 = tmp_path / "r2.fq"
    fastx.write_fastq(str(f1), [fastx.SequenceRecord(f"a{i}", "", "ACGT")
                                for i in range(3)])
    fastx.write_fastq(str(f2), [fastx.SequenceRecord(f"b{i}", "", "TTTT")
                                for i in range(3)])
    store = ReadStorage.from_files([str(f1), str(f2)], paired=True,
                                   keep_names=True, use_native=False)
    assert store.num_reads == 6
    assert store.names == ["a0", "b0", "a1", "b1", "a2", "b2"]
    assert store.get_sequence_str(0) == "ACGT"
    assert store.get_sequence_str(1) == "TTTT"


def test_native_vs_python_ingest(tmp_path):
    from hashreadmapper_tpu import native
    if not native.available():
        return
    rng = random.Random(3)
    path = tmp_path / "reads.fq"
    recs = []
    for i in range(50):
        seq = "".join(rng.choice("ACGTN") for _ in range(rng.randint(10, 60)))
        recs.append(fastx.SequenceRecord(f"r{i}", "", seq))
    fastx.write_fastq(str(path), recs)
    a = ReadStorage.from_files([str(path)], use_native=True)
    b = ReadStorage.from_files([str(path)], use_native=False)
    assert a.num_reads == b.num_reads
    assert (a.lengths == b.lengths).all()
    assert (a.packed == b.packed).all()
    assert (a.ambiguous == b.ambiguous).all()


def test_cli_end_to_end(tmp_path):
    import subprocess, sys, os
    rng = random.Random(8)
    chrom = "".join(rng.choice("ACGT") for _ in range(1200))
    (tmp_path / "g.fa").write_text(f">c1\n{chrom}\n")
    reads = []
    for i in range(10):
        s = rng.randrange(1100)
        reads.append(f"@q{i}\n{chrom[s:s+60]}\n+\n{'I'*60}")
    (tmp_path / "r.fq").write_text("\n".join(reads) + "\n")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "from hashreadmapper_tpu.cli import main; main()",
         "--genomefile", str(tmp_path / "g.fa"),
         "-i", str(tmp_path / "r.fq"),
         "-o", str(tmp_path / "out"),
         "--maxReadLength", "64", "--batchsize", "16"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    sam = (tmp_path / "out.SAM").read_text()
    assert sam.startswith("@HD\tVN:1.4\n")
    assert (tmp_path / "out.VCF").exists()
