"""Checkpoint/resume: an interrupted chunked run resumed with --resume
produces byte-identical outputs to an uninterrupted run."""

import os

import numpy as np
import pytest

from kslam_tpu import cli
from kslam_tpu.io import fastq
from kslam_tpu.pipeline.checkpoint import RunCheckpoint


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ck")
    rng = np.random.default_rng(13)
    bases4 = "ACGT"
    genomes = {f"G{i}": "".join(rng.choice(list(bases4), 600))
               for i in range(2)}
    fa = tmp / "db.fasta"
    fa.write_text("".join(f">{n}\n{s}\n" for n, s in genomes.items()))
    r1 = tmp / "r1.fq"
    with open(r1, "w") as f:
        names = list(genomes)
        for i in range(24):
            g = genomes[names[i % 2]]
            pos = int(rng.integers(0, 600 - 150))
            f.write(f"@read{i}\n{g[pos:pos+150]}\n+\n{'I'*150}\n")
    db = tmp / "DB"
    cli.main(["--parse-fasta", "--output-file", str(db), str(fa)])
    return tmp, str(db), str(r1)


def _run(dataset, out_name, chunks, resume=False):
    tmp, db, r1 = dataset
    out = tmp / out_name
    sam = tmp / (out_name + ".sam")
    args = ["--db", db, "--output-file", str(out), "--sam-file", str(sam),
            "--just-align", "--num-reads-at-once", "8", str(r1)]
    if resume:
        args.append("--resume")
    if chunks is not None:
        args += ["--num-reads", str(chunks * 8)]
    cli.main(args)
    return sam


def test_resume_matches_uninterrupted(dataset, monkeypatch):
    tmp, db, r1 = dataset
    full_sam = _run(dataset, "full", None)
    # interrupt: crash inside the 3rd chunk (after 2 checkpointed chunks)
    from kslam_tpu.pipeline import run as run_mod
    real = run_mod.process_batch
    calls = {"n": 0}

    def crashing(batch, dbo, config):
        calls["n"] += 1
        if calls["n"] == 3:
            raise KeyboardInterrupt("simulated crash")
        return real(batch, dbo, config)

    monkeypatch.setattr(run_mod, "process_batch", crashing)
    part_out = tmp / "part"
    part_sam = tmp / "part.sam"
    args = ["--db", db, "--output-file", str(part_out), "--sam-file",
            str(part_sam), "--just-align", "--num-reads-at-once", "8",
            "--resume", str(r1)]
    with pytest.raises(KeyboardInterrupt):
        cli.main(args)
    ck = RunCheckpoint(str(part_out))
    assert os.path.exists(ck.cursor_path)
    monkeypatch.setattr(run_mod, "process_batch", real)
    cli.main(args)  # resume finishes the remaining chunk
    assert not os.path.exists(ck.cursor_path)  # cleared on completion

    def body(p):  # drop @PG (command lines differ)
        return [l for l in open(p) if not l.startswith("@PG")]
    assert body(part_sam) == body(full_sam)


def test_skip_reads_python_path(dataset):
    tmp, db, r1 = dataset
    full = list(fastq.stream_read_batches(r1, None, 100, pad_len=None))
    skipped = list(fastq.stream_read_batches(r1, None, 100, pad_len=None,
                                             skip_reads=10))
    assert list(skipped[0].names) == list(full[0].names)[10:]


def test_skip_reads_native_path(dataset):
    from kslam_tpu.io import native
    if not native.available():
        pytest.skip("native lib absent")
    tmp, db, r1 = dataset
    full = list(fastq.stream_read_batches_native(r1, None, 100, pad_len=160))
    skipped = list(fastq.stream_read_batches_native(r1, None, 100,
                                                    pad_len=160,
                                                    skip_reads=10))
    assert list(skipped[0].names) == list(full[0].names)[10:]
