"""Batch-stream verb: JSONL output, manifest resume."""

import json

from coati_tpu.cli import main


def _pairs_fasta(tmp_path, n=6):
    lines = []
    for i in range(n):
        lines.append(f">anc{i}")
        lines.append("CTCTGGATAGTG")
        lines.append(f">des{i}")
        lines.append("CTATAGTG")
    p = tmp_path / "pairs.fasta"
    p.write_text("\n".join(lines) + "\n")
    return p


def test_batch_align(tmp_path):
    inp = _pairs_fasta(tmp_path)
    out = tmp_path / "out.jsonl"
    rc = main(["batch", str(inp), "-o", str(out)])
    assert rc == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 6
    for r in rows:
        aln = list(r["alignment"].values())
        assert aln == ["CTCTGGATAGTG", "CT----ATAGTG"]


def test_batch_resume(tmp_path):
    inp = _pairs_fasta(tmp_path, n=4)
    out = tmp_path / "out.jsonl"
    manifest = tmp_path / "manifest.txt"
    manifest.write_text("0\n2\n")  # pairs 0 and 2 already done
    rc = main(["batch", str(inp), "-o", str(out), "--manifest", str(manifest)])
    assert rc == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert sorted(r["pair"] for r in rows) == [1, 3]
    done = sorted(int(x) for x in manifest.read_text().split())
    assert done == [0, 1, 2, 3]


def test_batch_odd_count_fails(tmp_path):
    p = tmp_path / "pairs.fasta"
    p.write_text(">a\nAAA\n>b\nAAA\n>c\nAAA\n")
    assert main(["batch", str(p)]) == 1


def test_batch_bad_pair_reported(tmp_path):
    # ancestor with ambiguous nucleotide -> error row, but stream continues
    p = tmp_path / "pairs.fasta"
    p.write_text(">a\nAAN\n>b\nAAA\n>c\nCTCTGGATAGTG\n>d\nCTATAGTG\n")
    out = tmp_path / "out.jsonl"
    assert main(["batch", str(p), "-o", str(out)]) == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert "error" in rows[0]
    assert rows[1]["alignment"]

def test_batch_triplet_models(tmp_path):
    """Triplet models route the batch stream through the codon-context
    device path; results match the per-pair triplet engine."""
    inp = _pairs_fasta(tmp_path, n=4)
    out = tmp_path / "out.jsonl"
    rc = main(["batch", str(inp), "-o", str(out), "-m", "tri-mg"])
    assert rc == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(rows) == 4
    import pytest

    for r in rows:
        aln = list(r["alignment"].values())
        assert aln == ["CTCTGGATAGTG", "CT----ATAGTG"]
        assert r["score"] == pytest.approx(9.316000938, abs=2e-3)


def test_batch_triplet_bad_anc_reported(tmp_path):
    # %3 violation and early stop codon -> per-pair error rows, stream goes on
    p = tmp_path / "pairs.fasta"
    p.write_text(
        ">a\nAAAA\n>b\nAAA\n"
        ">c\nTAAAAA\n>d\nAAA\n"
        ">e\nCTCTGGATAGTG\n>f\nCTATAGTG\n"
    )
    out = tmp_path / "out.jsonl"
    assert main(["batch", str(p), "-o", str(out), "-m", "dna"]) == 0
    rows = [json.loads(l) for l in out.read_text().splitlines()]
    assert "multiple of 3" in rows[0]["error"]
    assert "stop codon" in rows[1]["error"]
    assert rows[2]["alignment"]


def test_batch_multihost_single_process(tmp_path):
    """--multihost on one process: jax.distributed init degrades to no-op,
    the shard is the whole stream, outputs get the process-index suffix."""
    inp = _pairs_fasta(tmp_path, n=4)
    out = tmp_path / "out.jsonl"
    rc = main(["batch", str(inp), "-o", str(out), "--multihost"])
    assert rc == 0
    sharded = tmp_path / "out.jsonl.0"
    assert sharded.exists()
    rows = [json.loads(l) for l in sharded.read_text().splitlines()]
    assert len(rows) == 4
