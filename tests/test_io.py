"""I/O codec byte-format tests (fasta.cc / phylip.cc / json.cc / io.cc)."""

import io

import pytest

from coati_tpu.io.fasta import read_fasta, write_fasta
from coati_tpu.io.iodispatch import extract_file_type
from coati_tpu.io.jsonio import read_json, write_json, write_json_sample
from coati_tpu.io.phylip import read_phylip, write_phylip
from coati_tpu.structs import SeqData


def test_read_fasta():
    src = "; comment line\n>1\nCTCTGGATAGTC\n>2\nCTATAGTC\n"
    d = read_fasta(io.StringIO(src))
    assert d.names == ["1", "2"]
    assert d.seqs == ["CTCTGGATAGTC", "CTATAGTC"]


def test_read_fasta_multiline_and_spaces():
    src = ">a\nAC GT\nACGT\n\n>b\nAAAA\n"
    d = read_fasta(io.StringIO(src))
    assert d.seqs == ["ACGTACGT", "AAAA"]


def test_read_fasta_unnamed_fails():
    with pytest.raises(ValueError):
        read_fasta(io.StringIO(">\nACGT\n"))


def test_write_fasta_wraps_at_60():
    seq = "ACGT" * 26  # 104 nt
    d = SeqData(names=["anc", "des"], seqs=[seq, seq])
    out = io.StringIO()
    write_fasta(d, out)
    lines = out.getvalue().splitlines()
    assert lines[0] == ">anc"
    assert len(lines[1]) == 60
    assert len(lines[2]) == 44
    assert lines[3] == ">des"


def test_phylip_roundtrip():
    d = SeqData(names=["tx_1", "taxa_2"],
                seqs=["CTCTGGATAGTG", "CT----ATAGTG"])
    out = io.StringIO()
    write_phylip(d, out)
    text = out.getvalue()
    assert text.startswith("2 12\n")
    assert "tx_1      CTCTGGATAGTG" in text
    assert "taxa_2    CT----ATAGTG" in text
    back = read_phylip(io.StringIO(text))
    assert back.names == ["tx_1", "taxa_2"]
    assert back.seqs == d.seqs


def test_phylip_long_interleaved():
    seq = "ACGT" * 26  # 104
    d = SeqData(names=["anc", "des"], seqs=[seq, seq])
    out = io.StringIO()
    write_phylip(d, out)
    lines = out.getvalue().splitlines()
    assert lines[0] == "2 104"
    assert lines[1] == "anc       " + seq[:50]
    assert lines[2] == "des       " + seq[:50]
    assert lines[3] == ""
    assert lines[4] == seq[50:110]
    back = read_phylip(io.StringIO(out.getvalue()))
    assert back.seqs == [seq, seq]


def test_phylip_name_truncation():
    src = "2 12\ntest-sequeCTCTGGATAGTC\n2         CTCTGGATAGTC\n"
    d = read_phylip(io.StringIO(src))
    assert d.names == ["test-seque", "2"]
    assert d.seqs[0] == "CTCTGGATAGTC"


def test_json_exact_bytes():
    d = SeqData(names=["a", "b"],
                seqs=["ATGTCTTCTCACAAGACA", "ATGTCTTCTCACAAGACA"])
    out = io.StringIO()
    write_json(d, out)
    assert out.getvalue() == (
        '{\n  "alignment": {\n    "a": "ATGTCTTCTCACAAGACA",\n'
        '    "b": "ATGTCTTCTCACAAGACA"\n  },\n  "score": 0.0\n}\n'
    )


def test_json_score_float32_repr():
    import numpy as np

    d = SeqData(names=["x"], seqs=["AAA"], score=float(np.float32(9.316001)))
    out = io.StringIO()
    write_json(d, out)
    assert '"score": 9.316000938415527' in out.getvalue()


def test_json_read():
    src = '{\n  "alignment": {\n    "anc": "CTC",\n    "des": "CTA"\n  },\n  "score": 0.1\n}\n'
    d = read_json(io.StringIO(src))
    assert d.names == ["anc", "des"]
    assert d.seqs == ["CTC", "CTA"]
    assert d.score == pytest.approx(0.1)


def test_json_sample_stream():
    d = SeqData(names=["a"], seqs=["AAA"])
    out = io.StringIO()
    write_json_sample(d, out, 0, 2)
    write_json_sample(d, out, 1, 2)
    text = out.getvalue()
    assert text.startswith("[\n{")
    assert text.endswith("}\n]\n")
    assert "},\n{" in text


def test_extract_file_type():
    """utils.cc:649-676 table."""
    cases = [
        ("foo.bar", ("foo.bar", ".bar")),
        ("my:foo.bar", ("foo.bar", ".my")),
        (".bar", (".bar", "")),
        (".", (".", "")),
        ("..", ("..", "")),
        ("my:.foo.bar", (".foo.bar", ".my")),
        (".foo.bar", (".foo.bar", ".bar")),
        ("", ("", "")),
        ("foo:-", ("-", ".foo")),
        ("foo:bar", ("bar", ".foo")),
        ("bar:", ("", ".bar")),
        ("c:foo.bar", ("c:foo.bar", ".bar")),
        (" \f\n\r\t\vfoo.bar \f\n\r\t\v", ("foo.bar", ".bar")),
        (" \f\n\r\t\vmy:foo.bar \f\n\r\t\v", ("foo.bar", ".my")),
        (" \f\n\r\t\v.bar \f\n\r\t\v", (".bar", "")),
        (" \f\n\r\t\v", ("", "")),
    ]
    for spec, (path, ext) in cases:
        ft = extract_file_type(spec)
        assert (ft.path, ft.type_ext) == (path, ext), spec
