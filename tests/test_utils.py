"""Pre/post-processing tests (utils.cc trim/restore/process/encode cases)."""

import numpy as np
import pytest

from coati_tpu.structs import AlignmentParams, GapParams, SeqData
from coati_tpu.utils import (
    encode_marginal,
    process_marginal,
    restore_end_stops,
    trim_end_stops,
)


def test_marginal_seq_encoding():
    """utils.cc:532-586 expected encodings."""
    anc = "AAAGGGTTTCCCACTAGA"
    des = "ACGTRYMKSWBDHVN-"
    a, b = encode_marginal(anc, des)
    assert list(a) == [0, 1, 2, 126, 127, 128, 180, 181, 182,
                       63, 64, 65, 21, 22, 23, 24, 25, 26]
    assert list(b) == list(range(16))

    for bad in ("AAACCCGGN", "AAACCCGGR", "YAACCCGGG",
                "AAATAA", "AAATAGGCC", "TGA"):
        with pytest.raises(ValueError):
            encode_marginal(bad, des)


def _trim_case(raw, exp_seqs, exp_stops):
    data = SeqData(names=["n"] * len(raw), seqs=list(raw))
    trim_end_stops(data)
    assert data.seqs == exp_seqs
    assert data.stops == exp_stops


def test_trim_end_stops():
    """utils.cc:971-1029 table."""
    _trim_case(["AAA", "CCC"], ["AAA", "CCC"], ["", ""])
    _trim_case(["AAATAA", "AAATTT"], ["AAA", "AAATTT"], ["TAA", ""])
    _trim_case(["AAATTT", "AAATAG"], ["AAATTT", "AAA"], ["", "TAG"])
    _trim_case(["AAATGA", "AAAuga"], ["AAA", "AAA"], ["TGA", "uga"])
    _trim_case(["AAATAA", "AAATAG"], ["AAA", "AAA"], ["TAA", "TAG"])
    _trim_case(["AAA", "C"], ["AAA", "C"], ["", ""])
    _trim_case(["AAATGA", "C"], ["AAA", "C"], ["TGA", ""])
    _trim_case(["AAA", "ctaa"], ["AAA", "c"], ["", "taa"])


def _restore_case(seqs, stops, expected):
    data = SeqData(names=["a", "b"], seqs=list(seqs), stops=list(stops))
    restore_end_stops(data, GapParams())
    assert data.seqs == expected


def test_restore_end_stops():
    """utils.cc:1067-1094 table."""
    _restore_case(["AAA", "AAA"], ["TAA", "TAA"], ["AAATAA", "AAATAA"])
    _restore_case(["", ""], ["TAA", "TAA"], ["TAA", "TAA"])
    _restore_case(["CGA", "CGA"], ["", ""], ["CGA", "CGA"])
    _restore_case(["CTA", "CTA"], ["TAG", "TGA"], ["CTATAG", "CTATGA"])
    _restore_case(["TGC", "TGC"], ["", "TAA"], ["TGC---", "TGCTAA"])
    _restore_case(["TGC---", "TGCCAC"], ["", "TAA"], ["TGC------", "TGCCACTAA"])
    _restore_case(["CGG", "CGG"], ["TAG", ""], ["CGGTAG", "CGG---"])

    data = SeqData(stops=[""])
    with pytest.raises(RuntimeError):
        restore_end_stops(data, GapParams())


def test_restore_adds_gap_score():
    data = SeqData(names=["a", "b"], seqs=["TGC", "TGC"], stops=["", "TAA"],
                   score=1.0)
    gap = GapParams()
    restore_end_stops(data, gap)
    expect = 1.0 + float(np.log(np.float32(gap.open) * np.float32(gap.extend)
                                * np.float32(gap.extend)))
    assert data.score == pytest.approx(expect, abs=1e-5)


def test_process_marginal_validation():
    aln = AlignmentParams()
    aln.data = SeqData(names=["1"], seqs=["AAA"])
    with pytest.raises(ValueError):
        process_marginal(aln)

    aln = AlignmentParams()
    aln.data = SeqData(names=["1", "2"], seqs=["AAAA", "AAA"])
    with pytest.raises(ValueError):
        process_marginal(aln)

    aln = AlignmentParams()
    aln.gap = GapParams(len=3)
    aln.data = SeqData(names=["1", "2"], seqs=["AAAAAA", "AAAAA"])
    with pytest.raises(ValueError):
        process_marginal(aln)


def test_order_ref():
    aln = AlignmentParams()
    aln.refs = "2"
    aln.data = SeqData(names=["1", "2"], seqs=["AAA", "CCC"])
    process_marginal(aln)
    assert aln.data.names == ["2", "1"]
    assert aln.data.seqs == ["CCC", "AAA"]

    aln = AlignmentParams()
    aln.refs = "zzz"
    aln.data = SeqData(names=["1", "2"], seqs=["AAA", "CCC"])
    with pytest.raises(ValueError):
        process_marginal(aln)
