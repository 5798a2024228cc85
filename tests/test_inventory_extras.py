"""Remaining reference test-inventory cases not covered elsewhere:
parse_matrix_csv (io.cc:92-174), read_newick (tree.cc:137-162),
find_seq/find_node error paths."""

import numpy as np
import pytest

from coati_tpu.io.matrix_csv import parse_matrix_csv
from coati_tpu.msa import tree as treemod
from coati_tpu.structs import SeqData


def test_parse_matrix_csv_roundtrip(tmp_path):
    from coati_tpu.constants import CODONS61
    from coati_tpu.models import mg94_p, mg94_q

    q, d = mg94_q(0.2, (0.308, 0.185, 0.199, 0.308))
    q = q / d
    lines = ["0.0133"]
    for i in range(61):
        for j in range(61):
            lines.append(f"{CODONS61[i]},{CODONS61[j]},{q[i, j]:.12g}")
    path = tmp_path / "m.csv"
    path.write_text("\n".join(lines) + "\n")

    p = parse_matrix_csv(str(path))
    expect = mg94_p(0.0133, 0.2, (0.308, 0.185, 0.199, 0.308))
    np.testing.assert_allclose(p, expect, rtol=1e-6, atol=1e-10)


def test_parse_matrix_csv_errors(tmp_path):
    with pytest.raises(ValueError):
        parse_matrix_csv(str(tmp_path / "missing.csv"))

    # wrong number of lines
    path = tmp_path / "short.csv"
    path.write_text("0.0133\nAAA,AAA,0.5\n")
    with pytest.raises(ValueError):
        parse_matrix_csv(str(path))


def test_read_newick(tmp_path):
    p = tmp_path / "t.newick"
    p.write_text("(B_b:6.0,(A-a:5.0,C/c:3.0,E.e:4.0)Ancestor:5.0);\n")
    assert treemod.read_newick(str(p)).startswith("(B_b:6.0")

    empty = tmp_path / "empty.newick"
    empty.write_text("")
    with pytest.raises(ValueError):
        treemod.read_newick(str(empty))
    with pytest.raises(ValueError):
        treemod.read_newick(str(tmp_path / "nope.newick"))


def test_find_seq_and_node():
    data = SeqData(names=["A", "B"], seqs=["AAA", "CCC"])
    assert treemod.find_seq("B", data) == "CCC"
    with pytest.raises(ValueError):
        treemod.find_seq("Z", data)

    t = treemod.parse_newick("(A:1,B:2);")
    assert treemod.find_node(t, "B") == 2
    with pytest.raises(ValueError):
        treemod.find_node(t, "Z")
