"""MSA tests: tree parsing, insertion merging, and the end-to-end verb
(mirrors reference tree.cc / insertions.cc / align_msa.cc TEST_CASEs)."""

import pytest

from coati_tpu.cli import main
from coati_tpu.msa import tree as treemod
from coati_tpu.msa.insertions import (
    OPEN,
    CLOSED,
    InsertionData,
    InsVector,
    add_gap,
    insertion_flags,
    merge_indels,
)


def test_parse_newick_flat_layout():
    """tree.cc:196-236 layout."""
    t = treemod.parse_newick(
        "(B_b:6.0,(A-a:5.0,C/c:3.0,E.e:4.0)Ancestor:5.0,D%:11.0);"
    )
    assert len(t) == 7
    labels = [n.label for n in t]
    assert labels == ["", "B_b", "Ancestor", "A-a", "C/c", "E.e", "D%"]
    assert [n.parent for n in t] == [0, 0, 0, 2, 2, 2, 0]
    assert [n.is_leaf for n in t] == [False, True, False, True, True, True, True]
    assert [n.length for n in t] == [0, 6, 5, 5, 3, 4, 11]


def test_parse_newick_empty_fails():
    with pytest.raises(RuntimeError):
        treemod.parse_newick("")


def test_reroot_simple():
    """tree.cc:366-392."""
    t = treemod.parse_newick(
        "(B_b:6.0,(A-a:5.0,C/c:3.0,E.e:4.0)Ancestor:5.0,D%:11.0);"
    )
    treemod.reroot(t, "A-a")
    assert t[0].parent == 2 and t[0].length == 5
    assert t[2].parent == 2 and t[2].length == 0
    assert t[1].parent == 0 and t[1].length == 6


def test_distance_ref():
    """tree.cc:457-482."""
    nwk = ("((raccoon:19.2,bear:6.8):0.8,((sea_lion:12.0,seal:12.0):7.5,"
           "((monkey:100.9,cat:47.1):20.6,weasel:18.9):2.1):3.9,dog:25.5);")
    t = treemod.parse_newick(nwk)
    dog = treemod.find_node(t, "dog")
    assert treemod.distance_ref(t, dog, treemod.find_node(t, "raccoon")) == \
        pytest.approx(45.5, abs=0.1)
    assert treemod.distance_ref(t, dog, treemod.find_node(t, "sea_lion")) == \
        pytest.approx(48.9, abs=0.1)
    assert treemod.distance_ref(t, dog, treemod.find_node(t, "cat")) == \
        pytest.approx(99.2, abs=0.1)


def test_insertion_flags():
    """insertions.cc:64-77."""
    with pytest.raises(RuntimeError):
        insertion_flags("TCA-TC", "TCAGTCG")
    ins = insertion_flags("TCA-TC-", "TCAGTCG")
    assert ins.nonzeros() == 2
    assert ins.get(3) == OPEN
    assert ins.get(6) == OPEN


def test_add_gap_three_groups():
    """insertions.cc:443-463."""
    insA, insB, insC = InsVector(14), InsVector(14), InsVector(14)
    insC.set(1, OPEN)
    data = [
        InsertionData.single("TCATCG", "A", insA),
        InsertionData.single("TCAGTCG", "B", insB),
        InsertionData.single("TTCATCG", "C", insC),
    ]
    add_gap(data, [2], 1)
    assert data[0].sequences[0] == "T-CATCG"
    assert data[0].insertions.get(1) == CLOSED
    assert data[1].sequences[0] == "T-CAGTCG"
    assert data[1].insertions.get(1) == CLOSED
    assert data[2].sequences[0] == "TTCATCG"
    assert data[2].insertions.get(1) == CLOSED


def test_add_gap_shift():
    """insertions.cc:487-513: shifting preserves later open flags."""
    insABC, insD = InsVector(14), InsVector(14)
    insABC.set(3, CLOSED)
    insABC.set(6, OPEN)
    insD.set(3, OPEN)
    insD.set(6, OPEN)
    data = [
        InsertionData(["TCA-TCG", "TCAGTCG", "T-A-TCG"], ["A", "B", "C"], insABC),
        InsertionData.single("TCACTCG", "D", insD),
    ]
    add_gap(data, [0], 3)
    assert data[0].sequences == ["TCA-TCG", "TCAGTCG", "T-A-TCG"]
    assert data[0].insertions.get(3) == CLOSED
    assert data[1].sequences[0] == "TCA-CTCG"
    assert data[1].insertions.get(3) == CLOSED
    assert data[1].insertions.get(4) == OPEN
    assert data[1].insertions.get(7) == OPEN


def test_merge_indels_two_groups():
    """insertions.cc:235-... two seqs, two insertion vectors."""
    insA, insB = InsVector(14), InsVector(14)
    insA.set(5, OPEN)
    insB.set(3, OPEN)
    insB.set(6, OPEN)
    data = [
        InsertionData.single("TCATCG", "A", insA),
        InsertionData.single("TCAGTCG", "B", insB),
    ]
    merged = merge_indels(data)
    assert merged.names == ["A", "B"]
    assert len(merged.sequences[0]) == len(merged.sequences[1])


def test_merge_indels_single_group_fails():
    with pytest.raises(RuntimeError):
        merge_indels([InsertionData.single("AAA", "A", InsVector(6))])


# --- end-to-end msa verb (align_msa.cc:122-269) -----------------------------
MSA_FASTA = ">A\nTCATCG\n>B\nTCAGTCG\n>C\nTATCG\n>D\nTCACTCG\n>E\nTCATC\n"
MSA_EXPECT = {
    "A": "TCA--TCG",
    "B": "TCA-GTCG",
    "C": "T-A--TCG",
    "D": "TCAC-TCG",
    "E": "TCA--TC-",
}


@pytest.mark.parametrize("model", ["mar-mg", "mar-ecm"])
def test_msa_end_to_end(tmp_path, model):
    (tmp_path / "tree.newick").write_text(
        "((((A:0.1,B:0.1):0.1,C:0.1):0.1,D:0.1):0.1,E:0.1);"
    )
    (tmp_path / "in.fasta").write_text(MSA_FASTA)
    out = tmp_path / "out.fasta"
    rc = main(["msa", str(tmp_path / "in.fasta"), str(tmp_path / "tree.newick"),
               "A", "-m", model, "-o", str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    got = dict(zip([l[1:] for l in lines[::2]], lines[1::2]))
    assert got == MSA_EXPECT


def test_msa_complex_tree(tmp_path):
    (tmp_path / "tree.newick").write_text(
        "((A:0.1,B:0.1):0.1,(C:0.1,(D:0.1,E:0.1):0.1):0.1,F:0.1);"
    )
    (tmp_path / "in.fasta").write_text(MSA_FASTA + ">F\nTCATCG\n")
    out = tmp_path / "out.fasta"
    rc = main(["msa", str(tmp_path / "in.fasta"), str(tmp_path / "tree.newick"),
               "A", "-o", str(out)])
    assert rc == 0
    lines = out.read_text().splitlines()
    got = dict(zip([l[1:] for l in lines[::2]], lines[1::2]))
    expect = dict(MSA_EXPECT)
    expect["F"] = "TCA--TCG"
    assert got == expect


def test_msa_too_few_seqs(tmp_path):
    (tmp_path / "tree.newick").write_text("(A:0.1,B:0.1);")
    (tmp_path / "in.fasta").write_text(">A\nTCATCG\n>B\nTCAGTCG\n")
    rc = main(["msa", str(tmp_path / "in.fasta"), str(tmp_path / "tree.newick"),
               "A"])
    assert rc == 1


def test_msa_rejects_triplet_model(tmp_path):
    (tmp_path / "tree.newick").write_text("((A:0.1,B:0.1):0.1,C:0.1);")
    (tmp_path / "in.fasta").write_text(MSA_FASTA)
    rc = main(["msa", str(tmp_path / "in.fasta"), str(tmp_path / "tree.newick"),
               "A", "-m", "tri-mg"])
    assert rc == 1


def test_merge_alignments_malformed_tree_raises():
    """A tree whose inode can never become mergeable must raise, not spin."""
    from coati_tpu.msa.msa import merge_alignments
    from coati_tpu.msa.tree import Node

    # inode 0 depends on a child (1) that is itself an unvisited inode with
    # no children -> no progress possible
    tree = [
        Node(label="", length=0.0, is_leaf=False, parent=0, children=[1]),
        Node(label="", length=0.0, is_leaf=False, parent=0, children=[2]),
        Node(label="x", length=0.0, is_leaf=True, parent=1, children=[]),
    ]
    tree[1].children = []  # orphan: never satisfiable
    visited = [False, False, True]
    # inode 1 not in inode_indexes -> it can never be visited
    with pytest.raises(ValueError, match="Malformed tree"):
        merge_alignments(visited, tree, [None, None, None], [0])


def test_msa_single_engine_call(tmp_path, monkeypatch):
    """All leaves (unique branch lengths) batch into ONE engine call."""
    import coati_tpu.align.engine as eng

    calls = []
    orig = eng.viterbi_align_batch

    def counting(*args, **kwargs):
        calls.append(len(args[0]))
        return orig(*args, **kwargs)

    monkeypatch.setattr(eng, "viterbi_align_batch", counting)

    fasta = tmp_path / "msa.fasta"
    fasta.write_text(
        ">A\nTCATCG\n>B\nTCAGTCG\n>C\nTATCG\n>D\nTCACTCG\n>E\nTCATC\n"
    )
    tree = tmp_path / "tree.newick"
    tree.write_text("((((A:0.11,B:0.23):0.39,C:0.41):0.17,D:0.53):0.05,E:0.61);")
    out = tmp_path / "out.fasta"
    assert main(["msa", str(fasta), str(tree), "A", "-o", str(out)]) == 0
    assert calls == [4]  # 4 non-reference leaves, one batched call
