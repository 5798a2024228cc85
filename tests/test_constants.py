"""Constants match the reference's hard-coded tables
(utils.hpp:54-70, utils.cc tests)."""

import numpy as np

from coati_tpu import constants as C
from coati_tpu.utils import cod61_to_64, cod64_to_61, cod_int, get_nuc

import pytest

# exact copy of the reference nt16_table semantic expectations
REF_AMINO_GROUP = [
    75, 78, 75, 78, 84, 84, 84, 84, 82, 83, 82, 83, 73, 73, 77, 73,
    81, 72, 81, 72, 80, 80, 80, 80, 82, 82, 82, 82, 76, 76, 76, 76,
    69, 68, 69, 68, 65, 65, 65, 65, 71, 71, 71, 71, 86, 86, 86, 86,
    89, 89, 83, 83, 83, 83, 67, 87, 67, 76, 70, 76, 70,
]


def test_amino_group_matches_reference():
    assert list(C.AMINO_GROUP) == REF_AMINO_GROUP


def test_nt16_table():
    expect = {"-": 15, "A": 0, "B": 10, "C": 1, "D": 11, "G": 2, "H": 12,
              "K": 7, "M": 6, "N": 14, "R": 4, "S": 8, "T": 3, "U": 3,
              "V": 13, "W": 9, "Y": 5}
    for ch, v in expect.items():
        assert C.NT16_TABLE[ord(ch)] == v
        assert C.NT16_TABLE[ord(ch.lower())] == v
    assert C.NT16_TABLE[ord("X")] == 16


def test_cod64_to_61():
    # reference utils.cc:1168-1185
    assert cod64_to_61(0) == 0
    assert cod64_to_61(20) == 20
    assert cod64_to_61(47) == 47
    assert cod64_to_61(49) == 48
    assert cod64_to_61(51) == 49
    assert cod64_to_61(52) == 50
    assert cod64_to_61(53) == 51
    assert cod64_to_61(57) == 54
    assert cod64_to_61(60) == 57
    assert cod64_to_61(63) == 60
    for bad in (-1, 64):
        with pytest.raises(ValueError):
            cod64_to_61(bad)
    for stop in (48, 50, 56):
        with pytest.raises(ValueError):
            cod64_to_61(stop)


def test_cod61_to_64():
    # reference utils.cc:1214-1227
    pairs = [(0, 0), (20, 20), (47, 47), (48, 49), (49, 51), (50, 52),
             (54, 57), (56, 59), (60, 63)]
    for a, b in pairs:
        assert cod61_to_64(a) == b
    for bad in (-1, 61):
        with pytest.raises(ValueError):
            cod61_to_64(bad)


def test_get_nuc_roundtrip():
    # reference utils.cc:753-781
    for i in range(61):
        n = [get_nuc(i, p) for p in range(3)]
        packed = 16 * n[0] + 4 * n[1] + n[2]
        assert packed == cod61_to_64(i)


def test_cod_int():
    assert cod_int("AAA") == 0
    assert cod_int("TTT") == 63
    assert cod_int("ATG") == 0b001110
    assert cod_int("NAA") == -1
    assert cod_int("ARA") == -1
