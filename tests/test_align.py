"""Gap-scored alignment tests, including the reference's own cases
(reference: scripts/tests/align_dataset_to_proteinnet_test.py:13-38)."""
import numpy as np
import pytest

from protein_transformer_tpu.data.align import (
    binary_mask_to_str, can_be_directly_merged, compute_alignment_mask,
    str_mask_to_binary)


# reference test_get_mask_from_alignment (:13-22)
@pytest.mark.parametrize("target, mobile, mask", [
    ("AAAAAAAAGAPAAAAAAA", "AAAAAAAAAAAAAAA", "++++++++---+++++++"),
    ("STARTAAAAAAAAAGAPAAAAAA", "AAAAAAAAAAAAAAA", "-----+++++++++---++++++"),
    ("STARTAAAAAAAGAAAAPAAAAAAAAAEND", "AAAAAAAAAAAAAAAA",
     "-----+++++++------+++++++++---"),
])
def test_get_mask_from_alignment(target, mobile, mask):
    assert compute_alignment_mask(target, mobile) == mask


# reference test_can_be_directly_merged (:25-31)
@pytest.mark.parametrize("pn_seq, my_seq, pn_mask", [
    ("AAAAAAAAGAPAAAAAAA", "AAAAAAAAAAAAAAA", "++++++++---+++++++"),
    ("STARTAAAAAAAAAGAPAAAAAA", "AAAAAAAAAAAAAAA", "-----+++++++++---++++++"),
    ("STARTAAAAAAAGAAAAPAAAAAAAAAEND", "AAAAAAAAAAAAAAAA",
     "-----+++++++------+++++++++---"),
])
def test_can_be_directly_merged(pn_seq, my_seq, pn_mask):
    assert can_be_directly_merged(pn_seq, my_seq, pn_mask)[0]


# reference test_not_can_be_directly_merged (:33-38)
@pytest.mark.parametrize("pn_seq, my_seq, pn_mask", [
    ("AAAAAAAAGAPAAAAAAA", "AAAAAAAAAAAAAAAA", "++++++++---+++++++"),
    ("STARTAAAAAAAAAGAPAAAAAA", "AAAAAAAAAAAAAAA", "-----+++++++++---+++++-"),
    ("STARTAAAAAAAGAAAAPAAAAAAAAAEND", "AAAAAAAAAAAAAAAA",
     "-----+++++++--+---+++++++++---"),
])
def test_not_can_be_directly_merged(pn_seq, my_seq, pn_mask):
    assert not can_be_directly_merged(pn_seq, my_seq, pn_mask)[0]


def test_no_embedding_returns_none():
    assert compute_alignment_mask("AAAA", "AAAAA") is None
    assert compute_alignment_mask("AGA", "GG") is None


def test_exact_match():
    assert compute_alignment_mask("HEY", "HEY") == "+++"


def test_mask_conversions():
    assert binary_mask_to_str([1, 0, 1]) == "+-+"
    assert str_mask_to_binary("+-+") == [1, 0, 1]


def test_multi_contig_repair_mask():
    """The derived mask places each observed contig at its matching primary
    location even when the recorded mask disagrees -- the repair capability
    the reference implements with Biopython (align_dataset_to_proteinnet)."""
    primary = "MKTWAAGHRLVNEFGIKQ"
    observed = "KTWA" + "RLVN" + "IKQ"   # three contigs
    mask = compute_alignment_mask(primary, observed)
    assert mask is not None
    sel = [c for c, s in zip(primary, mask) if s == "+"]
    assert "".join(sel) == observed
    ok, computed = can_be_directly_merged(primary, observed, "-" * len(primary))
    assert not ok and computed == mask


def test_derived_mask_respects_gap_preferences():
    # a long internal gap beats two short ones; edges preferred over internal
    primary = "CCAAAABBBAAAA"
    observed = "AAAAAAAA"
    mask = compute_alignment_mask(primary, observed)
    assert mask == "--++++---++++"
