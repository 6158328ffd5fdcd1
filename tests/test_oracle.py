"""Search-oracle semantics tests.

The coordinate/cost extraction cases mirror the reference's
`src/annotate/cigar_parse.rs:104-176` unit tests.
"""

import numpy as np
import pytest

from barbell_tpu.models.records import Strand
from barbell_tpu.ops import oracle
from barbell_tpu.utils import dna


def search_bytes(p, t, k, alpha=None):
    return oracle.search(dna.encode(p), dna.encode(t), k, alpha=alpha)


def test_exact_match():
    matches = search_bytes(b"ACGTACGT", b"GGGGACGTACGTGGGG", 0)
    assert len(matches) == 1
    m = matches[0]
    assert m.cost == 0
    assert (m.text_start, m.text_end) == (4, 12)
    # path is one column per pattern char, all matches
    assert len(m.ops) == 8
    assert all(op == oracle.OP_M for op in m.ops)
    assert tuple(m.path[0]) == (0, 4)


def test_single_substitution():
    matches = search_bytes(b"AAAACCCC", b"TTTTAAAACGCCTTTT", 1)
    assert len(matches) == 1
    assert matches[0].cost_units == 1


def test_iupac_pattern():
    # N in the pattern matches anything at zero cost.
    matches = search_bytes(b"AANNAA", b"GGAACTAAGG", 0)
    assert len(matches) == 1
    assert (matches[0].text_start, matches[0].text_end) == (2, 8)


def test_cost_extraction_no_edits():
    # reference test_cost_extraction_no_edits
    p, t = b"AAAAACCCAAAA", b"GGGGAAAAACCCAAAAGGGGG"
    m = search_bytes(p, t, 0)[0]
    mapped = oracle.map_pattern_interval(m, 5, 8)
    assert mapped is not None
    (_ps, _pe), (_ts, _te), cost = mapped
    assert cost == 0
    # rc'ing both should not change the cost
    m2 = search_bytes(dna.reverse_complement_bytes(p), dna.reverse_complement_bytes(t), 0)[0]
    (_, _), (_, _), cost2 = oracle.map_pattern_interval(m2, 5, 8)
    assert cost2 == 0


def test_cost_extraction_1_edit():
    p, t = b"AAAAACCCAAAA", b"GGGGAAAAACGCAAAA"
    m = search_bytes(p, t, 1)[0]
    (_, _), (_, _), cost = oracle.map_pattern_interval(m, 5, 8)
    assert cost == 1


def test_cost_extraction_edge_overlap_left():
    # reference test_cost_extraction_1_edits_overhang_left_flank:
    # pattern partially hangs off the left text edge (unit-cost gaps,
    # no alpha overhang on this searcher).
    p, t = b"AAAAACCCAAAA", b"ACGCAAAAGGGGGGGGGGGG"
    matches = search_bytes(p, t, 5)
    m = min(matches, key=lambda a: a.cost)
    (_, _), (ts, te), cost = oracle.map_pattern_interval(m, 5, 8)
    assert cost == 1
    assert ts == 1
    assert te == 4


def test_cost_extraction_edge_overlap_right():
    p, t = b"AAAAACCCAAAA", b"GAAAAACGC"
    matches = search_bytes(p, t, 5)
    m = min(matches, key=lambda a: a.cost)
    (_, _), (ts, te), cost = oracle.map_pattern_interval(m, 5, 8)
    assert cost == 1
    assert ts == 6
    assert te == 9


def test_cost_edge_overlap_including_bar():
    # reference test_cost_overhang_including_bar: first C of the barcode
    # region itself is cut off by the text edge.
    p, t = b"AAAAACCCAAAA", b"GCAAAAGGGGGGGGGGGG"
    matches = search_bytes(p, t, 8)
    m = min(matches, key=lambda a: a.cost)
    (_, _), (ts, te), cost = oracle.map_pattern_interval(m, 5, 8)
    assert cost == 2
    assert ts == 0
    assert te == 2


def test_overhang_alpha_cheaper_than_unit():
    # With alpha=0.4, hanging 5 pattern bases off the left edge costs 2.0
    # instead of 5.
    p = b"AAAAACCCC"
    t = b"CCCCGGGGGGGG"
    no_overhang = min(search_bytes(p, t, 9), key=lambda a: a.cost)
    with_overhang = min(search_bytes(p, t, 9, alpha=0.4), key=lambda a: a.cost)
    assert no_overhang.cost_units == pytest.approx(5.0)
    assert with_overhang.cost_units == pytest.approx(5 * 0.4)
    assert with_overhang.cost_int == 2


def test_overhang_right_edge():
    p = b"CCCCAAAAA"
    t = b"GGGGGGGGCCCC"
    m = min(search_bytes(p, t, 9, alpha=0.4), key=lambda a: a.cost)
    assert m.cost_units == pytest.approx(5 * 0.4)
    assert m.text_end == len(t)


def test_valleys_multiple_matches():
    p = b"ACGT"
    t = b"ACGTCCCCCCACGT"
    matches = search_bytes(p, t, 0)
    assert len(matches) == 2
    assert [(m.text_start, m.text_end) for m in matches] == [(0, 4), (10, 14)]


def test_rc_span_mapping():
    # Pattern occurs reverse-complemented in the text.
    pat = b"AACCGGTT"
    t = b"TTTT" + dna.reverse_complement_bytes(pat) + b"GGGGG"
    rc_text = dna.reverse_complement_masks(dna.encode(t))
    matches = oracle.search(dna.encode(pat), rc_text, 0, strand=Strand.Rc)
    assert len(matches) == 1
    m = matches[0]
    fwd = oracle.rc_span_to_fwd(m.text_start, m.text_end, len(t))
    assert fwd == (4, 12)


def test_best_match_per_pattern_prefers_lower_cost():
    pats = np.stack([dna.encode(b"AAAA"), dna.encode(b"CCCC"), dna.encode(b"GGGG")])
    window = dna.encode(b"TTCCCCTT")
    best = oracle.best_match_per_pattern(pats, window, 1)
    assert best[1] is not None and best[1].cost == 0
    # AAAA and GGGG are nowhere near within k=1 of this window
    assert best[0] is None
    assert best[2] is None


def test_dp_matches_bruteforce_random():
    rng = np.random.default_rng(0)
    bases = np.array([1, 2, 4, 8], dtype=np.uint8)
    for _ in range(25):
        m = rng.integers(3, 9)
        n = rng.integers(4, 16)
        pat = bases[rng.integers(0, 4, m)]
        txt = bases[rng.integers(0, 4, n)]
        C = oracle.dp_table(pat, txt)
        # brute force recurrence check
        B = np.zeros((m + 1, n + 1))
        B[1:, 0] = np.arange(1, m + 1)
        for i in range(1, m + 1):
            for j in range(1, n + 1):
                sub = 0 if (pat[i - 1] & txt[j - 1]) else 1
                B[i, j] = min(B[i - 1, j - 1] + sub, B[i - 1, j] + 1, B[i, j - 1] + 1)
        assert np.allclose(C, B * oracle.COST_SCALE), (pat, txt)


def test_traceback_cost_consistent():
    rng = np.random.default_rng(1)
    bases = np.array([1, 2, 4, 8], dtype=np.uint8)
    for _ in range(25):
        pat = bases[rng.integers(0, 4, 8)]
        txt = bases[rng.integers(0, 4, 30)]
        for m in oracle.search(pat, txt, 4):
            # cost recomputed from ops must equal the DP cost
            c = sum(
                oracle.op_cost(op, int(j), len(txt), None)
                for op, (i, j) in zip(m.ops, m.path)
            )
            assert c == pytest.approx(m.cost)
            # path must be monotone and consume the full pattern
            assert m.path[0][0] == 0
            assert m.path[-1][0] == len(pat) - 1
