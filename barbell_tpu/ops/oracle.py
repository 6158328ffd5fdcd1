"""NumPy reference engine for approximate flank/barcode search.

This module *defines* the framework's alignment semantics.  The TPU
kernels in :mod:`barbell_tpu.ops.device` are validated cell-for-cell
against it, and it doubles as the CPU fallback path.

Semantics (modelled on the reference's search engine usage,
`src/annotate/searcher.rs`; the engine itself is a non-vendored
dependency, so the precise conventions below are *ours* and are used
consistently across oracle and kernels):

* **Semiglobal search**: the pattern must be fully aligned, the text
  match may start/end anywhere.  Unit costs (sub/ins/del = 1), IUPAC
  masks intersect => match (cost 0).
* **Overhang** (flank search only): pattern bases that extend past the
  *text* ends cost ``alpha`` each instead of 1 (CLI ``--alpha``,
  default 0.4).  Implemented as: column-0 vertical steps cost alpha,
  column-n vertical steps cost alpha.  Costs are tracked in float;
  a match is accepted iff ``cost <= k + 1e-6``; the reported integer
  cost is ``floor(cost + 0.5)``.
* **Match enumeration**: one match per cost valley over end positions:
  report end ``j`` iff ``ends[j] <= k`` and ``ends[j] < ends[j+1]``
  and ``ends[j] <= ends[j-1]`` (out-of-range neighbours = +inf), i.e.
  the rightmost point of each plateau-valley.
* **Traceback tie-breaking** (canonical): diagonal (match/sub) first,
  then vertical (pattern-consuming gap), then horizontal (text gap).
* **Reverse complement**: an Rc search runs the forward pattern
  against ``revcomp(text)``; coordinates are mapped back to forward
  text coordinates (span ``[s,e)`` in rc space -> ``[n-e, n-s)``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..models.records import Strand

# Alignment column op codes.
OP_M = 0  # match      (consumes pattern + text, cost 0)
OP_X = 1  # substitute (consumes pattern + text, cost 1)
OP_U = 2  # pattern-consuming gap / overhang (cost 1, or alpha at text ends)
OP_L = 3  # text-consuming gap (cost 1)

_EPS = 1e-6


@dataclass
class Alignment:
    """One search hit.

    ``text_start``/``text_end`` are in the *searched* text's coordinates
    (for Rc searches, the caller maps them with :func:`rc_span_to_fwd`).
    ``path`` holds one (pattern_pos, text_pos) pair per alignment column
    — the column's start coordinates.  ``ops`` holds one op code per
    column.  Both run in pattern order.
    """

    text_start: int
    text_end: int
    cost: float
    strand: Strand
    path: np.ndarray  # [n_cols, 2] int32
    ops: np.ndarray  # [n_cols] int8
    pattern_idx: int = 0

    @property
    def cost_int(self) -> int:
        return int(np.floor(self.cost + 0.5))


def dp_table(
    pattern_masks: np.ndarray,
    text_masks: np.ndarray,
    alpha: Optional[float] = None,
) -> np.ndarray:
    """Full semiglobal DP cost table C[(m+1), (n+1)] (float32).

    C[i][j] = min cost of aligning pattern[:i] against some text
    suffix-window ending at j, with free start anywhere in the text.
    """
    m = len(pattern_masks)
    n = len(text_masks)
    gap_edge = 1.0 if alpha is None else float(alpha)

    eq = (pattern_masks[:, None] & text_masks[None, :]) != 0  # [m, n]
    sub = 1.0 - eq.astype(np.float32)  # [m, n]

    C = np.zeros((m + 1, n + 1), dtype=np.float32)
    C[1:, 0] = gap_edge * np.arange(1, m + 1, dtype=np.float32)

    jj = np.arange(n, dtype=np.float32)
    vert = np.ones(n, dtype=np.float32)
    if alpha is not None and n > 0:
        vert[n - 1] = alpha  # vertical step in the last column = right overhang
    for i in range(1, m + 1):
        prev = C[i - 1]
        # candidates without the horizontal (text-gap) transition
        v = np.minimum(prev[:-1] + sub[i - 1], prev[1:] + vert)
        # horizontal closure: C[i][j] = min(v[j'], j'<=j) + (j - j'), plus
        # reaching from the j=0 boundary cell.
        u = np.minimum(v, C[i, 0] + 1.0 + jj)  # seed with boundary cell
        u = u - jj
        np.minimum.accumulate(u, out=u)
        C[i, 1:] = u + jj
    return C


def end_costs(C: np.ndarray) -> np.ndarray:
    """Best cost for a match ending at each text position j (0..n)."""
    return C[-1]


def find_valleys(ends: np.ndarray, k: float) -> List[int]:
    """End positions that are plateau-valley minima with cost <= k."""
    n = len(ends) - 1
    out = []
    for j in range(n + 1):
        if ends[j] > k + _EPS:
            continue
        nxt = ends[j + 1] if j < n else np.inf
        prv = ends[j - 1] if j > 0 else np.inf
        if ends[j] < nxt - 1e-9 and ends[j] <= prv + 1e-9:
            out.append(j)
    return out


def traceback(
    C: np.ndarray,
    pattern_masks: np.ndarray,
    text_masks: np.ndarray,
    j_end: int,
    alpha: Optional[float] = None,
) -> Tuple[int, np.ndarray, np.ndarray]:
    """Walk back from cell (m, j_end); returns (text_start, path, ops)."""
    m = len(pattern_masks)
    n = len(text_masks)
    i, j = m, j_end
    cols: List[Tuple[int, int]] = []
    ops: List[int] = []
    while i > 0:
        here = C[i, j]
        if i > 0 and j > 0:
            is_eq = (pattern_masks[i - 1] & text_masks[j - 1]) != 0
            diag = C[i - 1, j - 1] + (0.0 if is_eq else 1.0)
            if abs(here - diag) <= _EPS:
                i, j = i - 1, j - 1
                cols.append((i, j))
                ops.append(OP_M if is_eq else OP_X)
                continue
        vcost = 1.0
        if alpha is not None and (j == 0 or j == n):
            vcost = alpha
        up = C[i - 1, j] + vcost
        if abs(here - up) <= _EPS:
            i = i - 1
            cols.append((i, j))
            ops.append(OP_U)
            continue
        # horizontal
        assert j > 0, "traceback stuck"
        j = j - 1
        cols.append((i, j))
        ops.append(OP_L)
    cols.reverse()
    ops.reverse()
    text_start = j
    return (
        text_start,
        np.array(cols, dtype=np.int32).reshape(-1, 2),
        np.array(ops, dtype=np.int8),
    )


def op_cost(op: int, j: int, n: int, alpha: Optional[float]) -> float:
    if op == OP_M:
        return 0.0
    if op == OP_U and alpha is not None and (j == 0 or j == n):
        return float(alpha)
    return 1.0


def search(
    pattern_masks: np.ndarray,
    text_masks: np.ndarray,
    k: float,
    alpha: Optional[float] = None,
    strand: Strand = Strand.Fwd,
) -> List[Alignment]:
    """All valley matches of pattern in text with cost <= k, by end asc."""
    n = len(text_masks)
    if n == 0:
        return []
    C = dp_table(pattern_masks, text_masks, alpha)
    ends = end_costs(C)
    out = []
    for j in find_valleys(ends, k):
        text_start, path, ops = traceback(C, pattern_masks, text_masks, j, alpha)
        # text_end: one past the last text-consuming column.
        text_end = j
        out.append(
            Alignment(
                text_start=text_start,
                text_end=text_end,
                cost=float(ends[j]),
                strand=strand,
                path=path,
                ops=ops,
            )
        )
    return out


def best_match_per_pattern(
    pattern_mask_list: np.ndarray,
    text_masks: np.ndarray,
    k: float,
) -> List[Optional[Alignment]]:
    """For each pattern (all equal length), the best valley match or None.

    Best = lowest cost; ties broken by smallest end position (the first
    streamed match at the minimal cost).  Forward search, no overhang.
    """
    out: List[Optional[Alignment]] = []
    for idx in range(pattern_mask_list.shape[0]):
        pat = pattern_mask_list[idx]
        matches = search(pat, text_masks, k)
        if not matches:
            out.append(None)
            continue
        best = min(matches, key=lambda a: (a.cost, a.text_end))
        best.pattern_idx = idx
        out.append(best)
    return out


def rc_span_to_fwd(text_start_rc: int, text_end_rc: int, n: int) -> Tuple[int, int]:
    """Map a span [s, e) in rc-text coordinates to forward coordinates."""
    return n - text_end_rc, n - text_start_rc


def matching_region(
    aln: Alignment, mask_start: int, mask_end: int, n: Optional[int] = None
) -> Optional[Tuple[int, int]]:
    """Text window covered by pattern positions [mask_start, mask_end].

    Mirrors the reference's path filtering (`src/annotate/cigar_parse.rs:71-82`):
    take the first and last path column whose pattern position lies in
    the *inclusive* range, return their text positions as (min, max).
    For Rc alignments pass ``n`` (the forward text length) to get the
    window in forward coordinates.
    """
    in_range = (aln.path[:, 0] >= mask_start) & (aln.path[:, 0] <= mask_end)
    idx = np.nonzero(in_range)[0]
    if len(idx) == 0:
        return None
    j_first = int(aln.path[idx[0], 1])
    j_last = int(aln.path[idx[-1], 1])
    if aln.strand is Strand.Rc:
        assert n is not None
        lo, hi = min(j_first, j_last), max(j_first, j_last)
        return n - hi, n - lo
    return min(j_first, j_last), max(j_first, j_last)


def map_pattern_interval(
    aln: Alignment, p_start: int, p_end: int
) -> Optional[Tuple[Tuple[int, int], Tuple[int, int], int]]:
    """((pat_start, pat_end), (text_start, text_end), sub_cost) for the
    pattern interval [p_start, p_end) — exclusive end, matching the
    reference's `map_pat_to_text_with_cost` (`src/annotate/cigar_parse.rs:6-45`).
    Sub-cost counts every non-match column as 1.
    """
    in_range = (aln.path[:, 0] >= p_start) & (aln.path[:, 0] < p_end)
    idx = np.nonzero(in_range)[0]
    if len(idx) == 0:
        return None
    first, last = int(idx[0]), int(idx[-1])
    pi, pj = (int(x) for x in aln.path[first])
    ei, ej = (int(x) for x in aln.path[last])
    cost = int(np.count_nonzero(aln.ops[first : last + 1] != OP_M))
    return (pi, ei + 1), (pj, ej + 1), cost
