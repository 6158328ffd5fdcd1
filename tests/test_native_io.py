"""Native IO extension tests (skipped when g++/zlib unavailable)."""

import gzip

import pytest

from barbell_tpu.utils.fastx import iter_fastq_batches
from barbell_tpu.utils import fastx_native

pytestmark = pytest.mark.skipif(
    not fastx_native.native_available(), reason="native IO unavailable"
)


def _write_fastq(path, records, use_gzip=False):
    op = gzip.open if use_gzip else open
    with op(path, "wt") as fh:
        for h, s, q in records:
            fh.write(f"@{h}\n{s}\n+\n{q}\n")


RECORDS = [
    ("read1 desc here", "ACGTACGT", "IIIIIIII"),
    ("read2", "GGGG", "####"),
    ("read3", "A" * 300, "J" * 300),
]


def test_native_reader_plain(tmp_path):
    p = tmp_path / "in.fastq"
    _write_fastq(p, RECORDS)
    batches = list(fastx_native.iter_fastq_batches_native([str(p)], 2))
    flat = [r for b in batches for r in b]
    assert [(h, s.decode(), q.decode()) for h, s, q in flat] == RECORDS


def test_native_reader_gzip_and_multifile(tmp_path):
    p1 = tmp_path / "a.fastq.gz"
    p2 = tmp_path / "b.fastq"
    _write_fastq(p1, RECORDS[:2], use_gzip=True)
    _write_fastq(p2, RECORDS[2:])
    flat = [
        r
        for b in fastx_native.iter_fastq_batches_native([str(p1), str(p2)], 10)
        for r in b
    ]
    assert len(flat) == 3
    assert flat[0][0] == "read1 desc here"
    assert flat[2][1] == b"A" * 300


def test_native_reader_gzip_no_trailing_newline(tmp_path):
    """A .gz whose decompressed content lacks a final newline must not
    stitch its last qual line onto the NEXT file's first record: the
    gzip fill path has to report one EOF between files exactly like
    the plain path's final fread()==0 (regression: close-on-productive
    -fill used to let find_nl continue into file B)."""
    p1 = tmp_path / "a.fastq.gz"
    p2 = tmp_path / "b.fastq.gz"
    with gzip.open(p1, "wb") as fh:
        fh.write(b"@readA\nACGT\n+\nIIII")  # no trailing newline
    _write_fastq(p2, RECORDS[:2], use_gzip=True)
    flat = [
        r
        for b in fastx_native.iter_fastq_batches_native([str(p1), str(p2)], 10)
        for r in b
    ]
    assert [(h, s.decode(), q.decode()) for h, s, q in flat] == [
        ("readA", "ACGT", "IIII"),
        RECORDS[0],
        RECORDS[1],
    ]


def test_native_matches_python_reader(tmp_path):
    import random

    rng = random.Random(0)
    records = [
        (
            f"r{i} meta{i}",
            "".join(rng.choice("ACGT") for _ in range(rng.randrange(10, 500))),
            "",
        )
        for i in range(200)
    ]
    records = [(h, s, "I" * len(s)) for h, s, _ in records]
    p = tmp_path / "big.fastq.gz"
    _write_fastq(p, records, use_gzip=True)
    native = [
        r for b in fastx_native.iter_fastq_batches_native([str(p)], 64) for r in b
    ]
    pure = [r for b in iter_fastq_batches([str(p)], 64) for r in b]
    assert native == pure


def test_native_writer_roundtrip(tmp_path):
    out = tmp_path / "out.fastq.gz"
    w = fastx_native.NativeFastqWriter(str(out), gzip_level=6)
    for h, s, q in RECORDS:
        w.write_record(h.encode(), s.encode(), q.encode())
    w.close()
    back = [r for b in iter_fastq_batches([str(out)], 10) for r in b]
    assert [(h, s.decode(), q.decode()) for h, s, q in back] == RECORDS


def test_native_reader_rejects_garbage(tmp_path):
    p = tmp_path / "bad.fastq"
    p.write_text("not a fastq at all\n")
    with pytest.raises(ValueError):
        list(fastx_native.iter_fastq_batches_native([str(p)], 4))


def test_native_encode_pack2_matches_reference():
    """2-bit pack + exception list must reconstruct the exact nibble
    masks the reference path produces, for ACGT/N/IUPAC/junk bytes."""
    import numpy as np
    import pytest

    from barbell_tpu.native import get_lib
    from barbell_tpu.utils import dna

    lib = get_lib()
    if lib is None:
        pytest.skip("native extension unavailable")
    import ctypes
    import random

    rng = random.Random(4)
    L = 64
    seqs = [
        b"ACGTACGTNNRYacgtXX",
        bytes(rng.choice(b"ACGTNacgtRYKM?") for _ in range(L)),
        b"",
        b"N" * L,
    ]
    n = len(seqs)
    blob = b"".join(seqs)
    offs = np.zeros(n, dtype=np.int64)
    ls = np.zeros(n, dtype=np.int32)
    pos = 0
    for i, s in enumerate(seqs):
        offs[i] = pos
        ls[i] = len(s)
        pos += len(s)
    packed = np.zeros((n, L // 4), dtype=np.uint8)
    cap = 4 * L
    exc = np.zeros((cap, 2), dtype=np.int32)
    exc[:, 0] = n * L
    n_exc = lib.bbio_encode_pack2_rows(
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ls.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n,
        L,
        dna.CODE2_LUT.tobytes(),
        dna.ENCODE_LUT.tobytes(),
        packed.ctypes.data_as(ctypes.c_char_p),
        exc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cap,
    )
    assert 0 < n_exc <= cap

    # reconstruct like the device does
    codes = np.zeros((n, L), dtype=np.uint8)
    for s in range(4):
        codes[:, s::4] = (packed >> (2 * s)) & 3
    masks = (1 << codes).astype(np.uint8)
    jpos = np.arange(L)
    masks = np.where(jpos[None, :] < ls[:, None], masks, 0)
    flat = masks.reshape(-1)
    for pos, mask in exc[:n_exc]:
        flat[pos] = mask
    got = flat.reshape(n, L)

    for i, s in enumerate(seqs):
        want = np.zeros(L, dtype=np.uint8)
        want[: len(s)] = dna.encode(s) & 0xF
        assert np.array_equal(got[i], want), i


def test_native_pack2_cat_exceptions_past_row_16384():
    """Regression: with L=8192, rows >= 16384 put flat_pos*16 past
    2**31 — the old packed int32 form wrapped negative and corrupted
    row 0 on device.  The (pos, mask) pair form must stay exact."""
    import ctypes

    import numpy as np
    import pytest

    from barbell_tpu.native import get_lib
    from barbell_tpu.utils import dna

    lib = get_lib()
    if lib is None:
        pytest.skip("native extension unavailable")

    L = 8192
    n = 16385  # last row's flat positions exceed 2**27 (old form: 2**31)
    seqs = [b"AC"] * (n - 1) + [b"GANT"]  # N at row 16384, col 2
    blob = b"".join(seqs)
    offs = np.zeros(n, dtype=np.int64)
    ls = np.zeros(n, dtype=np.int32)
    starts = np.zeros(n, dtype=np.int64)
    pos = 0
    bpos = 0
    for i, s in enumerate(seqs):
        offs[i] = pos
        ls[i] = len(s)
        starts[i] = bpos
        pos += len(s)
        bpos += (len(s) + 3) // 4
    flat = np.zeros(bpos, dtype=np.uint8)
    cap = 8
    exc = np.zeros((cap, 2), dtype=np.int32)
    exc[:, 0] = n * L if n * L < 2**31 else 2**31 - 1
    n_exc = lib.bbio_encode_pack2_cat(
        blob,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        ls.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        n,
        L,
        dna.CODE2_LUT.tobytes(),
        dna.ENCODE_LUT.tobytes(),
        flat.ctypes.data_as(ctypes.c_char_p),
        exc.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        cap,
    )
    assert n_exc == 1
    assert int(exc[0, 0]) == 16384 * L + 2  # exact, positive, no wrap
    assert int(exc[0, 1]) == 0xF  # N mask
    assert exc[0, 0] > 2**27  # the range the old form could not encode


def test_native_myers_valleys_match_dp():
    """The CPU-anchor's bit-parallel Myers must produce the exact
    semi-global score track (checked via its k-valleys) of a reference
    O(mn) DP, including multi-word patterns (m > 64) and IUPAC masks."""
    import ctypes
    import random

    import numpy as np
    import pytest

    from barbell_tpu.native import get_lib
    from barbell_tpu.utils import dna

    lib = get_lib()
    if lib is None:
        pytest.skip("native extension unavailable")

    def dp_valleys(pattern, text, k):
        pm = dna.encode(pattern) & 0xF
        tm = dna.encode(text) & 0xF
        m, n = len(pm), len(tm)
        prev = np.arange(m + 1)
        track = []
        for j in range(n):
            cur = np.empty(m + 1, dtype=np.int64)
            cur[0] = 0
            sub = np.where((pm & tm[j]) != 0, 0, 1)
            for i in range(1, m + 1):
                cur[i] = min(prev[i - 1] + sub[i - 1], prev[i] + 1, cur[i - 1] + 1)
            track.append(int(cur[m]))
            prev = cur
        # mirror the C scan's valley rule exactly: valley at prev_j when
        # prev <= k and prev <= prev2 and prev < score
        out = []
        prev2, prev1 = 10**9, 10**9
        for j, s in enumerate(track):
            if prev1 <= k and prev1 <= prev2 and prev1 < s:
                out.append(j - 1)
            prev2, prev1 = prev1, s
        if prev1 <= k and prev1 <= prev2:
            out.append(n - 1)
        return out

    rng = random.Random(13)
    cases = []
    for m, n in [(7, 40), (24, 80), (44, 120), (90, 200), (130, 260)]:
        pat = bytes(rng.choice(b"ACGT") for _ in range(m))
        txt = bytearray(rng.choice(b"ACGT") for _ in range(n))
        # plant a noisy copy of the pattern
        ins = bytearray(pat)
        for _ in range(max(1, m // 10)):
            ins[rng.randrange(len(ins))] = rng.choice(b"ACGT")
        pos = rng.randrange(0, n - len(ins))
        txt[pos : pos + len(ins)] = ins
        txt[5] = ord("N")
        cases.append((pat, bytes(txt), max(2, int(0.3 * m))))
    # IUPAC in the pattern
    cases.append((b"ACGRYNNTT", b"TTACGATCTTGGACGGTACTT", 2))

    for pat, txt, k in cases:
        want = dp_valleys(pat, txt, k)
        out = np.zeros(256, dtype=np.int32)
        got_n = lib.bbio_myers_valleys(
            txt,
            len(txt),
            dna.ENCODE_LUT.tobytes(),
            (dna.encode(pat) & 0xF).tobytes(),
            len(pat),
            k,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            256,
        )
        assert got_n == len(want), (pat, txt, k, want, out[:got_n])
        assert out[:got_n].tolist() == want


def test_native_reader_truncated_gzip_errors(tmp_path):
    """A gzip stream cut mid-member must raise, not report clean EOF —
    silent data loss is worse than an error (the pure-Python path raises
    EOFError on the same file)."""
    p = tmp_path / "in.fastq.gz"
    _write_fastq(p, RECORDS * 40, use_gzip=True)
    blob = p.read_bytes()
    trunc = tmp_path / "trunc.fastq.gz"
    trunc.write_bytes(blob[: len(blob) // 2])
    with pytest.raises(ValueError):
        list(fastx_native.iter_fastq_batches_native([str(trunc)], 8))


def test_native_reader_fifo_input(tmp_path):
    """Process-substitution style inputs (FIFOs) are not seekable; the
    gzip sniff must not rewind."""
    import os
    import threading

    fifo = tmp_path / "pipe.fastq"
    os.mkfifo(fifo)
    payload = "".join(f"@{h}\n{s}\n+\n{q}\n" for h, s, q in RECORDS)

    def feed():
        with open(fifo, "w") as fh:
            fh.write(payload)

    t = threading.Thread(target=feed)
    t.start()
    try:
        batches = list(fastx_native.iter_fastq_batches_native([str(fifo)], 2))
    finally:
        t.join()
    flat = [r for b in batches for r in b]
    assert [(h, s.decode(), q.decode()) for h, s, q in flat] == RECORDS


def test_native_reader_multimember_gzip(tmp_path):
    """Concatenated gzip members (bgzip-style) still read end to end."""
    a, b = tmp_path / "a.gz", tmp_path / "b.gz"
    _write_fastq(a, RECORDS[:2], use_gzip=True)
    _write_fastq(b, RECORDS[2:], use_gzip=True)
    cat = tmp_path / "in.fastq.gz"
    cat.write_bytes(a.read_bytes() + b.read_bytes())
    flat = [
        r for bt in fastx_native.iter_fastq_batches_native([str(cat)], 2)
        for r in bt
    ]
    assert [(h, s.decode(), q.decode()) for h, s, q in flat] == RECORDS
