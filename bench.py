"""Benchmark: kit demux throughput (reads/sec/chip) on real TPU.

Configs (env BENCH_CONFIG):
  rbk114_96           SQK-RBK114-96 rapid-kit reads (default; the
                      BASELINE primary metric)
  nbd114_96           SQK-NBD114-96 native-barcode reads (constructs at
                      BOTH ends -> ~2x hits/read)
  rbk114_96_extended  RBK114-96 with --use-extended (fusion template
                      as an extra group; reference README.md:145-146
                      reports ~3x slowdown for this mode on CPU)
  kit_nbd_maximize    FULL kit pipeline (annotate+inspect+filter+trim)
                      on SQK-NBD114-96 --maximize, end-to-end wall
                      clock incl. one device cold start

Reads are synthetic (600-4000bp, up to 6 edits, 50% reverse-complement
— the reference benchmark harness's GroupII class) and the measured
path is end-to-end annotate (encode -> device pipeline -> BarbellMatch
rows).  Per CLAUDE.md the shared chip varies +/-20%, so the reported
value is the MEDIAN of BENCH_REPEAT (default 3) passes on fresh data;
every pass's time and accuracy goes to stderr.

vs_baseline denominator: MEASURED on this host, not invented.  The
native extension runs a scalar bit-parallel Myers demux-cost proxy
(same algorithm class as the reference's sassy engine: whole-read
IUPAC flank scan on both strands + per-valley 96-barcode window scans)
over the same reads at the reference's default 10 threads
(bbio_myers_anchor).  That scalar figure is multiplied by
SIMD_FACTOR=4 (AVX2 processes 256-bit lanes vs our 64-bit words) to
estimate the reference's vectorized throughput on this host — a
deliberately generous allowance documented in BASELINE.md.  Prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

SIMD_FACTOR = 4.0  # AVX2 (256-bit) vs scalar 64-bit Myers words
ANCHOR_THREADS = 10  # the reference CLI's default -t
FALLBACK_ANCHOR = 20_000.0  # only if the native extension is missing

CONFIG = os.environ.get("BENCH_CONFIG", "rbk114_96")
# 32768 reads/pass (16 batches): an 8-batch pass is ~45% pipeline
# ramp (fill/drain of the 8-deep batch pipeline) and understated
# steady-state throughput by ~20% — measured 48.7k at 16384 vs 57.6k
# at 32768 in the same hour (bench_r05/rbk114_96_32k.json).
N_READS = int(os.environ.get("BENCH_READS", "32768"))
BATCH = int(os.environ.get("BENCH_BATCH", "2048"))
REPEAT = int(os.environ.get("BENCH_REPEAT", "3"))


def make_reads_rbk(n, seed=0):
    import random

    from barbell_tpu.sim.simulate import (
        default_barcodes,
        mutate_sequence,
        rapid_adapter,
        random_sequence,
    )
    from barbell_tpu.utils import dna

    rng = random.Random(seed)
    barcodes = default_barcodes(96)
    reads = []
    for i in range(n):
        label, bseq = barcodes[rng.randrange(96)]
        body = bytes(random_sequence(rng, rng.randrange(600, 4000)))
        seq = rapid_adapter(bseq) + body
        if rng.random() < 0.5:
            seq = dna.reverse_complement_bytes(seq)
        seq = mutate_sequence(rng, seq, 0, 6)
        reads.append((f"seq_{i}", seq, label))
    return reads


def make_reads_nbd(n, seed=0):
    import random

    from barbell_tpu.kits.database import NB_1ST_FRONT, NB_1ST_REAR, NB_SEQS
    from barbell_tpu.sim.simulate import mutate_sequence, random_sequence
    from barbell_tpu.utils import dna

    rng = random.Random(seed)
    reads = []
    for i in range(n):
        bc = rng.randrange(96)
        construct = (NB_1ST_FRONT + NB_SEQS[bc] + NB_1ST_REAR).encode()
        body = bytes(random_sequence(rng, rng.randrange(600, 4000)))
        seq = construct + body + dna.reverse_complement_bytes(construct)
        if rng.random() < 0.5:
            seq = dna.reverse_complement_bytes(seq)
        seq = mutate_sequence(rng, seq, 0, 6)
        reads.append((f"seq_{i}", seq, f"NB{bc + 1:02d}"))
    return reads


def make_reads_rbk_noisy(n, seed=0):
    """RBK reads under a realistic per-base error profile (default 7%
    mixed sub/ins/del, env BENCH_NOISE_RATE) instead of the <=6
    bounded edits of the clean config — the regime the reference's
    accuracy claims live in (README.md:14-16).  Measured on 256 reads:
    0.996 assigned, 1.000 correct-of-assigned at 0.07."""
    import random

    from barbell_tpu.sim.simulate import (
        default_barcodes,
        noise_sequence,
        rapid_adapter,
        random_sequence,
    )
    from barbell_tpu.utils import dna

    rate = float(os.environ.get("BENCH_NOISE_RATE", "0.07"))
    rng = random.Random(seed)
    barcodes = default_barcodes(96)
    reads = []
    for i in range(n):
        label, bseq = barcodes[rng.randrange(96)]
        body = bytes(random_sequence(rng, rng.randrange(600, 4000)))
        seq = rapid_adapter(bseq) + body
        if rng.random() < 0.5:
            seq = dna.reverse_complement_bytes(seq)
        seq = noise_sequence(rng, seq, rate)
        reads.append((f"seq_{i}", seq, label))
    return reads


CONFIGS = {
    "rbk114_96": dict(
        kit="SQK-RBK114-96", make=make_reads_rbk, extended=False,
        metric="rbk114_96_demux_reads_per_sec_per_chip",
    ),
    "nbd114_96": dict(
        kit="SQK-NBD114-96", make=make_reads_nbd, extended=False,
        metric="nbd114_96_demux_reads_per_sec_per_chip",
    ),
    "rbk114_96_extended": dict(
        kit="SQK-RBK114-96", make=make_reads_rbk, extended=True,
        metric="rbk114_96_extended_demux_reads_per_sec_per_chip",
    ),
    "rbk114_96_noisy": dict(
        kit="SQK-RBK114-96", make=make_reads_rbk_noisy, extended=False,
        metric="rbk114_96_noisy_demux_reads_per_sec_per_chip",
        min_correct=0.97,
    ),
}


def run_kit_pipeline_bench():
    """End-to-end kit pipeline (annotate -> inspect -> filter -> trim)
    wall clock on SQK-NBD114-96 --maximize: the BASELINE config-4
    measurement as a repeatable mode (BENCH_CONFIG=kit_nbd_maximize).

    The per-process device cold start (an executable load the axon
    backend charges on the FIRST demux_call in a process — 2-13 min
    depending on server load, CLAUDE.md) is absorbed by one warmup
    batch BEFORE the timed run and reported as ``warmup_s`` in the
    JSON; round 2's version timed it inline, which made the metric a
    measurement of that night's server load rather than the runner."""
    import shutil
    import tempfile

    from barbell_tpu.kits.database import get_kit_info
    from barbell_tpu.kits.presets import preset_patterns
    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.models.twotier import make_ends_engine
    from barbell_tpu.ops.edit_model import get_edit_cut_off
    from barbell_tpu.sim.compare import assignments_from_trimmed
    from barbell_tpu.stages.kit import (
        KitRunConfig,
        demux_using_kit,
        ends_plan_for_patterns,
    )
    from barbell_tpu.stages.pattern import pattern_from_str

    reads = make_reads_nbd(N_READS, seed=11)

    # Warm the process's device executables with the SAME engine config
    # the kit runner will build (the maximize preset's two-tier ends
    # plan) on a same-shape batch — the load is per-process
    # server-side; an engine with identical shapes absorbs it.
    wgroups = BarcodeGroup.from_kit("SQK-NBD114-96", False)
    for g in wgroups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    wpats = [
        pattern_from_str(s)
        for s in preset_patterns(
            get_kit_info("SQK-NBD114-96").pattern_class, True
        )
    ]
    wplan = ends_plan_for_patterns(wpats, wgroups)
    print(f"# kit ends plan: {wplan}", file=sys.stderr)
    wengine = make_ends_engine(wgroups, wplan)
    warm = reads[: min(BATCH, len(reads))]
    t0 = time.perf_counter()
    wengine.demux_batch([r[0] for r in warm], [r[1] for r in warm])
    if hasattr(wengine, "warm_deep"):
        wengine.warm_deep()
    warmup_s = time.perf_counter() - t0
    print(f"# kit warmup batch (cold load): {warmup_s:.1f}s", file=sys.stderr)
    del wengine
    measure_wire()  # compile the probe's executables off the clock
    d = tempfile.mkdtemp(prefix="bench_kit_")
    try:
        fq = os.path.join(d, "reads.fastq")
        with open(fq, "w") as fh:
            for rid, seq, _label in reads:
                s = seq.decode()
                fh.write(f"@{rid}\n{s}\n+\n{'I' * len(s)}\n")
        truth = {r[0]: r[2] for r in reads}
        # BENCH_KIT_STREAM=0 measures the staged four-pass runner (what
        # BENCH_extra_r02.json recorded before the fused runner became
        # the default) — keep runner shape out of cross-round deltas.
        stream = os.environ.get("BENCH_KIT_STREAM", "1") != "0"
        # Median of REPEAT full-pipeline passes (the shared chip/tunnel
        # varies by the hour; a single-pass kit figure confounded runner
        # changes with bandwidth weather through round 4), each with a
        # wire probe recorded next to it.
        pass_times = []
        pass_wire = []
        out = None
        for rep in range(REPEAT):
            up_mbps, down_mbps = measure_wire()
            pass_wire.append((round(up_mbps, 1), round(down_mbps, 1)))
            out = os.path.join(d, f"out{rep}")
            t0 = time.perf_counter()
            demux_using_kit(
                [fq],
                KitRunConfig(
                    kit_name="SQK-NBD114-96", output_folder=out,
                    maximize=True, batch_size=BATCH, stream=stream,
                ),
            )
            dt = time.perf_counter() - t0
            pass_times.append(dt)
            print(
                f"# kit pass {rep}: {len(reads)} reads in {dt:.1f}s "
                f"({len(reads) / dt:.0f} reads/s); wire {up_mbps:.1f}/"
                f"{down_mbps:.1f} MB/s",
                file=sys.stderr,
            )
        dt = float(np.median(pass_times))
        assigned = assignments_from_trimmed(out)
        n_assigned = 0
        n_correct = 0
        for rid, label in assigned.items():
            base, _, tail = rid.rpartition("_")
            if tail.isdigit() and base in truth:
                rid = base
            if rid not in truth:
                continue
            n_assigned += 1
            if truth[rid] == label.split("_")[0]:
                n_correct += 1
        print(
            f"# kit pipeline median of {REPEAT}: {len(reads)} reads in "
            f"{dt:.1f}s (cold load absorbed by warmup: {warmup_s:.1f}s); "
            f"assigned {n_assigned / len(reads):.3f}, "
            f"correct-of-assigned {n_correct / max(1, n_assigned):.3f}",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "nbd114_96_maximize_kit_pipeline_reads_per_sec",
                    "value": round(len(reads) / dt, 1),
                    "unit": "reads/s",
                    "runner": "streamed" if stream else "staged",
                    "warmup_s": round(warmup_s, 1),
                    "pass_times_s": [round(t, 2) for t in pass_times],
                    "pass_wire_mbps": pass_wire,
                    "assigned_frac": round(n_assigned / len(reads), 4),
                    "accuracy_of_assigned": round(
                        n_correct / max(1, n_assigned), 4
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def measure_cpu_anchor(groups, reads, n_threads=ANCHOR_THREADS):
    """Measured reads/s of the scalar CPU Myers demux-cost proxy on this
    host (per-group whole-read flank scan, both strands, + per-valley
    barcode window scans), at the reference's default thread count.
    Returns (reads_per_sec, total_valleys) or None if unavailable."""
    import ctypes

    from barbell_tpu.models.demux import BARCODE_K_FRAC
    from barbell_tpu.native import get_lib
    from barbell_tpu.utils import dna

    lib = get_lib()
    if lib is None:
        return None

    seqs = [r[1] for r in reads]
    blob = b"".join(seqs)
    n = len(seqs)
    offs = np.zeros(n, dtype=np.int64)
    ls = np.zeros(n, dtype=np.int32)
    pos = 0
    for i, s in enumerate(seqs):
        offs[i] = pos
        ls[i] = len(s)
        pos += len(s)

    lutm = dna.ENCODE_LUT.tobytes()
    t0 = time.perf_counter()
    total = 0
    for g in groups:
        flank = (np.asarray(g.flank_masks, dtype=np.uint8) & 0xF).tobytes()
        pats = np.asarray(g.patterns_fwd, dtype=np.uint8) & 0xF
        p_count, plen = pats.shape
        k_flank = int(g.k_cutoff)
        k_bar = int(plen * BARCODE_K_FRAC)
        win = plen + k_flank
        total += lib.bbio_myers_anchor(
            blob,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ls.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            n,
            lutm,
            flank,
            len(g.flank_masks),
            k_flank,
            pats.tobytes(),
            p_count,
            plen,
            k_bar,
            win,
            n_threads,
        )
    dt = time.perf_counter() - t0
    return n / dt, total


def measure_wire(up_bytes: int = 1 << 21, down_bytes: int = 1 << 20):
    """Measured tunnel bandwidth right now: (up_MB/s, down_MB/s).

    Recorded per pass NEXT TO the throughput numbers (never used to
    normalize them): the tunnel's hour-to-hour bandwidth swing (~1.4x)
    owns the headline sign on this wire-bound engine, so every capture
    must be self-diagnosing — a 0.7x pass at 15MB/s reads as "bad
    hour", at 35MB/s as "regression" (VERDICT r04 weak #5).

    Per CLAUDE.md, only fetch-forced timings are real on this backend:
    the up probe forces materialization with a device reduction and a
    1-element fetch; the down probe synthesizes its buffer on device
    from a scalar and fetches all of it.  Fresh random content defeats
    the remote runtime's repeated-input result cache."""
    import jax
    import jax.numpy as jnp

    buf = np.random.randint(0, 256, size=up_bytes, dtype=np.uint8)
    t0 = time.perf_counter()
    x = jnp.asarray(buf)
    seed = int(np.asarray(x[:: 4096].astype(jnp.int32).sum()))
    up_dt = time.perf_counter() - t0

    t0 = time.perf_counter()
    y = (
        jnp.arange(down_bytes, dtype=jnp.int32) + jnp.int32(seed & 0xFF)
    ).astype(jnp.uint8)
    np.asarray(y)
    down_dt = time.perf_counter() - t0
    return up_bytes / up_dt / 1e6, down_bytes / down_dt / 1e6


#: populated by _probe_backend; recorded in the output JSON so a bench
#: that survived a transient outage says so.
_PROBE_ATTEMPTS = 0


def _probe_backend(timeout_s: float, max_wait_s: float) -> None:
    """Fail fast if the JAX backend never initializes (dead TPU tunnel).

    ``jax.devices()`` on the remote axon backend blocks FOREVER when
    the tunnel is down; a hung bench is the worst failure mode for the
    round driver, so probe device init on a watchdog thread and emit a
    machine-readable error line instead.  A healthy tunnel initializes
    in seconds (the 2-6 min cold start is the first *execution*, which
    happens after this probe).

    Round 2 lost its bench artifact to a transient outage that a single
    fail-fast turned terminal, so the probe retries with doubling
    backoff until ``max_wait_s`` (env ``BENCH_MAX_WAIT``, seconds) has
    elapsed.  The retry re-probes the SAME hung ``jax.devices()`` call:
    the axon backend's init completes for every waiter once the tunnel
    returns, so one probe thread suffices."""
    import threading

    global _PROBE_ATTEMPTS
    done = threading.Event()

    def probe():
        import jax

        jax.devices()
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    deadline = time.monotonic() + max_wait_s
    wait = timeout_s
    while True:
        _PROBE_ATTEMPTS += 1
        if done.wait(wait):
            return
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        print(
            f"# WARN: jax backend not up after attempt {_PROBE_ATTEMPTS} "
            f"({wait:.0f}s); retrying ({remaining:.0f}s left)",
            file=sys.stderr,
        )
        wait = min(wait * 2, remaining)
    print(
        f"# FATAL: jax backend did not initialize within {max_wait_s:.0f}s"
        f" over {_PROBE_ATTEMPTS} attempts (TPU tunnel down?)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "error",
                "value": 0,
                "unit": "reads/s",
                "vs_baseline": 0,
                "error": "jax backend init timeout (tunnel down)",
                "probe_attempts": _PROBE_ATTEMPTS,
            }
        )
    )
    os._exit(2)


def main():
    _probe_backend(
        float(os.environ.get("BENCH_DEVICE_TIMEOUT", "180")),
        float(os.environ.get("BENCH_MAX_WAIT", "1800")),
    )
    if CONFIG == "kit_nbd_maximize":
        run_kit_pipeline_bench()
        return
    cfg = CONFIGS[CONFIG]
    from barbell_tpu.models.barcodes import BarcodeGroup
    from barbell_tpu.models.pipeline import JaxDemuxEngine, engine_map_batches
    from barbell_tpu.models.records import BarcodeType
    from barbell_tpu.ops.edit_model import get_edit_cut_off

    groups = BarcodeGroup.from_kit(cfg["kit"], cfg["extended"])
    for g in groups:
        g.set_flank_threshold(get_edit_cut_off(g.get_effective_len()))
    # Kit-preset demux is the headline metric, and the kit runner's
    # default is the SURVEY §5.7 ends-only scan (long reads ship only
    # their end windows; the per-side/two-tier plan derived from the
    # kit's safe preset patterns — round 5).  BENCH_ENDS=0 measures the
    # whole-read scan; --use-extended always scans whole reads (fusion
    # templates target mid-read constructs).
    from barbell_tpu.models.twotier import make_ends_engine

    plan = None
    if os.environ.get("BENCH_ENDS", "1") != "0" and not cfg["extended"]:
        from barbell_tpu.kits.database import get_kit_info
        from barbell_tpu.kits.presets import preset_patterns
        from barbell_tpu.stages.kit import ends_plan_for_patterns
        from barbell_tpu.stages.pattern import pattern_from_str

        pats = [
            pattern_from_str(s)
            for s in preset_patterns(
                get_kit_info(cfg["kit"]).pattern_class, False
            )
        ]
        plan = ends_plan_for_patterns(pats, groups)
        print(f"# ends-scan plan: {plan}", file=sys.stderr)
    engine = make_ends_engine(groups, plan)

    make = cfg["make"]
    warm = make(BATCH, seed=99)
    engine.demux_batch([r[0] for r in warm], [r[1] for r in warm])
    if plan is None:
        # Full-scan configs: sim reads top out a hair under the 4096
        # row width, but insertions push the occasional read past it —
        # the first batch containing one compiles the chunk-row shape
        # MID-PASS (a multi-minute server-side executable load; both
        # round-5 extended captures ate it in pass 0).  Warm that shape
        # deterministically with one oversized read.
        wseqs = [r[1] for r in warm[: BATCH - 1]]
        wseqs.append((warm[0][1] * 3)[:6000])
        engine.demux_batch([f"w{i}" for i in range(len(wseqs))], wseqs)
    if hasattr(engine, "warm_deep"):
        # compile the rescue tier's shapes outside the timed passes
        t0 = time.perf_counter()
        engine.warm_deep()
        print(
            f"# deep-tier warmup: {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )
    measure_wire()  # compile the probe's executables off the clock

    # The shared chip's throughput varies +/-20% minute to minute: time
    # REPEAT fresh datasets (fresh per pass — the remote runtime caches
    # results for repeated identical inputs) and report the MEDIAN.
    if N_READS < BATCH:
        raise SystemExit(
            f"BENCH_READS={N_READS} < BENCH_BATCH={BATCH}: zero full "
            f"batches — nothing to measure"
        )
    if N_READS % BATCH:
        print(
            f"# note: dropping {N_READS % BATCH}-read tail "
            f"(only full {BATCH}-read batches are timed)",
            file=sys.stderr,
        )
    from barbell_tpu.models.hittable import MTYPE_CODE

    ftag_code = MTYPE_CODE[BarcodeType.Ftag]
    vocab_arr = np.asarray(engine.labels)
    # The CPU anchor is re-measured once per PASS (same fixed dataset)
    # and the headline vs_baseline is the MEDIAN of per-pass ratios:
    # host load on the shared bench box moves the anchor +/-10% hour to
    # hour, and a single once-per-run anchor let that noise flip the
    # sign of the headline margin (round-3 post-mortem, VERDICT r03).
    anchor_reads = make(min(N_READS, 4096), seed=1234)
    pass_times = []
    pass_anchor_rps = []
    pass_ratios = []
    pass_wire = []
    for rep in range(REPEAT):
        up_mbps, down_mbps = measure_wire()
        pass_wire.append((round(up_mbps, 1), round(down_mbps, 1)))
        print(
            f"# wire probe: up {up_mbps:.1f} MB/s, down {down_mbps:.1f} MB/s",
            file=sys.stderr,
        )
        reads = make(N_READS, seed=rep)
        ids = [r[0] for r in reads]
        seqs = [r[1] for r in reads]
        truth_arr = np.asarray([r[2] for r in reads])

        def batches():
            for i in range(0, len(reads), BATCH):
                if i + BATCH <= len(reads):
                    yield ids[i : i + BATCH], seqs[i : i + BATCH]

        t0 = time.perf_counter()
        n_done = 0
        correct = 0
        assigned = 0
        # The engine yields columnar HitTables (the annotate stage's hot
        # path); the accuracy check is vectorized so the consumer isn't
        # the bottleneck being measured.
        for bids, _bseqs, table in engine_map_batches(
            engine, batches(), method="demux_batch_table"
        ):
            base = n_done
            n_done += len(bids)
            c = table.cols
            tag = c["mtype"] == ftag_code
            uniq, first = np.unique(c["reads"][tag], return_index=True)
            assigned += int(uniq.size)
            got = vocab_arr[c["label"][tag][first]]
            want = truth_arr[base : base + len(bids)][uniq]
            correct += int((got == want).sum())
        dt = time.perf_counter() - t0
        pass_rps = n_done / dt
        anchor = measure_cpu_anchor(groups, anchor_reads)
        if anchor is not None:
            anchor_rps, valleys = anchor
            pass_anchor_rps.append(anchor_rps)
            pass_ratios.append(pass_rps / (anchor_rps * SIMD_FACTOR))
            anchor_note = (
                f"; anchor {anchor_rps:.0f} scalar reads/s "
                f"({valleys} valleys) -> ratio {pass_ratios[-1]:.3f}"
            )
        else:
            pass_ratios.append(pass_rps / FALLBACK_ANCHOR)
            anchor_note = "; anchor unavailable (nominal denominator)"
        print(
            f"# pass {rep}: {n_done} reads in {dt:.2f}s "
            f"({pass_rps:.0f} reads/s); "
            f"assigned {assigned / max(1, n_done):.3f}, "
            f"correct {correct / max(1, n_done):.3f}{anchor_note}",
            file=sys.stderr,
        )
        floor = cfg.get("min_correct", 0.99)
        assert correct == n_done or correct / max(1, n_done) > floor, (
            "accuracy regression"
        )
        pass_times.append(dt)

    dt = float(np.median(pass_times))
    rps = n_done / dt

    extra = {}
    if pass_anchor_rps:
        anchor_median = float(np.median(pass_anchor_rps))
        baseline = anchor_median * SIMD_FACTOR
        spread = (
            (max(pass_anchor_rps) - min(pass_anchor_rps)) / anchor_median
            if anchor_median
            else 0.0
        )
        ncores = os.cpu_count() or 1
        print(
            f"# cpu anchor: scalar Myers proxy median {anchor_median:.0f} "
            f"reads/s over {len(pass_anchor_rps)} per-pass runs "
            f"(spread {spread:.1%}) @ {ANCHOR_THREADS} threads on "
            f"{ncores} core(s); x{SIMD_FACTOR:.0f} SIMD allowance -> "
            f"baseline {baseline:.0f} reads/s (measured, see BASELINE.md)",
            file=sys.stderr,
        )
        extra = {
            "anchor_scalar_median": round(anchor_median, 1),
            "anchor_spread": round(spread, 4),
            "pass_ratios": [round(r, 3) for r in pass_ratios],
        }
    else:
        baseline = FALLBACK_ANCHOR
        print(
            "# cpu anchor unavailable (no native extension); "
            f"using nominal {baseline:.0f} reads/s",
            file=sys.stderr,
        )

    acc = correct / max(1, n_done)
    print(
        f"# median of {REPEAT}: {n_done} reads in {dt:.2f}s; "
        f"assigned {assigned / max(1, n_done):.3f}, correct {acc:.3f}",
        file=sys.stderr,
    )
    # vs_baseline = median of per-pass (engine / anchor) ratios: each
    # ratio pairs a pass with an anchor measured in the same minutes,
    # so a host-load swing moves both sides together instead of
    # flipping the headline sign.
    print(
        json.dumps(
            {
                "metric": cfg["metric"],
                "value": round(rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(float(np.median(pass_ratios)), 3),
                "ends_window": plan.shallow[0] if plan else 0,
                "ends_deep": (plan.deep[0] if plan and plan.deep else 0),
                "rescued": getattr(engine, "total_rescued", 0),
                "pass_wire_mbps": pass_wire,
                **extra,
                **(
                    {"probe_attempts": _PROBE_ATTEMPTS}
                    if _PROBE_ATTEMPTS > 1
                    else {}
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
