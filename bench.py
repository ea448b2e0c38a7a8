"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line {"metric", "value", "unit", "queries", "sf", "cpu_calib_sec"}.

Each query is materialized with the no-op sink (full execution, no driver
collect cost). One warm-up of a trivial job absorbs JVM/codegen startup;
each query then runs three times (one untimed warm-up pass + two timed
passes) and reports the per-query minimum — the noise-damped steady-state
cost.

Contention sentinel (VERDICT r09 item 3): three straight rounds shipped
timings silently inflated ~30-100% by co-tenant host load that only a
judge's idle re-run exposed. The JSON now carries loadavg_start /
loadavg_end (os.getloadavg 1/5/15-min triples) and TWO calibration
timings — cpu_calib_mid_sec, measured between the two timed passes, and
cpu_calib_sec, the round-comparable post-suite number. If the host looks
contended (loadavg already high at entry, or the two calibs diverge
>25%) the harness warns on stderr and re-runs the timed passes ONCE,
folding per-query minima across both runs; contended/contention_rerun
record that this happened. Interpretation rule: see SCALING.md — a
round-over-round comparison is only meaningful between runs whose
cpu_calib_sec agree within ~15%.

PARALLEL probe (VERDICT r11 item 3): BENCH_r11 shipped contended:false
while the suite ran ~12% hot — a co-tenant stealing SOME of 32 cores is
invisible to a single-threaded calibration (the single probe gets a full
core either way) and to loadavg thresholds set at ncpu/4. Two fixes:
(a) cpu_calib_par_sec — a fixed 32-way probe (same arithmetic shape as
the single probe + one tiny 64-key shuffle) whose wall time IS the
suite's regime, so partial-core co-tenancy inflates it proportionally;
the par/single ratio cancels host frequency drift, and a ratio above
PAR_OVER_SINGLE_MAX (pinned from idle measurements with headroom) flags
contention even when the co-tenant is steady across the whole run.
(b) the loadavg_start trigger tightened to >1.5 absolute (r11's miss
entered at 3.06). Both feed the same warn + one-rerun + record path.

Trigger identity (VERDICT r12 item 3): contention_trigger /
contention_trigger_values record WHICH predicate(s) fired and the
firing values, so an idle-but-flagged run (a cold first-pass probe
tripping a divergence check at loadavg ~0) is distinguishable from a
genuine co-tenant in the artifact. SCALING.md has the reading rule.

Calib-gated admission + steal sentinel (VERDICT r15 item 1): the r15
artifact ran every window under a co-tenant the in-VM loadavg cannot
observe (it lives outside the VM; /proc/stat steal time is the only
in-VM witness), shipped 1.36x calib-inflated, and read as 31 phantom
regressions. Two fixes: (a) before the timed passes start, the
single-core calibration ITSELF gates admission — bounded re-probes
(CALIB_GATE_ATTEMPTS x CALIB_GATE_WAIT_SEC) until it lands inside the
measured idle band (CALIB_GATE_SEC), so the suite starts in a window
proven calm by the same instrument cross-round comparisons are read
against; the rerun path gets the same gate after its idle-wait. All
probes land in the JSON (calib_gate_samples, with per-probe steal
fractions), a dirty-host budget exhaustion proceeds fully recorded.
(b) steal ticks across the timed suite (steal_frac_suite) feed a new
"steal" contention trigger — the direct co-tenant observation.

Idle-wait scheduling (VERDICT r13 item 6): the driver artifact shipped
contended two rounds straight (r12, r13 — both trigger-identified), and
the one rerun fires INSIDE the same contended window, so it mostly
re-measures the co-tenant. Two bounded waits now shape WHEN the timed
work runs instead of only labeling it afterwards: (a) at entry, if the
1-min loadavg is above the trigger threshold, poll until it decays
below it (departed co-tenants clear in ~2-3 min of 1-min-loadavg decay)
or the wait budget (5 min) runs out; (b) before the contended rerun,
the same bounded wait so the second suite runs in the calm the first
one never got. idle_wait_entry_sec / idle_wait_rerun_sec and the raw
pre-wait loadavg land in the JSON; a persistent co-tenant exhausts both
budgets and the artifact reads exactly as before (trigger-identified
contended, minima folded).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # reference-parity core
    "cdc_historize_two_runs",
    "scd2_merge",
    # relational / TPC-H-style
    "rel_agg_groupby",
    "rel_window_rank",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q18",
    # events
    "events_sessionize",
    # llm-ops
    "dedup_exact",
    "dedup_minhash_pairs",
    "text_quality",
    "text_tfidf_topk",
    "text_boilerplate",
    "dedup_jaccard_prefix",
    "curation_pipeline",
    "emb_topk",
    "emb_kmeans",
    # loop-shaped (iterate-to-fixpoint) representative, added r05 per
    # VERDICT r04 item 6 — tracks the iterative family round-over-round.
    # NOT part of the r01-r04 comparable core; see core20_sec below.
    "graph_label_propagation",
    # the two heaviest r05 operators, added r06 per VERDICT r05 item 5 —
    # policy keepers over near-dup clusters (component fixpoint + cluster
    # window) and the one-sided containment prefix join. Also outside
    # core20.
    "dedup_keeper_priority",
    "dedup_containment",
    # r07 additions: the composed IVF-PQ ANN search and the banded
    # Hamming image near-dup — the round's two new heavy operators.
    # Outside core20.
    "emb_ivfpq_topk",
    "multimodal_dhash_neardup",
    # r08 addition: the persisted-index round-trip (build + write
    # partitioned-by-cid + reload + search) — tracks the amortizable
    # build cost the in-memory row hides. Outside core20.
    "emb_ivfpq_persist_roundtrip",
    # r08 addition: corpus line-level dedup (explode + hash-keyed
    # first-occurrence policy + reassembly). Outside core20.
    "dedup_lines",
    # r08 addition: hybrid retrieval — runs the BM25 ranking, the
    # corpus-LM quality ranking, and the integer RRF fusion in one
    # plan, so it tracks the whole retrieval stack. Outside core20.
    "text_rrf_fusion",
    # r10 addition: bounded exact substring dedup (the ExactSubstr
    # removal stage — window hash + keep-first + owner protection +
    # reassembly). Outside core20.
    "dedup_substrings",
    # r12 addition: the interpolated Kneser-Ney bigram LM scorer — the
    # round's heavy new operator; tracks the corpus-LM scoring stack
    # (doc-bigram ⋈ corpus-bigram shuffle join + three derived stats
    # relations). Outside core20.
    "text_kn_logprob",
    # r13 addition: CCNet bucketing in its production shape (distributed
    # exact tercile-cutoff selection + broadcast-literal scan
    # assignment) — tracks the corpus-curation bucketing stack end to
    # end on top of the KN scorer. Outside core20.
    "text_ccnet_cutoffs",
    # r14 additions: the streaming pipelines through the PRODUCTION
    # file sink (real micro-batch run + parquet sink + read-back per
    # call — the decade-measurable twins of the memory-sink gate rows).
    # Each fn executes the stream itself, so the generic noop
    # materialization times the whole pipeline. Outside core20; the
    # memory-sink streaming leg (bench_streaming) stays for
    # round-over-round comparability.
    "streaming_windowed_counts_file",
    "streaming_dedup_counts_file",
    # r15 additions: the round's two new scale-path operators — q-gram
    # prefix-filtered fuzzy matching (the dirty-key join's bounded
    # form) and the file-sink twin of the custom stateful sessionizer.
    # Outside core20.
    "rel_fuzzy_pairs_qgram",
    "streaming_sessionize_file",
]

# the 20 queries (incl. streaming) benched since r01 — their sum is
# emitted as "core20_sec" so round-over-round totals stay comparable
# after suite additions ("value" covers the whole current suite).
# FROZEN explicit list, not a slice of BENCH_QUERIES: reordering or
# inserting suite lines must never silently change what core20 measures.
CORE20 = frozenset({
    "cdc_historize_two_runs", "scd2_merge", "rel_agg_groupby",
    "rel_window_rank", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10",
    "tpch_q18", "events_sessionize", "dedup_exact", "dedup_minhash_pairs",
    "text_quality", "text_tfidf_topk", "text_boilerplate",
    "dedup_jaccard_prefix", "curation_pipeline", "emb_topk", "emb_kmeans",
    "streaming_windowed_counts",
})


def bench_streaming(spark, sf_dir: str) -> float:
    """Run the events table through the REAL micro-batch engine (availableNow
    trigger, watermarked tumbling-window aggregation, noop sink) and return
    wall seconds. This measures streaming-path overhead vs the batch twin
    (events_hourly), not just plan quality.

    State partitions are sized to the state cardinality (~3.5k live
    windows at sf0.1), not the batch shuffle default: a stateful query
    pays per-partition state-store open/commit in EVERY micro-batch —
    including the empty watermark-finalization batch append mode needs —
    so 32 stores over 3.5k windows is ~2/3 pure store overhead (measured:
    8 partitions 1.1 s, 32 → 2.3 s, 64 → 3.1 s for the identical result).
    Spark fixes state partitioning at first query start, which is exactly
    when a production job makes this same sizing choice; at real stream
    volume (millions of windows) the right number scales back up.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_shuffle_partitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _bench_streaming_body(spark, sf_dir)
    finally:
        # restore the batch-suite shuffle sizing even when the stream
        # errors — otherwise every subsequent batch bench line silently
        # runs at 8 partitions and skews round-over-round timings
        spark.conf.set(
            "spark.sql.shuffle.partitions", batch_shuffle_partitions
        )


def _bench_streaming_body(spark, sf_dir: str) -> float:
    import tempfile

    from pandas_etl_framework_spark.relational import normalize_event_time

    # layout-agnostic source (r13): the glob-pinned read matched ZERO
    # files when events.parquet is a directory of part files — the same
    # vacuous-empty-stream hazard fixed for the six registry rows
    from pandas_etl_framework_spark.streaming.windows import (
        events_stream_source,
    )

    stream = events_stream_source(spark, sf_dir)
    # watermarks require plain TIMESTAMP event time (bigint-nanos and
    # TIMESTAMP_NTZ both drift in via the parquet physical type)
    stream = normalize_event_time(stream, "ts")

    from pandas_etl_framework_spark.streaming import windowed_event_counts

    ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")
    t0 = time.time()
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("append")
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    elapsed = round(time.time() - t0, 3)
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    return elapsed


# entry loadavg above this is the contention trigger (see sentinel notes
# below) AND the idle-wait threshold — one constant so the wait targets
# exactly the state that would flag the artifact
LOADAVG_TRIGGER = 1.5
IDLE_WAIT_BUDGET_SEC = 300
IDLE_WAIT_POLL_SEC = 15

# Calib-gated admission (VERDICT r15 item 1): the r15 artifact shipped
# 1.36x calib-inflated with 31 phantom regressions because every window
# this host offered was contended and the loadavg-based idle-wait cannot
# see the co-tenant (it lives OUTSIDE the VM — /proc/stat steal time is
# the only in-VM witness; measured here: steal_frac 0.13 -> calib 1.11,
# steal 0.06 -> 0.40, steal ~0 -> 0.30). So before the timed passes run
# at all, the single-core calibration itself is the gate: re-probe on a
# bounded schedule until it lands at or below CALIB_GATE_SEC, then start
# the suite inside that proven-calm window. The threshold is the
# measured idle band of this box (r14/r15 idle 0.241-0.271; this
# session's uncontended entry run 0.300 post-suite) plus headroom; a
# persistently-dirty host exhausts the budget and the run proceeds,
# fully recorded (calib_gate_* keys), falling back to the existing
# min-folded rerun machinery.
CALIB_GATE_SEC = 0.32
CALIB_GATE_ATTEMPTS = 10
CALIB_GATE_WAIT_SEC = 45
# steal ticks / total ticks across the timed suite above this flags the
# run: ~3% steady steal measurably inflates the straggler-bound stages
# (the parallel probe regime) even when every loadavg looks idle
STEAL_TRIGGER_FRAC = 0.03


def _steal_sample() -> tuple[int, int]:
    """(steal_ticks, total_ticks) from /proc/stat line 1 — the only
    in-VM observation of a hypervisor co-tenant. (0, 0) where the file
    or the steal column is unavailable; callers treat a zero total delta
    as 'no signal'."""
    try:
        f = open("/proc/stat").readline().split()
        return int(f[8]), sum(int(x) for x in f[1:])
    except (OSError, IndexError, ValueError):
        return 0, 0


def _steal_frac(before: tuple[int, int], after: tuple[int, int]) -> float:
    dt = after[1] - before[1]
    if dt <= 0:
        return 0.0
    return round((after[0] - before[0]) / dt, 4)


def _idle_wait(
    budget_sec: float = IDLE_WAIT_BUDGET_SEC, settle_sec: float = 0.0
) -> float:
    """Bounded wait for the 1-min loadavg to decay below the contention
    trigger (VERDICT r13 item 6). Departed co-tenants clear in a couple
    of minutes of loadavg decay; a persistent one exhausts the budget
    and the run proceeds, trigger-identified as before. Returns seconds
    waited (0.0 when the host was already calm and settle_sec is 0).

    ``settle_sec``: unconditional sleep BEFORE the poll, for callers
    whose OWN just-finished work inflates the 1-min loadavg — right
    after the suite, local[32] pushes it far past the trigger with no
    co-tenant present, so a pre-rerun poll without a settle measures
    our own decay and records it as a co-tenant wait. The settle
    absorbs most of the self-load (1-min loadavg decays ~e^-1 per
    minute); whatever the poll still sees afterwards is much more
    likely a real co-tenant. Counted in the returned total."""
    waited = 0.0
    if settle_sec:
        time.sleep(settle_sec)
        waited = settle_sec
    la = os.getloadavg()[0]
    announced = False  # not `waited == 0.0`: a settle pre-charges `waited`,
    # which silenced the notice on every settle_sec>0 call (ADVICE r14)
    while la > LOADAVG_TRIGGER and waited < budget_sec:
        if not announced:
            announced = True
            print(
                f"bench: 1-min loadavg {la:.2f} > {LOADAVG_TRIGGER}; "
                f"waiting up to {budget_sec:.0f}s for the host to idle",
                file=sys.stderr,
            )
        time.sleep(IDLE_WAIT_POLL_SEC)
        waited += IDLE_WAIT_POLL_SEC
        la = os.getloadavg()[0]
    if waited:
        print(
            f"bench: resumed after {waited:.0f}s (1-min loadavg {la:.2f})",
            file=sys.stderr,
        )
    return round(waited, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    # sampled before Spark spins up a single thread: any load visible here
    # is co-tenant, not ours
    loadavg_entry = [round(x, 2) for x in os.getloadavg()]
    idle_wait_entry = _idle_wait()
    loadavg_start = [round(x, 2) for x in os.getloadavg()]

    from pandas_etl_framework_spark.harness import REGISTRY
    from pandas_etl_framework_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    def _timed(thunk) -> float:
        t0 = time.time()
        thunk()
        return round(time.time() - t0, 3)

    def _calib() -> float:
        # CPU calibration: a fixed data-independent JVM workload (codegen'd
        # arithmetic over range()), min of two runs. Identical code across
        # rounds, so cross-round total ratios can be read against box-speed
        # drift: one session measured the same suite at 19-25 s on the same
        # commit purely from host variance, which the calibration tracks.
        return min(
            _timed(lambda: spark.range(2_000_000_000).selectExpr(
                "sum(id * 2 + (id & 7))"
            ).collect())
            for _ in range(2)
        )

    def _calib_par() -> float:
        # PARALLEL calibration (VERDICT r11 item 3): a fixed 32-task map
        # stage (125M rows/task) + one 64-key shuffle with map-side
        # combine, min of two runs. The single-thread probe gets a whole
        # core even under partial co-tenancy; this one occupies every
        # slot at once, so a co-tenant stealing SOME cores inflates it
        # the same way it inflates the suite (straggler-amplified: the
        # stage waits on the slowest task). Fixed workload across rounds
        # — comparable round-over-round like cpu_calib_sec.
        return min(
            _timed(lambda: spark.range(0, 4_000_000_000, 1, 32)
                   .selectExpr("id % 64 AS k", "(id & 1023) AS v")
                   .groupBy("k").agg({"v": "sum"}).collect())
            for _ in range(2)
        )

    def _calib_gate(
        attempts: int = CALIB_GATE_ATTEMPTS,
    ) -> tuple[bool, list[dict], float]:
        """Bounded calib-gated admission (VERDICT r15 item 1): probe the
        single-core calibration until it lands inside the idle band, so
        the timed passes START in a window proven calm by the very
        instrument the cross-round comparison is read against. Each
        probe also samples /proc/stat steal — the co-tenant witness the
        loadavg misses. Returns (passed, samples, waited_sec)."""
        samples: list[dict] = []
        waited = 0.0
        for attempt in range(attempts):
            s0 = _steal_sample()
            c = _calib()
            samples.append(
                {"calib": c, "steal_frac": _steal_frac(s0, _steal_sample())}
            )
            if c <= CALIB_GATE_SEC:
                return True, samples, round(waited, 1)
            if attempt < attempts - 1:
                print(
                    f"bench: calib gate {c:.3f} > {CALIB_GATE_SEC} "
                    f"(attempt {attempt + 1}/{attempts}); waiting "
                    f"{CALIB_GATE_WAIT_SEC}s for the co-tenant to leave",
                    file=sys.stderr,
                )
                time.sleep(CALIB_GATE_WAIT_SEC)
                waited += CALIB_GATE_WAIT_SEC
        return False, samples, round(waited, 1)

    # warm-up: JVM + whole-stage codegen (incl. the md5/join/agg paths every
    # query uses) + parquet footers, so timings reflect steady-state engine
    # cost — what a long-running cluster sees — not one-time JIT
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(10_000)
        .selectExpr("md5(cast(id as string)) AS h", "id")
        .groupBy("h")
        .count()
        .join(spark.range(100).selectExpr("md5(cast(id as string)) AS h"), "h")
        .count()
    )
    for t in ("orders", "lineitem", "customer", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()

    def run_suite() -> tuple[dict[str, float], float]:
        """Three passes: the first (untimed) absorbs query-specific codegen
        and shuffle-file warmth; the reported number is the per-query MIN of
        the two timed passes. Min-of-N is the standard steady-state estimator
        under co-tenant noise (any single pass can be inflated by scheduler
        contention, never deflated below the query's true cost) and matches
        the regime a long-running cluster actually operates in. Returns
        (timings, mid-suite calibration measured between the timed passes).
        """
        timings: dict[str, float] = {}
        calib_mid = -1.0
        calib_par_mid = -1.0
        for timed_pass in range(3):
            # drop warm-up-pass .cache() blocks — identical logical plans
            # would otherwise read them and under-report the cached queries
            spark.catalog.clearCache()
            for name in BENCH_QUERIES:
                fn, _sql = REGISTRY[name]
                t0 = time.time()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = round(time.time() - t0, 3)
                timings[name] = (
                    dt if timed_pass < 2 else min(timings[name], dt)
                )
            s = bench_streaming(spark, sf_dir)
            timings["streaming_windowed_counts"] = (
                s
                if timed_pass < 2
                else min(timings["streaming_windowed_counts"], s)
            )
            if timed_pass == 1:
                calib_mid = _calib()
                calib_par_mid = _calib_par()
        return timings, calib_mid, calib_par_mid

    gate_passed, gate_samples, gate_wait = _calib_gate()
    steal0 = _steal_sample()
    timings, calib_mid, calib_par_mid = run_suite()
    steal_suite = _steal_frac(steal0, _steal_sample())
    calib = _calib()
    calib_par = _calib_par()

    # contention sentinel: the host was already loaded before we started
    # (>1.5 absolute — r11's miss entered at loadavg 3.06 under the old
    # ncpu/4=8 threshold), the two in-run calibrations disagree (a
    # co-tenant came or went mid-suite; checked for BOTH probes), or the
    # parallel/single ratio sits above the idle envelope. Measured idle
    # envelope (fully-warm, post-suite, min-of-2): par 2.8-3.2 s against
    # single 0.27-0.31 s → idle ratio 9.3-11.9 (r12 idle run: 3.171 /
    # 0.305 = 10.4; the original 11.0 threshold sat INSIDE that band and
    # would flag genuinely idle runs whenever the single-calib
    # denominator landed low). 13.0 is the steady-co-tenant backstop the
    # divergence checks can't see: stealing 25% of 32 cores inflates the
    # straggler-bound parallel probe ≥30% → ratio ≥ 13.5, while the
    # loadavg and mid-vs-post triggers cover arrivals and departures.
    # One re-run, then per-query minima across both runs — still
    # min-based, so re-running can only remove inflation.
    # Record WHICH predicate fired and with what value (VERDICT r12 item
    # 3): an idle-but-flagged run (e.g. a cold first-pass probe tripping
    # a divergence check) and a genuinely contended one were previously
    # indistinguishable in the artifact — the flag carried no identity.
    par_over_single_max = 13.0
    triggers: dict[str, float] = {}
    if loadavg_start[0] > LOADAVG_TRIGGER:
        triggers["loadavg"] = loadavg_start[0]
    single_div = max(calib, calib_mid) / max(min(calib, calib_mid), 1e-9)
    if single_div > 1.25:
        triggers["single_calib_div"] = round(single_div, 3)
    par_div = max(calib_par, calib_par_mid) / max(
        min(calib_par, calib_par_mid), 1e-9
    )
    if par_div > 1.25:
        triggers["par_calib_div"] = round(par_div, 3)
    if calib_par / calib > par_over_single_max:
        triggers["par_over_single"] = round(calib_par / calib, 2)
    # direct co-tenant witness (VERDICT r15 item 1): hypervisor steal
    # across the timed suite — the signal loadavg structurally misses
    # because the co-tenant runs outside this VM's kernel
    if steal_suite > STEAL_TRIGGER_FRAC:
        triggers["steal"] = steal_suite
    contended = bool(triggers)
    rerun = False
    idle_wait_rerun = 0.0
    if contended:
        print(
            f"bench: host contention detected (triggers={triggers}, "
            f"loadavg_start={loadavg_start}, calib_mid={calib_mid}, "
            f"calib_post={calib}, calib_par_mid={calib_par_mid}, "
            f"calib_par_post={calib_par}); re-running timed passes once",
            file=sys.stderr,
        )
        rerun = True
        # the r12/r13 lesson: an immediate rerun lands inside the same
        # contended window — give the co-tenant a bounded chance to
        # leave before burning the one rerun. The 60s settle absorbs
        # OUR just-finished suite's loadavg tail first, so the poll
        # measures the host rather than our own decay; the calib gate
        # then holds the rerun until the calibration itself reads calm
        # (bounded — a persistent co-tenant exhausts it and the rerun
        # proceeds min-folded as before).
        idle_wait_rerun = _idle_wait(settle_sec=60)
        gate2_passed, gate2_samples, gate2_wait = _calib_gate()
        gate_passed = gate_passed or gate2_passed
        gate_samples = gate_samples + gate2_samples
        gate_wait = round(gate_wait + gate2_wait, 1)
        steal0 = _steal_sample()
        timings2, calib_mid2, calib_par_mid2 = run_suite()
        steal_suite = min(steal_suite, _steal_frac(steal0, _steal_sample()))
        calib2 = _calib()
        calib_par2 = _calib_par()
        timings = {k: min(v, timings2[k]) for k, v in timings.items()}
        calib_mid = min(calib_mid, calib_mid2)
        calib = min(calib, calib2)
        calib_par_mid = min(calib_par_mid, calib_par_mid2)
        calib_par = min(calib_par, calib_par2)

    loadavg_end = [round(x, 2) for x in os.getloadavg()]
    total = round(sum(timings.values()), 3)
    core20 = round(sum(v for k, v in timings.items() if k in CORE20), 3)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall seconds (noop-materialized)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpu_calib_sec": calib,
                "cpu_calib_mid_sec": calib_mid,
                "cpu_calib_par_sec": calib_par,
                "cpu_calib_par_mid_sec": calib_par_mid,
                "calib_par_over_single": round(calib_par / calib, 2),
                "loadavg_entry": loadavg_entry,
                "idle_wait_entry_sec": idle_wait_entry,
                "idle_wait_rerun_sec": idle_wait_rerun,
                "loadavg_start": loadavg_start,
                "loadavg_end": loadavg_end,
                "contended": contended,
                "contention_trigger": "|".join(sorted(triggers)) or None,
                "contention_trigger_values": triggers or None,
                "contention_rerun": rerun,
                "calib_gate_sec": CALIB_GATE_SEC,
                "calib_gate_passed": gate_passed,
                "calib_gate_samples": gate_samples,
                "calib_gate_wait_sec": gate_wait,
                "steal_frac_suite": steal_suite,
                "core20_sec": core20,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
