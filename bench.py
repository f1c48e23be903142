"""Benchmark harness: runs the registered query suite and prints ONE JSON line.

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default all cores)

Each query is fully materialized through the `noop` sink (distributed
execution, no driver collect) and timed wall-clock. The headline metric is
the sum of per-query MEDIANS over three warm runs after a full warm-up pass
over the suite — JVM/whole-stage-codegen compilation and Python-worker pool
spin-up are excluded, as the reference's DuckDB engine is likewise measured
warm and compile cost is a small-data artifact that amortizes to zero at
scale. The cold (first-pass) total is reported alongside as
``cold_total_sec``.

Attribution over single-shot numbers (VERDICT r5 task 2): sub-second local
timings wobble 20-40% shot-to-shot, which round-over-round reads as phantom
regressions.  The artifact therefore records, per query, the median AND the
[min, max] spread of the three runs (``spread``), plus the physical strategy
each adaptive operator chose (``strategies`` — the dedup auto paths re-plan
from corpus statistics, so a bitmask→LSH flip across data tiers is a
different algorithm, not a slowdown).  A cross-round delta smaller than the
union of the two rounds' spreads is noise, not signal.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dlt_iceberg_spark.queries import REGISTRY
from dlt_iceberg_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


#: every gate-cache mkdtemp prefix the query registry uses — the EXACT
#: list (grep `mkdtemp(prefix=` under dlt_iceberg_spark/), not prefix
#: families: r11's `"lake_"`/`"ann_"` families could have matched an
#: unrelated process's /tmp dirs (VERDICT r11 item 6).  A new gate must
#: add its prefix here or its debris never gets cleaned.
_GATE_TMP_PREFIXES = (
    "ann_del_", "ann_idx_", "ann_opq_idx_", "ann_pq_idx_",
    "ann_pqres_idx_", "ann_rb_", "ann_rbal_", "ann_sq_",
    "dedup_idx_",
    "lake_adddflt_", "lake_bloom_", "lake_bucket_", "lake_cdc_",
    "lake_cdcstream_", "lake_clone_", "lake_count_", "lake_cret_",
    "lake_expect_", "lake_icbrt_", "lake_matview_", "lake_merge_",
    "lake_minmax_", "lake_mirror_", "lake_mvchain_", "lake_ndv_",
    "lake_overlap_", "lake_partagg_", "lake_partndv_", "lake_posdel_",
    "lake_promote_", "lake_rename_", "lake_rollup_", "lake_sink_",
    "lake_sinkp_", "lake_specevo_", "lake_stats_", "lake_tail_",
    "lake_txn_",
    "sdedup_",
    "stream_veccdc_", "stream_vecidx_",
)


def _clean_gate_debris(min_age_sec: float = 3600) -> int:
    """Remove leftover gate-cache warehouses from PRIOR processes under
    /tmp before any pass runs — accumulated debris (15 GB observed after
    a long session) measurably inflates timings via fs-cache pressure
    (VERDICT r10 task 4).  Safe by construction: only this repo's known
    mkdtemp prefixes are touched, only BEFORE this process creates its
    own (the per-query module caches hold live paths within a process,
    never across processes), and only entries older than ``min_age_sec``
    — a CONCURRENTLY running oracle/test process's fresh caches are never
    raced."""
    import shutil
    import tempfile

    root = tempfile.gettempdir()
    cutoff = time.time() - min_age_sec
    n = 0
    for name in os.listdir(root):
        if not name.startswith(_GATE_TMP_PREFIXES):
            continue
        path = os.path.join(root, name)
        try:
            if os.path.getmtime(path) > cutoff:
                continue
        except OSError:
            continue
        shutil.rmtree(path, ignore_errors=True)
        n += 1
    return n


def timed_passes(
    spark,
    specs: dict,
    sf_dir: str,
    n_runs: int = 3,
    extra_below: float = 2.0,
    extra_runs: int = 4,
    stream_spark=None,
) -> tuple[dict[str, float], dict[str, list[float]], dict[str, str]]:
    """n_runs warm passes over the suite; returns (median, [min, max]
    spread, adaptive-strategy trace) per query.  clearCache between queries
    so an operator-internal persist() never leaks cached data into another
    measurement via logical-plan cache hits.

    Isolation (VERDICT r8 finding 1, finished per r9 task 7): streaming
    queries build/tear micro-batch harness state (Python data-source
    runners, checkpoint dirs) that perturbs whatever runs NEXT — so the
    groups are PHASE-SEPARATED: every steady-state sample (main passes
    AND extra samples) is taken before the first timed ``stream_*``
    query, and the stream block runs on ``stream_spark`` (its own
    SparkSession: separate SQL conf/catalog/cache state) when given.
    Cross-group interference can then only land inside the stream block
    that causes it.

    Sub-``extra_below``-second queries get ``extra_runs`` additional
    samples (VERDICT r7 task 4, widened to 7 total per r8 finding 1):
    short local timings wobble 20-40% shot-to-shot and the growing suite
    adds session-level interference — a 7-sample median absorbs outliers
    a 3-sample median moves with, so cross-round deltas on unchanged code
    stay inside spread."""
    from dlt_iceberg_spark.operators import dedup as _dedup

    stream_spark = stream_spark if stream_spark is not None else spark
    samples: dict[str, list[float]] = {name: [] for name in specs}
    strategies: dict[str, str] = {}

    def _one(name: str) -> None:
        s = stream_spark if name.startswith("stream_") else spark
        s.catalog.clearCache()
        _dedup.STRATEGY_TRACE.clear()
        t0 = time.perf_counter()
        materialize(specs[name].fn(s, sf_dir))
        samples[name].append(time.perf_counter() - t0)
        if _dedup.STRATEGY_TRACE:
            strategies[name] = ",".join(
                f"{op}:{s}" for op, s in sorted(_dedup.STRATEGY_TRACE.items())
            )

    steady = [n for n in specs if not n.startswith("stream_")]
    streaming = [n for n in specs if n.startswith("stream_")]
    for group in (steady, streaming):
        for _ in range(n_runs):
            # a requested full GC at each pass boundary: collection debt
            # from the PREVIOUS pass can't land mid-query in this one
            # (one GC hiccup inside a 0.5 s query is a 40% outlier —
            # VERDICT r10 task 4)
            spark.sparkContext._jvm.System.gc()
            for name in group:
                _one(name)
        fast = [n for n in group if statistics.median(samples[n]) < extra_below]
        for _ in range(extra_runs):
            for name in fast:
                _one(name)
    medians = {n: round(statistics.median(s), 4) for n, s in samples.items()}
    spread = {n: [round(min(s), 4), round(max(s), 4)] for n, s in samples.items()}
    return medians, spread, strategies, samples


def trimmed_spread(samples: dict[str, list[float]]) -> dict[str, list[float]]:
    """[min, max] AFTER dropping the single highest and lowest sample
    (when ≥5 samples exist).  The raw max-min range grows mechanically
    with sample count — r8's 5→7 sample bump WIDENED the legacy
    ``spread`` stat while making the medians strictly more reliable —
    so cross-round "did X regress?" calls should read this stat (one GC
    hiccup in 7 shots no longer defines the band) next to the raw one;
    both are recorded, neither replaces the other."""
    out = {}
    for n, s in samples.items():
        t = sorted(s)[1:-1] if len(s) >= 5 else sorted(s)
        out[n] = [round(t[0], 4), round(t[-1], 4)]
    return out


#: the sf1 tier times only the suite's most expensive queries (VERDICT r4
#: task 8 names q18/q21/dedup_incremental/dsir_select et al) — at ~10× data
#: these are the plans whose scale behavior is worth tracking; the cheap
#: tail stays noise-level even at sf1.
#:
#: Reading the dedup numbers across tiers: the driver fixture's documents
#: table draws from a ~31-token vocabulary, so at sf0.1 the adaptive
#: similarity operators take the exact ≤64-token BITMASK path; the sf1
#: replicas' vowel rotation widens the combined vocabulary past 64, which
#: correctly flips them to the LSH path over a corpus where most
#: within-replica pairs ARE near-dups (quadratic match density by
#: construction).  The sf0.1→sf1 ratio for dedup_minhash_lsh /
#: dedup_incremental therefore compares different strategies on different
#: densities — per-strategy scaling is linear (profiled standalone), and
#: the sf1 wall time is OUTPUT-bound: dedup_incremental materializes
#: ~9.6M verified pairs at sf1 (measured), so its ~45 s is the cost of
#: the answer, not of the search.
SF1_QUERIES = [
    "dedup_incremental", "dsir_select", "dedup_transitive_clusters",
    "substring_dup_profile", "dedup_minhash_lsh", "select_quality_budget",
    "multimodal_image_dedup", "dedup_simhash_pairs", "lm_perplexity",
    "semantic_dedup", "ann_ivf", "q21_waiting_suppliers",
    "q18_large_orders", "q10_returned_customers", "q1_pricing_summary",
    "events_sessions",
    # r6 additions whose scale behavior is worth tracking: the substring
    # REMOVAL pass (window-text shuffle + HOF reassembly), the BLAS kNN
    # kernel, and the NB classifier (multi-aggregate model build over a
    # persisted input)
    "dedup_substring_removal", "knn_label_vote", "text_nb_language",
    # r6-late additions: BPE iteration-zero (corpus-sized wordcount then
    # |vocab|-sized pair relation), the dense gap-fill grid (key x bucket,
    # corpus-size-independent densify), and the CDC-maintained rollup
    # (build cost is the one-off table load; refreshes are O(changed))
    "text_bpe_pairs", "events_gapfill", "lake_rollup_incremental",
    # r6-final additions: the streaming mirror (CDC replication whose
    # per-epoch cost follows change volume) and write-time expectations
    # (one counting/filter pass over the batch)
    "stream_lake_mirror", "lake_expectations",
    # r7 (VERDICT r6 task 6): the remaining lake streaming surfaces and the
    # multi-table transaction at ~1.5M orders, where micro-batch THROUGHPUT
    # (not the fixed availableNow harness overhead that dominates sf0.1)
    # is the visible quantity — see streaming_rows_per_sec in the artifact
    "stream_lake_tail", "stream_lake_changes", "stream_lake_sink",
    "lake_multi_table_txn",
    # r7: the delta-join IVM over ~1.5M orders x 150k customers — build
    # is the one-off full join; the timed warm read is the maintained view
    "lake_matview_join",
    # r8 (VERDICT r7 task 5): the surfaces whose costs are O(touched)/
    # O(metadata)-claimed and should be shown ~flat at 10x data — the
    # outer join-view variants, the rescan rollup, and the two
    # metadata-aggregate probes
    "lake_matview_left", "lake_matview_full", "lake_rollup_minmax",
    "lake_count_pushdown", "lake_partition_aggregate",
    # late-r8: the corpus-scale retrieval pair (BM25's per-query cost must
    # track matched docs, not vocabulary; hybrid adds the broadcast-vector
    # cosine fuse) and the NDV-statistics probe (metadata-only at any
    # size — the O(refs) claim should be shown ~flat at 10x data)
    "text_bm25_topk", "hybrid_search", "lake_ndv_stats",
    # late-r8 metadata surfaces with the same ~flat-at-10x claim: grouped
    # NDV, cross-table sketch overlap, and the zero-copy clone
    "lake_partition_ndv", "lake_sketch_overlap", "lake_clone_divergence",
    # r9: the persisted IVF index (build+append are the one-off cost; the
    # timed warm read is the probe-all query over the stored lists), the
    # partitioned native sink (streaming throughput with per-tuple file
    # splitting), and clone-aware retention (metadata-only — ~flat at 10x)
    "ann_ivf_persisted", "stream_sink_partitioned", "lake_clone_retention",
    # r9-late: the codes-only IVF-PQ probe (ADC over pruned partitions —
    # the scan should track codes bytes, not fp32 bytes)
    "ann_pq_persisted",
    # r10: the vector deletion/rebuild lifecycle — the claims worth
    # defending at 10x data are "delete maintenance is O(batch) at any
    # index size" (MoR equality deletes, zero data rewritten; the probe
    # pays one broadcast anti-join) and "rebuild is ONE clustered rewrite"
    # (cost tracks index bytes, not history); the CDC maintainer's
    # per-epoch cost follows change volume
    "ann_delete_lifecycle", "ann_rebuild", "stream_vector_cdc",
    # r10-late: the codes-only SQ probe — scan bytes should track int8
    # lanes (4x under fp32) while scoring stays whole-stage-codegen JVM
    "ann_sq_persisted",
    # r11 (VERDICT r10 task 7): ann_sq times the TRAIN+ENCODE path too
    # (per-invocation exact sq_train — now a 2-expression posexplode agg,
    # so its cost should track corpus rows, never dimension); ann_rebalance
    # times the hot-list split whose claim is O(hot list), not O(index)
    "ann_sq", "ann_rebalance",
    # r11-late: the residual IVF-PQ probe through the probe-gated ADC
    # kernel — per-batch cost tracks (probing queries × list rows), and
    # executor output is local top-k, not |batch|·|Q|
    "ann_pq_residual",
    # r11 optimization round: the expression-dedup restructures (gopher
    # n-gram builds 15→9, repetition split 19→1, quality split 12→1 per
    # row) remove per-ROW cpu work, so their win should GROW with corpus
    # size — these rows are the 10x evidence; ann_opq adds the
    # OPQ-rotated probe (rotation is a broadcast matmul, O(probed rows))
    "text_gopher_rules", "text_repetition", "text_tfidf_terms", "ann_opq",
]

#: streaming queries whose sf1 row counts are turned into a rows/sec
#: figure (sink-row throughput of the whole micro-batch pipeline)
SF1_STREAMING = [
    "stream_lake_tail", "stream_lake_changes", "stream_lake_mirror",
    "stream_lake_sink",
]

SF1_DIR = "/tmp/spark_graft_sf1"


def run_sf1() -> None:
    """Opt-in sf1 tier: generate the ~6M-lineitem dataset if missing
    (tools/gen_sf.py, deterministic), one warm + one timed pass over the
    heavy-query list, one JSON line + BENCH_SF1.json."""
    from dlt_iceberg_spark.session import get_spark

    _clean_gate_debris()
    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    # same isolation policy as main(): phase separation, single session
    # (the two-session mode measured strictly worse — see main())
    stream_spark = (
        spark.newSession()
        if os.environ.get("SPARK_GRAFT_STREAM_SESSION", "0") == "1"
        else spark
    )
    if not os.path.isdir(os.path.join(SF1_DIR, "lineitem.parquet")):
        from tools.gen_sf import generate

        generate(spark, "/root/testdata/sf0.1", SF1_DIR, 10)
    specs = {name: REGISTRY[name] for name in SF1_QUERIES}
    for name, spec in specs.items():  # warm (codegen + footers)
        s = stream_spark if name.startswith("stream_") else spark
        s.catalog.clearCache()
        materialize(spec.fn(s, SF1_DIR))
    times, spread, strategies, sf1_samples = timed_passes(
        spark, specs, SF1_DIR, stream_spark=stream_spark
    )
    # micro-batch throughput for the streaming surfaces: result rows /
    # median wall — at sf1 the fixed per-batch harness cost is amortized,
    # so this tracks the executor-side Arrow read/stage rate
    rows_per_sec = {}
    for name in SF1_STREAMING:
        n_rows = specs[name].fn(stream_spark, SF1_DIR).count()
        if times[name] > 0:
            rows_per_sec[name] = round(n_rows / times[name], 1)
    payload = json.dumps(
        {
            "metric": "sf1_heavy_queries_wall",
            "value": round(sum(times.values()), 4),
            "unit": "sec",
            "queries": times,
            "sf": 1,
            "n_queries": len(times),
            "spread": spread,
            "strategies": strategies,
            "streaming_rows_per_sec": rows_per_sec,
        }
    )
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_SF1.json"), "w"
    ) as f:
        f.write(payload + "\n")
    spark.stop()
    print(payload, flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    debris = _clean_gate_debris()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    if debris:
        print(f"cleaned {debris} stale gate-cache dirs from /tmp", file=sys.stderr)
    # Isolation (VERDICT r9 task 7), measured A/B at sf0.1 this round:
    # PHASE SEPARATION alone (all steady samples before the first timed
    # stream query, one session) gives steady median_rel_spread 0.306 /
    # trimmed 0.173 and total 88.9 s, while additionally running the
    # stream block in ITS OWN SparkSession (shared JVM) made every group
    # WORSE — steady 0.459, total 100.0 s, a broad +15-40% tax on
    # unrelated steady queries (two sessions duplicate session-scoped JVM
    # state; the stream group's own spread was identical either way).
    # Default is therefore single-session; SPARK_GRAFT_STREAM_SESSION=1
    # re-enables the two-session mode for re-measurement.
    two_sessions = os.environ.get("SPARK_GRAFT_STREAM_SESSION", "0") == "1"
    stream_spark = spark.newSession() if two_sessions else spark

    # warm-up pass: JVM + parquet footer caches + codegen compile + Python
    # workers; stream fixtures warm in THEIR session
    t0 = time.perf_counter()
    for name, spec in REGISTRY.items():
        materialize(
            spec.fn(stream_spark if name.startswith("stream_") else spark, sf_dir)
        )
    cold_total = round(time.perf_counter() - t0, 4)

    # three timed passes; per query report the MEDIAN with [min, max]
    # spread so cross-round deltas are attributable (see module docstring)
    times, spread, strategies, samples = timed_passes(
        spark, dict(REGISTRY), sf_dir, stream_spark=stream_spark
    )
    # Scaling-contract observability (VERDICT r11 task 2): the driver's
    # low-core control run flagged `suspect_cpus_ignored` because nothing
    # in the artifact PROVED which parallelism the session actually ran
    # at.  Record the effective master, the scheduler's defaultParallelism
    # and $SPARK_GRAFT_CPUS-as-seen in both output forms, so a ≈1
    # low/high-core ratio is attributable to SF-boundedness, not to an
    # ignored env var.
    master = spark.sparkContext.master
    default_par = spark.sparkContext.defaultParallelism
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    total = round(sum(times.values()), 4)
    tspread = trimmed_spread(samples)
    # Interference-immune companion stat (r11): on an otherwise-deterministic
    # warm workload, host-side interference only ever ADDS time, so the
    # per-query sample MINIMUM is the best estimate of the true cost under a
    # noisy hypervisor neighbor.  The headline metric stays the median sum
    # (unchanged methodology); min_total_sec quantifies how much of a given
    # capture is machine noise (value >> min_total_sec = polluted window).
    min_total = round(sum(min(s) for s in samples.values()), 4)
    payload = json.dumps(
        {
            "metric": "suite_total_wall",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": sf_val,
            "n_queries": len(times),
            "master": master,
            "default_parallelism": default_par,
            "cpus_env": cpus_env,
            "cold_total_sec": cold_total,
            "min_total_sec": min_total,
            "spread": spread,
            "spread_trimmed": tspread,
            "samples": {n: [round(x, 4) for x in s] for n, s in samples.items()},
            "strategies": strategies,
        }
    )
    # Persist to a file so the driver can parse the result even if the
    # JVM interleaves stray output on stdout, then stop Spark BEFORE
    # printing so the JSON is guaranteed to be the final stdout line.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_result.json")
    with open(out_path, "w") as f:
        f.write(payload + "\n")
    spark.stop()
    sys.stdout.flush()
    print(payload, flush=True)
    # The driver captures only the LAST 2000 chars of stdout and parses the
    # final line — the full 88-query payload is ~2.6 KB compact, so its line
    # start falls outside the captured tail and json.loads can never succeed
    # (this is exactly why BENCH_r01-r03 all recorded "parsed": null).  Emit
    # a final SHORT line with the same contract shape: headline metric plus
    # as many per-query times as fit (most expensive first — the ones worth
    # grading), the rest summarized.  Full detail stays one line up and in
    # bench_result.json.
    #
    # Why the short line can never carry all 145 queries (VERDICT r11
    # task 2 asked to "raise the budget"): 145 entries at ~24 chars each
    # is ~3.5 KB, while the driver's captured tail is 2000 chars — a line
    # longer than that loses its opening brace and json.loads fails (the
    # exact r01-r03 failure mode).  The budget below is therefore pinned
    # just under the tail size; entries the cut drops are NOT dropped
    # queries (every registered query ran — `n_queries` counts them and
    # `queries_omitted` counts the cut), and the full per-query map is in
    # `full_results`.  Cross-round membership churn in this map is a
    # print-cutoff artifact, never a drop.
    budget = 1900
    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    rel_spreads = [
        (spread[n][1] - spread[n][0]) / t for n, t in times.items() if t > 0
    ]
    rel_trimmed = [
        (tspread[n][1] - tspread[n][0]) / t for n, t in times.items() if t > 0
    ]
    # per-group dispersion: the phase-separated steady block is the one
    # whose stability the isolation work should show
    rel_steady = [
        (spread[n][1] - spread[n][0]) / t
        for n, t in times.items()
        if t > 0 and not n.startswith("stream_")
    ]
    rel_stream = [
        (spread[n][1] - spread[n][0]) / t
        for n, t in times.items()
        if t > 0 and n.startswith("stream_")
    ]
    short: dict = {
        "metric": "suite_total_wall",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": sf_val,
        "n_queries": len(times),
        "master": master,
        "default_parallelism": default_par,
        "cpus_env": cpus_env,
        "queries_omitted": len(times),
        # per-query medians (3-7 samples); two dispersion summaries —
        # legacy (max-min)/median, whose band widens mechanically with
        # sample count, and the 1-high/1-low-trimmed form that a single
        # GC hiccup can't define.  Deltas inside these bands are machine
        # noise, not regressions; per-query [min,max] + raw samples are
        # in bench_result.json.
        "min_total_sec": min_total,
        "median_rel_spread": round(statistics.median(rel_spreads), 3),
        "max_rel_spread": round(max(rel_spreads), 3),
        "median_rel_spread_trimmed": round(statistics.median(rel_trimmed), 3),
        "median_rel_spread_steady": round(statistics.median(rel_steady), 3),
        "median_rel_spread_stream": (
            round(statistics.median(rel_stream), 3) if rel_stream else None
        ),
        "full_results": "bench_result.json",
    }
    for name, t in ranked:
        short["queries"][name] = round(t, 2)
        short["queries_omitted"] = len(times) - len(short["queries"])
        if len(json.dumps(short, separators=(",", ":"))) > budget:
            del short["queries"][name]
            short["queries_omitted"] = len(times) - len(short["queries"])
            break
    print(json.dumps(short, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    if "--sf1" in sys.argv:
        run_sf1()
    else:
        main()
