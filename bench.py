"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE COMPACT JSON line as the final
stdout line (a few hundred bytes — round 4's full 4 KB record overflowed
the driver's tail capture and was recorded as ``parsed: null``) and
writes the full per-query record to ``BENCH_FULL.json`` next to this
file.

Two blocks, each in its OWN fresh JVM (subprocess), so numbers stay
round-over-round comparable (round-3 lesson: per-query times drifted a
median 1.19x on byte-identical code purely because the suite grew inside
one JVM — codegen/code-cache/GC accumulation inflates everything run
late in a long-lived process):

- ``core``  — a FROZEN, never-growing set (the round-1 query list + the
  1M-turn pipeline legs + the 2M-turn conversation legs). This block is
  the round-over-round comparison basis and owns the headline
  ``turns_per_sec``. DO NOT add queries to CORE_QUERIES — new operators
  go in the suite block.
- ``suite`` — the full growing operator suite (same flow as round 3's
  bench), kept for breadth; its numbers are comparable only to other
  suite-context numbers.

The emitted JSON carries ``queries`` (suite block, comparable to
BENCH_r03), ``core`` (fresh-JVM frozen block, the basis from round 4
on), and ``host`` sentinels (loadavg + concurrent java/duckdb process
count) so a co-tenant-poisoned run is visible in the record instead of
silently wrong: one sentinel at bench start, plus a start/end bracket
around EACH block (``core_host``/``suite_host``) — this box has
co-tenants outside the container's /proc view whose load arrives
mid-run (observed: the identical fresh-JVM pipeline leg at 4.4s vs
15.4s), and only the bracket shows which block they poisoned.

The headline metric is the transcript pipeline's parse→route→aggregate
throughput (turns/sec) on a synthesized ~1M-turn input (BASELINE.json
north_rule), taken from the CORE block. Run scripts/scaling_bench.py for
the two-parallelism-level scaling-efficiency evidence.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PIPELINE_REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "40000"))

# FROZEN round-over-round comparison core (= the round-1 bench set).
# Never grows; new operators belong in BENCH_QUERIES below.
CORE_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5", "enrich_events", "time_buckets",
    "topk_users", "sessionize", "text_quality", "dedup_minhash",
    "dedup_lsh_jaccard", "dedup_simhash", "ann_cosine_topk", "ann_ivf_assign",
]

BENCH_QUERIES = [
    "tpch_q1", "tpch_q3", "tpch_q5", "enrich_events", "time_buckets",
    "topk_users", "sessionize", "text_quality", "dedup_minhash",
    "dedup_lsh_jaccard", "dedup_simhash", "ann_cosine_topk", "ann_ivf_assign",
    "asof_last_order", "range_order_pairs", "decontaminate_ngrams",
    "text_redact_pii", "sample_pack_sequences", "dedup_incremental",
    "zorder_events", "text_tfidf_topk", "text_dup_gram_frac", "text_chunks",
    "funnel_steps", "rate_spikes", "scd2_user_type", "semantic_dup_pairs",
    "text_inverted_index", "tpch_q18", "text_lm_score", "freq_cms_users",
    "graph_pagerank", "dedup_spans", "validate_events", "hist_event_values",
    "conv_sft_pairs", "sample_weighted", "text_bm25_topk",
    "dedup_winnow_pairs", "ann_pq_topk", "conv_prefix_groups",
    "graph_triangles", "source_overlap",
    "dedup_prefix_jaccard", "sample_importance", "text_bpe_merges",
    "retrieval_rrf", "dedup_lsh_recall", "sample_curriculum",
    "embed_knn_classify", "embed_centroid_outliers", "embed_decontaminate",
    "transcript_latency_mad", "conv_degenerate_runs", "conv_pack_masks",
    "conv_integrity",
    "dedup_pairs_editdist", "conv_truncate_context", "sample_calibrated",
    "text_ngram_diversity", "sketch_hdr_latency",
    "dedup_substring_spans", "sample_epoch_shuffle", "transcript_returns",
    "transcript_grpo_adv", "embed_matryoshka_recall", "text_vocab_growth",
    # round-5 additions (suite grows; the frozen core block stays the
    # round-over-round comparable basis)
    "transcript_status_flaps", "transcript_slo_burn",
    "transcript_retry_recovery", "transcript_response_gap",
    "conv_session_stats", "conv_concurrency", "text_hapax_rate",
    "events_cohort_retention",
    # late round-5 additions (embed_whiten is left out: it re-runs the
    # embed_pca_top fit before transforming, so benching both doubles the
    # iterative-fit time for no extra signal; embed_dup_clusters is left
    # out for the same reason — it re-runs the LSH pair join that
    # semantic_dup_pairs/dedup_lsh_jaccard already time, plus an
    # iterative CC whose per-round cost the graph legs cover)
    "embed_label_balance", "transcript_error_cascade",
    "conv_outcome_by_depth", "text_length_outliers", "embed_pca_top",
    "funnel_latency", "events_session_paths", "orders_basket_pairs",
    "events_stickiness", "orders_reorder_gap",
    "transcript_handoff_outcomes", "orders_cohort_ltv",
    "text_boilerplate_lines", "text_boilerplate_clean",
    # final round-5 batch: CRM/revenue analytics over orders, telemetry
    # screens over events, mixture drift over documents, the iterative
    # k-core peel + clustering coefficient on the skewed synth graph,
    # and the transcript termination-hazard curve
    "orders_rfm_segments", "orders_pareto_share", "orders_ship_sla",
    "orders_benford", "events_debounce", "events_burstiness",
    "events_seasonal_spikes", "hist_equidepth_values",
    "text_source_divergence", "graph_kcore", "graph_clustering_coeff",
    "transcript_abandon_hazard",
]


def host_sentinel() -> dict:
    """Record host idleness evidence at bench start: loadavg and how many
    OTHER java/duckdb processes are running (this process has started no
    JVM yet). A co-tenant Spark/DuckDB job is the documented bench hazard;
    annotating the record beats relying on operator discipline."""
    load1, load5, load15 = os.getloadavg()
    n_java = n_duck = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            comm = open(f"/proc/{pid}/comm").read().strip()
        except OSError:
            continue
        if comm == "java":
            n_java += 1
        elif "duckdb" in comm:
            n_duck += 1
    return {
        "loadavg_1m": round(load1, 2),
        "loadavg_5m": round(load5, 2),
        "java_procs": n_java,
        "duckdb_procs": n_duck,
        "busy": bool(n_java or n_duck or load1 > 0.5 * CPUS),
    }


def _proc_stat_busy_jiffies() -> int:
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return sum(vals) - vals[3] - vals[4]  # minus idle + iowait


def _own_cpu_jiffies() -> int:
    """CPU jiffies of every process VISIBLE in /proc — inside this
    container that is exactly our own tree (bench python + the Spark JVM
    + Arrow workers). Includes each process's reaped-children time
    (cutime/cstime), so short-lived workers aren't lost."""
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            tail = open(f"/proc/{pid}/stat").read().rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue
        # post-comm fields: state=0 … utime=11 stime=12 cutime=13 cstime=14
        total += int(tail[11]) + int(tail[12]) + int(tail[13]) + int(tail[14])
    return total


class ExternalLoad:
    """Co-tenant CPU metering: this box runs co-tenants whose PROCESSES
    are invisible inside the container but whose CPU time shows in the
    host-wide /proc/stat. external = (host busy delta) − (own visible
    delta); unlike loadavg sentinels this is self-load-free, so a block
    can be judged poisoned/clean regardless of its own 32-core burn.
    Snap BEFORE spark.stop() so the JVM's jiffies still count as own."""

    def __init__(self) -> None:
        self.t0 = time.time()
        self.busy0 = _proc_stat_busy_jiffies()
        self.own0 = _own_cpu_jiffies()

    def snap(self) -> dict:
        wall = time.time() - self.t0
        hz = os.sysconf("SC_CLK_TCK")
        ext = (_proc_stat_busy_jiffies() - self.busy0) - (
            _own_cpu_jiffies() - self.own0
        )
        ext_s = max(0.0, ext / hz)
        return {
            "wall_s": round(wall, 1),
            "external_core_s": round(ext_s, 1),
            "external_cores_avg": round(ext_s / max(wall, 1e-9), 2),
        }


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("anendektos-bench")
        .getOrCreate()
    )


def run_pipeline_bench(
    spark, replicas: int
) -> tuple[dict[str, float], int, dict[str, float]]:
    """parse→route→aggregate over synthesized transcripts; returns
    ({addr_mode: elapsed_sec}, n_turns) — BOTH addr legs, `normalize`
    (reference-faithful Arrow-UDF IP canonicalization) and `passthrough`
    (zero-Python shape-validated fast path), so round-over-round pipeline
    comparisons cover both (round-2 judge ask #8). Forces full
    computation via per-sink agg."""
    from pyspark.sql import functions as F

    from anendektos_spark.fixtures import synth_transcripts
    from anendektos_spark.parse import ParseOptions, parse_validate_all
    from anendektos_spark.schemas import KNOWN_TOOLS

    tx = synth_transcripts(
        spark, replicas=replicas, hot_fraction=0.01, malformed_fraction=0.01,
        partitions=CPUS * 4,
    ).persist()
    n_turns = tx.count()  # materialize input before the clock starts

    def run(mode: str) -> list:
        # one-pass CASE-gated validation over all six sinks (parse.py
        # parse_validate_all): single scan + single aggregate shuffle
        validated = parse_validate_all(
            tx, opts=ParseOptions(addr_mode=mode)
        ).filter(F.col("tool").isin(list(KNOWN_TOOLS)))
        return (
            validated.groupBy("tool")
            .agg(
                F.sum(F.when(F.col("reject_reason").isNull(), 1).otherwise(0)).alias("n_good"),
                F.sum(F.when(F.col("reject_reason").isNotNull(), 1).otherwise(0)).alias("n_rej"),
                F.countDistinct("conv_id").alias("n_convs"),
            )
            .collect()
        )

    out: dict[str, float] = {}
    ext: dict[str, float] = {}
    for mode in ("normalize", "passthrough"):
        # warmups: C2 JIT of the six-sink generated classes needs ~3
        # executions to reach steady state (measured 32s/32s/12s/5.4s on the
        # fresh JVM) — a single warmup makes best-of-3 report a half-warm
        # number ~40% above the throughput a long-running cluster job sees
        for _ in range(3):
            run(mode)
        elapsed = float("inf")
        # best-of-5 (was 3): back-to-back identical core blocks measured
        # the normalize leg at 5.07-6.78s (153k-205k turns/s) with ≤1.2
        # external cores in the winning window — co-tenant DRAM-bandwidth
        # pressure is invisible to CPU jiffies, so the only defense is
        # more draws for the min estimator. Input is unchanged, so the
        # statistic stays round-over-round comparable.
        for _ in range(5):
            # co-tenant CPU metered over THIS rep's exact window, so the
            # winning rep carries its own contamination reading (the
            # whole-block meter smears idle gaps and other sections in;
            # measured headline swings 168k-205k turns/s tracking 1.9-3.7
            # external cores — attribution must be per-window)
            mon = ExternalLoad()
            t0 = time.time()
            rows = run(mode)
            dt = time.time() - t0
            if dt < elapsed:
                elapsed = dt
                ext[mode] = mon.snap()["external_cores_avg"]
        assert sum(r.n_good + r.n_rej for r in rows) > 0
        out[mode] = elapsed
    tx.unpersist()
    return out, n_turns, ext


def run_conv_bench(spark, n_turns: int) -> dict[str, float]:
    """Conversation-grain ops over a persisted 2M-turn synthetic
    transcript relation (functions/convops.py): reassembly, tool-Markov
    transitions, latency profile. Input is materialized before the clock
    starts; each op timed best-of-3 on the warm cache (the generator is
    synthesis overhead, not pipeline work)."""
    from anendektos_spark.functions import convops

    tx = convops.synth_conv(spark, n_turns, partitions=CPUS * 4).persist()
    tx.count()
    out: dict[str, float] = {}
    for name, fn in (
        ("conv_reconstruct_2m", convops.conv_reconstruct),
        ("conv_transitions_2m", convops.tool_transitions),
        ("conv_latency_2m", convops.turn_latency),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _force_eval(fn(tx))
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    tx.unpersist()
    return out


def run_conv_dup_bench(spark, n_turns: int) -> dict[str, float]:
    """Conversation-grain curation ops over the duplication-injecting
    generator (exact + near-dup template copies): boilerplate-turn
    detection, preference-pair mining, and full LSH near-dup detection
    at conversation grain. Template count scales with the corpus so
    copies-per-template stays ~12 (pair output stays linear in convs —
    the shape a dedup run has on real crawl mirrors)."""
    from anendektos_spark.functions import convops, dedup

    n_convs = n_turns // convops.TURNS_PER_CONV
    templates = max(4, n_convs // 12)
    tx = convops.synth_conv_dup(spark, n_turns, templates=templates).persist()
    tx.count()
    out: dict[str, float] = {}
    for name, fn in (
        ("conv_boilerplate_500k", convops.boilerplate_turns),
        ("conv_pref_pairs_500k", convops.pref_pairs),
        (
            "conv_dedup_500k",
            lambda d: dedup.lsh_jaccard(
                convops.conv_reconstruct(d),
                id_col="conv_id",
                text_col="transcript",
            ),
        ),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _force_eval(fn(tx))
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    tx.unpersist()
    return out


def run_grok_bench(spark, n_turns: int) -> dict[str, float]:
    """The north_star grok pipeline (functions/transcript.py) over a
    persisted 2M-turn marker-bearing transcript relation: codegen-regexp
    parse → broadcast enrich → per-sink summary, and the reject channel.
    Same protocol as run_conv_bench (input materialized first,
    best-of-3 warm-JIT)."""
    from anendektos_spark.functions import transcript

    tx = transcript.synth_transcript(spark, n_turns, partitions=CPUS * 4).persist()
    tx.count()
    dim = transcript.tool_dim(spark)
    out: dict[str, float] = {}
    for name, fn in (
        ("transcript_grok_summary_2m",
         lambda d: transcript.tool_summary(transcript.parse_turns(d))),
        ("transcript_grok_enrich_2m",
         lambda d: transcript.enrich_agg(transcript.parse_turns(d), dim)),
        ("transcript_grok_rejects_2m", transcript.reject_turns),
        # round-3 agent-behavior analytics over the same parsed stream
        ("transcript_retry_loops_2m",
         lambda d: transcript.category_retry_loops(
             transcript.parse_turns(d), dim, 2)),
        ("transcript_latency_pctl_2m",
         lambda d: transcript.latency_percentiles(transcript.parse_turns(d))),
    ):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            _force_eval(fn(tx))
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    tx.unpersist()
    return out


def _force_eval(df) -> int:
    """Evaluate EVERY output column, not just enough to count: a bare
    count() lets Catalyst prune unreferenced projections, so narrow-map
    queries would measure roughly scan+count. Aggregating an xxhash64 of
    all columns forces full computation with O(1) result transfer."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*df.columns)).alias("h"),  # xor: no ANSI overflow
    ).collect()[0]
    return row["n"]


def _run_query_list(spark, names: list[str]) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in names:
        # best of 3: the first run pays Janino codegen compile + C2 JIT of
        # the query's generated classes (one-time per plan shape, amortized
        # to nothing on real corpora; big plans need a second rep to fully
        # warm); the last run is the steady state a cluster job sees. Same
        # protocol as scripts/scaling_bench.py.
        # clearCache before EVERY timed run: operators that persist shared
        # relations (dedup._cached_sets) must pay their fill cost inside
        # the measurement, and one query's cache must not subsidize the
        # next — each number is a cold-cache, warm-JIT run.
        best, n = float("inf"), 0
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            n = _force_eval(df)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    return timings


def run_block_core() -> dict:
    """The frozen comparison block, meant for a FRESH JVM: pipeline legs
    first (they own the headline), then the round-1 query set, then the
    conversation legs. Nothing here may grow between rounds."""
    h0 = host_sentinel()
    mon = ExternalLoad()
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    pipe_legs, n_turns, pipe_ext = run_pipeline_bench(spark, PIPELINE_REPLICAS)
    timings = _run_query_list(spark, CORE_QUERIES)
    spark.catalog.clearCache()
    spark._jvm.System.gc()
    timings.update(run_conv_bench(spark, 2_000_000))
    timings["zeek_pipeline_1m"] = round(pipe_legs["normalize"], 3)
    timings["zeek_pipeline_1m_passthrough"] = round(pipe_legs["passthrough"], 3)
    out = {
        "queries": timings,
        "turns_per_sec": round(n_turns / pipe_legs["normalize"], 1),
        "turns_per_sec_passthrough": round(n_turns / pipe_legs["passthrough"], 1),
        "pipeline_turns": n_turns,
        # co-tenant cores during the WINNING rep's exact window, per leg —
        # the contamination reading that belongs to the headline number
        "pipeline_ext_cores": pipe_ext,
        # per-block sentinels: the start-only sentinel in main() cannot
        # see a co-tenant that ARRIVES mid-run (observed: the same
        # fresh-JVM pipeline leg measured 4.4s vs 15.4s purely from
        # external host load) — bracketing each block makes a poisoned
        # block identifiable in the record
        "host_start": h0,
        "external_load": mon.snap(),
        "host_end": host_sentinel(),
    }
    spark.stop()
    return out


def run_block_suite() -> dict:
    """The full growing operator suite (round-3 flow, pipeline first)."""
    h0 = host_sentinel()
    mon = ExternalLoad()
    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # pipeline leg FIRST, on the fresh JVM: measured 3x degradation (5.9s
    # -> 18.5s) when it runs after the 18-query suite has filled the old
    # gen with codegen/broadcast remnants
    pipe_legs, n_turns, pipe_ext = run_pipeline_bench(spark, PIPELINE_REPLICAS)

    timings = _run_query_list(spark, BENCH_QUERIES)

    for section, n in (
        (run_conv_bench, 2_000_000),
        (run_conv_dup_bench, 500_000),
        (run_grok_bench, 2_000_000),
    ):
        # section hygiene: the operator suite leaves persisted relations
        # (cleared per-rep only at rep START, so the last query's cache
        # survives) plus localCheckpoint/broadcast blocks that the catalog
        # cache does NOT track (graph_pagerank lineage truncation,
        # dedup_incremental indexes). Those squeeze executor storage
        # memory and were measured to inflate conv_dedup_500k 7.2s → 43s.
        # clearCache drops the former; a driver GC lets ContextCleaner
        # reap the latter (RDD/broadcast cleanup is GC-triggered).
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        timings.update(section(spark, n))

    timings["zeek_pipeline_1m"] = round(pipe_legs["normalize"], 3)
    timings["zeek_pipeline_1m_passthrough"] = round(pipe_legs["passthrough"], 3)
    out = {
        "queries": timings,
        "turns_per_sec": round(n_turns / pipe_legs["normalize"], 1),
        "turns_per_sec_passthrough": round(n_turns / pipe_legs["passthrough"], 1),
        "pipeline_turns": n_turns,
        # co-tenant cores during the WINNING rep's exact window, per leg —
        # the contamination reading that belongs to the headline number
        "pipeline_ext_cores": pipe_ext,
        "host_start": h0,
        "external_load": mon.snap(),
        "host_end": host_sentinel(),
    }
    spark.stop()
    return out


def _spawn_block(block: str) -> dict:
    """Run one block in its own fresh interpreter+JVM; stderr streams
    through, stdout's last line is the block's JSON."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--block", block],
        stdout=subprocess.PIPE,
        stderr=sys.stderr,
        text=True,
        check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    if "--block" in sys.argv:
        block = sys.argv[sys.argv.index("--block") + 1]
        result = run_block_core() if block == "core" else run_block_suite()
        print(json.dumps(result))
        return

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    sentinel = host_sentinel()
    if sentinel["busy"]:
        print(f"# WARNING: host not idle at bench start: {sentinel}", file=sys.stderr)

    core = _spawn_block("core")
    suite = _spawn_block("suite")

    pc, ps = core["queries"], suite["queries"]
    print(
        "# core pipeline: {0} turns {1:.1f}s = {2}/s (passthrough {3}/s); "
        "suite-context pipeline = {4}/s".format(
            core["pipeline_turns"], pc["zeek_pipeline_1m"],
            core["turns_per_sec"], core["turns_per_sec_passthrough"],
            suite["turns_per_sec"],
        ),
        file=sys.stderr,
    )

    total = round(sum(ps.values()), 3)
    full = {
        "metric": "operator suite + 1M-turn parse/route/aggregate pipeline wall time",
        "value": total,
        "unit": "sec",
        # suite-context numbers — comparable to BENCH_r03's "queries"
        "queries": ps,
        # frozen fresh-JVM block — THE round-over-round basis from r4 on
        "core": pc,
        "sf": sf,
        # headline = the core block's fresh-JVM pipeline throughput
        "turns_per_sec": core["turns_per_sec"],
        "turns_per_sec_passthrough": core["turns_per_sec_passthrough"],
        "turns_per_sec_suite": suite["turns_per_sec"],
        "pipeline_turns": core["pipeline_turns"],
        # co-tenant cores during the headline legs' winning reps
        "pipeline_ext_cores": core.get("pipeline_ext_cores"),
        "cpus": CPUS,
        "host": sentinel,
        "core_host": {"start": core.get("host_start"), "end": core.get("host_end"),
                      "external": core.get("external_load")},
        "suite_host": {"start": suite.get("host_start"), "end": suite.get("host_end"),
                       "external": suite.get("external_load")},
    }
    # The full record (~4 KB with 70 per-query timings) overflowed the
    # driver's stdout tail capture in round 4 (BENCH_r04.json recorded
    # "parsed": null with the JSON truncated mid-string). Write the full
    # record to a file and print a COMPACT headline JSON — a few hundred
    # bytes — as the FINAL stdout line so the driver always parses it.
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(f"# full per-query record -> {full_path}", file=sys.stderr)
    ext = core.get("pipeline_ext_cores") or {}
    print(json.dumps({
        "metric": "1M-turn parse/route/aggregate pipeline throughput (fresh-JVM core block)",
        "value": core["turns_per_sec"],
        "unit": "turns/sec",
        "queries": {
            "pipeline_normalize_1m": pc.get("zeek_pipeline_1m"),
            "pipeline_passthrough_1m": pc.get("zeek_pipeline_1m_passthrough"),
            "tpch_q1": pc.get("tpch_q1"),
            "dedup_minhash": pc.get("dedup_minhash"),
            "ann_cosine_topk": pc.get("ann_cosine_topk"),
            "suite_70q_wall": total,
        },
        "sf": sf,
        "turns_per_sec": core["turns_per_sec"],
        "turns_per_sec_passthrough": core["turns_per_sec_passthrough"],
        "pipeline_turns": core["pipeline_turns"],
        "cpus": CPUS,
        "host_busy": sentinel["busy"],
        "ext_cores": ext,
        "full_record": "BENCH_FULL.json",
    }))


if __name__ == "__main__":
    main()
