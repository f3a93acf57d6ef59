"""Two-parallelism-level scaling benchmark (BASELINE.json north_rule).

The rule's N-vs-4N-executor criterion can't use a real cluster in this
sandbox, so per the documented protocol we run the identical job on the
identical input at two local parallelism levels (N and 4N cores) and
report throughput at both plus scaling efficiency =
(tput_4N / tput_N) / 4.

Levels are local[4] vs local[16]: a 4/8/16/32 sweep on this 32-core VM
shows near-linear scaling through 16 cores (0.90-1.0 incremental
efficiency) and THROUGHPUT INVERSION at 32 (memory-bandwidth/GC
contention: 306k turns/s at 16 cores vs 256k at 32) — so 4-vs-16 is the
pair that actually varies parallelism rather than host saturation.

Each level runs in its own subprocess (fresh JVM) so executor-thread
count is the only variable; per level the job runs warm (one warmup +
`--runs` timed repetitions, best taken) so constant costs — JVM start,
codegen compilation, Python worker fork — don't pollute the scaling
signal. Writes BENCH_SCALING_RAW.md (BENCH.md is the curated analysis).

Usage: python scripts/scaling_bench.py [--replicas 40000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

WORKER = """
import json, sys, time
sys.path.insert(0, "/root/repo")
cores, replicas, runs, mode, job = (int(sys.argv[1]), int(sys.argv[2]),
                                    int(sys.argv[3]), sys.argv[4], sys.argv[5])
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cores}]")
    .config("spark.sql.shuffle.partitions", str(2 * cores))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "24g")
    # make the JVM behave like an N-core host: GC + JIT thread pools and
    # Runtime.availableProcessors scale with the simulated cluster size
    # instead of the physical 32-core box (otherwise the local[8] level
    # borrows 32-core GC bandwidth and the measured efficiency is bogus)
    .config("spark.driver.extraJavaOptions", f"-XX:ActiveProcessorCount={cores}")
    .appName(f"scaling-{cores}").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from anendektos_spark.fixtures import synth_transcripts
from anendektos_spark.functions import transcript
from anendektos_spark.parse import parse_sink, parse_validate_all, ParseOptions
from anendektos_spark.schemas import KNOWN_TOOLS

# identical input at every level: fixed replicas, fixed partition count
if job in ("grok", "hdr"):
    # the north_star grok pipeline's input: marker-bearing conversation
    # transcripts (~25 turns per zeek-replica keeps row counts comparable)
    tx = transcript.synth_transcript(spark, replicas * 25, partitions=128).persist()
elif job in ("convdedup", "winnow", "prefixjoin", "pack", "substr"):
    # the curation legs' input: duplication-injecting conversation
    # generator (~12 turns/replica ≈ the suite's 500k-turn leg at the
    # default 40k replicas). Materialized to DISK, not cache: these jobs'
    # operators persist internal relations (dedup._cached_sets), so the
    # measurement loop clearCache()s before every run — the input must
    # survive that.
    import tempfile
    from anendektos_spark.functions import convops, dedup
    n_turns = replicas * 12
    n_convs = n_turns // convops.TURNS_PER_CONV
    d = tempfile.mkdtemp() + "/tx"
    convops.synth_conv_dup(
        spark, n_turns, templates=max(4, n_convs // 12)
    ).write.parquet(d)
    tx = spark.read.parquet(d)
elif job == "kcore":
    # deterministic skewed link graph: `replicas` edges over replicas//30
    # nodes (the synth_links_skewed octave shape — power-law-ish hubs).
    # The CANONICAL (symmetrized, deduped) adjacency is materialized to
    # DISK up front and the job runs kcore(symmetrized=True): at corpus
    # scale the adjacency is built once and reused across k/rounds
    # sweeps, so the one-time symmetrize must not be re-paid inside
    # every timed rep (the measurement loop clearCache()s per run).
    import tempfile
    from anendektos_spark.functions import graph
    raw = graph.synth_links_skewed(spark, replicas, max(1000, replicas // 30))
    und = (raw.unionByName(raw.select(F.col("dst").alias("src"),
                                      F.col("src").alias("dst")))
           .filter(F.col("src") != F.col("dst")).distinct())
    d = tempfile.mkdtemp() + "/edges"
    und.repartition(128).write.parquet(d)
    tx = spark.read.parquet(d)
elif job == "pca":
    # deterministic pseudo-random embeddings: `replicas` vectors x 64 dims
    # in [-1, 1] from a hash mix — same input bytes at every level
    tx = (spark.range(0, replicas, 1, 128)
          .select(F.col("id").alias("vec_id"),
                  F.expr("transform(sequence(0, 63), j -> "
                         "cast((pmod(hash(id, j), 2001) - 1000) / 1000.0 "
                         "as float))").alias("embedding"))
          ).persist()
else:
    tx = synth_transcripts(spark, replicas=replicas, hot_fraction=0.01,
                           malformed_fraction=0.01, partitions=128).persist()
n = tx.count()

GOOD_REJ = [
    F.sum(F.when(F.col("reject_reason").isNull(), 1).otherwise(0)).alias("g"),
    F.sum(F.when(F.col("reject_reason").isNotNull(), 1).otherwise(0)).alias("r"),
    F.countDistinct("conv_id").alias("c"),
]

def build():
    if job == "grok":
        # north_star grok pipeline: codegen-regexp parse -> broadcast
        # enrich -> category aggregate (addr mode n/a: zero Python)
        return transcript.enrich_agg(
            transcript.parse_turns(tx), transcript.tool_dim(spark))
    if job == "hdr":
        # mergeable quantile sketch over the parsed per-tool latencies:
        # narrow bucket map + one map-side-combined (tool, bucket)
        # aggregate, then the percentile walk on the sketch-sized relation
        from anendektos_spark.functions import sketches
        return sketches.hdr_percentiles(
            sketches.hdr_histogram(
                transcript.parse_turns(tx), "latency_ms", "tool_called"),
            (50, 90, 99), "tool_called")
    if job == "convdedup":
        # the slowest suite leg: conversation reassembly + MinHash/LSH
        # near-dup pairs (identical to bench.py's conv_dedup_500k shape)
        return dedup.lsh_jaccard(
            convops.conv_reconstruct(tx), id_col="conv_id",
            text_col="transcript")
    if job == "winnow":
        # winnowing local fingerprints + df-capped overlap pairs over the
        # reassembled conversations
        return dedup.winnow_overlap_pairs(
            convops.conv_reconstruct(tx), id_col="conv_id",
            text_col="transcript")
    if job == "pack":
        # loss-mask packing over the conversation relation, reduced to a
        # per-bucket digest (256 rows) so the measurement is the
        # operator's shuffles, not driver row serialization
        return (
            convops.pack_with_masks(tx, budget_tokens=1024, n_buckets=256)
            .groupBy("bucket")
            .agg(F.count("*").alias("n"), F.max("seq_end").alias("max_end"))
        )
    if job == "substr":
        # exact duplicated-substring spans (char-grain anchors, interval
        # union) over the reassembled conversations; stride 4 is the
        # documented corpus-scale setting. Reduced to a one-row digest so
        # the measurement is the anchor shuffles, not row serialization.
        return (
            dedup.exact_substring_spans(
                convops.conv_reconstruct(tx), id_col="conv_id",
                text_col="transcript", k=24, stride=4)
            .groupBy()
            .agg(F.count("*").alias("n_spans"),
                 F.sum("span_len").alias("chars_flagged"))
        )
    if job == "kcore":
        # iterative k-core peel (6 fixed rounds: degree aggregate + two
        # endpoint semi-joins per round), reduced to a one-row digest so
        # the measurement is the per-round shuffles, not row collection
        from anendektos_spark.functions import graph
        return (
            graph.kcore(tx, k=12, rounds=6, symmetrized=True)
            .groupBy()
            .agg(F.count("*").alias("n_nodes"),
                 F.sum("core_deg").alias("sum_core_deg"))
        )
    if job == "pca":
        # fixed-point PCA power iteration (eager: the fit IS the job; the
        # measurement loop times build()+collect together for this job)
        from anendektos_spark.functions import similarity
        return similarity.pca_power(tx, iters=4, dims=64)
    if job == "prefixjoin":
        # exact-threshold similarity self-join (AllPairs prefix filter)
        # over the reassembled conversations, high-threshold regime
        return dedup.prefix_jaccard_pairs(
            convops.conv_reconstruct(tx), id_col="conv_id",
            text_col="transcript", threshold=0.8)
    opts = ParseOptions(addr_mode=mode)
    if job == "validate":
        # one-pass CASE-gated validation across all six sinks: one scan,
        # one aggregate shuffle (parse.py parse_validate_all)
        validated = parse_validate_all(tx, opts=opts).filter(
            F.col("tool").isin(list(KNOWN_TOOLS)))
        return validated.groupBy("tool").agg(*GOOD_REJ)
    # "fanout": the per-sink materialization shape pipeline.py runs — six
    # parse_sink passes off the persisted source + per-sink aggregate
    parts = [
        parse_sink(tx.filter(F.col("tool") == t), t, opts=opts)
        .groupBy("tool").agg(*GOOD_REJ)
        for t in KNOWN_TOOLS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

# Measurement protocol: every run builds a FRESH Dataset instance —
# re-collecting one instance skips already-computed shuffle map stages and
# measures nothing, while holding many built instances alive blocks the
# ContextCleaner from releasing shuffle state and sends GC into a spiral.
# Rebuild-per-run + a Python gc between runs keeps the JVM steady. The
# first runs absorb codegen + C2 JIT of the six generated classes (up to
# 5x slower), so min over the runs is the steady-state estimate — GC and
# warmup noise is strictly one-sided.
import gc as pygc
times = []
for _ in range(runs):
    if job in ("convdedup", "winnow", "kcore"):
        # these operators persist shared relations internally; a later
        # run must not reuse an earlier run's cache (plan-equality cache
        # substitution) — pay the fill cost inside every measurement
        spark.catalog.clearCache()
    if job in ("pca", "kcore"):
        # eager work inside build(): pca's power iteration is
        # driver-synced, and kcore's mid-peel lineage truncation
        # (eager localCheckpoint at round 3) materializes rounds 1-3
        # during plan construction — time build()+collect together or
        # half the peel escapes the measurement
        t0 = time.time(); j = build(); j.collect()
        times.append(time.time() - t0)
    else:
        j = build()
        t0 = time.time(); j.collect(); times.append(time.time() - t0)
    del j
    pygc.collect()
best = min(times)
print(json.dumps({"cores": cores, "turns": n, "sec": round(best, 2),
                  "times": [round(t, 2) for t in times],
                  "turns_per_sec": round(n / best, 1), "mode": mode}))
spark.stop()
"""


JOB_TITLES = {
    "fanout": (
        "Job 1 — per-sink materialization shape (six `parse_sink` fan-out "
        "off the persisted source + per-sink aggregate, the pipeline.py "
        "stage shape)"
    ),
    "validate": (
        "Job 2 — one-pass metrics shape (`parse_validate_all`: single "
        "scan, CASE-gated per-tool validation, one aggregate shuffle)"
    ),
    "grok": (
        "Job 3 — north_star grok pipeline (functions/transcript.py: "
        "codegen-regexp parse of tool/status/latency markers → broadcast "
        "enrich → category aggregate; zero Python boundaries)"
    ),
    "hdr": (
        "Job — HDR quantile sketch (grok parse -> log-bucket histogram "
        "with map-side partial combine -> percentile walk on the sketch)"
    ),
    "pack": (
        "Job — loss-mask packing (convops.pack_with_masks: per-turn "
        "cumulative window + conv-grain partial aggregate + bucket "
        "packing window, reduced to a 256-row per-bucket digest)"
    ),
    "pca": (
        "Job — fixed-point PCA top component (similarity.pca_power: 4 "
        "power-iteration rounds over the persisted centered corpus, each "
        "one scan + a 64-key map-side-combined aggregate; driver holds "
        "only the 64-int vector per round)"
    ),
    "kcore": (
        "Job — iterative k-core peel (graph.kcore: symmetrize+dedup once, "
        "then 6 rounds of degree aggregate + two endpoint semi-joins with "
        "lineage truncation, one-row digest; throughput = input edges/s)"
    ),
    "substr": (
        "Job — exact duplicated-substring spans (dedup."
        "exact_substring_spans: char-grain anchor explode -> anchor-count "
        "shuffle -> join-back -> per-doc interval-union window; stride 4, "
        "one-row digest)"
    ),
}


def run_level(cores: int, replicas: int, runs: int, mode: str, job: str) -> dict:
    # Pin the ENTIRE process tree (JVM + pyspark Arrow workers) to exactly
    # `cores` physical CPUs. -XX:ActiveProcessorCount alone right-sizes the
    # JVM's GC/JIT pools but lets Python UDF workers ride free on idle host
    # cores — which inflates the small level's throughput and deflates the
    # measured scaling efficiency (observed: normalize-mode pairs scored
    # 0.72-0.76 unpinned vs pure-JVM passthrough at 0.89-0.95). taskset
    # makes each level a faithful N-core machine for everything it spawns.
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", WORKER,
         str(cores), str(replicas), str(runs), mode, job],
        capture_output=True, text=True, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"worker failed (cores={cores}):\n{out.stderr[-2000:]}")


def _merge(into: dict, frm: dict) -> dict:
    for k, v in frm.items():
        if isinstance(v, dict) and isinstance(into.get(k), dict):
            _merge(into[k], v)
        else:
            into[k] = v
    return into


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=40000)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--modes", default="normalize,passthrough")
    ap.add_argument("--jobs", default="fanout,validate")
    # chunked runs: --raw-out appends this invocation's results as a JSON
    # line (no md write); --assemble merges a raw file and writes
    # BENCH_SCALING_RAW.md — lets a long matrix run as several invocations
    ap.add_argument("--raw-out", default=None)
    ap.add_argument("--assemble", default=None)
    # N,4N pair to measure (default 4,16 — see module docstring); 8,32
    # puts both levels in comparable host-utilization/turbo states
    ap.add_argument("--levels", default="4,16")
    args = ap.parse_args()

    if args.assemble:
        merged: dict = {}
        with open(args.assemble) as f:
            for line in f:
                if line.strip():
                    _merge(merged, json.loads(line))
        write_bench_md(merged)
        return

    results: dict = {}
    for job in args.jobs.split(","):
        results[job] = {}
        for mode in args.modes.split(","):
            per_mode = []
            for cores in tuple(int(c) for c in args.levels.split(",")):
                r = run_level(cores, args.replicas, args.runs, mode, job)
                print(json.dumps(r))
                per_mode.append(r)
            lo, hi = per_mode
            eff = (hi["turns_per_sec"] / lo["turns_per_sec"]) / (hi["cores"] / lo["cores"])
            results[job][mode] = {"levels": per_mode, "scaling_efficiency": round(eff, 3)}
            print(f"# {job}/{mode}: efficiency={eff:.3f}")

    if args.raw_out:
        with open(args.raw_out, "a") as f:
            f.write(json.dumps(results) + "\n")
        print(f"appended {args.raw_out}")
        return
    write_bench_md(results)


def write_bench_md(results: dict) -> None:
    n_turns = next(iter(next(iter(results.values())).values()))["levels"][0]["turns"]
    with open("/root/repo/BENCH_SCALING_RAW.md", "w") as f:
        f.write("# BENCH — pipeline throughput & scaling efficiency\n\n")
        f.write(
            "Input: synth transcripts (26 golden rows × replicas, 1% hot-conversation\n"
            f"skew, 1% malformed rows), {n_turns} turns in 128 partitions — identical\n"
            "at every level. Protocol: each level runs in its own JVM, with the\n"
            "ENTIRE process tree (JVM + Arrow Python workers) pinned to exactly N\n"
            "physical CPUs via `taskset -c` and `-XX:ActiveProcessorCount=N` sizing\n"
            "the GC/JIT pools to match; min of N rebuild-per-run repetitions (first\n"
            "runs absorb codegen + C2 JIT; GC noise is one-sided). A 4/8/16/32\n"
            "sweep on this 32-core VM shows the host's memory-bandwidth share stops\n"
            "simulating independent executors past ~8-16 busy cores, so 4-vs-16 is\n"
            "the largest honest N/4N pair. This is the sandbox substitute for the\n"
            "north_rule's N-vs-4N-executor clusters; BENCH.md carries the curated\n"
            "analysis.\n\n"
        )
        for job, by_mode in results.items():
            f.write(f"## {JOB_TITLES.get(job, job)}\n\n")
            f.write("| addr mode | cores | sec | turns/sec | scaling efficiency (N→4N) |\n")
            f.write("|---|---|---|---|---|\n")
            for mode, r in by_mode.items():
                for lv in r["levels"]:
                    f.write(
                        f"| {mode} | {lv['cores']} | {lv['sec']} | {lv['turns_per_sec']} | "
                        f"{('**%s**' % r['scaling_efficiency']) if lv is r['levels'][-1] else ''} |\n"
                    )
            f.write("\n")
        f.write(
            "`normalize` = reference-faithful Arrow-UDF IP canonicalization;\n"
            "`passthrough` = zero-Python shape-validated fast path.\n"
            "Efficiency = (tput_4N/tput_N) / 4; north_rule target ≥ 0.8.\n\n"
            "Reproduce: `python scripts/scaling_bench.py --replicas 200000 --runs 6`\n"
            "(machine otherwise idle). `bench.py` gives the single-process\n"
            "operator-suite + pipeline numbers the driver records.\n"
        )
        f.write("\nRaw:\n\n```json\n" + json.dumps(results, indent=2) + "\n```\n")
    print("wrote BENCH_SCALING_RAW.md")


if __name__ == "__main__":
    main()
