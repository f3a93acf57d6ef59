#!/usr/bin/env bash
# spark-submit --py-files smoke test (north_rule: "runs via spark-submit
# --py-files on multi-executor clusters"). Packages the library as a zip,
# ships it with --py-files, runs the CLI pipeline on a freshly synthesized
# transcript directory, and checks stage manifests + sink row counts.
set -euo pipefail

REPO=/root/repo
WORK=$(mktemp -d /tmp/submit_smoke.XXXX)
trap 'rm -rf "$WORK"' EXIT

cd "$REPO" && zip -qr "$WORK/anendektos_spark.zip" anendektos_spark -x '*/__pycache__/*'

# synthesize a small transcript parquet input (driverless helper)
python - "$WORK" <<'PY'
import sys
sys.path.insert(0, "/root/repo")
from anendektos_spark.session import get_spark
from anendektos_spark.fixtures import synth_transcripts
w = sys.argv[1]
spark = get_spark("smoke_gen", cores=4, shuffle_partitions=4)
synth_transcripts(spark, replicas=50, malformed_fraction=0.02).write.parquet(f"{w}/in")
spark.stop()
PY

# run from a scratch cwd so only --py-files provides the package
cd "$WORK"
cp "$REPO/run_pipeline.py" "$WORK/"
spark-submit \
  --master 'local[4]' \
  --py-files "$WORK/anendektos_spark.zip" \
  --conf spark.sql.shuffle.partitions=4 \
  --conf spark.ui.showConsoleProgress=false \
  "$WORK/run_pipeline.py" \
  --input "$WORK/in" --output "$WORK/out" 2>"$WORK/stderr.log" || {
    tail -40 "$WORK/stderr.log"; exit 1; }

python - "$WORK" <<'PY'
import json, sys, glob, os
w = sys.argv[1]
manifests = glob.glob(f"{w}/out/*/_MANIFEST.json")
assert manifests, "no stage manifests written"
stages = {os.path.basename(os.path.dirname(m)): json.load(open(m)) for m in manifests}
# synth input: 50 replicas x per-tool golden counts, minus the rows whose
# ts field the malformed_fraction=0.02 corrupter hit (those still appear in
# parsed_<tool> with a reject_reason — parsed stages carry good+rejected)
for tool, n in {"conn": 6, "dns": 4, "http": 3, "files": 4, "ssl": 4, "x509": 3}.items():
    got = stages[f"parsed_{tool}"]["rows"]
    assert got == 50 * n, (tool, got, 50 * n)
sink_total = sum(stages[f"sink_{t}"]["rows"] for t in ["conn","dns","http","files","ssl","x509"])
assert sink_total + stages["rejects"]["rows"] == 50 * 26, (sink_total, stages["rejects"]["rows"])
print("SMOKE OK —", len(stages), "stages:", sorted(stages))
PY

# ---- grok leg: the north-star marker-payload pipeline under the same
# spark-submit --py-files protocol, plus an idempotent-resume re-run ----
python - "$WORK" <<'PY'
import sys
sys.path.insert(0, "/root/repo")
from anendektos_spark.session import get_spark
from anendektos_spark.functions import transcript
w = sys.argv[1]
spark = get_spark("smoke_gen_grok", cores=4, shuffle_partitions=4)
transcript.synth_transcript(spark, 3040).write.parquet(f"{w}/grok_in")
spark.stop()
PY

run_grok() {
  spark-submit \
    --master 'local[4]' \
    --py-files "$WORK/anendektos_spark.zip" \
    --conf spark.sql.shuffle.partitions=4 \
    --conf spark.ui.showConsoleProgress=false \
    "$WORK/run_pipeline.py" --mode grok \
    --input "$WORK/grok_in" --output "$WORK/grok_out" \
    2>"$WORK/grok_stderr.log" || { tail -40 "$WORK/grok_stderr.log"; exit 1; }
}
run_grok >"$WORK/grok_metrics1.json"
run_grok >"$WORK/grok_metrics2.json"

python - "$WORK" <<'PY'
import json, sys
w = sys.argv[1]
m1 = json.load(open(f"{w}/grok_metrics1.json"))["stages"]
m2 = json.load(open(f"{w}/grok_metrics2.json"))["stages"]
n = 3040
# synth scheme: assistant turns are odd turn_idx (TURNS_PER_CONV=16 even
# -> exactly n/2); i % 19 in {7, 11, 13} on an assistant turn is a reject
assistant = sum(1 for i in range(n) if (i % 16) % 2 == 1)
parsed = sum(1 for i in range(n)
             if (i % 16) % 2 == 1 and i % 19 not in (7, 11, 13))
assert m1["grok_parsed"]["rows"] == parsed, (m1["grok_parsed"], parsed)
assert m1["grok_rejects"]["rows"] == assistant - parsed
sinks = {k: v["rows"] for k, v in m1.items() if k.startswith("grok_sink_")}
assert len(sinks) == 6 and sum(sinks.values()) == parsed, sinks
assert not any(v["resumed"] for v in m1.values())
assert all(v["resumed"] for v in m2.values()), "second run must resume"
assert {k: v["rows"] for k, v in m2.items()} == {k: v["rows"] for k, v in m1.items()}
print("GROK SMOKE OK —", len(m1), "stages, parsed:", parsed,
      "rejects:", assistant - parsed)
PY
