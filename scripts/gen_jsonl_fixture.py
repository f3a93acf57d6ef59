"""Generate the committed JSONL transcript fixture
(anendektos_spark/data/transcripts_fixture.jsonl).

Rows come from the SAME deterministic synth-transcript relation both
engines already agree on (transcript.synth_transcript_sql, evaluated
here in DuckDB), serialized one JSON object per line. Every 37th line
position is followed by a malformed injection cycling through the
reject taxonomy the JSONL source must classify:

- a line that is not JSON at all                      → bad_json
- a bare JSON scalar (valid JSON, not an object)      → bad_json
- an object with neither conv_id nor turn_idx         → missing_identity
- an object with conv_id but a JSON-null turn_idx     → missing_identity
- a blank line                                        → silently skipped

Deliberately NOT injected: objects whose identity fields have the wrong
TYPE (e.g. turn_idx "abc") — Spark's PERMISSIVE from_json and DuckDB's
json_extract classify those differently (corrupt-record vs valid JSON),
so they are out of the cross-engine contract; the pytest suite covers
Spark's behavior for them separately.

Run: python scripts/gen_jsonl_fixture.py   (idempotent, deterministic)
"""
from __future__ import annotations

import json
import os

import duckdb

from anendektos_spark.functions import transcript

N = 19 * 16 * 4  # 1216 turns — covers every (m, turn, status) cell

BAD = [
    '{this is not json',
    '42',
    '{"role": "user", "text": "orphan line with no identity"}',
    '{"conv_id": "conv9999", "turn_idx": null, "role": "user", "text": "null idx"}',
    '',
]

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "anendektos_spark", "data", "transcripts_fixture.jsonl",
)


def main() -> None:
    rows = duckdb.sql(transcript.synth_transcript_sql(N)).fetchall()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts_epoch"]
    lines: list[str] = []
    for i, r in enumerate(rows):
        lines.append(json.dumps(dict(zip(cols, r)), separators=(",", ":")))
        if i % 37 == 36:
            lines.append(BAD[(i // 37) % len(BAD)])
    with open(OUT, "w") as f:
        f.write("\n".join(lines) + "\n")
    n_bad = sum(1 for x in lines if x in BAD and x != "")
    print(f"wrote {OUT}: {len(lines)} lines ({len(rows)} records, {n_bad} malformed)")


if __name__ == "__main__":
    main()
