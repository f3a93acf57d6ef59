"""One-shot generator: the golden Zeek transcript table as a parquet file.

Materializes the 24 reference fixture data lines (conn.d:233-441 et al.
golden records) as transcript rows — plus deterministic malformed rows,
comment/blank rows, and unknown-tool rows — at
``anendektos_spark/data/zeek_golden.parquet`` so the SAME input is
readable by Spark (``spark.read.parquet``) and by the DuckDB oracle
(``read_parquet``). This is what lets the six typed sink parsers and the
rejects channel be driver-level hash-checked (functions/zeek_oracle.py)
instead of pytest-only.

Malformed-row design (all deterministic, derived from line 0 of each
tool's fixture):
- ``REJA_<tool>``: first field (ts, a strict double in every sink)
  replaced with ``NOT_A_TS``        → reject_reason = bad_ts
- ``REJB_<tool>``: the first strict *inner* int token space-padded
  (`` 60716``) → bad_<col> — pins the whitespace-strictness contract
  (D to!int throws on padded tokens) at driver level
- ``REJC_<tool>``: line truncated to 3 tokens → field_count
Only numeric fields are corrupted: the DuckDB oracle cannot re-validate
IP addresses (no inet extension), so addr corruption is pinned in pytest
(tests/test_property.py) instead.

Run once; output is committed. Deterministic byte-for-byte (sorted rows,
fixed pyarrow schema, no compression-level ambiguity).
"""

from __future__ import annotations

import pathlib
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from anendektos_spark.data.zeek_fixture_lines import FIXTURE_LINES  # noqa: E402
from anendektos_spark.fixtures import UNKNOWN_TOOL_ROWS  # noqa: E402
from anendektos_spark.schemas import SINKS, Kind  # noqa: E402

OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "anendektos_spark" / "data" / "zeek_golden.parquet"
)
# same 24 golden lines re-tokenized with the pipe separator (the reference's
# tests/headers/pipe_sep.log dialect) — no fixture field contains '|', so the
# records are identical; used to pin dialect-driven tokenization (O2/O3) at
# driver level. Clean lines only (dialect is the variable under test).
OUT_PIPE = OUT.parent / "zeek_golden_pipe.parquet"


def first_inner_int_idx(tool: str) -> int:
    for i, c in enumerate(SINKS[tool]):
        if i > 0 and c.kind == Kind.INT:
            return i
    raise AssertionError(tool)


def rows() -> list[tuple]:
    out: list[tuple] = []
    for tool, lines in FIXTURE_LINES.items():
        for idx, line in enumerate(lines):
            toks = line.strip().split("\t")
            role = "user" if idx % 2 == 0 else "assistant"
            out.append((toks[1], idx, role, line, tool, float(toks[0])))
        # malformed rows, derived from line 0
        toks0 = lines[0].strip().split("\t")
        ts0 = float(toks0[0])
        bad_a = ["NOT_A_TS"] + toks0[1:]
        out.append((f"REJA_{tool}", 100, "user", "\t".join(bad_a), tool, ts0))
        j = first_inner_int_idx(tool)
        bad_b = list(toks0)
        bad_b[j] = " " + bad_b[j]
        out.append((f"REJB_{tool}", 101, "assistant", "\t".join(bad_b), tool, ts0))
        out.append((f"REJC_{tool}", 102, "user", "\t".join(toks0[:3]), tool, ts0))
    # comment / blank rows: silently dropped by the comment filter (O5),
    # never rejects — both engines must agree
    out.append(("COMMENT0", 999, "user", "#fields\tts\tuid", "conn", 1531687174.0))
    out.append(("BLANK0", 999, "user", "   ", "conn", 1531687174.0))
    out.extend(UNKNOWN_TOOL_ROWS)
    return sorted(out, key=lambda r: (r[4], r[1], r[0]))


def _to_table(data: list[tuple]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array([r[0] for r in data], pa.string()),
            "turn_idx": pa.array([r[1] for r in data], pa.int32()),
            "role": pa.array([r[2] for r in data], pa.string()),
            "text": pa.array([r[3] for r in data], pa.string()),
            "tool": pa.array([r[4] for r in data], pa.string()),
            "ts": pa.array(
                [int(r[5] * 1_000_000) for r in data],
                pa.timestamp("us", tz="UTC"),
            ),
        }
    )


def pipe_rows() -> list[tuple]:
    out: list[tuple] = []
    for tool, lines in FIXTURE_LINES.items():
        for idx, line in enumerate(lines):
            assert "|" not in line, (tool, idx)
            toks = line.strip().split("\t")
            role = "user" if idx % 2 == 0 else "assistant"
            out.append((toks[1], idx, role, "|".join(toks), tool, float(toks[0])))
    return sorted(out, key=lambda r: (r[4], r[1], r[0]))


def main() -> None:
    table = _to_table(rows())
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {OUT}: {table.num_rows} rows")
    pipe = _to_table(pipe_rows())
    pq.write_table(pipe, OUT_PIPE, compression="snappy")
    print(f"wrote {OUT_PIPE}: {pipe.num_rows} rows")


if __name__ == "__main__":
    main()
