"""Property-based parse testing: Spark column plan vs the independent
pure-Python oracle (pyref) on hypothesis-generated lines.

Extends the reference's golden-fixture style (SURVEY.md §5) with
randomized coverage of the sentinel/cast/row-drop contract: any token in
any column, valid or garbage, must yield the same record-or-drop from
both implementations.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from anendektos_spark.parse import parse_sink
from anendektos_spark.schemas import SINKS, Kind

from .pyref import parse_line

# Token pool biased toward the interesting edges of the contract:
# sentinels, valid scalars of every type, and garbage that must drop.
TOKENS = st.one_of(
    st.sampled_from([
        "-", "(empty)",                       # sentinels
        "0", "1", "42", "-7", "2147483647", "2147483648",   # int edge
        "1531687176.789848", "0.5", "-3.25", "1e3",          # doubles
        "T", "F", "tcp", "http", "a,b", "x,y,z", "",        # strs/sets/bools
        "10.0.0.1", "192.168.1.254", "fe80::250:f1ff:fe80:0",  # addrs
        "999.999.999.999", "not_an_ip",                     # bad addrs
        "abc", "12.5.3", "0x1F", "NaN",                     # garbage
        " 5", "5 ", " 1.5", "1.5 ", " -", "1 2", " ",       # whitespace-padded
    ]),
    st.text(
        alphabet="0123456789abcdef.:,- ",
        min_size=0, max_size=12,
    ),
)


def lines_for(tool: str):
    n = len(SINKS[tool])
    return st.lists(
        st.lists(TOKENS, min_size=n, max_size=n).map(lambda t: "\t".join(t)),
        min_size=1, max_size=40,
    )


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, list):
        return [norm_value(x) for x in v]
    return v


@pytest.mark.parametrize("tool", ["conn", "dns", "x509"])
def test_random_lines_match_pyref(spark, tool):
    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(lines=lines_for(tool))
    def run(lines):
        rows = [(f"c{i}", i, "user", ln, tool, float(i)) for i, ln in enumerate(lines)]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string, ts double"
        ).select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.timestamp_seconds("ts").alias("ts"),
        )
        parsed = parse_sink(df, tool)
        got = {
            r["turn_idx"]: r
            for r in parsed.filter(F.col("reject_reason").isNull()).collect()
        }
        spec = SINKS[tool]
        for i, ln in enumerate(lines):
            exp = parse_line(tool, ln)
            if exp is None:
                assert i not in got, f"line {i!r} should drop: {ln!r}"
            else:
                assert i in got, f"line {i!r} should parse: {ln!r}"
                for c in spec:
                    g, e = norm_value(got[i][c.name]), norm_value(exp[c.name])
                    assert g == e, (c.name, ln, g, e)

    run()
