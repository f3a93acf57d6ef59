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


# --- round-4 operator properties --------------------------------------------


def _lev_py(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="ab cd", min_size=0, max_size=24),
                min_size=2, max_size=8))
def test_editdist_refine_matches_python_on_random_pairs(spark, texts):
    from anendektos_spark.functions import dedup

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(i, j) for i in range(len(texts)) for j in range(i + 1, len(texts))],
        "id_a long, id_b long",
    )
    got = {(r.id_a, r.id_b): (r.dist, r.sim_ppm)
           for r in dedup.editdist_refine(docs, pairs).collect()}
    for (a, b), (d, sim) in got.items():
        exp = _lev_py(texts[a], texts[b])
        m = max(len(texts[a]), len(texts[b]))
        assert d == exp
        assert sim == (10**6 if m == 0 else (10**6 * (m - exp)) // m)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=2**40),
                min_size=1, max_size=60))
def test_hdr_bucket_property_random_values(spark, vals):
    from anendektos_spark.functions import sketches

    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    hist = {r.bucket: r.cnt
            for r in sketches.hdr_histogram(df, "v", "g").collect()}

    def bucket(v, s=5):
        shift = max(v.bit_length() - 1 - s, 0) if v > 0 else 0
        return shift * 32 + (v >> shift)

    def lb(b, s=5):
        k = max(b // 32 - 1, 0)
        return (b - k * 32) << k

    exp = {}
    for v in vals:
        exp[bucket(v)] = exp.get(bucket(v), 0) + 1
    assert hist == exp
    for v in vals:
        l = lb(bucket(v))
        assert l <= v and (v == l or v < l * (1 + 2 ** -5) or l < 32)
