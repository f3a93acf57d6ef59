"""Driver-level DuckDB oracle for the Zeek transcript parse engine.

The six typed sink parsers (conn.d:58-197, dns.d:62-206, http.d:66-223,
files.d:62-214, ssl.d:57-153, x509.d:57-174) are the heart of the rebuild;
this module puts them under the driver's hash-check by pairing, for each
sink, the REAL Spark parse plan (parse.py ``parse_sink`` over the committed
golden parquet, data/zeek_golden.parquet) with a generated ANSI/DuckDB SQL
mirror that re-derives every parsed column — sentinel nulls, strict
numeric row-drops (incl. whitespace strictness), bool decodes, set splits,
null-vs-empty arrays — from the raw TSV ``text``.

Emission rules (both engines identically):
- scalar columns as their native types (doubles come from casting the
  same token text → bit-identical IEEE);
- array columns as two columns: ``<name>`` = elements joined with the set
  separator (null-preserved for the one nullable array, x509 san_ip) and
  ``n_<name>`` = element count — the driver's value-hash can't compare
  native arrays, strings are engine-neutral;
- double arrays (dns TTLs) joined after %.6f formatting so the text is
  identical across engines.

Known oracle limits (documented, fixture-controlled): the SQL mirror
cannot validate IP addresses (DuckDB has no inet parser in-box), so addr
columns pass through as text — valid because every golden address is
already RFC-5952 canonical (the normalize path itself is pinned
bit-for-bit in tests/test_golden_sinks.py, and addr-corruption row-drops
in tests/test_property.py). Reject-reason parity therefore holds for the
corruptions the fixture contains (numeric + field-count), which is what
the rejects query pins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..dialect import Dialect
from ..parse import parse_sink, parse_validate_all
from ..schemas import KNOWN_TOOLS, SINKS, Kind

# north_star top-K surface: the per-sink frequency fields the reference's
# summaries would rank (dns.d:115, http.d:115, ssl.d:107)
TOPK_FIELDS = {"dns": "query", "http": "host", "ssl": "server_name"}

GOLDEN_PARQUET = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "data", "zeek_golden.parquet",
)
# the same 24 golden lines pipe-separated (reference tests/headers/
# pipe_sep.log dialect) — pins dialect-driven tokenization cross-engine
GOLDEN_PIPE_PARQUET = os.path.join(
    os.path.dirname(GOLDEN_PARQUET), "zeek_golden_pipe.parquet"
)

_ARR_KINDS = {
    Kind.ARR_STR_UNSET, Kind.ARR_STR_EMPTY, Kind.ARR_STR_BOTH,
    Kind.ARR_DBL_UNSET, Kind.ARR_ADDR_UNSET, Kind.ARR_ADDR_NULL,
}

# SQL-side strict grammars — mirrors of parse.py _INT_RE/_DBL_RE
_INT_RE_SQL = "[+-]?[0-9]+"
_DBL_RE_SQL = r"[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?"


def read_golden(spark: SparkSession) -> DataFrame:
    return spark.read.parquet(GOLDEN_PARQUET)


# --------------------------------------------------------------------------
# Spark side: real parse plan + driver-comparable projection
# --------------------------------------------------------------------------

def sink_query_pipe(spark: SparkSession, tool: str) -> DataFrame:
    """The same typed parse under the PIPE dialect (O2/O3: tokenization
    is dialect-driven config, not hardcoded) — records must be identical
    to the tab-dialect sink."""
    tx = spark.read.parquet(GOLDEN_PIPE_PARQUET)
    parsed = parse_sink(
        tx.filter(F.col("tool") == tool), tool, dialect=Dialect(separator="|")
    )
    good = parsed.filter(F.col("reject_reason").isNull())
    return good.select(*_projection(tool))


def topk_fields_query(spark: SparkSession, k: int = 3) -> DataFrame:
    """Top-K frequency per sink over its natural field (dns query /
    http host / ssl server_name) from the PARSED sinks — the north_star
    top-K realized on reference data. Deterministic: count desc, value
    asc tie-break."""
    from pyspark.sql import Window

    parts = []
    for tool, fld in TOPK_FIELDS.items():
        parsed = parse_sink(read_golden(spark).filter(F.col("tool") == tool), tool)
        good = parsed.filter(F.col("reject_reason").isNull())
        parts.append(
            good.groupBy(F.lit(tool).alias("tool"), F.col(fld).alias("value"))
            .agg(F.count("*").alias("n"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.partitionBy("tool").orderBy(F.desc("n"), F.col("value").asc())
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("tool", "value", "n", "rank")
    )


def _projection(tool: str) -> list:
    cols = [F.col("conv_id"), F.col("turn_idx")]
    for c in SINKS[tool]:
        v = F.col(c.name)
        if c.kind not in _ARR_KINDS:
            cols.append(v)
            continue
        if c.kind == Kind.ARR_DBL_UNSET:
            joined = F.concat_ws(
                ",", F.transform(v, lambda x: F.format_string("%.6f", x))
            )
        else:
            joined = F.concat_ws(",", v)
        cols.append(
            F.when(v.isNull(), F.lit(None).cast("string")).otherwise(joined).alias(c.name)
        )
        cols.append(
            F.when(v.isNull(), F.lit(None).cast("int"))
            .otherwise(F.size(v))
            .alias(f"n_{c.name}")
        )
    return cols


def sink_query(spark: SparkSession, tool: str) -> DataFrame:
    """Good rows of one sink, every parsed field, hash-comparable form."""
    parsed = parse_sink(read_golden(spark).filter(F.col("tool") == tool), tool)
    good = parsed.filter(F.col("reject_reason").isNull())
    return good.select(*_projection(tool))


def rejects_query(spark: SparkSession) -> DataFrame:
    """Per (tool, reject_reason) counts over every row — parse failures
    (first-failing-column reason) + unknown tools (parser.d:85)."""
    validated = parse_validate_all(read_golden(spark))
    return (
        validated.filter(F.col("reject_reason").isNotNull())
        .groupBy("tool", "reject_reason")
        .agg(F.count("*").alias("n"))
    )


def conn_latency_query(spark: SparkSession) -> DataFrame:
    """Latency-marker aggregate over the parsed conn sink: per conn_state
    count + duration stats (the north_star 'latency markers' realized on
    the reference's own schema — duration is Zeek's interval field,
    conn.d:34). Decimal-domain sum keeps the float total engine-exact."""
    parsed = parse_sink(read_golden(spark).filter(F.col("tool") == "conn"), "conn")
    good = parsed.filter(F.col("reject_reason").isNull())
    return good.groupBy("conn_state").agg(
        F.count("*").alias("n"),
        F.count("duration").alias("n_with_duration"),
        F.round(F.sum(F.col("duration").cast("decimal(20,6)")), 6)
        .cast("double")
        .alias("sum_duration"),
        F.min("duration").alias("min_duration"),
        F.max("duration").alias("max_duration"),
    )


def aggregates_query(spark: SparkSession) -> DataFrame:
    """Per-tool good/reject counts — the golden-count contract
    (conn.d:233-237 et al.) over the committed fixture parquet."""
    validated = parse_validate_all(read_golden(spark)).filter(
        F.col("tool").isin(list(KNOWN_TOOLS))
    )
    return validated.groupBy("tool").agg(
        F.sum(F.when(F.col("reject_reason").isNull(), 1).otherwise(0)).alias("n_good"),
        F.sum(F.when(F.col("reject_reason").isNotNull(), 1).otherwise(0)).alias("n_rejects"),
    )


# --------------------------------------------------------------------------
# DuckDB side: generated SQL mirror
# --------------------------------------------------------------------------

def _tok(i: int) -> str:
    return f"t[{i + 1}]"


def _ok_int(x: str) -> str:
    return (
        f"(regexp_full_match({x}, '{_INT_RE_SQL}')"
        f" AND TRY_CAST({x} AS BIGINT) BETWEEN -2147483648 AND 2147483647)"
    )


def _ok_dbl(x: str) -> str:
    return f"regexp_full_match({x}, '{_DBL_RE_SQL}')"


def _base_cte(parquet: str = GOLDEN_PARQUET, sep_sql: str = "chr(9)") -> str:
    return f"""
        WITH tx AS (SELECT * FROM read_parquet('{parquet}')),
        d AS (
          SELECT conv_id, turn_idx, tool,
                 regexp_replace(text, '^\\s+|\\s+$', '', 'g') AS line,
                 str_split(regexp_replace(text, '^\\s+|\\s+$', '', 'g'), {sep_sql}) AS t
          FROM tx
        ),
        f AS (SELECT * FROM d WHERE length(line) > 0 AND NOT starts_with(line, '#'))
    """


def _value_sql(c, i: int) -> list[str]:
    """SELECT expressions (aliased) for one spec column."""
    x, k = _tok(i), c.kind
    u, e = "'-'", "'(empty)'"
    if k == Kind.STR or k == Kind.ADDR:
        return [f"{x} AS {c.name}"]
    if k == Kind.STR_NULL:
        return [f"CASE WHEN {x} = {u} THEN NULL ELSE {x} END AS {c.name}"]
    if k == Kind.INT:
        return [f"TRY_CAST({x} AS INTEGER) AS {c.name}"]
    if k == Kind.INT_NULL:
        return [f"CASE WHEN {x} = {u} THEN NULL ELSE TRY_CAST({x} AS INTEGER) END AS {c.name}"]
    if k == Kind.DBL:
        return [f"TRY_CAST({x} AS DOUBLE) AS {c.name}"]
    if k == Kind.DBL_NULL:
        return [f"CASE WHEN {x} = {u} THEN NULL ELSE TRY_CAST({x} AS DOUBLE) END AS {c.name}"]
    if k == Kind.BOOL_TF:
        return [f"CASE WHEN {x} = {u} THEN NULL ELSE {x} <> 'F' END AS {c.name}"]
    if k == Kind.BOOL_01:
        return [f"CASE WHEN {x} = {u} THEN NULL ELSE {x} <> '0' END AS {c.name}"]
    n_expr = f"CAST(len(str_split({x}, ',')) AS INTEGER)"
    if k in (Kind.ARR_STR_UNSET, Kind.ARR_ADDR_UNSET):
        return [
            f"CASE WHEN {x} = {u} THEN '' ELSE {x} END AS {c.name}",
            f"CASE WHEN {x} = {u} THEN 0 ELSE {n_expr} END AS n_{c.name}",
        ]
    if k == Kind.ARR_STR_EMPTY:
        return [
            f"CASE WHEN {x} = {e} THEN '' ELSE {x} END AS {c.name}",
            f"CASE WHEN {x} = {e} THEN 0 ELSE {n_expr} END AS n_{c.name}",
        ]
    if k == Kind.ARR_STR_BOTH:
        return [
            f"CASE WHEN {x} IN ({u}, {e}) THEN '' ELSE {x} END AS {c.name}",
            f"CASE WHEN {x} IN ({u}, {e}) THEN 0 ELSE {n_expr} END AS n_{c.name}",
        ]
    if k == Kind.ARR_DBL_UNSET:
        joined = (
            f"array_to_string(list_transform(str_split({x}, ','),"
            f" v -> format('{{:.6f}}', CAST(v AS DOUBLE))), ',')"
        )
        return [
            f"CASE WHEN {x} = {u} THEN '' ELSE {joined} END AS {c.name}",
            f"CASE WHEN {x} = {u} THEN 0 ELSE {n_expr} END AS n_{c.name}",
        ]
    if k == Kind.ARR_ADDR_NULL:
        return [
            f"CASE WHEN {x} = {u} THEN NULL ELSE {x} END AS {c.name}",
            f"CASE WHEN {x} = {u} THEN NULL ELSE {n_expr} END AS n_{c.name}",
        ]
    raise ValueError(k)


def _strict_checks(spec) -> list[str]:
    """Row-validity predicates: field count + every strict numeric column
    (the oracle mirror of parse.py's reject chain, addr checks excluded)."""
    checks = [f"len(t) = {len(spec)}"]
    for i, c in enumerate(spec):
        x = _tok(i)
        if c.kind == Kind.INT:
            checks.append(_ok_int(x))
        elif c.kind == Kind.INT_NULL:
            checks.append(f"({x} = '-' OR {_ok_int(x)})")
        elif c.kind == Kind.DBL:
            checks.append(_ok_dbl(x))
        elif c.kind == Kind.DBL_NULL:
            checks.append(f"({x} = '-' OR {_ok_dbl(x)})")
        elif c.kind == Kind.ARR_DBL_UNSET:
            checks.append(
                f"({x} = '-' OR len(list_filter(str_split({x}, ','),"
                f" v -> NOT {_ok_dbl('v')})) = 0)"
            )
    return checks


def _reason_sql(spec) -> str:
    """First-failure-wins reason CASE for one sink (field_count first,
    then strict columns in spec order — matching parse.py's coalesce)."""
    arms = [f"WHEN len(t) <> {len(spec)} THEN 'field_count'"]
    for i, c in enumerate(spec):
        x = _tok(i)
        bad = None
        if c.kind == Kind.INT:
            bad = f"NOT {_ok_int(x)}"
        elif c.kind == Kind.INT_NULL:
            bad = f"({x} <> '-' AND NOT {_ok_int(x)})"
        elif c.kind == Kind.DBL:
            bad = f"NOT {_ok_dbl(x)}"
        elif c.kind == Kind.DBL_NULL:
            bad = f"({x} <> '-' AND NOT {_ok_dbl(x)})"
        elif c.kind == Kind.ARR_DBL_UNSET:
            bad = (
                f"({x} <> '-' AND len(list_filter(str_split({x}, ','),"
                f" v -> NOT {_ok_dbl('v')})) > 0)"
            )
        if bad:
            arms.append(f"WHEN {bad} THEN 'bad_{c.name}'")
    return "CASE " + " ".join(arms) + " ELSE NULL END"


def sink_sql(tool: str, parquet: str = GOLDEN_PARQUET, sep_sql: str = "chr(9)") -> str:
    spec = SINKS[tool]
    cols = ["conv_id", "turn_idx"]
    for i, c in enumerate(spec):
        cols.extend(_value_sql(c, i))
    sel = ",\n               ".join(cols)
    good = "\n           AND ".join(_strict_checks(spec))
    return f"""
        {_base_cte(parquet, sep_sql)}
        SELECT {sel}
        FROM f
        WHERE tool = '{tool}'
           AND {good}
    """


def sink_sql_pipe(tool: str) -> str:
    return sink_sql(tool, GOLDEN_PIPE_PARQUET, "'|'")


def topk_fields_sql(k: int = 3) -> str:
    parts = []
    for tool, fld in TOPK_FIELDS.items():
        spec = SINKS[tool]
        idx = next(i for i, c in enumerate(spec) if c.name == fld)
        good = " AND ".join(_strict_checks(spec))
        parts.append(
            f"SELECT '{tool}' AS tool, {_tok(idx)} AS value, count(*) AS n "
            f"FROM f WHERE tool = '{tool}' AND {good} GROUP BY 2"
        )
    union = "\n          UNION ALL ".join(parts)
    return f"""
        {_base_cte()},
        c AS ({union}),
        r AS (SELECT tool, value, n,
                     row_number() OVER (PARTITION BY tool
                                        ORDER BY n DESC, value ASC) AS rk
              FROM c)
        SELECT tool, value, n, CAST(rk AS INT) AS rank FROM r WHERE rk <= {k}
    """


def conn_latency_sql() -> str:
    spec = SINKS["conn"]
    state_idx = next(i for i, c in enumerate(spec) if c.name == "conn_state")
    dur_idx = next(i for i, c in enumerate(spec) if c.name == "duration")
    dur = (
        f"CASE WHEN {_tok(dur_idx)} = '-' THEN NULL"
        f" ELSE TRY_CAST({_tok(dur_idx)} AS DOUBLE) END"
    )
    good = "\n           AND ".join(_strict_checks(spec))
    return f"""
        {_base_cte()}
        SELECT {_tok(state_idx)} AS conn_state, count(*) AS n,
               count({dur}) AS n_with_duration,
               CAST(round(sum(CAST({dur} AS DECIMAL(20,6))), 6) AS DOUBLE)
                 AS sum_duration,
               min({dur}) AS min_duration,
               max({dur}) AS max_duration
        FROM f
        WHERE tool = 'conn'
           AND {good}
        GROUP BY 1
    """


def rejects_sql() -> str:
    known = ", ".join(f"'{t}'" for t in KNOWN_TOOLS)
    arms = [f"WHEN tool NOT IN ({known}) THEN 'unimplemented_tool'"]
    for tool in KNOWN_TOOLS:
        arms.append(f"WHEN tool = '{tool}' THEN ({_reason_sql(SINKS[tool])})")
    reason = "CASE " + " ".join(arms) + " END"
    return f"""
        {_base_cte()},
        r AS (SELECT tool, {reason} AS reject_reason FROM f)
        SELECT tool, reject_reason, count(*) AS n
        FROM r WHERE reject_reason IS NOT NULL
        GROUP BY tool, reject_reason
    """


def aggregates_sql() -> str:
    known = ", ".join(f"'{t}'" for t in KNOWN_TOOLS)
    arms = [
        f"WHEN tool = '{tool}' THEN ({_reason_sql(SINKS[tool])})"
        for tool in KNOWN_TOOLS
    ]
    reason = "CASE " + " ".join(arms) + " END"
    return f"""
        {_base_cte()},
        r AS (SELECT tool, {reason} AS reject_reason FROM f WHERE tool IN ({known}))
        SELECT tool,
               CAST(count(*) FILTER (reject_reason IS NULL) AS BIGINT) AS n_good,
               CAST(count(*) FILTER (reject_reason IS NOT NULL) AS BIGINT) AS n_rejects
        FROM r GROUP BY tool
    """
