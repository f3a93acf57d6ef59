"""The vectorized parse stage: spec → pure Catalyst column plan.

Replaces the reference's six hand-written per-line generators
(conn.d:58-197 …) with ONE generic compiler from a declarative column spec
(schemas.py) to Spark column expressions. Everything is JVM-side
whole-stage-codegen'd except IP normalization (addrs.py, Arrow-batched).

Contract reproduced (SURVEY.md §1.3):
- comment/blank skip: lines empty or starting with ``#`` are silently
  dropped (conn.d:66-68 pattern) — they are not rejects.
- tokenization: strip then positional split on the dialect separator
  (conn.d:63).
- per-column sentinel → null / empty-array mapping (kind table in
  schemas.py).
- row-drop on bad numeric/addr value: the row goes to the rejects channel
  with the first failing column named, mirroring
  ``errorf("Processing <field> on line %d")`` + continue (conn.d:73-78).
- rows whose token count differs from the spec are rejected with reason
  ``field_count`` (the reference would crash on a short line — D
  RangeError is unrecoverable — so per-row rejection is the documented
  rebuild policy).

Scale notes: the output keeps (conv_id, turn_idx) lineage so any row is
attributable without a global ordinal; no shuffle happens here — parsing
is a pure narrow map over the scan, so it pipelines with the source read
and with downstream filters under AQE.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from .addrs import (
    normalize_addr_array_hybrid,
    normalize_addr_hybrid,
    validate_addr_passthrough,
)
from .dialect import Dialect
from .schemas import SINKS, Col, Kind

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1


@dataclass(frozen=True)
class ParseOptions:
    # "normalize": canonicalize via Arrow UDF (reference-faithful).
    # "passthrough": regex shape-check only, zero Python — for producers
    # that already emit canonical text.
    addr_mode: str = "normalize"


def _strip(col: Column) -> Column:
    # D strip() removes all leading/trailing whitespace incl. \t
    # (conn.d:63); Spark trim() is space-only, so use a regex.
    return F.regexp_replace(col, r"^\s+|\s+$", "")


def comment_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Drop blank and ``#``-comment lines (conn.d:66-68)."""
    t = _strip(F.col(text_col))
    return df.filter((F.length(t) > 0) & (~t.startswith("#")))


# Strict numeric token grammars. Spark's string casts trim surrounding
# whitespace (' 5' → 5) but the reference's D to!int / to!double throw on
# whitespace-padded tokens (tab-split tokens CAN contain spaces), so both
# casts are gated on an explicit regex. The double grammar is plain decimal/
# scientific literals; D additionally accepts "inf"/"nan" spellings that the
# JVM cast cannot parse — those are rejected here and in the pyref oracle
# (documented divergence; Zeek itself never prints them in time/interval
# fields). rlike is codegen-supported, so the projection stays whole-stage.
_INT_RE = r"^[+-]?[0-9]+$"
_DBL_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"


def _strict_int(tok: Column) -> Column:
    # try_cast keeps the plan ANSI-mode-proof: under spark.sql.ansi.enabled
    # (the Spark 4 default on a bare session) a plain cast of a malformed
    # value would fail the TASK; the contract is drop-the-ROW (conn.d:73-78).
    lng = F.when(tok.rlike(_INT_RE), tok).try_cast("long")
    return F.when(lng.between(INT32_MIN, INT32_MAX), lng).cast("int")


def _strict_dbl(tok: Column) -> Column:
    return F.when(tok.rlike(_DBL_RE), tok).try_cast("double")


def _compile_column(
    c: Col, tok: Column, d: Dialect, opts: ParseOptions
) -> tuple[Column, Column | None]:
    """Return (value_expr, bad_expr or None). bad==True drops the row."""
    unset, empty = F.lit(d.unset_field), F.lit(d.empty_field)
    ss = re.escape(d.set_separator)
    empty_arr = F.array().cast("array<string>")

    def norm(col: Column) -> Column:
        if opts.addr_mode == "passthrough":
            return validate_addr_passthrough(col)
        # hybrid: already-canonical IPv4 resolves JVM-side, the Arrow
        # UDF sees a null-masked column (addrs.normalize_addr_hybrid) —
        # bit-identical output, Python/Arrow work only for the rare
        # IPv6/malformed values
        return normalize_addr_hybrid(col)

    def norm_arr(col: Column) -> Column:
        if opts.addr_mode == "passthrough":
            return F.transform(col, validate_addr_passthrough)
        return normalize_addr_array_hybrid(col)

    k = c.kind
    if k == Kind.STR:
        return tok, None
    if k == Kind.STR_NULL:
        return F.when(tok != unset, tok), None
    if k == Kind.INT:
        v = _strict_int(tok)
        return v, v.isNull()
    if k == Kind.INT_NULL:
        v = F.when(tok != unset, _strict_int(tok))
        return v, (tok != unset) & v.isNull()
    if k == Kind.DBL:
        v = _strict_dbl(tok)
        return v, v.isNull()
    if k == Kind.DBL_NULL:
        v = F.when(tok != unset, _strict_dbl(tok))
        return v, (tok != unset) & v.isNull()
    if k == Kind.ADDR:
        v = norm(tok)
        return v, v.isNull()
    if k == Kind.BOOL_TF:
        return F.when(tok == unset, F.lit(None).cast("boolean")).otherwise(tok != "F"), None
    if k == Kind.BOOL_01:
        return F.when(tok == unset, F.lit(None).cast("boolean")).otherwise(tok != "0"), None
    if k == Kind.ARR_STR_UNSET:
        return F.when(tok == unset, empty_arr).otherwise(F.split(tok, ss, -1)), None
    if k == Kind.ARR_STR_EMPTY:
        return F.when(tok == empty, empty_arr).otherwise(F.split(tok, ss, -1)), None
    if k == Kind.ARR_STR_BOTH:
        return (
            F.when((tok == unset) | (tok == empty), empty_arr).otherwise(F.split(tok, ss, -1)),
            None,
        )
    if k == Kind.ARR_DBL_UNSET:
        v = F.when(tok == unset, F.array().cast("array<double>")).otherwise(
            F.transform(F.split(tok, ss, -1), _strict_dbl)
        )
        return v, F.exists(v, lambda x: x.isNull())
    if k == Kind.ARR_ADDR_UNSET:
        v = F.when(tok == unset, empty_arr).otherwise(norm_arr(F.split(tok, ss, -1)))
        return v, F.exists(v, lambda x: x.isNull())
    if k == Kind.ARR_ADDR_NULL:
        v = F.when(tok != unset, norm_arr(F.split(tok, ss, -1)))
        return v, (tok != unset) & F.exists(v, lambda x: x.isNull())
    raise ValueError(f"unknown kind {k}")


def parse_sink(
    df: DataFrame,
    tool: str,
    dialect: Dialect | None = None,
    text_col: str = "text",
    opts: ParseOptions | None = None,
) -> DataFrame:
    """Compile the sink's spec over ``df`` (already routed to ``tool``).

    Input: transcripts-shaped rows. Output: lineage columns
    (conv_id, turn_idx, role, tool, src_ts) + every spec column +
    ``reject_reason`` (null ⇔ row is good). Callers split on
    ``reject_reason.isNull()``; see route.py.
    """
    dialect = dialect or Dialect()
    opts = opts or ParseOptions()
    spec = SINKS[tool]
    n = len(spec)

    df = comment_filter(df, text_col)
    toks = F.split(_strip(F.col(text_col)), re.escape(dialect.separator), -1)
    df = df.withColumn("_toks", toks)

    values: list[Column] = []
    bads: list[Column] = []
    for i, c in enumerate(spec):
        # F.get (not getItem/element_at): out-of-range → null in EVERY SQL
        # mode — a short line must become a field_count reject, not an
        # ANSI INVALID_ARRAY_INDEX task failure
        tok = F.get("_toks", i)
        v, bad = _compile_column(c, tok, dialect, opts)
        values.append(v.alias(c.name))
        if bad is not None:
            bads.append(F.when(bad, F.lit(f"bad_{c.name}")))

    field_count_bad = F.size(F.col("_toks")) != F.lit(n)
    # first-failure-wins, like the reference's first failing to!T cast
    # (conn.d:73-78). coalesce (not array_compact) keeps the projection
    # inside whole-stage codegen: one CodegenFallback expression would
    # push this entire ~100-expression Project to interpreted mode and
    # lose common-subexpression elimination with it (~5× slower).
    reason = F.coalesce(F.when(field_count_bad, F.lit("field_count")), *bads) if bads else \
        F.when(field_count_bad, F.lit("field_count"))

    return df.select(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("role"),
        F.col("tool"),
        F.col("ts").alias("src_ts"),
        F.col(text_col).alias("text"),
        *values,
        reason.alias("reject_reason"),
    )


def _reject_expr(spec, d: Dialect, opts: ParseOptions) -> Column:
    bads: list[Column] = []
    for i, c in enumerate(spec):
        _, bad = _compile_column(c, F.get("_toks", i), d, opts)
        if bad is not None:
            bads.append(F.when(bad, F.lit(f"bad_{c.name}")))
    fc = F.size(F.col("_toks")) != F.lit(len(spec))
    head = F.when(fc, F.lit("field_count"))
    return F.coalesce(head, *bads) if bads else head


def parse_validate_all(
    df: DataFrame,
    dialect: Dialect | None = None,
    text_col: str = "text",
    opts: ParseOptions | None = None,
) -> DataFrame:
    """ONE-pass validation across every sink: input rows (any tool) +
    ``reject_reason`` per the row's own tool spec; unknown tools get
    ``unimplemented_tool`` (parser.d:85).

    The per-tool validation expressions are CASE-gated on ``tool``, so
    each row evaluates only its own sink's spec — same per-row work as
    the six filtered passes but a single scan and a single aggregate
    shuffle downstream (~25% faster on the metrics path at 16 cores).
    Use this for counting/monitoring; ``parse_sink`` stays the
    materialization path (it emits the typed columns)."""
    dialect = dialect or Dialect()
    opts = opts or ParseOptions()
    df = comment_filter(df, text_col)
    toks = F.split(_strip(F.col(text_col)), re.escape(dialect.separator), -1)
    df = df.withColumn("_toks", toks)
    reason: Column | None = None
    for tool, spec in SINKS.items():
        r = _reject_expr(spec, dialect, opts)
        reason = F.when(F.col("tool") == tool, r) if reason is None else reason.when(
            F.col("tool") == tool, r
        )
    assert reason is not None
    reason = reason.otherwise(F.lit("unimplemented_tool"))
    return df.withColumn("reject_reason", reason).drop("_toks")
