"""IP address normalization — the one stage that genuinely needs Python.

The reference normalizes every addr field through std.socket's
``parseAddress`` and asserts the canonical text form (conn.d:81/90; the
golden form ``fe80::250:f1ff:fe80:0`` at conn.d:388 is RFC-5952
compression, which Python's ``ipaddress`` reproduces exactly).

Spark has no builtin inet type, so this is a vectorized Arrow pandas UDF
(never a row-at-a-time Python UDF). Three scale decisions:

- per-batch memoization: log addresses are heavily repeated, so each Arrow
  batch normalizes only its *unique* values and maps the rest through a
  dict — O(distinct) Python work per batch instead of O(rows).
- an invalid address yields null, which the parse plan turns into a
  row-drop to the rejects channel (the reference's parseAddress throw
  aborts the whole file, parser.d:87-89; per-row rejection is the
  documented, strictly-more-graceful rebuild policy).
- the UDFs are built by factories as *closures with no module-global
  references*, so cloudpickle serializes them by value: executors never
  need ``anendektos_spark`` importable. The job runs under bare
  ``spark-submit`` even before --py-files ships the package.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T
from pyspark.sql.functions import pandas_udf


def _make_normalize_addr():
    def _norm(s):
        import ipaddress

        def one(v):
            if v is None:
                return None
            try:
                return ipaddress.ip_address(v).compressed
            except ValueError:
                return None

        mapping = {v: one(v) for v in s.dropna().unique()}
        return s.map(mapping)

    return pandas_udf(_norm, T.StringType())


def _make_normalize_addr_array():
    def _norm_arr(s):
        import ipaddress

        mapping: dict = {}

        def one(v):
            try:
                return ipaddress.ip_address(v).compressed
            except ValueError:
                return None

        def norm_list(lst):
            if lst is None:
                return None
            out = []
            for v in lst:
                if v not in mapping:
                    mapping[v] = one(v)
                out.append(mapping[v])
            return out

        return s.map(norm_list)

    return pandas_udf(_norm_arr, T.ArrayType(T.StringType()))


normalize_addr = _make_normalize_addr()
normalize_addr_array = _make_normalize_addr_array()


ADDR_REGEX = (
    r"^((\d{1,3}\.){3}\d{1,3}|([0-9A-Fa-f]{0,4}:){1,7}[0-9A-Fa-f:.]{0,24})$"
)


def validate_addr_passthrough(col: Column) -> Column:
    """Zero-Python fast path: shape-validate without canonicalizing.

    For producers that already emit RFC-5952 text (as all reference
    fixtures do), this keeps the whole parse inside whole-stage codegen.
    Selected via ParseOptions.addr_mode == "passthrough".
    """
    return F.when(col.rlike(ADDR_REGEX), col)


# Strict already-canonical IPv4: four 0-255 octets, no leading zeros.
# For any string this matches, ``ipaddress.ip_address(s).compressed == s``
# (dotted-quad IS the canonical v4 text form, and the no-leading-zero /
# range constraints make the match unambiguous), so the value can skip
# Python entirely.
_OCTET = r"(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)"
CANONICAL_V4_RE = rf"^{_OCTET}(\.{_OCTET}){{3}}$"


def normalize_addr_hybrid(col: Column) -> Column:
    """Reference-faithful normalization with a JVM fast path.

    Log traffic is overwhelmingly already-canonical IPv4; those values
    resolve inside whole-stage codegen (one rlike) and the Arrow UDF's
    input is MASKED TO NULL for them — Arrow ships a null bitmap instead
    of string buffers both ways, and the per-batch unique set the UDF
    memoizes over shrinks to the rare values (IPv6, malformed, leading-
    zero v4). Spark evaluates extracted Python UDFs unconditionally
    regardless of CASE branches, so masking the *argument* is the only
    way to make the fast path cheap; the result CASE then re-selects.
    Bit-identical to ``normalize_addr`` for every input (pinned in
    tests/test_golden_sinks.py::test_hybrid_addr_equivalence)."""
    fast = col.rlike(CANONICAL_V4_RE)
    masked = F.when(~fast, col)
    return F.when(fast, col).otherwise(normalize_addr(masked))


def normalize_addr_array_hybrid(col: Column) -> Column:
    """Array variant of the hybrid fast path: a whole array skips Python
    iff every element is already-canonical IPv4 (empty arrays trivially
    qualify and pass through unchanged, as the UDF would return them)."""
    fast = F.forall(col, lambda x: x.rlike(CANONICAL_V4_RE))
    masked = F.when(~fast, col)
    return F.when(fast, col).otherwise(normalize_addr_array(masked))
