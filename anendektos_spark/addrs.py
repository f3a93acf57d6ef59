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
