"""Independent pure-Python oracle for the parse semantics.

Implements the reference's per-line extraction contract (SURVEY.md §1.3)
imperatively, row at a time, like the reference itself — deliberately a
different code path from the Spark column plan so a shared bug is
unlikely. Used only in tests.
"""

from __future__ import annotations

import ipaddress
import re

from anendektos_spark.dialect import Dialect
from anendektos_spark.schemas import SINKS, Kind

INT32 = 2**31

# Python int()/float() are laxer than D to!int/to!double: they trim
# whitespace and accept "5_0", Unicode digits, and "inf"/"nan". The strict
# grammars below match D (whitespace-padded tokens throw) except inf/nan
# spellings, which are rejected here AND in the Spark plan (parse.py
# _DBL_RE) — the documented shared divergence from D.
_INT_RE = re.compile(r"[+-]?[0-9]+")
_DBL_RE = re.compile(r"[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?")


def _int_strict(s: str) -> int:
    if not _INT_RE.fullmatch(s):
        raise ValueError(s)
    v = int(s)
    if not (-INT32 <= v < INT32):
        raise ValueError("overflow")
    return v


def _float_strict(s: str) -> float:
    if not _DBL_RE.fullmatch(s):
        raise ValueError(s)
    return float(s)


def _addr(s: str) -> str:
    return ipaddress.ip_address(s).compressed


def parse_line(tool: str, line: str, d: Dialect | None = None) -> dict | None:
    """Returns the record dict, or None if the row is dropped."""
    d = d or Dialect()
    line = line.strip()
    if not line or line.startswith("#"):
        return None
    toks = line.split(d.separator)
    spec = SINKS[tool]
    if len(toks) != len(spec):
        return None
    rec: dict = {}
    try:
        for i, c in enumerate(spec):
            t = toks[i]
            k = c.kind
            if k == Kind.STR:
                rec[c.name] = t
            elif k == Kind.STR_NULL:
                rec[c.name] = None if t == d.unset_field else t
            elif k == Kind.INT:
                rec[c.name] = _int_strict(t)
            elif k == Kind.INT_NULL:
                rec[c.name] = None if t == d.unset_field else _int_strict(t)
            elif k == Kind.DBL:
                rec[c.name] = _float_strict(t)
            elif k == Kind.DBL_NULL:
                rec[c.name] = None if t == d.unset_field else _float_strict(t)
            elif k == Kind.ADDR:
                rec[c.name] = _addr(t)
            elif k == Kind.BOOL_TF:
                rec[c.name] = None if t == d.unset_field else (t != "F")
            elif k == Kind.BOOL_01:
                rec[c.name] = None if t == d.unset_field else (t != "0")
            elif k == Kind.ARR_STR_UNSET:
                rec[c.name] = [] if t == d.unset_field else t.split(d.set_separator)
            elif k == Kind.ARR_STR_EMPTY:
                rec[c.name] = [] if t == d.empty_field else t.split(d.set_separator)
            elif k == Kind.ARR_STR_BOTH:
                rec[c.name] = (
                    [] if t in (d.unset_field, d.empty_field) else t.split(d.set_separator)
                )
            elif k == Kind.ARR_DBL_UNSET:
                rec[c.name] = (
                    [] if t == d.unset_field else [_float_strict(x) for x in t.split(d.set_separator)]
                )
            elif k == Kind.ARR_ADDR_UNSET:
                rec[c.name] = (
                    [] if t == d.unset_field else [_addr(x) for x in t.split(d.set_separator)]
                )
            elif k == Kind.ARR_ADDR_NULL:
                rec[c.name] = (
                    None if t == d.unset_field else [_addr(x) for x in t.split(d.set_separator)]
                )
            else:  # pragma: no cover
                raise AssertionError(k)
    except ValueError:
        return None  # row-drop on bad cast / bad address
    return rec


def parse_fixture(tool: str, lines: list[str]) -> list[dict]:
    out = []
    for line in lines:
        rec = parse_line(tool, line)
        if rec is not None:
            out.append(rec)
    return out
