"""Dialect sniffing tests — mirrors parser.d:208-274 (separator variants,
#open parse, full #fields list, invalid entry, convHex)."""

from __future__ import annotations

from datetime import datetime

import pytest

from anendektos_spark.dialect import DialectError, conv_hex, parse_header_lines

TAB_HEADER = [
    "#separator \\x09",
    "#set_separator\t,",
    "#empty_field\t(empty)",
    "#unset_field\t-",
    "#path\tconn",
    "#open\t2018-07-15-16-39-41",
    "#fields\tts\tuid\tid.orig_h",
    "#types\ttime\tstring\taddr",
    "1531687176.789848\tCI3wQF1KHxU6G7VmTj\t10.0.0.2",
]


def test_conv_hex():
    assert conv_hex("\\x09") == "\t"
    assert conv_hex("\\x20") == " "
    assert conv_hex("\\x7c") == "|"


def test_tab_header():
    h = parse_header_lines(TAB_HEADER)
    assert h.dialect.separator == "\t"
    assert h.dialect.set_separator == ","
    assert h.dialect.empty_field == "(empty)"
    assert h.dialect.unset_field == "-"
    assert h.path == "conn"
    assert h.open_ts == datetime(2018, 7, 15, 16, 39, 41)
    assert h.fields == ["ts", "uid", "id.orig_h"]


@pytest.mark.parametrize(
    ("sep_line", "sep"),
    [("#separator \\x20", " "), ("#separator |", "|")],
)
def test_separator_variants(sep_line, sep):
    lines = [sep_line] + [ln.replace("\t", sep) for ln in TAB_HEADER[1:8]]
    h = parse_header_lines(lines)
    assert h.dialect.separator == sep
    assert h.path == "conn"
    assert h.fields[:2] == ["ts", "uid"]


def test_invalid_entry_rejected():
    lines = TAB_HEADER[:5] + ["#invalid_field\t123"] + TAB_HEADER[5:]
    with pytest.raises(DialectError, match="invalid_field"):
        parse_header_lines(lines)


def test_types_and_close_ignored():
    h = parse_header_lines(TAB_HEADER + ["#close\t2018-07-15-16-40-00"])
    assert h.path == "conn"
