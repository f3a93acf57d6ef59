"""Dialect: the tokenization contract of a Zeek-style log.

In the reference the dialect lives in each file's ``#``-prefixed header and
is sniffed per file (parser.d:96-165). In the rebuild the transcript table
carries one dialect per pipeline (headers are file metadata, not row data),
so the dialect is a plain config object — but the sniffing logic itself is
kept (driver-side, tiny, O(header lines)) for the Zeek-file source
(sources/zeek_tsv.py) and for dialect-variant test fixtures
(tests/headers/*.log analogs).

Semantics reproduced from the reference:
- ``#separator`` value is split on a literal space and may be a 2-digit hex
  escape ``\\xHH`` (parser.d:109-116, convHex parser.d:187-201).
- every other header line is split on the *discovered* separator
  (parser.d:120-153).
- ``#types`` is recognized but ignored (parser.d:156-158).
- any other ``#`` key is fatal (parser.d:160) → here: ``DialectError``.
- header scan stops at the first non-``#`` line (parser.d:103-106).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime


class DialectError(ValueError):
    """Invalid or unknown entry in a log header (parser.d:160 analog)."""


@dataclass(frozen=True)
class Dialect:
    """Tokenization constants. Defaults match every fixture header."""

    separator: str = "\t"
    set_separator: str = ","
    empty_field: str = "(empty)"
    unset_field: str = "-"


@dataclass
class Header:
    """Sniffed per-file metadata: dialect + routing key + declared fields.

    ``path`` is the routing key (the reference dispatches parsers on it,
    parser.d:72-86); ``fields`` are stored-but-not-extraction-driving, as
    in the reference (parser.d:151-154 — extraction is positional).
    """

    dialect: Dialect = field(default_factory=Dialect)
    path: str = ""
    open_ts: datetime | None = None
    fields: list[str] = field(default_factory=list)


# Documented divergence from the reference: parser.d:160 is fatal on ANY
# header key outside its known set, which includes ``#close`` — but
# ``#close`` appears only as the LAST line of a finished Zeek log, after
# the data, where the reference's header sniff (which stops at the first
# non-``#`` line, parser.d:103-106) never sees it. Treating it as
# known-ignored here lets the sniffer accept a complete rotated log file
# read top-to-bottom; the divergence is unobservable on any real log and
# pinned by tests/test_dialect.py::test_types_and_close_ignored.
_KNOWN_IGNORED = ("#types", "#close")


def conv_hex(escaped: str) -> str:
    """Decode a ``\\xHH`` separator escape: ``"\\x09"`` → ``"\t"``.

    Mirrors convHex (parser.d:187-201): exactly the two characters after
    the leading ``\\x`` are read as hex.
    """
    return chr(int(escaped[2:4], 16))


def parse_header_lines(lines: list[str]) -> Header:
    """Sniff a header from the leading lines of a Zeek-style log.

    Accepts the full file's lines; stops at the first non-``#`` line.
    Raises DialectError on an unknown ``#`` key, like the reference's
    fatal (parser.d:160).
    """
    sep = "\t"
    set_sep, empty, unset = ",", "(empty)", "-"
    path, open_ts, fields = "", None, []
    for raw in lines:
        line = raw.strip()
        if not line.startswith("#"):
            break
        if line.startswith("#separator"):
            val = line.split(" ")[1]
            sep = conv_hex(val) if val.startswith("\\x") else val
        elif line.startswith("#set_separator"):
            set_sep = line.split(sep)[1]
        elif line.startswith("#empty_field"):
            empty = line.split(sep)[1]
        elif line.startswith("#unset_field"):
            unset = line.split(sep)[1]
        elif line.startswith("#path"):
            path = line.split(sep)[1]
        elif line.startswith("#open"):
            y, mo, d, h, mi, s = (int(x) for x in line.split(sep)[1].split("-"))
            open_ts = datetime(y, mo, d, h, mi, s)
        elif line.startswith("#fields"):
            fields = line.split(sep)[1:]
        elif line.startswith(_KNOWN_IGNORED):
            continue
        else:
            raise DialectError(f"Invalid or unknown entry {line.split(sep)[0]!r} in header")
    return Header(
        dialect=Dialect(separator=sep, set_separator=set_sep, empty_field=empty, unset_field=unset),
        path=path,
        open_ts=open_ts,
        fields=fields,
    )
