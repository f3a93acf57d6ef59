"""Per-sink column specs — the data that drives the generic parse stage.

The reference hand-writes six positional extractors (conn.d:58-197,
dns.d:62-206, http.d:66-223, files.d:62-214, ssl.d:57-153, x509.d:57-174).
Here each sink is a declarative list of ``Col(name, kind)`` whose list
index IS the token position; one generic plan builder (parse.py) compiles a
spec into pure Catalyst column expressions. Semantics per kind:

- strict numeric kinds (INT/DBL and their _NULL variants) reproduce the
  reference's try/catch row-drop: a malformed value sends the WHOLE row to
  the rejects channel (conn.d:73-78 et al.). The _NULL variants first map
  the unset sentinel to null (conn.d:101-149 pattern).
- BOOL_TF: unset → null; ``"F"`` → false; anything else → true
  (dns.d:146-176). BOOL_01: unset → null; ``"0"`` → false; else true —
  conn's local_orig/local_resp only (conn.d:133-149).
- array kinds: non-Nullable D arrays default to EMPTY (the reference
  tests assert shouldBeEmpty — dns.d:317-318, http.d:295-303,
  ssl.d:251-252, files.d:331), so the sentinel maps to ``array()`` not
  null; the one Nullable array, x509 san_ip (x509.d:43), maps to null.
  Which sentinel each column checks is per-column, exactly as the
  reference wrote it (ssl checks both, ssl.d:131-135; http's vector
  columns check only unset, http.d:172-218).
- ADDR kinds normalize IP text via the vectorized Arrow UDF in addrs.py
  (parseAddress analog, conn.d:81/90; asserted form conn.d:388).
- unset on a non-Nullable D scalar leaves a D default; the surface
  semantics in the reference's own tests is null (conn.d:257 asserts
  unset service == null), so all unset-gated scalars are null here
  (SURVEY.md §7).

Known divergence, by design: ssl gates client_subject on token 19 but
assigns token 18 (ssl.d:143-144) — a bug not observable in any fixture;
we implement the intended per-column gating (SURVEY.md §1.3.6).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from pyspark.sql import types as T


class Kind(str, Enum):
    STR = "str"                      # plain string, no sentinel check
    STR_NULL = "str_null"            # unset → null
    INT = "int"                      # strict int32; bad cast → drop row
    INT_NULL = "int_null"            # unset → null; else strict int32 drop
    DBL = "dbl"                      # strict double; bad cast → drop row
    DBL_NULL = "dbl_null"            # unset → null; else strict double drop
    ADDR = "addr"                    # normalized IP text
    BOOL_TF = "bool_tf"              # unset → null; "F" false else true
    BOOL_01 = "bool_01"              # unset → null; "0" false else true
    ARR_STR_UNSET = "arr_str_unset"  # unset → []; else split
    ARR_STR_EMPTY = "arr_str_empty"  # empty → []; else split
    ARR_STR_BOTH = "arr_str_both"    # unset or empty → []; else split
    ARR_DBL_UNSET = "arr_dbl_unset"  # unset → []; else split+cast (bad elem → drop row)
    ARR_ADDR_UNSET = "arr_addr_unset"  # unset → []; else split+normalize
    ARR_ADDR_NULL = "arr_addr_null"  # unset → null; else split+normalize


@dataclass(frozen=True)
class Col:
    name: str
    kind: Kind


_K = Kind

# conn.d:25-47 (struct), conn.d:58-197 (positional extraction)
CONN = [
    Col("ts", _K.DBL), Col("uid", _K.STR), Col("orig_h", _K.ADDR),
    Col("orig_p", _K.INT), Col("resp_h", _K.ADDR), Col("resp_p", _K.INT),
    Col("proto", _K.STR), Col("service", _K.STR_NULL),
    Col("duration", _K.DBL_NULL), Col("orig_bytes", _K.INT_NULL),
    Col("resp_bytes", _K.INT_NULL), Col("conn_state", _K.STR),
    Col("local_orig", _K.BOOL_01), Col("local_resp", _K.BOOL_01),
    Col("missed_bytes", _K.INT), Col("history", _K.STR_NULL),
    Col("orig_pkts", _K.INT), Col("orig_ip_bytes", _K.INT),
    Col("resp_pkts", _K.INT), Col("resp_ip_bytes", _K.INT),
    Col("tunnel_parents", _K.ARR_STR_EMPTY),
]

# dns.d:26-51, dns.d:62-206
DNS = [
    Col("ts", _K.DBL), Col("uid", _K.STR), Col("orig_h", _K.ADDR),
    Col("orig_p", _K.INT), Col("resp_h", _K.ADDR), Col("resp_p", _K.INT),
    Col("proto", _K.STR), Col("trans_id", _K.INT), Col("rtt", _K.DBL_NULL),
    Col("query", _K.STR), Col("qclass", _K.INT), Col("qclass_name", _K.STR),
    Col("qtype", _K.INT), Col("qtype_name", _K.STR), Col("rcode", _K.INT_NULL),
    Col("rcode_name", _K.STR), Col("AA", _K.BOOL_TF), Col("TC", _K.BOOL_TF),
    Col("RD", _K.BOOL_TF), Col("RA", _K.BOOL_TF), Col("Z", _K.INT),
    Col("answers", _K.ARR_STR_UNSET), Col("TTLs", _K.ARR_DBL_UNSET),
    Col("rejected", _K.BOOL_TF),
]

# http.d:25-55, http.d:66-223
HTTP = [
    Col("ts", _K.DBL), Col("uid", _K.STR), Col("orig_h", _K.ADDR),
    Col("orig_p", _K.INT), Col("resp_h", _K.ADDR), Col("resp_p", _K.INT),
    Col("trans_depth", _K.INT), Col("method", _K.STR), Col("host", _K.STR),
    Col("uri", _K.STR), Col("referrer", _K.STR_NULL),
    Col("http_version", _K.STR), Col("user_agent", _K.STR),
    Col("request_body_len", _K.INT), Col("response_body_len", _K.INT),
    Col("status_code", _K.INT), Col("status_msg", _K.STR),
    Col("info_code", _K.INT_NULL), Col("info_msg", _K.STR_NULL),
    Col("tags", _K.ARR_STR_EMPTY), Col("username", _K.STR_NULL),
    Col("password", _K.STR_NULL), Col("proxied", _K.ARR_STR_UNSET),
    Col("orig_fuids", _K.ARR_STR_UNSET), Col("orig_filenames", _K.ARR_STR_UNSET),
    Col("orig_mime_types", _K.ARR_STR_UNSET), Col("resp_fuids", _K.ARR_STR_UNSET),
    Col("resp_filenames", _K.ARR_STR_UNSET), Col("resp_mime_types", _K.ARR_STR_UNSET),
]

# files.d:25-51, files.d:62-214
FILES = [
    Col("ts", _K.DBL), Col("fuid", _K.STR),
    Col("tx_hosts", _K.ARR_ADDR_UNSET), Col("rx_hosts", _K.ARR_ADDR_UNSET),
    Col("conn_uids", _K.ARR_STR_UNSET), Col("source", _K.STR),
    Col("depth", _K.INT), Col("analyzers", _K.ARR_STR_EMPTY),
    Col("mime_type", _K.STR), Col("filename", _K.STR_NULL),
    Col("duration", _K.DBL), Col("local_orig", _K.BOOL_TF),
    Col("is_orig", _K.BOOL_TF), Col("seen_bytes", _K.INT),
    Col("total_bytes", _K.INT_NULL), Col("missing_bytes", _K.INT),
    Col("overflow_bytes", _K.INT), Col("timedout", _K.BOOL_TF),
    Col("parent_fuid", _K.STR_NULL), Col("md5", _K.STR_NULL),
    Col("sha1", _K.STR_NULL), Col("sha256", _K.STR_NULL),
    Col("extracted", _K.STR_NULL), Col("extracted_cutoff", _K.BOOL_TF),
    Col("extracted_size", _K.INT_NULL),
]

# ssl.d:25-46, ssl.d:57-153
SSL = [
    Col("ts", _K.DBL), Col("uid", _K.STR), Col("orig_h", _K.ADDR),
    Col("orig_p", _K.INT), Col("resp_h", _K.ADDR), Col("resp_p", _K.INT),
    Col("ssl_version", _K.STR_NULL), Col("cipher", _K.STR_NULL),
    Col("curve", _K.STR_NULL), Col("server_name", _K.STR),
    Col("resumed", _K.BOOL_TF), Col("last_alert", _K.STR_NULL),
    Col("next_protocol", _K.STR_NULL), Col("established", _K.BOOL_TF),
    Col("cert_chain_fuids", _K.ARR_STR_BOTH),
    Col("client_cert_chain_fuids", _K.ARR_STR_BOTH),
    Col("subject", _K.STR_NULL), Col("issuer", _K.STR_NULL),
    Col("client_subject", _K.STR_NULL), Col("client_issuer", _K.STR_NULL),
]

# x509.d:25-46, x509.d:57-174
X509 = [
    Col("ts", _K.DBL), Col("id", _K.STR), Col("certificate_version", _K.INT),
    Col("certificate_serial", _K.STR), Col("certificate_subject", _K.STR),
    Col("certificate_issuer", _K.STR),
    Col("certificate_not_valid_before", _K.DBL),
    Col("certificate_not_valid_after", _K.DBL),
    Col("certificate_key_alg", _K.STR), Col("certificate_sig_alg", _K.STR),
    Col("certificate_key_type", _K.STR), Col("certificate_key_length", _K.INT),
    Col("certificate_exponent", _K.INT_NULL),
    Col("certificate_curve", _K.STR_NULL), Col("san_dns", _K.ARR_STR_UNSET),
    Col("san_uri", _K.ARR_STR_UNSET), Col("san_email", _K.ARR_STR_UNSET),
    Col("san_ip", _K.ARR_ADDR_NULL),
    Col("basic_constraints_ca", _K.BOOL_TF),
    Col("basic_constraints_path_len", _K.INT_NULL),
]

SINKS: dict[str, list[Col]] = {
    "conn": CONN, "dns": DNS, "http": HTTP,
    "files": FILES, "ssl": SSL, "x509": X509,
}

# The reference dispatches on these exact path values (parser.d:72-86);
# anything else goes to the "not implemented" warning channel (parser.d:85).
KNOWN_TOOLS = tuple(SINKS)

# Key column per sink — the reference tests locate golden records by it
# (uid: conn.d:244, dns.d:254; fuid: files.d:262; id: x509.d:222).
KEY_COLUMN = {
    "conn": "uid", "dns": "uid", "http": "uid",
    "files": "fuid", "ssl": "uid", "x509": "id",
}

_SPARK_TYPE = {
    Kind.STR: T.StringType(), Kind.STR_NULL: T.StringType(),
    Kind.INT: T.IntegerType(), Kind.INT_NULL: T.IntegerType(),
    Kind.DBL: T.DoubleType(), Kind.DBL_NULL: T.DoubleType(),
    Kind.ADDR: T.StringType(),
    Kind.BOOL_TF: T.BooleanType(), Kind.BOOL_01: T.BooleanType(),
    Kind.ARR_STR_UNSET: T.ArrayType(T.StringType()),
    Kind.ARR_STR_EMPTY: T.ArrayType(T.StringType()),
    Kind.ARR_STR_BOTH: T.ArrayType(T.StringType()),
    Kind.ARR_DBL_UNSET: T.ArrayType(T.DoubleType()),
    Kind.ARR_ADDR_UNSET: T.ArrayType(T.StringType()),
    Kind.ARR_ADDR_NULL: T.ArrayType(T.StringType()),
}

# Lineage columns carried through from the transcripts source on every
# parsed row (the reference's ordinal key parser.d:171-179 generalizes to
# the (conv_id, turn_idx) identity the input already has).
LINEAGE_COLUMNS = ["conv_id", "turn_idx", "role", "tool", "src_ts"]

TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def sink_struct(tool: str) -> T.StructType:
    """StructType of one routed sink table (parsed fields only)."""
    return T.StructType([
        T.StructField(c.name, _SPARK_TYPE[c.kind], nullable=True) for c in SINKS[tool]
    ])


def is_addr_kind(kind: Kind) -> bool:
    return kind in (Kind.ADDR, Kind.ARR_ADDR_UNSET, Kind.ARR_ADDR_NULL)
