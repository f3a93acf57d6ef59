"""Golden end-to-end tests mirroring the reference's fixture tests
(conn.d:201-441, dns.d:210-394, http.d:231-389, files.d:222-441,
ssl.d:160-323, x509.d:180-313): per-sink record counts, full-field
equality for every record (vs the independent pyref oracle), and
hardcoded spot checks transcribed from the reference's own assertions.
"""

from __future__ import annotations

import math

import pytest

from anendektos_spark.data.zeek_fixture_lines import FIXTURE_LINES
from anendektos_spark.fixtures import fixture_transcripts
from anendektos_spark.route import route
from anendektos_spark.schemas import KEY_COLUMN, SINKS

from .pyref import parse_fixture

GOLDEN_COUNTS = {"conn": 6, "dns": 4, "http": 3, "files": 4, "ssl": 4, "x509": 3}


@pytest.fixture(scope="module")
def routed(spark):
    r = route(fixture_transcripts(spark))
    return {t: df.collect() for t, df in r.sinks.items()}, r.rejects.collect()


def _by_key(rows, key):
    return {row[key]: row for row in rows}


@pytest.mark.parametrize("tool", list(GOLDEN_COUNTS))
def test_counts(routed, tool):
    sinks, _ = routed
    assert len(sinks[tool]) == GOLDEN_COUNTS[tool]


@pytest.mark.parametrize("tool", list(GOLDEN_COUNTS))
def test_full_field_equality_vs_oracle(routed, tool):
    sinks, _ = routed
    key = KEY_COLUMN[tool]
    got = _by_key(sinks[tool], key)
    want = _by_key(parse_fixture(tool, FIXTURE_LINES[tool]), key)
    assert set(got) == set(want)
    for k in want:
        for col in (c.name for c in SINKS[tool]):
            g, w = got[k][col], want[k][col]
            if isinstance(w, float):
                assert g == pytest.approx(w, abs=0.0), f"{tool}.{col} key={k}"
            else:
                assert g == w, f"{tool}.{col} key={k}: got {g!r} want {w!r}"


def test_conn_record_1_spot(routed):
    # conn.d:239-268: uid CI3wQF1KHxU6G7VmTj
    sinks, _ = routed
    r = _by_key(sinks["conn"], "uid")["CI3wQF1KHxU6G7VmTj"]
    assert r["ts"] == 1531687176.789848
    assert r["orig_h"] == "10.0.0.2" and r["orig_p"] == 60716
    assert r["resp_h"] == "192.168.1.4" and r["resp_p"] == 443
    assert r["proto"] == "tcp"
    assert r["service"] is None           # unset '-' → null (conn.d:257)
    assert r["duration"] == 0.170522
    assert r["orig_bytes"] == 1859 and r["resp_bytes"] == 524
    assert r["conn_state"] == "RSTRH"
    assert r["local_orig"] is None and r["local_resp"] is None
    assert r["missed_bytes"] == 0
    assert r["history"] == "^dADar"
    assert r["orig_pkts"] == 4 and r["orig_ip_bytes"] == 2498
    assert r["resp_pkts"] == 3 and r["resp_ip_bytes"] == 668
    assert r["tunnel_parents"] == []      # (empty) → empty array


def test_conn_ipv6_normalization(routed):
    # conn.d:388-390: normalized RFC-5952 text
    sinks, _ = routed
    r = _by_key(sinks["conn"], "uid")["CTs6Ib3G1SsnrfuJak"]
    assert r["orig_h"] == "fe80::250:f1ff:fe80:0"
    assert r["resp_h"] == "fe80::1"
    assert r["local_orig"] is None and r["local_resp"] is False  # '0' → false


def test_conn_bool01_true(routed):
    # conn.d:286-290 row 2: local_orig '1' → true
    sinks, _ = routed
    r = _by_key(sinks["conn"], "uid")["CseN5l3TT2T9wz29gd"]
    assert r["local_orig"] is True and r["local_resp"] is None
    assert r["service"] == "ssl"


def test_dns_arrays_and_bools(routed):
    sinks, _ = routed
    recs = _by_key(sinks["dns"], "uid")
    r1 = recs["COac2a2ZLGZJSbS2r5"]   # dns.d:248-281
    assert r1["answers"] == ["192.169.17.3"] and r1["TTLs"] == [4.0]
    assert r1["AA"] is True and r1["TC"] is False and r1["RD"] is True and r1["RA"] is True
    assert r1["rtt"] == 0.016022
    r2 = recs["CNjL5d4o5z2c92Dm9j"]   # dns.d:285-318: unset '-' arrays → empty
    assert r2["answers"] == [] and r2["TTLs"] == []
    assert r2["rtt"] is None
    r4 = recs["CQPWD5kcGNGECLpQe"]
    assert r4["rejected"] is True


def test_http_nullables_and_arrays(routed):
    sinks, _ = routed
    recs = _by_key(sinks["http"], "uid")
    r1 = recs["CuVIzg2991yFw6ZZl"]    # http.d:265-303
    assert r1["referrer"] == "example.com"
    assert r1["info_code"] == 104 and r1["info_msg"] == "informative message"
    assert r1["tags"] == [] and r1["proxied"] == []
    assert r1["orig_fuids"] == ["FFRgqxygVeipwAvKl"]
    assert r1["orig_mime_types"] == ["application/ocsp-request"]
    assert r1["username"] is None and r1["password"] is None
    r2 = recs["CBlWr94sL2KePoCqz7"]   # http.d:307-345
    assert r2["referrer"] is None and r2["info_code"] is None
    assert r2["username"] == "test_user" and r2["password"] == "password"


def test_files_addr_arrays(routed):
    sinks, _ = routed
    recs = _by_key(sinks["files"], "fuid")
    r1 = recs["FqxvGx22DT6AwxHGPl"]   # files.d:256-294
    assert r1["tx_hosts"] == ["10.0.0.5"] and r1["rx_hosts"] == ["10.0.0.2"]
    assert r1["analyzers"] == ["X509", "MD5", "SHA1"]
    assert r1["md5"] == "5c7ef8e7311db007a796fcfb69335e68"
    assert r1["sha256"] is None and r1["total_bytes"] is None
    assert r1["local_orig"] is True and r1["is_orig"] is False
    r2 = recs["FFRgqxygVeipwAvKl"]
    assert r2["tx_hosts"] == ["fe80::250:f1ff:fe80:0"]
    assert r2["analyzers"] == [] and r2["total_bytes"] == 75
    r4 = recs["F6sICI3IY4vu5U4ys1"]
    assert r4["local_orig"] is None and r4["extracted_cutoff"] is True
    assert r4["extracted_size"] == 1800


def test_ssl_dual_sentinel_arrays(routed):
    sinks, _ = routed
    recs = _by_key(sinks["ssl"], "uid")
    r1 = recs["C49NlPigbiwRa1aJ3"]    # ssl.d:193-226
    assert r1["cert_chain_fuids"] == ["FqxvGx22DT6AwxHGPl", "FwwOhm4iR4jYQbaAS"]
    assert r1["client_cert_chain_fuids"] == []   # (empty) sentinel
    # ssl.d:220 (D literal \\\\ = two raw backslashes in the data)
    assert r1["subject"] == "CN=www.content.com,O=Content\\\\, Inc.,L=Hometown,ST=California,C=US"
    assert r1["resumed"] is False and r1["established"] is True
    r3 = recs["CuMGVfUkGoFTcia6g"]    # ssl.d:259-290: all-unset row
    assert r3["ssl_version"] is None and r3["cipher"] is None
    assert r3["cert_chain_fuids"] == [] and r3["client_cert_chain_fuids"] == []
    assert r3["established"] is False


def test_x509_san_ip_null_vs_empty(routed):
    sinks, _ = routed
    recs = _by_key(sinks["x509"], "id")
    r1 = recs["FVz825C4jlDdo6b14"]    # x509.d:216-248
    assert r1["certificate_version"] == 3
    assert r1["certificate_serial"] == "4B32DE72CAA28369"
    assert r1["certificate_exponent"] is None
    assert r1["certificate_curve"] == "prime256v1"
    assert len(r1["san_dns"]) == 5 and r1["san_dns"][0] == "*.companynameapis.com"
    assert r1["san_ip"] is None       # Nullable!(Address[]) unset → null (x509.d:43)
    assert r1["san_uri"] == [] and r1["san_email"] == []
    assert r1["basic_constraints_ca"] is False
    assert r1["basic_constraints_path_len"] is None
    r2 = recs["F8ZbvG3ftnyrB5Ezui"]
    assert r2["certificate_exponent"] == 65537
    assert r2["basic_constraints_ca"] is True and r2["basic_constraints_path_len"] == 0
    assert r2["certificate_not_valid_before"] == 1497499242.0


def test_ts_values_are_bit_exact(routed):
    sinks, _ = routed
    got = sorted(r["ts"] for r in sinks["conn"])
    want = sorted(float(line.split("\t")[0]) for line in FIXTURE_LINES["conn"])
    assert got == want and not any(math.isnan(x) for x in got)


def test_unknown_tool_goes_to_rejects(routed):
    _, rejects = routed
    unk = [r for r in rejects if r["reject_reason"] == "unimplemented_tool"]
    assert {r["tool"] for r in unk} == {"weird", "telemetry"}
    assert len(unk) == 2


def test_hybrid_addr_equivalence(spark):
    """The JVM-fast-path hybrid normalizer must be BIT-IDENTICAL to the
    pure Arrow-UDF normalizer on every input class: canonical v4,
    leading-zero v4 (invalid per modern ipaddress), out-of-range v4,
    short v4, uppercase/expandable/compressed v6, v4-mapped v6, garbage,
    empty, null."""
    from anendektos_spark.addrs import (
        normalize_addr,
        normalize_addr_array,
        normalize_addr_array_hybrid,
        normalize_addr_hybrid,
    )
    from pyspark.sql import functions as F

    vals = [
        "1.2.3.4", "0.0.0.0", "255.255.255.255", "192.168.0.1",
        "01.2.3.4", "1.2.3.04", "999.1.1.1", "256.0.0.1", "1.2.3",
        "1.2.3.4.5", "FE80::1", "fe80:0000:0000:0000:0250:f1ff:fe80:0000",
        "fe80::250:f1ff:fe80:0", "::ffff:1.2.3.4", "::1", "not-an-ip",
        "", " 1.2.3.4", "1.2.3.4 ", None,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "a string")
    out = df.select(
        normalize_addr(F.col("a")).alias("pure"),
        normalize_addr_hybrid(F.col("a")).alias("hyb"),
    ).collect()
    for v, r in zip(vals, out):
        assert r.pure == r.hyb, f"{v!r}: pure={r.pure!r} hybrid={r.hyb!r}"

    arrs = [
        ["1.2.3.4", "10.0.0.1"],          # all-canonical: JVM path
        ["1.2.3.4", "FE80::1"],           # mixed: UDF path
        ["01.2.3.4"],                      # invalid: null element
        [],                                # empty: unchanged
        None,
    ]
    df2 = spark.createDataFrame([(v,) for v in arrs], "a array<string>")
    out2 = df2.select(
        normalize_addr_array(F.col("a")).alias("pure"),
        normalize_addr_array_hybrid(F.col("a")).alias("hyb"),
    ).collect()
    for v, r in zip(arrs, out2):
        assert r.pure == r.hyb, f"{v!r}: pure={r.pure!r} hybrid={r.hyb!r}"
