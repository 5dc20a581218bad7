"""WARC ingestion: pure-Python record iterator + distributed reader.

Hand-built shards (plain, multi-member gzip, truncated) pin the ISO
28500 subset the reader documents; the Spark path is exercised through
``read_warc`` end-to-end on files written to tmp_path.
"""

from __future__ import annotations

import gzip

import pytest

from ontology_mapping_spark.sources.warc import (
    iter_warc_records,
    read_warc,
    split_http_response,
    stream_warc,
)


def _record(rtype: str, payload: bytes, uri: str | None = None,
            date: str = "2026-03-01T10:20:30Z") -> bytes:
    headers = [f"WARC-Type: {rtype}"]
    if uri is not None:
        headers.append(f"WARC-Target-URI: {uri}")
    headers.append(f"WARC-Date: {date}")
    headers.append(f"Content-Length: {len(payload)}")
    head = "WARC/1.0\r\n" + "\r\n".join(headers) + "\r\n\r\n"
    return head.encode() + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200,
          ctype: str = "text/html; charset=utf-8") -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


_INFO = _record("warcinfo", b"software: test\r\n")
_REQ = _record("request", b"GET / HTTP/1.1\r\nHost: a.example\r\n\r\n",
               uri="http://a.example/")
_RESP_A = _record("response", _http(b"<html>alpha</html>"),
                  uri="http://a.example/")
_RESP_B = _record("response", _http(b"<html>beta</html>", status=404,
                                    ctype="text/plain"),
                  uri="http://b.example/p?x=1",
                  date="2026-03-02T00:00:00Z")
_RES = _record("resource", b"\x00\x01raw-bytes", uri="http://c.example/r")


def test_iter_warc_records_roundtrip():
    buf = _INFO + _REQ + _RESP_A + _RES
    got = list(iter_warc_records(buf))
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "request", "response", "resource"
    ]
    assert got[2][0]["warc-target-uri"] == "http://a.example/"
    assert got[2][1] == _http(b"<html>alpha</html>")
    assert got[3][1] == b"\x00\x01raw-bytes"


def test_iter_warc_records_errors():
    with pytest.raises(ValueError, match="version line at byte 0"):
        list(iter_warc_records(b"not a warc"))
    # declared length longer than the remaining bytes
    trunc = _RESP_A[:-6]  # chop the payload tail + separator
    with pytest.raises(ValueError, match="truncated WARC payload"):
        list(iter_warc_records(trunc))


def test_split_http_response_contract():
    st, hh, body = split_http_response(_http(b"abc", 301, "text/x"))
    assert (st, hh["content-type"], body) == (301, "text/x", b"abc")
    # no HTTP head: bytes pass through with NULL status
    assert split_http_response(b"just bytes") == (None, {}, b"just bytes")
    assert split_http_response(b"NOPE/1.1 200\r\n\r\nx")[0] is None


def test_read_warc_plain(spark, tmp_path):
    (tmp_path / "shard0.warc").write_bytes(_INFO + _REQ + _RESP_A + _RESP_B + _RES)
    got = read_warc(spark, str(tmp_path)).orderBy("url").collect()
    # default record_types: responses only
    assert [r.url for r in got] == ["http://a.example/", "http://b.example/p?x=1"]
    assert [r.http_status for r in got] == [200, 404]
    assert got[0].content_type.startswith("text/html")
    assert bytes(got[0].html) == b"<html>alpha</html>"
    assert bytes(got[1].html) == b"<html>beta</html>"
    assert got[0].warc_ts is not None and got[0].warc_ts.year == 2026
    assert got[1].warc_ts.day == 2


def test_read_warc_gzip_multimember(spark, tmp_path):
    # Common-Crawl layout: one gzip MEMBER per record, concatenated
    shard = b"".join(gzip.compress(r) for r in (_INFO, _RESP_A, _RESP_B))
    (tmp_path / "shard0.warc.gz").write_bytes(shard)
    got = read_warc(spark, str(tmp_path)).orderBy("url").collect()
    assert [r.url for r in got] == ["http://a.example/", "http://b.example/p?x=1"]
    assert bytes(got[1].html) == b"<html>beta</html>"


def test_read_warc_record_type_filter(spark, tmp_path):
    (tmp_path / "s.warc").write_bytes(_RESP_A + _RES)
    got = read_warc(
        spark, str(tmp_path), record_types=("response", "resource")
    ).orderBy("url").collect()
    assert [(r.url, r.rec_type) for r in got] == [
        ("http://a.example/", "response"), ("http://c.example/r", "resource")
    ]
    # resource records keep raw payload and NULL http fields
    assert got[1].http_status is None
    assert bytes(got[1].html) == b"\x00\x01raw-bytes"


def test_read_warc_wet_conversion_records(spark, tmp_path):
    # Common Crawl WET shards are WARC files whose text lives in
    # 'conversion' records — the same reader ingests them via
    # record_types, payload passing through as the (text) bytes
    wet = _record("conversion", "extracted plain text \xe9".encode("utf-8"),
                  uri="http://a.example/")
    (tmp_path / "s.warc.wet").write_bytes(_INFO + wet)
    got = read_warc(spark, str(tmp_path), record_types=("conversion",)).collect()
    assert len(got) == 1
    assert bytes(got[0].html).decode("utf-8") == "extracted plain text \xe9"
    assert got[0].http_status is None


def test_read_warc_strict_vs_lax(spark, tmp_path):
    (tmp_path / "bad.warc").write_bytes(_RESP_A + _RESP_B[:-10])
    with pytest.raises(Exception, match="truncated WARC payload"):
        read_warc(spark, str(tmp_path), strict=True).collect()
    got = read_warc(spark, str(tmp_path), strict=False).collect()
    # lax keeps the records parsed before the corruption
    assert [r.url for r in got] == ["http://a.example/"]


def test_stream_warc_parity_with_batch(spark, tmp_path):
    # availableNow catch-up over the same directory must yield exactly
    # the batch reader's rows (same parser, schema, and ts cast)
    src = tmp_path / "in"
    src.mkdir()
    (src / "s0.warc").write_bytes(_INFO + _RESP_A)
    (src / "s1.warc.gz").write_bytes(gzip.compress(_RESP_B))
    q = (
        stream_warc(spark, str(src))
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select url, warc_ts, http_status, content_type, html "
        "from warc_stream_t"
    ).orderBy("url").collect()
    want = (
        read_warc(spark, str(src))
        .select("url", "warc_ts", "http_status", "content_type", "html")
        .orderBy("url")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) == 2


def test_ingest_warc_end_to_end(spark, tmp_path):
    # S0 in one call: shards -> extracted+langid'd -> (lang, p_date)-
    # partitioned pages table readable through the pruning contract
    from ontology_mapping_spark.sources.readers import read_pages

    body_en = (b"<html><body><p>the quick brown fox and the lazy dog "
               b"were of that kind</p></body></html>")
    resp_en = _record("response", _http(body_en), uri="http://en.example/")
    src = tmp_path / "warc"
    src.mkdir()
    (src / "s.warc.gz").write_bytes(gzip.compress(resp_en) + gzip.compress(_RESP_A))
    out = tmp_path / "pages"
    from ontology_mapping_spark.sources.warc import ingest_warc

    ingest_warc(spark, str(src), str(out))
    got = read_pages(spark, str(out)).orderBy("url").collect()
    assert [r.url for r in got] == ["http://a.example/", "http://en.example/"]
    assert got[1].lang == "en"
    assert "quick brown fox" in got[1].text
    assert got[1].warc_ts.year == 2026
    # the golden-extractor invariant: text == extract_text_py(html)
    from ontology_mapping_spark.textnorm import extract_text_py

    for r in got:
        assert r.text == extract_text_py(bytes(r.html))
    # partition layout on disk: lang=<x>/p_date=<d>/ directories
    langs = sorted(p.name for p in out.iterdir() if p.name.startswith("lang="))
    assert f"lang={got[0].lang}" in langs and "lang=en" in langs


def test_warc_ts_is_utc_regardless_of_session_tz(spark, tmp_path):
    # WARC-Date carries an explicit Z; the parse must not reinterpret it
    # as session-local wall time. Epoch comparison is tz-independent.
    from datetime import datetime, timezone

    (tmp_path / "s.warc").write_bytes(_RESP_A)  # 2026-03-01T10:20:30Z
    want = int(datetime(2026, 3, 1, 10, 20, 30,
                        tzinfo=timezone.utc).timestamp())
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = (
            read_warc(spark, str(tmp_path))
            .select(F.unix_timestamp("warc_ts").alias("e"))
            .collect()
        )
        assert got[0].e == want
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_corrupt_gzip_respects_strict_lax(spark, tmp_path):
    (tmp_path / "ok.warc").write_bytes(_RESP_A)
    (tmp_path / "bad.warc.gz").write_bytes(gzip.compress(_RESP_B)[:-4])
    with pytest.raises(Exception, match="corrupt gzip"):
        read_warc(spark, str(tmp_path), strict=True).collect()
    got = read_warc(spark, str(tmp_path), strict=False).collect()
    # lax: the unreadable shard skips, the good one still reads
    assert [r.url for r in got] == ["http://a.example/"]


def test_corrupt_deflate_payload_respects_strict_lax(spark, tmp_path):
    # a valid gzip HEADER over a garbage deflate body raises zlib.error
    # (not an OSError subclass) — it must route through the same
    # strict/lax contract as framing corruption
    good = gzip.compress(_RESP_B)
    bad = good[:10] + bytes(x ^ 0xFF for x in good[10:])
    import zlib
    with pytest.raises((OSError, EOFError, zlib.error)):
        gzip.decompress(bad)  # precondition: this corpse is unreadable
    (tmp_path / "ok.warc").write_bytes(_RESP_A)
    (tmp_path / "bad.warc.gz").write_bytes(bad)
    with pytest.raises(Exception, match="corrupt gzip"):
        read_warc(spark, str(tmp_path), strict=True).collect()
    got = read_warc(spark, str(tmp_path), strict=False).collect()
    assert [r.url for r in got] == ["http://a.example/"]


def test_warc_to_pages_filters_non_pages(spark, tmp_path):
    from ontology_mapping_spark.sources.warc import warc_to_pages

    png = _record("response",
                  _http(b"\x89PNG...", ctype="image/png"),
                  uri="http://img.example/x.png")
    err = _record("response", _http(b"<html>not found</html>", status=404),
                  uri="http://err.example/")
    nouri = _record("response", _http(b"<html>ghost</html>"))
    (tmp_path / "s.warc").write_bytes(_RESP_A + png + err + nouri)
    got = warc_to_pages(read_warc(spark, str(tmp_path))).collect()
    # only the 200 text/html row with a URI becomes a page
    assert [r.url for r in got] == ["http://a.example/"]
    # knobs disable the filters (the WET lane: NULL status/type)
    all_rows = warc_to_pages(
        read_warc(spark, str(tmp_path)),
        statuses=None, content_type_prefixes=None,
    ).collect()
    assert len(all_rows) == 3  # everything with a URL


def test_iter_warc_records_roundtrip_property():
    # serialize -> parse is the identity on (type, uri, payload) for any
    # payload bytes (including CRLFCRLF and WARC/-lookalikes inside the
    # payload — Content-Length framing must win over content sniffing)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rtype = st.sampled_from(["response", "resource", "metadata", "conversion"])
    uri = st.text(
        alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
        min_size=1, max_size=40,
    ).map(lambda s: "http://x/" + s)
    payload = st.binary(min_size=0, max_size=300)
    rec = st.tuples(rtype, uri, payload)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(rec, min_size=1, max_size=8))
    def run(recs):
        buf = b"".join(_record(t, p, uri=u) for t, u, p in recs)
        got = [
            (h["warc-type"], h["warc-target-uri"], p)
            for h, p in iter_warc_records(buf)
        ]
        assert got == recs
    run()


def test_iter_warc_records_adversarial_payloads():
    # payloads that LOOK like record boundaries parse by length framing
    tricky = b"\r\n\r\nWARC/1.0\r\nContent-Length: 9999\r\n\r\nfake"
    buf = _record("resource", tricky, uri="http://t/") + _RESP_A
    got = list(iter_warc_records(buf))
    assert [h["warc-type"] for h, _ in got] == ["resource", "response"]
    assert got[0][1] == tricky


def _wat_json(links=None, title=None) -> bytes:
    import json

    html_meta = {}
    if title is not None:
        html_meta["Head"] = {"Title": title}
    if links is not None:
        html_meta["Links"] = links
    payload = {
        "Envelope": {
            "Payload-Metadata": {
                "HTTP-Response-Metadata": (
                    {"HTML-Metadata": html_meta} if html_meta else {}
                )
            }
        }
    }
    return json.dumps(payload).encode()


def test_read_wat_and_links(spark, tmp_path):
    # WAT = WARC metadata records carrying pre-extracted link JSON; the
    # reader types the link array and wat_links resolves hrefs with the
    # SAME contract as the HTML extract_links path
    import gzip as _gz

    from ontology_mapping_spark.sources.warc import read_wat, wat_links

    a = _record(
        "metadata",
        _wat_json(
            links=[
                {"url": "http://b.example/x", "text": "  to <b>B</b>  "},
                {"url": "/rel", "text": "rel"},
                {"url": "//c.example/p", "text": "proto-rel"},
                {"url": "javascript:void(0)", "text": "drop"},
                {"url": "#frag", "text": "drop too"},
            ],
            title="Page A",
        ),
        uri="http://a.example/dir/page",
    )
    # non-HTML response: metadata without HTML-Metadata -> NULL title/links
    b = _record("metadata", _wat_json(), uri="http://img.example/x.png")
    (tmp_path / "s.wat.gz").write_bytes(_gz.compress(a + b))
    wat = read_wat(spark, str(tmp_path))
    rows = {r.url: r for r in wat.collect()}
    assert rows["http://a.example/dir/page"].title == "Page A"
    assert len(rows["http://a.example/dir/page"].links) == 5
    assert rows["http://img.example/x.png"].links is None
    assert rows["http://img.example/x.png"].title is None

    got = {
        (r.dst_url, r.anchor) for r in wat_links(wat).collect()
    }
    # fragment-only and javascript: drop; relative joins the base DIR,
    # protocol-relative inherits the scheme; anchors tag-strip + collapse
    assert got == {
        ("http://b.example/x", "to B"),
        ("http://a.example/rel", "rel"),
        ("http://c.example/p", "proto-rel"),
    }


def test_stream_wat_parity_with_batch(spark, tmp_path):
    # the streaming twin must yield exactly the batch reader's rows —
    # same shared JSON projection, availableNow catch-up
    from ontology_mapping_spark.sources.warc import read_wat, stream_wat

    src = tmp_path / "in"
    src.mkdir()
    rec = _record(
        "metadata",
        _wat_json(
            links=[{"url": "http://b.example/x", "text": "b"}], title="T"
        ),
        uri="http://a.example/",
    )
    (src / "s.wat").write_bytes(rec)
    q = (
        stream_wat(spark, str(src))
        .writeStream.format("memory")
        .queryName("wat_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select url, title, links from wat_stream_t"
    ).collect()
    want = read_wat(spark, str(src)).select("url", "title", "links").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert got[0].links[0].url == "http://b.example/x"


def test_wat_links_feed_link_graph(spark, tmp_path):
    # the WAT rows ARE extract_links-shaped: the host graph aggregates
    # them with no HTML ever parsed
    from ontology_mapping_spark.operators.linkgraph import link_graph
    from ontology_mapping_spark.sources.warc import read_wat, wat_links

    rec = _record(
        "metadata",
        _wat_json(
            links=[
                {"url": "http://b.example/1", "text": "x"},
                {"url": "http://b.example/2", "text": "y"},
            ]
        ),
        uri="http://a.example/",
    )
    (tmp_path / "s.wat").write_bytes(rec)
    e = link_graph(wat_links(read_wat(spark, str(tmp_path)))).collect()
    assert [(r.src_host, r.dst_host, r.n_links) for r in e] == [
        ("a.example", "b.example", 2)
    ]
