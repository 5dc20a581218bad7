"""Distributed WARC (ISO 28500) ingestion — the step that PRODUCES the
pages table the rest of the engine consumes.

The north rule's input is an Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html, ...)``; real crawls deliver that data as
``.warc`` / ``.warc.gz`` shards (Common Crawl: ~1 GB gzip members,
tens of thousands of files per crawl). :func:`read_warc` turns a
directory of shards into exactly the engine's page schema, distributed:

* one task per shard (``binaryFile`` sources are non-splittable — the
  parallelism unit is the FILE, which is how Common Crawl shards are
  sized to be consumed; a crawl's 64k shards keep any cluster busy);
* per-record gzip members concatenate, so ``gzip.decompress`` inflates
  a whole shard in one call (Python handles multi-member streams);
* parsing is Arrow-batched ``mapInPandas`` — the WARC grammar is
  byte-oriented and genuinely needs imperative code, the documented
  exception lane (same as the HTML extractor seam);
* records stream out in bounded chunks so one task never materializes
  a shard's full record list on top of its decompressed bytes.

Strict/lax contract mirrors ``sources/rdf.read_ntriples``: ``strict=True``
raises on the first malformed record naming the file and byte offset
(a silent drop would under-count the crawl); ``strict=False`` keeps the
records parsed so far and skips the REST of that file — after a corrupt
length field there is no reliable resync point in a WARC stream.

The record iterator (:func:`iter_warc_records`) and the HTTP splitter
(:func:`split_http_response`) are pure Python on bytes, so the pytest
suite exercises them directly against hand-built shards — including
multi-member gzip, truncation, and non-response record filtering.

The crawl-format trio is covered end to end: WARC responses via
:func:`read_warc` (the pages), WET conversions via
``record_types=("conversion",)`` (pre-extracted text), and WAT metadata
via :func:`read_wat` / :func:`wat_links` (pre-extracted links + head
metadata, parsed with pure Catalyst JSON algebra and emitted in the
``extract_links`` shape the link-graph family consumes).
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCHEMA = (
    "url string, warc_ts string, rec_type string, http_status int, "
    "content_type string, html binary"
)

# per-emitted-batch bounds: a chunk flushes at _CHUNK rows OR _CHUNK_BYTES
# of payload, whichever comes first — many tiny records hit the row bound,
# few huge ones (1 MB-truncated CC responses, unbounded WET text) hit the
# byte bound, so task memory stays one decompressed shard + one chunk
_CHUNK = 1024
_CHUNK_BYTES = 64 * 1024 * 1024


def iter_warc_records(buf: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, payload)`` per WARC record in ``buf``.

    ``headers`` maps lowercased header names to stripped values (the
    version line is dropped; WARC header names are case-insensitive per
    spec). Raises ``ValueError`` naming the byte offset on a malformed
    version line, header block, length field, or truncated payload.
    """
    pos, n = 0, len(buf)
    while pos < n:
        while buf.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise ValueError(
                f"malformed WARC: expected a WARC/ version line at byte {pos}"
            )
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(
                f"truncated WARC header block starting at byte {pos}"
            )
        lines = buf[pos:hdr_end].decode("utf-8", errors="replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"WARC record at byte {pos} has a missing or non-integer "
                "Content-Length header"
            ) from None
        body_start = hdr_end + 4
        payload = buf[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError(
                f"truncated WARC payload at byte {body_start}: header "
                f"declares {clen} bytes, {len(payload)} present"
            )
        pos = body_start + clen
        yield headers, payload


def split_http_response(payload: bytes) -> tuple[int | None, dict, bytes]:
    """WARC response payload -> (status, http headers, body bytes).

    A payload without an HTTP head block (no CRLFCRLF, or a first line
    that is not ``HTTP/...``) comes back as (None, {}, payload) — the
    caller keeps the bytes rather than guessing.
    """
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        return None, {}, payload
    lines = payload[:sep].decode("latin-1", errors="replace").split("\r\n")
    parts = lines[0].split(None, 2)
    if not parts or not parts[0].upper().startswith("HTTP/") or len(parts) < 2:
        return None, {}, payload
    try:
        status = int(parts[1])
    except ValueError:
        return None, {}, payload
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[sep + 4 :]


def read_warc(
    spark,
    path: str,
    record_types: Sequence[str] = ("response",),
    strict: bool = True,
) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` shards -> one row per kept record:
    ``(url, warc_ts timestamp, rec_type, http_status, content_type,
    html binary)``.

    ``record_types`` filters on ``WARC-Type`` (default: response records
    only — the pages). For response records the HTTP head is split off:
    ``http_status`` / ``content_type`` come from it and ``html`` is the
    body; other kept types carry their raw payload with NULL status —
    ``record_types=("conversion",)`` reads Common Crawl WET shards (the
    pre-extracted plain text), ``("resource", "metadata")`` covers
    archive/WAT-style records. ``warc_ts`` parses the ISO-8601
    ``WARC-Date`` Catalyst-side; an unparseable date is NULL, never a
    dropped row.
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return _finish(files.mapInPandas(_parse_fn(tuple(record_types), strict), _SCHEMA))


def stream_warc(
    spark,
    path: str,
    record_types: Sequence[str] = ("response",),
    strict: bool = True,
) -> DataFrame:
    """Streaming twin of :func:`read_warc`: new shards landing in
    ``path`` become page rows as they arrive — the crawl-cadence
    ingestion form (each micro-batch is a set of whole shards; pair with
    ``foreachBatch`` + the partitioned pages writer, or
    ``trigger(availableNow=True)`` for catch-up runs). Identical record
    parsing, schema, and strict/lax contract; parity with the batch
    reader on the same directory is pytest-pinned. The binaryFile
    streaming source needs its schema declared explicitly (no inference
    on streams) — that is the only difference from the batch path."""
    import pyspark.sql.types as T

    bin_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .load(path)
        .select("path", "content")
    )
    return _finish(files.mapInPandas(_parse_fn(tuple(record_types), strict), _SCHEMA))


def warc_to_pages(
    warc: DataFrame,
    statuses: Sequence[int] | None = (200,),
    content_type_prefixes: Sequence[str] | None = ("text/html",),
) -> DataFrame:
    """Parsed WARC response rows -> the engine's pages schema
    ``(url, warc_ts, html, text, lang)``: the input_hint table, ready for
    :func:`ontology_mapping_spark.sources.readers.write_pages_partitioned`.

    Real crawl shards carry more than pages: 301s with stub bodies, 404
    error pages, image/PDF responses, and the occasional record without
    a ``WARC-Target-URI``. The defaults keep exactly the rows the pages
    table means — url present, HTTP 200, ``text/html`` content type
    (missing Content-Type passes, per crawl reality) — so the golden
    extractor and the language-ID never chew PNG bytes. Pass ``None``
    for either knob to disable that filter (WET ``conversion`` records,
    for instance, have NULL status and type: ``statuses=None,
    content_type_prefixes=None``).

    ``text`` comes from the SAME golden extractor every other path uses
    (byte-identical per url by construction); ``lang`` from the heuristic
    stopword language-ID (the real model slots into the same column).
    Filters and projections are per-row — the composition adds zero
    shuffles on top of the reader, so S0→S1 is scan → parse → filter →
    extract → langid → partitioned write, one pass over the crawl
    bytes. Re-captured urls are NOT collapsed here: recrawl dedup is a
    maintenance decision (``kgmaint.latest_captures``), not an
    ingestion side effect."""
    from ontology_mapping_spark.operators.textstats import detect_lang
    from ontology_mapping_spark.sources.pages import extract_text_udf

    out = warc.filter(F.col("url").isNotNull())
    if statuses is not None:
        out = out.filter(F.col("http_status").isin(*statuses))
    if content_type_prefixes is not None:
        keep = None
        for p in content_type_prefixes:
            c = F.col("content_type").startswith(p)
            keep = c if keep is None else (keep | c)
        out = out.filter(F.col("content_type").isNull() | keep)
    return (
        out.select("url", "warc_ts", "html")
        .withColumn("text", extract_text_udf(F.col("html")))
        .withColumn("lang", detect_lang(F.col("text")))
    )


#: the WAT JSON paths this reader understands (Common Crawl layout)
_WAT_META = "$.Envelope.Payload-Metadata.HTTP-Response-Metadata.HTML-Metadata"


def read_wat(spark, path: str, strict: bool = True) -> DataFrame:
    """Read Common-Crawl-style WAT metadata shards ->
    ``(url, warc_ts, title, links array<struct<url,text>>)`` — one row per
    described page.

    WAT is the third member of the crawl-format trio (WARC responses =
    the pages, WET conversions = pre-extracted text, WAT metadata =
    pre-extracted LINKS + head metadata as one JSON document per page).
    The shards themselves are WARC files whose ``metadata`` records carry
    the JSON, so shard handling (one task per file, multi-member gzip,
    strict/lax) is :func:`read_warc` verbatim; everything after is pure
    Catalyst JSON algebra — ``get_json_object`` prunes to the two
    subtrees, ``from_json`` types the link array — zero extra Python
    beyond the shared record parser.

    ``url`` is the record's ``WARC-Target-URI`` (the described page).
    Pages whose metadata carries no HTML-Metadata (non-HTML responses)
    come back with NULL title and NULL links — present, not dropped, so
    counts still match the crawl. Link ``url`` values are AS WRITTEN in
    the page (often relative): resolve them against ``url`` with
    :func:`ontology_mapping_spark.operators.linkgraph.resolve_href` —
    :func:`wat_links` does exactly that and emits the
    ``extract_links``-shaped rows the whole link-graph family consumes,
    making the HTML scan optional when WAT shards exist."""
    return _project_wat(
        read_warc(spark, path, record_types=("metadata",), strict=strict)
    )


def stream_wat(spark, path: str, strict: bool = True) -> DataFrame:
    """Streaming twin of :func:`read_wat` (the ``stream_warc`` pattern):
    WAT shards landing in ``path`` become (url, warc_ts, title, links)
    rows as they arrive. The JSON projection is stateless, so it rides
    the stream unchanged; compose with :func:`wat_links` (also
    stateless) and a windowed aggregate for a continuous link graph."""
    return _project_wat(stream_warc(spark, path, ("metadata",), strict))


def _project_wat(recs: DataFrame) -> DataFrame:
    """The shared WAT JSON projection (batch + streaming twins)."""
    doc = F.decode(F.col("html"), "UTF-8")
    html_meta = F.get_json_object(doc, _WAT_META)
    return recs.select(
        "url",
        "warc_ts",
        F.get_json_object(html_meta, "$.Head.Title").alias("title"),
        F.from_json(
            F.get_json_object(html_meta, "$.Links"),
            "array<struct<url:string,text:string>>",
        ).alias("links"),
    )


def wat_links(wat: DataFrame) -> DataFrame:
    """WAT page rows -> one row per resolvable link, in the EXACT shape of
    ``linkgraph.extract_links`` (``url, href, anchor, dst_url``) — so
    ``link_graph`` / ``degrees`` / ``pagerank`` / ``crawl_frontier`` /
    ``anchor_aliases`` consume WAT shards directly, no HTML ever parsed.
    Same resolution contract as the HTML path (fragments stripped,
    non-http(s) schemes dropped, relative hrefs joined against the page
    url) and the same anchor cleaning, via the shared helpers."""
    from ontology_mapping_spark.operators.linkgraph import (
        clean_anchor,
        resolve_href,
    )

    out = (
        wat.filter(F.col("links").isNotNull())
        .select("url", F.explode("links").alias("l"))
        .select(
            "url",
            F.col("l.url").alias("href"),
            clean_anchor(F.coalesce(F.col("l.text"), F.lit(""))).alias(
                "anchor"
            ),
        )
        .filter(F.col("href").isNotNull())
        .withColumn("dst_url", resolve_href(F.col("url"), F.col("href")))
    )
    return out.filter(F.col("dst_url").isNotNull())


def ingest_warc(
    spark,
    warc_path: str,
    pages_path: str,
    record_types: Sequence[str] = ("response",),
    strict: bool = True,
    mode: str = "overwrite",
    files_per_partition: int = 1,
    statuses: Sequence[int] | None = (200,),
    content_type_prefixes: Sequence[str] | None = ("text/html",),
) -> None:
    """One-call S0: crawl shards in, partitioned ``web_pages`` out
    (``read_warc`` → :func:`warc_to_pages` → lang/date-partitioned
    parquet). The written layout is the scan-pruning contract the whole
    pipeline reads through (``readers.read_pages``); the status/type
    knobs pass through to :func:`warc_to_pages`."""
    from ontology_mapping_spark.sources.readers import write_pages_partitioned

    write_pages_partitioned(
        warc_to_pages(
            read_warc(spark, warc_path, record_types, strict),
            statuses=statuses,
            content_type_prefixes=content_type_prefixes,
        ),
        pages_path,
        mode=mode,
        files_per_partition=files_per_partition,
    )


def _parse_fn(kept: tuple, strict: bool):
    """The shared mapInPandas generator: (path, content) file rows ->
    bounded chunks of parsed record rows."""

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if fpath.endswith(".gz"):
                    try:
                        data = gzip.decompress(data)
                    except (OSError, EOFError, zlib.error) as ex:
                        # gzip raises BadGzipFile/EOFError for framing and
                        # zlib.error for corrupt deflate payloads, NOT
                        # ValueError — route all through the same strict/lax
                        # contract as a malformed record, with the file named
                        if strict:
                            raise ValueError(
                                f"{fpath}: corrupt gzip stream: {ex}"
                            ) from ex
                        continue  # lax: skip the unreadable shard
                rows: list[tuple] = []
                nbytes = 0
                try:
                    for headers, payload in iter_warc_records(data):
                        if headers.get("warc-type", "") not in kept:
                            continue
                        status: int | None = None
                        ctype: str | None = None
                        body = payload
                        if headers.get("warc-type") == "response":
                            status, hh, body = split_http_response(payload)
                            ctype = hh.get("content-type")
                        rows.append(
                            (
                                headers.get("warc-target-uri"),
                                headers.get("warc-date"),
                                headers.get("warc-type"),
                                status,
                                ctype,
                                body,
                            )
                        )
                        nbytes += len(body)
                        # flush on EITHER bound: rows for many tiny records,
                        # bytes for few huge ones (WET text is unbounded) —
                        # a task holds one decompressed shard + one chunk
                        if len(rows) >= _CHUNK or nbytes >= _CHUNK_BYTES:
                            yield pd.DataFrame(
                                rows, columns=_COLS
                            ).astype(_PD_TYPES)
                            rows, nbytes = [], 0
                except ValueError as ex:
                    if strict:
                        raise ValueError(f"{fpath}: {ex}") from ex
                    # lax: keep what parsed, skip the file's remainder
                if rows:
                    yield pd.DataFrame(rows, columns=_COLS).astype(_PD_TYPES)

    return parse


def _finish(out: DataFrame) -> DataFrame:
    # WARC-Date is ISO-8601 with an explicit 'Z' — to_timestamp parses the
    # zone natively. (Stripping the 'Z' first would reinterpret UTC as
    # session-local wall time: wrong by the tz offset in any session not
    # pinned to UTC, and wrong p_date partitions near midnight.)
    return out.withColumn("warc_ts", F.to_timestamp("warc_ts"))


_COLS = ["url", "warc_ts", "rec_type", "http_status", "content_type", "html"]
_PD_TYPES = {"http_status": "Int32"}
