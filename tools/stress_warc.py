"""S0 ingestion stress: WARC shard parsing + full ingest throughput.

Synthesizes a deterministic shard directory (per-record gzip members,
Common-Crawl layout; pages carry realistic-shaped HTML with stopword
text so the language-ID has something to chew), then times:

* ``parse`` — ``read_warc(...).count()``: shard bytes -> record rows
  (the mapInPandas parse cost, no extraction);
* ``ingest`` — ``ingest_warc``: the whole S0 pass (parse -> filter ->
  golden extract -> langid -> (lang, p_date)-partitioned write);
* ``wat`` — WAT metadata shards (same record counts, JSON payloads with
  ~8 links each) through ``read_wat`` -> ``wat_links`` ->
  ``link_graph``: the no-HTML link-graph lane end to end.

Parallelism unit is the shard file (binaryFile is non-splittable), so
``--shards`` should be >= cpus to keep every core busy — the same
property that makes a 64k-shard crawl saturate a real cluster.

Prints ONE JSON line. Usage::

    python tools/stress_warc.py [--shards 64] [--records 1500] [--cpus 32]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_BODY = (
    "<html><head><title>page %d</title></head><body><nav>skip this "
    "boilerplate</nav><p>the quick brown fox %d jumped over the lazy dog "
    "and the rest of the usual words that are of a kind with them</p>"
    "<p>a second paragraph with more of the same text %d</p></body></html>"
)


def _record(uri: str, date: str, body: bytes) -> bytes:
    payload = (
        f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\nWARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    )
    return head.encode() + payload + b"\r\n\r\n"


def _wat_record(uri: str, date: str, i: int, n_links: int = 8) -> bytes:
    links = [
        {"url": f"http://h{(i * 31 + j) % 997}.example/p/{j}", "text": f"link {j}"}
        for j in range(n_links)
    ]
    payload = json.dumps(
        {
            "Envelope": {
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": f"page {i}"},
                            "Links": links,
                        }
                    }
                }
            }
        }
    ).encode()
    head = (
        "WARC/1.0\r\nWARC-Type: metadata\r\n"
        f"WARC-Target-URI: {uri}\r\nWARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    )
    return head.encode() + payload + b"\r\n\r\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--records", type=int, default=1500)
    ap.add_argument(
        "--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    args = ap.parse_args()

    from ontology_mapping_spark.session import get_spark
    from ontology_mapping_spark.sources.warc import ingest_warc, read_warc

    out: dict = {
        "metric": "warc_ingest_stress",
        "shards": args.shards,
        "records_per_shard": args.records,
        "cpus": args.cpus,
    }

    def burn() -> float:
        t = time.time()
        acc = 0
        for i in range(2_000_000):
            acc += i * i
        return round(time.time() - t, 3)

    out["py_burn_sec"] = burn()

    tmp = tempfile.mkdtemp(prefix="warc_stress_")
    warc_dir = os.path.join(tmp, "shards")
    pages_dir = os.path.join(tmp, "pages")
    os.makedirs(warc_dir)
    t0 = time.time()
    total = 0
    for s in range(args.shards):
        parts = []
        for r in range(args.records):
            i = s * args.records + r
            day = 1 + (i % 27)
            parts.append(
                gzip.compress(
                    _record(
                        f"http://h{i % 997}.example/p/{i}",
                        f"2026-03-{day:02d}T0{i % 10}:00:00Z",
                        (_BODY % (i, i, i)).encode(),
                    ),
                    compresslevel=1,
                )
            )
        with open(os.path.join(warc_dir, f"s{s:05d}.warc.gz"), "wb") as f:
            f.write(b"".join(parts))
        total += args.records
    out["pages"] = total
    out["build_sec"] = round(time.time() - t0, 2)
    out["shard_mb"] = round(
        sum(
            os.path.getsize(os.path.join(warc_dir, p))
            for p in os.listdir(warc_dir)
        )
        / 1e6,
        1,
    )

    spark = get_spark(
        "stress_warc", parallelism=args.cpus, shuffle_partitions=args.cpus
    )
    try:
        t0 = time.time()
        n = read_warc(spark, warc_dir).count()
        sec = time.time() - t0
        out["parse"] = {
            "rows": n,
            "sec": round(sec, 2),
            "pages_per_sec": round(n / sec, 1),
        }

        t0 = time.time()
        ingest_warc(spark, warc_dir, pages_dir)
        sec = time.time() - t0
        n_pages = spark.read.parquet(pages_dir).count()
        out["ingest"] = {
            "rows": n_pages,
            "sec": round(sec, 2),
            "pages_per_sec": round(n_pages / sec, 1),
            "partitions": len(
                [p for p in os.listdir(pages_dir) if p.startswith("lang=")]
            ),
        }
        # WAT lane: same shard/record counts, JSON metadata payloads
        wat_dir = os.path.join(tmp, "wat")
        os.makedirs(wat_dir)
        for s in range(args.shards):
            parts = []
            for r in range(args.records):
                i = s * args.records + r
                day = 1 + (i % 27)
                parts.append(
                    gzip.compress(
                        _wat_record(
                            f"http://h{i % 997}.example/p/{i}",
                            f"2026-03-{day:02d}T0{i % 10}:00:00Z",
                            i,
                        ),
                        compresslevel=1,
                    )
                )
            with open(
                os.path.join(wat_dir, f"s{s:05d}.wat.gz"), "wb"
            ) as f:
                f.write(b"".join(parts))
        from ontology_mapping_spark.operators.linkgraph import link_graph
        from ontology_mapping_spark.sources.warc import read_wat, wat_links

        t0 = time.time()
        hosts = link_graph(wat_links(read_wat(spark, wat_dir))).count()
        sec = time.time() - t0
        out["wat"] = {
            "pages": total,
            "host_edges": hosts,
            "sec": round(sec, 2),
            "pages_per_sec": round(total / sec, 1),
        }
        out["py_burn_sec_end"] = burn()
        print(json.dumps(out))
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
