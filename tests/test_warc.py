"""WARC codec + Spark WARC source tests.

Codec half is pure Python (no Spark): build/parse must invert each
other over every record-shape class (plain, gzip-member, warcinfo/
request skip by type, 404 empty body, corrupt-record resync). Spark
half: binaryFile → mapInPandas ingest over real .warc/.warc.gz files
on disk, and the cc_pages projection to the north-star page shape."""

from __future__ import annotations

import hashlib
import os

from searchengine_spark.pycore import warc as W


def _mk_records(n=5):
    recs = []
    expect = []
    for i in range(n):
        url = f"https://h{i % 2}.test/p/{i}"
        date = f"2026-03-{i + 1:02d}T0{i % 10}:00:00Z"
        body = f"<html>page {i} éé</html>".encode() if i % 3 else b""
        status = 200 if i % 3 else 404
        recs.append(
            W.build_record(
                "request", b"GET /p HTTP/1.1\r\n\r\n", url=url, date=date
            )
        )
        recs.append(
            W.build_record(
                "response",
                W.build_http_response(body, status=status),
                url=url,
                date=date,
            )
        )
        expect.append((url, date, status, body))
    return recs, expect


def _responses(blob):
    recs, skipped = W.parse_warc(blob)
    return [r for r in recs if r.rec_type == "response"], recs, skipped


def test_roundtrip_plain():
    recs, expect = _mk_records()
    resp, allrecs, skipped = _responses(W.build_warc(recs))
    assert skipped == 0
    assert len(allrecs) == len(recs)
    got = [(r.url, r.date, r.http_status, r.body) for r in resp]
    assert got == expect
    assert all(r.http_content_type == "text/html" for r in resp)


def test_roundtrip_gzip_members():
    recs, expect = _mk_records()
    blob = W.build_warc(recs, gzip_members=True)
    assert blob[:2] == b"\x1f\x8b" and blob != W.build_warc(recs)
    resp, _, skipped = _responses(blob)
    assert skipped == 0
    assert [(r.url, r.date, r.http_status, r.body) for r in resp] == expect


def test_gzip_build_deterministic():
    recs, _ = _mk_records()
    assert W.build_warc(recs, gzip_members=True) == W.build_warc(
        recs, gzip_members=True
    )


def test_corrupt_record_resync():
    recs, expect = _mk_records()
    # garbage mid-stream, a record with unparseable Content-Length,
    # and a truncated tail record — parser must keep every good record
    bad_len = recs[2].replace(b"Content-Length: ", b"Content-Length: x")
    blob = (
        recs[0]
        + b"NOT A WARC RECORD\r\n\r\n"
        + recs[1]
        + bad_len
        + b"".join(recs[3:])
        + W.build_record("response", b"HTTP/1.1 200 OK")[:-10]
    )
    resp, _, skipped = _responses(blob)
    assert skipped >= 2
    got = [(r.url, r.date, r.http_status, r.body) for r in resp]
    # record index 2 is a request; its response (expect[1]) survives
    assert got == expect
    # pure garbage input: no exception, nothing parsed
    recs2, sk2 = W.parse_warc(b"complete garbage with no boundary")
    assert recs2 == [] and sk2 >= 1


def test_warcinfo_and_metadata_typed():
    blob = W.build_warc(
        [
            W.build_record("warcinfo", b"software: x\r\n", date="2026-01-01T00:00:00Z"),
            W.build_record("metadata", b"k: v", url="https://a.test/"),
        ]
    )
    recs, skipped = W.parse_warc(blob)
    assert skipped == 0
    assert [r.rec_type for r in recs] == ["warcinfo", "metadata"]
    assert recs[0].http_status is None and recs[0].body.startswith(b"software")


def test_spark_read_warc_files(spark, tmp_path):
    from searchengine_spark.sources.warc import cc_pages, read_warc

    recs, expect = _mk_records(8)
    d = tmp_path / "warcs"
    os.makedirs(d)
    half = len(recs) // 2
    (d / "a.warc").write_bytes(W.build_warc(recs[:half]))
    (d / "b.warc.gz").write_bytes(
        W.build_warc(recs[half:], gzip_members=True)
    )
    df = read_warc(spark, str(d)).cache()
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 8  # 8 responses; requests skipped
    for url, date, status, body in expect:
        r = rows[url]
        assert (r["warc_ts"], r["status"], bytes(r["html"])) == (
            date, status, body,
        )
        assert r["n_skipped"] == 0
    pages = cc_pages(df)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    prow = {r["url"]: r for r in pages.collect()}
    ok = [e for e in expect if e[2] == 200]
    assert set(prow) == {e[0] for e in ok}  # 404s filtered
    for url, _, _, body in ok:
        assert "page" in prow[url]["text"]  # extractor stripped tags
        assert bytes(prow[url]["html"]) == body
    df.unpersist()


def test_fixture_matches_generative_model(spark, sf_dir):
    # Spark-side mini driver-contract check at sf0.001 (the full
    # oracle row runs via tools/driver_sim.py): parse-back equals the
    # generative expectation per doc, incl. md5 body hashes
    from searchengine_spark.sources.warc import warc_fixture, warc_records

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    out = warc_records(warc_fixture(docs)).collect()
    assert len(out) == len(src)
    for r in out:
        d = int(r["url"].rsplit("/", 1)[1])
        status = 404 if d % 17 == 0 else 200
        body = b"" if status == 404 else src[d].encode()
        assert r["status"] == status
        assert hashlib.md5(body).hexdigest() == hashlib.md5(
            bytes(r["html"] or b"")
        ).hexdigest()
        assert r["n_skipped"] == (1 if d % 16 == 0 else 0)
