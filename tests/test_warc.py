"""WARC/WET source (sources/warc.py): spec-assembled fixtures (built
record-by-record from ISO 28500, independent of the reader), parser
units with multi-chunk + concatenated-gzip-member streams, both Spark
read modes, type filters, payload=False metadata scans, HTTP charset
decode, WET Catalyst decode, truncation error sentinel, and the
warc_to_documents crawl→corpus front half."""

import gzip

import pytest
from pyspark.sql import functions as F

from llmxmapreduce_spark.sources import warc as W

HTML = (b"<html><body><p>The quick brown fox jumps over the lazy dog "
        b"and then the dog jumps over the fox again because it is a "
        b"very good dog that likes to jump over foxes all day</p>"
        b"<p>nav</p></body></html>")
LATIN1_BODY = "caf\xe9 content".encode("latin-1")


def _record(wtype, uri, block, rid, extra=()):
    head = [b"WARC/1.0",
            b"WARC-Type: " + wtype.encode(),
            b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
            b"WARC-Date: 2024-03-22T17:34:21Z"]
    if uri:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head.extend(extra)
    head.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http(body, ctype=b"text/html", status=b"200 OK"):
    return (b"HTTP/1.1 " + status + b"\r\nContent-Type: " + ctype +
            b"\r\nServer: x\r\n\r\n" + body)


def _records():
    return [
        _record("warcinfo", None, b"software: test\r\n", "r0",
                (b"Content-Type: application/warc-fields",)),
        _record("request", "http://a.example/page", b"GET /page HTTP/1.1\r\n",
                "r1"),
        _record("response", "http://a.example/page", _http(HTML), "r2"),
        _record("response", "http://b.example/cafe",
                _http(LATIN1_BODY, b"text/html; charset=ISO-8859-1"), "r3"),
        _record("response", "http://c.example/miss",
                _http(b"gone", status=b"404 Not Found"), "r4"),
        _record("conversion", "http://a.example/page",
                "plain text café extract".encode(), "r5",
                (b"Content-Type: text/plain",)),
    ]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    recs = _records()
    (d / "seg.warc").write_bytes(b"".join(recs))
    # Common Crawl layout: each record its own gzip member
    (d / "seg.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in recs))
    return d


# ---------- parser units (no Spark) ----------

def test_iter_records_multi_chunk_and_member_gzip():
    raw = b"".join(_records())
    # feed in awkward 7-byte chunks to exercise the buffered reader
    chunks = [raw[i:i + 7] for i in range(0, len(raw), 7)]
    got = list(W._iter_warc_records(W._Buffered(chunks)))
    assert len(got) == 6
    assert [h["warc-type"] for h, _ in got] == [
        "warcinfo", "request", "response", "response", "response",
        "conversion"]
    assert got[2][1] == _http(HTML)
    # gzip member stream, also in small chunks
    gz = b"".join(gzip.compress(r) for r in _records())
    chunks = [gz[i:i + 11] for i in range(0, len(gz), 11)]
    got2 = list(W._iter_warc_records(
        W._Buffered(W._gunzip_members(chunks))))
    assert [(h["warc-type"], b) for h, b in got2] == [
        (h["warc-type"], b) for h, b in got]


def test_split_http():
    status, ctype, body = W._split_http(_http(b"BODY"))
    assert (status, ctype, body) == (200, "text/html", b"BODY")
    # LF-only endings
    status, ctype, body = W._split_http(
        b"HTTP/1.0 301 Moved\nContent-Type: a/b\n\nX")
    assert (status, ctype, body) == (301, "a/b", b"X")
    # not an HTTP message → passthrough
    assert W._split_http(b"raw bytes") == (None, None, b"raw bytes")


def test_file_rows_truncation_sentinel():
    recs = _records()
    raw = b"".join(recs)[:-10]  # cut into the last record's block
    rows = list(W._file_rows("f", [raw], None, True))
    assert [r["warc_type"] for r in rows[:-1]] == [
        "warcinfo", "request", "response", "response", "response"]
    assert rows[-1]["warc_type"] == "__error__"
    assert "truncated" in rows[-1]["parse_error"]
    assert all(r["parse_error"] is None for r in rows[:-1])


# ---------- Spark reads ----------

@pytest.mark.parametrize("fname,via", [
    ("seg.warc", "binaryFile"),
    ("seg.warc.gz", "binaryFile"),
    ("seg.warc.gz", "paths"),
])
def test_read_warc_modes(spark, warc_dir, fname, via):
    df = W.read_warc(spark, str(warc_dir / fname), via=via)
    rows = {r["record_id"]: r for r in df.collect()}
    assert set(rows) == {"<urn:uuid:r2>", "<urn:uuid:r3>", "<urn:uuid:r4>"}
    r2 = rows["<urn:uuid:r2>"]
    assert r2["warc_type"] == "response"
    assert r2["target_uri"] == "http://a.example/page"
    assert r2["http_status"] == 200
    assert r2["http_content_type"] == "text/html"
    assert bytes(r2["payload"]) == HTML
    assert r2["warc_date"] is not None and r2["warc_date"].year == 2024
    assert rows["<urn:uuid:r4>"]["http_status"] == 404


def test_read_warc_all_types_and_metadata_only(spark, warc_dir):
    df = W.read_warc(spark, str(warc_dir / "seg.warc.gz"),
                     warc_types=None, payload=False)
    rows = df.collect()
    assert len(rows) == 6
    assert all(r["payload"] is None for r in rows)
    assert {r["warc_type"] for r in rows} == {
        "warcinfo", "request", "response", "conversion"}


def test_warc_http_text_charset(spark, warc_dir):
    df = W.warc_http_text(
        W.read_warc(spark, str(warc_dir / "seg.warc.gz")))
    by_uri = {r["target_uri"]: r["text"] for r in df.collect()}
    assert by_uri["http://b.example/cafe"] == "café content"
    assert "very good dog" in by_uri["http://a.example/page"]


def test_wet_text_catalyst(spark, warc_dir):
    df = W.wet_text(W.read_warc(
        spark, str(warc_dir / "seg.warc"), warc_types=("conversion",)))
    [r] = df.collect()
    assert r["text"] == "plain text café extract"


def test_warc_to_documents_e2e(spark, warc_dir):
    # extractor pinned: this test asserts GATE semantics (the fixture
    # prose is below jusText's length_low; the justext default is
    # covered by test_warc_to_documents_justext_extractor)
    docs = W.warc_to_documents(spark, str(warc_dir / "seg.warc.gz"),
                               extractor="gate")
    rows = docs.collect()
    # 404 and non-HTML-less pages gated out; latin-1 page has no block
    # clearing the stopword-density gate, so the fox page survives alone
    assert [r["url"] for r in rows] == ["http://a.example/page"]
    assert "very good dog" in rows[0]["text"]
    assert "nav" not in rows[0]["text"]
    assert rows[0]["doc_id"] is not None
    assert rows[0]["fetched_at"].year == 2024


def test_write_warc_then_read_back(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "first doc"), (2, "zwei: café"), (3, None), (4, "vier")],
        "doc_id bigint, text string")
    out = str(tmp_path / "wet")
    W.write_warc(docs, out, records_per_file=2)
    back = W.wet_text(W.read_warc(
        spark, out + "/*.warc.gz", warc_types=("conversion",)))
    got = {(r["target_uri"], r["text"]) for r in back.collect()}
    assert got == {("doc://1", "first doc"), ("doc://2", "zwei: café"),
                   ("doc://4", "vier")}
    import glob as g
    assert len(g.glob(out + "/*.warc.gz")) >= 2  # records_per_file split


def test_warc_roundtrip_identity(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} körper") for i in range(50)]
        + [(99, None)], "doc_id bigint, text string").repartition(3)
    got = sorted((r["doc_id"], r["text"])
                 for r in W.warc_roundtrip(docs).collect())
    assert got == [(i, f"document number {i} körper") for i in range(50)]


def test_read_warc_paths_glob_and_missing(spark, warc_dir):
    df = W.read_warc(spark, str(warc_dir / "*.warc.gz"), via="paths")
    assert df.count() == 3
    with pytest.raises(FileNotFoundError):
        W.read_warc(spark, str(warc_dir / "nope*.warc"), via="paths")


# ---------- streaming ----------

def _drain(stream_df, ck):
    got = []
    q = (stream_df.writeStream
         .foreachBatch(lambda df, eid: got.extend(df.collect()))
         .option("checkpointLocation", ck)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return got


def _wet_segment(path, docs):
    path.write_bytes(b"".join(
        gzip.compress(W.encode_warc_record(
            "conversion", t.encode(), record_id=f"<urn:doc:{i}>",
            target_uri=f"doc://{i}", content_type="text/plain"))
        for i, t in docs))


def test_stream_warc_incremental_resume(spark, tmp_path):
    """New segment files become new micro-batches; the file-source
    checkpoint remembers consumed segments across restarts."""
    land, ck = tmp_path / "land", str(tmp_path / "ck")
    land.mkdir()
    _wet_segment(land / "seg1.warc.gz", [(1, "one"), (2, "two")])
    s = W.stream_warc(spark, str(land), warc_types=("conversion",))
    first = _drain(s, ck)
    assert sorted(r["target_uri"] for r in first) == ["doc://1", "doc://2"]
    assert all(r["ingest_ts"] is not None for r in first)
    # second landing: only the NEW segment is processed on resume
    _wet_segment(land / "seg2.warc.gz", [(3, "three")])
    second = _drain(W.stream_warc(spark, str(land),
                                  warc_types=("conversion",)), ck)
    assert [r["target_uri"] for r in second] == ["doc://3"]


def test_stream_warc_into_neardup_ingest(spark, tmp_path):
    """Crawl→corpus accretion e2e: WET segments land, stream_warc
    parses them, and the incremental near-dedup admission drops the
    cross-segment duplicate — one segment per micro-batch."""
    import time
    from llmxmapreduce_spark.streaming import ingest

    land = tmp_path / "land"
    land.mkdir()
    import numpy as np
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lam mu nu xi omicron pi rho sigma tau upsilon").split()

    def mk(seed):
        rng = np.random.default_rng(seed)
        return " ".join(rng.choice(words) for _ in range(40))

    _wet_segment(land / "seg1.warc.gz", [(1, mk(1)), (2, mk(7))])
    time.sleep(1.1)  # distinct mtime → deterministic file order
    _wet_segment(land / "seg2.warc.gz", [(3, mk(13)), (4, mk(1))])  # 4≈1

    docs = (W.wet_text(W.stream_warc(
                spark, str(land), warc_types=("conversion",),
                max_files_per_trigger=1))
            .select(
                F.split("target_uri", "//")[1].cast("long").alias("doc_id"),
                "text"))
    ingest.run_incremental_neardup_ingest(
        docs, str(tmp_path / "state"), str(tmp_path / "ck2"),
        threshold=0.5, verify="estimate")
    kept = ingest.read_kept(spark, str(tmp_path / "state"), docs.schema)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 3]


# ---------- CDX ----------

def test_surt():
    assert W._surt("http://www.Example.COM:8080/Path?Q=1") == \
        "com,example)/path?q=1"
    assert W._surt("https://a.b.example.org/") == "org,example,b,a)/"
    assert W._surt("http://host.test") == "test,host)/"
    assert W._surt(None) is None


def test_warc_cdx_offsets_fetch_records(spark, warc_dir):
    """Every CDX row's (offset, length) must slice the segment file to
    exactly one gunzippable member holding exactly that record — the
    random-access contract the index exists for."""
    import base64
    import hashlib

    seg = warc_dir / "seg.warc.gz"
    cdx = W.warc_cdx(spark, str(seg)).collect()
    assert len(cdx) == 3 and all(r["warc_type"] != "__error__"
                                 for r in cdx if "warc_type" in r)
    blob = seg.read_bytes()
    by_url = {}
    for r in cdx:
        member = blob[r["offset"]: r["offset"] + r["length"]]
        [(h, block)] = list(W._iter_warc_records(
            W._Buffered(W._gunzip_members([member]))))
        assert h["warc-target-uri"] == r["url"]
        status, mime, body = W._split_http(block)
        assert status == r["status"]
        assert base64.b32encode(
            hashlib.sha1(body).digest()).decode() == r["digest"]
        by_url[r["url"]] = r
    fox = by_url["http://a.example/page"]
    assert fox["surt"] == "example,a)/page"
    assert fox["ts"] == "20240322173421"
    assert fox["mime"] == "text/html"


def test_warc_cdx_rejects_non_member_layout(spark, warc_dir):
    with pytest.raises(Exception, match="not gzip-member"):
        W.warc_cdx(spark, str(warc_dir / "seg.warc")).collect()


def test_write_cdx_sorted(spark, warc_dir, tmp_path):
    out = str(tmp_path / "cdx")
    W.write_cdx(W.warc_cdx(spark, str(warc_dir / "seg.warc.gz")), out)
    lines = [r["value"] for r in spark.read.text(out).collect()]
    assert len(lines) == 3
    keys = [tuple(ln.split(" ")[:2]) for ln in lines]
    assert keys == sorted(keys)
    assert all(len(ln.split(" ")) == 9 for ln in lines)


def test_warc_to_documents_justext_extractor(spark, warc_dir):
    """r11: extractor="justext" routes the decoded HTML through the
    context-sensitive reimplementation (operators/justext.py) — same
    row contract, text from the jusText classification instead of the
    stateless gate; unknown names rejected.  Since r12 this is the
    DEFAULT (reference-faithful AND measured faster at every page
    size — r11 verdict task #4)."""
    import inspect
    import pytest

    assert (inspect.signature(W.warc_to_documents)
            .parameters["extractor"].default == "justext")
    docs = W.warc_to_documents(spark, str(warc_dir / "seg.warc.gz"),
                               extractor="justext")
    rows = docs.collect()
    assert set(docs.columns) == {"doc_id", "url", "fetched_at", "text"}
    # the fixture page's prose is below jusText's length_low, so on
    # this tiny corpus the strict algorithm may keep nothing — the
    # contract here is the plumbing (schema, gates, empty-filter),
    # pinned by construction: every surviving row has non-empty text
    # from an HTML 200 page
    for r in rows:
        assert r["text"]
        assert r["url"].startswith("http://")
    with pytest.raises(ValueError, match="unknown extractor"):
        W.warc_to_documents(spark, str(warc_dir / "seg.warc.gz"),
                            extractor="boilerpipe")
