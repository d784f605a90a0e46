"""Source-layer tests: CSV round-trip, permissive JSON, ABR XML
extraction with fallback chains, WARC HTML field extraction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from firmable_aus_etl_spark.sources import files, warc, xml_abr
from firmable_aus_etl_spark.sources.cdx import CDX_SCHEMA, cdx_request_params, read_cdx


def test_csv_round_trip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a,b"), (2, None)], "id long, v string")
    path = str(tmp_path / "csv_out")
    files.write_csv(df, path)
    back = files.read_csv(spark, path)
    assert back.count() == 2
    assert {r.v for r in back.collect()} == {"a,b", None}


def test_csv_all_strings_staging(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.5)], "id long, v double")
    path = str(tmp_path / "csv_stage")
    files.write_csv(df, path)
    staged = files.read_csv(spark, path, all_strings=True)
    assert dict(staged.dtypes) == {"id": "string", "v": "string"}


def test_json_lines_permissive_corrupt_record(spark, tmp_path):
    p = tmp_path / "shard.json"
    p.write_text('{"url": "http://a.au", "status": "200"}\nNOT JSON AT ALL\n')
    df = files.read_json_lines(spark, str(p), CDX_SCHEMA)
    rows = df.collect()
    good = [r for r in rows if r.url is not None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(good) == 1 and len(bad) == 1  # bad line survives, flagged


def test_cdx_request_params():
    p = cdx_request_params("*.com.au", limit=500, offset=1000)
    assert p == {"url": "*.com.au", "output": "json", "limit": "500", "offset": "1000"}


ABR_XML = """<Transfer>
<ABR recordLastUpdatedDate="20230101"><ABN status="ACT" ABNStatusFromDate="20000101">12345678901</ABN>
<EntityType><EntityTypeInd>PRV</EntityTypeInd><EntityTypeText>Australian Private Company</EntityTypeText></EntityType>
<MainEntity><NonIndividualName type="MN"><NonIndividualNameText>ACME PTY LTD</NonIndividualNameText></NonIndividualName>
<BusinessAddress><AddressDetails><State>NSW</State><Postcode>2000</Postcode></AddressDetails></BusinessAddress></MainEntity>
</ABR>
<ABR><ABN status="CAN" ABNStatusFromDate="20100101">98765432109</ABN>
<LegalEntity><IndividualName type="LGL"><GivenName>JANE</GivenName><FamilyName>DOE</FamilyName></IndividualName>
<BusinessAddress><AddressDetails><State>VIC</State><Postcode>3000</Postcode></AddressDetails></BusinessAddress></LegalEntity>
</ABR>
</Transfer>"""


@pytest.fixture(scope="module")
def abr_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("abrxml")
    (d / "abr.xml").write_text(ABR_XML)
    return xml_abr.extract_abr_records(xml_abr.read_abr_xml(spark, str(d)))


def test_abr_xml_main_entity(abr_df):
    rows = {r.abn: r for r in abr_df.collect()}
    acme = rows["12345678901"]
    assert acme.entity_name == "ACME PTY LTD"
    assert acme.entity_type == "Australian Private Company"
    assert acme.entity_status == "ACT"
    assert acme.address == "NSW 2000"
    assert str(acme.start_date) == "2000-01-01"


def test_abr_xml_individual_fallback(abr_df):
    # no MainEntity -> falls back to given+family concat (u7/f10)
    jane = {r.abn: r for r in abr_df.collect()}["98765432109"]
    assert jane.entity_name == "JANE DOE"
    assert jane.state == "VIC" and jane.postcode == "3000"


HTML_OG = '<html><head><meta property="og:site_name" content="Acme Corp"/><meta name="keywords" content="mining, tools"/></head></html>'
HTML_JSONLD = '<html><script type="application/ld+json">{"@type": "Organization", "name": "Beta Ltd"}</script></html>'
HTML_TITLE = "<html><title>Products - Gamma Holdings</title></html>"
HTML_H1 = "<html><body><h1>Delta Inc</h1></body></html>"
HTML_NONE = "<html><body><p>nothing here</p></body></html>"


def test_extract_company_fields_fallback_order():
    assert warc.extract_company_fields(HTML_OG) == ("Acme Corp", "mining")
    assert warc.extract_company_fields(HTML_JSONLD)[0] == "Beta Ltd"
    assert warc.extract_company_fields(HTML_TITLE)[0] == "Gamma Holdings"
    assert warc.extract_company_fields(HTML_H1)[0] == "Delta Inc"
    assert warc.extract_company_fields(HTML_NONE) == (None, None)
    assert warc.extract_company_fields(None) == (None, None)
    # og:site_name outranks title
    both = HTML_OG.replace("</head>", "") + HTML_TITLE
    assert warc.extract_company_fields(both)[0] == "Acme Corp"


def test_extract_from_html_frame_distributed(spark):
    df = spark.createDataFrame(
        [(1, HTML_OG), (2, HTML_TITLE), (3, HTML_NONE)], "id long, html string"
    )
    out = warc.extract_from_html_frame(df)
    got = {r.id: (r.company_name, r.industry) for r in out.collect()}
    assert got[1] == ("Acme Corp", "mining")
    assert got[2] == ("Gamma Holdings", None)
    assert got[3] == (None, None)


def test_fetch_warc_html_gated():
    with pytest.raises(NotImplementedError):
        warc.fetch_warc_html("f.warc.gz", 0, 100)


def test_jdbc_writer_builder(spark):
    df = spark.createDataFrame([(1,)], "id long")
    w = files.jdbc_writer(df, "jdbc:postgresql://h/db", "t", batchsize=5000, num_partitions=4)
    assert w is not None  # builder configured without a live DB


# --- zip ingest (http-zip-source) ----------------------------------------

def test_unzip_members_idempotent(tmp_path):
    import zipfile

    from firmable_aus_etl_spark.sources import ingest

    zp = str(tmp_path / "abr.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("nested/20240101_a.xml", "<ABR>1</ABR>")
        zf.writestr("20240101_b.XML", "<ABR>2</ABR>")
        zf.writestr("readme.txt", "not xml")

    dest = str(tmp_path / "out")
    assert ingest.list_members(zp) == ["20240101_b.XML", "nested/20240101_a.xml"]

    first = ingest.unzip_members(zp, dest)
    assert sorted(os.path.basename(p) for p in first) == [
        "20240101_a.xml", "20240101_b.XML",
    ]
    # idempotence: second run extracts nothing (reference's re-run rule)
    assert ingest.unzip_members(zp, dest) == []
    # and the contents landed intact
    with open(os.path.join(dest, "20240101_a.xml")) as f:
        assert f.read() == "<ABR>1</ABR>"


def test_fetch_zip_is_gated(tmp_path):
    from firmable_aus_etl_spark.sources import ingest

    try:
        import requests  # noqa: F401
        has_requests = True
    except ImportError:
        has_requests = False
    if not has_requests:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="requests"):
            ingest.fetch_zip("http://localhost:1/x.zip", str(tmp_path / "x.zip"))


def test_json_lines_round_trip(spark, tmp_path):
    from firmable_aus_etl_spark.sources.files import (
        read_json_lines,
        write_json_lines,
    )

    df = spark.createDataFrame(
        [(1, "a b", [1, 2]), (2, None, [])],
        "id long, txt string, xs array<long>",
    )
    p = str(tmp_path / "jl")
    write_json_lines(df, p)
    back = read_json_lines(spark, p, schema=df.schema)
    got = sorted(
        (r.id, r.txt, list(r.xs) if r.xs is not None else None)
        for r in back.select("id", "txt", "xs").collect()
    )
    assert got == [(1, "a b", [1, 2]), (2, None, [])]


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    from firmable_aus_etl_spark import plans
    from firmable_aus_etl_spark.sources.files import read_orc, write_orc

    df = spark.range(0, 100).selectExpr("id", "id * 2 AS v")
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p).filter("id >= 90").select("v")
    assert back.count() == 10
    plan = plans.physical_plan(back)
    # ORC scan honors the same pushdown/pruning contract as parquet
    assert "PushedFilters" in plan and "id" in plan.split("PushedFilters", 1)[1][:120]


# --- fixture-bytes integration: zip -> XML -> conform, WARC -> DataFrame --


def _warc_record(rec_type: str, uri: str, http_body: bytes) -> bytes:
    """Serialize one WARC/1.0 record with correct framing."""
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + http_body
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_type}-{len(http_body)}>\r\n"
        f"Content-Type: application/http\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + b"\r\n\r\n"


def test_zip_of_abr_xml_end_to_end(spark, tmp_path):
    """Fetchless end-to-end: zip bytes -> unzip_members -> distributed
    XML scan -> extract_abr_records, asserting the reference's
    fallback semantics (extract_abr_xml.py:74-112) hold when the XML
    arrives through the real archive path, not a pre-laid file."""
    import zipfile

    from firmable_aus_etl_spark.sources import ingest

    member1 = """<Transfer>
<ABR><ABN status="ACT" ABNStatusFromDate="19991101">11111111111</ABN>
<EntityType><EntityTypeText>Australian Public Company</EntityTypeText></EntityType>
<MainEntity><NonIndividualName><NonIndividualNameText>ZIPCO LTD</NonIndividualNameText></NonIndividualName>
<BusinessAddress><AddressDetails><State>QLD</State><Postcode>4000</Postcode></AddressDetails></BusinessAddress></MainEntity>
</ABR>
</Transfer>"""
    member2 = """<Transfer>
<ABR><ABN status="CAN" ABNStatusFromDate="20150315">22222222222</ABN>
<LegalEntity><IndividualName><GivenName>ALEX</GivenName><FamilyName>SMITH</FamilyName></IndividualName>
<BusinessAddress><AddressDetails><State>WA</State><Postcode>6000</Postcode></AddressDetails></BusinessAddress></LegalEntity>
</ABR>
</Transfer>"""
    zp = str(tmp_path / "abr_bulk.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("public_split_1_10/20230101_Public01.xml", member1)
        zf.writestr("public_split_1_10/20230101_Public02.xml", member2)
        zf.writestr("readme.txt", "not xml - must be ignored")

    dest = str(tmp_path / "extracted")
    written = ingest.unzip_members(zp, dest)
    assert len(written) == 2 and all(w.endswith(".xml") for w in written)

    out = xml_abr.extract_abr_records(xml_abr.read_abr_xml(spark, dest))
    rows = {r.abn: r for r in out.collect()}
    assert set(rows) == {"11111111111", "22222222222"}
    zipco = rows["11111111111"]
    assert zipco.entity_name == "ZIPCO LTD"
    assert zipco.entity_status == "ACT" and zipco.address == "QLD 4000"
    assert str(zipco.start_date) == "1999-11-01"
    alex = rows["22222222222"]  # no MainEntity -> individual-name fallback
    assert alex.entity_name == "ALEX SMITH"
    assert alex.state == "WA" and alex.postcode == "6000"


def test_html_from_warc_bytes_plain_and_gzip():
    import gzip

    html = b"<html><head><title>Products - Gamma Holdings</title></head></html>"
    raw = _warc_record("request", "http://gamma.com.au", b"GET /") + _warc_record(
        "response", "http://gamma.com.au", html
    )
    assert warc.html_from_warc_bytes(raw) == html.decode()
    # gzip: independently-compressed members, concatenated (.warc.gz)
    gz = b"".join(
        gzip.compress(_warc_record(t, "http://gamma.com.au", b))
        for t, b in [("request", b"GET /"), ("response", html)]
    )
    assert warc.html_from_warc_bytes(gz) == html.decode()
    # no response record -> None
    assert warc.html_from_warc_bytes(_warc_record("request", "x", b"GET /")) is None


def test_read_warc_end_to_end(spark, tmp_path):
    """Fetchless end-to-end: .warc.gz fixture bytes -> distributed
    binaryFile scan -> record split -> HTML field extraction, the full
    extract_common_crawl.py:21-57 flow with zero network."""
    import gzip

    recs = [
        ("request", "http://acme.com.au", b"GET / HTTP/1.1"),
        (
            "response",
            "http://acme.com.au",
            b'<html><head><meta property="og:site_name" content="Acme Corp"/>'
            b'<meta name="keywords" content="mining, tools"/></head></html>',
        ),
        (
            "response",
            "http://delta.com.au",
            b"<html><body><h1>Delta Inc</h1></body></html>",
        ),
    ]
    gz = b"".join(gzip.compress(_warc_record(*r)) for r in recs)
    (tmp_path / "segment-00001.warc.gz").write_bytes(gz)

    df = warc.read_warc(spark, str(tmp_path))
    extracted = warc.extract_from_html_frame(df)
    rows = {r.url: r for r in extracted.collect()}
    assert set(rows) == {"http://acme.com.au", "http://delta.com.au"}
    assert rows["http://acme.com.au"].company_name == "Acme Corp"
    assert rows["http://acme.com.au"].industry == "mining"
    assert rows["http://delta.com.au"].company_name == "Delta Inc"
