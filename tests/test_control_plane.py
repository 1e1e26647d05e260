"""CLI + HTTP service parity tests (SURVEY §2.11), driven through the
real surfaces: argv in, files out; HTTP requests in, JSON out."""

from __future__ import annotations

import glob
import json
import threading
import urllib.request
from wsgiref.simple_server import make_server

import pytest

from bigquery_postgres_events_etl_spark.cli import build_parser, main, parse_date
from bigquery_postgres_events_etl_spark.service import EtlService


def test_parse_date_four_formats():
    import datetime

    d = datetime.date(2024, 1, 15)
    assert [parse_date(s) for s in ["2024-01-15", "2024/01/15", "15-01-2024", "15/01/2024"]] == [d] * 4
    with pytest.raises(Exception):
        parse_date("junk")


def test_cli_range_xor_days():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["--from", "2024-01-01", "--days", "3"])  # mutually exclusive
    with pytest.raises(SystemExit):
        p.parse_args([])  # one required


def test_cli_csv_extract(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export")
    rc = main(
        [
            "--from", "2024-01-05", "--to", "2024-01-10",
            "--source", sf_dir, "--output", out, "--single-file",
        ]
    )
    assert rc == 0
    parts = glob.glob(f"{out}/part-*.csv")
    assert len(parts) == 1
    with open(parts[0]) as f:
        header = f.readline().strip()
        first = f.readline().strip()
    assert header == "user_id,event_date,event_timestamp,event_name,event_id,event_name_detail"
    assert first  # rows present in the window


def test_cli_events_override(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export2")
    rc = main(
        ["--from", "2024-01-01", "--to", "2024-01-31",
         "--source", sf_dir, "--output", out, "--single-file",
         "--events", "purchase"]
    )
    assert rc == 0
    with open(glob.glob(f"{out}/part-*.csv")[0]) as f:
        f.readline()
        names = {line.split(",")[3] for line in f if line.strip()}
    assert names == {"purchase"}


def test_cli_bad_source_exits_1(tmp_path):
    assert main(["--days", "3", "--source", "/nonexistent", "--output", str(tmp_path / "x")]) == 1


@pytest.fixture()
def service(spark, sf_dir, tmp_path):
    svc = EtlService(
        spark, sf_dir, str(tmp_path / "wm.txt"), str(tmp_path / "target")
    )
    server = make_server("127.0.0.1", 0, svc.wsgi_app)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url) as r:
        return r.status, json.loads(r.read())


def test_service_endpoints(service):
    code, body = _get(f"{service}/health")
    assert code == 200 and body["status"] == "healthy"
    code, body = _get(f"{service}/")
    assert "/trigger" in body["endpoints"]
    code, body = _get(f"{service}/status")
    assert body["last_result"] is None and "last_timestamp_iso" in body


def test_service_trigger_then_status(service):
    req = urllib.request.Request(f"{service}/trigger", method="POST", data=b"")
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert body["status"] == "triggered"
    assert body["result"]["status"] == "success"
    _, status = _get(f"{service}/status")
    assert status["last_result"]["status"] == "success"
    assert status["last_timestamp"] > 0


def test_cli_parquet_sink(spark, sf_dir, tmp_path):
    """--parquet path: idempotent-append target; rerun adds nothing."""
    target = str(tmp_path / "ptarget")
    args = ["--from", "2024-01-01", "--to", "2024-01-31",
            "--source", sf_dir, "--parquet", target]
    assert main(args) == 0
    n1 = spark.read.parquet(target).count()
    assert n1 > 0
    assert main(args) == 0  # rerun
    assert spark.read.parquet(target).count() == n1
