"""Offline tests of the first-party NBIA downloader (tools/tcia_download.py)
against a local fixture HTTP server emulating the two REST endpoints the
reference's NBIA Data Retriever consumes (`fetch_dataset.ipynb` cells 3-6)."""

import io
import json
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from deep_staple_tpu.tools.tcia_download import (
    download_collection,
    download_series,
    list_series,
    parse_tcia_manifest,
)

SERIES = {
    "1.2.3.100": {b"a.dcm": b"DICM-A", b"b.dcm": b"DICM-B"},
    "1.2.3.200": {b"c.dcm": b"DICM-C"},
}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def do_GET(self):
        url = urlparse(self.path)
        q = parse_qs(url.query)
        if url.path.endswith("/getSeries"):
            body = json.dumps(
                [{"SeriesInstanceUID": uid, "Collection": q["Collection"][0]} for uid in SERIES]
            ).encode()
            self.send_response(200)
            self.end_headers()
            self.wfile.write(body)
        elif url.path.endswith("/getImage"):
            uid = q["SeriesInstanceUID"][0]
            if uid not in SERIES:
                self.send_response(404)
                self.end_headers()
                return
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w") as zf:
                for name, data in SERIES[uid].items():
                    zf.writestr(f"{uid}/{name.decode()}", data)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(buf.getvalue())
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def nbia_server():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/nbia-api/services/v1"
    srv.shutdown()


def test_parse_tcia_manifest(tmp_path):
    m = tmp_path / "VS.tcia"
    m.write_text(
        "downloadServerUrl=https://public.cancerimagingarchive.net/nbia-download/servlet/DownloadServlet\n"
        "includeAnnotation=true\n"
        "noOfrRetry=4\n"
        "databasketId=manifest-x.tcia\n"
        "manifestVersion=3.0\n"
        "ListOfSeriesToDownload=\n"
        "1.2.3.100\n"
        "1.2.3.200\n"
    )
    assert parse_tcia_manifest(m) == ["1.2.3.100", "1.2.3.200"]


def test_list_and_download_series(nbia_server, tmp_path):
    series = list_series("Vestibular-Schwannoma-SEG", base_url=nbia_server)
    assert {s["SeriesInstanceUID"] for s in series} == set(SERIES)

    files = download_series("1.2.3.100", tmp_path, base_url=nbia_server)
    assert sorted(f.name for f in files) == ["a.dcm", "b.dcm"]
    # zip member paths are preserved (fixture zips nest under "<uid>/"), so
    # same-named files in different subdirectories cannot clobber each other
    assert (tmp_path / "1.2.3.100" / "1.2.3.100" / "a.dcm").read_bytes() == b"DICM-A"
    # completion marker written only after full extraction (resume contract)
    from deep_staple_tpu.tools.tcia_download import _DONE_MARKER

    assert (tmp_path / "1.2.3.100" / _DONE_MARKER).is_file()


def test_download_collection_resumes(nbia_server, tmp_path):
    from deep_staple_tpu.tools.tcia_download import _DONE_MARKER

    out = download_collection(tmp_path, collection="X", base_url=nbia_server)
    assert set(out) == set(SERIES)
    # resume: COMPLETED series (marker present) are not re-fetched
    sentinel = tmp_path / "1.2.3.200" / "1.2.3.200" / "c.dcm"
    sentinel.write_bytes(b"LOCAL-EDIT")
    out2 = download_collection(tmp_path, collection="X", base_url=nbia_server)
    assert sentinel.read_bytes() == b"LOCAL-EDIT"
    assert set(out2) == set(SERIES)
    # a PARTIAL series (files but no marker — e.g. killed mid-extract) is
    # re-fetched in full rather than silently trusted
    (tmp_path / "1.2.3.200" / _DONE_MARKER).unlink()
    out3 = download_collection(tmp_path, collection="X", base_url=nbia_server)
    assert sentinel.read_bytes() == b"DICM-C"
    assert (tmp_path / "1.2.3.200" / _DONE_MARKER).is_file()
    assert set(out3) == set(SERIES)


def test_download_collection_manifest_subset(nbia_server, tmp_path):
    m = tmp_path / "subset.tcia"
    m.write_text("manifestVersion=3.0\nListOfSeriesToDownload=\n1.2.3.200\n")
    out = download_collection(tmp_path / "d", manifest=m, base_url=nbia_server)
    assert list(out) == ["1.2.3.200"]
