"""Geoservice publishing over the reference's wire shapes
(xcube_geodb_spark/gs.py): a local stub HTTP server records every
request, so the PUT/DELETE/GET bodies and paths the reference sends
(geodb.py:2150-2284) are pinned without any network."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from xcube_geodb_spark.client import GeoDBSparkClient
from xcube_geodb_spark.errors import GeoDBError
from xcube_geodb_spark.gs import GeoserviceHTTP


class _Stub(BaseHTTPRequestHandler):
    requests: list = []
    published: set = set()
    fail_next: list = []

    def log_message(self, *a):  # silence
        pass

    def _record(self, body=None):
        _Stub.requests.append(
            {
                "method": self.command,
                "path": self.path,
                "auth": self.headers.get("Authorization"),
                "body": body,
            }
        )

    def _respond(self, code=200, payload=None):
        raw = json.dumps(payload).encode() if payload is not None else b""
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(raw)))
        self.end_headers()
        self.wfile.write(raw)

    def do_PUT(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n)) if n else None
        self._record(body)
        if _Stub.fail_next:
            self._respond(_Stub.fail_next.pop(), {"error": "nope"})
            return
        db = self.path.split("/")[2]
        _Stub.published.add((db, body["collection_id"]))
        self._respond(200, {"status": "published", **body})

    def do_DELETE(self):
        self._record()
        parts = self.path.rstrip("/").split("/")
        _Stub.published.discard((parts[2], parts[-1]))
        self._respond(200)

    def do_GET(self):
        self._record()
        db = self.path.split("/")[2]
        rows = [
            {"database": d, "collection": c}
            for d, c in sorted(_Stub.published)
            if d == db
        ]
        self._respond(200, rows)


@pytest.fixture()
def stub():
    _Stub.requests, _Stub.published, _Stub.fail_next = [], set(), []
    srv = HTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


class TestWireShapes:
    def test_publish_roundtrip_records_reference_calls(self, stub):
        gs = GeoserviceHTTP(stub, token="tok123")
        out = gs.publish("mydb", "land_use")
        assert out["status"] == "published"
        assert gs.list_published("mydb") == [
            {"database": "mydb", "collection": "land_use"}
        ]
        gs.unpublish("mydb", "land_use")
        assert gs.list_published("mydb") == []
        methods = [(r["method"], r["path"]) for r in _Stub.requests]
        # the reference's exact shapes (geodb.py:2166-2171, 2268-2276)
        assert methods == [
            ("PUT", "/geodb_geoserver/mydb/collections/"),
            ("GET", "/geodb_geoserver/mydb/collections"),
            ("DELETE", "/geodb_geoserver/mydb/collections/land_use"),
            ("GET", "/geodb_geoserver/mydb/collections"),
        ]
        assert _Stub.requests[0]["body"] == {"collection_id": "land_use"}
        assert _Stub.requests[0]["auth"] == "Bearer tok123"

    def test_http_error_raises_geodb_error(self, stub):
        gs = GeoserviceHTTP(stub)
        _Stub.fail_next.append(503)
        with pytest.raises(GeoDBError, match="HTTP 503"):
            gs.publish("d", "c")

    def test_unreachable_raises(self):
        gs = GeoserviceHTTP("http://127.0.0.1:9")  # discard port
        with pytest.raises(GeoDBError, match="unreachable"):
            gs.publish("d", "c")


class TestClientIntegration:
    def test_client_publish_through_service(self, spark, tmp_path, stub):
        c = GeoDBSparkClient(
            spark, warehouse=str(tmp_path / "wh"), user="gsu", gs_url=stub
        )
        c.create_collection("roads", {"v": "int"})
        out = c.publish_gs("roads")
        assert out["published"] is True
        assert out["geoservice"]["status"] == "published"
        # catalog flag recorded AND service listing authoritative
        assert c.catalog.meta("roads", "gsu").d["gs"]["published"] is True
        df = c.get_published_gs()
        assert list(df["collection"]) == ["roads"]
        c.unpublish_gs("roads")
        assert c.catalog.meta("roads", "gsu").d["gs"]["published"] is False
        assert len(c.get_published_gs()) == 0

    def test_failed_publish_leaves_no_local_state(self, spark, tmp_path, stub):
        c = GeoDBSparkClient(
            spark, warehouse=str(tmp_path / "wh2"), user="gsu", gs_url=stub
        )
        c.create_collection("roads", {"v": "int"})
        _Stub.fail_next.append(500)
        with pytest.raises(GeoDBError):
            c.publish_gs("roads")
        assert not c.catalog.meta("roads", "gsu").d.get("gs", {}).get(
            "published"
        )

    def test_offline_default_unchanged(self, spark, tmp_path):
        c = GeoDBSparkClient(
            spark, warehouse=str(tmp_path / "wh3"), user="gsu"
        )
        assert c.gs is None
        c.create_collection("roads", {"v": "int"})
        out = c.publish_gs("roads")
        assert out == {
            "collection": "roads", "database": "gsu", "published": True
        }
        assert list(c.get_published_gs()["collection"]) == ["roads"]


class TestServiceRowShapes:
    """get_published_gs must frame EVERY service answer shape into the
    same (database, collection) columns the offline path produces —
    including dict rows that omit the database key (review r6.2
    finding: those passed through unframed, so get_all_published_gs
    concat produced NaN database values)."""

    def _client(self, spark, tmp_path, rows):
        from xcube_geodb_spark.client import GeoDBSparkClient

        c = GeoDBSparkClient(
            spark, warehouse=str(tmp_path / "whgs"), user="gu"
        )

        class FakeGS:
            def list_published(self, db):
                return rows

        c.gs = FakeGS()
        return c

    def test_dict_rows_without_database_are_framed(self, spark, tmp_path):
        c = self._client(spark, tmp_path, [{"collection": "roads"}])
        df = c.get_published_gs()
        assert list(df.columns[:2]) == ["database", "collection"]
        assert df.iloc[0]["database"] == "gu"
        assert df.iloc[0]["collection"] == "roads"

    def test_dict_rows_with_database_keep_it(self, spark, tmp_path):
        c = self._client(
            spark, tmp_path,
            [{"database": "other", "collection": "land"}],
        )
        df = c.get_published_gs()
        assert df.iloc[0]["database"] == "other"

    def test_string_rows_and_wrapper(self, spark, tmp_path):
        c = self._client(spark, tmp_path, {"collections": ["a", "b"]})
        df = c.get_published_gs()
        assert list(df["collection"]) == ["a", "b"]
        assert set(df["database"]) == {"gu"}
