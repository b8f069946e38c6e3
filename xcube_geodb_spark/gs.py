"""Geoservice (GeoServer-manager) HTTP backend for collection publishing.

The reference's ``publish_gs``/``unpublish_gs``/``get_published_gs``
(``xcube_geodb/core/geodb.py:2150-2284``) are thin HTTP calls against a
managed geoserver service: ``PUT /geodb_geoserver/{database}/collections/``
with ``{"collection_id": name}``, ``DELETE .../collections/{name}``, and
``GET .../collections``. This module speaks the same wire shapes with
stdlib ``urllib`` only, so a migrating user can point the client at the
same service and keep publishing — while the engine continues to record
publication state in the catalog (source of truth for listings when no
service is configured, write-through cache when one is).

Configuration: pass ``gs_url=`` to :class:`GeoDBSparkClient` or set
``GEODB_SPARK_GS_URL``. Authorization: optional bearer token via
``gs_token=`` / ``GEODB_SPARK_GS_TOKEN``. No URL configured -> pure
catalog-flag behavior (offline default; nothing is ever sent).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from xcube_geodb_spark.errors import GeoDBError

_TIMEOUT_S = 30.0


class GeoserviceHTTP:
    """Minimal client for the reference's geoserver-manager REST shapes."""

    def __init__(self, base_url: str, token: str | None = None):
        self.base_url = base_url.rstrip("/")
        self.token = token

    def _request(self, method: str, path: str, payload: dict | None = None):
        body = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(
            f"{self.base_url}{path}", data=body, method=method
        )
        req.add_header("Accept", "application/json")
        if body is not None:
            req.add_header("Content-Type", "application/json")
        if self.token:
            req.add_header("Authorization", f"Bearer {self.token}")
        try:
            with urllib.request.urlopen(req, timeout=_TIMEOUT_S) as r:
                raw = r.read()
        except urllib.error.HTTPError as e:
            raise GeoDBError(
                f"Geoservice {method} {path} failed: HTTP {e.code} "
                f"{e.read()[:200]!r}"
            ) from e
        except urllib.error.URLError as e:
            raise GeoDBError(
                f"Geoservice unreachable at {self.base_url}: {e.reason}"
            ) from e
        if not raw:
            return None
        try:
            return json.loads(raw)
        except ValueError:
            return {"raw": raw.decode(errors="replace")}

    # reference wire shapes (geodb.py:2166-2171, 2232-2236, 2268-2276)
    def publish(self, database: str, collection: str):
        return self._request(
            "PUT",
            f"/geodb_geoserver/{database}/collections/",
            {"collection_id": collection},
        )

    def unpublish(self, database: str, collection: str) -> None:
        self._request(
            "DELETE", f"/geodb_geoserver/{database}/collections/{collection}"
        )

    def list_published(self, database: str):
        return (
            self._request("GET", f"/geodb_geoserver/{database}/collections")
            or []
        )
