"""Error types.

Reference: ``xcube_geodb/core/geodb.py`` raises ``GeoDBError`` for all
server/client failures (xcube_geodb/core/geodb.py:84-88 in the reference).
"""


class GeoDBError(ValueError):
    """Raised for all engine-level failures (mirrors the reference's
    ``GeoDBError(ValueError)``)."""
