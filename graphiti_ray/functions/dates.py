"""Date coercion utilities (graphiti_core/utils/datetime_utils.py:20-42,
temporal_operations.py:54-66).

Engine convention: all timestamps are naive-UTC ``timestamp[us]`` Arrow
columns; the reference's tz-aware-UTC coercion maps onto "parse, convert
to UTC, drop tzinfo".
"""

from __future__ import annotations

from datetime import datetime, timezone


def ensure_utc_naive(dt: datetime | None) -> datetime | None:
    """ensure_utc semantics (datetime_utils.py:25-42): naive -> assume
    UTC; aware -> convert to UTC; then represent naive."""
    if dt is None:
        return None
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def parse_iso_utc(s: str | None) -> datetime | None:
    """ISO-8601 parse with Z suffix tolerance
    (temporal_operations.py:56,63); returns naive-UTC or None on failure."""
    if not s:
        return None
    try:
        return ensure_utc_naive(datetime.fromisoformat(s.replace("Z", "+00:00")))
    except ValueError:
        return None


EPOCH = datetime(1970, 1, 1)


def ts_us(dt: datetime) -> int:
    return int((ensure_utc_naive(dt) - EPOCH).total_seconds() * 1_000_000)


def from_us(us: int) -> datetime:
    return datetime.utcfromtimestamp(us / 1_000_000)
