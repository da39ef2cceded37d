"""Publication-date parsing (reference parity: src/feeds/rss_feeds/mod.rs:183-192).

Reference semantics::

    pub_date = item.pub_date()
        .map(|it| dateparser::DateTimeUtc::from_str(it) -> .naive_utc()
                  on error -> Utc::now().naive_utc())
        .unwrap_or_default()          // missing -> 1970-01-01T00:00:00

We implement RFC-822/1123 (the RSS <pubDate> format — fixture corpus uses
"Sun, 20 Oct 2024 21:34:25 +0530") and ISO-8601 families from scratch, always
converting to timezone-naive UTC. The nondeterministic ``Utc::now()``
fallback is replaced by a pinned job parameter (``now_utc``) so runs are
reproducible (SURVEY.md §7 hard part (b)).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

EPOCH = datetime(1970, 1, 1)  # NaiveDateTime::default()

_MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

# common RFC-822 zone names (RFC 2822 §4.3 obsolete zones + UTC/GMT)
_ZONES = {
    "UT": 0, "GMT": 0, "UTC": 0, "Z": 0,
    "EST": -5 * 60, "EDT": -4 * 60,
    "CST": -6 * 60, "CDT": -5 * 60,
    "MST": -7 * 60, "MDT": -6 * 60,
    "PST": -8 * 60, "PDT": -7 * 60,
}

_RFC822_RE = re.compile(
    r"^(?:(?P<wday>[A-Za-z]{3,9}),?\s+)?"
    r"(?P<day>\d{1,2})\s+(?P<mon>[A-Za-z]{3,9})\.?\s+(?P<year>\d{2,4})"
    r"\s+(?P<hour>\d{1,2}):(?P<min>\d{2})(?::(?P<sec>\d{2}))?"
    r"(?:\s+(?P<zone>[+-]\d{4}|[A-Za-z]{1,5}))?\s*$"
)

_ISO_RE = re.compile(
    r"^(?P<year>\d{4})-(?P<mon>\d{2})-(?P<day>\d{2})"
    r"(?:[T ](?P<hour>\d{1,2}):(?P<min>\d{2})(?::(?P<sec>\d{2})(?:\.(?P<frac>\d{1,9}))?)?"
    r"(?P<zone>Z|[+-]\d{2}:?\d{2})?)?\s*$"
)


def _zone_offset_minutes(zone: str | None) -> int | None:
    """Offset east of UTC in minutes, or None if the zone is unknown."""
    if zone is None or zone == "":
        return 0  # dateparser treats zone-less strings as UTC by default
    z = zone.strip()
    if z and z[0] in "+-":
        digits = z[1:].replace(":", "")
        if len(digits) != 4 or not digits.isdigit():
            return None
        off = int(digits[:2]) * 60 + int(digits[2:])
        return -off if z[0] == "-" else off
    return _ZONES.get(z.upper())


def parse_pub_date(raw: str | None, now_utc: datetime = EPOCH) -> datetime:
    """Parse ``raw`` to a naive-UTC datetime with reference fallbacks.

    missing (None/empty)  -> EPOCH  (NaiveDateTime::default, mod.rs:192)
    unparseable           -> ``now_utc`` (pinned stand-in for Utc::now(), mod.rs:189)
    parsed                -> instant converted to UTC, tzinfo dropped (naive_utc)
    """
    if raw is None:
        return EPOCH
    s = raw.strip()
    if not s:
        return EPOCH

    m = _RFC822_RE.match(s)
    if m:
        mon = _MONTHS.get(m.group("mon")[:3].lower())
        off = _zone_offset_minutes(m.group("zone"))
        if mon is not None and off is not None:
            year = int(m.group("year"))
            if year < 100:  # two-digit years per RFC 2822 §4.3
                year += 2000 if year < 50 else 1900
            try:
                local = datetime(
                    year, mon, int(m.group("day")),
                    int(m.group("hour")), int(m.group("min")),
                    int(m.group("sec") or 0),
                )
            except ValueError:
                return now_utc
            return local - timedelta(minutes=off)
        return now_utc

    m = _ISO_RE.match(s)
    if m:
        off = 0
        zone = m.group("zone")
        if zone and zone != "Z":
            off = _zone_offset_minutes(zone)
            if off is None:
                return now_utc
        frac = m.group("frac")
        micro = int(frac.ljust(6, "0")[:6]) if frac else 0
        try:
            local = datetime(
                int(m.group("year")), int(m.group("mon")), int(m.group("day")),
                int(m.group("hour") or 0), int(m.group("min") or 0),
                int(m.group("sec") or 0), micro,
            )
        except ValueError:
            return now_utc
        return local - timedelta(minutes=off)

    return now_utc
