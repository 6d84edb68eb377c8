"""fn:format-dateTime/-date/-time picture strings + friends.

XPath 3.0 picture strings ([Y0001]-[M01]-[D01] style, §9.8.4) translated
to Spark date_format patterns — the common variable markers; unsupported
markers raise so silent wrong output is impossible. Plus the high-traffic
regex trio (fn:matches / fn:replace / fn:tokenize is in strings.py) and
fn:encode-for-uri.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# XPath picture component → Spark date_format pattern
_MARKERS = {
    "Y0001": "yyyy", "Y": "y", "Y01": "yy",
    "M01": "MM", "M": "M", "MNn": "MMMM", "MN": "MMMM", "M3": "MMM",
    "D01": "dd", "D": "d",
    "F": "EEEE", "FNn": "EEEE", "F3": "EEE",
    "H01": "HH", "H": "H",
    "h01": "hh", "h": "h",
    "m01": "mm", "m": "m",
    "s01": "ss", "s": "s",
    "f001": "SSS",
    "P": "a", "PN": "a",
    "Z": "XXX", "z": "'GMT'XX",
}

_TOKEN = re.compile(r"\[([^\[\]]+)\]|(\[\[)|(\]\])|([^\[\]]+)")


def picture_to_pattern(picture: str) -> str:
    """'[Y0001]-[M01]-[D01]' → 'yyyy-MM-dd' (literals quoted as needed)."""
    out: list[str] = []
    for m in _TOKEN.finditer(picture):
        marker, lbr, rbr, lit = m.groups()
        if marker is not None:
            key = marker.replace(",", "").strip()
            if key not in _MARKERS:
                raise ValueError(f"unsupported picture marker [{marker}]")
            out.append(_MARKERS[key])
        elif lbr:
            out.append("'['")
        elif rbr:
            out.append("']'")
        else:
            # quote literal runs that contain pattern letters
            if re.search(r"[A-Za-z]", lit):
                out.append("'" + lit.replace("'", "''") + "'")
            else:
                out.append(lit)
    return "".join(out)


def format_datetime(ts: Column, picture: str) -> Column:
    """fn:format-dateTime($ts, picture) — XPath picture string."""
    return F.date_format(ts, picture_to_pattern(picture))


format_date = format_datetime
format_time = format_datetime


def matches(s: Column, regex: str) -> Column:
    """fn:matches — unanchored regex test (XPath semantics: a match
    anywhere in the string)."""
    return s.rlike(regex)


def replace_rx(s: Column, regex: str, replacement: str) -> Column:
    """fn:replace — global regex replacement; $1..$9 group references share
    Java semantics with the reference's engine."""
    return F.regexp_replace(s, regex, replacement)


def encode_for_uri(s: Column) -> Column:
    """fn:encode-for-uri: percent-encode everything outside the RFC 3986
    unreserved set (url_encode is form-encoding: '+' for space and some
    extra unreserved chars — patch those up to the XPath definition)."""
    enc = F.url_encode(s)
    enc = F.regexp_replace(enc, r"\+", "%20")  # form '+' → %20
    enc = F.regexp_replace(enc, r"\*", "%2A")  # '*' is NOT unreserved
    enc = F.replace(enc, F.lit("%7E"), F.lit("~"))  # '~' IS unreserved
    return enc
