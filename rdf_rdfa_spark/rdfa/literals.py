"""XSD lexical-grammar sniffing for @value and <time> literals.

Mirrors the reference's grammar-dispatch:
  - @value → Integer/Decimal/Double sniff: /root/reference/lib/rdf/rdfa/reader.rb:1192-1201
  - <time> → Date/Time/DateTime/Year/YearMonth/Duration sniff: reader.rb:1213-1221

Grammar regexes follow the XSD 1.1 lexical spaces (as the ruby rdf/xsd
GRAMMAR constants do). Detection ORDER matters and is preserved.
"""

from __future__ import annotations

import re

from .terms import (
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_DURATION,
    XSD_GYEAR,
    XSD_GYEARMONTH,
    XSD_INTEGER,
    XSD_TIME,
)

_TZ = r"(?:[+\-]\d{2}:\d{2}|UTC|GMT|Z)?"

_INTEGER_RE = re.compile(r"^[+\-]?\d+$")
_DECIMAL_RE = re.compile(r"^[+\-]?(?:\d+\.\d*|\.\d+)$")
_DOUBLE_RE = re.compile(
    r"^(?:[+\-]?(?:\d+(?:\.\d*)?|\.\d+)[eE][+\-]?\d+|[+\-]?INF|NaN)$"
)

_DATE_RE = re.compile(r"^-?\d{4}-\d{2}-\d{2}" + _TZ + "$")
_TIME_RE = re.compile(r"^\d{2}:\d{2}:\d{2}(?:\.\d+)?" + _TZ + "$")
_DATETIME_RE = re.compile(
    r"^-?\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?" + _TZ + "$"
)
_YEAR_RE = re.compile(r"^-?\d{4}$")
_YEARMONTH_RE = re.compile(r"^-?\d{4}-\d{2}" + _TZ + "$")
_DURATION_RE = re.compile(
    r"^-?P(?=.)(?:\d+Y)?(?:\d+M)?(?:\d+D)?(?:T(?=.)(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?$"
)

_VALUE_ORDER = ((_INTEGER_RE, XSD_INTEGER), (_DECIMAL_RE, XSD_DECIMAL), (_DOUBLE_RE, XSD_DOUBLE))
_TIME_ORDER = (
    (_DATE_RE, XSD_DATE),
    (_TIME_RE, XSD_TIME),
    (_DATETIME_RE, XSD_DATETIME),
    (_YEAR_RE, XSD_GYEAR),
    (_YEARMONTH_RE, XSD_GYEARMONTH),
    (_DURATION_RE, XSD_DURATION),
)


def sniff_value_datatype(v: str) -> str | None:
    """@value literal: Integer ≻ Decimal ≻ Double, else untyped."""
    for rx, dt in _VALUE_ORDER:
        if rx.match(v):
            return dt
    return None


def sniff_time_datatype(v: str) -> str | None:
    """<time> literal: Date ≻ Time ≻ DateTime ≻ Year ≻ YearMonth ≻ Duration."""
    for rx, dt in _TIME_ORDER:
        if rx.match(v):
            return dt
    return None
