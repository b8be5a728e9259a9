"""User-agent OS / browser-family extraction.

The reference runs ua_parser's full regex corpus on the request UA
(CounterKeys.java:43, UAParser.parseOS(...).family /
parseUserAgent(...).family). A dependency-free subset covers the
families the counter dimensions actually produce; everything is
``rlike``-style JVM regex — no Python UDF in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_OS_RULES = (
    ("Windows", r"Windows"),
    ("iOS", r"iPhone|iPad|iPod"),
    ("Mac OS X", r"Mac OS X|Macintosh"),
    ("Android", r"Android"),
    ("Chrome OS", r"CrOS"),
    ("Linux", r"Linux|X11"),
)

_AGENT_RULES = (
    ("Googlebot", r"Googlebot"),
    ("Edge", r"Edg[e/]"),
    ("Opera", r"Opera|OPR/"),
    ("Samsung Internet", r"SamsungBrowser"),
    ("Chrome Mobile", r"Android.*Chrome/"),
    ("Chrome", r"Chrome/"),
    ("Firefox", r"Firefox/"),
    ("Mobile Safari", r"(iPhone|iPad|iPod).*Safari"),
    ("Safari", r"Safari/"),
)


def _first_match(ua: Column, rules) -> Column:
    out = F.lit("Other")
    for name, pattern in reversed(rules):
        out = F.when(ua.rlike(pattern), F.lit(name)).otherwise(out)
    return out


def os_family(ua: Column | str) -> Column:
    ua = F.col(ua) if isinstance(ua, str) else ua
    return _first_match(ua, _OS_RULES)


def agent_family(ua: Column | str) -> Column:
    ua = F.col(ua) if isinstance(ua, str) else ua
    return _first_match(ua, _AGENT_RULES)
