"""Crawl politeness + discovery: RFC 9309 robots.txt parsing and
matching, and sitemap URL harvesting — the two frontier-policy pieces
between ``extract_links`` (what a page points at) and the fetch queue
(what a polite crawler may actually get).  Pure stdlib; semantics
follow the public **RFC 9309** (Robots Exclusion Protocol) and the
sitemaps.org XML schema.

Why this is a first-class 100 TB operator and not a driver-side loop:
a crawl's robots corpus is one small record per HOST (millions of
rows, bytes each) while the page/frontier side is the 100 TB table —
so the shape is parse-each-robots-ONCE (an Arrow map over the tiny
side), a hash join on host, and an Arrow-batched longest-match on the
big side.  Zero collects, no per-URL re-parsing of robots bodies.

Matching semantics, stated for the tests (RFC 9309 §2.2):
group selection picks the most specific ``User-agent`` line — the
longest one that is a case-insensitive prefix of the crawler's
product token — falling back to ``*``; multiple groups for the same
agent merge.  A rule pattern matches the URL path+query from the
FIRST octet; ``*`` matches any octet sequence and ``$`` anchors the
end.  The MOST SPECIFIC match (longest pattern, in octets) wins;
an allow/disallow tie at equal length resolves to ALLOW; no matching
rule means allowed; an empty ``Disallow:`` line allows everything
(it is not a pattern).  Percent-encoding (RFC 9309 §2.2.2): both the
rule pattern and the URL path are normalized at match time — escapes
of UNRESERVED octets decode (``%7E`` == ``~``) and every other escape
upper-cases its hex (``%3f`` == ``%3F``); reserved octets stay
encoded, so ``%2F`` and ``/`` remain DISTINCT, per the RFC.
"""

from __future__ import annotations

import functools
import re

# module-global so pandas_udf stringized hints resolve
import pandas as pd  # noqa: F401

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "parse_robots",
    "robots_allowed",
    "robots_sitemaps",
    "filter_robots_disallowed",
    "extract_sitemap_urls",
    "extract_sitemap_urls_df",
]


def _groups(txt: str):
    """robots.txt -> list of (agent_tokens, rules) groups plus the
    file-wide sitemap list.  A group is consecutive ``User-agent``
    lines followed by rules; rules before any User-agent line belong
    to no group (RFC: they are ignored)."""
    groups: list = []
    sitemaps: list = []
    cur_agents: list = []
    cur_rules: list = []
    agents_open = False  # collecting consecutive UA lines
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "sitemap":
            if value:
                sitemaps.append(value)
            continue
        if field == "user-agent":
            if not agents_open:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                agents_open = True
            cur_agents.append(value.lower())
            continue
        agents_open = False
        if field in ("allow", "disallow") and cur_agents:
            if value == "" and field == "disallow":
                continue  # empty Disallow: allow-all, not a pattern
            if value:
                cur_rules.append((field == "allow", value))
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    return groups, sitemaps


def parse_robots(txt: str, user_agent: str = "*"):
    """robots.txt body -> the rule list [(is_allow, pattern), ...]
    that applies to ``user_agent`` (RFC 9309 group selection: longest
    User-agent line that prefixes the product token, else the ``*``
    groups; same-specificity groups merge)."""
    if txt is None:
        raise ValueError("parse_robots: txt is None")
    groups, _ = _groups(txt)
    ua = user_agent.lower()
    best_len = -1
    for agents, _rules in groups:
        for a in agents:
            if a != "*" and ua.startswith(a) and len(a) > best_len:
                best_len = len(a)
    rules: list = []
    for agents, grules in groups:
        if best_len >= 0:
            if any(
                a != "*" and ua.startswith(a) and len(a) == best_len
                for a in agents
            ):
                rules.extend(grules)
        elif "*" in agents:
            rules.extend(grules)
    return rules


def robots_sitemaps(txt: str):
    """robots.txt body -> the file-wide ``Sitemap:`` URL list (these
    live outside any user-agent group per the spec)."""
    if txt is None:
        raise ValueError("robots_sitemaps: txt is None")
    _, sitemaps = _groups(txt)
    return sitemaps


# RFC 3986 unreserved characters: the only octets whose percent-
# escapes are equivalent to the bare character (RFC 9309 §2.2.2).
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RX = re.compile(r"%([0-9A-Fa-f]{2})")


def _pct_norm(s: str) -> str:
    """Percent-encoding normalization applied to BOTH sides of a match
    (rule pattern and URL path): escapes of unreserved octets decode
    (``%7E`` -> ``~``), all other escapes upper-case their hex digits
    (``%3f`` -> ``%3F``), reserved octets stay encoded so ``%2F`` and
    ``/`` remain distinct (RFC 9309 §2.2.2 / RFC 3986 §2.3).  Invalid
    escapes (``%ZZ``) pass through literally.  Decoding can never mint
    a wildcard: ``*`` and ``$`` are reserved sub-delims, so their
    escapes stay percent-encoded."""
    def sub(m):
        ch = chr(int(m.group(1), 16))
        return ch if ch in _UNRESERVED else "%" + m.group(1).upper()

    return _PCT_RX.sub(sub, s)


@functools.lru_cache(maxsize=8192)
def _compiled_rule(pattern: str):
    """Rule pattern -> (anchored regex, specificity octets): ``*`` ->
    ``.*``, a single trailing ``$`` -> end anchor (a literal ``$``
    BEFORE the anchor stays a literal — strip at most one), everything
    else literal after percent-normalization, matched from the first
    path octet.  Specificity is the normalized body's octet length —
    the value longest-match ranks on (``$`` is an anchor, not
    specificity; ``%61`` counts as the one octet it decodes to).
    lru_cached: the match runs per URL over a crawl's worth of paths
    while the pattern universe is per-host rules — recompiling inside
    the loop measured 34x slower and thrashes the re module's
    512-entry cache once the batch spans >512 distinct patterns
    (r13 review)."""
    anchor = pattern.endswith("$")
    body = _pct_norm(pattern[:-1] if anchor else pattern)
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile("^" + rx + ("$" if anchor else "")), len(body)


def robots_allowed(path: str, rules) -> bool:
    """Longest-match decision for one path (include the query when the
    caller has one: ``/p?a=1``).  No match -> allowed; equal-length
    allow/disallow -> allow.  Path and patterns percent-normalize
    before comparison (see :func:`_pct_norm`)."""
    if not path.startswith("/"):
        path = "/" + path
    path = _pct_norm(path)
    best_len = -1
    best_allow = True
    for allow, pattern in rules:
        rx, plen = _compiled_rule(pattern)
        if rx.match(path):
            if plen > best_len or (plen == best_len and allow):
                best_len = plen
                best_allow = allow
    return best_allow


def filter_robots_disallowed(
    df: DataFrame,
    robots_df: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    user_agent: str = "*",
    keep_unknown: bool = True,
) -> DataFrame:
    """Drop rows whose URL a host's robots.txt disallows for
    ``user_agent``.  ``robots_df`` is (host, robots_txt) — one row per
    host, the shape a fetcher's robots cache lands naturally.

    Scale shape: rules are parsed ONCE PER HOST on the small side (an
    Arrow-batched map over robots_df — bytes per row, millions of
    rows), then a plain hash join on host (Catalyst broadcasts when
    the robots side is small enough; at crawl scale it's a shuffle
    hash join on a well-distributed key) and one Arrow-batched
    longest-match over the page side.  No collects, no driver state,
    robots bodies never re-parse per URL.

    ``keep_unknown``: a page whose host has NO robots row is kept
    (the RFC default when robots.txt is absent is allow-all); pass
    False for the conservative inverse."""
    from zeek_duckdb_spark.operators.textops import url_host

    ua = user_agent

    @F.pandas_udf("array<struct<allow:boolean,pattern:string>>")
    def _parse(txts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if t is None
                else [
                    {"allow": a, "pattern": p}
                    for a, p in parse_robots(t, ua)
                ]
                for t in txts
            ]
        )

    @F.pandas_udf("boolean")
    def _allowed(paths: pd.Series, rules: pd.Series) -> pd.Series:
        out = []
        for p, r in zip(paths, rules):
            if r is None:
                out.append(None)
                continue
            out.append(
                robots_allowed(
                    p or "/",
                    [(bool(x["allow"]), x["pattern"]) for x in r],
                )
            )
        return pd.Series(out, dtype="object")

    rules_df = robots_df.select(
        F.lower(F.col(host_col)).alias("_rb_host"),
        _parse(F.col(robots_col)).alias("_rb_rules"),
    )
    # path+query of the page URL (the RFC match target)
    path_q = F.regexp_extract(
        F.col(url_col), r"(?i)^https?://[^/?#]+([^#]*)", 1
    )
    joined = (
        df.withColumn("_rb_host", url_host(F.col(url_col)))
        .join(rules_df, "_rb_host", "left")
        .withColumn("_rb_ok", _allowed(path_q, F.col("_rb_rules")))
    )
    cond = (
        F.col("_rb_ok") | F.col("_rb_ok").isNull()
        if keep_unknown
        else F.col("_rb_ok") & F.col("_rb_ok").isNotNull()
    )
    return joined.filter(cond).drop("_rb_host", "_rb_rules", "_rb_ok")


def extract_sitemap_urls(xml: str):
    """Sitemap XML -> (kind, urls): ``("urlset", [page urls])`` for a
    regular sitemap, ``("sitemapindex", [child sitemap urls])`` for an
    index file — the caller recurses on indexes (a driver-side loop
    over a handful of index files, then the child list fans out as a
    DataFrame).  Namespace-tolerant (with or without the sitemaps.org
    namespace); raises ValueError on non-sitemap XML — the Spark-side
    wrapper maps that to an empty list so one bad sitemap cannot kill
    a harvest job."""
    import xml.etree.ElementTree as ET

    if xml is None:
        raise ValueError("extract_sitemap_urls: xml is None")
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as exc:
        raise ValueError(f"extract_sitemap_urls: bad XML ({exc})") from None
    tag = root.tag.split("}")[-1]
    if tag not in ("urlset", "sitemapindex"):
        raise ValueError(
            f"extract_sitemap_urls: root element {tag!r} is not a sitemap"
        )
    child = "url" if tag == "urlset" else "sitemap"
    urls = []
    for el in root:
        if el.tag.split("}")[-1] != child:
            continue
        for loc in el:
            if loc.tag.split("}")[-1] == "loc" and loc.text:
                urls.append(loc.text.strip())
                break
    return tag, urls


def extract_sitemap_urls_df(
    df: DataFrame, xml_col: str = "xml", out_col: str = "sitemap_urls"
) -> DataFrame:
    """Spark form: add ``out_col`` = array of <loc> URLs per sitemap
    document (urlset AND index entries — the caller distinguishes by
    fetching; a non-sitemap/broken document yields an empty array, not
    a dead job).  One Arrow-batched map, zero shuffle."""

    @F.pandas_udf("array<string>")
    def _ex(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            try:
                return extract_sitemap_urls(x)[1]
            except ValueError:
                return []

        return s.map(one)

    return df.withColumn(out_col, _ex(F.col(xml_col)))
