"""URL normalization replicating the reference crawler byte-for-byte.

Reimplements ``CrawlerService.normalizeUrl`` (``service/CrawlerService.java:222-264``)
including the ``java.net.URI`` parse/reject semantics it depends on:

- null/blank -> None; input trimmed.
- no scheme, or scheme not http/https (case-insensitive) -> None.
- invalid URI (illegal characters, bad %-escapes, non-server-based authority
  such as hosts containing '_') -> None.
- scheme + host lowercased; fragment stripped; userinfo dropped (the reference's
  StringBuilder never re-appends it); default port (80/443) dropped; empty path
  -> "/"; query kept iff non-blank.
- Java's multi-arg URI constructor + getPath()/getQuery() round-trip means the
  emitted path and query are the *percent-decoded* forms (getPath/getQuery
  decode escapes; see CrawlerService.java:233-247).

Pure stdlib; safe for use inside pandas UDFs on executors.
"""

from __future__ import annotations

import re
from typing import Optional
from urllib.parse import unquote

# RFC 2396 character classes as java.net.URI enforces them (plus Java URI's
# documented deviation: "other" non-US-ASCII chars are allowed where escapes are).
_UNRESERVED = r"A-Za-z0-9\-_.!~*'()"
_ESCAPED = r"%[0-9A-Fa-f]{2}"
_OTHER = "\u0080-\U0010FFFF"  # Java URI: non-ASCII "other" chars are allowed
# pchar = unreserved | escaped | ":@&=+$," ; path segments add ";" and "/"
_PATH_RE = re.compile(
    rf"^(?:[{_UNRESERVED}:@&=+$,;/{_OTHER}]|{_ESCAPED})*$"
)
# uric = reserved | unreserved | escaped (query & fragment allow all of uric)
_URIC_RE = re.compile(
    rf"^(?:[{_UNRESERVED};/?:@&=+$,\[\]{_OTHER}]|{_ESCAPED})*$"
)
_USERINFO_RE = re.compile(
    rf"^(?:[{_UNRESERVED};:&=+$,{_OTHER}]|{_ESCAPED})*$"
)
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+\-.]*$")
# java.net.URI server-based hostname: labels of alphanum|'-' (no leading/trailing
# '-'), dot-separated, optional trailing dot; or IPv4; or bracketed IPv6.
_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?"
_HOSTNAME_RE = re.compile(rf"^(?:{_LABEL}\.)*(?:{_LABEL})\.?$")
_IPV4_RE = re.compile(r"^\d{1,3}(?:\.\d{1,3}){3}$")
_IPV6_RE = re.compile(r"^\[[0-9A-Fa-f:.%]+\]$")


class _BadUri(Exception):
    pass


def _split_uri(raw: str):
    """RFC 2396 split: scheme, authority, path, query, fragment.

    Mirrors java.net.URI's parser closely enough for http(s) URLs: raises
    _BadUri on anything java.net.URI would reject for our purposes.
    """
    m = re.match(r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$", raw, re.S)
    if m is None:  # pragma: no cover - the regex matches any string
        raise _BadUri(raw)
    scheme, authority, path, query, fragment = m.groups()
    if scheme is not None and not _SCHEME_RE.match(scheme):
        # A ':' before any '/' with an invalid scheme is a parse error in Java
        raise _BadUri(f"bad scheme: {scheme}")
    return scheme, authority, path or "", query, fragment


def _parse_server_authority(authority: str):
    """Return (userinfo, host, port) per java.net.URI server-based parsing.

    Returns host=None when the authority is not server-based (Java then falls
    back to a registry-based authority with getHost()==null, which the
    reference treats as invalid — CrawlerService.java:243-244).
    Raises _BadUri for outright illegal characters.
    """
    userinfo = None
    hostport = authority
    if "@" in authority:
        userinfo, hostport = authority.split("@", 1)
        if not _USERINFO_RE.match(userinfo):
            raise _BadUri(f"bad userinfo: {userinfo}")
    host: Optional[str]
    port = -1
    if hostport.startswith("["):
        end = hostport.find("]")
        if end < 0:
            raise _BadUri(f"bad ipv6: {hostport}")
        host = hostport[: end + 1]
        rest = hostport[end + 1 :]
        if not _IPV6_RE.match(host):
            raise _BadUri(f"bad ipv6: {host}")
        if rest:
            if not rest.startswith(":"):
                raise _BadUri(f"bad authority: {hostport}")
            port = _parse_port(rest[1:])
    else:
        if ":" in hostport:
            host, port_s = hostport.rsplit(":", 1)
            port = _parse_port(port_s)
        else:
            host = hostport
        if not host:
            return userinfo, None, port
        if not (_HOSTNAME_RE.match(host) or _IPV4_RE.match(host)):
            # Not server-based (e.g. '_' in host) -> registry-based, host=null.
            # But truly illegal URI characters still blow up the parse.
            if not _URIC_RE.match(host):
                raise _BadUri(f"illegal chars in authority: {host}")
            return userinfo, None, port
    return userinfo, host, port


def _parse_port(port_s: str) -> int:
    if port_s == "":
        return -1
    if not port_s.isdigit():
        raise _BadUri(f"bad port: {port_s}")
    return int(port_s)


def _default_port(scheme: str) -> int:
    # CrawlerService.java:262-264
    return 443 if scheme == "https" else 80


def _decode(component: str) -> str:
    """java.net.URI.getPath()/getQuery() decode %-escapes as UTF-8 with
    replacement for malformed byte sequences."""
    return unquote(component, encoding="utf-8", errors="replace")


def normalize_url(raw: Optional[str]) -> Optional[str]:
    """Byte-exact reimplementation of CrawlerService.normalizeUrl (:222-260)."""
    if raw is None or raw.strip() == "":
        return None
    try:
        s = raw.strip()
        scheme, authority, path, query, fragment = _split_uri(s)
        if scheme is None:
            return None
        lower_scheme = scheme.lower()
        if lower_scheme not in ("http", "https"):
            return None
        if authority is None:
            # opaque or no-authority hierarchical http URI -> host is null
            return None
        # validate path/query/fragment character legality (Java parse time)
        if not _PATH_RE.match(path):
            raise _BadUri(f"bad path: {path}")
        if query is not None and not _URIC_RE.match(query):
            raise _BadUri(f"bad query: {query}")
        if fragment is not None and not _URIC_RE.match(fragment):
            raise _BadUri(f"bad fragment: {fragment}")
        _userinfo, host, port = _parse_server_authority(authority)
        if host is None:
            return None
        dec_path = _decode(path)
        if dec_path == "" or dec_path.strip() == "":
            dec_path = "/"
        dec_query = _decode(query) if query is not None else None

        out = [lower_scheme, "://", host.lower()]
        if port != -1 and port != _default_port(lower_scheme):
            out.append(f":{port}")
        out.append(dec_path)
        if dec_query is not None and dec_query.strip() != "":
            out.append("?")
            out.append(dec_query)
        return "".join(out)
    except _BadUri:
        return None


def domain_of(url: Optional[str]) -> Optional[str]:
    """``URI.create(url).getHost()`` as used in WebPageProcessor.java:230-236."""
    if url is None:
        return None
    try:
        _scheme, authority, _p, _q, _f = _split_uri(url)
        if authority is None:
            return None
        _u, host, _port = _parse_server_authority(authority)
        return host
    except _BadUri:
        return None
