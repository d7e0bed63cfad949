"""URL parsing + normalization kernels (web-corpus curation).

Web-scale training-data pipelines dedup and filter by URL: lowercase
scheme/host, strip default ports, drop tracking (``utm_*``) query
params, then group by host / registered domain (C4 and CommonCrawl
curation both do URL-keyed dedup before content-keyed dedup).  The
reference has no URL stage (its inputs are SAD text files); this is a
builder-brief operator for the 100 TB corpus path.

Everything is vectorized Arrow: one ``extract_regex`` splits each URL
into components, ``utf8_lower`` / ``replace_substring_regex`` kernels
normalize, ``binary_join_element_wise`` reassembles.  No per-row
Python; a batch of URLs costs a handful of RE2 passes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host[:port][/path][?query] — fragment intentionally dropped
# (normalization removes it; RFC 3986 fragments never reach the server).
_URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://"
    r"(?P<host>[^/:?#]+)"
    r"(?::(?P<port>[0-9]+))?"
    r"(?P<path>/[^?#]*)?"
    r"(?:\?(?P<query>[^#]*))?"
)

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def parse_normalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Table:
    """Parse a URL column and return normalized components.

    Output columns: ``scheme`` (lowercased), ``host`` (lowercased),
    ``port`` (empty string when absent OR the scheme default), ``path``
    (``/`` when absent), ``query`` (``utm_*`` params removed, empty
    string when nothing is left), ``url_norm`` (reassembled canonical
    form), ``domain`` (registered domain: last two host labels).
    Malformed URLs (no match) yield null components.
    """
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    parts = pc.extract_regex(urls, _URL_RE)
    scheme = pc.utf8_lower(pc.struct_field(parts, "scheme"))
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    port = pc.struct_field(parts, "port")
    path = pc.struct_field(parts, "path")
    query = pc.struct_field(parts, "query")

    # extract_regex yields "" for optional groups that did not
    # participate, null for whole-pattern misses — keep that contract.
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)

    # default-port strip: https://h:443/ == https://h/
    is_default = pc.or_kleene(
        pc.and_kleene(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_kleene(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    port = pc.if_else(pc.fill_null(is_default, False), pa.scalar(""), port)

    # tracking-param removal: utm_* params (and a leading stray '&')
    query = pc.replace_substring_regex(query, r"(^|&)utm_[^&]*", r"\1")
    query = pc.replace_substring_regex(query, r"^&+|&+$", "")
    query = pc.replace_substring_regex(query, r"&&+", "&")

    # registered domain = last two dot-labels (public-suffix lists need
    # network data; two-label is the deterministic sandbox rule)
    dom = pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$")
    domain = pc.if_else(
        pc.is_valid(dom), pc.struct_field(dom, "d"), host
    )

    colon_port = pc.if_else(
        pc.equal(port, ""),
        pa.scalar(""),
        pc.binary_join_element_wise(pa.scalar(":"), port, ""),
    )
    q_mark = pc.if_else(
        pc.equal(query, ""),
        pa.scalar(""),
        pc.binary_join_element_wise(pa.scalar("?"), query, ""),
    )
    url_norm = pc.binary_join_element_wise(
        scheme, pa.scalar("://"), host, colon_port, path, q_mark, ""
    )
    return pa.table(
        {
            "scheme": scheme,
            "host": host,
            "port": port,
            "path": path,
            "query": query,
            "url_norm": url_norm,
            "domain": domain,
        }
    )
