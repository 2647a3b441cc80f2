"""URL curation functions — pure whole-stage-codegen Column algebra.

Common-Crawl-style pipelines dedup by NORMALIZED URL before content
dedup (the same page is fetched under utm-tagged, fragment-bearing,
case-varying aliases), and weight/cap corpora per registrable domain.
The reference has no URL layer (its ids are Mapillary image ids); this
family is engine addendum like the dedup suite.

Everything here is regex/string Column algebra — no UDFs, no shuffle;
the operators that use these (url_dedup, domain_rollup in
operators/corpus.py) shuffle only on the md5 of the normalized URL or
on the domain string.

Public-suffix handling: the real PSL is a 10k-line living list (and
network-fetched); the engine pins the handful of two-label suffixes
that dominate web corpora and falls back to the standard last-two-
labels rule. The list is a module constant so a deployment can extend
it; the DuckDB twin in tests/oracle.py restates the same list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# pinned two-label public suffixes (extend per deployment)
TWO_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.nz", "co.za",
)

# tracking params stripped by normalize_url (anchored full-key match)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|ref)="


def host_col(url_col) -> Column:
    """Lowercased host of a URL (authority up to the first /, ?, or #,
    userinfo and port stripped)."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    host = F.regexp_extract(u, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    host = F.element_at(F.split(host, "@"), -1)  # strip userinfo
    host = F.element_at(F.split(host, ":"), 1)  # strip port
    return F.lower(host)


def registrable_domain_col(url_col) -> Column:
    """Registrable domain of a URL's host: last TWO labels, or last
    THREE when the last two form a pinned public suffix (co.uk etc.).
    Hosts with fewer labels (localhost, bare TLD) pass through whole."""
    from .hof import let_col

    def _reg(parts):
        n = F.size(parts)
        last2 = F.concat_ws(".", F.slice(parts, -2, 2))
        is_2lbl = last2.isin(*TWO_LABEL_SUFFIXES)
        take = F.when(is_2lbl & (n >= 3), F.lit(3)).otherwise(F.lit(2))
        return F.when(
            n <= take, F.concat_ws(".", parts)
        ).otherwise(F.concat_ws(".", F.slice(parts, -take, 3)))

    def _outer(h):
        # NULL url or no parseable host (scheme-less/relative URL) ->
        # NULL domain (concat_ws would swallow the NULL into "")
        return F.when(
            h.isNull() | (h == ""), F.lit(None).cast("string")
        ).otherwise(let_col(F.split(h, r"\."), _reg))

    return let_col(host_col(url_col), _outer)


def normalize_url_col(url_col) -> Column:
    """Canonical URL for alias-collapse dedup:

    - scheme and host lowercased; userinfo and default port dropped
      entirely (any ``:port`` is dropped — corpora fetch on default
      ports; a pipeline that must distinguish ports dedups raw URLs)
    - fragment (``#...``) dropped
    - tracking query params dropped (utm_*, fbclid, gclid, msclkid,
      mc_eid, ref); surviving params SORTED for order-independence;
      an emptied query drops its ``?``
    - trailing ``/`` dropped from a non-root path
    - URLs with no parseable ``scheme://host`` (relative paths,
      scheme-less hosts, mailto:) -> NULL: without a host there is no
      alias evidence, and collapsing every malformed URL onto the
      shared empty-extract string ``'://'`` would silently dedup
      unrelated docs (url_dedup keeps all NULL-normalized rows)

    Pure codegen: regex extracts + one array_sort over the query
    params. NULL url -> NULL."""
    from .hof import let_col

    u = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    raw_path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = let_col(
        raw_path,
        lambda p: F.when(
            (F.length(p) > 1) & p.endswith("/"),
            p.substr(F.lit(1), F.length(p) - 1),
        ).otherwise(p),
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept_params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & (F.regexp_extract(p, TRACKING_PARAM_RE, 0) == ""),
    )
    # let-bind: the sorted-param join is referenced twice (guard + use)
    qpart = let_col(
        F.array_join(F.array_sort(kept_params), "&"),
        lambda q: F.when(
            F.length(q) > 0, F.concat(F.lit("?"), q)
        ).otherwise(F.lit("")),
    )
    return let_col(
        host_col(url_col),
        lambda h: F.when(
            u.isNull() | (h == ""), F.lit(None).cast("string")
        ).otherwise(F.concat(scheme, F.lit("://"), h, path, qpart)),
    )
