"""URL canonicalization + dedup for web-crawl-style corpus curation.

A crawl lake keys documents by URL; the same page arrives under
scheme/case/port variants, tracking-parameter decorations, fragments,
and trailing slashes. Canonicalizing before grouping is what makes
URL-level dedup (and per-domain rollups) meaningful.

Everything is regexp chains in the syntax subset shared by Java regex
(Spark) and RE2 (DuckDB) — no lookarounds, no backrefs — so the DuckDB
oracle applies the *identical* patterns (with its explicit 'g' flag
where Java's `replaceAll` is implicitly global). No UDFs: the whole
canonicalization stays inside whole-stage codegen, and the dedup is
one groupBy on the canonical string (digest-size shuffle rows at
scale if you pre-hash with xxhash64).

Canonical form:
- scheme and host lowercased (path/query case is significant, RFC 3986
  §6.2.2.1 lowercases only scheme+host);
- default ports :80/:443 stripped;
- fragment stripped;
- tracking parameters (utm_*, gclid, fbclid) stripped, with dangling
  '?'/'&' separators cleaned up;
- trailing slashes stripped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one URL split into (scheme)://(authority)(rest) — authority ends at
# the first '/', '?' or '#'; rest keeps everything except the fragment
URL_SPLIT_PATTERN = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^#]*)"
# anchored to a real '?'/'&' separator so 'xutm_source=...' or a
# 'utm_' substring inside another parameter's value is NOT stripped;
# the repetition group handles back-to-back tracking params in one
# match (a global replace that consumed the separator would otherwise
# skip every second one). Replacement keeps the captured separator.
TRACKING_PARAM_PATTERN = r"([?&])((utm_[a-z]+|gclid|fbclid)=[^&#]*&?)+"
TRACKING_PARAM_REPLACEMENT = "$1"
DEFAULT_PORT_PATTERN = r":(80|443)$"
DANGLING_SEP_PATTERN = r"[?&]$"
SLASH_BEFORE_QUERY_PATTERN = r"/+\?"
TRAILING_SLASH_PATTERN = r"/+$"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring). URLs not
    matching scheme://authority return NULL (regexp_extract yields ''
    for a failed match — mapped to NULL so malformed rows are
    explicit, not silently grouped under an empty canonical).

    Replace order is load-bearing: tracking-param strip can leave a
    dangling '?'/'&', whose removal can expose a trailing slash —
    strip tracking, then dangling separators, then empty path segments
    before '?', then trailing slashes."""
    scheme = F.regexp_extract(url, URL_SPLIT_PATTERN, 1)
    host = F.regexp_extract(url, URL_SPLIT_PATTERN, 2)
    rest = F.regexp_extract(url, URL_SPLIT_PATTERN, 3)
    host = F.regexp_replace(F.lower(host), DEFAULT_PORT_PATTERN, "")
    rest = F.regexp_replace(rest, TRACKING_PARAM_PATTERN, TRACKING_PARAM_REPLACEMENT)
    rest = F.regexp_replace(rest, DANGLING_SEP_PATTERN, "")
    rest = F.regexp_replace(rest, SLASH_BEFORE_QUERY_PATTERN, "?")
    rest = F.regexp_replace(rest, TRAILING_SLASH_PATTERN, "")
    out = F.concat(F.lower(scheme), F.lit("://"), host, rest)
    return F.when(scheme != "", out)


def synthesize_urls(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic raw-URL column derived from the id — the
    fixture-side stand-in for a crawl lake's URL field (same pattern
    as the multimodal synthesize_* helpers: the id arithmetic lets the
    DuckDB oracle re-derive every byte). Variants cycle through scheme
    case, host case, explicit default port, trailing slash, tracking
    parameters, and fragments, so canonicalization has real work to
    do; the small path keyspace (`id % 50`) forces genuine cross-doc
    collisions, so groups collapse multiple raw spellings.

    Output: id, url.
    """
    i = F.col(id_col)
    k = (i % 50).cast("string")
    scheme = F.when(i % 3 == 0, F.lit("HTTPS://")).otherwise(F.lit("http://"))
    host = F.when(i % 2 == 0, F.lit("www.EXAMPLE.com")).otherwise(
        F.lit("www.example.com")
    )
    port = F.when(i % 7 == 0, F.lit(":443")).otherwise(F.lit(""))
    path = F.concat(F.lit("/docs/"), k)
    trail = F.when(i % 2 == 0, F.lit("/")).otherwise(F.lit(""))
    query = (
        F.when(i % 4 == 0, F.concat(F.lit("?utm_source=feed&id="), k))
        .when(i % 4 == 1, F.concat(F.lit("?id="), k, F.lit("&utm_campaign=x")))
        .otherwise(F.lit(""))
    )
    frag = F.when(i % 5 == 0, F.lit("#sec")).otherwise(F.lit(""))
    url = F.concat(scheme, host, port, path, trail, query, frag)
    return df.select(F.col(id_col), url.alias("url"))


def normalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """Attach `canonical_url` alongside the raw column."""
    return df.withColumn("canonical_url", canonical_url(F.col(url_col)))


def url_dedup(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Group rows by canonical URL: representative = min id.

    Output: canonical_url, rep_id, dup_count, n_raw_variants (distinct
    raw spellings collapsed into the group). One shuffle keyed by the
    canonical string; malformed URLs (NULL canonical) are excluded —
    route them to a quarantine sink in a real pipeline.
    """
    canon = normalize_urls(df, url_col).where(F.col("canonical_url").isNotNull())
    return canon.groupBy("canonical_url").agg(
        F.min(id_col).alias("rep_id"),
        F.count("*").alias("dup_count"),
        F.count_distinct(F.col(url_col)).alias("n_raw_variants"),
    )


def registrable_domain(url: Column) -> Column:
    """Simplified registrable domain (eTLD+1 stand-in) of a URL: the
    last two dot-labels of the lowercased host, default ports
    stripped. Kept as the oracle-friendly regex form (pure RE2/Java
    shared subset); `registrable_domain_psl` is the production
    extractor — the two-label rule misgroups ccTLD registries like
    .co.uk into one giant pseudo-domain. NULL for malformed URLs,
    like `canonical_url`."""
    host = F.regexp_extract(url, URL_SPLIT_PATTERN, 2)
    host = F.regexp_replace(F.lower(host), DEFAULT_PORT_PATTERN, "")
    # last two labels: a.b.c.d -> c.d (regex stays in the RE2/Java
    # shared subset: anchored, no lookaround)
    dom = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(dom != "", dom)


def registrable_domain_psl(url: Column) -> Column:
    """Public-Suffix-List registrable domain (eTLD+1) of a URL — the
    production extractor (VERDICT r06 item 3): `shop.example.co.uk`
    groups under `example.co.uk`, not `co.uk`; `proj.github.io`
    stays its own domain (private-section suffix); wildcard and
    exception rules (`*.ck` / `!www.ck`) follow the spec. The bundled
    snapshot + matching algorithm live in `operators/psl.py`; the
    lookup is a map LITERAL against candidate label tails, so the
    whole extraction stays inside whole-stage codegen — no join, no
    shuffle, no Python. NULL for malformed URLs and for hosts that
    ARE a public suffix (quarantine lane, same contract as
    `canonical_url`)."""
    from . import psl

    host = F.regexp_extract(url, URL_SPLIT_PATTERN, 2)
    host = F.regexp_replace(F.lower(host), DEFAULT_PORT_PATTERN, "")
    return psl.registrable_domain_from_host(host)


def domain_cap(
    df: DataFrame, id_col: str, url_col: str, cap: int, psl: bool = True
) -> DataFrame:
    """FineWeb-style per-domain document budget: across the corpus,
    keep at most `cap` documents per registrable domain, chosen in
    deterministic ascending-id order (the crawl-order-stable rule —
    swap the order columns for a quality score to keep the best-k
    instead). The anti-dominance primitive at the DOMAIN level: one
    syndication farm must not flood its slice of the training mix.

    Scale shape: ONE domain-keyed window (row_number) over a single
    evaluation of the source — the same `cap_per_key` shape as the
    per-user event cap; no global order, hot domains cost O(their
    rows) with output bounded at cap. Malformed rows ride the same
    window pass under a SALTED null-replacement key (so the
    quarantine lane can't pile every malformed URL onto one reducer)
    and get their rank overwritten with the constant 0 — r07's
    separate union branch re-evaluated the scan + PSL joins twice.

    Output: id, domain, domain_rank (1-based within domain),
    is_kept (rank <= cap). Malformed URLs (NULL domain) are emitted
    with rank 0 / is_kept false so the caller can quarantine them.

    `psl=True` (default) groups by the Public-Suffix-List registrable
    domain (`registrable_domain_psl`) — the correct budget key:
    without it every `.co.uk` site shares ONE cap. `psl=False` keeps
    the two-label simplification (r06 behavior).
    """
    from pyspark.sql import Window

    if psl:
        from . import psl as psl_mod

        host = F.regexp_extract(F.col(url_col), URL_SPLIT_PATTERN, 2)
        host = F.regexp_replace(F.lower(host), DEFAULT_PORT_PATTERN, "")
        with_dom = psl_mod.attach_registrable_domain(
            df.select(F.col(id_col), F.col(url_col)), host, "domain"
        ).select(F.col(id_col), "domain")
    else:
        with_dom = df.select(
            F.col(id_col),
            registrable_domain(F.col(url_col)).alias("domain"),
        )
    # Hostnames can't contain NUL, so the salted quarantine keys can't
    # collide with a real domain; their ranks are discarded below.
    null_salt = F.concat(
        F.lit("\x00"), F.pmod(F.xxhash64(F.col(id_col)), F.lit(1024)).cast("string")
    )
    pkey = F.coalesce(F.col("domain"), null_salt)
    w = Window.partitionBy(pkey).orderBy(F.col(id_col).asc())
    rn = F.row_number().over(w)
    return with_dom.select(
        F.col(id_col),
        "domain",
        F.when(F.col("domain").isNull(), F.lit(0))
        .otherwise(rn)
        .cast("long")
        .alias("domain_rank"),
        (F.col("domain").isNotNull() & (rn <= cap)).alias("is_kept"),
    )


def synthesize_multihost_urls(df: DataFrame, id_col: str) -> DataFrame:
    """Multi-domain fixture twin of `synthesize_urls`: hosts cycle
    through 13 base domains with subdomain/case/port variants
    (id-derived, oracle-rederivable) so domain-level operators have
    real grouping work; id % 97 == 0 rows get a malformed URL (no
    scheme) to exercise the quarantine path.

    Since r07 the cycle exercises the Public-Suffix-List classes the
    two-label simplification mis-caps (VERDICT r06 item 3): two
    DISTINCT `.co.uk` registrables (the two-label rule merges them
    into one `co.uk` pseudo-domain and under-caps both), a `.com.au`
    registrable, a private-section suffix (`proj.github.io`), a
    wildcard registry (`*.ck`, where `b.ck` alone IS a public suffix
    -> quarantine, but `www.b.ck` registers), and the list's
    exception pair (`!www.ck` registers while `blog.ck`/`ck` are
    suffix-only -> quarantine).

    Output: id, url.
    """
    i = F.col(id_col)
    d = i % 13
    dom = (
        F.when(d == 7, F.lit("media.com.au"))
        .when(d == 8, F.lit("proj.github.io"))
        .when(d == 9, F.lit("corp.co.uk"))
        .when(d == 10, F.lit("press.co.uk"))
        .when(d == 11, F.lit("b.ck"))
        .when(d == 12, F.lit("ck"))
        .otherwise(F.concat(F.lit("site"), d.cast("string"), F.lit(".com")))
    )
    sub = (
        F.when(i % 3 == 0, F.lit("www."))
        .when(i % 3 == 1, F.lit("blog."))
        .otherwise(F.lit(""))
    )
    host = F.when(i % 2 == 0, F.upper(F.concat(sub, dom))).otherwise(
        F.concat(sub, dom)
    )
    port = F.when(i % 7 == 0, F.lit(":80")).otherwise(F.lit(""))
    path = F.concat(F.lit("/p/"), (i % 31).cast("string"))
    url = F.concat(F.lit("http://"), host, port, path)
    url = F.when(i % 97 == 0, F.lit("not a url")).otherwise(url)
    return df.select(F.col(id_col), url.alias("url"))
