"""Public Suffix List support for registrable-domain (eTLD+1)
extraction — the data + expression builder behind
`urls.registrable_domain_psl` (VERDICT r06 item 3).

The PSL (https://publicsuffix.org/list/ — Mozilla-maintained, MPL
2.0) is the authority on where the "registrable" part of a hostname
begins: `foo.co.uk` registers under `co.uk`, not `uk`, so a naive
last-two-labels rule lumps every `.co.uk` site into ONE domain and a
per-domain budget (`domain_cap`) silently under-caps entire
countries.

`PSL_SNAPSHOT` is a bundled, curated snapshot of the list's
MULTI-LABEL rules (ccTLD second-level registries, the wildcard and
exception rules, and widely-used private-section suffixes).
Single-label public suffixes (`com`, `org`, every plain TLD) never
need an entry: the PSL's implicit default rule `*` already makes the
rightmost label public, which is exactly what the extractor falls
back to. Swapping in the full upstream list is a data-only change:
replace this list with the file's rules (one per line, comments
stripped) — the algorithm below implements the complete matching
semantics.

Matching semantics implemented (the spec's algorithm):
- a rule matches when the host ends with the rule's labels; `*`
  matches exactly one label;
- the prevailing rule is the matching rule with the MOST labels,
  except that exception rules (leading `!`) prevail outright;
- an exception rule's public suffix is the rule minus its leading
  label;
- if nothing matches, the public suffix is the rightmost label;
- the registrable domain is the public suffix plus one preceding
  label — NULL when the host IS a public suffix (or has no extra
  label).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Rule kinds in the lookup map
_NORMAL = 1
_WILDCARD = 2  # stored under the rule's parent (the labels after `*.`)
_EXCEPTION = 3  # stored without the leading `!`

PSL_SNAPSHOT: list[str] = [
    # --- ICANN section: ccTLD second-level registries (curated) ---
    # United Kingdom
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    # Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    # New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "gen.nz", "geek.nz", "maori.nz", "iwi.nz",
    # South Africa
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    # India
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "res.in", "edu.in",
    "firm.in", "gen.in", "ind.in", "nic.in",
    # China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    # Mexico / Argentina / Colombia / Peru / Venezuela
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.co", "net.co", "org.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve",
    # Turkey
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr",
    # Korea
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    # Taiwan / Hong Kong / Singapore
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg",
    # Israel
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    # Thailand / Malaysia / Philippines / Vietnam / Indonesia
    "co.th", "in.th", "go.th", "ac.th", "or.th",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn",
    "co.id", "or.id", "go.id", "ac.id", "web.id", "my.id", "sch.id",
    # Pakistan / Egypt / Saudi Arabia / Nigeria / Kenya / Ghana
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "go.ke", "ac.ke", "ne.ke",
    "com.gh", "org.gh", "gov.gh", "edu.gh",
    # Russia / Ukraine / Poland (second-level registries)
    "com.ru", "net.ru", "org.ru",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    # Wildcard registries (every label under them is a registry) and
    # the canonical exception pair from the list itself
    "*.ck", "!www.ck",
    "*.bd", "*.np", "*.pg", "*.mm", "*.er", "*.fk",
    # --- Private section: widely-used multi-tenant platforms ---
    "github.io", "githubusercontent.com", "gitlab.io",
    "blogspot.com", "appspot.com", "herokuapp.com",
    "netlify.app", "vercel.app", "web.app", "firebaseapp.com",
    "azurewebsites.net", "cloudfront.net", "s3.amazonaws.com",
    "pages.dev", "workers.dev", "fly.dev", "glitch.me",
    "readthedocs.io", "surge.sh",
]


def parse_rules(rules: list[str]) -> dict[str, int]:
    """Lookup map: concrete suffix -> kind. Wildcard rules are stored
    under their parent labels (`*.ck` -> `ck`); exception rules drop
    the `!`. A suffix that is both someone's wildcard parent and a
    normal rule cannot happen in the PSL format (a rule line is one
    of the three kinds); duplicates raise."""
    m: dict[str, int] = {}

    def put(key: str, kind: int) -> None:
        if key in m and m[key] != kind:
            raise ValueError(f"conflicting PSL rules for {key!r}")
        m[key] = kind

    for r in rules:
        r = r.strip().lower()
        if not r:
            continue
        if r.startswith("!"):
            put(r[1:], _EXCEPTION)
        elif r.startswith("*."):
            put(r[2:], _WILDCARD)
        else:
            put(r, _NORMAL)
    return m


_RULES = parse_rules(PSL_SNAPSHOT)
# longest public suffix any rule can produce, in labels: normal /
# exception keys produce their own label count; a wildcard parent
# produces parent+1
MAX_SUFFIX_LABELS = max(
    len(k.split(".")) + (1 if kind == _WILDCARD else 0)
    for k, kind in _RULES.items()
)


def _rule_map() -> Column:
    """The snapshot as a map LITERAL — a broadcast-sized model
    artifact entering the plan exactly like ANN codebooks do, so the
    lookup is pure whole-stage-codegen expression work: no join, no
    shuffle, no Python."""
    pairs: list[Column] = []
    for k, kind in sorted(_RULES.items()):
        pairs.append(F.lit(k))
        pairs.append(F.lit(kind))
    return F.create_map(*pairs)


def registrable_domain_from_host(host: Column) -> Column:
    """PSL registrable domain (eTLD+1) of an already-lowercased,
    port-stripped hostname column. Pure Catalyst expressions: split
    into labels, look up each candidate tail (longest first) in the
    rule-map literal, resolve kind per the spec, then slice the
    public suffix plus one label. NULL when the host is itself a
    public suffix or has no extra label."""
    m = _rule_map()
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def tail(j: int) -> Column:
        return F.array_join(F.slice(labels, -j, j), ".")

    # prevailing rule, most-labels first; exceptions resolve at their
    # own length (they always out-label the wildcard they carve out).
    # Built as a fold from the default rule `*` (rightmost label is
    # public) so each longer length wraps the shorter ones.
    branches = []
    for j in range(MAX_SUFFIX_LABELS, 1, -1):
        kind_j = F.element_at(m, tail(j))
        wild_parent = F.element_at(m, tail(j - 1)) == F.lit(_WILDCARD)
        matched = (n >= j) & (
            kind_j.isNotNull() | F.coalesce(wild_parent, F.lit(False))
        )
        this_ps = F.when(
            kind_j == F.lit(_EXCEPTION), F.lit(j - 1)
        ).otherwise(F.lit(j))
        branches.append((matched, this_ps))
    ps_labels = F.lit(1)
    for matched, this_ps in reversed(branches):
        ps_labels = F.when(matched, this_ps).otherwise(ps_labels)
    reg_len = ps_labels + F.lit(1)
    dom = F.array_join(F.slice(labels, -reg_len, reg_len), ".")
    return F.when((host != "") & (n >= reg_len), dom)
