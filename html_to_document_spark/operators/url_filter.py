"""URL/domain filtering for crawl ingestion (the stage between a WARC
scan and extraction: drop blocklisted hosts before paying for parsing).

All JVM-side: host extraction is Spark's built-in ``parse_url``;
subdomain matching is an EQUI-join on exploded host SUFFIXES
(``a.b.example.com -> [a.b.example.com, b.example.com, example.com,
com]``), so a blocklist entry matches every subdomain through hash
joins — never an ``endswith`` theta-join (BroadcastNestedLoop,
O(rows x blocklist) compares).

100 TB shape: the suffix match runs on the corpus's DISTINCT HOST SET,
not its rows — hosts are orders of magnitude fewer than pages, so the
expensive semantics (explode + semi-join) touch a tiny frame, and the
result (hosts to drop) is broadcast back as a map-side anti-join on
host equality. The corpus itself is scanned once and never shuffled;
the only shuffle in the whole operator is the host ``distinct()``
(narrow: one string column).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import Column, DataFrame


def host_col(url_col: "Column | str") -> "Column":
    """Lower-cased host of a URL (codegen'd try_parse_url — a crawl
    corpus always contains malformed URLs; they yield NULL, never
    fail the job)."""
    from pyspark.sql import functions as F

    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.try_parse_url(c, F.lit("HOST")))


def host_suffixes(host: "Column") -> "Column":
    """All dot-suffixes of a host as an array, e.g. ``a.b.example.com
    -> [a.b.example.com, b.example.com, example.com, com]`` (empty
    array for null/empty hosts)."""
    from pyspark.sql import functions as F

    def suffixes(hb):
        labels = F.split(hb, r"\.")
        k = F.size(labels)
        return F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.concat_ws(".", F.slice(labels, i, k)),
        )

    return F.when(
        host.isNull() | (host == ""), F.array().cast("array<string>")
    ).otherwise(
        # one-element-array transform = let-binding (split runs once)
        F.flatten(F.transform(F.array(host), suffixes))
    )


def blocked_hosts(
    df: "DataFrame",
    blocklist: "DataFrame",
    url_col: str = "url",
    domain_col: str = "domain",
) -> "DataFrame":
    """The corpus's distinct hosts that equal a blocklisted domain or
    are a subdomain of one — a one-column ``(host)`` frame, small by
    construction (distinct hosts << rows)."""
    from pyspark.sql import functions as F

    bl = F.broadcast(
        blocklist.select(
            F.lower(F.col(domain_col)).alias("_bl_domain")
        ).distinct()
    )
    hosts = (
        df.select(host_col(url_col).alias("host"))
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
        .distinct()
    )
    return (
        hosts.select("host", F.explode(host_suffixes(F.col("host"))).alias("_sfx"))
        .join(bl, F.col("_sfx") == F.col("_bl_domain"), "left_semi")
        .select("host")
        .distinct()
    )


def filter_blocked_domains(
    df: "DataFrame",
    blocklist: "DataFrame",
    url_col: str = "url",
    domain_col: str = "domain",
) -> "DataFrame":
    """Drop rows whose URL host equals a blocklisted domain or is a
    subdomain of one. ``blocklist`` is a one-column frame of bare
    domains (``example.com``). Keeps the input schema; the corpus is
    never shuffled (broadcast anti-join on host equality)."""
    from pyspark.sql import functions as F

    bad = F.broadcast(blocked_hosts(df, blocklist, url_col, domain_col))
    return df.join(
        bad, host_col(url_col) == bad["host"], "left_anti"
    )


def flag_blocked_domains(
    df: "DataFrame",
    blocklist: "DataFrame",
    url_col: str = "url",
    domain_col: str = "domain",
) -> "DataFrame":
    """Non-dropping variant: adds a boolean ``blocked`` column (audit /
    stats passes). Same broadcast host-set shape, via a map-side left
    join + null check."""
    from pyspark.sql import functions as F

    bad = F.broadcast(
        blocked_hosts(df, blocklist, url_col, domain_col).withColumn(
            "_hit", F.lit(True)
        )
    )
    out = df.join(bad, host_col(url_col) == bad["host"], "left")
    return out.select(
        *df.columns, F.coalesce("_hit", F.lit(False)).alias("blocked")
    )


MAX_HOT_DOMAINS = 1_000_000  # refuse a hot set too big to broadcast


def domain_share_flags(
    df: "DataFrame",
    url_col: str = "url",
    id_col: str = "doc_id",
    max_docs: int = 10_000,
    selector: str = "hash",
    seed: int = 0,
) -> "DataFrame":
    """Per-domain share capping (the Dolma/RefinedWeb corpus-balance
    rule: no single host may dominate the corpus): adds a boolean
    ``keep_domain_capped`` — true for every document of a host with at
    most ``max_docs`` documents, and for a selected subset of the rest.
    Rows with a NULL/unparsable host are never capped (they are not a
    domain). Filter on the flag to apply the cap.

    ``selector`` picks the survivors of an over-cap host:

    - ``"hash"`` (default, the 100 TB path): keep a document iff
      ``pmod(xxhash64(id, seed), 2^20) < 2^20 * max_docs/host_count``
      — a stateless seeded projection, unbiased and deterministic
      under any partitioning. Survivor count is Binomial(n, cap/n),
      i.e. ≈``max_docs`` not exactly; ZERO corpus shuffle: the only
      exchange is the host-count partial agg (map-side combinable,
      one short row per distinct host), and the over-cap hosts come
      back as a broadcast (host, count) map bounded by
      ``MAX_HOT_DOMAINS``.
    - ``"min_id"`` (exact/audit mode): keep exactly the ``max_docs``
      smallest ids of each over-cap host — SQL-recomputable, used by
      the oracle gate. Costs more: the over-cap hosts' (id, host)
      pairs (two short columns — never the payload) shuffle through a
      per-host row_number window, and the surviving flag joins back
      id-keyed. The window funnels each hot host into one task — the
      same ultra-hot caveat as paragraph dedup; at corpus scale prefer
      ``"hash"``.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    if selector not in ("hash", "min_id"):
        raise ValueError(f"unknown selector: {selector!r}")

    host = host_col(url_col)
    counts = (
        df.select(host.alias("host"))
        .filter(F.col("host").isNotNull() & (F.col("host") != ""))
        .groupBy("host")
        .count()
    )
    hot = counts.filter(F.col("count") > max_docs)
    n_hot = hot.limit(MAX_HOT_DOMAINS + 1).count()
    if n_hot > MAX_HOT_DOMAINS:
        raise ValueError(
            f"over-cap host set exceeds MAX_HOT_DOMAINS "
            f"({MAX_HOT_DOMAINS}); raise max_docs or pre-split the "
            f"corpus — a hot set this size cannot broadcast"
        )

    if selector == "hash":
        m = 1 << 20
        hot_rates = F.broadcast(
            hot.select(
                "host",
                F.floor(F.lit(m) * F.lit(max_docs) / F.col("count"))
                .alias("_rate"),
            )
        )
        joined = df.join(
            hot_rates, host == hot_rates["host"], "left"
        ).drop(hot_rates["host"])
        return joined.withColumn(
            "keep_domain_capped",
            F.col("_rate").isNull()
            | (
                F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(m))
                < F.col("_rate")
            ),
        ).drop("_rate")

    # min_id: window only the over-cap hosts' (id, host) projection
    hot_hosts = F.broadcast(hot.select("host"))
    hot_rows = (
        df.select(F.col(id_col).alias("_cid"), host.alias("_chost"))
        .join(hot_hosts, F.col("_chost") == hot_hosts["host"], "left_semi")
    )
    w = Window.partitionBy("_chost").orderBy("_cid")
    dropped = (
        hot_rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > max_docs)
        .select("_cid")
    )
    out = df.join(dropped, df[id_col] == dropped["_cid"], "left")
    return out.select(
        *df.columns, F.col("_cid").isNull().alias("keep_domain_capped")
    )


def cap_domain_share(
    df: "DataFrame",
    url_col: str = "url",
    id_col: str = "doc_id",
    max_docs: int = 10_000,
    selector: str = "hash",
    seed: int = 0,
) -> "DataFrame":
    """Dropping variant of :func:`domain_share_flags`: returns the
    corpus with every over-cap host reduced to (≈ or exactly, per
    ``selector``) ``max_docs`` documents, input schema preserved."""
    from pyspark.sql import functions as F

    flagged = domain_share_flags(
        df, url_col, id_col, max_docs, selector, seed
    )
    return flagged.filter(F.col("keep_domain_capped")).drop(
        "keep_domain_capped"
    )


# tracking parameters every crawl normalizer strips (the public canon:
# UTM campaign tags plus the big ad-click ids); utm_* matches by prefix
TRACKING_PARAM_PREFIXES = ("utm_",)
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid", "ref")


def normalize_url_col(url_col: "Column | str") -> "Column":
    """Canonical form of a URL for URL-level dedup (crawls re-fetch the
    same page under case-varied hosts, tracking-tagged queries and
    fragment anchors; URL dedup BEFORE fetch/processing is the
    cheapest dedup a pipeline runs):

    - scheme and host lowercased;
    - fragment dropped;
    - tracking params dropped (``utm_*`` by prefix plus the click-id
      set), surviving params SORTED so param order is canonical;
    - trailing ``/`` stripped from non-root paths, empty path becomes
      ``/``.

    Pure JVM Column expression (try_parse_url + array HOFs — zero
    Python, zero shuffle); NULL/unparsable URLs yield NULL. Pair with
    ``dedup.exact_dedup(df, text_col="norm_url")`` for URL-level
    dedup at corpus scale (the normalized string, not the raw URL, is
    what hashes)."""
    from pyspark.sql import functions as F

    c = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.try_parse_url(c, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(c, F.lit("HOST")))
    raw_path = F.try_parse_url(c, F.lit("PATH"))
    stripped = F.regexp_replace(raw_path, "/$", "")
    path = F.when(
        raw_path.isNull() | (stripped == ""), F.lit("/")
    ).otherwise(stripped)
    query = F.try_parse_url(c, F.lit("QUERY"))

    def is_tracking(p):
        name = F.split(p, "=", 2)[0]
        cond = F.lit(False)
        for pre in TRACKING_PARAM_PREFIXES:
            cond = cond | name.startswith(pre)
        return cond | name.isin(*TRACKING_PARAMS)

    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~is_tracking(p),
        )
    )
    qpart = F.when(
        query.isNull() | (F.size(params) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(params, "&")))
    return F.when(
        scheme.isNull() | host.isNull() | (host == ""),
        F.lit(None).cast("string"),
    ).otherwise(F.concat(scheme, F.lit("://"), host, path, qpart))


def resolve_href_col(
    base_col: "Column | str", href_col: "Column | str"
) -> "Column":
    """Resolve an ``href`` as written in the page against the page's
    own URL -> absolute URL (simplified RFC 3986 reference
    resolution). Most links on real pages are relative, so the raw
    link corpus from :func:`link_graph.harvest_links` is unusable for
    URL-level work (anchor profiles, frontier seeding, URL dedup)
    until each href is resolved; host-level edges additionally
    recover protocol-relative ``//cdn.example/...`` links.

    Rules, pure JVM Column expression (same zero-Python/zero-shuffle
    shape as :func:`normalize_url_col`):

    - a scheme prefix (``http:``, ``mailto:``, ``javascript:``…)
      passes through verbatim;
    - ``//authority/...`` takes the base scheme;
    - ``/rooted`` takes the base origin;
    - ``""`` and ``#frag`` resolve to the base sans fragment (a link
      to the page itself);
    - ``?query`` keeps the base PATH and replaces its query (RFC 3986
      §5.3 — pagination links are overwhelmingly written this way);
    - anything else joins the base URL's directory; ``./`` segments
      collapse, up to 4 ``segment/../`` pairs fold (a lookbehind
      keeps the fold from ever consuming the ``//authority`` — Java
      regex only; the oracle states construction truth, it does not
      replay these patterns), and ``../`` runs that climb past the
      path root clamp AT the root as browsers do — a dot-leading
      segment before ``../`` is the one documented unfolded residue.

    NULL/unparsable base or NULL href yields NULL.
    """
    from pyspark.sql import functions as F

    base = F.col(base_col) if isinstance(base_col, str) else base_col
    href = F.trim(F.col(href_col) if isinstance(href_col, str) else href_col)
    scheme = F.lower(F.try_parse_url(base, F.lit("PROTOCOL")))
    authority = F.lower(F.try_parse_url(base, F.lit("AUTHORITY")))
    origin = F.concat(scheme, F.lit("://"), authority)
    path = F.coalesce(F.try_parse_url(base, F.lit("PATH")), F.lit(""))
    # directory of the base path: drop the last segment; empty -> "/"
    dirp = F.regexp_replace(path, "[^/]*$", "")
    dirp = F.when(dirp == "", F.lit("/")).otherwise(dirp)
    defrag = F.regexp_replace(base, "#.*$", "")

    base_bad = scheme.isNull() | authority.isNull() | (authority == "")
    null_s = F.lit(None).cast("string")
    resolved = (
        # an href with its own scheme never needs the base — it
        # survives even under an unparsable base URL
        F.when(href.rlike("^[a-zA-Z][a-zA-Z0-9+.\\-]*:"), href)
        .when(base_bad, null_s)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when((href == "") | href.startswith("#"), defrag)
        .when(
            href.startswith("?"),
            F.concat(
                origin,
                F.when(path == "", F.lit("/")).otherwise(path),
                href,
            ),
        )
        .when(href.startswith("/"), F.concat(origin, href))
        .otherwise(F.concat(origin, dirp, href))
    )
    # dot-segment normalization. Two passes for "/./" chains ("/./"
    # cannot occur inside the authority — it has no slash), four for
    # nested "a/../" folds; the (?<!/) lookbehind stops a fold whose
    # left segment is the AUTHORITY ("http://h/../x" must not become
    # "http://x" — the candidate there is preceded by the second "//"
    # slash, while a genuine path fold is always preceded by a path
    # character). Finally, "../" runs left at the root clamp to "/"
    # (RFC 3986's merge-and-remove behavior, what every browser does).
    for _ in range(2):
        resolved = F.regexp_replace(resolved, "/\\.(/|$)", "/")
    for _ in range(4):
        resolved = F.regexp_replace(
            resolved, "(?<!/)/[^/.][^/]*/\\.\\.(/|$)", "/"
        )
    resolved = F.regexp_replace(
        resolved,
        "^([a-zA-Z][a-zA-Z0-9+.\\-]*://[^/]*)(/\\.\\.)+(/|$)",
        "$1/",
    )
    return F.when(href.isNull(), null_s).otherwise(resolved)


def url_features(df: "DataFrame", url_col: str = "url") -> "DataFrame":
    """Append URL shape features — the spam/quality signals URL-level
    classifiers key on (RefinedWeb filters URLs before fetch; Dolma's
    URL heuristics and classic webspam features use exactly these):

    - ``url_host_depth`` — dot-separated host labels (deep subdomain
      chains are a spam-farm signature)
    - ``url_path_depth`` / ``url_path_len`` — non-empty path segments
      and raw path length (calendar/faceted-navigation traps run deep)
    - ``url_n_params`` — query parameters (session/tracking bloat)
    - ``url_has_fragment`` / ``url_is_https``
    - ``url_digit_ratio`` — digit fraction of the host, r4 (DGA hosts
      and IP-literal hosts score high)
    - ``url_host_hyphens`` — hyphen count in the host (keyword-stuffed
      domains)

    A pure JVM Column projection (try_parse_url + split/filter/regex):
    zero Python, zero shuffle. NULL/unparsable URLs yield NULL host
    features and 0 counts — never an error row."""
    from pyspark.sql import functions as F

    from html_to_document_spark.operators.text_analysis import r4

    u = F.col(url_col)
    host = host_col(u)
    path = F.try_parse_url(u, F.lit("PATH"))
    query = F.try_parse_url(u, F.lit("QUERY"))
    return df.withColumns(
        {
            "url_host_depth": F.size(F.split(host, "\\.")).cast("int"),
            "url_path_depth": F.size(
                F.filter(
                    F.split(F.coalesce(path, F.lit("")), "/"),
                    lambda x: x != "",
                )
            ).cast("int"),
            "url_path_len": F.length(F.coalesce(path, F.lit("")))
            .cast("int"),
            "url_n_params": F.size(
                F.filter(
                    F.split(F.coalesce(query, F.lit("")), "&"),
                    lambda x: x != "",
                )
            ).cast("int"),
            "url_has_fragment": F.try_parse_url(
                u, F.lit("REF")
            ).isNotNull(),
            "url_is_https": F.lower(
                F.try_parse_url(u, F.lit("PROTOCOL"))
            ) == "https",
            "url_digit_ratio": r4(
                F.length(F.regexp_replace(host, "[^0-9]", ""))
                / F.greatest(F.length(host), F.lit(1))
            ),
            "url_host_hyphens": (
                F.length(host)
                - F.length(F.regexp_replace(host, "-", ""))
            ).cast("int"),
        }
    )
