"""URL canonicalization + URL-level dedup.

Web-scale corpora dedup by canonical URL before any content pass: it
is the cheapest dedup signal (no text read) and removes the bulk of
crawl re-fetches. ``canonical_url`` is a PURE COLUMN EXPRESSION (zero
shuffles, zero Python) implementing the conventional normalization:

- lowercase scheme and host;
- drop the fragment;
- drop default ports (``:80`` for http, ``:443`` for https);
- strip one trailing slash from a non-root path;
- drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), sort the survivors for order-independence, drop the ``?``
  when none survive.

Every step uses engine-portable string/array functions (split_part,
array_sort, filter/array_join) so a DuckDB oracle replays the
canonical string byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..session import ansi_guard

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = ("fbclid", "gclid", "ref")


@ansi_guard("URL operators")
def canonical_url(col: Column) -> Column:
    base = F.split_part(col, F.lit("#"), F.lit(1))
    main = F.split_part(base, F.lit("?"), F.lit(1))
    query = F.split_part(base, F.lit("?"), F.lit(2))
    scheme = F.lower(F.split_part(main, F.lit("://"), F.lit(1)))
    hostpath = F.split_part(main, F.lit("://"), F.lit(2))
    hostport = F.lower(F.split_part(hostpath, F.lit("/"), F.lit(1)))
    # path = everything from the first '/' (empty when none)
    slash = F.instr(hostpath, "/")
    path = F.when(slash > 0, F.substring(hostpath, slash,
                                         F.length(hostpath))).otherwise(F.lit(""))
    host = F.when((scheme == "http") & hostport.endswith(":80"),
                  F.substring(hostport, 1, F.length(hostport) - 3)) \
        .when((scheme == "https") & hostport.endswith(":443"),
              F.substring(hostport, 1, F.length(hostport) - 4)) \
        .otherwise(hostport)
    path = F.when((F.length(path) > 1) & path.endswith("/"),
                  F.substring(path, 1, F.length(path) - 1)).otherwise(path)

    def keep(p: Column) -> Column:
        name = F.split_part(p, F.lit("="), F.lit(1))
        bad = name.isin(*_TRACKING_EXACT)
        for pre in _TRACKING_PREFIXES:
            bad = bad | name.startswith(pre)
        return ~bad

    params = F.array_sort(F.filter(F.split(query, "&"), keep))
    qs = F.array_join(params, "&")
    tail = F.when((query == "") | (qs == ""), F.lit("")) \
        .otherwise(F.concat(F.lit("?"), qs))
    return F.concat(scheme, F.lit("://"), host, path, tail)


@ansi_guard("URL operators")
def url_dedup(docs: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """One row per canonical URL: the keeper (min id — deterministic,
    layout-independent) plus the duplicate count. One hash exchange on
    the canonical string; at crawl scale this runs BEFORE any content
    op, so the text column never shuffles."""
    return (docs.withColumn("canonical", canonical_url(F.col(url_col)))
            .groupBy("canonical")
            .agg(F.min(F.col(id_col)).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_urls")))
