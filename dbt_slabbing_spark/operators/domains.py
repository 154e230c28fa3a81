"""Domain/URL-level corpus curation: blocklist filtering and per-domain
caps — the C4 / RefinedWeb curation stage between raw crawl and
document-level quality rules.

Why domain-level ops are their own tier (and not just another filter):
- C4 (Raffel et al. 2020) drops documents from a ~badwords domain
  blocklist BEFORE any text rule runs — cheapest-first, and the list is
  keyed on the registrable domain, not the full URL;
- RefinedWeb (Penedo et al. 2023, §3.1) applies a 4.6M-entry domain
  blocklist plus per-domain share accounting so no single site dominates
  the corpus — the cap is what stops a 100 TB crawl from being 30%
  template-generated pages of one host.

Scale shapes (each documented on its function):
- blocklist: a LEFT ANTI equi-join on the domain key. In production the
  list is millions of rows — broadcast if it fits executor memory,
  shuffle-join otherwise; both are the same declared plan, AQE picks.
- per-domain count cap: rank-within-domain ≤ N. Spark rewrites the
  row_number filter into WindowGroupLimit, which prunes to N rows per
  domain BEFORE the window shuffle (partial limit map-side) — the
  reason to cap by rank filter rather than a join against per-domain
  counts.
- per-domain token/char budget: running sum per domain ≤ budget via
  operators/ordering.py::grouped_prefix_sum — NO per-group global
  window (a handful of mega-domains would each become one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .ordering import grouped_prefix_sum


def url_domain(url: Column) -> Column:
    """Registrable-host key of a URL: parsed host, lowercased, leading
    ``www.`` stripped — the keying step C4/RefinedWeb blocklists use.
    ``parse_url`` is a JVM built-in (codegen, no UDF); NULL/invalid
    URLs key to NULL (``try_parse_url`` — plain ``parse_url`` THROWS on
    malformed input under ANSI mode, and a crawl always has malformed
    URLs; callers decide whether NULL-domain rows survive).

    The synthetic `documents` table carries a pre-keyed ``source``
    column instead of URLs, so the registry gate keys on that directly;
    this function is the production entry point and is pinned by its
    own unit test.
    """
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    return F.when(host.startswith("www."), F.substring(host, 5, 2**30)).otherwise(host)


def blocklist_filter(
    docs: DataFrame, domain_col: str, blocklist: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Drop rows whose domain appears in ``blocklist`` (one ``domain``
    column) via LEFT ANTI join. ``broadcast=True`` for list sizes that
    fit executor memory (RefinedWeb's 4.6M domains ≈ ~200 MB — fits);
    at bigger list sizes leave it to the optimizer (shuffle join on the
    domain key)."""
    bl = blocklist.select(F.col("domain").alias("_bl_domain")).distinct()
    if broadcast:
        bl = F.broadcast(bl)
    return docs.join(bl, docs[domain_col] == bl["_bl_domain"], "left_anti")


def cap_docs_per_domain(
    docs: DataFrame, domain_col: str, cap: int, order_exprs: list[Column]
) -> DataFrame:
    """Keep at most ``cap`` docs per domain, the first ``cap`` in
    ``order_exprs`` order (pass a quality-descending key + unique
    tiebreaker). row_number ≤ cap compiles to WindowGroupLimit: each
    map task pre-prunes to ``cap`` rows per domain before the shuffle,
    so a mega-domain costs the exchange ``cap`` rows, not its corpus
    share."""
    w = Window.partitionBy(domain_col).orderBy(*order_exprs)
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cap)
        .drop("_rk")
    )


def cap_chars_per_domain(
    docs: DataFrame,
    domain_col: str,
    budget: int,
    weight_col: str,
    order_exprs: list[Column],
) -> DataFrame:
    """Keep the prefix of each domain (in ``order_exprs`` order) whose
    cumulative ``weight_col`` stays ≤ ``budget`` — the token-budget
    variant of the cap (weigh by a token count column to budget
    tokens). Runs as the two-pass grouped prefix sum: every stage
    parallel, no per-domain single-task window."""
    cum = grouped_prefix_sum(
        docs, [domain_col], order_exprs, weight_col, out_col="_cum"
    )
    return cum.filter(F.col("_cum") <= budget).drop("_cum")
