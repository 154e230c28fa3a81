"""Text-analysis expressions: tokenization, shingling, quality stats,
language-ID, fingerprinting.

All pure Column expressions (``pyspark.sql.functions``) so they run
inside whole-stage codegen and scale linearly with no Python boundary —
at 100 TB the per-doc cost is what dominates, not the shuffle.

Reference parity: the reference has no text operators (SURVEY.md §2.6);
these are the north-star LLM-pipeline extensions over ``documents``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..rounding import dround

#: Tiny multilingual marker lexicons for the heuristic language ID.
#: Deterministic and SQL-portable (the oracle uses the same lists).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "los", "las", "y"),
    "zh": ("的", "是", "了", "在"),
}

#: Stopwords for the quality score (subset of en markers — the synthetic
#: corpus vocabulary is English-ish regardless of the ``lang`` tag).
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "in", "to")


def normalized(col: Column) -> Column:
    """Lowercased, trimmed, whitespace-collapsed text."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def words(col: Column) -> Column:
    """Array of word tokens of normalized text ('' input → empty array).

    Splits directly on ``\\s+`` instead of ``normalized()`` + split on
    a literal space: one regex pass over the text instead of two, with
    identical output (same Java ``\\s`` class in both forms; ``trim``
    strips the leading/trailing run either way) — ~6% off the minhash
    signature build, which tokenizes every document.
    """
    n = F.trim(F.lower(col))
    return F.when(n == "", F.array().cast("array<string>")).otherwise(F.split(n, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(words(col))


def word_shingles(col: Column, k: int) -> Column:
    """Array of k-word shingles (space-joined); empty if < k tokens.

    One ``transform`` over ``sequence(1, n-k+1)`` with k ``element_at``
    reads per output shingle. Two evaluation traps, both measured:

    - The word array is let-bound through a 1-element ``transform``
      lambda: the body references it k times per element, and outside
      whole-stage codegen (``Generate``, i.e. every
      ``explode(word_shingles(...))`` call site) each naked reference
      would re-run the regex+split over the full text — measured 5× the
      scan cost at k=3. A lambda variable is evaluated once however
      many times the body reads it. (The round-1 form that indexed
      ``words()`` directly per element was 24× slower for this reason.)
    - The previous k-1-pass ``zip_with`` chain allocated an
      intermediate array per pass; the single-pass ``sequence`` form
      is ~15% faster end-to-end on the documents corpus (round 4).

    ``sequence(1, x)`` DESCENDS when x < 1, so the short-doc branch is
    guarded by an explicit ``when`` rather than an empty sequence.
    """

    def shingles_of(w: Column) -> Column:
        n = F.size(w) - F.lit(k - 1)
        return F.when(
            n >= 1,
            F.transform(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: F.concat_ws(" ", *[F.element_at(w, i + j) for j in range(k)]),
            ),
        ).otherwise(F.array().cast("array<string>"))

    # The coalesce is semantically a no-op (element_at(.., 1) of a
    # 1-element array is never null) but flips the expression's
    # nullability to false — without it, InferFiltersFromConstraints
    # materializes `isnotnull(<this whole tree>)` under every
    # `explode(word_shingles(...))` call site, re-running the full
    # shingle construction once per row just to null-check it
    # (measured: the round-10 decontamination plan evaluated the tree
    # 3× per doc — projection + inferred isnotnull + a pushed-down
    # size() filter — and the duplicate passes dominated the query).
    return F.coalesce(
        F.element_at(F.transform(F.array(words(col)), shingles_of), 1),
        F.array().cast("array<string>"),
    )


def char_ngrams(col: Column, n: int) -> Column:
    """Array of character n-grams of the normalized text.

    NB: the per-element ``substring(s, i, n)`` lambda re-evaluates
    ``normalized()`` per element (see word_shingles) — fine for the
    short strings this helper targets; materialize ``s`` as a column
    first if you ever put it on a hot path.
    """
    s = normalized(col)
    return F.when(
        F.length(s) >= n,
        F.transform(F.sequence(F.lit(1), F.length(s) - (n - 1)), lambda i: F.substring(s, i, n)),
    ).otherwise(F.array().cast("array<string>"))


def stopword_ratio(col: Column) -> Column:
    w = words(col)
    stop = F.size(F.filter(w, lambda t: t.isin(*STOPWORDS)))
    return F.when(F.size(w) > 0, stop.cast("double") / F.size(w)).otherwise(F.lit(0.0))


def avg_token_len(col: Column) -> Column:
    w = words(col)
    total = F.aggregate(w, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(w) > 0, total.cast("double") / F.size(w)).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]:
    rewards mid-length docs, mid-range stopword density, and plausible
    token lengths. The exact formula is mirrored in the DuckDB oracle.
    """
    n_tok = token_count(col).cast("double")
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    stop = stopword_ratio(col)
    stop_score = F.lit(1.0) - F.least(F.abs(stop - F.lit(0.1)), F.lit(1.0))
    atl = avg_token_len(col)
    atl_score = F.when((atl >= 2.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return dround((len_score + stop_score + atl_score) / F.lit(3.0), 4)


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language marker-hit counts."""
    w = words(col)
    return {
        lang: F.size(F.filter(w, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_lang(col: Column) -> Column:
    """argmax of marker counts with fixed precedence order (en, fr, de,
    es, zh); 'und' when no marker hits at all. Ties resolve to the first
    language in precedence order — mirrored exactly in the oracle SQL.
    """
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # Build the when-chain in reverse so earlier langs win ties.
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: Column, k: int = 4) -> Column:
    """Winnowing-style document fingerprint: the minimum md5 over all
    k-word shingles (falls back to md5 of the whole normalized text for
    short docs). Equal fingerprints → near-dup candidates.
    """
    sh = word_shingles(col, k)
    return F.when(
        F.size(sh) > 0,
        F.array_min(F.transform(sh, F.md5)),
    ).otherwise(F.md5(normalized(col)))


#: PII patterns, shared verbatim with the DuckDB oracle. Restricted to
#: the regex subset Java (Spark) and RE2 (DuckDB) agree on: character
#: classes, counted repeats, alternation-free literals — no lookaround,
#: no backrefs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://\S+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("number", r"[0-9]{7,}", "<NUM>"),
)


def redact_pii(col: Column) -> Column:
    """Redact URLs, emails, then long digit runs (training-data
    scrubbing). Order matters: a URL may contain an email-shaped or
    digit-run substring, so it is replaced first."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-category PII match counts (same patterns as redact_pii);
    counted against the SAME progressively-redacted text the replace
    chain sees, so counts always equal replacements made."""
    counts: dict[str, Column] = {}
    cur = col
    for name, pattern, token in PII_PATTERNS:
        counts[name] = F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, token)
    return counts


def rolling_min_hash(
    col: Column, k: int = 16, base: int = 131, mod: int = 1_000_000_007
) -> Column:
    """Minimum Rabin-Karp hash over all ``k``-char windows of the
    normalized text — a TRUE rolling computation: the first window is
    summed directly, every later window updates in O(1) via
    ``h' = (h - c_out·B^(k-1))·B + c_in (mod M)``, so a document costs
    O(L) multiply-adds, not O(k·L).

    NULL for empty text; a positional weighted sum for docs shorter
    than ``k`` (mirrored by the oracle SQL in queries/textanalysis.py).
    """
    # Every fold below iterates over a MATERIALIZED array child — never
    # index back into an expression from inside a lambda (higher-order
    # lambdas re-evaluate captured expressions per element; that trap
    # turned word_shingles O(L²), see its docstring).
    powers = [pow(base, k - 1 - j, mod) for j in range(k)]
    p_top = powers[0]
    s = normalized(col)
    # split('') yields one element per code point in O(L); the earlier
    # transform(sequence, j -> substr(s, j, 1)) form paid an O(j) UTF-8
    # seek PER POSITION — O(L²) per document, 20× slower on real docs
    codes = F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long"))
    powers_arr = F.array(*[F.lit(p).cast("long") for p in powers])

    first = (
        F.aggregate(
            F.zip_with(F.slice(codes, 1, k), powers_arr, lambda cc, p: cc * p),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        % mod
    )
    n_steps = F.greatest(F.length(s) - k, F.lit(0))
    steps = F.zip_with(
        F.slice(codes, k + 1, n_steps),  # incoming char per roll
        F.slice(codes, 1, n_steps),  # outgoing char per roll
        lambda cin, cout: F.struct(cin.alias("cin"), cout.alias("cout")),
    )
    acc0 = F.struct(first.alias("h"), first.alias("mn"))

    def step(acc, p):
        h2 = F.pmod((acc["h"] - p["cout"] * F.lit(p_top)) * base + p["cin"], F.lit(mod))
        return F.struct(h2.alias("h"), F.least(acc["mn"], h2).alias("mn"))

    rolled = F.aggregate(steps, acc0, step, lambda acc: acc["mn"])
    short_fb = (
        F.aggregate(
            F.zip_with(
                codes,
                F.transform(F.sequence(F.lit(1), F.length(s)), lambda j: (1 + F.pmod(j, F.lit(7))).cast("long")),
                lambda cc, w: cc * w,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        % mod
    )
    return (
        F.when(F.length(s) == 0, F.lit(None).cast("long"))
        .when(F.length(s) < k, short_fb)
        .otherwise(rolled)
    )
