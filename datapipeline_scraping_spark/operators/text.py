"""Text-analysis operators (north-star surface over ``documents``):
token counting, quality scoring, language-ID heuristic, document
fingerprinting. All built-in expressions — per-row, shuffle-free,
codegen-friendly; safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenizer regex: runs of alphanumerics, or single
# non-alphanumeric-non-space marks. ASCII-explicit so Java (Spark) and
# RE2 (DuckDB) agree.
TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

# Tiny function-word list for the quality score (vocabulary of the
# synthetic corpus is English-ish).
STOPWORDS = ("the", "a", "of", "and", "in", "on", "to", "is")

# Marker tokens per language for the n-gram/keyword language-ID
# heuristic. Deterministic and cross-engine; tuned to the synthetic
# vocabulary (real deployments swap in char-trigram profiles).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "fast", "slow", "small", "big"),
    "es": ("data", "vector", "columna", "linea", "grande"),
    "de": ("und", "der", "die", "das", "gross"),
    "fr": ("le", "la", "les", "des", "petit"),
    "zh": ("zh1", "zh2", "zh3", "zh4", "zh5"),
}


def ws_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count_regex(text: Column | str, pattern: str = TOKEN_RE) -> Column:
    """Token count under the BPE-ish regex tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def n_tokens(text: Column | str) -> Column:
    return F.size(ws_tokens(text))


def n_unique_tokens(text: Column | str) -> Column:
    return F.size(F.array_distinct(ws_tokens(text)))


def stopword_count(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = ws_tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def quality_score(text: Column | str) -> Column:
    """Deterministic quality score in [0, 1]:

        min(1, n_tokens/50) * (0.25 + 0.75 * unique_ratio)
          * (1 - 0.5 * stopword_ratio)

    Length credit, repetition penalty, boilerplate penalty — the same
    shape as production quality filters (e.g. Gopher rules), kept
    SQL-expressible for oracle checking.

    Computed as ONE exact integer rational, then a single double
    division:

        min(nt,50) * (nt + 3*uniq) * (2*nt - sw)  /  (400 * nt^2)

    — algebraically identical to the float formula but bit-stable
    across engines (float chains land on .xxx5 rounding boundaries
    where Java's round() and C's round() disagree)."""
    nt = n_tokens(text).cast("long")
    uniq = n_unique_tokens(text).cast("long")
    sw = stopword_count(text).cast("long")
    numer = F.least(nt, F.lit(50)) * (nt + F.lit(3) * uniq) * (F.lit(2) * nt - sw)
    denom = F.lit(400) * nt * nt
    return numer / denom


def lang_id(text: Column | str) -> Column:
    """Keyword-overlap language-ID: argmax over per-language marker-hit
    counts, ties broken by language code order, 'und' when no marker
    hits at all."""
    toks = F.array_distinct(ws_tokens(text))
    scores = {}
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier language codes win ties
    for lang in sorted(scores, reverse=True):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Key-collapse fingerprint: md5 of the sorted distinct lowercase
    token set — whitespace/order/duplication-insensitive identity, the
    standard clustering key for near-identical records."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.array_sort(F.array_distinct(F.split(F.lower(F.trim(c)), r"\s+")))
    return F.md5(F.concat_ws(" ", toks))


def tfidf_topk(
    df,
    id_col: str,
    text_col: str,
    *,
    top: int = 5,
):
    """Per-document top-k terms by TF-IDF.

    IDF uses the BM25-style rational form
    ``(N - df + 0.5) / (df + 0.5)`` instead of a logarithm: the score is
    then built purely from IEEE add/mul/div on exact integer counts, so
    Spark and DuckDB agree bit-for-bit (libm ``log`` implementations
    may differ in the last ulp; a rational idf removes libm entirely
    while preserving the ranking).

    Scale: ONE explode, one (doc, term) aggregation, then the term
    document-frequency as ``tf.groupBy(term).count()`` — the TF rows
    are unique per (doc, term), so the count IS the number of distinct
    docs containing the term — attached back with a broadcast join.
    r16 kept the single explode but computed DF as ``count(*) over
    (partition by term)``; r17 (guide §2.5) removes that window: a
    window partitioned by bare ``term`` shuffles the ENTIRE TF
    relation on term and concentrates every row of a Zipfian hot term
    ("the") into one un-splittable window partition — AQE cannot
    skew-split windows. The groupBy is map-side combinable (reducers
    see one partial row per term per mapper, skew-proof) and the
    term-keyed result is vocabulary-sized, not corpus-sized; the
    planner broadcasts it (no hard hint: a corpus whose vocabulary
    outgrows the broadcast cap falls back to a shuffle join, which —
    unlike a window — AQE can skew-split at runtime). One
    broadcast-size scalar (N); every remaining stage map-side
    combinable; no all-pairs, no driver state."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(ws_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # the tf > 0 guard is a tautology (tf is a count(*), always >= 1)
    # whose purpose is plan shape: it keeps the tf column alive in the
    # DF subtree so the (doc,term) exchange below it stays canonically
    # identical to the TF side's and exchange reuse executes the
    # explode + (doc,term) aggregation ONCE for both consumers (with
    # bare count(*), column pruning rewrites this subtree to a
    # keys-only distinct aggregate and the shared stage is recomputed)
    dfreq = (
        tf.where(F.col("tf") > 0).groupBy("term").agg(F.count("*").alias("df"))
    )
    n_docs = df.agg(F.countDistinct(id_col).alias("n"))
    scored = (
        tf.join(dfreq, on="term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            (
                F.col("tf")
                * (F.col("n") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
    )


def bm25_search(
    df,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 10,
    round_to: int = 4,
):
    """BM25 ranked retrieval for a fixed term set: per-doc score =
    Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

    Like :func:`tfidf_topk`, idf is the rational BM25 core
    ``(N − df + 0.5)/(df + 0.5)`` without the log wrapper — pure IEEE
    arithmetic on exact integer counts in a fixed operation order, so
    the oracle reproduces it bit-for-bit except for the final Σ over
    query terms (≤ a handful; rounded before ranking).

    Scale: tf for the query terms only (filter BEFORE the groupBy —
    the explode output shrinks to matching tokens immediately), df is
    |terms| rows, N/avgdl one broadcast row; one shuffle on doc id.
    Ranking is a global top-k (single-reducer on top rows only).

    r16 (guide §2.3/§2.4): ``dl`` is ``size(split(text))`` — a ROW-
    LOCAL projection, identical to counting the exploded rows (explode
    emits one row per array element), so the old explode + groupBy +
    shuffle that produced per-doc lengths is gone (plan: one full-
    corpus Generate + HashAggregate + Exchange removed; the remaining
    explode is immediately filtered to the query terms)."""
    from pyspark.sql import Window

    terms = [t for t in query_terms]
    toks = df.select(F.col(id_col), F.explode(ws_tokens(text_col)).alias("term"))
    # null-text docs were absent from the old exploded groupBy; filter
    # them here too so dl never depends on spark.sql.legacy.sizeOfNull
    # (legacy true would turn size(NULL) into -1 and shift avgdl)
    dl = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.size(ws_tokens(text_col)).cast("long").alias("dl")
    )
    qtoks = toks.filter(F.col("term").isin(terms))
    tf = qtoks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = (
        qtoks.select(id_col, "term").distinct().groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    stats = df.agg(
        F.countDistinct(id_col).alias("n")
    ).crossJoin(dl.agg(F.avg("dl").alias("avgdl")))
    idf = (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(dfreq, on="term")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(idf * F.col("tf") * F.lit(k1 + 1.0) / denom), round_to
            ).alias("bm25"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    w = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top)
    )


# PII patterns kept to syntax both Java regex (Spark) and RE2 (DuckDB)
# compile identically: no lookaround, no backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def scrub_pii(
    df,
    text_col: str,
    *,
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
):
    """Redact emails and IPv4 addresses from a text column, annotating
    each row with per-kind match counts — the training-data hygiene
    pass (run BEFORE dedup/fingerprinting so redaction doesn't split
    otherwise-identical documents).

    Pure per-row JVM regexes (codegen'd, shuffle-free, scan-pruned to
    the text column); patterns restricted to the Java∩RE2 common
    syntax so the oracle reproduces matches exactly."""
    c = F.col(text_col)
    return (
        df.withColumn("n_emails", F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), F.lit(0))).cast("long"))
        .withColumn("n_ips", F.size(F.regexp_extract_all(c, F.lit(PII_IPV4_RE), F.lit(0))).cast("long"))
        .withColumn(
            text_col,
            F.regexp_replace(
                F.regexp_replace(c, PII_EMAIL_RE, email_token),
                PII_IPV4_RE,
                ip_token,
            ),
        )
    )


def _trigram_profiles() -> list[tuple[str, str]]:
    """(trigram, lang) profile rows derived deterministically from the
    per-language marker vocabulary — the toy stand-in for real
    frequency-ranked trigram profiles; swap the table, keep the plan."""
    rows = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        tgs = set()
        for m in markers:
            padded = f" {m} "
            for i in range(len(padded) - 2):
                tgs.add(padded[i : i + 3])
        rows.extend((tg, lang) for tg in sorted(tgs))
    return rows


def lang_id_trigram(df, id_col: str, text_col: str):
    """Char-trigram language ID — the scale path (real deployments use
    frequency profiles; marker-token q24 is the toy twin).

    Plan: ONE map-only projection — the profile is a constant-sized
    table, so each profile trigram becomes a ``contains(text, tg)``
    presence predicate compiled straight into whole-stage codegen;
    per-language hits = the sum of its presence bits (identical to
    counting DISTINCT matched trigrams, since presence is boolean), and
    the argmax folds over the sorted language list so ties keep the
    smallest code. Zero shuffle, zero explode, zero join.

    Two earlier shapes were measured and rejected at sf0.1
    (1.5M trigram positions): explode + distinct + profile join ≈ 4 s,
    dominated by per-position ``substr`` — positional substring on
    UTF8 is O(position), so trigram extraction over a whole document
    is O(|text|²); join-before-distinct only moved the cost. The
    ``contains`` form is O(|profile| · |text|) byte-level matching,
    ~0.3 s for the same input, and at 100 TB it scales as a pure map
    over the corpus with the profile burned into the plan (a REAL
    frequency-ranked profile of a few hundred trigrams keeps the same
    shape; thousands would switch back to the explode+join plan, which
    is why it stays documented here)."""
    by_lang: dict[str, list[str]] = {}
    for tg, lang in _trigram_profiles():
        by_lang.setdefault(lang, []).append(tg)

    t = F.concat(F.lit(" "), F.lower(F.trim(F.col(text_col))), F.lit(" "))
    out = df.select(F.col(id_col), t.alias("__t"))
    best_hits, best_lang = F.lit(0), F.lit("und")
    for lang in sorted(by_lang):
        hits = sum(
            (F.contains(F.col("__t"), F.lit(tg)).cast("int") for tg in by_lang[lang]),
            start=F.lit(0),
        )
        out = out.withColumn(f"__h_{lang}", hits)
        better = F.col(f"__h_{lang}") > best_hits
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(better, F.col(f"__h_{lang}")).otherwise(best_hits)
    return out.select(
        F.col(id_col),
        F.when(best_hits > 0, best_lang).otherwise(F.lit("und")).alias("predicted"),
    )


# ---------------------------------------------------------------------------
# per-source boilerplate removal (document-frequency threshold)
# ---------------------------------------------------------------------------

def boilerplate_strip(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    *,
    chunk_tokens: int = 12,
    min_df: int = 2,
    df_frac: float = 0.05,
):
    """CCNet/RefinedWeb-style boilerplate removal: drop EVERY copy of a
    chunk that appears in >= max(min_df, ceil(df_frac * group's docs))
    distinct documents of the same group (site navigation, footers,
    cookie banners — text that repeats across a host's pages).
    Complements first-wins paragraph dedup (q119): dedup keeps one
    copy, boilerplate removal keeps none, and the scope is per group,
    not global.

    Output: (id, group, n_chunks, n_kept, clean_hash) — the md5 of the
    reassembled text pins reassembly order for the oracle without
    shipping the text.

    Scale: one explode of the corpus into fixed-token chunks; the
    document-frequency aggregation is a map-side-combinable
    count(distinct id) keyed by (group, chunk) — a boilerplate chunk
    repeated a billion times contributes one row per map partition per
    doc batch, and the per-group doc count is a broadcastable dim.
    Reassembly is one doc-keyed sort_array(collect_list) bounded by
    chunks-per-doc. The threshold comparison is integer-exact, so the
    kept set cannot flip cross-engine."""
    from pyspark.sql import Window as W  # noqa: F401  (parity with q119)

    toks = F.split(F.col(text_col), " ")
    chunks = (
        docs.select(F.col(id_col), F.col(group_col), toks.alias("t"))
        .select(
            id_col,
            group_col,
            F.explode(
                F.sequence(F.lit(1), F.size("t"), F.lit(chunk_tokens))
            ).alias("pos"),
            "t",
        )
        .select(
            id_col,
            group_col,
            "pos",
            F.concat_ws(" ", F.slice("t", F.col("pos"), chunk_tokens)).alias(
                "chunk"
            ),
        )
    )
    group_docs = docs.groupBy(group_col).agg(
        F.countDistinct(id_col).alias("n_docs")
    )
    df_counts = chunks.groupBy(group_col, "chunk").agg(
        F.countDistinct(id_col).alias("df")
    )
    boiler = (
        df_counts.join(F.broadcast(group_docs), group_col)
        .filter(
            F.col("df")
            >= F.greatest(
                F.lit(min_df), F.ceil(F.lit(df_frac) * F.col("n_docs"))
            )
        )
        .select(group_col, "chunk")
    )
    # r16 (guide §2.4): ONE aggregation replaces the old left_anti join
    # + kept-groupBy + total-groupBy + final join — chunks are flagged
    # with a left join against the (small) boiler set and both counters
    # come out of the same pass: n_chunks = count(*), n_kept = count of
    # unflagged, clean_text from a conditional collect_list (which
    # skips the NULLs the boiler rows produce). Identical output: the
    # same chunks survive, reassembled in the same pos order, and a
    # fully-boilerplate doc yields an empty collect -> md5('') exactly
    # like the old left-join NULL -> coalesce('') path. Plan: the third
    # chunk explode and two Exchanges are gone.
    # boiler rows are unique per (group, chunk) by construction (they
    # come from a groupBy), so the left join cannot duplicate chunks;
    # the planner picks broadcast when the boiler set fits (it is the
    # per-host nav/footer vocabulary — usually tiny, not guaranteed)
    flagged = chunks.join(
        boiler.withColumn("__b", F.lit(1)), [group_col, "chunk"], "left"
    )
    return flagged.groupBy(id_col, group_col).agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.count(F.when(F.col("__b").isNull(), 1)).cast("long").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.when(
                                F.col("__b").isNull(), F.struct("pos", "chunk")
                            )
                        )
                    ),
                    lambda x: x["chunk"],
                ),
                " ",
            )
        ).alias("clean_hash"),
    ).select(id_col, group_col, "n_chunks", "n_kept", "clean_hash")
