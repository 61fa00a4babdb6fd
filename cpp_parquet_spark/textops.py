"""Text-analysis operators for a large-scale training-data pipeline.

Everything here is **pure built-in Spark SQL expressions** — no Python
UDFs, so the whole operator stays inside whole-stage codegen and scales
linearly with executors (no JVM<->Python boundary at all). Each operator
has a DuckDB-equivalent oracle in ``__spark_entry__.py``.

Operators (over the ``documents`` table — (doc_id, text, lang, source,
n_chars)):

- :func:`token_stats` — whitespace + BPE-ish regex token counting
- :func:`quality` — length / punctuation / stopword-ratio quality score
- :func:`lang_id` — marker-word n-gram language-ID heuristic
- :func:`fingerprint` — md5 full-document + min/max-shingle-hash
  (winnowing-style) fingerprints
- :func:`repetition` — Gopher-style duplicate-line fraction signals
- :func:`top_ngram_stats` — most-frequent word n-gram + char coverage
- :func:`pack_sequences` — streaming-fill sequence packing for batches

At 100 TB these are narrow, shuffle-free map-side projections — the only
wide operation a caller might add is a groupBy on the outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: BPE-ish token pattern: letter runs, digit runs, single punctuation.
#: (kept to a Java/RE2-compatible subset so the DuckDB oracle matches)
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: tiny English stopword list used for the quality heuristic
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "on", "for")

#: language marker words for the lang-ID heuristic
LANG_MARKERS = {
    "en": ("the", "and", "is", "of"),
    "es": ("el", "la", "los", "que"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "les", "et", "est"),
}


def _ws_tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.col(col)), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token counts: whitespace tokens and BPE-ish regex
    tokens, plus average whitespace-token length."""
    t = F.col(text_col)
    ws = F.size(_ws_tokens(text_col))
    non_ws_chars = F.length(F.regexp_replace(t, r"\s+", ""))
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars_m"),
        ws.alias("ws_tokens"),
        F.regexp_count(t, F.lit(BPE_RE)).alias("bpe_tokens"),
        F.round(non_ws_chars / ws, 6).alias("avg_ws_token_len"),
    )


def quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: alpha/punct ratios, stopword ratio, a combined
    [0,1] score and a high/medium/low bucket.

    The score is a deterministic linear blend — the exact weights are the
    operator's contract (the oracle recomputes them), not a claim about
    what "quality" means for any given corpus."""
    import string
    t = F.col(text_col)
    n = F.length(t)
    # char-class counts via translate (a char map) instead of
    # regexp_replace: same ASCII-class semantics, no regex engine, no
    # full-string rewrite allocation — ~2x faster on 2.5 KB docs.
    # Java regex \s is exactly [ \t\n\x0B\f\r].
    _ws_chars = " \t\n\x0b\x0c\r"
    alpha = n - F.length(F.translate(t, string.ascii_letters, ""))
    punct = F.length(F.translate(
        t, string.ascii_letters + string.digits + _ws_chars, ""))
    toks = _ws_tokens(text_col)
    ws = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stops = F.size(F.filter(F.transform(toks, F.lower),
                            lambda x: F.array_contains(stop_arr, x)))
    nz = F.greatest(n, F.lit(1))          # empty text: all ratios -> 0
    alpha_ratio = alpha / nz
    punct_ratio = punct / nz
    stop_ratio = stops / ws               # split('') == [''] so ws >= 1
    score = (F.lit(0.4) * alpha_ratio + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
             + F.lit(0.3) * F.least(F.lit(1.0), ws / F.lit(50.0)))
    return df.select(
        "doc_id",
        n.alias("n_chars_m"),
        ws.alias("ws_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality_score"),
        F.when(score >= 0.8, "high").when(score >= 0.5, "medium")
         .otherwise("low").alias("quality_bucket"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic: count marker-word hits per
    language over lowercased whitespace tokens; argmax wins,
    'und' (undetermined) when no marker hits at all.

    Deterministic tie-break: language order as in LANG_MARKERS."""
    toks = F.transform(_ws_tokens(text_col), F.lower)
    def _contains(arr):
        return lambda x: F.array_contains(arr, x)

    scores = {}
    for lg, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores[lg] = F.size(F.filter(toks, _contains(arr)))
    best = F.greatest(*scores.values())
    pred = F.when(best == 0, "und")
    for lg in LANG_MARKERS:          # first max wins (insertion order)
        pred = pred.when(scores[lg] == best, lg)
    return df.select(
        "doc_id", F.col("lang").alias("lang_label"),
        *[scores[lg].alias(f"score_{lg}") for lg in LANG_MARKERS],
        pred.otherwise("und").alias("pred_lang"),
    )


#: polynomial shingle-hash parameters: base > max Unicode codepoint
#: (0x10FFFF < 2^21) so the fold is injective per character; Mersenne
#: modulus keeps every intermediate < 2^52 — exact in BIGINT for both
#: Spark (ANSI mode, no overflow) and the DuckDB oracle
FP_BASE = 1 << 21
FP_MOD = (1 << 31) - 1


def fingerprint(df: DataFrame, text_col: str = "text",
                shingle: int = 4, prefix: int = 512,
                impl: str = "numpy") -> DataFrame:
    """Document fingerprints: full-text md5 plus min- and max-shingle-hash
    over character ``shingle``-grams of the first ``prefix`` chars — the
    min-hash end of a winnowing scheme.

    The shingle hash is an integer codepoint polynomial (base 2^21 mod
    2^31-1): every value < 2^52, exact in BIGINT for Spark, DuckDB and
    numpy uint64 alike, so all three implementations agree bit-for-bit.

    ``impl="numpy"`` (default): md5 stays JVM-side (``F.md5``), the
    shingle minima/maxima come from ONE vectorized Arrow pass — the
    batch's texts are decoded to a flat UTF-32 codepoint array (so
    ``ord(char)`` semantics match SQL ``ascii(substr(...))`` exactly),
    the polynomial is a constant-count loop of broadcast multiplies, and
    per-doc min/max are segmented ``np.minimum/maximum.reduceat``. The
    SQL form (``impl="sql"``) evaluates ``prefix * shingle`` substr calls
    per document, each an O(prefix) UTF-8 scan — O(prefix^2) per doc,
    measured ~10x slower at 100k docs; it is kept as the oracle-shaped
    reference implementation (equality pinned by pytest)."""
    if impl == "sql":
        return _fingerprint_sql(df, text_col, shingle, prefix)

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    base = np.uint64(FP_BASE)
    mod = np.uint64(FP_MOD)

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("md5_full", T.StringType()),
        T.StructField("min_shingle_h", T.LongType()),
        T.StructField("max_shingle_h", T.LongType()),
    ])

    def kernel(batches):
        # `shingle` zero codepoints between docs: a doc shorter than the
        # shingle width still has one position, which reads up to
        # `shingle` pad chars (ascii('') == 0 semantics)
        pad = shingle
        for pdf in batches:
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            ndocs = ids.shape[0]
            if ndocs == 0:
                continue
            clipped = pdf[text_col].fillna("").str.slice(0, prefix)
            lens = clipped.str.len().to_numpy(dtype=np.int64)
            # flat codepoint array, `pad` zero codepoints between docs:
            # position i of a doc reads chars i..i+pad with ascii('')=0
            # padding semantics, and can never reach the next doc
            joined = ("\0" * pad).join(clipped.tolist()) + "\0" * pad
            cp = np.frombuffer(joined.encode("utf-32-le"),
                               dtype=np.uint32).astype(np.uint64)
            offs = np.zeros(ndocs + 1, dtype=np.int64)
            np.cumsum(lens + pad, out=offs[1:])
            npos = np.maximum(lens - (shingle - 1), 1)
            cum = np.zeros(ndocs + 1, dtype=np.int64)
            np.cumsum(npos, out=cum[1:])
            idx = (np.arange(cum[-1], dtype=np.int64)
                   - np.repeat(cum[:-1], npos) + np.repeat(offs[:-1], npos))
            h = cp[idx]
            for j in range(1, shingle):
                h = (h * base + cp[idx + j]) % mod
            mins = np.minimum.reduceat(h, cum[:-1])
            maxs = np.maximum.reduceat(h, cum[:-1])
            yield pd.DataFrame({
                "doc_id": ids,
                "md5_full": pdf["__md5"].to_numpy(),
                "min_shingle_h": mins.view(np.int64),
                "max_shingle_h": maxs.view(np.int64),
            })

    src = df.select("doc_id", F.col(text_col),
                    F.md5(F.col(text_col).cast("binary")).alias("__md5"))
    return src.mapInPandas(kernel, out_schema)


def _fingerprint_sql(df: DataFrame, text_col: str, shingle: int,
                     prefix: int) -> DataFrame:
    """SQL-expression fingerprint (the oracle-shaped reference path)."""
    t = F.substring(F.col(text_col), 1, prefix)
    npos = F.greatest(F.length(t) - F.lit(shingle - 1), F.lit(1))

    def sh_hash(i):
        h = F.ascii(t.substr(i, F.lit(1))).cast("bigint")
        for j in range(1, shingle):
            h = (h * F.lit(FP_BASE)
                 + F.ascii(t.substr(i + F.lit(j), F.lit(1))).cast("bigint")) \
                % F.lit(FP_MOD)
        return h

    hashes = F.transform(F.sequence(F.lit(1), npos), sh_hash)
    return df.select(
        "doc_id",
        F.md5(F.col(text_col).cast("binary")).alias("md5_full"),
        F.array_min(hashes).alias("min_shingle_h"),
        F.array_max(hashes).alias("max_shingle_h"),
    )


def pack_sequences(df: DataFrame, length_col: str, budget: int,
                   group_cols: tuple[str, ...] = (),
                   order_col: str = "doc_id") -> DataFrame:
    """Sequence packing for training batches: lay documents end-to-end in
    deterministic ``order_col`` order within each group and assign
    ``pack_id = floor(start_offset / budget)`` — a document starting
    inside pack k belongs to pack k (its tail may overflow the budget,
    the standard streaming-fill contract; no pack UNDERfills except the
    last per group). Pure window SQL, so the exact semantics replay in
    any engine (DuckDB oracle `pack_documents`).

    Scale note: one shuffle on ``group_cols``; each group's running sum
    is a single window partition, so group granularity (lang, shard,
    source) bounds per-task work. Without group_cols the window is one
    global partition — allowed only for single-partition (test-sized)
    input; a multi-partition input without group_cols raises rather
    than silently funneling the whole table through one task."""
    from pyspark.sql.window import Window
    if not group_cols:
        nparts = df.rdd.getNumPartitions()
        if nparts > 1:
            raise ValueError(
                "pack_sequences without group_cols is one GLOBAL window "
                "partition — the whole table would funnel through a "
                f"single task (input has {nparts} partitions). Pass "
                "group_cols=(lang/shard/source,...) to bound per-task "
                "work, or coalesce(1) explicitly for test-sized data.")
    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy()).orderBy(order_col)
    start = F.sum(length_col).over(w) - F.col(length_col)
    return df.withColumn(
        "pack_id", F.floor(start / F.lit(budget)).cast("long"))


def repetition(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals per document: duplicate-line
    fraction (by count) and the fraction of line characters that sit in
    duplicated lines. High values flag boilerplate/template documents a
    training pipeline should downweight or drop.

    Lines are literal '\\n' splits; empty lines count (a doc of blank
    lines IS repetitive under this contract). Spark shape: explode lines
    -> groupBy (doc_id, line) with map-side combine -> per-doc agg. Both
    aggregations carry doc_id in the key, so the shuffle is linear and
    skew-free at 100 TB regardless of how repetitive any one corpus
    slice is."""
    lines = df.select(
        "doc_id", F.explode(F.split(F.col(text_col), "\n")).alias("line"))
    per = (lines.groupBy("doc_id", "line")
           .agg(F.count("*").alias("c"))
           .select("doc_id", "c", F.length("line").alias("len")))
    dup_chars = F.coalesce(
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("len"))), F.lit(0))
    tot_chars = F.greatest(F.sum(F.col("c") * F.col("len")), F.lit(1))
    return (per.groupBy("doc_id")
            .agg(F.sum("c").alias("n_lines"),
                 F.count("*").alias("n_distinct_lines"),
                 F.round(F.lit(1.0) - F.count("*") / F.sum("c"), 6)
                  .alias("dup_line_frac"),
                 F.round(dup_chars / tot_chars, 6)
                  .alias("dup_line_char_frac")))


def top_ngram_stats(df: DataFrame, n: int = 2,
                    text_col: str = "text",
                    nchars_col: str = "n_chars") -> DataFrame:
    """Most-frequent word ``n``-gram per document plus the fraction of
    document characters it covers (count * gram length / n_chars) — the
    Gopher top-n-gram repetition filter signal.

    Words are non-empty whitespace tokens; docs with fewer than ``n``
    words emit no row; ties break to the lexicographically smallest
    gram (deterministic). Spark shape: explode n-grams -> count per
    (doc_id, gram) -> per-doc top-1 via min over a (-count, gram)
    struct — two linear aggregations keyed on doc_id, no window over
    raw rows, skew-free at 100 TB."""
    words = F.filter(_ws_tokens(text_col), lambda x: x != F.lit(""))
    grams = df.select(
        "doc_id", F.col(nchars_col).alias("__nc"),
        F.explode(F.when(
            F.size(words) >= n,
            F.transform(F.sequence(F.lit(1), F.size(words) - F.lit(n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(words, i, n)))
        ).otherwise(F.array().cast("array<string>"))).alias("gram"))
    cnt = (grams.groupBy("doc_id", "__nc", "gram")
           .agg(F.count("*").alias("c")))
    s = F.struct((-F.col("c")).alias("nc"), F.col("gram").alias("g"))
    return (cnt.groupBy("doc_id", "__nc").agg(F.min(s).alias("s"))
            .select("doc_id",
                    F.col("s.g").alias("top_gram"),
                    (-F.col("s.nc")).alias("top_count"),
                    F.round((-F.col("s.nc")) * F.length("s.g")
                            / F.greatest(F.col("__nc"), F.lit(1)), 6)
                     .alias("top_gram_char_frac")))


#: PII / secret patterns, kept to the Java-regex ∩ RE2 common subset so
#: the DuckDB oracle replays them byte-identically (no lookaround, no
#: backrefs). Order matters and is part of the contract: emails first
#: (an email contains no '<' so later passes never touch the token),
#: then IPv4, then keyed secrets.
REDACT_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("secret",
     r"(?i)(api[_-]?key|secret|token|passwd|password)"
     r"[\"':= ]+[A-Za-z0-9/+_-]{12,}", "<SECRET>"),
)


def redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII/secret scrubbing for training corpora: per-category match
    counts plus the redacted text. Pure regexp codegen — no UDF, no
    shuffle; at 100 TB this is a map-side projection like the other
    text ops. Counts are taken BEFORE any replacement so categories
    report on the original text."""
    t = F.col(text_col)
    counts = [F.regexp_count(t, F.lit(pat)).alias(f"n_{name}")
              for name, pat, _ in REDACT_PATTERNS]
    red = t
    for _, pat, token in REDACT_PATTERNS:
        red = F.regexp_replace(red, pat, token)
    return df.select("doc_id", *counts, red.alias("redacted"))


def decontaminate(df: DataFrame, bench: DataFrame, n: int = 5,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination (the GPT-3/Gopher eval-overlap filter):
    flag corpus docs sharing ANY lowercase word ``n``-gram with a
    benchmark set. Returns (id, n_matched) for contaminated docs only.

    Scale shape: benchmark suites are tiny next to a 100 TB corpus, so
    the distinct benchmark grams broadcast and the corpus side is one
    codegen map (split -> slide -> explode) + broadcast semi-probe —
    the corpus never shuffles; the only exchange is the final per-doc
    count on id (pre-combined map-side). Tokenization matches the
    engine's other text ops (trim + \\s+ split, lowercased)."""
    def grams(frame: DataFrame, keep_id: bool):
        words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        npos = F.size(words) - F.lit(n - 1)
        gs = F.when(npos < 1, F.array().cast("array<string>")).otherwise(
            F.transform(F.sequence(F.lit(1), F.greatest(npos, F.lit(1))),
                        lambda i: F.array_join(F.slice(words, i, n), " ")))
        cols = ([F.col(id_col).alias("id")] if keep_id else []) \
            + [F.explode(F.array_distinct(gs)).alias("gram")]
        return frame.select(*cols)

    bg = grams(bench, keep_id=False).distinct()
    cg = grams(df, keep_id=True)
    return (cg.join(F.broadcast(bg), "gram", "left_semi")
            .groupBy("id").agg(F.count("*").alias("n_matched"))
            .select(F.col("id").alias(id_col), "n_matched")
            .orderBy(id_col))
