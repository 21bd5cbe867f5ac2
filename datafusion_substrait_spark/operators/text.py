"""Text-analysis operators for training-data pipelines.

All computations are built from JVM-side ``pyspark.sql.functions`` (no Python
UDFs), so they stay inside whole-stage codegen and scale linearly with
partitions — at 100 TB each of these is a single narrow map stage: no
shuffle, no Python serialization, and column pruning limits the scan to
``text`` (+ key). One documented exception: ``compression_ratio`` uses an
Arrow-batched pandas UDF because deflate has no Spark built-in — the
compression itself runs in zlib's C code, and the plan stays a narrow map.

Each operator is deliberately expressible in portable SQL so the DuckDB
oracle can replay it bit-for-bit (division orders fixed; doubles rounded at
the edge where cross-engine FP drift is possible).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language-ID heuristic: stopword hit sets per language (distinct-token
# intersection counts). Deterministic, engine-portable.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "it", "you", "that", "was"),
    "fr": ("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "es": ("el", "la", "los", "de", "y", "un", "una", "es", "que", "por"),
}
_LANG_ORDER = ("en", "fr", "de", "es")  # deterministic tie-break priority

_TOKEN_SPLIT = "[^a-z0-9]+"  # applied to lower(text); RE2/Java compatible


def tokens(text: Column) -> Column:
    """Lowercased alpha-numeric tokens, empties removed (array<string>)."""
    return F.array_remove(F.split(F.lower(text), _TOKEN_SPLIT), "")


def token_count(text: Column) -> Column:
    """Whitespace/punct-boundary token count (alphanumeric word splitter)."""
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer shape (simplified, case-folded): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs, and
# residual whitespace runs — the segmentation a byte-pair encoder runs on
# BEFORE merges, so its count is the right "token budget" estimator when no
# tokenizer library is present. Kept RE2/Java-portable (no \p classes, no
# lookarounds): GPT-2's `\s+(?!\S)`/`\s+` pair collapses to one `\s+`
# alternative, which segments an n-space run as (run)+(word) where GPT-2
# yields (run-minus-1)+(space-word) — different cuts, SAME count; GPT-2's
# unicode \pL/\pN narrow to ascii classes, so non-ascii letters count as
# punctuation runs (an overcount, never an undercount).
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+|\s+"


def bpe_token_count(text: Column) -> Column:
    """BPE-pre-tokenizer token count: segments lowercased text with
    :data:`BPE_PRETOKEN_RE` (one match = one pre-token; every character
    lands in exactly one match, so nothing is silently skipped). Counts are
    count-equivalent to GPT-2's pre-tokenizer on ascii text and an upper
    bound elsewhere — an upper bound on real BPE token counts too (merges
    only fuse pre-tokens' interiors), and a far better budget estimate
    than word counts for punctuation/number-heavy text. Whole-stage
    codegen'd ``regexp_extract_all`` — no UDF, no tokenizer library."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(BPE_PRETOKEN_RE), 0))


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Character n-gram shingles of the normalized text (array<string>).

    Row-local (``F.transform`` over an index sequence) — no explode, no
    shuffle; used as the shingle stage of MinHash dedup.

    r17 (guide §4 — the staging pattern, lambda-variable form): the
    normalized text is bound ONCE per row as a lambda variable via a
    one-element ``transform``. The previous spelling referenced the
    ``regexp_replace`` subtree from inside the per-gram lambda, re-running
    the whole-document regex per OUTPUT GRAM (no CSE across the HOF
    boundary — O(len²) regex work). Same per-gram arithmetic →
    bit-identical output.
    """
    norm = F.regexp_replace(F.lower(text), r"\s+", " ")

    def grams(nm: Column) -> Column:
        ln = F.length(nm)
        return F.when(
            ln < n, F.array(nm)
        ).otherwise(
            F.transform(F.sequence(F.lit(1), ln - (n - 1)),
                        lambda i: nm.substr(i, F.lit(n)))
        )

    return F.transform(F.array(norm), grams)[0]


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>), row-local.

    r17 (guide §4 — the staging pattern, lambda-variable form): the token
    array is bound ONCE per row as a lambda variable via a one-element
    ``transform``. The previous spelling referenced the ``tokens(...)``
    subtree from inside the per-gram slice lambda, re-splitting the whole
    document per OUTPUT GRAM (no CSE across the HOF boundary —
    O(tokens·len) work per row). Same per-gram arithmetic → bit-identical
    output for every consumer (contamination grams, DSIR buckets,
    repetition features, n-gram Jaccard — oracle legs re-pin).
    """
    def grams(toks: Column) -> Column:
        cnt = F.size(toks)
        return F.when(cnt < n, F.array(F.array_join(toks, " "))).otherwise(
            F.transform(
                F.sequence(F.lit(0), cnt - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        )

    return F.transform(F.array(tokens(text)), grams)[0]


def quality_features(df: DataFrame, text_col: str = "text",
                     key_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Per-document quality features + composite score.

    Heuristics follow the usual pretraining-filter recipe (length, mean token
    length, punctuation density, stopword density). Pure narrow map; rounded
    to 6 dp so the DuckDB oracle hash-matches despite FP formatting.

    r17 (guide §4 — the quantize/cell-score staging pattern): the token
    array and the raw counts are materialized once per row, the ratios
    computed from the count COLUMNS, and quality_score from the ratio
    COLUMNS. The single-select spelling re-evaluated the interpreted
    stopword-filter island (per-token array_contains over the full
    stopword list) twice per row — once for the stopword_ratio column
    and once inside quality_score. Identical arithmetic per reference →
    bit-identical output (t2/d6 oracle legs pin it).
    """
    text = F.col(text_col)
    toks = tokens(text)
    all_stop = F.array(*[F.lit(w) for ws in LANG_STOPWORDS.values() for w in ws])
    staged = df.select(
        *key_cols,
        toks.alias("__toks"),
        F.length(text).cast("double").alias("__nc"),
        F.regexp_count(text, F.lit(r"[.,;:!?]")).cast("double")
        .alias("__np"),
    )
    # true token-occurrence density (stopword TOKENS / all tokens), not
    # distinct-stopword count: array_intersect dedups, capping the
    # numerator at the stopword-list size and inverting the score
    # ordering with document length (a 2000-token fluent doc scored
    # lower than a 50-token fragment)
    staged = staged.select(
        *key_cols, F.col("__nc"), F.col("__np"),
        F.size("__toks").cast("double").alias("__nt"),
        F.size(F.filter("__toks",
                        lambda t: F.array_contains(all_stop, t)))
        .cast("double").alias("__nstop"),
    )
    n_chars = F.col("__nc")
    n_toks = F.col("__nt")
    # try_divide everywhere: Spark 4 defaults ANSI mode ON, so a bare x/0
    # on a zero-token ('???') or empty ('') document ABORTS the whole job
    # with DIVIDE_BY_ZERO; try_divide yields NULL for the undefined ratio
    # (and the quality_score guard below already scores such docs 0.0)
    staged = staged.select(
        *key_cols,
        n_chars.alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(F.try_divide(n_chars, n_toks), 6).alias("mean_token_len"),
        F.round(F.try_divide(F.col("__np"), n_chars), 6)
        .alias("punct_ratio"),
        F.round(F.try_divide(F.col("__nstop"), n_toks), 6)
        .alias("stopword_ratio"),
    )
    # the raw score lives on a 1.25e-6 lattice (term granularities 5e-3,
    # 2.5e-6, 1.25e-6), so round(x, 6) hits exact decimal HALVES and the
    # two engines' ulp-different sums round opposite ways (observed:
    # 0.6578175 → 0.657817 vs 0.657818). floor(x·800000 + 0.5)/800000
    # snaps to the lattice instead: the true value is an INTEGER there, so
    # a few ulp of error can never cross the floor boundary on either
    # engine.
    nt = F.col("n_tokens")
    raw = (
        (F.least(nt / 100.0, F.lit(1.0)) * 0.5)
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.25
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.25
    )
    score = F.when(nt <= 0, F.lit(0.0)).otherwise(
        F.floor(raw * 800000 + F.lit(0.5)) / 800000
    )
    return staged.select(
        *key_cols, "n_chars", "n_tokens", "mean_token_len", "punct_ratio",
        "stopword_ratio", score.alias("quality_score")
    )


def lang_id(df: DataFrame, text_col: str = "text",
            key_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """N-gram/stopword language-ID heuristic: distinct stopword hits per
    language, argmax with fixed priority tie-break, 'und' when no hits."""
    toks = tokens(F.col(text_col))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in ws])))
        for lang, ws in LANG_STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in reversed(_LANG_ORDER):  # earlier langs win ties → apply last
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return df.select(
        *key_cols,
        *[scores[lang].alias(f"score_{lang}") for lang in _LANG_ORDER],
        pred.alias("lang_pred"),
    )


def repetition_features(df: DataFrame, text_col: str = "text",
                        key_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition signals.

    (key, n_tokens, top_token_frac, dup_2gram_frac):
    ``top_token_frac`` = count of the most frequent token / token count;
    ``dup_2gram_frac`` = fraction of word-2-gram occurrences whose 2-gram
    appears more than once in the document. High values flag boilerplate
    and degenerate repetition — the classic pretraining repetition filter
    (the corpus here has no line structure, so the line-based variants of
    the rule reduce to these token/2-gram forms).

    Scale shape: two explode → two-level aggregation pipelines, each keyed
    on the document, with map-side combine collapsing the exploded rows
    before the shuffle — per doc the shuffle carries its distinct
    token/2-gram counts, never the text. The final join co-locates on the
    same key both sides were just shuffled on. Rounded to 6 dp for the
    cross-engine oracle, like :func:`quality_features`.
    """
    key = F.col(key_col)
    tok_counts = (
        df.select(key, F.explode(tokens(F.col(text_col))).alias("_t"))
        .groupBy(key_col, "_t").agg(F.count(F.lit(1)).alias("_c"))
    )
    tok_feats = tok_counts.groupBy(key_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.round(F.max("_c") / F.sum("_c"), 6).alias("top_token_frac"),
    )
    # the zero-token fallback gram '' is excluded (same rule as
    # contamination._grams): counting it would give empty docs a spurious
    # dup_2gram_frac of 0.0 where the left-join contract below says NULL
    gram_counts = (
        df.select(key, F.explode(word_ngrams(F.col(text_col), 2)).alias("_g"))
        .filter(F.col("_g") != "")
        .groupBy(key_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    )
    gram_feats = gram_counts.groupBy(key_col).agg(
        F.round(
            F.sum(F.when(F.col("_c") > 1, F.col("_c")).otherwise(F.lit(0)))
            / F.sum("_c"),
            6,
        ).alias("dup_2gram_frac")
    )
    # left joins from the corpus keys: a zero-token document produces no
    # exploded token rows, and an inner join would silently drop it from
    # the output — here it keeps its row (n_tokens 0, NULL fractions),
    # consistent with unigram_logprob and the simhash empty-doc floor
    return (
        df.select(key).join(tok_feats, key_col, "left")
        .join(gram_feats, key_col, "left")
        .select(
            key_col,
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
            "top_token_frac", "dup_2gram_frac",
        )
    )


def gopher_quality_flags(df: DataFrame, text_col: str = "text",
                         key_col: str = "doc_id",
                         max_symbol_word_ratio: float = 0.1,
                         max_bullet_line_frac: float = 0.9,
                         max_ellipsis_line_frac: float = 0.3,
                         min_alpha_word_frac: float = 0.8) -> DataFrame:
    """The Gopher rule battery (Rae et al. 2021, arXiv:2112.11446 §A1.1)
    this module's other features don't already cover — (key,
    symbol_word_ratio, alpha_word_frac, bullet_line_frac,
    ellipsis_line_frac, gopher_flagged):

    * ``symbol_word_ratio`` — (# + … + ...) occurrences / word count;
      hash/ellipsis spam (default flag > 0.1);
    * ``alpha_word_frac`` — fraction of words containing ≥ 1 alphabetic
      char (default flag < 0.8: number/symbol soup);
    * ``bullet_line_frac`` / ``ellipsis_line_frac`` — fraction of
      non-empty lines starting with a bullet (•, -, *) / ending with an
      ellipsis (default flags > 0.9 / > 0.3: scraped navigation lists,
      truncated previews);
    * ``gopher_flagged`` — OR of the four rules, NULL-safe (a rule whose
      denominator is empty contributes false, matching the paper's
      "cannot fire on no evidence" reading; the length rules live in
      :func:`quality_features`, repetition in
      :func:`repetition_features`).

    Pure narrow map — split/filter/regexp_count inside codegen, no
    shuffle, no Python; thresholds are plan literals. Ratios 6dp-rounded
    for the cross-engine oracle like every feature op here.

    r17 (guide §4 — the quantize/cell-score staging pattern): the chunk
    and line arrays (interpreted HOF filters — CodegenFallback islands
    that whole-stage-codegen subexpression elimination cannot CSE) are
    materialized once per row in their own Projects, then the ratios,
    then the flag over the ratio COLUMNS. The previous single-select
    spelling re-ran the whitespace split+filter 4× and the line
    split+trim+filter 8× per row across the six output columns (each
    ratio appears in its own column AND inside gopher_flagged, and each
    numerator/denominator pair re-evaluated its array). Identical
    arithmetic per reference → bit-identical output (the t2 oracle leg
    and the planted gopher tests pin it)."""
    text = F.col(text_col)
    toks = tokens(text)
    n_words = F.size(toks).cast("double")
    n_symbols = (F.regexp_count(text, F.lit("#"))
                 + F.regexp_count(text, F.lit(r"\.\.\."))
                 + F.regexp_count(text, F.lit("…"))).cast("double")
    # words here are whitespace chunks (bullets/symbols survive), unlike
    # tokens(): the alpha rule is about junk BETWEEN words
    chunks = F.filter(F.split(text, r"\s+"), lambda c: c != "")
    lines = F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "")
    staged = df.select(
        F.col(key_col),
        n_words.alias("__nw"),
        n_symbols.alias("__ns"),
        chunks.alias("__chunks"),
        lines.alias("__lines"),
    )
    staged = staged.select(
        F.col(key_col), F.col("__nw"), F.col("__ns"),
        F.size("__chunks").cast("double").alias("__nc"),
        F.size(F.filter("__chunks", lambda c: c.rlike("[A-Za-z]")))
        .cast("double").alias("__na"),
        F.size("__lines").cast("double").alias("__nl"),
        F.size(F.filter("__lines", lambda ln: ln.rlike("^[•\\-\\*]")))
        .cast("double").alias("__nb"),
        F.size(F.filter("__lines", lambda ln: ln.rlike("(\\.\\.\\.|…)$")))
        .cast("double").alias("__ne"),
    )
    swr = F.round(F.try_divide(F.col("__ns"), F.col("__nw")), 6)
    awf = F.round(F.try_divide(F.col("__na"), F.col("__nc")), 6)
    blf = F.round(F.try_divide(F.col("__nb"), F.col("__nl")), 6)
    elf = F.round(F.try_divide(F.col("__ne"), F.col("__nl")), 6)
    staged = staged.select(
        F.col(key_col),
        swr.alias("symbol_word_ratio"),
        awf.alias("alpha_word_frac"),
        blf.alias("bullet_line_frac"),
        elf.alias("ellipsis_line_frac"),
    )
    flagged = (
        F.coalesce(F.col("symbol_word_ratio") > max_symbol_word_ratio,
                   F.lit(False))
        | F.coalesce(F.col("alpha_word_frac") < min_alpha_word_frac,
                     F.lit(False))
        | F.coalesce(F.col("bullet_line_frac") > max_bullet_line_frac,
                     F.lit(False))
        | F.coalesce(F.col("ellipsis_line_frac") > max_ellipsis_line_frac,
                     F.lit(False)))
    return staged.select(
        F.col(key_col),
        F.col("symbol_word_ratio"),
        F.col("alpha_word_frac"),
        F.col("bullet_line_frac"),
        F.col("ellipsis_line_frac"),
        flagged.alias("gopher_flagged"),
    )


_MARKUP_ENTITIES = (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"))


def strip_markup(df: DataFrame, text_col: str = "text",
                 key_col: str = "doc_id") -> DataFrame:
    """(key, text, n_tags): HTML/XML markup removal — the extraction step
    between a raw web crawl and every text operator in this module.

    Order matters and is part of the contract: (1) drop ``<script>`` /
    ``<style>`` blocks and comments WITH their contents (lazy-dotall,
    case-insensitive — JS/CSS is not prose), (2) strip remaining tags to
    a space (so ``a<br>b`` stays two words), (3) decode the six
    ubiquitous entities with ``&amp;`` LAST (``&amp;lt;`` means a literal
    "&lt;" — decoding ``&amp;`` first would double-decode it), (4)
    collapse whitespace and trim. ``n_tags`` counts stripped tags — a
    markup-density signal for quality filtering.

    Pure narrow map, every regex in the Java-regex ∩ RE2 subset
    (lazy quantifiers + ``(?is)`` work in both), so the DuckDB oracle
    replays it exactly; NULL text passes through as NULL (no evidence,
    not empty — the quality_features convention).
    """
    raw = F.col(text_col)
    # script and style handled by SEPARATE patterns: a combined
    # alternation needs a \1 backreference to close the right tag, and
    # RE2 (the DuckDB oracle's engine) has no backreferences
    noblock = raw
    for block in ("script", "style"):
        noblock = F.regexp_replace(
            noblock, rf"(?is)<{block}[^>]*>.*?</{block}\s*>", " ")
    noblock = F.regexp_replace(noblock, r"(?s)<!--.*?-->", " ")
    # a "tag" must LOOK like one — <, optional / or !, then a letter —
    # so prose comparisons ("1 < 2 and 3 > 2") survive; [^>] spans
    # newlines in both engines without a dotall flag
    tag_re = r"<[/!]?[a-zA-Z][^>]*>"
    n_tags = F.regexp_count(noblock, F.lit(tag_re))
    clean = F.regexp_replace(noblock, tag_re, " ")
    for ent, rep in _MARKUP_ENTITIES:
        clean = F.replace(clean, F.lit(ent), F.lit(rep))
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    return df.select(F.col(key_col), clean.alias(text_col),
                     n_tags.cast("int").alias("n_tags"))


def vocab_topk(df: DataFrame, text_col: str = "text", k: int = 100) -> DataFrame:
    """Corpus-wide token frequencies, top ``k`` by (freq desc, token asc).

    The deterministic tie-break makes the result a well-defined SET, so it
    is oracle-checkable. Scale shape: explode → hash aggregate with
    map-side combine (the shuffle is vocabulary-sized, not corpus-sized) →
    Spark plans the sort+limit as TakeOrderedAndProject: per-partition
    top-k then a k-row driver merge, never a global sort.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    key_col: str = "doc_id", vocab_size: int = 50000,
                    alpha: float = 1.0) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    add-alpha-smoothed unigram language model with a top-``vocab_size``
    vocabulary — the classic cheap fluency/outlier signal (the no-model
    stand-in for LM perplexity filtering). All out-of-vocabulary tokens
    share one smoothed count-0 bucket.

    Output: (key, n_tokens, mean_logprob); more negative = more surprising
    under the corpus distribution. Zero-token documents keep their row with
    ``n_tokens`` 0 and NULL ``mean_logprob``.

    Scale shape: ONE corpus-sized shuffle (token counts, map-side combined
    — the shuffle carries the vocabulary, not the corpus); the top-K
    vocabulary plans as TakeOrderedAndProject and broadcasts back; the
    N/K totals ride a 1-row broadcast cross join; per-token scoring is a
    narrow map over the exploded tokens; the per-document mean shuffles
    compact (key, double) rows. The text itself is never shuffled.
    ``mean_logprob`` is rounded to 6 dp so the DuckDB oracle replays it
    despite last-ulp ``ln``/summation-order drift.
    """
    key = F.col(key_col)
    tok = df.select(key, F.explode(tokens(F.col(text_col))).alias("_t"))
    counts = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    vocab = counts.orderBy(F.desc("_c"), F.asc("_t")).limit(vocab_size)
    totals = counts.agg(F.sum("_c").alias("_n")).crossJoin(
        F.broadcast(vocab.agg(F.count(F.lit(1)).alias("_k"))))
    a = F.lit(float(alpha))
    scored = (
        tok.join(F.broadcast(vocab), "_t", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            key_col,
            (F.log(F.coalesce(F.col("_c"), F.lit(0)) + a)
             - F.log(F.col("_n") + a * (F.col("_k") + 1))).alias("_lp"),
        )
    )
    per_doc = scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("_lp"), 6).alias("mean_logprob"),
    )
    return (
        df.select(key).join(per_doc, key_col, "left")
        .select(
            key_col,
            F.coalesce("n_tokens", F.lit(0).cast("bigint")).alias("n_tokens"),
            "mean_logprob",
        )
    )


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   key_col: str = "doc_id", vocab_size: int = 50000,
                   alpha: float = 1.0) -> DataFrame:
    """Per-document mean CONDITIONAL bigram log-probability — the
    stronger form of :func:`unigram_logprob`'s fluency signal (unigram
    scores word choice; the bigram model scores word ORDER, separating
    fluent text from bag-of-frequent-words gibberish).

    Model: tokens outside the top-``vocab_size`` unigram vocabulary map
    to one ``<oov>`` symbol FIRST (tokens are [a-z0-9]+ so the symbol
    cannot collide), then p(b|a) = (c₂(a,b)+α) / (c₁(a)+α·(K+1)) with
    corpus-wide mapped-bigram counts c₂, context totals c₁(a)=Σ_b c₂(a,b)
    and K = |vocab| (the +1 is ``<oov>``) — add-α smoothing over the
    mapped next-symbol space. Every observed context has c₁ ≥ 1 by
    construction, so no probability is undefined.

    Output: (key, n_bigrams, mean_logprob); documents with fewer than
    two tokens keep their row with ``n_bigrams`` 0 and NULL mean.

    Scale shape: token counts shuffle map-side-combined (the vocabulary,
    not the corpus); the OOV mapping is a broadcast join; adjacency is
    ONE per-document window shuffle (the sessionize profile); the
    bigram-count joins are left UN-HINTED — mapping to the vocab first
    bounds distinct bigrams by min(corpus, (K+1)²), so AQE broadcasts
    the count tables when the vocabulary is modest and falls back to a
    shuffle join for huge K (the t10 tf×df pattern). 6dp-rounded mean
    for the cross-engine oracle.
    """
    from pyspark.sql import Window as W

    key = F.col(key_col)
    tok = df.select(key, F.posexplode(tokens(F.col(text_col)))
                    .alias("_pos", "_t"))
    counts = tok.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    vocab = counts.orderBy(F.desc("_c"), F.asc("_t")).limit(vocab_size)
    mapped = (
        tok.join(F.broadcast(vocab.select("_t", F.lit(1).alias("_inv"))),
                 "_t", "left")
        .select(key_col, "_pos",
                F.when(F.col("_inv").isNull(), F.lit("<oov>"))
                .otherwise(F.col("_t")).alias("_w"))
    )
    win = W.partitionBy(key_col).orderBy("_pos")
    bg = (mapped.select(key_col, "_w",
                        F.lag("_w").over(win).alias("_prev"))
          .filter(F.col("_prev").isNotNull()))
    c2 = bg.groupBy("_prev", "_w").agg(F.count(F.lit(1)).alias("_c2"))
    c1 = c2.groupBy("_prev").agg(F.sum("_c2").alias("_c1"))
    vsz = vocab.agg((F.count(F.lit(1)) + 1).alias("_v"))
    a = F.lit(float(alpha))
    scored = (
        bg.join(c2, ["_prev", "_w"])
        .join(c1, "_prev")
        .crossJoin(F.broadcast(vsz))
        .select(key_col,
                (F.log(F.col("_c2") + a)
                 - F.log(F.col("_c1") + a * F.col("_v"))).alias("_lp"))
    )
    per_doc = scored.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("_lp"), 6).alias("mean_logprob"),
    )
    return (
        df.select(key).join(per_doc, key_col, "left")
        .select(
            key_col,
            F.coalesce("n_bigrams", F.lit(0).cast("bigint")).alias("n_bigrams"),
            "mean_logprob",
        )
    )


def fingerprint(df: DataFrame, text_col: str = "text",
                key_cols: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased text.

    md5 is bit-identical across engines (unlike xxhash64/DuckDB hash), so the
    oracle can verify; collision-safe enough for dedup keys at 100 TB
    (2^64 docs before birthday trouble).
    """
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(*key_cols, F.md5(norm).alias("fingerprint"))


def rolling_fingerprints(df: DataFrame, text_col: str = "text",
                         key_col: str = "doc_id", k: int = 25,
                         window: int = 16,
                         portable: bool = False) -> DataFrame:
    """Winnowing fingerprints (MOSS-style rolling-hash selection): hash
    every char k-gram of the normalized text, then keep the MINIMUM hash of
    each ``window``-length sliding window, deduplicated. Two documents
    sharing any passage of length ≥ k + window − 1 are GUARANTEED to share
    a fingerprint (the winnowing coverage theorem), which whole-document
    ``fingerprint`` cannot see — this is the shared-passage / partial-copy
    detection primitive.

    Plan shape at 100 TB: k-grams come from the codegen'd
    ``posexplode(sequence) + substr`` pattern (no array materialization,
    like _exploded_shingles), hashing is JVM-native ``xxhash64``, and the
    only shuffle is the per-document window sort — the same single-shuffle
    profile as sessionization. Output rows are (key, fingerprint) longs;
    a self-join on fingerprint finds candidate passage-sharing pairs.

    ``portable=True`` hashes grams as the first 8 md5 hex chars (an
    unsigned 32-bit value — the selection.py/d3 pattern) instead of
    xxhash64, so a DuckDB oracle can replay winnowing selection exactly;
    xxhash64 (JVM-native, 64-bit) stays the production default.
    """
    from pyspark.sql import Window as W

    if portable:
        gram_hash = lambda g: F.conv(  # noqa: E731
            F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
    else:
        gram_hash = F.xxhash64
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    base = df.select(F.col(key_col), norm.alias("_n"))
    grams = base.select(
        key_col,
        F.posexplode(
            F.sequence(F.lit(1), F.greatest(F.length("_n") - (k - 1), F.lit(1)))
        ).alias("_ord", "_i"),
        F.col("_n"),
    ).select(
        key_col, "_ord", "_i",
        gram_hash(F.col("_n").substr(F.col("_i"), F.lit(k))).alias("_h"),
    )
    # winnowing selects minima over FULL windows only: trailing truncated
    # windows would always select the document's final k-gram (window size
    # shrinks to 1 at the end), making any two documents sharing a mere
    # k-char suffix candidate pairs. Documents with fewer than `window`
    # grams keep their single whole-document window (_ord == 0) so every
    # document emits at least one fingerprint.
    win = (W.partitionBy(key_col).orderBy("_i")
           .rowsBetween(W.currentRow, window - 1))
    n_grams = F.count(F.lit(1)).over(W.partitionBy(key_col))
    return (
        grams.select(
            key_col,
            F.min("_h").over(win).alias("fingerprint"),
            F.col("_ord"),
            n_grams.alias("_tot"),
        )
        .filter((F.col("_ord") <= F.col("_tot") - window) | (F.col("_ord") == 0))
        .select(key_col, "fingerprint")
        .distinct()
    )


def shared_span_pairs(df: DataFrame, text_col: str = "text",
                      key_col: str = "doc_id", k: int = 25,
                      window: int = 16, min_shared: int = 2,
                      max_print_docs: int = 100,
                      portable: bool = False) -> DataFrame:
    """Document pairs sharing exact passages: ``(doc_a, doc_b,
    shared_prints)`` for pairs with ≥ ``min_shared`` common winnowing
    fingerprints — the MOSS-style partial-copy / quotation detector that
    whole-document and near-dup hashing both miss. By the winnowing
    coverage theorem any shared passage of length ≥ k + window − 1 chars
    shares at least one print, so ``min_shared`` = 2 (default) asks for
    either one long or two independent shared passages, suppressing
    single-hash flukes.

    Fingerprints appearing in more than ``max_print_docs`` documents are
    boilerplate (headers, license blocks, templates) and are EXCLUDED
    rather than star-capped: unlike dedup buckets, a boilerplate print is
    evidence two docs share the *boilerplate*, not a passage — pairing on
    it is noise (``remove_boilerplate_lines`` is the cleanup tool for the
    text itself), and dropping it also bounds the join fan-out at
    ``max_print_docs²`` per print.

    Plan shape at 100 TB: rolling_fingerprints' single per-doc window
    shuffle → per-print doc lists shuffle on the 8-byte print → self-join
    within print → count per pair. All keys are longs; text never moves.
    """
    prints = rolling_fingerprints(df, text_col=text_col, key_col=key_col,
                                  k=k, window=window, portable=portable)
    docs_per = (prints.groupBy("fingerprint")
                .agg(F.count(F.lit(1)).alias("_df"))
                .filter((F.col("_df") > 1) & (F.col("_df") <= max_print_docs)))
    a, b = prints.alias("a"), prints.alias("b")
    return (
        a.join(docs_per, "fingerprint")
        .join(b, on=[F.col("a.fingerprint") == F.col("b.fingerprint"),
                     F.col(f"a.{key_col}") < F.col(f"b.{key_col}")])
        .groupBy(F.col(f"a.{key_col}").alias("doc_a"),
                 F.col(f"b.{key_col}").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_prints"))
        .filter(F.col("shared_prints") >= min_shared)
    )


def excise_duplicate_spans(df: DataFrame, k: int = 8,
                           text_col: str = "text",
                           key_col: str = "doc_id",
                           portable: bool = False) -> DataFrame:
    """Corpus-level EXACT-substring dedup with span EXCISION — the
    ExactSubstr step of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): any ``k``-token gram occurring more
    than once in the corpus (across documents OR repeated inside one) is
    removed wherever it occurs EXCEPT its globally-first occurrence
    (minimum (doc, position)), by dropping every token its non-keeper
    occurrences cover. This is the removal counterpart of
    :func:`shared_span_pairs` (which only DETECTS shared passages) and
    the cross-document analogue of :func:`remove_repeated_lines`.

    Token-granularity: the reference suffix-array tool excises byte
    ranges; this operates on the alphanumeric token stream (what packing
    and training consume) and returns the surviving tokens space-joined.
    Documents shorter than ``k`` tokens pass through untouched.

    Output: (key, text [survivors space-joined], n_tokens_kept,
    n_tokens_excised, n_excised_grams).

    Scale shape at 100 TB: gram hashes come from a codegen ``transform``
    over ``slice``s of the token array (no per-gram string rows until the
    explode); the corpus-wide duplicate detection shuffles 8-byte
    ``xxhash64`` values with a map-side-combined (count, min-occurrence)
    aggregate; non-keeper occurrences join back on the hash (the
    duplicated-gram side is a small fraction of the corpus, AQE
    broadcast-eligible); ONE shuffle on the document key collects each
    doc's excised gram starts; coverage is an ``exists`` HOF per token —
    O(tokens x excised-starts), and excised-starts is ~0 for clean docs.
    Nothing corpus-scale ever reaches the driver.

    ``portable=True`` swaps xxhash64 for the md5-top-60-bit key (the
    selection.py pattern) so a DuckDB oracle replays the hash — and the
    keeper choice — bit-for-bit; xxhash64 stays the production default
    (same collision argument as the dedup family).
    """
    if portable:
        gram_hash = lambda g: F.conv(  # noqa: E731
            F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
    else:
        gram_hash = F.xxhash64
    key = F.col(key_col)
    base = df.select(key, tokens(F.col(text_col)).alias("_t"))
    n = F.size("_t")
    # gram start positions are 0-based; slice() is 1-based
    hashes = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: gram_hash(F.concat_ws("\x1f", F.slice("_t", i + 1, k))))
    occ = (base.filter(n >= k)
           .select(key, F.posexplode(hashes).alias("_pos", "_h")))
    dup = (occ.groupBy("_h")
           .agg(F.count(F.lit(1)).alias("_c"),
                F.min(F.struct(key.alias("k"),
                               F.col("_pos").alias("p"))).alias("_first"))
           .filter(F.col("_c") >= 2)
           .select("_h", "_first"))
    excised = (occ.join(dup, "_h")
               .filter(~((key == F.col("_first.k"))
                         & (F.col("_pos") == F.col("_first.p"))))
               .groupBy(key_col)
               .agg(F.sort_array(F.collect_list("_pos")).alias("_ex")))
    marked = (base.join(excised, key_col, "left")
              .select(key, "_t",
                      F.coalesce("_ex", F.array().cast("array<int>"))
                      .alias("_ex")))
    covered = lambda t, p: F.exists(  # noqa: E731
        "_ex", lambda s: (s <= p) & (p < s + k))
    kept = F.filter("_t", lambda t, p: ~covered(t, p))
    # two projections: output text aliases the INPUT column name (the
    # remove_repeated_lines lateral-alias hazard)
    staged = marked.select(key, F.size("_t").alias("_n"),
                           kept.alias("_kept"),
                           F.size("_ex").alias("n_excised_grams"))
    return staged.select(
        key,
        F.array_join("_kept", " ").alias(text_col),
        F.size("_kept").cast("bigint").alias("n_tokens_kept"),
        (F.col("_n") - F.size("_kept")).cast("bigint")
        .alias("n_tokens_excised"),
        F.col("n_excised_grams").cast("bigint"),
    )


def tfidf_topk_terms(df: DataFrame, k: int = 10, text_col: str = "text",
                     key_col: str = "doc_id", min_df: int = 1) -> DataFrame:
    """Top-``k`` TF-IDF terms per document — the classic corpus-analysis
    / keyword-extraction primitive.

    Output: (key, token, tf, df, score, rank) with rank 1..k per document
    ordered by (score desc, token asc) — the deterministic tie-break makes
    the result a well-defined SET, so it is oracle-checkable. ``score`` is
    smoothed ``tf * (ln((N+1)/(df+1)) + 1)`` rounded to 6 dp (DuckDB
    replays ``ln`` despite last-ulp drift). ``min_df`` drops tokens seen
    in fewer than that many documents (hapax noise) before scoring.
    Zero-token documents emit no rows.

    Scale shape: two map-side-combined aggregations — (doc, token) term
    frequencies (the shuffle carries compact count rows, never text) and
    the vocabulary-sized document frequencies — then a tf×df join on the
    token (deliberately un-hinted: AQE broadcasts the vocabulary side
    when it fits, falls back to a shuffle join when the vocabulary is
    genuinely huge), a 1-row broadcast of the document total (no driver
    action), and ONE shuffle on the document key where the per-doc top-k
    is a ``slice(array_sort(...))`` over the doc's own distinct tokens —
    bounded by document length, never a global sort or window."""
    key = F.col(key_col)
    tok = df.select(key, F.explode(tokens(F.col(text_col))).alias("_t"))
    tf = tok.groupBy(key_col, "_t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (tf.groupBy("_t").agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") >= int(min_df)))
    ndocs = df.agg(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dfreq, "_t")
        .crossJoin(F.broadcast(ndocs))
        .select(
            key_col,
            F.col("_t"), "tf", "df",
            F.round(
                F.col("tf") * (F.log((F.col("_n") + 1) / (F.col("df") + 1))
                               + F.lit(1.0)),
                6,
            ).alias("score"),
        )
    )
    ranked = (
        scored.groupBy(key_col)
        .agg(F.slice(
            F.array_sort(F.collect_list(F.struct(
                (-F.col("score")).alias("_neg"),
                F.col("_t").alias("token"),
                F.col("tf").alias("tf"),
                F.col("df").alias("df"),
                F.col("score").alias("score"),
            ))),
            1, int(k),
        ).alias("_top"))
        .select(key_col, F.posexplode("_top").alias("_pos", "_row"))
    )
    return ranked.select(
        key_col,
        F.col("_row.token").alias("token"),
        F.col("_row.tf").alias("tf"),
        F.col("_row.df").alias("df"),
        F.col("_row.score").alias("score"),
        (F.col("_pos") + 1).cast("int").alias("rank"),
    )


def compression_ratio(df: DataFrame, text_col: str = "text",
                      key_col: str = "doc_id", level: int = 6) -> DataFrame:
    """zlib deflate ratio per document: ``compressed_bytes / utf8_bytes``.

    The classic cheap boilerplate/repetition signal (used alongside
    :func:`repetition_features`): heavily templated or repeated text
    compresses far below normal prose (ratios ~0.05-0.2 vs ~0.4-0.6),
    while already-compressed or random content sits near/above 1.0.

    The module-wide no-Python-UDF rule has this one documented exception:
    deflate has no Spark built-in, so this is an Arrow-batched pandas UDF
    whose per-row work happens inside zlib's C implementation. Plan shape
    is still a narrow map — no shuffle, text never leaves the executor.
    NULL text yields a NULL ratio; empty text yields NULL too (a 0-byte
    payload has no meaningful ratio)."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s):
        def one(t):
            if t is None:
                return None
            raw = t.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)
        return s.map(one)

    return df.select(
        F.col(key_col),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.round(_ratio(F.col(text_col)), 6).alias("compression_ratio"),
    )


def remove_boilerplate_lines(df: DataFrame, min_docs: int = 3,
                             text_col: str = "text",
                             key_col: str = "doc_id") -> DataFrame:
    """CCNet-style corpus-level line deduplication: drop every line whose
    normalized form (lower + trim) appears in ``min_docs`` or more
    DISTINCT documents — headers, footers, cookie banners and nav menus
    repeat across a crawl; body text does not. Empty lines are structure,
    not boilerplate, and are always kept.

    Output: (key, text with surviving lines in original order,
    n_lines_kept, n_lines_dropped).

    Scale shape: lines explode with their position, the corpus-wide
    document-frequency aggregation runs on ``xxhash64`` of the normalized
    line (the shuffle carries 8-byte hashes, never line text; DuckDB
    oracles replay by grouping the normalized STRINGS — identical absent
    xxhash64 collisions, same argument as the dedup family), the
    drop-set joins back un-hinted (AQE broadcasts it when it fits — it is
    bounded by the number of distinct REPEATED lines, a tiny fraction of
    the corpus), and one shuffle on the document key reassembles the
    text via sort-of-own-lines (bounded by document length, no window).
    """
    key = F.col(key_col)
    lines = df.select(
        key, F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("_pos", "_line"))
    norm = F.lower(F.trim(F.col("_line")))
    keyed = lines.withColumn("_h", F.xxhash64(norm)) \
        .withColumn("_empty", norm == "")
    drops = (keyed.filter(~F.col("_empty"))
             .groupBy("_h")
             .agg(F.count_distinct(key).alias("_ndocs"))
             .filter(F.col("_ndocs") >= int(min_docs))
             .select("_h", F.lit(True).alias("_boiler")))
    marked = (keyed.join(drops, "_h", "left")
              .withColumn("_keep",
                          F.col("_empty") | F.col("_boiler").isNull()))
    return (marked.groupBy(key_col)
            .agg(
                F.array_join(
                    F.transform(
                        F.filter(
                            F.array_sort(F.collect_list(F.struct(
                                F.col("_pos").alias("pos"),
                                F.col("_line").alias("line"),
                                F.col("_keep").alias("keep")))),
                            lambda s: s["keep"]),
                        lambda s: s["line"]),
                    "\n").alias(text_col),
                F.sum(F.when(F.col("_keep"), 1).otherwise(0))
                .cast("bigint").alias("n_lines_kept"),
                F.sum(F.when(F.col("_keep"), 0).otherwise(1))
                .cast("bigint").alias("n_lines_dropped"),
            ))


def remove_repeated_lines(df: DataFrame, text_col: str = "text",
                          key_col: str = "doc_id") -> DataFrame:
    """WITHIN-document repeated-line removal — the Gopher/CCNet cleanup
    step :func:`remove_boilerplate_lines` does not cover (that one drops
    lines repeated ACROSS documents; this drops re-occurrences of a line
    INSIDE one document: scraped pagination artifacts, duplicated
    paragraphs, chat-log echoes). Keeps the FIRST occurrence of each
    normalized (lower+trim) line; empty lines are structure and always
    kept. Output (key, text, n_lines_kept, n_lines_dropped).

    Scale shape: completely ROW-LOCAL — lines live in one row's array,
    first-occurrence is ``array_position(prefix-scan) == own index`` over
    HOF array ops, so the operator is a narrow map with NO shuffle at
    all (unlike the corpus-level variant's doc-frequency aggregation).
    The per-row cost is O(lines²) string compares — bounded by document
    size, not data size; a 1000-line doc is ~10⁶ comparisons, microseconds.
    Engine-portable: DuckDB replays with the same list semantics.
    """
    lines = F.split(F.col(text_col), "\n")
    # r17 (guide §4 — the staging pattern): the normalized-lines array is
    # materialized once per row. Referencing the transform from inside
    # the indexed filter lambda re-ran the O(lines) lower+trim pass per
    # ELEMENT (no CSE across the HOF boundary) — O(lines²) trims on top
    # of the inherent O(lines²) compares. Same array, same compares →
    # bit-identical output (DuckDB replay in tests re-pins it).
    norm = F.transform(lines, lambda ln: F.lower(F.trim(ln)))
    pre = df.select(F.col(key_col), lines.alias("_lines"),
                    norm.alias("_norm"))
    # line i kept iff empty OR its normalized form first occurs at i
    # (two-arg indexed filter lambda; NULL text propagates naturally —
    # split→filter→join/size all yield NULL)
    kept_lines = F.filter(
        F.col("_lines"),
        lambda ln, i: (F.lower(F.trim(ln)) == "")
        | (F.array_position(F.col("_norm"), F.lower(F.trim(ln))) == i + 1))
    # TWO projections, deliberately: the output column is aliased
    # ``text_col`` (same name as the input), and Spark 4's LATERAL COLUMN
    # ALIAS resolution makes later items of the SAME select list resolve
    # ``F.col(text_col)`` against the freshly-aliased CLEANED text — the
    # counts then silently measured the already-deduped lines (and an
    # earlier variant aborted with an out-of-bounds element_at). Arrays
    # are materialized under non-conflicting names first.
    base = pre.select(F.col(key_col), F.col("_lines"),
                      kept_lines.alias("_kept"))
    return base.select(
        F.col(key_col),
        F.array_join("_kept", "\n").alias(text_col),
        F.size("_kept").cast("bigint").alias("n_lines_kept"),
        (F.size("_lines") - F.size("_kept")).cast("bigint")
        .alias("n_lines_dropped"),
    )


def score_features(df: DataFrame, weights: dict[str, float],
                   bias: float = 0.0,
                   score_col: str = "model_score") -> DataFrame:
    """Append ``sigmoid(bias + Σ wᵢ·featureᵢ)`` over named numeric
    columns — the scoring half of the standard corpus quality classifier
    (a logistic regression / fastText-style linear head trained OFFLINE
    on labeled documents; its weights travel here as plan literals, so
    scoring runs at scan speed inside codegen with zero model runtime,
    zero Python, zero shuffle). NULL features contribute 0 (a missing
    feature is no evidence, not a poison)."""
    if not weights:
        raise ValueError("weights must name at least one feature column")
    missing = sorted(set(weights) - set(df.columns))
    if missing:
        raise ValueError(f"weight columns not in the DataFrame: {missing}")
    z = F.lit(float(bias))
    for name, w in sorted(weights.items()):
        z = z + F.coalesce(F.col(name).cast("double"), F.lit(0.0)) \
            * F.lit(float(w))
    return df.withColumn(score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def quality_classifier_score(df: DataFrame, weights: dict[str, float],
                             bias: float = 0.0, text_col: str = "text",
                             key_col: str = "doc_id") -> DataFrame:
    """Convenience: :func:`quality_features` piped into
    :func:`score_features` — (key, engineered features, model_score) in
    one narrow pass. Weight keys are quality_features' column names
    (n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    quality_score)."""
    return score_features(
        quality_features(df, text_col=text_col, key_cols=(key_col,)),
        weights, bias)


def train_quality_classifier(df: DataFrame, label_col: str,
                             feature_cols: tuple[str, ...] = (
                                 "n_chars", "n_tokens", "mean_token_len",
                                 "punct_ratio", "stopword_ratio"),
                             key_col: str = "doc_id",
                             sample_n: int = 100_000, iters: int = 300,
                             lr: float = 0.5, l2: float = 1e-3,
                             ) -> tuple[dict[str, float], float]:
    """Fit the linear quality classifier IN-ENGINE: returns ``(weights,
    bias)`` ready for :func:`score_features` / :func:`quality_classifier_score`.

    The training half of the standard corpus-filter recipe (label a seed
    set good/bad, fit a linear head, score the whole corpus). Same design
    rationale as ``similarity.train_kmeans_centroids``: a linear head
    over a handful of engineered features needs only a representative
    SAMPLE, so we pull the ``sample_n`` labeled rows with the smallest
    ``xxhash64(key)`` (deterministic, partitioning-independent — one
    distributed top-k, no RNG) and run full-batch logistic-regression
    gradient descent driver-side in numpy (milliseconds). The
    corpus-sized work — feature extraction and scoring — stays
    distributed and codegen'd; at 100 TB you fit on 10⁵ labeled docs and
    score 10¹¹ with the returned literals. Features are standardized for
    conditioning; the returned weights/bias are FOLDED back to raw
    feature units so they drop straight into ``score_features``.

    ``df`` must already carry ``feature_cols`` (e.g. ``quality_features``
    output joined to labels); ``label_col`` is 0/1 (or boolean). NULL
    features are treated as 0, mirroring ``score_features``'s rule, so
    train and score agree on missing data.
    """
    import numpy as np

    if not feature_cols:
        raise ValueError("feature_cols must name at least one feature")
    missing = sorted((set(feature_cols) | {label_col}) - set(df.columns))
    if missing:
        raise ValueError(f"columns not in the DataFrame: {missing}")
    rows = (
        df.select(
            *[F.coalesce(F.col(c).cast("double"), F.lit(0.0)).alias(c)
              for c in feature_cols],
            F.col(label_col).cast("double").alias("_y"),
            F.xxhash64(F.col(key_col)).alias("_h"),
        )
        .orderBy("_h").limit(sample_n).collect()
    )
    if not rows:
        raise ValueError("no labeled rows to train on")
    x = np.array([[r[c] for c in feature_cols] for r in rows])
    y = np.array([r["_y"] for r in rows])
    if not set(np.unique(y)) <= {0.0, 1.0}:
        raise ValueError(f"{label_col} must be 0/1, got {sorted(set(y))[:5]}")
    mu, sd = x.mean(axis=0), x.std(axis=0)
    sd = np.where(sd < 1e-12, 1.0, sd)  # constant feature: weight stays 0
    xs = (x - mu) / sd
    w = np.zeros(len(feature_cols))
    b = 0.0
    n = len(y)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xs @ w + b)))
        g = xs.T @ (p - y) / n + l2 * w
        w -= lr * g
        b -= lr * float((p - y).mean())
    # fold standardization into raw-unit weights: z = (x-μ)/σ·w + b
    raw_w = w / sd
    raw_b = b - float((mu / sd) @ w)
    return ({c: float(v) for c, v in zip(feature_cols, raw_w)}, raw_b)


# ---------------------------------------------------------------------------
# feature-hashed text embeddings (r9) — text → vector without a model
# ---------------------------------------------------------------------------


def hash_embedding(df: DataFrame, text_col: str = "text",
                   key_col: str = "doc_id", dim: int = 64,
                   portable: bool = False) -> DataFrame:
    """(key, embedding array<double>): signed feature-hashing ("hashing
    trick", Weinberger et al. 2009) of the token bag into a fixed
    ``dim``-dimensional L2-normalized vector — a deterministic,
    model-free text embedding that feeds every vector operator in the
    repo as-is (``similarity.brute_force_topk``/``lsh_topk``/
    ``ivf_topk``, ``dedup.embedding_neardup_pairs``, ``dedup.semdedup``):
    vocabulary-overlapping documents land at high cosine, so semantic-ish
    dedup and clustering run text-only, with no embedding model in the
    container.

    Each token t adds sign(t) (±1, from one hash bit) at bucket(t) =
    hash(t) mod dim; the signed sum is then L2-normalized. Signs make
    colliding tokens cancel in expectation instead of biasing counts
    (the kernel-approximation argument in the paper). Zero-token
    documents (and total-cancellation degenerates) emit the zero vector
    rather than NULL — cosine 0 against everything, so they never pair.

    Plan shape at 100 TB: one narrow codegen map, NO shuffle and NO
    Python — the accumulation is transform(sequence(0, dim-1)) over the
    token array (O(tokens × dim) register work per row, the same
    measured HOF-fold trade as similarity.py's dot product: it stays
    inside whole-stage codegen where an explode + groupBy would shuffle
    one row per token). ``portable=True`` swaps xxhash64 for md5-derived
    hashes so DuckDB replays the exact vector (tests pin it).
    """
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    toks = tokens(F.col(text_col))
    if portable:
        # 60-bit md5 value: bucket = h % dim, sign from the low bit of
        # the NEXT hex nibble (h div dim parity would correlate with
        # bucket for power-of-two dims; an independent bit is cleaner)
        h = lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")  # noqa: E731
        s = lambda t: F.when(  # noqa: E731
            F.conv(F.substring(F.md5(t), 16, 1), 16, 10).cast("long") % 2 == 0,
            F.lit(1.0)).otherwise(F.lit(-1.0))
    else:
        h = lambda t: F.xxhash64(t)  # noqa: E731
        s = lambda t: F.when(F.xxhash64(t, F.lit("sign")) % 2 == 0,  # noqa: E731
                             F.lit(1.0)).otherwise(F.lit(-1.0))
    bucket = lambda t: F.pmod(h(t), F.lit(dim))  # noqa: E731
    # per-token (bucket, sign) computed ONCE in its own projection — the
    # accumulation below references the array 'dim' times, and hashing
    # inside that lambda would re-evaluate md5/xxhash per (i, token)
    # pair. Separate select, non-conflicting name: the Spark 4
    # lateral-alias + HOF resolution hazard (see remove_repeated_lines).
    pre = df.select(
        F.col(key_col),
        F.transform(toks, lambda t: F.struct(
            bucket(t).alias("b"), s(t).alias("sg"))).alias("_bs"),
    )
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.aggregate(
            F.col("_bs"), F.lit(0.0),
            lambda acc, e: acc + F.when(e["b"] == i.cast("bigint"),
                                        e["sg"]).otherwise(F.lit(0.0))),
    )
    # materialize the O(tokens × dim) accumulation once — the norm and
    # both normalize branches below reference it, and each reference
    # would re-run the full fold otherwise
    mid = pre.select(F.col(key_col), raw.alias("_raw"))
    # ... and the norm too: a non-column expression inside the normalize
    # lambda is re-evaluated PER ELEMENT (no CSE across the HOF
    # boundary), which would make the divide pass O(dim²) per row
    mid = mid.select(
        F.col(key_col), "_raw",
        F.sqrt(F.aggregate(F.col("_raw"), F.lit(0.0),
                           lambda a, v: a + v * v)).alias("_nrm"))
    emb = F.when(F.col("_nrm") > 0,
                 F.transform(F.col("_raw"), lambda v: v / F.col("_nrm"))) \
        .otherwise(F.transform(F.col("_raw"), lambda v: v * 0.0))
    return mid.select(F.col(key_col), emb.alias("embedding"))
