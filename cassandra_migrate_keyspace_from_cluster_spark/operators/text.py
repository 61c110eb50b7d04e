"""Text-analysis operators for a training-data pipeline (SURVEY.md §2
Part F: tokenization, TF-IDF, n-grams, language ID, quality scoring,
token counting, fingerprinting).

Everything is pure DataFrame expressions — explode/groupBy/window — so
it scales by partitioning on (doc, term) keys; no Python in the hot
path. Formulas are PINNED (documented per function) so the DuckDB
oracle can reproduce them digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_tokens(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, token, pos) — positions 1-based."""
    return docs.select(
        id_col, F.posexplode(F.split("text", " ")).alias("pos0", "token")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "token")


def word_counts(docs: DataFrame) -> DataFrame:
    """Corpus-wide token counts (partial aggregation makes the shuffle
    carry only (token, count) per partition — 100-TB-safe)."""
    return (
        doc_tokens(docs)
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def tf_idf(docs: DataFrame) -> DataFrame:
    """Pinned TF-IDF: tf = count/doc_len, idf = ln((N+1)/(df+1)),
    score = tf * idf. (Deliberately NOT MLlib's IDF variant — the
    formula is pinned so both engines compute identical doubles.)

    Dataflow: ONE corpus explode → (doc, term) counts, then doc_len
    and df as PARTITIONED windows over that compact frame (sum(cnt)
    over doc_id ≡ token count of the doc; count(*) over token ≡ docs
    containing it). Versus the aggregate+join form this is one fewer
    corpus explode, two fewer joins, and — decisively at 100 TB — no
    O(vocab) broadcast of the df table (vocab grows with noise tokens;
    the windows shuffle only the (doc, term) pairs they rank). Both
    window keys are high-cardinality, so no single-reducer hazard;
    stopword df-skew equals the old groupBy-token skew."""
    term_counts = doc_tokens(docs).groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    tf = F.col("cnt").cast("double") / F.col("doc_len")
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
    return (
        term_counts.withColumn(
            "doc_len", F.sum("cnt").over(Window.partitionBy("doc_id"))
        )
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("token")))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(tf, 6).alias("tf"),
            F.round(idf, 6).alias("idf"),
            F.round(tf * idf, 6).alias("tfidf"),
        )
    )


def bigrams(docs: DataFrame) -> DataFrame:
    """(lang, bigram, n) — bigrams zipped from two shifted slice views
    of the token array (no MLlib NGram needed; stays in codegen). Same
    slice/zip_with shape as operators/dedup.shingles and for the same
    reason: an ``element_at(toks, i)`` inside a transform lambda
    re-runs the split per element per reference (O(tokens²))."""
    toks = F.split("text", " ")
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    grams = F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        docs.select("lang", F.explode(grams).alias("bigram"))
        .groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def lang_profiles(docs: DataFrame, top_n: int = 10) -> DataFrame:
    """Top-N most frequent tokens per language (the corpus-derived
    'fingerprint' used by classify_language).

    Docs with NULL lang are excluded: a profile is keyed by language
    IDENTITY, and an unlabeled doc can train no profile (a NULL
    candidate would also sort OPPOSITELY through the two engines'
    ASC-null defaults in the argmax tie-break)."""
    counts = (
        doc_tokens(docs.select("doc_id", "text"))
        .join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang").isNotNull())
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .groupBy("lang")
        .agg(F.sort_array(F.collect_set("token")).alias("profile"))
    )


def classify_language(docs: DataFrame, top_n: int = 10) -> DataFrame:
    """N-gram-profile language ID: score(doc, lang) = |doc_tokens ∩
    profile(lang)|; predict argmax with alphabetical tie-break.
    Deterministic and fully relational → oracle-checkable."""
    profiles = lang_profiles(docs, top_n)
    d = docs.select(
        "doc_id", "lang", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    scored = d.crossJoin(F.broadcast(profiles.select(
        F.col("lang").alias("cand_lang"), "profile"
    ))).select(
        "doc_id",
        "lang",
        "cand_lang",
        F.size(F.array_intersect("toks", "profile")).alias("overlap"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("overlap").desc(), F.col("cand_lang")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand_lang").alias("pred_lang"),
            F.col("overlap").cast("bigint").alias("overlap"),
            # BIGINT: nullable-boolean pandas carrier differs per engine
            (F.col("cand_lang") == F.col("lang")).cast("bigint").alias("is_correct"),
        )
    )


def quality_scores(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Pinned document quality score:
       length_score    = least(n_chars / 500, 1.0)
       type_token_ratio= n_distinct_tokens / n_tokens
       avg_tok_score   = least(avg_token_len / 10, 1.0)
       quality         = 0.4*length + 0.3*ttr + 0.3*avg_tok  (6dp)

    Every metric is a RATIONAL of small integers, so the 6dp rounding
    is done in exact bigint arithmetic (round-half-up of num/den =
    ``(2·num·10⁶ + den) div (2·den)``) instead of ``round(double, 6)``.
    The double round is engine-ambiguous exactly on half-boundaries:
    Spark rounds the double's shortest decimal form HALF_UP while
    DuckDB rounds the binary value, so a quality landing on ...x5e-7
    (first seen: 1 doc in 5000 at sf0.1) rounds differently per
    engine. Integer rounding is boundary-exact on both sides; for all
    non-boundary inputs it equals the old rounding (hash-compatible
    with the driver-green r3 rows, re-verified by parity).

    ``keep`` names extra input columns to carry through unchanged, so a
    composite (f18) can score in the SAME scan/stage as an upstream
    per-row stage instead of re-scanning the table and equi-joining the
    scores back on doc_id — quality is per-row, so scoring a filtered
    frame equals filtering joined scores."""
    toks = F.split("text", " ")
    base = docs.select(
        "doc_id",
        *keep,
        F.size(toks).cast("bigint").alias("__n"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("__u"),
        F.aggregate(
            toks, F.lit(0).cast("bigint"), lambda a, x: a + F.length(x).cast("bigint")
        ).alias("__L"),
        F.least(F.col("n_chars").cast("bigint"), F.lit(500).cast("bigint")).alias(
            "__nc5"
        ),
    ).withColumn("__L10", F.expr("least(__L, 10 * __n)"))

    def r6_rat(num: str, den: str) -> F.Column:
        # exact half-up 6dp round of the rational num/den (both bigint
        # expressions; numerators stay well under 2^53)
        return F.expr(
            f"cast((2 * ({num}) * 1000000 + ({den})) div (2 * ({den})) as double)"
            " / 1000000"
        )

    return base.select(
        "doc_id",
        *keep,
        r6_rat("__nc5", "500").alias("length_score"),
        r6_rat("__u", "__n").alias("type_token_ratio"),
        r6_rat("__L10", "10 * __n").alias("avg_tok_score"),
        # 0.4·nc5/500 + 0.3·u/n + 0.3·L10/(10n) over denominator 2500n
        r6_rat("2 * __n * __nc5 + 750 * __u + 75 * __L10", "2500 * __n").alias(
            "quality"
        ),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex
    ([a-z]+ runs | digits | other), and the chars/4 LLM estimate."""
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+', 0))")
        .cast("bigint")
        .alias("bpe_ish_tokens"),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("est_llm_tokens"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Pinned rolling-hash fingerprint over the token stream:
       contrib(tok) = 7*len(tok) + ascii(tok[0])
       h := (h*31 + contrib) mod 1e9+7      (h0 = 0)
    Pure integer math → identical across engines. Expressed as
    transform-then-fold so the DuckDB oracle (list_reduce has no
    initial-value argument) can prepend the 0 seed to the same list."""
    toks = F.split("text", " ")
    contrib = F.transform(
        toks, lambda x: F.length(x).cast("bigint") * 7 + F.ascii(x).cast("bigint")
    )
    h = F.aggregate(
        contrib,
        F.lit(0).cast("bigint"),
        lambda acc, x: F.pmod(acc * 31 + x, F.lit(1_000_000_007).cast("bigint")),
    )
    return docs.select("doc_id", h.alias("fingerprint"))


def count_min_sketch(
    tokens: DataFrame,
    depth: int = 4,
    width: int = 512,
    token_col: str = "token",
) -> DataFrame:
    """PINNED count-min sketch over a token stream: ``depth`` hash rows
    of ``width`` cells; cell(token, r) = md5(token ':' r) first 15 hex
    digits mod width (cross-engine replayable, like f24's pinned
    MinHash). Returns the sketch as rows (r, cell, n_cell).

    Mergeability (the scale law, pytest-asserted): sketches of disjoint
    corpus slices ADD cell-wise to the whole-corpus sketch, so at
    100 TB each partition/batch/day keeps an O(depth*width) sketch and
    any rollup is a cell-wise sum — never a rescan. Point estimates
    (min over rows of the probed cells) overcount by at most the
    classic eps*N bound, never undercount.
    """
    rows_ = F.array(*[F.lit(i) for i in range(depth)])
    cells = tokens.select(token_col, F.explode(rows_).alias("r"))
    return (
        cells.withColumn("cell", cms_cell(F.col(token_col), F.col("r"), width))
        .groupBy("r", "cell")
        .agg(F.count(F.lit(1)).alias("n_cell"))
    )


def cms_cell(token, r, width: int = 512):
    """The pinned CMS cell hash: md5(token ':' r) → 60-bit int → mod width."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(token, F.lit(":"), r.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % width
    )
