"""Text analysis over the ``documents`` corpus: stats, quality, n-grams, TF-IDF.

ClickHouse ships tokenization/string analytics as scalar functions
(`splitByChar`, `ngrams`, `arrayJoin`) [P-ch]; the Spark-native shape is
`split` + higher-order array functions + `explode`, all JVM-side builtins —
no Python in any of these paths.

Scale notes (100 TB posture): every operator here is embarrassingly parallel
per document until the final aggregate; token explosion multiplies rows ~60×
(avg tokens/doc) but the exploded stream aggregates map-side before the
shuffle (partial hash agg on (token) / (doc_id, token)), so the shuffle
carries only distinct-key partials. TF-IDF's doc-frequency join broadcasts
the term→df side when small; at full vocabulary scale it's a shuffle join on
`term` — both sides pre-aggregated, so the join input is |vocab| + |doc×term|
rows, not raw tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# Tokenization convention shared by every text operator and its oracle:
# documents.text is space-separated (FIXTURES.md §2), so a single-space split
# is the exact tokenizer in both engines. (Function, not constant — Column
# construction needs an active SparkContext.)
def tokens() -> F.Column:
    return F.split(F.col("text"), " ")


@query(
    "text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           ROUND(AVG(len(string_split(text, ' '))), 2) AS avg_tokens,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           ROUND(AVG(CAST(n_chars - len(string_split(text, ' ')) + 1
                          AS DOUBLE) / len(string_split(text, ' '))), 4)
               AS avg_token_len
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics: doc/token/char counts, token length.

    avg_token_len derives from n_chars minus the (tokens-1) separator spaces
    — pure arithmetic, no second pass over the text.
    """
    docs = table(spark, sf_dir, "documents")
    ntok = F.size(tokens())
    return (
        docs.select("lang", "n_chars", ntok.alias("ntok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            F.round(F.avg("ntok"), 2).alias("avg_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
            F.round(
                F.avg((F.col("n_chars") - F.col("ntok") + 1).cast("double") / F.col("ntok")),
                4,
            ).alias("avg_token_len"),
        )
    )


@query(
    "text_quality_filter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE n_chars BETWEEN 120 AND 480
      AND lang IN ('en', 'de', 'fr')
      AND len(string_split(text, ' ')) >= 20
      AND n_chars - len(string_split(text, ' ')) + 1
          <= 8 * len(string_split(text, ' '))
      AND NOT contains(text, 'error')
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style heuristic quality gate: length bounds, language allowlist,
    minimum token count, mean-word-length cap, badword exclusion.

    All predicates are scan-level conjuncts — at scale the length/lang ones
    push into the parquet reader (row-group stats prune on n_chars).
    """
    docs = table(spark, sf_dir, "documents")
    ntok = F.size(tokens())
    return docs.filter(
        F.col("n_chars").between(120, 480)
        & F.col("lang").isin("en", "de", "fr")
        & (ntok >= 20)
        & ((F.col("n_chars") - ntok + 1) <= 8 * ntok)
        & ~F.col("text").contains("error")
    ).select("doc_id", "lang", "source", "n_chars")


@query(
    "text_ngrams",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    grams AS (
        SELECT t[i] || ' ' || t[i + 1] AS ngram
        FROM toks, UNNEST(range(1, len(t))) AS r(i)
    )
    SELECT ngram, COUNT(*) AS freq
    FROM grams
    GROUP BY ngram
    ORDER BY freq DESC, ngram
    LIMIT 25
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 word bigrams.

    Bigrams are built array-side (one `transform` over an index `sequence`)
    before the explode, so the per-doc work stays in whole-stage codegen; the
    frequency count partial-aggregates map-side. Tie-break on the ngram
    string makes the top-k deterministic.
    """
    docs = table(spark, sf_dir, "documents")
    # Pre-split in a codegen'd projection: HOF lambdas run interpreted with
    # no subexpression elimination, so split(text) INSIDE the lambda would
    # re-split the doc per bigram (O(tokens²) per doc).
    grams = docs.withColumn("_w", F.split("text", " ")).select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(_w) - 2),"
                " i -> concat_ws(' ', _w[i], _w[i + 1]))"
            )
        ).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "ngram")
        .limit(25)
    )


@query(
    "tfidf_topterms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
    """,
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (idf = ln(N/df), raw tf).

    Plan shape at scale: ONE explode → tf keyed on (doc_id, term) → df
    derived FROM tf (tf has exactly one row per (doc, term), so df(term) is
    a count over tf — no second explode, no countDistinct) → broadcast df
    (|vocab| rows) into the tf side → windowed top-k per doc. N comes from
    a broadcast 1-row aggregate instead of an eager .count() so the whole
    key is one lazily-planned job.
    """
    docs = table(spark, sf_dir, "documents")
    # Hash-repartition the exploded tokens on doc_id BEFORE the tf
    # aggregate (r12 optimization, guide §2.4): HashPartitioning(doc_id)
    # satisfies the (doc_id, term) grouping AND the doc_id window below, so
    # ONE exchange serves tf, the df branch (ReusedExchange — the subtree
    # below the exchange is now identical in both branches, where before
    # column pruning forced two separate scan+explode passes), and the
    # top-k window. Plan: 5 exchanges + 2 scan/explodes -> 3 exchanges +
    # 1 scan/explode. Trade-off at scale: the exchange carries raw tokens
    # (~2-5x the distinct (doc, term) rows a map-side partial agg would
    # shuffle), but it replaces TWO full tf shuffles + a second explode
    # pass, so net bytes moved drop unless per-doc term repetition is
    # extreme.
    #
    # Break-even, measured (r13, verdict task 9; interleaved best-of-3 on
    # synthetic corpora where the token source is a pre-materialized RDD,
    # i.e. re-deriving tokens is nearly free): the repartition shape loses
    # 2.1x already at 2 tokens/(doc,term), 4.6x at 50, 8.9x at 400 —
    # while on the parquet fixture (scan+split+explode dominates, the
    # regime this operator actually runs in) the same interleaved A/B is a
    # wash (1.18 vs 1.22 s). Rule of thumb for production: keep this shape
    # when tokenization is recomputed per branch (raw text scans); switch
    # back to the two-shuffle partial-agg shape when tokens come
    # pre-materialized AND per-(doc,term) repetition is high, because then
    # the savings is only the exchange and the exchange is the cost.
    tok = docs.select("doc_id", F.explode(tokens()).alias("term")).repartition(
        "doc_id"
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "text_lang_id",
    oracle="""
    WITH scored AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '),
                   t -> list_contains(['the', 'data', 'query'], t))) AS s_en,
               len(list_filter(string_split(text, ' '),
                   t -> list_contains(['stream', 'batch', 'merge'], t))) AS s_de,
               len(list_filter(string_split(text, ' '),
                   t -> list_contains(['join', 'filter', 'sort'], t))) AS s_es,
               len(list_filter(string_split(text, ' '),
                   t -> list_contains(['table', 'column', 'vector'], t))) AS s_fr,
               len(list_filter(string_split(text, ' '),
                   t -> list_contains(['hash', 'scan', 'window'], t))) AS s_zh
        FROM documents
    )
    SELECT doc_id,
           CASE greatest(s_de, s_en, s_es, s_fr, s_zh)
                WHEN s_de THEN 'de' WHEN s_en THEN 'en' WHEN s_es THEN 'es'
                WHEN s_fr THEN 'fr' ELSE 'zh' END AS pred_lang,
           CAST(greatest(s_de, s_en, s_es, s_fr, s_zh) AS BIGINT) AS score
    FROM scored
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-profile language ID: score each doc against per-language
    marker-token sets, predict the argmax (ties break alphabetically via
    the CASE evaluation order — identical in both engines).

    The real-world shape (character n-gram profiles × class scores ×
    argmax) with profiles drawn from the fixture vocabulary. One
    codegen'd projection per doc — embarrassingly parallel, no shuffle.
    """
    markers = {
        "de": ("stream", "batch", "merge"),
        "en": ("the", "data", "query"),
        "es": ("join", "filter", "sort"),
        "fr": ("table", "column", "vector"),
        "zh": ("hash", "scan", "window"),
    }
    docs = table(spark, sf_dir, "documents")
    scores = {
        lang: F.expr(
            "size(filter(split(text, ' '), t -> array_contains(array({}), t)))".format(
                ", ".join(f"'{w}'" for w in ws)
            )
        ).alias(f"s_{lang}")
        for lang, ws in markers.items()
    }
    scored = docs.select("doc_id", *scores.values())
    best = F.greatest(*[F.col(f"s_{lg}") for lg in markers])
    pred = F.when(F.col("s_de") == best, "de")
    for lg in ("en", "es", "fr"):
        pred = pred.when(F.col(f"s_{lg}") == best, lg)
    pred = pred.otherwise("zh")
    return scored.select(
        "doc_id", pred.alias("pred_lang"), best.cast("bigint").alias("score")
    )


@query(
    "text_tokens_bpe",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '),
                w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS BIGINT)
               AS n_subtokens,
           ROUND(CAST(list_sum(list_transform(string_split(text, ' '),
                      w -> CAST(ceil(len(w) / 4.0) AS BIGINT))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS subtoken_ratio
    FROM documents
    """,
)
def text_tokens_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting, whitespace + BPE-ish: subword count models each word
    as ceil(len/4) merge units (the byte-pair regime where trained merges
    cap subwords at ~4 chars). The ratio is the tokens-per-word inflation
    an LLM pipeline budgets context length with.
    """
    docs = table(spark, sf_dir, "documents")
    ntok = F.size(tokens())
    nsub = F.expr(
        "aggregate(split(text, ' '), cast(0 as bigint),"
        " (acc, w) -> acc + cast(ceil(length(w) / 4.0) as bigint))"
    )
    return docs.select(
        "doc_id",
        ntok.alias("n_tokens"),
        nsub.alias("n_subtokens"),
        F.round(nsub.cast("double") / ntok, 4).alias("subtoken_ratio"),
    )


@query(
    "text_fingerprint",
    oracle="""
    WITH th AS (
        SELECT doc_id,
               list_transform(string_split(text, ' '),
                   w -> list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                           list_transform(range(1, len(w) + 1),
                                          i -> CAST(ascii(w[i]) AS BIGINT))),
                       (a, c) -> (a * 31 + c) % 1000000007)) AS h
        FROM documents
    )
    SELECT doc_id,
           COALESCE(array_to_string(
               list_sort(list_distinct(
                   list_transform(range(1, len(h) - 1),
                       i -> (h[i] * 961 + h[i + 1] * 31 + h[i + 2]) % 1000000007)
               ))[:4], ','), '') AS fingerprint
    FROM th
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: rolling polynomial hash over
    token trigrams, keep the 4 smallest distinct values.

    The hash is an engine-portable polynomial fold ((a·31+c) mod 1e9+7 over
    ascii codes, then a trigram combine) so the fingerprint is
    hash-checkable against DuckDB — unlike xxhash64, whose seeds are
    engine-private (cf. dedup_simhash, which uses the fast path and is
    rows-only). MOSS-style near-dup detection then compares fingerprint
    overlap instead of full shingle sets.

    The fingerprint ships as a comma-joined string, not array<bigint>: the
    driver's canonicalizer hashes scalar cells only (round-1 err on array
    cols), and a CSV of the 4 minima is the same information.
    """
    docs = table(spark, sf_dir, "documents")
    th = F.expr(
        "transform(split(text, ' '), w ->"
        " aggregate(transform(sequence(1, length(w)),"
        "                     i -> cast(ascii(substring(w, i, 1)) as bigint)),"
        "           cast(0 as bigint), (a, c) -> (a * 31 + c) % 1000000007))"
    )
    fp = F.expr(
        "array_join(slice(array_sort(array_distinct("
        " transform(sequence(0, size(h) - 3),"
        "           i -> (h[i] * 961 + h[i + 1] * 31 + h[i + 2]) % 1000000007)"
        ")), 1, 4), ',')"
    )
    return docs.select("doc_id", th.alias("h")).select("doc_id", fp.alias("fingerprint"))


@query(
    "text_normalize",
    oracle=r"""
    WITH noisy AS (
        SELECT doc_id,
               concat('  ', upper(substr(text, 1, 40)), '!!!   ', text,
                      ' (v', CAST(doc_id % 3 AS VARCHAR), ')') AS raw
        FROM documents)
    SELECT doc_id,
           trim(regexp_replace(regexp_replace(lower(raw), '[^a-z0-9 ]', '', 'g'),
                               ' +', ' ', 'g')) AS norm,
           md5(trim(regexp_replace(
                regexp_replace(lower(raw), '[^a-z0-9 ]', '', 'g'),
                ' +', ' ', 'g'))) AS norm_md5
    FROM noisy ORDER BY doc_id
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization for dedup keys: lowercase, strip
    non-alphanumerics, collapse whitespace, trim — then the md5 content key
    `dedup_exact` would group on. The fixture corpus is already clean, so
    noise (case flips, punctuation, padding, a version suffix) is injected
    deterministically first and the normalizer must erase it.

    Pure per-row projection (codegen'd, no shuffle); the md5 key is what
    ships to the dedup shuffle — 16 bytes per doc, never the text.
    """
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("  "),
        F.upper(F.substring("text", 1, 40)),
        F.lit("!!!   "),
        F.col("text"),
        F.lit(" (v"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit(")"),
    )
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    return d.select(
        "doc_id", norm.alias("norm"), F.md5(norm.cast("binary")).alias("norm_md5")
    ).orderBy("doc_id")


@query(
    "text_pii_scrub",
    oracle=r"""
    WITH noisy AS (
        SELECT doc_id,
               concat(substr(text, 1, 60), ' contact user', CAST(doc_id AS VARCHAR),
                      '@mail.example.com or +1-555-',
                      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                      ' id ', CAST(1000000 + doc_id AS VARCHAR)) AS raw
        FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(raw,
               '[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+', '<EMAIL>', 'g'),
               '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}', '<PHONE>', 'g'),
               '[0-9]{7,}', '<ID>', 'g') AS scrubbed,
           len(regexp_extract_all(raw, '[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+'))
             AS n_emails
    FROM noisy ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: replace emails, phone-shaped
    numbers, and long digit runs with typed placeholder tags, and count the
    redactions. PII is injected deterministically (the fixture corpus has
    none), and both engines run the same conservative RE2-compatible
    patterns — no lookarounds, so Java and RE2 agree.

    Per-row regexp projection, codegen'd; at 100 TB this is the map-side
    scrub pass that runs fused with the scan before any shuffle.
    """
    d = table(spark, sf_dir, "documents")
    raw = F.concat(
        F.substring("text", 1, 60),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" id "),
        (F.col("doc_id") + 1000000).cast("string"),
    )
    email = r"[a-zA-Z0-9._]+@[a-zA-Z0-9.-]+"
    phone = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"
    longid = r"[0-9]{7,}"
    noisy = d.select("doc_id", raw.alias("raw"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), email, "<EMAIL>"), phone, "<PHONE>"
        ),
        longid,
        "<ID>",
    )
    return noisy.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.expr(f"regexp_extract_all(raw, '{email}', 0)")).alias(
            "n_emails"
        ),
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle="""
    WITH feat AS (
        -- Every ratio here is a small-denominator rational, so float ROUND
        -- lands on exact .00005 boundaries with real probability and the two
        -- engines' rounding modes disagree (Spark HALF_UP on the decimal
        -- repr vs DuckDB on the binary value — observed at docs 386, 349).
        -- All rounding is therefore exact integer half-up:
        --   round(p/q, 4) = (p*20000 + q) // (2q) / 10000.0
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
               CAST(len(replace(text, ' ', '')) AS BIGINT) AS chars,
               CAST(len(list_filter(string_split(text, ' '),
                       t -> t IN ('data', 'model', 'query', 'user', 'the')))
                     AS BIGINT) AS c
        FROM documents
    )
    SELECT doc_id, n AS n_tokens,
           ((chars * 20000 + n) // (2 * n)) / 10000.0 AS avg_wlen,
           ((c * 20000 + n) // (2 * n)) / 10000.0 AS common_ratio,
           (((2 * n * LEAST(n, 60) + 9 * LEAST(chars, 8 * n) + 48 * (n - c))
             * 20000 + 240 * n) // (480 * n)) / 10000.0 AS quality
    FROM feat ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous document quality score (Gopher/C4-style): length credit,
    mean-word-length credit, repetitive-common-token penalty, combined into
    one [0,1] score. The binary gate variant is `text_quality_filter`; this
    is the trainable-weights form a curation pipeline thresholds per corpus.

    One projection pass — the token array is computed once per branch by
    Catalyst CSE. Every emitted ratio is produced by exact integer half-up
    rounding (p*20000 + q) div (2q) / 1e4 rather than float ROUND: the
    features are small-denominator rationals that land exactly on rounding
    boundaries where engine ROUND modes diverge (see oracle comment).
    """
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    # All integer feature extraction; rounding is exact integer half-up —
    # see the oracle comment (float ROUND diverges on these rationals).
    feat = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("bigint")
        .alias("chars"),
        F.size(
            F.filter(toks, lambda t: t.isin("data", "model", "query", "user", "the"))
        )
        .cast("bigint")
        .alias("c"),
    )
    return feat.selectExpr(
        "doc_id",
        "n AS n_tokens",
        # 10000.0D: the plain 10000.0 literal is a DECIMAL in Spark SQL and
        # would make these columns decimal instead of double.
        "((chars * 20000 + n) div (2 * n)) / 10000.0D AS avg_wlen",
        "((c * 20000 + n) div (2 * n)) / 10000.0D AS common_ratio",
        "(((2 * n * LEAST(n, 60L) + 9 * LEAST(chars, 8 * n) + 48 * (n - c))"
        " * 20000 + 240 * n) div (480 * n)) / 10000.0D AS quality",
    ).orderBy("doc_id")


@query(
    "text_entropy",
    oracle="""
    WITH tf AS (
        SELECT doc_id, t AS tok, COUNT(*) AS c
        FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        GROUP BY doc_id, t
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 4) AS entropy,
           ROUND((log2(SUM(c)) - SUM(c * log2(c)) / SUM(c))
                 / log2(GREATEST(COUNT(*), 2)), 4) AS entropy_norm
    FROM tf GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-distribution Shannon entropy — the
    perplexity-proxy quality signal (machine-generated / template text has
    low entropy, natural prose sits near the normalized ceiling). Uses the
    algebraic form H = log2(n) − Σc·log2(c)/n so every term is a function
    of integer counts; `entropy_norm` divides by the max possible
    (log2 distinct) for a [0,1] score.

    Scale shape: one explode → partial-aggregated (doc_id, token) count →
    one groupBy doc_id. Both shuffles key on doc_id/token; entropy math is
    codegen'd projection arithmetic. Transcendental outputs rounded at 4dp
    (float-sum reorder drift is ulp-scale; log2 values never sit on
    rounding boundaries, unlike the rational ratios in
    `text_quality_score`).
    """
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = F.sum("c")
    h = F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n
    return (
        tf.groupBy("doc_id")
        .agg(
            n.cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.round(h, 4).alias("entropy"),
            F.round(
                h / F.log2(F.greatest(F.count(F.lit(1)), F.lit(2))), 4
            ).alias("entropy_norm"),
        )
        .orderBy("doc_id")
    )


@query(
    "doc_repetition",
    oracle="""
    WITH tf AS (
        SELECT doc_id, t AS tok, COUNT(*) AS c
        FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
        GROUP BY doc_id, t
    ),
    words AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(MAX(c) AS BIGINT) AS top
        FROM tf GROUP BY doc_id
    ),
    grams AS (
        SELECT doc_id,
               CAST(GREATEST(n - 1, 0) AS BIGINT) AS g_total,
               CAST(len(list_distinct(list_transform(range(1, n),
                   i -> w[i] || ' ' || w[i + 1]))) AS BIGINT) AS g_distinct
        FROM (SELECT doc_id, string_split(text, ' ') AS w,
                     len(string_split(text, ' ')) AS n
              FROM documents)
    )
    SELECT w.doc_id,
           ((( w.n - w.nd) * 20000 + w.n) // (2 * w.n)) / 10000.0
             AS dup_word_frac,
           ((w.top * 20000 + w.n) // (2 * w.n)) / 10000.0 AS top_word_frac,
           (((g.g_total - g.g_distinct) * 20000 + GREATEST(g.g_total, 1))
             // (2 * GREATEST(g.g_total, 1))) / 10000.0 AS dup_gram_frac,
           w.top * 5 > w.n OR (g.g_total - g.g_distinct) * 5 > g.g_total
             AS is_repetitive
    FROM words w JOIN grams g USING (doc_id) ORDER BY w.doc_id
    """,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: duplicate-word
    fraction (1 − distinct/total), top-word fraction (most frequent word's
    share), duplicate-2-gram fraction, and the repetitive flag
    (top word > 20% OR dup 2-grams > 20%) — the filters a pretraining
    corpus applies before any cross-document dedup.

    Scale shape: word stats via one explode + partial-agg (the same tf
    stream `text_entropy` uses); the 2-gram side stays array-side per row
    (no second explode — distinct-count of n−1 grams is O(n) per doc).
    All fractions are small-denominator rationals, so rounding is the
    exact integer half-up form (see `text_quality_score`), and the flag
    compares integers — no float in any decision.
    """
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens()).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    words = tf.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        F.max("c").cast("bigint").alias("top"),
    )
    # `w` materialized ONCE before the lambda (a split inside the transform
    # re-tokenizes the doc per element — the measured O(tokens²) HOF trap).
    grams = d.selectExpr(
        "doc_id", "split(text, ' ') AS w", "size(split(text, ' ')) AS n"
    ).selectExpr(
        "doc_id",
        "CAST(greatest(n - 1, 0) AS BIGINT) AS g_total",
        # Guarded: a 1-token doc must yield zero 2-grams (Spark sequence
        # with stop < start DESCENDS instead of returning empty).
        "CAST(if(n < 2, 0,"
        " size(array_distinct(transform(sequence(1, n - 1),"
        " i -> concat_ws(' ', w[i - 1], w[i])))))"
        " AS BIGINT) AS g_distinct",
    )
    return (
        words.join(grams, "doc_id")
        .selectExpr(
            "doc_id",
            "(((n - nd) * 20000 + n) div (2 * n)) / 10000.0D AS dup_word_frac",
            "((top * 20000 + n) div (2 * n)) / 10000.0D AS top_word_frac",
            "(((g_total - g_distinct) * 20000 + greatest(g_total, 1))"
            " div (2 * greatest(g_total, 1))) / 10000.0D AS dup_gram_frac",
            "top * 5 > n OR (g_total - g_distinct) * 5 > g_total"
            " AS is_repetitive",
        )
        .orderBy("doc_id")
    )


@query(
    "doc_boilerplate",
    oracle="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               len(string_split(text, ' ')) AS n
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id, array_to_string(w[i + 1 : i + 3], ' ') AS g
        FROM t, UNNEST(range(0, GREATEST(n - 2, 0))) AS r(i)
    ),
    boiler AS (
        SELECT g FROM g GROUP BY g HAVING COUNT(*) >= 5
    ),
    per_doc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(COUNT(*) FILTER (WHERE b.g IS NOT NULL) AS BIGINT)
                 AS n_boiler
        FROM g LEFT JOIN boiler b USING (g)
        GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_boiler,
           ((n_boiler * 20000 + GREATEST(n_grams, 1))
             // (2 * GREATEST(n_grams, 1))) / 10000.0 AS boiler_frac
    FROM per_doc ORDER BY doc_id
    """,
)
def doc_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level boilerplate detection: a word-3-gram appearing in ≥ 5
    distinct documents is boilerplate (headers, footers, license blurbs —
    the cross-document repeated-passage signal); per doc, report how many
    of its distinct 3-grams are boilerplate and the fraction.

    Scale shape: distinct (doc, gram) pairs via one explode, gram
    doc-frequency via partial-agg groupBy on the gram, boilerplate set
    joined back on the gram key, then one groupBy doc_id — every shuffle
    keys on an 8-byte-hashable gram or doc_id, text never moves twice. At
    100 TB the gram key would be xxhash64(gram) (16-byte shuffle rows) and
    the df aggregate is the same two-level partial-agg; the boilerplate
    set (df ≥ K survivors) is small enough to broadcast.
    """
    d = table(spark, sf_dir, "documents")
    grams = F.expr(
        # if-guard: sequence(0, -1) would DESCEND — sub-3-token docs must
        # produce an empty gram set (they then vanish from the explode on
        # both engines). `w`/`n` are pre-materialized (split inside the
        # lambda would re-tokenize per element — the O(tokens²) HOF trap,
        # measured 5× on this key).
        "if(n < 3, array(),"
        " array_distinct(transform(sequence(0, n - 3),"
        " i -> concat_ws(' ', w[i], w[i + 1], w[i + 2]))))"
    )
    g = (
        d.selectExpr("doc_id", "split(text, ' ') AS w", "size(split(text, ' ')) AS n")
        .select("doc_id", F.explode(grams).alias("g"))
        # Shared by the df aggregate AND the join-back side — without the
        # lazy checkpoint the gram explode runs twice.
        .localCheckpoint(eager=False)
    )
    boiler = (
        g.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 5)
        .select("g", F.lit(1).alias("is_b"))
    )
    return (
        g.join(F.broadcast(boiler), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.count("is_b").cast("bigint").alias("n_boiler"),
        )
        .selectExpr(
            "doc_id",
            "n_grams",
            "n_boiler",
            "((n_boiler * 20000 + greatest(n_grams, 1))"
            " div (2 * greatest(n_grams, 1))) / 10000.0D AS boiler_frac",
        )
        .orderBy("doc_id")
    )


@query(
    "fn_text_search",
    oracle="""
    SELECT doc_id,
           contains(text, 'data') AS has_data,
           position('model' IN text) AS pos_model,
           len(regexp_extract_all(text, 'the', 0)) AS n_the,
           contains(text, 'data') OR contains(text, 'model')
             OR contains(text, 'query') AS multi_any,
           len(list_filter(string_split(text, ' '), t -> t = 'user')) > 0
             AS has_token_user,
           ROUND(1.0 - CAST(len(list_intersect(
                   list_distinct(list_transform(range(1, len(text[1:80]) - 2),
                       i -> text[1:80][i:i + 3])),
                   list_distinct(list_transform(range(1, len('data model query') - 2),
                       i -> 'data model query'[i:i + 3]))))
                 AS DOUBLE)
                 / greatest(len(list_distinct(list_transform(
                       range(1, len(text[1:80]) - 2),
                       i -> text[1:80][i:i + 3]))), 1), 6) AS ngram_dist
    FROM documents ORDER BY doc_id
    """,
)
def fn_text_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CH string-search family: ``position``/``hasSubsequence`` analogs
    (contains, locate), ``countSubstrings`` (regexp count),
    ``multiSearchAny`` (OR of contains), ``hasToken`` (whole-word match on
    the token array, not substring), and ``ngramDistance`` against a fixed
    needle — 1 − |shared 4-grams|/|text 4-grams| over an 80-char prefix.

    All scan-side codegen'd projections; the n-gram distance reuses the
    same bounded-prefix trick as `dedup_ngram_jaccard` so per-row cost is
    constant.
    """
    d = table(spark, sf_dir, "documents")
    # Guarded against texts shorter than the gram size: Spark sequence(1, 0)
    # is DESCENDING [1, 0] (junk grams) while DuckDB range(1, <=1) is empty.
    prefix_grams = (
        "if(length(text) < 4, array(),"
        " array_distinct(transform(sequence(1, length(substr(text, 1, 80)) - 3),"
        " i -> substr(substr(text, 1, 80), i, 4))))"
    )
    needle_grams = (
        "array_distinct(transform(sequence(1, length('data model query') - 3),"
        " i -> substr('data model query', i, 4)))"
    )
    return d.selectExpr(
        "doc_id",
        "contains(text, 'data') AS has_data",
        "CAST(locate('model', text) AS BIGINT) AS pos_model",
        "CAST(size(regexp_extract_all(text, 'the', 0)) AS BIGINT) AS n_the",
        "contains(text, 'data') OR contains(text, 'model')"
        " OR contains(text, 'query') AS multi_any",
        "array_contains(split(text, ' '), 'user') AS has_token_user",
        f"round(1.0D - CAST(size(array_intersect({prefix_grams},"
        f" {needle_grams})) AS DOUBLE)"
        f" / greatest(size({prefix_grams}), 1), 6) AS ngram_dist",
    ).orderBy("doc_id")


@query(
    "text_perplexity",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    cnt AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY token),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM cnt),
    lp AS (
      SELECT token, ln((c + 1.0) / (n + v)) AS logp FROM cnt, tot
    )
    SELECT t.doc_id, ROUND(EXP(-AVG(lp.logp)), 4) AS ppl
    FROM tok t JOIN lp USING (token)
    GROUP BY t.doc_id ORDER BY t.doc_id
    """,
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram perplexity per document — the standard
    LM-based quality filter (CCNet-style: score each document against a
    language model and drop the high-perplexity tail). Add-one smoothing:
    logp(w) = ln((c_w + 1) / (N + V)).

    Scale shape: token counts are one partial-aggregated explode (the
    shuffle carries distinct tokens, not raw occurrences); N and V attach
    as a broadcast 1-row aggregate; the score join shuffles on `token`
    with BOTH sides pre-aggregated — the document side is reduced to
    distinct (doc_id, token, c) pairs FIRST (r8 verdict: the r7 shape
    joined raw occurrences, so the most frequent token was a hot key at
    scale; pre-aggregating cuts the join input ~10× and removes the skew
    amplification), and the per-doc score is the c-weighted average
    sum(c·logp)/sum(c) ≡ avg over occurrences. No collect, no Python —
    at 100 TB this is three hash-agg exchanges and one skew-free shuffle
    join, the same envelope as tfidf_topterms."""
    docs = table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens()).alias("token"))
    dt = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tc"))
    cnt = dt.groupBy("token").agg(F.sum("tc").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"), F.count("*").alias("v"))
    lp = cnt.crossJoin(F.broadcast(tot)).select(
        "token",
        F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))).alias("logp"),
    )
    return (
        dt.join(lp, "token")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.exp(-F.sum(F.col("tc") * F.col("logp")) / F.sum("tc")), 4
            ).alias("ppl")
        )
        .orderBy("doc_id")
    )
