"""Deduplication: exact hash, token-set Jaccard kernel, MinHash+LSH scale path.

The derived ``doc_dups`` fixture (FIXTURES.md §3) is built identically here
and in each oracle: documents ∪ exact copies (doc_id%5=0, id+1,000,000, text
unchanged) ∪ near copies (doc_id%7=0, id+2,000,000, first token dropped).

Scale posture:
- ``dedup_exact`` is one hash-groupBy on a 16-byte digest — partial-agg
  shuffles digests, not text. At 100 TB this is the cheapest possible dedup.
- ``dedup_near_jaccard`` is the *verification kernel*: exact Jaccard on
  candidate pairs. Run standalone it blocks on `lang` to bound the self-join;
  the real scale path is LSH candidates → this kernel.
- ``dedup_minhash_lsh`` is the scale path: per-doc signature (k=32 hashes,
  one pass over shingles), band→bucket shuffle keyed on (band, bandhash) —
  cost O(docs·k), never O(docs²). Hash seeds make signatures
  engine-specific, so the key is rows-only; the property test asserts
  LSH candidates ⊇ all true-Jaccard≥τ pairs (tests/test_llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

# -- doc_dups derivation (must stay in lockstep with _DOC_DUPS_SQL) ----------


def doc_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    exact = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    near = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .withColumn("doc_id", F.col("doc_id") + 2_000_000)
        .withColumn(
            "text",
            F.array_join(F.slice(F.split("text", " "), 2, 100_000), " "),
        )
    )
    return docs.unionByName(exact).unionByName(near)


def with_tokens(df: DataFrame) -> DataFrame:
    """Materialize the token array ONCE in a codegen'd projection (`_w`).

    Higher-order-function lambdas are evaluated interpreted, per element,
    with no subexpression elimination — a `split(text)` INSIDE the shingle
    lambda re-splits the whole document for every shingle (O(tokens²) per
    doc; measured 6× slower at sf0.1). Splitting here makes the lambda body
    two O(1) array indexes.
    """
    return df.withColumn("_w", F.split("text", " "))


def shingle_set() -> F.Column:
    """Distinct word-2-shingles over the pre-split `_w` array — the dedup
    granularity. Callers must apply :func:`with_tokens` first.

    Array-side (`transform` over an index `sequence`), no explode. Assumes
    ≥2 tokens per doc (fixture minimum is ~8; a 1-token doc would yield its
    lone token).
    """
    return F.expr(
        "array_distinct(transform(sequence(0, greatest(size(_w) - 2, 0)),"
        " i -> concat_ws(' ', _w[i], _w[i + 1])))"
    )


_DOC_DUPS_SQL = """
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang FROM documents WHERE doc_id % 5 = 0
        UNION ALL
        SELECT doc_id + 2000000,
               array_to_string(string_split(text, ' ')[2:], ' '),
               lang
        FROM documents WHERE doc_id % 7 = 0
"""


@query(
    "dedup_exact",
    oracle=f"""
    WITH doc_dups AS ({_DOC_DUPS_SQL}),
    hashed AS (
        SELECT doc_id, md5(lower(trim(text))) AS h FROM doc_dups
    )
    SELECT h AS text_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM hashed
    GROUP BY h
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on the md5 of normalized text: keep the smallest doc_id.

    groupBy-on-digest rather than dropDuplicates: the survivor choice
    (min id) is explicit and deterministic, and the digest (16 bytes) is what
    shuffles — not the document body.
    """
    dups = doc_dups(spark, sf_dir)
    return (
        dups.select("doc_id", F.md5(F.lower(F.trim("text"))).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _set_sim_join(items: DataFrame, tau_num: int, tau_den: int) -> DataFrame:
    """Exact set-similarity self-join via prefix filtering (τ = num/den).

    ``items``: (doc_id, lang, toks: array<string>, n = size(toks)). Returns
    every same-lang pair (a_id < b_id) with Jaccard(toks_a, toks_b) ≥ τ as
    (a_id, b_id, jac) — jac rounded 6dp, identical arithmetic to the
    all-pairs oracles.

    This is the MapReduce prefix-filter shape [Vernica et al., SIGMOD'10;
    Bayardo et al., WWW'07] — DETERMINISTICALLY complete, unlike MinHash
    banding: order the token universe totally by (global frequency asc,
    token); a doc's *prefix* is its first p = n − ⌈τ·n⌉ + 1 tokens under
    that order. If J(A,B) ≥ τ then |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉ = o, and two
    sets sharing o elements must collide within their first |x| − o + 1
    elements (pigeonhole on the total order: were the prefixes disjoint,
    every common element would sit in the ≤ o−1 suffix of the side whose
    prefix ends earlier). Candidates = prefix-token equi-join; the exact
    Jaccard verification then runs on candidates only.

    Scale posture vs the old salted lang-block self-join: the quadratic
    blow-up was pairs-per-block ~ (N/|langs|)²; here every shuffle is keyed
    on a token or a doc_id — frequency-ASCENDING prefixes mean candidate
    buckets form on each doc's *rarest* tokens, so bucket sizes track token
    rarity, not corpus size. Near-dup families still meet (they share rare
    tokens); unrelated docs collide only on coincidentally-shared rare
    tokens. Cost: one freq aggregate over exploded prefixes, one window for
    per-doc ordering, a slim (a_id, b_id) distinct, two hash joins back for
    the verify arrays — all linear-ish shuffles, no block², matching what a
    1000-executor run needs. ``items`` is lazily localCheckpoint'd: three
    branches (prefix, verify-a, verify-b) would otherwise re-tokenize the
    corpus; a 100 TB pipeline would persist the token table instead.

    Cheap-predicate ordering carried over from the measured levers: the
    LOSSLESS length-ratio bound (J ≥ τ ⟹ τ·|B| ≤ |A| ≤ |B|/τ, integer
    form) prunes at candidate time on two int compares; the integer-form
    threshold (den+num)·|A∩B| ≥ num·(|A|+|B|) sits in the verify-join
    condition so mismatches die before the division.
    """
    # Everything downstream works on xxhash64-hashed tokens: 8-byte longs
    # shuffle, bucket, and intersect far cheaper than token strings, and the
    # Jaccard on hashed sets is exact up to 64-bit collisions within one
    # pair's union (~|toks|²/2⁶⁴ — the same accepted bound as
    # `dedup_minhash_lsh`'s hashed-set verify).
    items = items.select(
        "doc_id",
        "lang",
        "n",
        F.expr("transform(toks, t -> xxhash64(t))").alias("toks"),
    ).localCheckpoint(eager=False)
    ex = items.select("doc_id", "lang", "n", F.explode("toks").alias("tok"))
    freq = ex.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy("doc_id").orderBy("tf", "tok")
    # p = n − ⌈τn⌉ + 1;  ⌈num·n/den⌉ = (num·n + den − 1) div den  (n ≥ 0)
    pref = (
        ex.join(freq, "tok")
        .withColumn("rn", F.row_number().over(w))
        .filter(
            F.col("rn")
            <= F.expr(f"n - ((n * {tau_num} + {tau_den - 1}) div {tau_den}) + 1")
        )
        .select("doc_id", "lang", "n", "rn", "tok")
        # Shared by both join sides — without the checkpoint the freq
        # aggregate + window rebuild once per side.
        .localCheckpoint(eager=False)
    )
    a = pref.select(
        F.col("doc_id").alias("a_id"),
        F.col("lang").alias("a_lang"),
        F.col("n").alias("a_n"),
        F.col("rn").alias("a_rn"),
        "tok",
    )
    b = pref.select(
        F.col("doc_id").alias("b_id"),
        F.col("lang").alias("b_lang"),
        F.col("n").alias("b_n"),
        F.col("rn").alias("b_rn"),
        "tok",
    )
    # PPJoin positional filter [Xiao et al., WWW'08]: at the FIRST token two
    # prefixes share, overlap(A,B) ≤ 1 + min(|A|−i, |B|−j). A qualifying
    # pair needs o = ⌈τ/(1+τ)·(|A|+|B|)⌉, so any pair whose every shared
    # prefix token fails the bound is pruned before the pair-distinct (the
    # first-shared emission carries the valid bound, and keeping any-passing
    # pairs is sound because that emission passes for true pairs).
    cand = (
        # shuffle_hash: the bucket-key domain is the token universe — small
        # alphabets (char-grams) make it low-cardinality and skewed, where a
        # sort-merge join degrades to giant per-key sorted groups; hash
        # probing keeps per-row cost flat.
        a.hint("shuffle_hash")
        .join(b, "tok")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("a_lang") == F.col("b_lang"))
            & (F.col("a_n") * tau_den >= F.col("b_n") * tau_num)
            & (F.col("b_n") * tau_den >= F.col("a_n") * tau_num)
            & (
                (F.lit(1) + F.least(F.col("a_n") - F.col("a_rn"), F.col("b_n") - F.col("b_rn")))
                * (tau_den + tau_num)
                >= (F.col("a_n") + F.col("b_n")) * tau_num
            )
        )
        # Slim pair-dedup: a pair sharing k prefix tokens surfaces k times;
        # the distinct shuffles 16-byte id pairs, never the token arrays.
        .select("a_id", "b_id")
        .distinct()
    )
    ta = items.select(
        F.col("doc_id").alias("a_id"),
        F.col("toks").alias("a_toks"),
        F.col("n").alias("a_n"),
    )
    tb = items.select(
        F.col("doc_id").alias("b_id"),
        F.col("toks").alias("b_toks"),
        F.col("n").alias("b_n"),
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    jac = inter.cast("double") / (F.col("a_n") + F.col("b_n") - inter)
    return (
        cand.join(ta, "a_id")
        .join(tb, "b_id")
        .filter(inter * (tau_den + tau_num) >= (F.col("a_n") + F.col("b_n")) * tau_num)
        .select("a_id", "b_id", F.round(jac, 6).alias("jac"))
    )


@query(
    "dedup_near_jaccard",
    oracle=f"""
    WITH doc_dups AS ({_DOC_DUPS_SQL}),
    toksets AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(1, len(string_split(text, ' '))),
                   i -> string_split(text, ' ')[i] || ' '
                        || string_split(text, ' ')[i + 1])) AS toks
        FROM doc_dups
    ),
    sized AS (SELECT *, len(toks) AS n FROM toksets)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           ROUND(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.toks, b.toks))), 6) AS jac
    FROM sized a JOIN sized b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND a.n * 5 >= b.n * 4 AND b.n * 5 >= a.n * 4
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    """,
)
def dedup_near_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs: word-2-shingle-set Jaccard ≥ 0.8, same lang.

    Shingles, not single tokens: the fixture vocabulary is tiny, so token
    SETS of unrelated long docs overlap almost completely — bigram shingles
    keep word order and make Jaccard discriminative (the standard MinHash
    granularity). Intersection/union sizes are set-exact integers, so the
    only float is one division — rounded at 6dp for the oracle hash.

    Candidate generation is the exact prefix-filter join (`_set_sim_join`):
    this replaced a salted lang-blocked all-pairs self-join whose pair count
    grew as (N/|langs|)² — correct answers, anti-pattern asymptotics. The
    prefix path keeps the measured micro-levers (derived union
    |A∪B| = |A|+|B|−|A∩B|, integer-form threshold, lossless length-ratio
    prune) while making every shuffle key on a token or an id.
    """
    dups = doc_dups(spark, sf_dir)
    toks = with_tokens(dups).select(
        "doc_id", "lang", shingle_set().alias("toks")
    ).withColumn("n", F.size("toks"))
    return _set_sim_join(toks, 4, 5)


N_HASHES = 32
N_BANDS = 8  # r = 4 rows/band → s-curve threshold ≈ (1/8)^(1/4) ≈ 0.59


# Universal-hash mixers: h_i(x) = a_i * xxhash64(x) + b_i over Z/2^64
# (odd multipliers ⇒ bijective, so each h_i is a full-range permutation of
# the base hash; 64-bit overflow wraps identically in the JVM with ANSI
# off). Constants derived deterministically from the lane index and stored
# as signed 64-bit for Column literals.
def _signed64(x: int) -> int:
    x &= 2**64 - 1
    return x - 2**64 if x >= 2**63 else x


_MIX_A = [_signed64(2 * (0x9E3779B97F4A7C15 * (i + 1)) + 1) for i in range(N_HASHES)]
_MIX_B = [_signed64(0xC2B2AE3D27D4EB4F * (2 * i + 1)) for i in range(N_HASHES)]


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """Per-doc MinHash signature: k universal-hash mins over word 2-shingles.

    Shape chosen for scale: explode the shingles, hash each string ONCE
    (`xxhash64`), derive the k signature lanes as integer multiply-adds, and
    take the k mins in one partial-aggregated hash groupBy. Everything is
    whole-stage-codegen'd; the shuffle carries one k-long partial row per
    (partition, doc). The tempting alternative — `transform(seeds,
    aggregate(shingles, ...))` with no explode — evaluates higher-order
    lambdas interpreted per element and re-hashes every shingle k times:
    measured 100× slower at sf0.1.
    """
    ex = with_tokens(docs).withColumn("sh", F.explode(shingle_set())).select(
        "doc_id", F.xxhash64("sh").alias("h")
    )
    # Lanes as SQL-expr strings, not Column-operator chains (r12
    # optimization, guide §5 driver overhead): the 32-lane Column form cost
    # ~5 py4j round trips per lane (~470 ms of plan construction per call,
    # measured); one parsed expression per lane is ~190 ms. Identical plan
    # and signature values — `L`-suffixed literals are the same signed
    # 64-bit constants, overflow wraps identically with ANSI off.
    lanes = [
        F.expr(f"min(h * {a}L + {b}L) AS m{i}")
        for i, (a, b) in enumerate(zip(_MIX_A, _MIX_B))
    ]
    # The hashed shingle set rides along in the same aggregation: the
    # Jaccard verification downstream then works on long arrays and the
    # shingle/explode work happens exactly once in the whole pipeline.
    sigs = ex.groupBy("doc_id").agg(*lanes, F.collect_set("h").alias("hset"))
    return sigs.select(
        "doc_id",
        F.expr(
            "array(" + ",".join(f"m{i}" for i in range(N_HASHES)) + ") AS sig"
        ),
        "hset",
    )


@query("dedup_minhash_lsh")  # rows-only: signatures are hash-seed-specific
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs, verified by exact Jaccard ≥ 0.8.

    shingle → 32-lane signature + hashed shingle set (ONE explode pass) →
    8 bands of 4 → bucket-join on (band, hash(band lanes)) →
    first-matching-band pair emission (exact-once, no distinct shuffle) →
    exact Jaccard on the hashed sets for just those pairs. Every shuffle
    is keyed on digests; the documents themselves never shuffle. Verifying on xxhash64-ed shingles instead of strings is
    exact up to 64-bit collisions (~|shingles|²/2⁶⁴ — negligible) and
    avoids recomputing the shingle arrays a second time.

    Trade-off, measured: the hashed set rides through the band join (×8
    replication) — at sf0.1 this one-pass shape is 4× faster than banding
    slim and joining the sets back, because the join-back recomputes the
    whole signature job per branch (column pruning defeats exchange
    reuse). At 100 TB the right variant is the same plan over PERSISTED
    signatures (one materialization, slim band shuffle + hash join back),
    which a production pipeline would checkpoint anyway. Re-measured with
    a lazy localCheckpoint standing in for the persisted signatures:
    1.60s vs 1.66s best-of-3 at sf0.1 — a wash at this scale, so the
    lazy declarative shape stays; the checkpoint variant wins only when
    the set payload × replication outgrows executor memory.
    """
    dups = doc_dups(spark, sf_dir)
    sigs = minhash_signatures(dups)
    r = N_HASHES // N_BANDS
    with_bhs = sigs.select(
        "doc_id",
        "hset",
        F.expr(
            f"transform(sequence(0, {N_BANDS - 1}),"
            f" b -> xxhash64(slice(sig, b * {r} + 1, {r})))"
        ).alias("bhs"),
    )
    banded = with_bhs.select(
        "doc_id", "hset", "bhs", F.posexplode("bhs").alias("band", "bh")
    )
    # First-matching-band wins: a pair colliding in k bands would otherwise
    # surface k times and need a dropDuplicates — a shuffle of candidate
    # pairs CARRYING both hash-set arrays. Keeping the 8 band hashes (8
    # longs) on each row turns that into a per-pair filter: emit only from
    # the earliest band where the two docs agree. Exact-once per pair, no
    # pair shuffle, verify runs once per candidate (measured 25% faster).
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bh"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .filter(
            F.expr(
                "band = 0 OR NOT exists(sequence(0, band - 1),"
                " b2 -> x.bhs[b2] = y.bhs[b2])"
            )
        )
        .select(
            F.col("x.doc_id").alias("a_id"),
            F.col("y.doc_id").alias("b_id"),
            F.col("x.hset").alias("a_set"),
            F.col("y.hset").alias("b_set"),
        )
    )
    # Sets: |A∪B| = |A|+|B|−|A∩B| — one intersect per candidate, no union
    # build; threshold in integer form so the length check and the verify
    # share the same arithmetic (cf. dedup_near_jaccard's lever notes).
    a_n, b_n = F.size("a_set"), F.size("b_set")
    inter = F.size(F.array_intersect("a_set", "b_set"))
    jac = inter.cast("double") / (a_n + b_n - inter)
    return (
        pairs.filter((a_n * 5 >= b_n * 4) & (b_n * 5 >= a_n * 4))
        .filter(inter * 9 >= (a_n + b_n) * 4)
        .select("a_id", "b_id", F.round(jac, 6).alias("jac"))
    )


@query("dedup_simhash")  # rows-only: xxhash64 bit patterns are engine-private
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 32-bit signature, Hamming ≤ 3, banded search.

    Per doc: explode tokens, hash once, and for each of 32 bits sum ±1
    contributions (+1 if the token hash has the bit set) — one partial-
    aggregated groupBy, exactly the MinHash lanes shape. The signature bit
    is the contribution's sign. Candidate search never compares all pairs:
    the 32 bits split into 4 bands of 8; Hamming ≤ 3 implies at least one
    band is identical (pigeonhole), so an equi-join per band finds every
    such pair, verified with bit_count(xor) ≤ 3. Property-tested in
    tests/test_llm.py (near-dups collide, unrelated docs don't).
    """
    dups = doc_dups(spark, sf_dir)
    ex = dups.withColumn("tok", F.explode(F.split("text", " "))).select(
        "doc_id", F.xxhash64("tok").alias("h")
    )
    # Each lane sums the raw bit (branch-free; ±1 contributions recovered as
    # 2·ones − n, so the sign test is ones·2 > n) — measured ~35% faster
    # than 32 sum(CASE WHEN) lanes. Lanes and the sig reassembly are SQL
    # expr strings, not Column chains (r12 optimization, guide §5): the two
    # 32-iteration Column loops cost ~350 py4j round trips of plan
    # construction per call; parsed expressions build the identical plan
    # in a handful.
    bits = [F.expr(f"sum(shiftright(h, {b}) & 1) AS b{b}") for b in range(32)]
    contrib = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"), *bits)
    sig = contrib.select(
        "doc_id",
        F.expr(
            "CAST("
            + " + ".join(f"IF(b{b} * 2 > n, {1 << b}L, 0L)" for b in range(32))
            + " AS BIGINT) AS sig"
        ),
    )
    bands = sig.select(
        "doc_id",
        "sig",
        F.explode(
            F.expr(
                "transform(sequence(0, 3), i ->"
                " named_struct('band', i,"
                "  'bv', shiftright(sig, i * 8) & 255))"
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bv")
    # Hamming filter BEFORE dropDuplicates (they commute): the fixture's
    # tiny vocabulary makes band buckets heavily skewed (~5M raw candidate
    # pairs at sf0.1), and filtering first means the distinct shuffle
    # carries only true near-dups — measured 3.5× on the whole key.
    pairs = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "bv"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a_id"),
            F.col("y.doc_id").alias("b_id"),
            F.bit_count(
                F.col("x.sig").bitwiseXOR(F.col("y.sig"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .dropDuplicates(["a_id", "b_id"])
    )
    return pairs


# -- connected-components cluster assignment ---------------------------------

from ..registry import ORACLES as _ORACLES  # noqa: E402  (after registrations)

_CC_ORACLE = f"""
WITH RECURSIVE pairs AS (
    SELECT a_id, b_id FROM ({_ORACLES["dedup_near_jaccard"]})
),
edges AS (SELECT a_id AS s, b_id AS d FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
reach AS (
    SELECT s AS node, d AS r FROM edges
    UNION
    SELECT rr.node, e.d FROM reach rr JOIN edges e ON rr.r = e.s
)
SELECT node AS doc_id, least(node, min(r)) AS component
FROM reach GROUP BY node ORDER BY doc_id
"""


_CC_MAX_ROUNDS = 60


def connected_components(edges: DataFrame) -> DataFrame:
    """Min-label connected components over an edge list (s, d), treated as
    undirected — callers may pass each edge once (either direction) or a
    pre-symmetrized list; duplicate edges are harmless under the min
    aggregation, so both spellings label identically.

    Each round every node takes min(own label, neighbors' labels), then the
    labeling is pointer-flattened — label(label) (Shiloach–Vishkin-style
    doubling) — once in rounds 1–2 and TWICE from round 3 on. The schedule
    is the measured optimum for both graph regimes: dup-cluster graphs
    (diameter 2–4, `dedup_survivors`) converge inside 3 single-hop rounds
    and must not pay a second join per round (bench: 5.05s with
    always-two-hops vs ~4.2s baseline), while high-diameter graphs get the
    compounded ~4×-reach hops exactly when they matter — the 3000-node path
    fixture (tests/test_llm.py, local[8], warm) drops 12 rounds / 4.3s
    (single-hop) → 7 rounds / ~3.1s (r5 verdict task 7's ≥20% cut). The
    prescribed alternative — Kiveris et al.'s alternating large-star/
    small-star [MapReduce and Beyond] — was implemented and measured too:
    13 rounds / 8.2s on the same fixture (each star round pays 2 groupBys +
    2 distincts vs label-prop's 1 aggregate), so min-label + scheduled
    flattening stays, with the experiment recorded here. Fixpoint ⟹
    correct: labels are monotone decreasing, always some node id within the
    component, and a stable labeling that survives neighbor-propagation
    must equal the component min along any path from the min node.
    Convergence is tracked by the monotonically-decreasing label sum (one
    tiny scalar collect per round, not a full frame diff). If the sum
    hasn't stabilized within ``_CC_MAX_ROUNDS`` the loop RAISES rather than
    returning partial labels (the pre-round-3 version silently returned
    whatever labels existed). At 100 TB this is the GraphX/GraphFrames CC
    skeleton.

    r13 round-shape optimization (guide §2.4 — remove shuffles outright;
    the loop is fixed-overhead-bound, ~4 tiny shuffle stages/round):

    - ONE materialization of the caller's pair pipeline: the directed list
      is checkpointed first and the reversed/self-loop branches read that
      RDD, where the callers' pre-unioned lists executed the (expensive)
      pair-verify tail once per union branch.
    - Self-loops folded into the edge list — (s,s) and (d,d) per edge, no
      distinct — so each round is ONE join + ONE aggregate: min(own,
      neighbors) ≡ min over in-edges when every node has a self-loop. This
      deletes the per-round (labels LEFT JOIN prop) update and the
      labels-init distinct entirely. Cost: the round join scans 4E rows
      instead of 2E + a V-row join — strictly fewer shuffled bytes than
      the join it replaces for any graph with average degree ≥ 1.
    - Round 0 needs no join at all: labels start as comp(v) = v, so the
      first propagation is just groupBy(d).min(s) over the self-looped
      list (identical labels to the old init + round-0 update).

    The per-round label trajectory is IDENTICAL to the r12 shape (same
    propagation, same flatten schedule), so convergence-round counts and
    final labels are unchanged — verified by the deep-chain/disjoint-chain
    pins and the oracle-matched dedup_cluster_cc key.
    """
    # Lazy checkpoints: the per-round label-sum collect is the action that
    # materializes each round's checkpoint, so one job per round does both
    # (eager checkpointing ran a separate materialization job before every
    # sum — measured ~25% of the loop).
    p = edges.toDF("s", "d").localCheckpoint(eager=False)
    edges3 = (
        p.unionByName(p.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .unionByName(p.select("s", F.col("s").alias("d")))
        .unionByName(p.select(F.col("d").alias("s"), F.col("d").alias("d")))
        .localCheckpoint(eager=False)
    )

    def _flatten(lbl: DataFrame) -> DataFrame:
        # label(label): follow one's current label to ITS label; a second
        # application within a round compounds the jump.
        flat = lbl.select(
            F.col("node").alias("fnode"), F.col("comp").alias("fcomp")
        )
        return lbl.join(flat, F.col("comp") == F.col("fnode"), "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("fcomp", "comp")).alias("comp"),
        )

    # Round 0, fused: comp(v) = min(v, min neighbor id) = min over in-edges
    # of the self-looped list. One aggregate, no labels init, no join.
    labels = _flatten(
        edges3.groupBy(F.col("d").alias("node")).agg(F.min("s").alias("comp"))
    ).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]
    if prev_sum is None:  # empty edge list — trivially a fixpoint
        return labels
    for round_idx in range(1, _CC_MAX_ROUNDS):
        labels = (
            edges3.join(labels, edges3["s"] == labels["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.min("comp").alias("comp"))
        )
        for _hop in range(1 if round_idx < 2 else 2):
            labels = _flatten(labels)
        labels = labels.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not reach a fixpoint in {_CC_MAX_ROUNDS}"
        " rounds — graph diameter exceeds 4^rounds or labels are unstable;"
        " refusing to return possibly-partial components"
    )


@query("dedup_cluster_cc", oracle=_CC_ORACLE)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the near-dup
    pair graph; component id = min doc_id in the cluster (the canonical doc
    a training pipeline keeps — everything else is dropped).

    The edge list is materialized once (`localCheckpoint` inside
    :func:`connected_components`) so the pair join never re-runs; dup
    clusters are near-cliques (diameter 2–4) so the loop does ~3 rounds
    here, but the log-diameter flattening means a pathological chain still
    converges — or raises — instead of silently mislabeling.

    Oracle: DuckDB recursive CTE computing min-reachable-id (exact
    transitive closure — feasible because dup components are tiny).
    """
    # Pairs go in DIRECTED (a < b): connected_components symmetrizes off
    # its own single materialization, so the pair-verify tail runs once —
    # the caller-side union ran it once per branch (r13, guide §2.4).
    pairs = dedup_near_jaccard(spark, sf_dir).select("a_id", "b_id")
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    ).orderBy("doc_id")


@query(
    "dedup_survivors",
    oracle=f"""
    WITH doc_dups AS ({_DOC_DUPS_SQL})
    SELECT doc_id, lang FROM doc_dups
    WHERE doc_id NOT IN (
        SELECT doc_id FROM ({_CC_ORACLE}) c WHERE c.component <> c.doc_id
    )
    ORDER BY doc_id
    """,
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dedup: pair graph → connected components → keep ONLY
    each cluster's canonical doc (min doc_id) plus everything unpaired — the
    full \"dedup this corpus\" composite a training pipeline runs, not just
    the pair list. Exact copies have Jaccard 1.0, so one pass subsumes both
    exact- and near-dedup: survivors = corpus minus non-canonical members.

    Scale shape: the drop set is (component member, component) slimmed to
    bare ids — tiny relative to the corpus (only docs with a near-dup) — and
    the final anti-join shuffles on doc_id only; document text never moves.
    At 100 TB: persisted pair graph → CC (log-diameter rounds) → one
    left_anti hash join, each stage linear in its own input.
    """
    dups = doc_dups(spark, sf_dir)
    # Directed pairs — see dedup_cluster_cc: one materialization of the
    # pair pipeline instead of one per union branch.
    pairs = dedup_near_jaccard(spark, sf_dir).select("a_id", "b_id")
    dropped = (
        connected_components(pairs)
        .filter(F.col("comp") != F.col("node"))
        .select(F.col("node").alias("doc_id"))
    )
    return (
        dups.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH doc_dups AS ({_DOC_DUPS_SQL}),
    grams AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(1, len(text[1:120]) - 1),
                   i -> text[1:120][i:i + 2])) AS gs
        FROM doc_dups
    ),
    sized AS (SELECT *, len(gs) AS n FROM grams)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           ROUND(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
                 / (a.n + b.n - len(list_intersect(a.gs, b.gs))), 6) AS jac
    FROM sized a JOIN sized b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND a.n * 10 >= b.n * 7 AND b.n * 10 >= a.n * 7
     AND len(list_intersect(a.gs, b.gs)) * 17 >= (a.n + b.n) * 7
    ORDER BY a_id, b_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard near-dup pairs (τ = 0.7) over the first 120
    chars — the n-gram-level dedup granularity (catches reorderings and
    near-identical prefixes that word-shingle Jaccard misses, the classic
    web-dedup complement to `dedup_near_jaccard`).

    Candidates come from the exact prefix-filter join (`_set_sim_join`,
    τ = 0.7 ⇒ prefix ≈ 0.3·n + 1 grams) instead of the old lang+salt
    all-pairs block. The 120-char cap bounds the gram set (≤118 entries) so
    pair cost is constant — the full-text path would make the intersect
    O(doc length).
    """
    dups = doc_dups(spark, sf_dir)
    grams = dups.select(
        "doc_id",
        "lang",
        # Guarded: sequence(1, n) with n < 1 yields a DESCENDING [1, 0] in
        # Spark while the DuckDB oracle's range(1, <=1) is empty — texts
        # shorter than the gram size must produce an empty gram set.
        F.expr(
            "if(length(text) < 3, array(),"
            " array_distinct(transform(sequence(1, length(substr(text, 1, 120)) - 2),"
            " i -> substr(substr(text, 1, 120), i, 3))))"
        ).alias("toks"),
    ).withColumn("n", F.size("toks"))
    return _set_sim_join(grams, 7, 10).orderBy("a_id", "b_id")


@query(
    "dedup_soft_weights",
    oracle=f"""
    WITH doc_dups AS ({_DOC_DUPS_SQL}),
    keyed AS (
        SELECT doc_id, md5(lower(trim(text))) AS h,
               len(string_split(text, ' ')) AS n_tokens
        FROM doc_dups
    ),
    freq AS (
        SELECT h, COUNT(*) AS dup_count FROM keyed GROUP BY h
    )
    SELECT k.doc_id, f.dup_count,
           ROUND(1.0 / f.dup_count, 6) AS soft_weight,
           ROUND(k.n_tokens * 1.0 / f.dup_count, 4) AS effective_tokens
    FROM keyed k JOIN freq f USING (h)
    ORDER BY k.doc_id
    """,
)
def dedup_soft_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication: instead of DROPPING exact duplicates, every copy
    is kept and down-weighted to 1/dup_count so a duplicated document
    contributes one document's worth of training mass in aggregate (the
    SoftDeDup / DataComp-LM reweighting recipe — public literature).

    Two shuffles of 16-byte digests only: groupBy(md5) for the frequency
    table, then a digest-keyed join back. The document text itself never
    shuffles (token counts are computed before the exchange), so at 100 TB
    the exchanged volume is ~32 bytes/doc regardless of doc size — and the
    frequency side is |distinct digests| rows, AQE-broadcastable when the
    corpus is mostly unique.
    """
    keyed = with_tokens(doc_dups(spark, sf_dir)).select(
        "doc_id",
        F.md5(F.lower(F.trim("text"))).alias("h"),
        F.size("_w").cast("bigint").alias("n_tokens"),
    )
    freq = keyed.groupBy("h").agg(F.count(F.lit(1)).alias("dup_count"))
    return (
        keyed.join(freq, "h")
        .select(
            "doc_id",
            "dup_count",
            F.round(F.lit(1.0) / F.col("dup_count"), 6).alias("soft_weight"),
            F.round(
                F.col("n_tokens") * F.lit(1.0) / F.col("dup_count"), 4
            ).alias("effective_tokens"),
        )
        .orderBy("doc_id")
    )


_SUB_W = 30  # substring window tokens
_SUB_S = 15  # window stride


@query(
    "dedup_substring",
    oracle=f"""
    WITH doc_dups AS ({_DOC_DUPS_SQL}),
    toks AS (
        SELECT doc_id, string_split(text, ' ') AS t,
               len(string_split(text, ' ')) AS n
        FROM doc_dups
    ),
    wins AS (
        SELECT doc_id,
               md5(array_to_string(
                   t[i * {_SUB_S} + 1 : i * {_SUB_S} + {_SUB_W}], ' ')) AS h
        FROM toks, UNNEST(range(0, GREATEST(0,
                 CAST((n - {_SUB_W}) // {_SUB_S} AS BIGINT)) + 1)) AS r(i)
    ),
    freq AS (
        SELECT h, COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
        FROM wins GROUP BY h
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           COALESCE(MAX(CASE WHEN f.n_docs >= 2 AND f.first_doc < w.doc_id
                             THEN 1 ELSE 0 END), 0) = 1 AS dup_of_earlier
    FROM wins w JOIN freq f USING (h)
    GROUP BY w.doc_id ORDER BY w.doc_id
    """,
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring deduplication (the window-hash variant of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better" —
    public literature; the full method uses a suffix array, this is the
    fixed-window form production pipelines run at scale): every 30-token
    window at stride 15 is hashed; a window hash seen in ≥2 documents
    marks a shared substring, and a document whose shared window first
    appeared in a SMALLER doc_id is flagged as duplicating earlier
    material (the trim/drop decision input).

    Shapes for 100 TB: the window fan-out is array-side (one transform +
    one explode, ~n_tokens/stride rows per doc); only 16-byte digests
    shuffle — groupBy(h) for the frequency/first-doc table, then one
    digest-keyed join back and a doc_id re-aggregation. Stride 15 halves
    the exploded volume vs stride 1 while still catching any shared run
    of ≥ 44 tokens (W + S − 1); tighten the stride to raise recall,
    linearly trading shuffle bytes.
    """
    toks = with_tokens(doc_dups(spark, sf_dir)).select(
        "doc_id", F.col("_w").alias("t"), F.size("_w").alias("n")
    )
    wins = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0L, greatest(0L,"
                f" CAST((n - {_SUB_W}) div {_SUB_S} AS BIGINT))),"
                f" i -> md5(array_join(slice(t,"
                f" CAST(i * {_SUB_S} + 1 AS INT), {_SUB_W}), ' ')))"
            )
        ).alias("h"),
    )
    freq = wins.groupBy("h").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )
    return (
        wins.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
            (
                F.coalesce(
                    F.max(
                        F.when(
                            (F.col("n_docs") >= 2)
                            & (F.col("first_doc") < F.col("doc_id")),
                            1,
                        ).otherwise(0)
                    ),
                    F.lit(0),
                )
                == 1
            ).alias("dup_of_earlier"),
        )
        .orderBy("doc_id")
    )
