"""Embedding similarity search: cosine top-k, centroids, kNN, normalization.

Embeddings are `array<float>[64]` (FIXTURES.md §2); every kernel casts to
double first so both engines do the same IEEE754 arithmetic, and every score
is rounded to 6dp with a vec_id tie-break before ranking (SURVEY.md §7.5).

Scale posture: brute-force cosine is the correctness baseline — a broadcast
of the (tiny) query set against a single scan of the corpus, no shuffle at
all until the per-query top-k (`row_number` over ≤|queries| partitions, or
at real scale a partial top-k per partition then merge). The scale path for
corpus×corpus search is LSH bucketing (dedup.py shows the banding pattern);
an IVF variant is the same shape with `sim_centroid`'s centroids as the
coarse quantizer: assign → per-cell search only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from ..registry import query

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"

_DIM = 64  # fixture embedding dimensionality (FIXTURES.md §2)


def _dot_unrolled(a: str, b: str) -> str:
    """Codegen'd fixed-dim dot product. The zip_with/aggregate fold runs
    INTERPRETED (per element, outside whole-stage codegen) — fine for
    one-per-row projections, hot-loop poison for per-candidate kernels.
    Unrolling the 64-term sum keeps it in codegen; the `+` chain
    left-associates, so the float addition order (and every 6dp-rounded
    oracle value) is identical to the sequential fold it replaces."""
    return "(" + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(_DIM)) + ")"


def emb_d() -> F.Column:
    """Element-wise double cast: float32 → float64 is exact, so both engines
    see identical inputs. (Built lazily — F.expr needs an active session.)"""
    return F.expr("transform(embedding, x -> cast(x as double))")


def _dot(a: str, b: str) -> F.Column:
    return F.expr(_DOT.format(a=a, b=b))


@query(
    "sim_cosine_topk",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    q AS (SELECT * FROM vecs WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id,
               ROUND(list_dot_product(q.emb, c.emb)
                     / (sqrt(list_dot_product(q.emb, q.emb))
                        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
        FROM q JOIN vecs c ON c.vec_id <> q.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, c_id) AS rn
        FROM scored
    )
    SELECT q_id, c_id, cos, rn FROM ranked WHERE rn <= 5
    """,
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 nearest neighbors by cosine for each query vector (vec_id < 5).

    Broadcast the query side: the corpus scan computes all scores in one
    codegen'd projection (zip_with/aggregate fold = the same sequential
    left-fold DuckDB's list_dot_product does). Ranking happens on the
    ROUNDED score with c_id tie-break, so rank order is engine-independent.
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", emb_d().alias("emb")
    )
    q = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    c = vecs.select(F.col("vec_id").alias("c_id"), F.col("emb").alias("c_emb"))
    cos = _dot("q_emb", "c_emb") / (
        F.sqrt(_dot("q_emb", "q_emb")) * F.sqrt(_dot("c_emb", "c_emb"))
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "c_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "c_id", "cos", "rn")
    )


@query(
    "sim_centroid",
    oracle="""
    WITH ex AS (
        SELECT vec_id, label,
               unnest(embedding::DOUBLE[]) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings
    ),
    cent AS (
        SELECT label, pos, AVG(x) AS c FROM ex GROUP BY label, pos
    )
    SELECT ex.vec_id, ex.label,
           ROUND(sqrt(SUM((ex.x - cent.c) * (ex.x - cent.c))), 6) AS dist
    FROM ex JOIN cent USING (label, pos)
    GROUP BY ex.vec_id, ex.label
    """,
)
def sim_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, then each vector's L2 distance to its own centroid.

    The IVF coarse-quantizer kernel. posexplode → per-(label, dim) mean is
    one partial-aggregated shuffle of 64·|labels| cells; the distance join
    broadcasts the centroid table (labels × dims rows — tiny at any corpus
    scale).
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", emb_d().alias("emb")
    )
    ex = vecs.select(
        "vec_id", "label", F.posexplode("emb").alias("pos", "x")
    )
    cent = ex.groupBy("label", "pos").agg(F.avg("x").alias("c"))
    return (
        ex.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")))), 6
            ).alias("dist")
        )
    )


@query(
    "knn_classify",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    q AS (SELECT * FROM vecs WHERE vec_id < 5),
    scored AS (
        SELECT q.vec_id AS q_id, c.vec_id AS c_id, c.label,
               ROUND(list_dot_product(q.emb, c.emb)
                     / (sqrt(list_dot_product(q.emb, q.emb))
                        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
        FROM q JOIN vecs c ON c.vec_id <> q.vec_id
    ),
    knn AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY cos DESC, c_id) AS rn
            FROM scored
        ) WHERE rn <= 5
    ),
    votes AS (
        SELECT q_id, label, COUNT(*) AS v FROM knn GROUP BY q_id, label
    )
    SELECT q_id, label AS pred_label FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY v DESC, label) AS r
        FROM votes
    ) WHERE r = 1
    """,
)
def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority label among the 5 cosine-nearest neighbors per query vector.

    Ties break toward the smallest label — fully deterministic given the
    deterministic kNN ranking above.
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", emb_d().alias("emb")
    )
    q = vecs.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    c = vecs.select(
        F.col("vec_id").alias("c_id"), F.col("label"), F.col("emb").alias("c_emb")
    )
    cos = _dot("q_emb", "c_emb") / (
        F.sqrt(_dot("q_emb", "q_emb")) * F.sqrt(_dot("c_emb", "c_emb"))
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("c_id") != F.col("q_id"))
        .select("q_id", "c_id", "label", F.round(cos, 6).alias("cos"))
    )
    wk = Window.partitionBy("q_id").orderBy(F.desc("cos"), "c_id")
    knn = scored.withColumn("rn", F.row_number().over(wk)).filter(F.col("rn") <= 5)
    votes = knn.groupBy("q_id", "label").agg(F.count(F.lit(1)).alias("v"))
    wv = Window.partitionBy("q_id").orderBy(F.desc("v"), "label")
    return (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("q_id", F.col("label").alias("pred_label"))
    )


@query(
    "embed_normalize",
    oracle="""
    SELECT vec_id,
           COALESCE(array_to_string(
               list_transform(embedding::DOUBLE[],
                   x -> CAST(floor(x / sqrt(list_dot_product(
                            embedding::DOUBLE[], embedding::DOUBLE[]))
                            * 1000000 + 0.5) AS BIGINT)),
               ','), '') AS unit
    FROM embeddings
    """,
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize every embedding (the pre-cosine projection), emitted as
    micro-units (×1e6, floor(x+0.5) half-up) joined into one CSV string.

    Pure per-row array math — stays in the scan's codegen'd projection. The
    norm is computed ONCE in its own (codegen'd, unrolled) projection before
    the lambda: a sqrt(dot) inside the transform re-evaluates per element —
    interpreted HOFs do no subexpression elimination, so the old shape was
    O(64²) interpreted ops per row. The CSV encoding (not array<double>)
    exists because the driver canonicalizer hashes scalar cells only
    (round-1 err on array cols); floor(x·1e6+0.5) rather than round(x, 6)
    because both engines' floor is IEEE-exact on identical doubles while
    their ROUND half-modes differ.
    """
    vecs = table(spark, sf_dir, "embeddings").select("vec_id", emb_d().alias("emb"))
    return vecs.withColumn(
        "nrm", F.expr(f"sqrt({_dot_unrolled('emb', 'emb')})")
    ).select(
        "vec_id",
        F.expr(
            "array_join(transform(emb, x -> cast(floor("
            "x / nrm * 1000000 + 0.5D"
            ") as bigint)), ',')"
        ).alias("unit"),
    )


# Derived near-dup embeddings (FIXTURES.md §3 pattern): every 10th vector
# re-emitted (vec_id+10000) through the same element-wise linear map in both
# engines — the scale is cosine-invariant and the small offset leaves
# cosine ≈ 0.996, far above any natural pair (the fixture's max same-label
# cosine is 0.47).
_VEC_DUPS_SQL = """
        SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
        UNION ALL
        SELECT vec_id + 10000, label,
               list_transform(embedding::DOUBLE[], x -> x * 1.1 + 0.01)
        FROM embeddings WHERE vec_id % 10 = 0
"""


def vec_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", emb_d().alias("emb")
    )
    jit = vecs.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        "label",
        F.expr("transform(emb, x -> x * 1.1 + 0.01)").alias("emb"),
    )
    return vecs.unionByName(jit)


def _grid_lane(u_col: str, lane: int) -> str:
    """SQL expr for unit vector ``u_col``'s scaled projection p/W on ``lane``.

    Completeness math (what lets the candidate join stay EXACT): for unit
    vectors, cos(a,b) ≥ 0.95 ⟺ ‖a−b‖ ≤ √(2·0.05) ≈ 0.31623. A projection
    p(x) = ⟨x, h⟩ is ‖h‖-Lipschitz, so |p(a) − p(b)| ≤ 0.31623·‖h‖ < W/2
    for cell width W = 2·0.317·‖h‖ ⟹ in scaled units q = p/W, two
    qualifying rows differ by < ½. Cell = floor(q); a row's only reachable
    neighbor cell is the one its half-open half points at (frac(q) ≥ ½ →
    cell+1, else cell−1): a neighbor below cell·W needs q′ > q − ½ ≥
    cell − ½ + frac(q), impossible unless frac(q) < ½, and symmetrically
    above. So replicating one side to {cell, cell+shift} per lane — 4 cells
    in 2-D, not the 3×3 = 9 of the ±1-both-ways scheme — keeps every
    qualifying pair meeting in EXACTLY one cell (the 4 replica cells are
    distinct and the probe side stays exact-cell). Planes are the
    deterministic LCG hyperplanes shared with `sim_lsh_ann`; ‖h‖ is
    reproduced bit-exactly in Python (pure integer LCG + power-of-two
    division), so W is a plain double literal.
    """
    comps = [
        ((1103515245 * (lane * 64 + d + 1) + 12345) % 2147483648)
        / 2147483648.0
        - 0.5
        for d in range(64)
    ]
    w = 2 * 0.317 * sum(c * c for c in comps) ** 0.5
    # Literal plane components (the LCG is pure Python-computable), so
    # the projection is a 64-term codegen'd sum instead of an
    # interpreted fold re-deriving the LCG per element. Same values,
    # same left-to-right addition order.
    dot = "(" + " + ".join(
        f"{u_col}[{d}] * {c!r}" for d, c in enumerate(comps)
    ) + ")"
    return f"({dot} / {w!r})"


def _bessel_dirs(k: int = 8) -> list[list[float]]:
    """k ORTHONORMALIZED directions (Gram-Schmidt over the LCG planes) for
    the Bessel candidate prefilter. Pure-Python floats → the components
    embed as exact double literals; determinism is process-local (the
    filter is a SUPERSET test, not an oracle-matched value)."""
    dirs: list[list[float]] = []
    for lane in range(k):
        v = [
            ((1103515245 * (lane * 64 + d + 1) + 12345) % 2147483648)
            / 2147483648.0
            - 0.5
            for d in range(64)
        ]
        for g in dirs:
            dot = sum(a * b for a, b in zip(v, g))
            v = [a - dot * b for a, b in zip(v, g)]
        nrm = sum(a * a for a in v) ** 0.5
        dirs.append([a / nrm for a in v])
    return dirs


def _bessel_proj(u_col: str) -> str:
    """SQL array of the 8 orthonormal projections of ``u_col`` — one-per-row
    64-term codegen'd sums (the unroll-wins-for-projections regime)."""
    lanes = []
    for g in _bessel_dirs():
        lanes.append(
            "(" + " + ".join(f"{u_col}[{d}] * {c!r}" for d, c in enumerate(g)) + ")"
        )
    return "array(" + ", ".join(lanes) + ")"


# Per-candidate Bessel screen: for ORTHONORMAL g_i, Σ_i ⟨a−b, g_i⟩² ≤ ‖a−b‖²
# (Bessel's inequality) and cos ≥ 0.95 ⟺ ‖a−b‖² ≤ 0.1 for unit vectors — so
# every qualifying pair satisfies Σ Δproj² ≤ 0.1 and the screen never drops
# a true pair (1e-9 slack covers float error in the projections and the
# Gram-Schmidt literals). Random far pairs (‖a−b‖² ≈ 2) concentrate around
# Σ ≈ 8·2/64 = 0.25 with P(Σ ≤ 0.1) ≈ χ²₈(3.2) ≈ 8%, so ~92% of candidates
# die on an 8-term square sum instead of the 64-wide cosine fold
# (measured: 2.76s → 1.58s warm at sf0.1 on 239k candidates).
_BESSEL_SCREEN = (
    "("
    + " + ".join(f"(apo[{i}] - bpo[{i}]) * (apo[{i}] - bpo[{i}])" for i in range(8))
    + ") <= 0.100000001D"
)


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH vd AS ({_VEC_DUPS_SQL}),
    unit AS (
        SELECT vec_id, label,
               list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb)))
                   AS u
        FROM vd
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(list_dot_product(a.u, b.u), 6) AS cos
    FROM unit a JOIN unit b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.u, b.u) >= 0.95
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ 0.95, grid-bucketed candidates.

    Vectors are unit-normalized ONCE (per row, in the scan projection), so
    each candidate pair costs a single 64-wide fold. Candidate generation is
    a (label, cell₀, cell₁) equi-join on a 2-D projection grid — provably
    complete for the 0.95 threshold (see `_grid_lane`), so the all-pairs
    oracle is matched exactly. The build side replicates to its nearest
    2×2 cell corner only — cell width 2r and a half-open shift toward the
    row's own half, 4 replicas instead of the r-width 3×3 = 9 (which cost
    2.3× the pre-grid kernel at sf0.1: 3.45s → 1.9s warm with this
    scheme, same 200 pairs) — and each qualifying pair still meets in
    exactly one cell (replica cells are distinct, probe side exact-cell),
    so no pair-dedup shuffle exists.

    Scale posture: the old label-only block was all-pairs within ~10 blocks —
    pair count grew (N/10)². Grid cells add real selectivity wherever the
    corpus is clustered (every production embedding space; FAISS range search
    is this exact shape — coarse cells + adjacent-cell probe). On
    isotropic-random fixtures the projection spread (σ ≈ ‖h‖/8 for 64-dim
    unit vectors) spans only a few W-wide cells, which is the information-
    theoretic floor: exact range search on uniform random data IS
    near-quadratic; no generator can beat it without losing recall.
    """
    vd = vec_dups(spark, sf_dir)
    # Norm in its own (codegen'd) projection BEFORE the transform lambda: a
    # sqrt(dot) inside the lambda re-evaluates per element (interpreted HOFs
    # do no subexpression elimination — the O(64²)-per-row trap). The lazy
    # localCheckpoint is the projection-collapse barrier that keeps Catalyst
    # from inlining u into the grid-cell expressions downstream (measured
    # 24× slower without). At 100 TB the equivalent is persisting the
    # normalized vectors once, which an embedding pipeline does anyway.
    unit = (
        vd.withColumn("nrm", F.expr(f"sqrt({_dot_unrolled('emb', 'emb')})"))
        .select(
            "vec_id",
            "label",
            F.expr("transform(emb, x -> x / nrm)").alias("u"),
            # Bessel projections of u = ⟨emb, g⟩/nrm, materialized by the
            # checkpoint like u itself. The 8×64-term expression lives in
            # THIS per-row stage on purpose: adding it to the per-candidate
            # stages instead pushed their generated processNext() past the
            # JVM method limit — codegen failed to compile and the whole
            # candidate stage ran INTERPRETED, costing more than the screen
            # saved (observed: 2.76s → no change until the move).
            F.expr(
                f"transform({_bessel_proj('emb')}, p -> p / nrm)"
            ).alias("po"),
        )
        .localCheckpoint(eager=False)
    )
    q0, q1 = _grid_lane("u", 0), _grid_lane("u", 1)
    a = unit.select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("label"),
        F.col("u").alias("au"),
        F.col("po").alias("apo"),
        F.expr(f"CAST(floor({q0}) AS BIGINT)").alias("cell0"),
        F.expr(f"CAST(floor({q1}) AS BIGINT)").alias("cell1"),
    )
    b = (
        unit.select(
            F.col("vec_id").alias("b_id"),
            F.col("label").alias("label"),
            F.col("u").alias("bu"),
            F.col("po").alias("bpo"),
            F.expr(f"CAST(floor({q0}) AS BIGINT)").alias("bc0"),
            F.expr(f"CAST(floor({q1}) AS BIGINT)").alias("bc1"),
            F.expr(f"IF({q0} - floor({q0}) >= 0.5D, 1L, -1L)").alias("s0"),
            F.expr(f"IF({q1} - floor({q1}) >= 0.5D, 1L, -1L)").alias("s1"),
        )
        .withColumn(
            "nb",
            F.explode(
                F.expr(
                    "array(named_struct('d0', 0L, 'd1', 0L),"
                    " named_struct('d0', s0, 'd1', 0L),"
                    " named_struct('d0', 0L, 'd1', s1),"
                    " named_struct('d0', s0, 'd1', s1))"
                )
            ),
        )
        .select(
            "b_id",
            "label",
            "bu",
            "bpo",
            (F.col("bc0") + F.col("nb.d0")).alias("cell0"),
            (F.col("bc1") + F.col("nb.d1")).alias("cell1"),
        )
    )
    # Per-candidate kernel stays the zip_with FOLD, measured: the 64-term
    # unrolled sum (×2 occurrences) overflows efficient codegen here and
    # ran 2.3× SLOWER than the interpreted fold on 237k candidates — the
    # unroll only wins for one-per-row projections (norms, grid cells).
    cos = F.expr(_DOT.format(a="au", b="bu"))
    return (
        a.join(b, ["label", "cell0", "cell1"])
        .filter(F.col("a_id") < F.col("b_id"))
        # Bessel screen BEFORE the 64-wide fold: ~92% of candidates die on
        # an 8-term projection-distance sum (see _BESSEL_SCREEN — provably
        # drops no qualifying pair, so the all-pairs oracle still matches).
        .filter(F.expr(_BESSEL_SCREEN))
        # Fold ONCE into a named column, then filter/round reference the
        # column: filter-then-project re-evaluated the 64-wide kernel per
        # candidate twice (no cross-operator CSE) — measured 15% on the key.
        .select("a_id", "b_id", cos.alias("cr"))
        .filter(F.col("cr") >= 0.95)
        .select("a_id", "b_id", F.round("cr", 6).alias("cos"))
    )


@query(
    "sim_ivf_topk",
    oracle="""
    WITH vecs AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    ex AS (
        SELECT vec_id, label, unnest(emb) AS x,
               generate_subscripts(emb, 1) AS pos
        FROM vecs
    ),
    cent AS (
        SELECT label AS cell, pos, AVG(x) AS c FROM ex GROUP BY label, pos
    ),
    q AS (SELECT * FROM vecs WHERE vec_id < 5),
    qcell AS (
        SELECT vec_id AS q_id, cell,
               SUM(qx.x * cent.c) AS dot
        FROM (SELECT vec_id, unnest(emb) AS x,
                     generate_subscripts(emb, 1) AS pos FROM q) qx
        JOIN cent USING (pos)
        GROUP BY q_id, cell
    ),
    probe AS (
        SELECT q_id, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                         ORDER BY dot DESC, cell) AS rc
            FROM qcell
        ) WHERE rc <= 2
    ),
    scored AS (
        SELECT p.q_id, c.vec_id AS c_id,
               ROUND(list_dot_product(q.emb, c.emb)
                     / (sqrt(list_dot_product(q.emb, q.emb))
                        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
        FROM probe p
        JOIN vecs c ON c.label = p.cell
        JOIN q ON q.vec_id = p.q_id
        WHERE c.vec_id <> p.q_id
    )
    SELECT q_id, c_id, cos, rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, c_id) AS rn
        FROM scored
    ) WHERE rn <= 5
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors: coarse-quantize into cells
    (per-label centroids), probe the 2 best cells per query, exact top-5
    inside the probed cells only.

    The scale path for corpus-sized query sets: the corpus is scanned once
    to build centroids (64·|cells| floats — broadcastable forever), each
    query scores |cells| centroids instead of |corpus| vectors, and the
    exact search touches ~nprobe/|cells| of the data. On the fixture the
    labels are random (no geometric cluster structure), so absolute recall
    is data-bound at ~nprobe/|cells|; the property test pins the ANN
    contract instead (full result set, never beats brute force) — on real
    clustered embeddings the identical plan delivers high recall.
    """
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", emb_d().alias("emb")
    )
    ex = vecs.select("vec_id", "label", F.posexplode("emb").alias("pos", "x"))
    cent = (
        ex.groupBy(F.col("label").alias("cell"), "pos")
        .agg(F.avg("x").alias("c"))
    )
    q = vecs.filter(F.col("vec_id") < 5)
    qx = q.select(
        F.col("vec_id").alias("q_id"), F.posexplode("emb").alias("pos", "x")
    )
    qcell = (
        qx.join(F.broadcast(cent), "pos")
        .groupBy("q_id", "cell")
        .agg(F.sum(F.col("x") * F.col("c")).alias("dot"))
    )
    wprobe = Window.partitionBy("q_id").orderBy(F.desc("dot"), "cell")
    probe = (
        qcell.withColumn("rc", F.row_number().over(wprobe))
        .filter(F.col("rc") <= 2)
        .select("q_id", "cell")
    )
    qv = q.select(F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb"))
    cand = (
        F.broadcast(probe.join(qv, "q_id"))
        .join(vecs, (vecs.label == F.col("cell")) & (vecs.vec_id != F.col("q_id")))
        .select("q_id", F.col("vec_id").alias("c_id"), "q_emb", F.col("emb").alias("c_emb"))
    )
    cos = _dot("q_emb", "c_emb") / (
        F.sqrt(_dot("q_emb", "q_emb")) * F.sqrt(_dot("c_emb", "c_emb"))
    )
    scored = cand.select("q_id", "c_id", F.round(cos, 6).alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "c_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("q_id", "c_id", "cos", "rn")
    )


# Random-hyperplane LSH: NBITS deterministic pseudo-random hyperplanes whose
# components come from an LCG over (lane, dim) — pure integer arithmetic, so
# Spark and DuckDB derive bit-identical planes with no hash-seed divergence.
_LSH_BITS = 8
# The CAST to BIGINT is load-bearing: without it Spark multiplies int32s
# and silently wraps (non-ANSI) while DuckDB promotes — different planes.
_LSH_PLANE = (
    "(((1103515245 * CAST({lane} * 64 + {d} + 1 AS BIGINT) + 12345)"
    " % 2147483648) / 2147483648.0 - 0.5)"
)


def _lsh_bucket_spark() -> str:
    """SQL expr: bucket id = Σ_i (dot(emb, h_i) >= 0) << i over `emb`."""
    bits = []
    for lane in range(_LSH_BITS):
        plane = _LSH_PLANE.format(lane=lane, d="d")
        dot = (
            f"aggregate(sequence(0, 63), 0D,"
            f" (acc, d) -> acc + element_at(emb, d + 1) * {plane})"
        )
        bits.append(f"CAST(IF({dot} >= 0, {1 << lane}, 0) AS BIGINT)")
    return " + ".join(bits)


def _lsh_bucket_duck() -> str:
    bits = []
    for lane in range(_LSH_BITS):
        plane = _LSH_PLANE.format(lane=lane, d="d")
        dot = (
            f"list_sum(list_transform(range(0, 64),"
            f" d -> emb[d + 1] * {plane}))"
        )
        bits.append(f"CASE WHEN {dot} >= 0 THEN {1 << lane} ELSE 0 END")
    return " + ".join(bits)


@query(
    "sim_lsh_ann",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, emb, CAST({_lsh_bucket_duck()} AS BIGINT) AS bucket
        FROM vecs
    ),
    q AS (SELECT vec_id AS q_id, emb AS q_emb, bucket FROM bucketed
          WHERE vec_id < 5),
    scored AS (
        SELECT q.q_id, c.vec_id AS c_id,
               ROUND(list_dot_product(q.q_emb, c.emb)
                     / (sqrt(list_dot_product(q.q_emb, q.q_emb))
                        * sqrt(list_dot_product(c.emb, c.emb))), 6) AS cos
        FROM q JOIN bucketed c USING (bucket)
        WHERE c.vec_id <> q.q_id
    )
    SELECT q_id, c_id, cos, rn FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                                     ORDER BY cos DESC, c_id) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN — the hash-bucketed scale path beside
    `sim_ivf_topk`'s quantizer: sign-of-dot against 8 deterministic
    hyperplanes → 256 buckets; candidates = same-bucket vectors; exact
    cosine top-3 inside the bucket (rounded-score + id tie-break).

    Scale shape: bucket assignment is one embarrassingly-parallel
    projection; the candidate join shuffles on the bucket id (≈ N/256 per
    bucket, multi-probe = OR over Hamming-1 buckets when recall needs it);
    no pair ever forms across buckets, so cost is Σ|bucket|² not N².
    Angular-recall contract (SimHash cousin) is property-tested; this key's
    oracle pins the bucket math and the in-bucket exact ranking.
    """
    # Both sides fully renamed BEFORE the join and the broadcast side on
    # the left (the `sim_cosine_topk` shape): a version that kept the
    # corpus columns un-renamed hit Catalyst scan-dedup attribute
    # mis-binding (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) on the first
    # execution of a fresh session.
    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", emb_d().alias("emb")
    )
    c = vecs.selectExpr(
        "vec_id AS c_id",
        "emb AS c_emb",
        f"CAST({_lsh_bucket_spark()} AS BIGINT) AS bucket",
    )
    # localCheckpoint (lazy) severs the q-side lineage: with BOTH sides
    # carrying the same heavy bucket projection over one dedup'd scan,
    # Catalyst mis-binds the broadcast side on the first execution of a
    # fresh session (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND). The checkpoint
    # materializes ≤5 rows once, executor-local.
    q = (
        vecs.filter(F.col("vec_id") < 5)
        .selectExpr(
            "vec_id AS q_id",
            "emb AS q_emb",
            f"CAST({_lsh_bucket_spark()} AS BIGINT) AS q_bucket",
        )
        .localCheckpoint(eager=False)
    )
    cos = F.expr(_DOT.format(a="q_emb", b="c_emb")) / (
        F.sqrt(F.expr(_DOT.format(a="q_emb", b="q_emb")))
        * F.sqrt(F.expr(_DOT.format(a="c_emb", b="c_emb")))
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("q_bucket") == F.col("bucket"))
            & (F.col("c_id") != F.col("q_id")),
        )
        .select("q_id", "c_id", F.round(cos, 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), "c_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )
