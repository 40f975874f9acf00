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
           list_transform(embedding::DOUBLE[],
                          x -> ROUND(x / sqrt(list_dot_product(
                                 embedding::DOUBLE[], embedding::DOUBLE[])), 6))
               AS unit
    FROM embeddings
    """,
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize every embedding (the pre-cosine projection), 6dp-rounded.

    Pure per-row array math — stays in the scan's codegen'd projection; the
    norm fold is shared across the 64 divisions by expression reuse.
    """
    vecs = table(spark, sf_dir, "embeddings").select("vec_id", emb_d().alias("emb"))
    return vecs.select(
        "vec_id",
        F.expr(
            f"transform(emb, x -> round(x / sqrt({_DOT.format(a='emb', b='emb')}), 6))"
        ).alias("unit"),
    )
