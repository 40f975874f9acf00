"""LLM-pipeline operator properties (SURVEY.md §5.3) beyond the oracle rig."""

from __future__ import annotations

import pytest

from canal_clickhouse_spark import QUERIES
from canal_clickhouse_spark.llm.multimodal import decode_payload


def test_minhash_lsh_recall(spark, sf_dir):
    """LSH-then-verify must recover every true near-dup pair.

    `dedup_near_jaccard` (exact, lang-blocked) is ground truth; the banded
    MinHash path may add cross-lang pairs but must never miss one — the
    8×4 banding s-curve threshold (~0.59) sits well under τ=0.8.
    """
    truth = {
        (r.a_id, r.b_id) for r in QUERIES["dedup_near_jaccard"](spark, sf_dir).collect()
    }
    lsh = {
        (r.a_id, r.b_id) for r in QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()
    }
    assert truth, "fixture must contain near-dup pairs"
    missed = truth - lsh
    assert not missed, f"LSH missed true pairs: {sorted(missed)[:10]}"


def test_dedup_exact_is_partition(spark, sf_dir):
    """Exact dedup groups partition the corpus: copies sum to the input size."""
    from pyspark.sql import functions as F

    res = QUERIES["dedup_exact"](spark, sf_dir)
    total = res.agg(F.sum("n_copies")).first()[0]
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    n5 = docs.filter(F.col("doc_id") % 5 == 0).count()
    n7 = docs.filter(F.col("doc_id") % 7 == 0).count()
    # doc_dups = docs ∪ (%5 exact copies) ∪ (%7 near copies)
    assert total == n + n5 + n7


def test_decode_payload_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x89PNG...")
    feats = decode_payload(b"abc", fake=True)
    assert feats == {"n_bytes": 3, "width": 1 + 97 % 64, "height": 1 + 99 % 64,
                     "checksum": (97 + 98 + 99) % 65536}
    assert decode_payload(b"", fake=True)["n_bytes"] == 0


def test_embed_normalize_unit_norm(spark, sf_dir):
    """Normalized vectors have ||v|| == 1 (to rounding tolerance)."""
    import math

    rows = QUERIES["embed_normalize"](spark, sf_dir).limit(20).collect()
    for r in rows:
        norm = math.sqrt(sum(x * x for x in r.unit))
        assert abs(norm - 1.0) < 1e-4, (r.vec_id, norm)
