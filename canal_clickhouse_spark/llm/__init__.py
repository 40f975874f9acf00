"""§2 K — LLM-data-pipeline operators (SURVEY.md; north-star additions [B]).

Beyond the reference's CDC→OLAP surface (/root/reference/README.md:1), the
driver's brief adds the operators a large-scale training-data pipeline needs:
text statistics/quality/n-grams/TF-IDF, exact and near deduplication
(MinHash+LSH scale path), embedding similarity search, and multimodal binary
columns. All are plain DataFrame compositions (JVM-side, codegen-friendly)
except the deliberately-Python multimodal decode plumbing.
"""

from . import curation, dedup, multimodal, similarity, text  # noqa: F401
