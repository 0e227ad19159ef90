"""End-to-end training-data preparation composite (SURVEY.md §2.D capstone).

The llmops operators compose into ONE declarative plan — quality filtering,
exact dedup, language selection, deterministic sampling, token accounting —
with no Python in the path and no driver-side materialization. This is the
shape of a real 100 TB curation job: every stage is a narrow projection or a
single keyed shuffle, and Catalyst prunes/pushes across all of them because
the pipeline never leaves one DataFrame.

Sampling is **content-addressed** (a digest-suffix predicate), not RNG-based:
the same document always lands in the same split on any cluster, any retry,
any partitioning — the reproducibility property training pipelines need —
and, unlike seeded engine RNG, it is oracle-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

#: quality gates (word count window) and sample fraction (8/16 digest chars)
MIN_WORDS = 20
MAX_WORDS = 120
SAMPLE_CHARS = "01234567"  # last md5 nibble in this set ⇒ ~50% sample

_PREP_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         md5(lower(trim(text))) AS digest,
         len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> ''))
           AS n_tokens
  FROM documents),
gated AS (
  SELECT * FROM scored
  WHERE n_tokens BETWEEN {MIN_WORDS} AND {MAX_WORDS}),
deduped AS (
  SELECT digest, MIN(doc_id) AS doc_id FROM gated GROUP BY digest),
kept AS (
  SELECT g.doc_id, g.lang, g.digest, g.n_tokens
  FROM gated g JOIN deduped d ON g.doc_id = d.doc_id AND g.digest = d.digest
  WHERE g.lang IN ('en', 'de', 'fr')
    AND substr(g.digest, 32, 1) IN ('0','1','2','3','4','5','6','7'))
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM kept GROUP BY lang
"""


@query("llm_data_prep", _PREP_ORACLE, tag="llm-text")
def llm_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality gate → exact dedup (keep-min per digest) → language filter →
    content-addressed 50% sample → per-language token budget."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.md5(F.lower(F.trim("text"))).alias("digest"),
        F.size(F.filter(F.split("text", r"\s+"), lambda w: w != "")).alias("n_tokens"),
    )
    gated = scored.where(F.col("n_tokens").between(MIN_WORDS, MAX_WORDS))
    # keep-min dedup as ONE aggregation: the survivor of a digest group is
    # its min-doc_id row, so min_by fetches that row's payload in the same
    # pass — the groupBy+self-join form evaluated the whole scan+md5+
    # tokenize subtree twice (the two consumers shuffle on different keys,
    # so no exchange reuse), and at 100 TB that is two corpus passes.
    # doc_id is unique, so min_by's tie behavior is unreachable and the
    # surviving (lang, n_tokens) pair is exactly the joined row's.
    kept = (
        gated.groupBy("digest")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by(F.struct("lang", "n_tokens"), "doc_id").alias("s"),
        )
        .select("digest", "doc_id", "s.lang", "s.n_tokens")
        .where(F.col("lang").isin("en", "de", "fr"))
        .where(F.substring("digest", 32, 1).isin(*SAMPLE_CHARS))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
