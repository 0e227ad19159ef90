"""Instruction-tuning data preparation: chat templating and turn tables.

SFT pipelines store conversations as (role, content) turns and train on a
FLATTENED string with a loss mask over the assistant span. The two
operations every such pipeline runs:

- ``chat_template_flatten``: render the turn list through a template with
  role sentinels and compute the mask boundary (prompt span vs completion
  span) — the numbers the trainer needs to zero prompt-token loss;
- ``chat_turns_explode``: the inverse normalization, one row per turn
  with its role and position — the shape turn-level filters (PII, length,
  role-balance) operate on.

The driver testdata has no conversation column, so each key synthesizes a
deterministic 3-turn conversation per document (system constant, the
document text split at its midpoint into a user and an assistant turn) —
the same synthesize-from-``documents.text`` convention as the multimodal
and HTML tiers. Both keys are pure codegen projections (zero UDF, zero
shuffle): at 100 TB chat rendering is a map-only pass and must stay one.

Reference basis: generic column-expression transforms
(ScalaSparkCompute-sparkcompute.md:5-6); the template/mask math itself is
standard SFT practice (public: e.g. HuggingFace chat templates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

_SYSTEM = "You are a helpful assistant."

# midpoint split, expressed identically in both engines: half = the
# ceiling midpoint of the text length (integer arithmetic only).
_HALF_SQL = "CAST(floor((length(text) + 1) / 2) AS INT)"
_USER_SQL = f"substring(text, 1, {_HALF_SQL})"
_ASSISTANT_SQL = f"substring(text, {_HALF_SQL} + 1)"

_FLATTEN_ORACLE = f"""
WITH turns AS (
  SELECT doc_id,
    '{_SYSTEM}' AS sys,
    {_USER_SQL} AS user_turn,
    {_ASSISTANT_SQL} AS assistant_turn
  FROM documents
), flat AS (
  SELECT doc_id,
    '<|system|>' || sys || '<|user|>' || user_turn || '<|assistant|>'
      AS prompt,
    assistant_turn || '<|end|>' AS completion
  FROM turns
)
SELECT doc_id,
  prompt || completion AS rendered,
  CAST(length(prompt) AS BIGINT) AS prompt_chars,
  CAST(length(completion) AS BIGINT) AS completion_chars,
  CAST(length(prompt) AS BIGINT) + 1 AS mask_start,
  CAST(length(completion) AS DOUBLE)
    / GREATEST(length(prompt) + length(completion), 1) AS completion_ratio
FROM flat
"""


@query("chat_template_flatten", _FLATTEN_ORACLE, tag="llm-text")
def chat_template_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render each synthesized conversation through a sentinel template
    and emit the loss-mask geometry: the rendered training string, the
    prompt span (everything through the assistant sentinel — loss is
    zeroed there), the 1-based mask start, and the completion ratio (the
    mixture-balance signal SFT curation monitors). One codegen
    projection, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    prompt = F.concat(
        F.lit("<|system|>" + _SYSTEM + "<|user|>"),
        F.expr(_USER_SQL),
        F.lit("<|assistant|>"),
    )
    completion = F.concat(F.expr(_ASSISTANT_SQL), F.lit("<|end|>"))
    p_len = F.length(prompt).cast("bigint")
    c_len = F.length(completion).cast("bigint")
    return d.select(
        "doc_id",
        F.concat(prompt, completion).alias("rendered"),
        p_len.alias("prompt_chars"),
        c_len.alias("completion_chars"),
        (p_len + 1).alias("mask_start"),
        (c_len.cast("double") / F.greatest(p_len + c_len, F.lit(1).cast("bigint"))).alias(
            "completion_ratio"
        ),
    )


_TURNS_ORACLE = f"""
WITH turns AS (
  SELECT doc_id, 0 AS turn_idx, 'system' AS role, '{_SYSTEM}' AS content
  FROM documents
  UNION ALL
  SELECT doc_id, 1, 'user', {_USER_SQL} FROM documents
  UNION ALL
  SELECT doc_id, 2, 'assistant', {_ASSISTANT_SQL} FROM documents
)
SELECT doc_id, CAST(turn_idx AS INT) AS turn_idx, role, content,
  CAST(length(content) AS BIGINT) AS content_chars
FROM turns
"""


@query("chat_turns_explode", _TURNS_ORACLE, tag="llm-text")
def chat_turns_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize each conversation to one row per turn — (doc_id,
    turn_idx, role, content) — the shape turn-level curation (per-role
    PII scrub, length filters, role-alternation checks) operates on.
    Implemented as an in-place 3x explode of a struct array built per
    row: a Generate over the scan, no shuffle, no union of three scans
    (one pass over the corpus, not three — at 100 TB the single-scan
    form is the difference between one and three reads)."""
    d = load_table(spark, sf_dir, "documents")
    turns = F.array(
        F.struct(
            F.lit(0).alias("turn_idx"),
            F.lit("system").alias("role"),
            F.lit(_SYSTEM).alias("content"),
        ),
        F.struct(
            F.lit(1).alias("turn_idx"),
            F.lit("user").alias("role"),
            F.expr(_USER_SQL).alias("content"),
        ),
        F.struct(
            F.lit(2).alias("turn_idx"),
            F.lit("assistant").alias("role"),
            F.expr(_ASSISTANT_SQL).alias("content"),
        ),
    )
    return (
        d.select("doc_id", F.explode(turns).alias("t"))
        .select(
            "doc_id",
            F.col("t.turn_idx").cast("int").alias("turn_idx"),
            F.col("t.role").alias("role"),
            F.col("t.content").alias("content"),
            F.length("t.content").cast("bigint").alias("content_chars"),
        )
    )
