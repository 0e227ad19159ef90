"""Instruction-tuning data preparation: chat templating and turn tables.

SFT pipelines store conversations as (role, content) turns and train on a
FLATTENED string with a loss mask over the assistant span. The two
operations every such pipeline runs:

- ``chat_template_flatten``: render the turn list through a template with
  role sentinels and compute the mask boundary (prompt span vs completion
  span) — the numbers the trainer needs to zero prompt-token loss;
- ``chat_turns_explode``: the inverse normalization, one row per turn
  with its role and position — the shape turn-level filters (PII, length,
  role-balance) operate on;
- ``chat_preference_pairs`` / ``chat_rejection_sample`` (r9): the
  preference-tuning stage — derive DPO (chosen, rejected) pairs and
  best-of-n survivors from K scored candidates per prompt, computed
  in-row with zero shuffle (plan-pinned in tests/test_plan_hygiene.py).

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


# --- preference data (DPO / best-of-n) -------------------------------------
#
# Preference-tuning pipelines take K candidate completions per prompt plus a
# scalar reward and derive (chosen, rejected) pairs (DPO) or keep the
# above-average candidates (rejection sampling / best-of-n distillation).
# The driver testdata has no reward column, so candidate j is synthesized as
# a deterministic truncation of the assistant span and its reward as a
# doc_id/j-keyed integer that is DISTINCT within each prompt by
# construction: score = ((doc_id*31 + j*37) % 97) * 4 + j. Distinctness
# matters — argmax/argmin tie-breaking is engine-unspecified, so a tie
# would make the oracle hash nondeterministic rather than prove anything.

#: candidate completions per prompt
N_CANDIDATES = 4
#: minimum chosen-vs-rejected reward gap for a usable DPO pair — sits
#: inside the synthesized margin distribution (min 239 / median 298 /
#: max 329 over doc_id), so the filter provably drops rows
MARGIN_MIN = 280

_SCORE_SQL = "((doc_id * 31 + j * 37) % 97) * 4 + j"
_CAND_LEN_SQL = f"GREATEST(1, length({_ASSISTANT_SQL}) - j * 8)"

_PAIRS_ORACLE = f"""
WITH cands AS (
  SELECT doc_id, j, {_SCORE_SQL} AS score, {_CAND_LEN_SQL} AS cand_len
  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS j)
)
SELECT doc_id,
  CAST(arg_max(j, score) AS INT) AS chosen_idx,
  CAST(arg_min(j, score) AS INT) AS rejected_idx,
  CAST(arg_max(cand_len, score) AS BIGINT) AS chosen_len,
  CAST(arg_min(cand_len, score) AS BIGINT) AS rejected_len,
  CAST(max(score) - min(score) AS BIGINT) AS margin
FROM cands GROUP BY doc_id
HAVING max(score) - min(score) >= {MARGIN_MIN}
"""


def _candidate_structs():
    """In-row candidate array: (score, j, cand_len) structs with score as
    the FIRST field, so Spark's lexicographic struct ordering makes
    array_max/array_min the argmax/argmin — no explode, no shuffle.
    Callers must have materialized an ``assistant_len`` column first (HOF
    lambdas re-evaluate non-attribute children per element)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(N_CANDIDATES - 1)),
        lambda j: F.struct(
            (((F.col("doc_id") * 31 + j * 37) % 97) * 4 + j)
            .cast("long")
            .alias("score"),
            j.cast("int").alias("j"),
            F.greatest(F.lit(1), F.col("assistant_len") - j * 8)
            .cast("long")
            .alias("cand_len"),
        ),
    )


@query("chat_preference_pairs", _PAIRS_ORACLE, tag="llm-text")
def chat_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPO pair construction: per prompt, pick the highest- and
    lowest-reward candidates and keep the pair only when the reward margin
    clears MARGIN_MIN (a low-margin pair teaches the reward model noise).
    Because all K candidates of a prompt are synthesized in-row, the
    argmax/argmin is computed IN-ROW too — array_max/array_min over a
    score-first struct array — so the whole key is one codegen projection:
    zero explode, zero shuffle, the plan you want when K×100 TB of
    candidates stream past. A grouped max_by/min_by would shuffle the full
    candidate set for no reason."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "assistant_len", F.length(F.expr(_ASSISTANT_SQL))
    )
    best = F.array_max(_candidate_structs())
    worst = F.array_min(_candidate_structs())
    out = d.select(
        "doc_id",
        best.getField("j").alias("chosen_idx"),
        worst.getField("j").alias("rejected_idx"),
        best.getField("cand_len").alias("chosen_len"),
        worst.getField("cand_len").alias("rejected_len"),
        (best.getField("score") - worst.getField("score")).alias("margin"),
    )
    return out.where(F.col("margin") >= MARGIN_MIN)


_REJECTION_ORACLE = f"""
WITH cands AS (
  SELECT doc_id, j, {_SCORE_SQL} AS score, {_CAND_LEN_SQL} AS cand_len
  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS j)
), scored AS (
  SELECT doc_id, j, score, cand_len,
         avg(score) OVER (PARTITION BY doc_id) AS doc_avg
  FROM cands
)
SELECT doc_id, CAST(j AS INT) AS cand_idx, CAST(score AS BIGINT) AS score,
       CAST(cand_len AS BIGINT) AS cand_len
FROM scored WHERE score >= doc_avg
"""


@query("chat_rejection_sample", _REJECTION_ORACLE, tag="llm-text")
def chat_rejection_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection sampling / best-of-n harvest: keep each prompt's
    candidates whose reward clears the prompt's own mean — the
    relative-threshold form that adapts to per-prompt reward scale. The
    per-prompt mean is computed IN-ROW over the candidate array
    (aggregate/4 — exact in binary: quarters of integers), the filter is
    an in-row array filter, and only the survivors explode. No window, no
    shuffle: the grouped form (window avg over an exploded candidate
    table) shuffles K×corpus rows to compute a mean of K numbers that
    were born adjacent. The average-of-4-ints comparison is exact on both
    engines (quarters are representable doubles), so the oracle match is
    hash-tight, not tolerance-based."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "assistant_len", F.length(F.expr(_ASSISTANT_SQL))
    )
    d = d.withColumn("cands", _candidate_structs())
    avg = (
        F.aggregate(
            "cands", F.lit(0).cast("long"), lambda acc, c: acc + c.getField("score")
        ).cast("double")
        / N_CANDIDATES
    )
    d = d.withColumn("doc_avg", avg)
    kept = F.filter(
        "cands", lambda c: c.getField("score").cast("double") >= F.col("doc_avg")
    )
    return (
        d.select("doc_id", F.explode(kept).alias("c"))
        .select(
            "doc_id",
            F.col("c.j").alias("cand_idx"),
            F.col("c.score").alias("score"),
            F.col("c.cand_len").alias("cand_len"),
        )
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
