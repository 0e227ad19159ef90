"""String functions (SURVEY.md §2.B B11, §2.C "Scalar functions" / String).

Reference evidence: SQL ``CONCAT`` (``ScalaSparkTest.java:401``), ``split``
(``ScalaSparkTest.java:295``). Cross-engine traps handled here: DuckDB's
``regexp_replace`` replaces only the first match unless given the ``'g'``
flag (Spark replaces all), and ``instr`` ≡ DuckDB ``strpos`` (both 1-based).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table


@query(
    "fn_string_concat",
    "SELECT p_partkey,"
    " CONCAT(p_brand, ' / ', p_type) AS brand_type,"
    " upper(p_brand) AS brand_uc,"
    " lower(p_type) AS type_lc,"
    " substring(p_name, 1, 8) AS name8,"
    " lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,"
    " trim(CONCAT('  ', p_brand, '  ')) AS brand_trim,"
    " length(p_name) AS name_len,"
    " strpos(p_type, 'a') AS a_pos"
    " FROM part",
    tag="function",
)
def fn_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat(F.col("p_brand"), F.lit(" / "), F.col("p_type")).alias("brand_type"),
        F.upper("p_brand").alias("brand_uc"),
        F.lower("p_type").alias("type_lc"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
        F.length("p_name").alias("name_len"),
        F.instr("p_type", "a").alias("a_pos"),
    )


@query(
    "fn_string_regex",
    "SELECT p_partkey,"
    " regexp_extract(p_type, '([a-z]+)$', 1) AS last_word,"
    " regexp_replace(p_type, '[aeiou]', '_', 'g') AS devoweled,"
    " regexp_matches(p_name, '^[a-m]') AS starts_early,"
    " split_part(p_type, ' ', 1) AS first_token"
    " FROM part",
    tag="function",
)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction/replacement. DuckDB ``regexp_replace`` needs the 'g'
    flag to match Spark's replace-all; ``rlike`` ≡ ``regexp_matches``."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("devoweled"),
        F.col("p_name").rlike("^[a-m]").alias("starts_early"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_token"),
    )


_LEV_ORACLE = """
SELECT p_partkey, p_name,
       CAST(levenshtein(p_name, 'red widget') AS INT) AS lev_dist
FROM part
WHERE levenshtein(p_name, 'red widget') <= 6
"""


@query("fn_string_distance", _LEV_ORACLE, tag="function")
def fn_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance filtering (fuzzy match): ``levenshtein`` is a built-in
    JVM expression in Spark and a native function in DuckDB — identical
    distances, so the fuzzy-match set is oracle-exact. The filter stays in
    codegen; no UDF fuzzy matching."""
    p = load_table(spark, sf_dir, "part")
    lev = F.levenshtein("p_name", F.lit("red widget"))
    return p.where(lev <= 6).select("p_partkey", "p_name", lev.cast("int").alias("lev_dist"))


@query(
    "fn_url_parse",
    "WITH u AS (SELECT doc_id,"
    "  'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)"
    "  || '?lang=' || lang AS url FROM documents)"
    " SELECT doc_id, url,"
    "  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,"
    "  regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,"
    "  regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,"
    "  regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),"
    "    '([^.]+\\.[^.]+)$', 1) AS domain"
    " FROM u",
    tag="function",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL componentization with plain regex (host / path / query param /
    registrable domain) — the normalization pass of every web-corpus
    pipeline (source attribution, per-domain capping feeds on `domain`).
    Regex extraction keeps the whole thing in codegen and gives the oracle
    identical semantics (Spark's ``parse_url`` has engine-specific edge
    cases; regex is portable by construction). URLs are synthesized from
    table columns so the key is self-contained on the fixture."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    host = F.regexp_extract("url", r"^[a-z]+://([^/?#]+)", 1)
    return d.select("doc_id", url.alias("url")).select(
        "doc_id",
        "url",
        host.alias("host"),
        F.regexp_extract("url", r"^[a-z]+://[^/?#]+([^?#]*)", 1).alias("path"),
        F.regexp_extract("url", r"[?&]lang=([^&#]*)", 1).alias("lang_param"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1).alias("domain"),
    )


_EXTRACT_ALL_ORACLE = r"""
SELECT doc_id,
       COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '')
         AS numbers,
       CAST(COALESCE(len(regexp_extract_all(text, '[0-9]+')), 0) AS INT)
         AS n_numbers,
       COALESCE(array_to_string(list_sort(list_distinct(
         regexp_extract_all(lower(text), '[a-z]{7,}'))), ','), '') AS long_words
FROM documents
WHERE doc_id % 25 = 0
"""


@query("fn_regexp_extract_all", _EXTRACT_ALL_ORACLE, tag="function")
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-match regex extraction (``regexp_extract_all``) — every number
    and every 7+-letter word per document, the workhorse for structured
    scraping out of raw text. Arrays are joined/sorted to strings so the
    compared frame stays scalar-typed for the driver harness. Pure codegen
    map pass, no shuffle; the doc_id%25 slice bounds compared rows."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    numbers = F.regexp_extract_all("text", F.lit("[0-9]+"), 0)
    longw = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]{7,}"), 0)
    # NULL text must yield the same shape on both sides: the oracle
    # coalesces to ''/0, so the Spark side does too (array_join/size of a
    # NULL array are NULL, not empty)
    return d.select(
        "doc_id",
        F.coalesce(F.array_join(numbers, ","), F.lit("")).alias("numbers"),
        F.coalesce(F.size(numbers), F.lit(0)).alias("n_numbers"),
        F.coalesce(
            F.array_join(F.array_sort(F.array_distinct(longw)), ","), F.lit("")
        ).alias("long_words"),
    )


@query("fn_xpath", tag="function")  # rows-only: the oracle engine has no XPath
def fn_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction over XML payloads (``xpath_string``/``xpath_int``/
    ``xpath``): the XML sibling of the JSON-path family (``fn_json``) for
    feed/config columns. Payloads are synthesized from nation rows so the
    extraction is verifiable in pytest; pure JVM expressions, map-only at
    any scale. Rows-only here because DuckDB ships no XPath."""
    n = load_table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><key>"),
        F.col("n_nationkey").cast("string"),
        F.lit("</key><name>"),
        F.col("n_name"),
        F.lit("</name><tags><t>a</t><t>b</t></tags></nation>"),
    )
    return n.select(
        "n_nationkey",
        xml.alias("payload"),
        F.expr("xpath_string(payload, '/nation/name')").alias("x_name"),
        F.expr("xpath_int(payload, '/nation/key')").alias("x_key"),
        F.expr("size(xpath(payload, '/nation/tags/t/text()'))").alias("n_tags"),
    ).drop("payload")


@query("fn_phonetic", tag="function")  # rows-only: soundex/levenshtein mix is engine-specific
def fn_phonetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic encoding (``soundex``) — the classic blocking key for
    entity resolution on names: candidate pairs only form within a soundex
    bucket, the same cost-bounding device as ``join_fuzzy``'s length bands.
    Deterministic (algorithmic, no RNG) and pinned against known encodings
    in pytest; rows-only because the oracle engine has no soundex."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_name",
        F.soundex("c_name").alias("name_soundex"),
        F.length(F.soundex("c_name")).alias("code_len"),
    )


_COLLATION_ORACLE = """
SELECT lower(name) AS name_ci,
       CAST(COUNT(*) AS BIGINT) AS n_variants,
       CAST(COUNT(DISTINCT name) AS BIGINT) AS n_spellings
FROM (SELECT upper(n_name) AS name FROM nation
      UNION ALL
      SELECT concat(upper(substr(n_name, 1, 1)), lower(substr(n_name, 2)))
      FROM nation)
GROUP BY 1
"""


@query("fn_collation", _COLLATION_ORACLE, tag="function")
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (Spark 4 ``collate(..., 'UNICODE_CI')``):
    case-insensitive GROUP BY as a COLUMN TYPE property instead of the
    classic ``lower()`` normalization — comparisons, joins, and aggregations
    on the collated column all inherit the collation, and (unlike
    ``lower()``) the optimizer still prunes/pushes on the original column.

    The input is a synthesized case-variant union (ALGERIA + Algeria, from
    nation), so the collated group-by provably merges spellings: 25 groups
    of 2 variants each. The distinct-spelling count runs on the BINARY
    collation inside the same aggregate, showing the two collations compose.
    Output keys are lowercased and cast back to a plain UTF8_BINARY string
    so the result schema is engine-portable (the group representative Spark
    retains under CI collation is otherwise nondeterministic)."""
    n = load_table(spark, sf_dir, "nation")
    variants = n.select(F.upper("n_name").alias("name")).unionAll(
        n.select(F.initcap(F.lower("n_name")).alias("name"))
    )
    return (
        variants.groupBy(F.collate(F.col("name"), "UNICODE_CI").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.countDistinct(F.collate(F.col("name"), "UTF8_BINARY")).alias(
                "n_spellings"
            ),
        )
        .select(
            F.lower(F.collate(F.col("k"), "UTF8_BINARY")).alias("name_ci"),
            "n_variants",
            "n_spellings",
        )
    )


@query(
    "fn_binary_codecs",
    "SELECT doc_id,"
    " base64(encode(coalesce(text, ''))) AS b64,"
    " hex(encode(coalesce(text, ''))) AS hx,"
    " TRUE AS roundtrip_ok"
    " FROM documents",
    tag="functions",
)
def fn_binary_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary↔text transport codecs — ``base64``/``unbase64`` and
    ``hex``/``unhex`` over the UTF-8 bytes of each document. Every
    interchange surface (JSON-wrapped blobs, WARC payload digests, JDBC
    binary columns) funnels through these, so the key proves Spark's
    implementations against DuckDB's independent ``base64``/``hex`` on
    identical bytes, AND asserts the decode side inverts the encode
    in-plan (``roundtrip_ok``) — both directions, both codecs, all
    codegen (no UDFs). Spark's ``base64`` emits the MIME variant (76-char
    lines joined with CRLF, per java.util.Base64's encoder) — the CRLFs
    are stripped to the canonical unwrapped alphabet every other engine
    (and RFC 4648 proper) produces; ``unbase64`` accepts both, which the
    round-trip bit also proves."""
    d = load_table(spark, sf_dir, "documents")
    b = F.coalesce(F.col("text"), F.lit("")).cast("binary")
    b64 = F.regexp_replace(F.base64(b), "\r\n", "")
    hx = F.hex(b)
    return d.select(
        "doc_id",
        b64.alias("b64"),
        hx.alias("hx"),
        (
            (F.unbase64(b64).cast("string") == F.coalesce(F.col("text"), F.lit("")))
            & (F.unhex(hx).cast("string") == F.coalesce(F.col("text"), F.lit("")))
        ).alias("roundtrip_ok"),
    )
