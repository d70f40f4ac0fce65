"""Curation queries: PII scrub, domain caps, repetition rules,
decontamination (LLM-pipeline surface, operators.curation).

Each query binds a curation operator to the documents fixture with a
DuckDB oracle sharing the exact constants/regexes -- the patterns are
restricted to the Java-regex/RE2 common subset so both engines match
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import curation as cu
from ..sources.tables import fan_out, load_table
from . import _fragments as fr
from .registry import query

# DuckDB mirror of curation.inject_synthetic_pii (identical string)
_PII_TEXT = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com tel 555-'"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST(doc_id % 251 AS VARCHAR)"
    " || '.' || CAST(doc_id % 254 + 1 AS VARCHAR)"
)


def _scrub_sql(expr: str) -> str:
    for pattern, token in cu.REDACTIONS:
        expr = f"regexp_replace({expr}, '{pattern}', '{token}', 'g')"
    return expr


@query(
    "pii_scrub_redact",
    f"""
    WITH p AS (SELECT doc_id, {_PII_TEXT} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{cu.EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{cu.PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(t, '{cu.IP_RE}')) AS BIGINT)    AS n_ips,
           {_scrub_sql('t')} AS scrubbed
    FROM p
    """,
    doc="PII scrubbing: count + redact emails/phones/IPv4s with fixed "
    "regex order. The fixture has no natural PII, so deterministic "
    "synthetic PII is planted per doc first (same expression both "
    "engines) -- the oracle then proves the counters and the redacted "
    "text agree byte-for-byte. Pure codegen'd regexp expressions: "
    "scan-speed on any corpus.",
    tags=("curation", "pii", "llm-pipeline"),
)
def pii_scrub_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    pii = cu.inject_synthetic_pii("text", "doc_id")
    counts = cu.pii_counts(pii)
    return d.select(
        "doc_id",
        counts["n_emails"].alias("n_emails"),
        counts["n_phones"].alias("n_phones"),
        counts["n_ips"].alias("n_ips"),
        cu.pii_scrub(pii).alias("scrubbed"),
    )


@query(
    "domain_cap_sample",
    """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT)      AS n_kept,
           CAST(sum(doc_id) AS BIGINT)   AS id_checksum,
           CAST(sum(n_chars) AS BIGINT)  AS chars_kept
    FROM r WHERE rn <= 10 GROUP BY source
    """,
    doc="Per-domain cap (C4/RefinedWeb): keep the first 10 docs per "
    "source deterministically, so no domain dominates the corpus mix. "
    "One row_number window shuffle; exact-integer outputs.",
    tags=("curation", "sampling", "window", "llm-pipeline"),
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    kept = cu.domain_cap(d, "source", "doc_id", 10)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("doc_id").cast("long").alias("id_checksum"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )


@query(
    "gopher_repetition_filter",
    f"""
    WITH b AS (
      SELECT doc_id,
             [array_to_string(({fr.TOKENS})[i:i+1], ' ')
              for i in range(1, len({fr.TOKENS}))] AS bi
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(bi) AS BIGINT)                 AS n_bigrams,
             CAST(len(list_distinct(bi)) AS BIGINT)  AS n_distinct_bigrams,
             CASE WHEN len(bi) = 0 THEN 0.0
                  ELSE CAST(len(bi) - len(list_distinct(bi)) AS DOUBLE) / len(bi)
             END AS dup_frac
      FROM b)
    SELECT doc_id, n_bigrams, n_distinct_bigrams, dup_frac
    FROM m WHERE dup_frac >= 0.05
    """,
    doc="Gopher-style repetition rule: flag docs whose duplicate word-"
    "bigram fraction is >= 0.05 (boilerplate/generated-text signal). "
    "Bigrams, dedup and the ratio are all codegen'd array expressions "
    "-- no shuffle at all, a pure scan+filter at any scale.",
    tags=("curation", "quality", "llm-pipeline"),
)
def gopher_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    # Generate barrier (explode of a 1-element array): the metrics
    # struct is computed ONCE per row and its fields become attribute
    # references. Selecting the struct's fields directly would
    # re-inline the whole bigram build per field + per filter (r7
    # measured 13.5 s -> 1.9 s at sf1 from this change alone).
    return (
        d.select("doc_id", F.explode(F.array(cu.repetition_struct("text"))).alias("m"))
        .select("doc_id", "m.*")
        .filter(F.col("dup_frac") >= 0.05)
    )


@query(
    "decontaminate_ngram_overlap",
    f"""
    WITH g AS (
      SELECT doc_id,
             unnest([array_to_string(({fr.TOKENS})[i:i+2], ' ')
                     for i in range(1, len({fr.TOKENS}) - 1)]) AS gram
      FROM documents),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
    SELECT g.doc_id, CAST(count(DISTINCT g.gram) AS BIGINT) AS n_shared_grams
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
    doc="Benchmark decontamination: training docs sharing any token "
    "3-gram with the held-out benchmark slice (doc_id % 97 = 0 stands "
    "in for an eval set). Benchmark grams broadcast; the corpus side "
    "is explode + broadcast-hash-join + one agg -- never shuffled by "
    "gram. Real pipelines run 8-13 gram windows through this same "
    "plan.",
    tags=("curation", "decontamination", "join", "llm-pipeline"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = fan_out(load_table(spark, sf_dir, "documents"))
    return cu.decontaminate(d, F.col("doc_id") % 97 == 0, n=3)


@query(
    "entity_fuzzy_match",
    """
    WITH n AS (SELECT DISTINCT p_name AS name FROM part),
    blk AS (SELECT name, string_split(name, ' ')[-1] AS blk FROM n)
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev
    FROM blk a JOIN blk b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= 4
    """,
    doc="Blocked fuzzy entity matching over distinct part names: "
    "candidates from a blocking-key (last word) equi-self-join -- never "
    "a cross join -- verified by exact Levenshtein <= 4. The "
    "entity-resolution shape for catalog/author/domain merging at "
    "100 TB: the block key bounds pair explosion, distance verification "
    "is JVM-side and integer-exact (operators/curation.py "
    "fuzzy_match_pairs).",
    tags=("curation", "fuzzy", "entity-resolution"),
)
def entity_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part")
    return cu.fuzzy_match_pairs(
        parts,
        "p_name",
        F.element_at(F.split(F.col("name"), " "), -1),
        max_dist=4,
    )
