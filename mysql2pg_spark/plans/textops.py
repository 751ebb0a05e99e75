"""Text-analysis queries over the documents table (net-new operator
family; graded alongside SURVEY §2 per BASELINE.json north_star).

Oracle fragments replicate the exact arithmetic of operators/textops.py
(occurrence counts, ratio bands) so results are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mysql2pg_spark.operators import textops as T
from mysql2pg_spark.plans.registry import query
from mysql2pg_spark.tables import load_table

_NORM = "trim(lower(text))"
_TOKENS = f"string_split_regex({_NORM}, '\\s+')"


def _occ_sql(marker: str) -> str:
    return (
        f"(length({_NORM}) - length(replace({_NORM}, '{marker}', '')))"
        f" / {len(marker)}"
    )


def _lang_score_sql(lang: str) -> str:
    return (
        "CAST("
        + " + ".join(_occ_sql(m) for m in T.LANG_MARKERS[lang])
        + " AS BIGINT)"
    )


_BEST = "greatest(" + ", ".join(_lang_score_sql(l) for l in T.LANG_MARKERS) + ")"
_LANG_CASE = (
    "CASE "
    + " ".join(
        f"WHEN {_lang_score_sql(l)} > 0 AND {_lang_score_sql(l)} = {_BEST} THEN '{l}'"
        for l in T.LANG_MARKERS
    )
    + " ELSE 'und' END"
)


# --------------------------------------------------------------------------
# t01 — token stats + quality score + fingerprint.
# --------------------------------------------------------------------------
@query(
    "t01_text_stats",
    oracle=f"""
SELECT
  doc_id,
  CAST(len({_TOKENS}) AS BIGINT)                      AS n_tokens,
  md5(regexp_replace({_NORM}, '\\s+', ' ', 'g'))      AS fp,
  round(
    CASE WHEN len({_TOKENS}) >= 20 AND len({_TOKENS}) <= 80 THEN 0.4
         WHEN len({_TOKENS}) >= 5  AND len({_TOKENS}) < 20  THEN 0.2
         ELSE 0.0 END
    + CASE WHEN length(regexp_replace({_NORM}, '\\s+', '', 'g')) / len({_TOKENS}) >= 3
            AND length(regexp_replace({_NORM}, '\\s+', '', 'g')) / len({_TOKENS}) <= 8
           THEN 0.3 ELSE 0.1 END
    + (length(regexp_replace({_NORM}, '[^a-z]', '', 'g'))
       / greatest(length({_NORM}), 1)) * 0.3
  , 4)                                                AS quality
FROM documents
ORDER BY doc_id
""",
)
def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.fingerprint("text").alias("fp"),
        T.quality_score("text").alias("quality"),
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# t02 — language-ID heuristic (marker-occurrence argmax).
# --------------------------------------------------------------------------
@query(
    "t02_lang_id",
    oracle=f"""
SELECT
  doc_id,
  {_lang_score_sql('en')}   AS s_en,
  {_lang_score_sql('de')}   AS s_de,
  {_lang_score_sql('fr')}   AS s_fr,
  {_lang_score_sql('es')}   AS s_es,
  {_LANG_CASE}              AS lang_pred
FROM documents
ORDER BY doc_id
""",
)
def t02_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.lang_score("text", "en").alias("s_en"),
        T.lang_score("text", "de").alias("s_de"),
        T.lang_score("text", "fr").alias("s_fr"),
        T.lang_score("text", "es").alias("s_es"),
        T.lang_id("text").alias("lang_pred"),
    ).orderBy("doc_id")
