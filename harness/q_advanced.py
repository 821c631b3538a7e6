"""X6 — UDTF surface as a harness operator (SURVEY.md §2.11).

`udtf_unpack`: pack per-document fields into a multi-file commit payload,
then expand it back with the engine's `unpack_commit` Python UDTF via
LATERAL. The UDTF runs Arrow-optimized (session conf), so the plan stays
vectorized. The DuckDB oracle reproduces the unpacking with
string_split + unnest.
"""

from __future__ import annotations

from .queries import q, t

_PACK = (
    "concat(source, char(31), lang, char(30), "
    "concat('doc-', cast(doc_id as string)), char(31), cast(n_chars as string))"
)


@q(
    "udtf_unpack",
    oracle="""
WITH packed AS (
  SELECT doc_id,
         source || chr(31) || lang || chr(30)
         || ('doc-' || CAST(doc_id AS VARCHAR)) || chr(31) || CAST(n_chars AS VARCHAR)
         AS payload
  FROM documents
  WHERE doc_id < 200
), un AS (
  SELECT doc_id, unnest(string_split(payload, chr(30))) AS entry FROM packed
)
SELECT doc_id,
       split_part(entry, chr(31), 1) AS path,
       split_part(entry, chr(31), 2) AS content
FROM un
""",
)
def udtf_unpack(spark, sf_dir):
    from forklift_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    docs = t(spark, sf_dir, "documents").filter("doc_id < 200")
    docs.selectExpr("doc_id", f"{_PACK} as payload").createOrReplaceTempView("udtf_packed")
    return spark.sql(
        "SELECT p.doc_id, u.path, u.content "
        "FROM udtf_packed p, LATERAL unpack_commit(p.payload) u"
    )
