"""UDF surface (SURVEY.md §2.2): Arrow-vectorized pandas_udf and
applyInPandas — the distributed generalization of the reference's
pandas transform stage (/root/reference/spotifytransform.py:86-99).

Both are deterministic and oracle-checked; the point is exercising the
Arrow exchange + grouped-map machinery, not the arithmetic. Scale note:
pandas_udf/applyInPandas move data across the JVM↔Python boundary in
Arrow batches — reserved for logic the built-ins can't express; the
equivalent built-in forms live in analytics.py.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import table
from ..registry import register


@register(
    "udf_pandas_scalar",
    oracle="""
SELECT doc_id, CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens
FROM documents WHERE doc_id % 3 = 0
""",
    tags=("udf", "pandas"),
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: vectorized token count over Arrow batches.

    (Defined inside the call — pandas_udf type resolution needs an
    active session, so a module-level decorator breaks import order.)
    """

    @pandas_udf("int")
    def token_count(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int32")

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


@register(
    "udf_apply_in_pandas",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n_orders,
       MAX(o_totalprice) AS max_price,
       CAST(DATEDIFF('day', CAST(MIN(o_orderdate) AS DATE), CAST(MAX(o_orderdate) AS DATE)) AS BIGINT) AS span_days
FROM orders
GROUP BY o_orderpriority, o_orderstatus
""",
    tags=("udf", "pandas", "grouped"),
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-(priority, status) order stats.

    This is exactly what distributes the reference's eager pandas stage:
    each group becomes one pandas DataFrame on an executor. Keyed on a
    BOUNDED composite (15 groups) deliberately: grouped-map pays a
    Python dispatch + Arrow round-trip PER GROUP, so high-cardinality
    keys (e.g. per-customer: 15k tiny groups, measured ~6× slower here)
    belong in built-in aggregates (agg_stats) — reserve applyInPandas
    for group logic that genuinely needs pandas on big groups.
    """
    orders = table(spark, sf_dir, "orders")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        d = pdf["o_orderdate"].dt.normalize()
        return pd.DataFrame(
            {
                "o_orderpriority": [pdf["o_orderpriority"].iloc[0]],
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "n_orders": [len(pdf)],
                "max_price": [pdf["o_totalprice"].max()],
                "span_days": [(d.max() - d.min()).days],
            }
        )

    return orders.groupBy("o_orderpriority", "o_orderstatus").applyInPandas(
        stats,
        schema="o_orderpriority string, o_orderstatus string, n_orders long, "
        "max_price double, span_days long",
    )


@register(
    "from_json_props",
    oracle="""
SELECT CAST(JSON_EXTRACT_STRING(props, '$.k') AS INTEGER) AS k,
       COUNT(*) AS n
FROM events
GROUP BY 1
""",
    tags=("json",),
)
def from_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 as a column operator: from_json with an explicit schema
    (vs get_json_object's path extraction in json_extract_events)."""
    ev = table(spark, sf_dir, "events")
    parsed = ev.select(F.from_json("props", "k INT").alias("p"))
    return parsed.groupBy(F.col("p.k").alias("k")).agg(F.count(F.lit(1)).alias("n"))
