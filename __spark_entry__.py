"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline: encode sf0.001 ``documents``
with auto-selected per-column codecs, decode, and return a per-column
summary proving the sha256 round-trip.

``queries()`` exposes the engine's operators (SURVEY.md §2) at any sf dir;
``oracle_sql()`` provides DuckDB-equivalent SQL for everything
SQL-expressible. The roundtrip queries ARE oracle-checked: the Spark side
returns (sha256, count) histograms computed from *decoded* data, the
oracle computes the same from the *source* parquet — equality proves the
decode is bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from cpp_parquet_spark.engine import decode_table, encode_table
from cpp_parquet_spark.partitioning import EncodeConfig

DOCS_CFG = EncodeConfig(keys=("source",), salt_from=("doc_id",), num_parts=4,
                        order_keys=("doc_id",), table_name="documents")
EVENTS_CFG = EncodeConfig(keys=("event_type",), salt_from=("event_id",),
                          num_parts=4, order_keys=("event_id",),
                          table_name="events")
LINEITEM_CFG = EncodeConfig(keys=("l_returnflag",), salt_from=("l_orderkey",),
                            num_parts=8,
                            order_keys=("l_orderkey", "l_linenumber"),
                            table_name="lineitem")


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode+decode sf0.001 documents, per-column codec summary
    with the sha256 round-trip verdict."""
    sf_dir = "/root/testdata/sf0.001"
    df = _read(spark, sf_dir, "documents")
    pages = encode_table(df, DOCS_CFG).cache()
    decoded = decode_table(pages)

    enc = (pages.filter(F.col("col_idx") >= 0)
           .groupBy("column")
           .agg(F.count("*").alias("num_pages"),
                F.array_sort(F.collect_set("codec")).alias("codecs"),
                F.sum("raw_bytes").alias("raw_bytes"),
                F.sum("enc_bytes").alias("enc_bytes")))

    def hist(d: DataFrame, col: str) -> DataFrame:
        c = F.col(col)
        dt = d.schema[col].dataType.simpleString()
        if dt not in ("string", "binary"):
            c = c.cast("string")
        return (d.select(F.sha2(c.cast("binary"), 256).alias("h"))
                 .groupBy("h").agg(F.count("*").alias("c")))

    verdicts = []
    for col in df.columns:
        a, b = hist(df, col), hist(decoded, col)
        bad = (a.join(b, ["h", "c"], "full_outer")
                .filter(F.col("h").isNull() | F.col("c").isNull()).count())
        mism = a.join(b, ["h", "c"], "anti").count() + \
               b.join(a, ["h", "c"], "anti").count()
        verdicts.append((col, mism == 0))
    vdf = spark.createDataFrame(verdicts, "column string, sha256_match boolean")
    out = (enc.join(vdf, "column")
           .withColumn("ratio", F.round(F.col("raw_bytes") /
                                        F.col("enc_bytes"), 3))
           .orderBy("column"))
    return out


# ---------------------------------------------------------------------------
# queries + oracles
# ---------------------------------------------------------------------------

def _roundtrip_hist(table: str, cfg: EncodeConfig, col: str):
    """Encode -> decode -> (sha256, count) histogram of one column.

    The DuckDB oracle computes the histogram from the SOURCE table, so a
    row-for-row match proves the engine reproduced every value
    bit-identically (BASELINE.json:15)."""
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _read(spark, sf_dir, table)
        decoded = decode_table(encode_table(df, cfg))
        c = F.col(col)
        dt = decoded.schema[col].dataType.simpleString()
        if dt.startswith("timestamp"):
            c = F.unix_micros(c.cast("timestamp")).cast("string")
        elif dt not in ("string", "binary"):
            c = c.cast("string")
        return (decoded.select(F.sha2(c.cast("binary"), 256).alias("h"))
                .groupBy("h").agg(F.count("*").alias("cnt")))
    return q


def _pages_summary(table: str, cfg: EncodeConfig):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = _read(spark, sf_dir, table)
        pages = encode_table(df, cfg)
        return (pages.filter(F.col("col_idx") >= 0)
                .groupBy("column")
                .agg(F.count("*").alias("num_pages"),
                     F.sum("num_values").alias("num_values"),
                     F.sum("raw_bytes").alias("raw_bytes"),
                     F.sum("enc_bytes").alias("enc_bytes"),
                     F.array_sort(F.collect_set("codec")).alias("codecs"))
                .orderBy("column"))
    return q


def q_stats_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/E8 sampling-pass statistic: exact per-column cardinality."""
    df = _read(spark, sf_dir, "documents")
    return df.agg(
        F.countDistinct("doc_id").alias("nd_doc_id"),
        F.countDistinct("text").alias("nd_text"),
        F.countDistinct("lang").alias("nd_lang"),
        F.countDistinct("source").alias("nd_source"),
        F.countDistinct("n_chars").alias("nd_n_chars"),
        F.count("*").alias("n_rows"))


def q_stats_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 run-length statistic: mean run length per low-cardinality column
    of lineitem in (l_orderkey, l_linenumber) order — the signal that picks
    RLE (BASELINE.json:6 'run-length histograms')."""
    df = _read(spark, sf_dir, "lineitem")
    df.createOrReplaceTempView("li_rl")
    return spark.sql("""
        WITH ordered AS (
          SELECT l_returnflag, l_linestatus,
                 lag(l_returnflag) OVER w AS prev_rf,
                 lag(l_linestatus) OVER w AS prev_ls
          FROM li_rl
          WINDOW w AS (ORDER BY l_orderkey, l_linenumber)
        )
        SELECT
          count(*) AS n,
          sum(CASE WHEN prev_rf IS NULL OR prev_rf <> l_returnflag
              THEN 1 ELSE 0 END) AS runs_returnflag,
          sum(CASE WHEN prev_ls IS NULL OR prev_ls <> l_linestatus
              THEN 1 ELSE 0 END) AS runs_linestatus
        FROM ordered
    """)


def q_stats_bytes_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-volume stats per group (partition-sizing input, SURVEY.md §4.2)."""
    df = _read(spark, sf_dir, "documents")
    return (df.groupBy("lang")
            .agg(F.count("*").alias("n"),
                 F.sum(F.octet_length("text")).alias("text_bytes"),
                 F.min("n_chars").alias("min_chars"),
                 F.max("n_chars").alias("max_chars"))
            .orderBy("lang"))


def q_codec_decision_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 decision function, SQL-expressible form: per string column of
    documents, pick dict/fsst/plain from (cardinality, avg length) — the
    same thresholds the page-level selector uses for its fast path."""
    df = _read(spark, sf_dir, "documents")
    df.createOrReplaceTempView("docs_cd")
    return spark.sql("""
        WITH stats AS (
          SELECT 'lang' AS col_name, count(DISTINCT lang) AS nd, count(*) AS n,
                 avg(octet_length(lang)) AS avg_len FROM docs_cd
          UNION ALL
          SELECT 'source', count(DISTINCT source), count(*),
                 avg(octet_length(source)) FROM docs_cd
          UNION ALL
          SELECT 'text', count(DISTINCT text), count(*),
                 avg(octet_length(text)) FROM docs_cd
        )
        SELECT col_name, nd, n,
               CASE WHEN nd <= n / 2 AND nd <= 65536 THEN 'dict'
                    WHEN avg_len >= 16 THEN 'fsst'
                    ELSE 'plain' END AS codec
        FROM stats ORDER BY col_name
    """)


def q_dict_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dictionary page's content for a low-cardinality column."""
    return (_read(spark, sf_dir, "documents")
            .select("lang").distinct().orderBy("lang"))


def q_groupby_topk_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (_read(spark, sf_dir, "documents")
            .groupBy("source")
            .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
            .orderBy(F.desc("chars"), "source").limit(5))


def q_join_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join + decimal-exact aggregate."""
    o = _read(spark, sf_dir, "orders")
    c = _read(spark, sf_dir, "customer")
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                  .alias("total"))
            .orderBy("c_mktsegment"))


def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window/sort operator sanity on the events table."""
    df = _read(spark, sf_dir, "events")
    df.createOrReplaceTempView("ev_w")
    return spark.sql("""
        SELECT user_id, n_events, first_event
        FROM (
          SELECT user_id, count(*) AS n_events, min(event_id) AS first_event
          FROM ev_w GROUP BY user_id
        ) WHERE n_events >= 2 ORDER BY user_id
    """)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # roundtrip correctness (oracle = histogram over SOURCE => proves
        # decoded bytes identical)
        "roundtrip_documents_text": _roundtrip_hist("documents", DOCS_CFG, "text"),
        "roundtrip_documents_docid": _roundtrip_hist("documents", DOCS_CFG, "doc_id"),
        "roundtrip_events_props": _roundtrip_hist("events", EVENTS_CFG, "props"),
        "roundtrip_events_ts": _roundtrip_hist("events", EVENTS_CFG, "ts"),
        "roundtrip_lineitem_qty": _roundtrip_hist("lineitem", LINEITEM_CFG,
                                                  "l_quantity"),
        # stats / selection (E8, S6)
        "stats_cardinality": q_stats_cardinality,
        "stats_run_lengths": q_stats_run_lengths,
        "stats_bytes_by_group": q_stats_bytes_by_group,
        "codec_decision_sql": q_codec_decision_sql,
        "dict_domain": q_dict_domain,
        # pipeline relational ops (§2.3)
        "groupby_topk_sources": q_groupby_topk_sources,
        "join_orders_customer": q_join_orders_customer,
        "events_window": q_events_window,
        # non-SQL-expressible: encoded-pages shape (rows-only check)
        "pages_summary_documents": _pages_summary("documents", DOCS_CFG),
        "pages_summary_lineitem": _pages_summary("lineitem", LINEITEM_CFG),
    }


def oracle_sql() -> dict[str, str]:
    def rt(table: str, col: str, cast: str | None = None) -> str:
        # duckdb 1.0's sha256 takes VARCHAR and hashes its UTF-8 bytes --
        # the same bytes Spark's sha2(cast(col as binary), 256) sees
        expr = col if cast is None else f"CAST({col} AS {cast})"
        return (f"SELECT sha256({expr}) AS h, "
                f"count(*) AS cnt FROM {table} GROUP BY 1")
    return {
        "roundtrip_documents_text": rt("documents", "text"),
        "roundtrip_documents_docid": rt("documents", "doc_id", "VARCHAR"),
        "roundtrip_events_props": rt("events", "props"),
        "roundtrip_events_ts":
            "SELECT sha256(CAST(epoch_us(ts) AS VARCHAR)) AS h,"
            " count(*) AS cnt FROM events GROUP BY 1",
        "roundtrip_lineitem_qty": rt("lineitem", "l_quantity", "VARCHAR"),
        "stats_cardinality": """
            SELECT count(DISTINCT doc_id) AS nd_doc_id,
                   count(DISTINCT text) AS nd_text,
                   count(DISTINCT lang) AS nd_lang,
                   count(DISTINCT source) AS nd_source,
                   count(DISTINCT n_chars) AS nd_n_chars,
                   count(*) AS n_rows
            FROM documents""",
        "stats_run_lengths": """
            WITH ordered AS (
              SELECT l_returnflag, l_linestatus,
                     lag(l_returnflag) OVER w AS prev_rf,
                     lag(l_linestatus) OVER w AS prev_ls
              FROM lineitem
              WINDOW w AS (ORDER BY l_orderkey, l_linenumber)
            )
            SELECT count(*) AS n,
                   sum(CASE WHEN prev_rf IS NULL OR prev_rf <> l_returnflag
                       THEN 1 ELSE 0 END) AS runs_returnflag,
                   sum(CASE WHEN prev_ls IS NULL OR prev_ls <> l_linestatus
                       THEN 1 ELSE 0 END) AS runs_linestatus
            FROM ordered""",
        "stats_bytes_by_group": """
            SELECT lang, count(*) AS n,
                   sum(strlen(text)) AS text_bytes,
                   min(n_chars) AS min_chars, max(n_chars) AS max_chars
            FROM documents GROUP BY lang ORDER BY lang""",
        "codec_decision_sql": """
            WITH stats AS (
              SELECT 'lang' AS col_name, count(DISTINCT lang) AS nd,
                     count(*) AS n, avg(strlen(lang)) AS avg_len
              FROM documents
              UNION ALL
              SELECT 'source', count(DISTINCT source), count(*),
                     avg(strlen(source)) FROM documents
              UNION ALL
              SELECT 'text', count(DISTINCT text), count(*),
                     avg(strlen(text)) FROM documents
            )
            SELECT col_name, nd, n,
                   CASE WHEN nd <= n / 2 AND nd <= 65536 THEN 'dict'
                        WHEN avg_len >= 16 THEN 'fsst'
                        ELSE 'plain' END AS codec
            FROM stats ORDER BY col_name""",
        "dict_domain":
            "SELECT DISTINCT lang FROM documents ORDER BY lang",
        "groupby_topk_sources": """
            SELECT source, count(*) AS n, sum(n_chars) AS chars
            FROM documents GROUP BY source
            ORDER BY chars DESC, source LIMIT 5""",
        "join_orders_customer": """
            SELECT c_mktsegment, count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment""",
        "events_window": """
            SELECT user_id, n_events, first_event
            FROM (
              SELECT user_id, count(*) AS n_events,
                     min(event_id) AS first_event
              FROM events GROUP BY user_id
            ) t WHERE n_events >= 2 ORDER BY user_id""",
        # pages_summary_* intentionally omitted: encoded-page layout is not
        # SQL-expressible; driver records rows-only checks for them.
    }
