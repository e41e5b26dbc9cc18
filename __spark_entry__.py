"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: the CF2→variant-store load pipeline analog
(SURVEY.md §3.2) synthesized deterministically from sf0.001 lineitem.

``queries()`` — one entry per implemented operator family from
SURVEY.md §2, exercised on the driver's TPC-H-ish tables per the
correspondence in FIXTURES.md ("lineitem plays the fact/variant role,
part/supplier the broadcast dimension role"), plus the LLM-data-pipeline
operators on documents/embeddings.

``oracle_sql()`` — independent DuckDB formulations of the same
semantics. Numeric policy for engine-exact matches: aggregate only
exact types (bigint / decimal casts), derive averages from exact sums,
round only deterministic identical-operand double expressions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rat_strain_loader_pipeline_spark.functions.variant import (
    end_pos,
    quality_score,
    variant_type,
)
from rat_strain_loader_pipeline_spark.functions.zygosity import zygosity_snv
from rat_strain_loader_pipeline_spark.operators import text as T
from rat_strain_loader_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from rat_strain_loader_pipeline_spark.operators.interval_join import (
    interval_join_broadcast,
)
from rat_strain_loader_pipeline_spark.operators.similarity import (
    brute_force_topk,
    lsh_bucketed_topk,
)
from rat_strain_loader_pipeline_spark.operators.upsert import upsert_variants


from rat_strain_loader_pipeline_spark.sources.tables import read_table as _t  # noqa: E402


# --------------------------------------------------------------------------
# Synthetic CF2 projection of lineitem (deterministic; mirrors oracle SQL).
# lineitem plays the variant-fact role: position=l_orderkey, alleles and
# depths derived with modular arithmetic so every zygosity branch is hit.
# --------------------------------------------------------------------------

def _synth_cf2(lineitem: DataFrame) -> DataFrame:
    nuc = "ACGT"
    ref = F.substring(F.lit(nuc), (F.col("l_partkey") % 4 + 1).cast("int"), 1)
    var = F.substring(F.lit(nuc), (F.col("l_suppkey") % 4 + 1).cast("int"), 1)
    return lineitem.select(
        F.when(F.col("l_orderkey") % 5 == 0, "X").otherwise("1").alias("chromosome"),
        F.col("l_orderkey").cast("long").alias("position"),
        F.when(F.col("l_linenumber") % 7 == 0, None).otherwise(ref).alias("ref_nuc"),
        F.when((F.col("l_linenumber") % 11 == 0) & (F.col("l_linenumber") % 7 != 0), None)
        .otherwise(var)
        .alias("var_nuc"),
        (F.col("l_partkey") % 100).cast("int").alias("count_a"),
        (F.col("l_suppkey") % 100).cast("int").alias("count_c"),
        (F.col("l_orderkey") % 100).cast("int").alias("count_g"),
        (F.col("l_linenumber") % 100).cast("int").alias("count_t"),
        ((F.col("l_suppkey") % 90) + 10).cast("int").alias("read_depth"),
        ((F.col("l_suppkey") % 90) + 10 + F.col("l_partkey") % 50).cast("int").alias("total_depth"),
        F.when(F.col("l_returnflag") == "R", "M").otherwise("F").alias("gender"),
        (F.col("l_orderkey") % 10 == 0).alias("in_par"),
        F.col("l_linenumber").cast("int").alias("l_linenumber"),
    )


_SYNTH_CF2_SQL = """
    SELECT CASE WHEN l_orderkey % 5 = 0 THEN 'X' ELSE '1' END AS chromosome,
           CAST(l_orderkey AS BIGINT) AS position,
           CASE WHEN l_linenumber % 7 = 0 THEN NULL
                ELSE substr('ACGT', CAST(l_partkey % 4 + 1 AS INT), 1) END AS ref_nuc,
           CASE WHEN l_linenumber % 11 = 0 AND l_linenumber % 7 <> 0 THEN NULL
                ELSE substr('ACGT', CAST(l_suppkey % 4 + 1 AS INT), 1) END AS var_nuc,
           CAST(l_partkey % 100 AS INT) AS count_a,
           CAST(l_suppkey % 100 AS INT) AS count_c,
           CAST(l_orderkey % 100 AS INT) AS count_g,
           CAST(l_linenumber % 100 AS INT) AS count_t,
           CAST(l_suppkey % 90 + 10 AS INT) AS read_depth,
           CAST(l_suppkey % 90 + 10 + l_partkey % 50 AS INT) AS total_depth,
           CASE WHEN l_returnflag = 'R' THEN 'M' ELSE 'F' END AS gender,
           l_orderkey % 10 = 0 AS in_par,
           CAST(l_linenumber AS INT) AS l_linenumber
    FROM lineitem
"""


# --------------------------------------------------------------------------
# Queries
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 aggregation analog (TPC-H Q1 shape): exact decimal sums."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum((price * (F.lit(1).cast("decimal(18,4)") - disc)).cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F11: predicate pushdown + column pruning; integer-only derivations."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
        & (F.col("l_quantity") > 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.month("l_shipdate").cast("int").alias("ship_month"),
        F.col("l_returnflag").alias("returnflag"),
    )


def q_broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast dimension join + aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("p_brand")
    )


def q_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7/J8: 5-way join, revenue per nation (exact decimal revenue)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    revenue = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    ).cast("decimal(28,6)")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("n_name")
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 anti-join: customers with no orders, per market segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6-style semi-join existence check: customers with ≥1 order per nation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_nationkey")
    )


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 interval join: price bands from part sizes, lineitem probes.

    Implemented with the engine's broadcast range-join operator."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.lit("1").alias("chromosome"),
        F.floor("l_extendedprice").cast("long").alias("start_pos"),
        F.floor("l_extendedprice").cast("long").alias("end_pos"),
    )
    bands = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_size").cast("long").alias("band"))
        .distinct()
        .select(
            F.col("band"),
            F.lit("1").alias("i_chr"),
            (F.col("band") * 1000).alias("band_lo"),
            (F.col("band") * 1000 + 999).alias("band_hi"),
        )
    )
    joined = interval_join_broadcast(
        li,
        bands,
        probe_keys=("chromosome", "start_pos", "end_pos"),
        interval_keys=("i_chr", "band_lo", "band_hi"),
    )
    return joined.groupBy("band").agg(F.count(F.lit(1)).alias("n_items")).orderBy("band")


def q_dedup_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 dedup-upsert with deterministic id allocation (engine operator).

    Existing store: one row per orderkey (the linenumber-1 rows) with
    rgd_id = l_orderkey. Incoming: every lineitem keyed by
    (l_orderkey, l_partkey, l_suppkey). Matched rows reuse the id; new
    keys get max(existing)+dense_rank — deterministic across runs."""
    li = _t(spark, sf_dir, "lineitem")
    incoming = li.select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
    existing = (
        li.filter(F.col("l_linenumber") == 1)
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            F.col("l_orderkey").cast("long").alias("rgd_id"),
        )
    )
    out = upsert_variants(
        incoming, existing, key=["l_orderkey", "l_partkey", "l_suppkey"]
    )
    return out.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        F.col("rgd_id").cast("long").alias("rgd_id"),
        F.col("is_new"),
    )


def q_window_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 cumulative sum: running quantity per order by line number."""
    li = _t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in the testdata — a total
    # deterministic ordering needs the full tiebreak chain.
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w).cast("double").alias("running_qty"),
    )


def q_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 first-only semantics: first line of every order."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    )


def q_variant_derivations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X3/A6 on the synthetic CF2 projection: variant type, end pos,
    quality score — the engine's column-expression derivations."""
    cf2 = _synth_cf2(_t(spark, sf_dir, "lineitem"))
    vt = variant_type(F.col("ref_nuc"), F.col("var_nuc"))
    return cf2.select(
        "position",
        "l_linenumber",
        vt.alias("variant_type"),
        end_pos(F.col("position"), F.col("ref_nuc"), vt).cast("long").alias("end_pos"),
        quality_score(F.col("read_depth"), F.col("total_depth")).alias("quality_score"),
    )


def q_zygosity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 zygosity on the synthetic CF2 projection — full status ladder,
    half-up percent, hemizygous and PAR paths."""
    cf2 = _synth_cf2(_t(spark, sf_dir, "lineitem"))
    cols = zygosity_snv(
        F.coalesce(F.col("ref_nuc"), F.lit("A")),
        F.coalesce(F.col("var_nuc"), F.lit("C")),
        F.col("count_a"),
        F.col("count_c"),
        F.col("count_g"),
        F.col("count_t"),
        F.col("gender"),
        F.col("chromosome"),
        F.col("in_par"),
    )
    return cf2.withColumns(cols).select(
        "position",
        "l_linenumber",
        "zygosity_status",
        "zygosity_percent_read",
        "zygosity_num_allele",
        "zygosity_ref_allele",
        "zygosity_poss_error",
        "zygosity_in_pseudo",
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-surface batch analog: tumbling 1h window per event type.

    The same aggregation runs incrementally in
    rat_strain_loader_pipeline_spark/streaming/events.py."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .orderBy("hour", "event_type")
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4-style gap-based sessionization: new session when >30 min idle."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sessioned = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return (
        sessioned.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (engine operator)."""
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs).select("content_hash", "canonical_id", "dup_count")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality signals, all JVM-side expressions."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.char_count(F.col("text")).alias("n_chars_computed"),
        T.avg_word_len(F.col("text")).alias("avg_word_len"),
        T.punct_ratio(F.col("text")).alias("punct_ratio"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-argmax language id heuristic."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id_heuristic(F.col("text")).alias("lang_pred"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.quality_score(F.col("text")).alias("quality"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.doc_fingerprint(F.col("text")).alias("fingerprint"))


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k vs the vec_id=0 query vector."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return brute_force_topk(emb, qvec, k=10)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (rows-only check: xxhash64 has no
    DuckDB equivalent; validated by dedicated tests instead)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, jaccard_threshold=0.5)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (rows-only check)."""
    docs = _t(spark, sf_dir, "documents")
    return simhash64(docs)


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-Jaccard near-dup pairs with df-ordered prefix filtering
    (rows-only: DuckDB formulation of prefix filtering is impractical;
    exactness is covered by tests against a brute-force oracle)."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8)


def q_embedding_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (rows-only: approximate by design)."""
    emb = _t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    return lsh_bucketed_topk(emb, qvec, k=10, n_planes=4, multiprobe=1)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "filter_project": q_filter_project,
        "broadcast_join_agg": q_broadcast_join_agg,
        "multiway_join": q_multiway_join,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "interval_join": q_interval_join,
        "dedup_upsert": q_dedup_upsert,
        "window_cumsum": q_window_cumsum,
        "first_per_group": q_first_per_group,
        "variant_derivations": q_variant_derivations,
        "zygosity_ladder": q_zygosity_ladder,
        "events_hourly": q_events_hourly,
        "events_sessionize": q_events_sessionize,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "embedding_topk": q_embedding_topk,
        "minhash_lsh": q_minhash_lsh,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "embedding_topk_lsh": q_embedding_topk_lsh,
    }


# --------------------------------------------------------------------------
# Oracle SQL (DuckDB dialect where ANSI is insufficient)
# --------------------------------------------------------------------------

_TOKENS_SQL = "list_filter(string_split_regex(lower(trim(text)), '\\s+'), t -> t <> '')"
_TOKENS_CASED_SQL = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t <> '')"


def _stopword_hits_sql(lang: str) -> str:
    from rat_strain_loader_pipeline_spark.operators.text import STOPWORDS

    words = ", ".join("'" + w + "'" for w in STOPWORDS[lang])
    return f"len(list_filter({_TOKENS_SQL}, t -> t IN ({words})))"


def _lang_id_sql() -> str:
    from rat_strain_loader_pipeline_spark.operators.text import STOPWORDS

    langs = sorted(STOPWORDS)
    hits = ", ".join(f"{_stopword_hits_sql(lang)} AS h_{lang}" for lang in langs)
    # strict-> fold: earlier language wins ties (matches the Spark fold)
    best = "CASE "
    conds = []
    for i, lang in enumerate(langs):
        others_before = [f"h_{l2} >= h_{lang}" for l2 in langs[:i]]
        others_after = [f"h_{l2} > h_{lang}" for l2 in langs[i + 1 :]]
        cond = f"h_{lang} > 0"
        for o in others_before:
            cond += f" AND NOT ({o})"
        for o in others_after:
            cond += f" AND NOT ({o})"
        conds.append(f"WHEN {cond} THEN '{lang}'")
    best += " ".join(conds) + " ELSE 'und' END"
    return f"SELECT doc_id, {best} AS lang_pred FROM (SELECT doc_id, {hits} FROM documents)"


_ZYG_SQL = f"""
WITH cf2 AS ({_SYNTH_CF2_SQL}),
z AS (
  SELECT position, l_linenumber,
         COALESCE(ref_nuc, 'A') AS ref_n, COALESCE(var_nuc, 'C') AS var_n,
         CAST(count_a AS BIGINT) AS a, CAST(count_c AS BIGINT) AS c,
         CAST(count_g AS BIGINT) AS g, CAST(count_t AS BIGINT) AS t,
         gender, chromosome, in_par
  FROM cf2
),
p AS (
  SELECT *, a + c + g + t AS total,
         CASE var_n WHEN 'A' THEN a WHEN 'C' THEN c WHEN 'G' THEN g WHEN 'T' THEN t ELSE 0 END AS var_count,
         CASE ref_n WHEN 'A' THEN a WHEN 'C' THEN c WHEN 'G' THEN g WHEN 'T' THEN t ELSE 0 END AS ref_count,
         chromosome IN ('X','Y') AND gender IN ('M','P') AS male_sex
  FROM z
),
q AS (
  SELECT *,
         CASE WHEN total = 0 THEN NULL
              ELSE CAST(floor(100.0 * var_count / total + 0.5) AS INT) END AS pct,
         CAST(a > 0 AS INT) + CAST(c > 0 AS INT) + CAST(g > 0 AS INT) + CAST(t > 0 AS INT) AS n_allele
  FROM p
)
SELECT position, l_linenumber,
       CASE WHEN male_sex AND NOT in_par THEN
              CASE WHEN pct >= 100 THEN 'hemizygous'
                   WHEN pct >= 85 THEN 'probably hemizygous'
                   ELSE 'possibly hemizygous' END
            ELSE
              CASE WHEN pct >= 100 THEN 'homozygous'
                   WHEN pct >= 85 THEN 'possibly homozygous'
                   ELSE 'heterozygous' END
       END AS zygosity_status,
       pct AS zygosity_percent_read,
       CAST(n_allele AS INT) AS zygosity_num_allele,
       CASE WHEN ref_count > 0 THEN 'Y' ELSE 'N' END AS zygosity_ref_allele,
       CASE WHEN pct IS NOT NULL AND pct <= 15 THEN 'Y' ELSE 'N' END AS zygosity_poss_error,
       CASE WHEN male_sex AND in_par THEN 'Y' ELSE 'N' END AS zygosity_in_pseudo
FROM q
"""


def oracle_sql() -> dict[str, str]:
    return {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber,
                   CAST(year(l_shipdate) AS INT) AS ship_year,
                   CAST(month(l_shipdate) AS INT) AS ship_month,
                   l_returnflag AS returnflag
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
              AND l_quantity > 30
        """,
        "broadcast_join_agg": """
            SELECT p_brand, count(*) AS n_items,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "multiway_join": """
            SELECT n_name,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                        AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
                   count(*) AS n_items
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "anti_join": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "semi_join": """
            SELECT c_nationkey, count(*) AS n_customers
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "interval_join": """
            WITH bands AS (
                SELECT DISTINCT CAST(p_size AS BIGINT) AS band,
                       CAST(p_size AS BIGINT) * 1000 AS band_lo,
                       CAST(p_size AS BIGINT) * 1000 + 999 AS band_hi
                FROM part
            )
            SELECT band, count(*) AS n_items
            FROM lineitem JOIN bands
              ON CAST(floor(l_extendedprice) AS BIGINT) BETWEEN band_lo AND band_hi
            GROUP BY band ORDER BY band
        """,
        "dedup_upsert": """
            WITH existing AS (
                SELECT l_orderkey, l_partkey, l_suppkey,
                       CAST(l_orderkey AS BIGINT) AS rgd_id
                FROM lineitem WHERE l_linenumber = 1
            ),
            max_id AS (SELECT COALESCE(max(rgd_id), 0) AS m FROM existing),
            matched AS (
                SELECT i.l_orderkey, i.l_partkey, i.l_suppkey, i.l_linenumber,
                       e.rgd_id AS existing_id
                FROM lineitem i
                LEFT JOIN existing e
                  ON i.l_orderkey = e.l_orderkey
                 AND i.l_partkey = e.l_partkey
                 AND i.l_suppkey = e.l_suppkey
            ),
            new_keys AS (
                SELECT l_orderkey, l_partkey, l_suppkey,
                       dense_rank() OVER (ORDER BY CAST(l_orderkey AS VARCHAR),
                                                   CAST(l_partkey AS VARCHAR),
                                                   CAST(l_suppkey AS VARCHAR)) AS rnk
                FROM (SELECT DISTINCT l_orderkey, l_partkey, l_suppkey
                      FROM matched WHERE existing_id IS NULL)
            )
            SELECT m.l_orderkey, m.l_partkey, m.l_suppkey, m.l_linenumber,
                   CAST(COALESCE(m.existing_id, (SELECT m2.m FROM max_id m2) + n.rnk) AS BIGINT) AS rgd_id,
                   m.existing_id IS NULL AS is_new
            FROM matched m
            LEFT JOIN new_keys n
              ON m.l_orderkey = n.l_orderkey
             AND m.l_partkey = n.l_partkey
             AND m.l_suppkey = n.l_suppkey
        """,
        "window_cumsum": """
            SELECT l_orderkey, l_linenumber,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
                        OVER (PARTITION BY l_orderkey
                              ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS DOUBLE) AS running_qty
            FROM lineitem
        """,
        "first_per_group": """
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
            FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey
                          ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice) AS rn
                  FROM lineitem)
            WHERE rn = 1
        """,
        "variant_derivations": f"""
            WITH cf2 AS ({_SYNTH_CF2_SQL}),
            typed AS (
                SELECT position, l_linenumber, ref_nuc, var_nuc, read_depth, total_depth,
                       CASE WHEN ref_nuc IS NULL THEN 'ins'
                            WHEN var_nuc IS NULL THEN 'del'
                            WHEN len(ref_nuc) < len(var_nuc) THEN 'ins'
                            WHEN len(ref_nuc) > len(var_nuc) THEN 'del'
                            ELSE 'snv' END AS variant_type
                FROM cf2
            )
            SELECT position, l_linenumber, variant_type,
                   CAST(CASE variant_type
                        WHEN 'ins' THEN position
                        WHEN 'del' THEN position + len(COALESCE(ref_nuc, ''))
                        ELSE position + 1 END AS BIGINT) AS end_pos,
                   CAST(floor((100 * CAST(read_depth AS BIGINT)
                               + floor(CAST(total_depth AS BIGINT) / 2.0))
                              / CAST(total_depth AS BIGINT)) AS INT) AS quality_score
            FROM typed
        """,
        "zygosity_ladder": _ZYG_SQL,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_sessionize": """
            WITH e AS (
                SELECT user_id, ts, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events
            ),
            g AS (
                SELECT user_id,
                       CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                              OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY ts) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM e
            )
            SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id ORDER BY user_id
        """,
        "dedup_exact": """
            SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS content_hash,
                   min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM documents
            GROUP BY 1
        """,
        "text_stats": f"""
            SELECT doc_id,
                   CAST(len({_TOKENS_CASED_SQL}) AS BIGINT) AS n_tokens,
                   CAST(len(text) AS BIGINT) AS n_chars_computed,
                   CASE WHEN len({_TOKENS_CASED_SQL}) > 0
                        THEN round(CAST(list_sum(list_transform({_TOKENS_CASED_SQL}, t -> len(t))) AS DOUBLE)
                                   / len({_TOKENS_CASED_SQL}), 4)
                        ELSE NULL END AS avg_word_len,
                   CASE WHEN len(text) > 0
                        THEN round(CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE)
                                   / len(text), 4)
                        ELSE 0.0 END AS punct_ratio
            FROM documents
        """,
        "lang_id": _lang_id_sql(),
        "quality_score": _quality_score_sql(),
        "fingerprint": """
            SELECT doc_id,
                   md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
            FROM documents
        """,
        "embedding_topk": """
            WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
            scored AS (
                SELECT vec_id,
                       list_sum(list_transform(range(1, len(embedding)+1),
                                i -> embedding[i]::DOUBLE * qv[i]))
                       / (sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x)))
                          * sqrt(list_sum(list_transform(qv, x -> x*x)))) AS raw
                FROM embeddings, q
            )
            SELECT vec_id, round(raw, 4) AS cosine
            FROM scored
            ORDER BY raw DESC, vec_id ASC
            LIMIT 10
        """,
    }


def _quality_score_sql() -> str:
    from rat_strain_loader_pipeline_spark.operators.text import STOPWORDS

    langs = sorted(STOPWORDS)
    sw_ratios = []
    for lang in langs:
        words = ", ".join("'" + w + "'" for w in STOPWORDS[lang])
        sw_ratios.append(
            f"CASE WHEN n_tok > 0 THEN round(CAST(len(list_filter(toks, t -> t IN ({words}))) AS DOUBLE) / n_tok, 4) ELSE 0.0 END"
        )
    max_sw = f"greatest({', '.join(sw_ratios)})"
    return f"""
        WITH base AS (
            SELECT doc_id, text,
                   {_TOKENS_SQL} AS toks,
                   len({_TOKENS_CASED_SQL}) AS n_tok
            FROM documents
        ),
        sig AS (
            SELECT doc_id,
                   least(1.0, CAST(n_tok AS DOUBLE) / 100.0) AS len_sig,
                   1.0 - least(1.0, (CASE WHEN len(text) > 0
                        THEN round(CAST(len(text) - len(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) / len(text), 4)
                        ELSE 0.0 END) * 4.0) AS punct_sig,
                   least(1.0, {max_sw} * 10.0) AS sw_sig
            FROM base
        )
        SELECT doc_id, round(0.4 * len_sig + 0.3 * punct_sig + 0.3 * sw_sig, 4) AS quality
        FROM sig
    """


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: the synthetic-CF2 load-pipeline slice —
    derivations + zygosity + dedup-upsert, returning the loaded
    sample-detail-shaped result (driver checks rows > 0)."""
    sf_dir = "/root/testdata/sf0.001"
    li = _t(spark, sf_dir, "lineitem")
    cf2 = _synth_cf2(li)
    vt = variant_type(F.col("ref_nuc"), F.col("var_nuc"))
    derived = cf2.withColumns(
        {
            "variant_type": vt,
            "end_pos": end_pos(F.col("position"), F.col("ref_nuc"), vt).cast("long"),
            "quality_score": quality_score(F.col("read_depth"), F.col("total_depth")),
        }
    )
    zcols = zygosity_snv(
        F.coalesce(F.col("ref_nuc"), F.lit("A")),
        F.coalesce(F.col("var_nuc"), F.lit("C")),
        F.col("count_a"),
        F.col("count_c"),
        F.col("count_g"),
        F.col("count_t"),
        F.col("gender"),
        F.col("chromosome"),
        F.col("in_par"),
    )
    loaded = derived.withColumns(zcols)
    incoming = loaded.select(
        "chromosome", "position", "end_pos", "ref_nuc", "var_nuc", "variant_type",
        "zygosity_status", "zygosity_percent_read", "quality_score",
    )
    existing = incoming.limit(0).withColumn("rgd_id", F.lit(None).cast("long"))
    return upsert_variants(
        incoming,
        existing,
        key=["chromosome", "position", "end_pos", "ref_nuc", "var_nuc", "variant_type"],
    )
