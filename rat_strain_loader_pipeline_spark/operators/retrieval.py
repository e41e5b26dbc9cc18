"""Lexical retrieval: distributed BM25 scoring and top-k search.

The text-side twin of the embedding ANN operators in ``similarity.py``:
score every document against a bag-of-terms query with BM25 and return
the top-k — the standard lexical leg of retrieval/dedup/decontamination
stacks (and of hybrid BM25+vector rankers).

Spark-first shape, no collects:
- tokenize → explode → per-(doc, term) term frequencies: one shuffle;
- document frequencies for the handful of query terms only (filter
  BEFORE the df aggregation, so the shuffled stats are O(query terms),
  not O(vocabulary));
- corpus stats (N, avgdl) are 1-row aggregates cross-joined in — they
  broadcast, no driver round-trip;
- final ranking is ``orderBy(...).limit(k)`` → TakeOrderedAndProject
  (per-partition heaps + driver merge of k rows, never a full sort).

Engine-portable exactness: per-term BM25 contributions are floored to
integer micro-units BEFORE summing (``floor(contrib * 1e6)``), so the
cross-term sum is order-independent integer arithmetic and the result
hash-matches a SQL oracle — summing raw doubles would make the score
depend on aggregation order. The only transcendental is one ``ln`` per
(term, corpus) pair, evaluated identically from exact integer inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.text import tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 scores for every document with >=1 query-term hit:
    (id_col, score_micros, n_hit_terms). See module docstring for the
    distributed shape and the integer-micros exactness rule."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")

    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_len")
    )

    qterms = [t.lower() for t in query_terms]
    tf = (
        toks.filter(F.col("term").isin(qterms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    n, total = F.col("n_docs"), F.col("total_len")
    avgdl = total.cast("double") / n.cast("double")
    idf = F.log((n.cast("double") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tf_d = F.col("tf").cast("double")
    denom = tf_d + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl)
    contrib = idf * tf_d * (k1 + 1.0) / denom

    return (
        tf.join(F.broadcast(df_t), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.sum(F.floor(contrib * 1e6).cast("long")).alias("score_micros"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents by BM25 score, ties broken by ascending id —
    TakeOrderedAndProject over ``bm25_scores``."""
    scored = bm25_scores(docs, query_terms, k1, b, text_col, id_col)
    return scored.orderBy(F.col("score_micros").desc(), F.col(id_col).asc()).limit(k)


def ranked(
    scored: DataFrame,
    order_cols: list,
    n: int,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Top-n rows with a 1-based dense position for rank fusion.

    The candidate set is bounded FIRST (``orderBy().limit(n)`` →
    TakeOrderedAndProject, per-partition heaps), so the row_number
    window's single-partition sort touches n rows (n ~ 10-1000), never
    the corpus.
    """
    from pyspark.sql.window import Window

    top = scored.orderBy(*order_cols).limit(n)
    w = Window.orderBy(*order_cols)
    return top.withColumn(rank_col, F.row_number().over(w)).select(id_col, rank_col)


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of bounded rankings (hybrid retrieval:
    lexical BM25 list + vector cosine list, or any N rankers).

    Each ranking contributes ``floor(1e6 / (c + rank))`` — the RRF term
    in integer micro-units, so the fused score is order-independent
    integer arithmetic (same exactness rule as BM25 scores) and
    engine-reproducible. Returns (id_col, rrf_micros, n_rankings_hit),
    top-k by fused score with ascending-id ties.
    """
    contrib = F.floor(F.lit(1_000_000.0) / (F.lit(c) + F.col(rank_col))).cast("long")
    tagged = [r.select(F.col(id_col), contrib.alias("contrib")) for r in rankings]
    allc = tagged[0]
    for t in tagged[1:]:
        allc = allc.unionByName(t)
    return (
        allc.groupBy(id_col)
        .agg(
            F.sum("contrib").alias("rrf_micros"),
            F.count(F.lit(1)).alias("n_rankings_hit"),
        )
        .orderBy(F.col("rrf_micros").desc(), F.col(id_col).asc())
        .limit(k)
    )


def tfidf_top_terms(
    docs: DataFrame,
    n_terms: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-n terms by tf-idf — document keyword extraction.

    Distributed shape: tokenize → one (doc, term) shuffle with map-side
    partial counts; document frequencies aggregate the ALREADY-reduced
    (doc, term) pairs (never raw tokens); corpus size joins in as a
    broadcast 1-row aggregate; the per-doc top-n is one hash-partitioned
    window (same envelope as topk_per_group). Scores are integer
    micro-units — floor(tf * ln(N/df) * 1e6) — so ordering and values
    are engine-reproducible (terms in every doc get idf 0 and never
    outrank, matching the classic tf-idf downweighting).

    Returns (id_col, term, tfidf_micros, term_rank), ties broken by
    ascending term.
    """
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    score = F.floor(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
        * F.lit(1e6)
    ).cast("long")
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_micros").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(id_col, "term", score.alias("tfidf_micros"))
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= n_terms)
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    max_df_frac: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """All-pairs sparse tf-idf cosine similarity via an inverted index —
    the LEXICAL near-dup/relatedness join (the sparse-vector twin of the
    dense embedding block GEMM in ``similarity.py``).

    Pipeline: per-(doc, term) tf → document frequencies → tf-idf
    weights ``tf * ln(N/df)`` over terms with
    ``df <= ceil(N * max_df_frac)`` ONLY — stop-term pruning is both
    the relevance move (a term in 10% of the corpus carries ~no idf
    signal) and the scale guard: every posting list is bounded by the
    cutoff, so the term-keyed self-join emits at most ``df^2`` candidate
    rows per term, never vocabulary × corpus². The cutoff scales with
    the corpus (a fraction, not an absolute), so the operator keeps the
    same selectivity behavior at 100 TB. Norms are computed over the SAME pruned term
    set, so the score is the true cosine of the pruned vectors.

    Engine-portable exactness: per-term products and per-doc squared
    norms floor to integer micro-units before their sums (order-free
    bigint aggregation), and the final ``num / (sqrt(na) * sqrt(nb))``
    is one identical IEEE sequence from exact bigint operands — emitted
    as floored cosine micro-units.

    Returns (id_a, id_b, cosine_micros), id_a < id_b,
    cosine >= threshold.
    """
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    # stage the (doc, term) tf table: it feeds the df aggregate AND the
    # weight build — without staging, every downstream consumer of the
    # weight table re-tokenizes the corpus (the unstaged plan scanned
    # the fact table 24 times)
    tf = stage_to_parquet(
        toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")),
        "tfidf-tf",
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df_t = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("df") <= F.ceil(F.col("n_docs") * F.lit(max_df_frac)))
    )
    # stage the pruned weight table too: three consumers (norms, both
    # sides of the term self-join) read it
    w = stage_to_parquet(
        tf.join(df_t, "term").select(
            F.col(id_col),
            "term",
            (
                F.col("tf").cast("double")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
            ).alias("w"),
        ),
        "tfidf-w",
    )
    norms = w.groupBy(id_col).agg(
        F.sum(F.floor(F.col("w") * F.col("w") * F.lit(1e6)).cast("long")).alias(
            "norm2_micros"
        )
    )
    a, b = w.alias("a"), w.alias("b")
    num = (
        a.join(
            b,
            on=[
                F.col("a.term") == F.col("b.term"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(
            F.sum(
                F.floor(F.col("a.w") * F.col("b.w") * F.lit(1e6)).cast("long")
            ).alias("num_micros")
        )
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("norm2_micros").alias("na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("norm2_micros").alias("nb"))
    cosine = F.col("num_micros").cast("double") / (
        F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double"))
    )
    return (
        num.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.floor(cosine * F.lit(1000000.0)).cast("bigint").alias("cosine_micros"),
        )
        .filter(F.col("cosine_micros") >= int(threshold * 1_000_000))
    )


def copurchase_rec_eval(
    baskets: DataFrame,
    k: int = 5,
    min_support: int = 2,
    basket_col: str = "basket_id",
    cust_col: str = "cust_id",
    item_col: str = "item",
    train_col: str = "is_train",
) -> DataFrame:
    """Item-item co-occurrence recommender with held-out evaluation —
    the end-to-end eval loop behind every "customers also bought"
    system, run exactly: train baskets build the co-occurrence matrix
    (distinct (basket, item) self-join within basket, support floor
    prunes the long tail BEFORE anything fans out), each customer's
    owned items vote for co-items (sum of co-occurrence counts),
    already-owned items are anti-joined away, and the top-``k`` by
    (score DESC, item ASC) are scored against the customer's held-out
    test items. Emits ONE summary row: users evaluated (>=1 train AND
    >=1 test item), hit users, hit-rate micros, recommendations
    issued, hits, precision@k micros — all pure bigint.

    100 TB shape: the basket self-join is bounded by basket-size² (a
    retail basket is tens of items, never corpus-scale) and the
    support floor caps the matrix the candidate join fans out
    through; per-customer ranking is a bounded window over
    items-owned x co-items. Nothing collects; the final row is a
    broadcast-joined set of scalar aggregates.
    """
    from pyspark.sql.window import Window

    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    train = baskets.filter(F.col(train_col))
    test_items = stage_to_parquet(
        baskets.filter(~F.col(train_col))
        .select(F.col(cust_col).alias("cust"), F.col(item_col).alias("item"))
        .distinct(),
        "rec-test-items",
    )
    bi = train.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    pairs = (
        bi.join(bi.select(F.col("b"), F.col("i").alias("j")), "b")
        .filter(F.col("i") != F.col("j"))
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_support)
    )
    owned = stage_to_parquet(
        train.select(
            F.col(cust_col).alias("cust"), F.col(item_col).alias("item")
        ).distinct(),
        "rec-owned",
    )
    cand = (
        owned.join(pairs, owned["item"] == pairs["i"])
        .groupBy("cust", "j")
        .agg(F.sum("cnt").cast("long").alias("score"))
        .join(
            owned.select("cust", F.col("item").alias("j")),
            ["cust", "j"],
            "left_anti",
        )
    )
    w = Window.partitionBy("cust").orderBy(F.desc("score"), F.asc("j"))
    recs = cand.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    # Stage the MULTI-consumer table once (the repo's lineage-truncation
    # pattern): eval_users feeds both the recs filter and the n_users
    # aggregate. recs_eval itself has exactly ONE consumer (the flagged
    # aggregate), so it is not staged — a barrier there bought nothing
    # and cost a parquet write+read per call (measured r13: never
    # faster, up to 4.5 s slower first-run, identical summary row).
    eval_users = stage_to_parquet(
        owned.select("cust")
        .distinct()
        .join(test_items.select("cust").distinct(), "cust", "left_semi"),
        "rec-eval-users",
    )
    recs_eval = recs.join(eval_users, "cust", "left_semi").select("cust", "j")
    # one flagged pass folds n_recs / n_hits / n_hit_users into a
    # SINGLE aggregate (test_items is (cust, item)-distinct, so the
    # left join cannot fan out)
    flagged = recs_eval.join(
        test_items.select(
            "cust", F.col("item").alias("j"), F.lit(1).alias("hit")
        ),
        ["cust", "j"],
        "left",
    )
    summ = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("n_recs"),
        F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_hits"),
        F.countDistinct(F.when(F.col("hit") == 1, F.col("cust")))
        .cast("long")
        .alias("n_hit_users"),
    )
    nu = eval_users.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    return (
        nu.crossJoin(F.broadcast(summ))
        .select(
            "n_users",
            "n_hit_users",
            F.when(
                F.col("n_users") > 0,
                F.expr("n_hit_users * 1000000L div n_users"),
            )
            .cast("long")
            .alias("hitrate_q"),
            "n_recs",
            "n_hits",
            F.when(
                F.col("n_recs") > 0, F.expr("n_hits * 1000000L div n_recs")
            )
            .cast("long")
            .alias("precision_q"),
        )
    )
