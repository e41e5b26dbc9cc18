"""as-of join, stratified sampling, BM25 retrieval."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.operators.asof import asof_join
from rat_strain_loader_pipeline_spark.operators.retrieval import bm25_topk
from rat_strain_loader_pipeline_spark.operators.sampling import stratified_sample


def _ts(s):
    import datetime

    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:10:00")),
            (2, 10, _ts("2024-01-01T00:00:30")),  # before any click → NULLs
            (3, 20, _ts("2024-01-01T09:00:00")),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T00:01:00"), 1.5),
            (101, 10, _ts("2024-01-01T00:09:00"), 2.5),
            (102, 10, _ts("2024-01-01T00:11:00"), 9.9),  # after left #1 → ignored
            (103, 20, _ts("2024-01-01T08:00:00"), 3.5),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts",
            payload={"event_id": "m_id", "value": "m_value"}, tiebreak="event_id",
        ).collect()
    }
    assert out[1]["m_id"] == 101 and out[1]["m_value"] == 2.5
    assert out[2]["m_id"] is None and out[2]["m_value"] is None
    assert out[3]["m_id"] == 103


def test_asof_join_tie_and_null_payload_consistency(spark):
    """Equal timestamps: right sorts before left (at-or-before) and the
    max-tiebreak right wins; a NULL payload field on the matched row
    must NOT be backfilled from an older right row (struct carry)."""
    t = _ts("2024-01-01T12:00:00")
    left = spark.createDataFrame([(1, 5, t)], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [
            (200, 5, _ts("2024-01-01T11:00:00"), 7.0),  # older, non-null value
            (201, 5, t, None),                           # matched: same ts, max id... no —
            (202, 5, t, None),                           # 202 > 201 wins, value NULL
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    row = asof_join(
        left, right, on=["user_id"], ts_col="ts",
        payload={"event_id": "m_id", "value": "m_value"}, tiebreak="event_id",
    ).collect()[0]
    assert row["m_id"] == 202
    assert row["m_value"] is None  # NOT 7.0 from event 200


def test_asof_join_rejects_name_clash(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, _ts("2024-01-01T00:00:00"))],
                               "event_id long, user_id long, ts timestamp")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, on=["user_id"], ts_col="ts",
                  payload={"event_id": "event_id"}, tiebreak="event_id")


def test_stratified_sample_exact_counts_and_nesting(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", f"text {i}") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    s3 = stratified_sample(docs, ["lang"], 3, salt="s")
    s7 = stratified_sample(docs, ["lang"], 7, salt="s")
    by_lang = {r["lang"]: r["n"] for r in s3.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang == {"en": 3, "de": 3}
    ids3 = {r["doc_id"] for r in s3.collect()}
    ids7 = {r["doc_id"] for r in s7.collect()}
    assert ids3 < ids7  # nested: smaller sample is a strict subset
    # deterministic across recomputation
    assert ids3 == {r["doc_id"] for r in stratified_sample(docs, ["lang"], 3, salt="s").collect()}
    # different salt reshuffles
    assert ids3 != {r["doc_id"] for r in stratified_sample(docs, ["lang"], 3, salt="t").collect()}


def test_bm25_topk_matches_reference_formula(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark window spark join"),
            (2, "spark"),
            (3, "window table scan scan scan scan scan scan"),
            (4, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bm25_topk(docs, ["spark", "window"], k=4).collect()}
    assert 4 not in out  # no hit terms
    assert out[1]["n_hit_terms"] == 2 and out[2]["n_hit_terms"] == 1

    # python reference (same float ops, floor-to-micros per term)
    corpus = {1: "spark window spark join", 2: "spark", 3: "window table scan scan scan scan scan scan", 4: "nothing relevant here"}
    toks = {d: t.split() for d, t in corpus.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    k1, b = 1.2, 0.75

    def score(d, terms):
        s = 0
        for term in terms:
            tf = toks[d].count(term)
            if tf == 0:
                continue
            df = sum(1 for t in toks.values() if term in t)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += math.floor(idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl)) * 1e6)
        return s

    for d in (1, 2, 3):
        assert out[d]["score_micros"] == score(d, ["spark", "window"])
    # ranking: doc 1 (two hits incl. tf=2 spark) above doc 2 above doc 3
    ordered = sorted(out.values(), key=lambda r: -r["score_micros"])
    assert [r["doc_id"] for r in ordered] == [1, 2, 3]


def test_rrf_fuse_hybrid(spark):
    """RRF: doc in both rankings beats single-list docs; contributions
    are exact integer micro-units; ties break by ascending id."""
    from rat_strain_loader_pipeline_spark.operators.retrieval import ranked, rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    vec = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in rrf_fuse([lex, vec], k=4, c=60).collect()}
    # floor(1e6/61)=16393, /62=16129, /63=15873
    assert out[3]["rrf_micros"] == 15873 + 16393 and out[3]["n_rankings_hit"] == 2
    assert out[1]["rrf_micros"] == 16393 and out[1]["n_rankings_hit"] == 1
    top = sorted(out.values(), key=lambda r: (-r["rrf_micros"], r["doc_id"]))
    assert [r["doc_id"] for r in top][0] == 3

    scored = spark.createDataFrame(
        [(10, 5.0), (11, 9.0), (12, 9.0), (13, 1.0)], "doc_id long, s double"
    )
    from pyspark.sql import functions as FF
    r = ranked(scored, [FF.col("s").desc(), FF.col("doc_id").asc()], n=3)
    assert [(x["doc_id"], x["rank"]) for x in sorted(r.collect(), key=lambda x: x["rank"])] == [
        (11, 1), (12, 2), (10, 3)
    ]


def test_asof_join_forward_direction(spark):
    """Forward mode: nearest at-or-after right; equal-ts ties resolve to
    the LOWEST tiebreak (mirror of backward); no following row → NULL."""
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:10:00")),
            (2, 10, _ts("2024-01-01T23:00:00")),  # after all errors → NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    t = _ts("2024-01-01T00:10:00")
    right = spark.createDataFrame(
        [
            (300, 10, t, 1.0),                            # same ts, min id → match
            (301, 10, t, 2.0),
            (302, 10, _ts("2024-01-01T00:30:00"), 3.0),   # later → not nearest
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    from rat_strain_loader_pipeline_spark.operators.asof import asof_join

    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts",
            payload={"event_id": "m_id", "value": "m_value"},
            tiebreak="event_id", direction="forward",
        ).collect()
    }
    assert out[1]["m_id"] == 300 and out[1]["m_value"] == 1.0
    assert out[2]["m_id"] is None

    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["user_id"], ts_col="ts",
                  payload={"event_id": "m_id"}, tiebreak="event_id", direction="nearest")


def test_tfidf_top_terms(spark):
    """Ubiquitous terms get idf 0 and never outrank; scores match the
    floor(tf * ln(N/df) * 1e6) reference; ties break by term."""
    from rat_strain_loader_pipeline_spark.operators.retrieval import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "common rare rare"),
            (2, "common shared"),
            (3, "common shared unique"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(docs, n_terms=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["term_rank"], r["term"], r["tfidf_micros"]))
    top1 = {d: sorted(v)[0][1] for d, v in by_doc.items()}
    # doc 3: shared (df=2) vs unique (df=1), both tf=1 → unique's higher idf wins
    assert top1 == {1: "rare", 2: "shared", 3: "unique"}
    # exact value check: doc1 'rare' = floor(2 * ln(3/1) * 1e6)
    rare = [r for r in out if r["doc_id"] == 1 and r["term"] == "rare"][0]
    assert rare["tfidf_micros"] == math.floor(2 * math.log(3.0 / 1.0) * 1e6)
    # 'common' is in every doc → idf 0 → never in any top-2 above a rarer term
    common_rank1 = [r for r in out if r["term"] == "common" and r["term_rank"] == 1]
    assert not common_rank1


def test_weighted_sample_properties(spark):
    """A-ES: deterministic, weight-zero rows excluded, selection is
    weight-proportional in aggregate (heavier stratum overrepresented),
    and plan stays TakeOrderedAndProject (no global sort)."""
    from rat_strain_loader_pipeline_spark.operators.sampling import weighted_sample

    rows = [(i, 100 if i < 50 else 1) for i in range(500)] + [(999, 0)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = weighted_sample(df, "w", n=40, id_col="doc_id", salt="s")
    got = out.collect()
    assert len(got) == 40
    assert all(r["doc_id"] != 999 for r in got)  # zero weight excluded
    heavy = sum(1 for r in got if r["doc_id"] < 50)
    # 50 docs carry weight 5000 vs 450 docs carrying 450: heavy side must dominate
    assert heavy > 20
    # deterministic across recomputation
    again = weighted_sample(df, "w", n=40, id_col="doc_id", salt="s").collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_asof_join_null_ts_and_keys(spark):
    """SQL lateral NULL semantics: NULL-ts right rows never match (in
    either direction), NULL-key rows never equi-match, and a NULL-ts
    left row gets NULL payload — not the whole-group carry that naive
    NULLS FIRST/LAST window ordering would produce."""
    t = _ts("2024-01-01T10:00:00")
    left = spark.createDataFrame(
        [(1, 5, t), (2, 5, None), (3, None, t)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 5, None, 9.0),    # NULL ts: must never match
            (101, None, t, 8.0),    # NULL key: must never match
            (102, 5, t, 7.0),       # the only legitimate match (for left #1)
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    for direction in ("backward", "forward"):
        out = {
            r["event_id"]: r
            for r in asof_join(
                left, right, on=["user_id"], ts_col="ts",
                payload={"event_id": "m_id", "value": "m_value"},
                tiebreak="event_id", direction=direction,
            ).collect()
        }
        assert out[1]["m_id"] == 102 and out[1]["m_value"] == 7.0
        assert out[2]["m_id"] is None, direction  # NULL-ts left row
        assert out[3]["m_id"] is None, direction  # NULL-key left row


def test_tfidf_cosine_pairs_against_python_model(spark):
    """Exact check vs a Python model of the same formula (fractional df
    cutoff, micro-unit sums, floor(cosine * 1e6)), plus the identity
    property: duplicate docs score ~1.0 (sqrt(x)*sqrt(x) wobbles the
    last ulp, so >= 999990, never > 1e6)."""
    import math
    from collections import Counter

    from rat_strain_loader_pipeline_spark.operators.retrieval import (
        tfidf_cosine_pairs,
    )

    rows = [
        (0, "apple banana cherry apple"),
        (1, "apple banana cherry apple"),       # exact dup of 0
        (2, "apple banana durian elderberry"),  # partial overlap
        (3, "fig grape honeydew kiwi"),         # disjoint
        (4, "apple apple apple banana"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    frac, thr = 0.9, 0.05  # df cutoff ceil(0.9*5)=5: keep all terms here
    got = {
        (r["id_a"], r["id_b"]): r["cosine_micros"]
        for r in tfidf_cosine_pairs(docs, threshold=thr, max_df_frac=frac).collect()
    }

    n = len(rows)
    tf = {i: Counter(t.split()) for i, t in rows}
    df = Counter(term for c in tf.values() for term in c)
    keep = {t for t, d in df.items() if d <= math.ceil(n * frac)}
    w = {
        i: {t: c * math.log(n / df[t]) for t, c in cnt.items() if t in keep}
        for i, cnt in tf.items()
    }
    norms = {i: sum(int(x * x * 1e6) for x in ws.values()) for i, ws in w.items()}
    expect = {}
    for a in range(n):
        for b in range(a + 1, n):
            num = sum(
                int(w[a][t] * w[b][t] * 1e6) for t in w[a] if t in w[b]
            )
            if num == 0 or norms[a] == 0 or norms[b] == 0:
                continue
            cm = int(num / (math.sqrt(norms[a]) * math.sqrt(norms[b])) * 1e6)
            if cm >= int(thr * 1e6):
                expect[(a, b)] = cm
    assert got == expect
    assert got[(0, 1)] >= 999990 and got[(0, 1)] <= 1_000_000
    assert all(3 not in pair for pair in got)


def test_mixture_weights_model_and_invariants(spark):
    """alpha=0.5 weights match the sqrt model; weights sum to ~1e6;
    alpha upweights small sources vs proportional."""
    import math

    from rat_strain_loader_pipeline_spark.operators.sampling import mixture_weights

    rows = [(i, "big" if i < 90 else ("mid" if i < 99 else "tiny")) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    got = {
        r["source"]: (r["n_docs"], r["weight_micros"], r["expected_docs"])
        for r in mixture_weights(docs, "source", alpha=0.5, budget=1000).collect()
    }
    counts = {"big": 90, "mid": 9, "tiny": 1}
    a = {s: int(math.sqrt(c) * 1e6) for s, c in counts.items()}
    tot = sum(a.values())
    for s, c in counts.items():
        p = a[s] / tot
        assert got[s] == (c, int(p * 1e6), int(p * 1000))
    assert abs(sum(v[1] for v in got.values()) - 1_000_000) <= 3  # floor slack
    # temperature property: sqrt scaling gives 'tiny' more than its share
    assert got["tiny"][1] > 1_000_000 * counts["tiny"] / 100


def test_bigram_logprob_model_and_edges(spark):
    """Exact check vs a Python model of the add-one bigram LM
    (including empty and 1-token docs scoring (0,0)), plus the quality
    signal itself: repetitive text outscores a one-off shuffle."""
    import math
    from collections import Counter

    import rat_strain_loader_pipeline_spark.operators.text as T

    rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat sat on the hat"),
        (2, "mat the on sat cat the"),   # same words, scrambled
        (3, "single"),
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["logprob_sum_micros"])
        for r in T.bigram_logprob(docs).collect()
    }

    doc_toks = {i: t.split() for i, t in rows}
    doc_bg = {
        i: Counter(zip(tk, tk[1:])) for i, tk in doc_toks.items() if len(tk) >= 2
    }
    c12 = Counter()
    c1 = Counter()
    vocab = set()
    for cnt in doc_bg.values():
        for (w1, w2), n in cnt.items():
            c12[(w1, w2)] += n
            c1[w1] += n
            vocab.update((w1, w2))
    v = len(vocab)
    expect = {}
    for i, _t in rows:
        cnt = doc_bg.get(i)
        if not cnt:
            expect[i] = (0, 0)
            continue
        s = sum(
            n * math.floor(math.log((c12[bg] + 1) / (c1[bg[0]] + v)) * 1e6)
            for bg, n in cnt.items()
        )
        expect[i] = (sum(cnt.values()), s)
    assert got == expect
    # per-bigram average: docs 0/1 share common bigrams, the scramble
    # uses one-off transitions -> lower average log-prob
    avg = {i: got[i][1] / got[i][0] for i in (0, 1, 2)}
    assert avg[2] < avg[0] and avg[2] < avg[1]


def test_token_kl_drift_properties(spark):
    """KL of identical distributions is ~0 (only floor slack below);
    drifted distributions score strictly positive and larger."""
    from rat_strain_loader_pipeline_spark.operators.sampling import token_kl_drift

    same = spark.createDataFrame(
        [(i, "alpha beta gamma delta") for i in range(200)],
        "doc_id long, text string",
    )
    r = token_kl_drift(same).collect()[0]
    assert r["n_tokens_a"] > 0 and r["n_tokens_b"] > 0
    # identical per-word distributions: every term is ~0 but floor()
    # pulls each slightly negative -> small negative bound, never large
    assert -r["vocab_size"] <= r["kl_picos"] <= 0

    drift = spark.createDataFrame(
        [
            (i, "alpha beta gamma delta" if i % 10 != 3 else "omega psi chi phi")
            for i in range(200)
        ],
        "doc_id long, text string",
    )
    r2 = token_kl_drift(drift).collect()[0]
    assert r2["kl_picos"] > r["kl_picos"]


def test_token_kl_drift_empty_corpus_zero_rows(spark):
    """No tokens in either split -> ZERO rows (matching the oracle's
    GROUP BY shape), never a single all-null row."""
    from rat_strain_loader_pipeline_spark.operators.sampling import token_kl_drift

    empty = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string"
    )
    assert token_kl_drift(empty).collect() == []


def test_deterministic_shuffle_equals_naive_global_rank(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.sampling import (
        _md5_fold,
        deterministic_shuffle,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    two_level = deterministic_shuffle(docs, salt="v1")
    sid = F.col("doc_id").cast("string")
    naive = docs.withColumn(
        "shuffle_rank",
        F.row_number()
        .over(
            Window.orderBy(
                _md5_fold(F.concat(F.lit("shuffle:v1:"), sid), 256),
                _md5_fold(F.concat(F.lit("order:v1:"), sid), 1_000_000_007),
                "doc_id",
            )
        )
        .cast("long"),
    )
    a = sorted(tuple(r) for r in two_level.collect())
    b = sorted(tuple(r) for r in naive.collect())
    assert a == b
    # ranks are a permutation 1..n
    n = docs.count()
    assert sorted(r["shuffle_rank"] for r in two_level.collect()) == list(
        range(1, n + 1)
    )


def test_deterministic_shuffle_partition_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.sampling import (
        deterministic_shuffle,
    )
    from rat_strain_loader_pipeline_spark.sources.tables import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    a = sorted(
        tuple(r) for r in deterministic_shuffle(docs.coalesce(1)).collect()
    )
    b = sorted(
        tuple(r)
        for r in deterministic_shuffle(
            docs.repartition(13, F.col("doc_id") % 7)
        ).collect()
    )
    assert a == b
