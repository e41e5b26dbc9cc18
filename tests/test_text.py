

def test_zipf_hill_known_counts(spark):
    import math

    from rat_strain_loader_pipeline_spark.operators.text import zipf_hill

    # Build docs whose token counts are exactly: a=8, b=4, c=2, d=1.
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    df = spark.createDataFrame([(1, text, "en")], "doc_id long, text string, lang string")
    out = zipf_hill(df, group_col="lang", top_k=3).collect()
    assert len(out) == 1
    r = out[0]
    # ranked a,b,c kept; d (count 1) is the threshold
    assert r["k_used"] == 3 and r["c_tail"] == 1
    want = sum(math.floor(math.log(c / 1.0) * 1e6) for c in (8, 4, 2))
    assert r["ln_sum_q"] == want
    assert r["alpha_q"] == 1_000_000 + (3 * 10**12) // want


def test_zipf_hill_uniform_counts_null_alpha(spark):
    from rat_strain_loader_pipeline_spark.operators.text import zipf_hill

    # two tokens, equal counts -> ln ratio 0 -> NULL alpha
    df = spark.createDataFrame(
        [(1, "x y", "en"), (2, "x y", "en")], "doc_id long, text string, lang string"
    )
    out = zipf_hill(df, group_col="lang", top_k=5).collect()
    assert out[0]["ln_sum_q"] == 0 and out[0]["alpha_q"] is None


def test_llr_collocations_strong_pair_ranks_first(spark):
    from rat_strain_loader_pipeline_spark.operators.text import (
        llr_collocations,
    )

    # "new york" always together; "the" everywhere dilutes other pairs
    docs = [(i, "new york is the big apple of the world") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = llr_collocations(df, min_count=2, topn=10).collect()
    assert out, "no collocations emitted"
    scores = {(r["a"], r["b"]): r["llr_q"] for r in out}
    # the fully-dependent pair outranks pairs sharing the ambiguous
    # "the" (which starts two different bigrams -> weaker evidence)
    assert scores[("new", "york")] > scores[("the", "big")]
    assert scores[("new", "york")] > 0
    # monotone: list is sorted descending by llr_q
    ordered = [r["llr_q"] for r in out]
    assert ordered == sorted(ordered, reverse=True)


def test_llr_collocations_independent_pair_scores_low(spark):
    import math

    from rat_strain_loader_pipeline_spark.operators.text import (
        llr_collocations,
    )

    # perfectly dependent pair in a two-token corpus: G2 = 2*NB*ln(2)
    # for the 2x2 where a b / b a alternate? keep it simpler: single
    # repeated bigram "x y" -> k11=NB, all other cells 0 -> G2 = 0
    # (ln(1)): the statistic is exactly zero for a saturated table.
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y")], "doc_id long, text string"
    )
    out = llr_collocations(df, min_count=1, topn=5).collect()
    assert len(out) == 1 and out[0]["llr_q"] == 0


def test_unicode_nfc_audit_counts_decomposed(spark):
    from rat_strain_loader_pipeline_spark.operators.text import (
        unicode_nfc_audit,
    )

    rows = [
        (1, "plain ascii", "en"),
        (2, "café combining", "fr"),   # decomposed: 1 cp removed
        (3, "café precomposed", "fr"),  # already NFC
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r["lang"]: (r["n_docs"], r["n_nonnfc"], r["sum_cp_delta"])
        for r in unicode_nfc_audit(df).collect()
    }
    assert got["en"] == (1, 0, 0)
    assert got["fr"] == (2, 1, 1)


def test_unigram_train_hand_computed(spark):
    """Single-doc corpus 'aa aa b' — every model value hand-computed:
    hist {aa:2, b:1}; seed {a:4, aa:2, b:1} (v=3, total=7);
    lp0 = floor(ln((c+1)/10)·1e6) → a -693148, aa -1203973, b -1609438;
    Viterbi('aa') picks the single piece 'aa' (-1203973 beats
    a+a = -1386296), so usage {aa:2, b:1} in both EM rounds; prune to
    1 multi-char piece keeps [aa] + chars [a, b]; serving
    lp = floor(ln((u+1)/(3+3))·1e6) → aa -693148, a -1791760,
    b -1098613."""
    from rat_strain_loader_pipeline_spark.operators.text import (
        unigram_apply,
        unigram_train,
    )

    docs = spark.createDataFrame([(1, "aa aa b")], "doc_id long, text string")
    model = {
        r["piece"]: (r["is_char"], r["usage"], r["lp_q"])
        for r in unigram_train(docs, vocab_multi=1, rounds=2, max_len=4).collect()
    }
    assert model == {
        "aa": (False, 2, -693148),
        "a": (True, 0, -1791760),
        "b": (True, 1, -1098613),
    }
    out = unigram_apply(docs, vocab_multi=1, rounds=2, max_len=4).collect()
    assert [(r["doc_id"], r["n_words"], r["n_unigram_tokens"]) for r in out] == [
        (1, 3, 3)
    ]


def test_unigram_train_min_count_floor(spark):
    """min_count floors the word histogram BEFORE the one-batch fit:
    corpus 'aa aa b' with min_count=2 drops the singleton word 'b'
    entirely — the model is fit on {aa:2} alone (seed {a:2, aa:2}) and
    still covers every char of the kept words; min_count=1 (default)
    reproduces the historical model exactly."""
    from rat_strain_loader_pipeline_spark.operators.text import unigram_train

    docs = spark.createDataFrame([(1, "aa aa b")], "doc_id long, text string")
    floored = {
        r["piece"]: r["is_char"]
        for r in unigram_train(
            docs, vocab_multi=1, rounds=2, max_len=4, min_count=2
        ).collect()
    }
    # 'b' gone from the histogram -> gone from seed and chars; the
    # kept words' chars are all covered
    assert set(floored) == {"aa", "a"}
    assert floored["a"] is True
    default = {
        r["piece"]
        for r in unigram_train(docs, vocab_multi=1, rounds=2, max_len=4).collect()
    }
    assert default == {"aa", "a", "b"}


def test_unigram_apply_unknown_word_char_fallback(spark):
    """A REUSED model= whose vocabulary shares no substring with a
    word (the staleness-monitor path) must still count that word: it
    falls back to one piece per character instead of silently
    vanishing from n_words/n_unigram_tokens."""
    from rat_strain_loader_pipeline_spark.operators.text import (
        unigram_apply,
        unigram_train,
    )

    train = spark.createDataFrame([(1, "aa aa b")], "doc_id long, text string")
    model = unigram_train(
        train, vocab_multi=1, rounds=2, max_len=4, return_model=True
    )
    # 'xyz' shares zero substrings with {aa, a, b}; 'aa' segments to 1
    batch = spark.createDataFrame([(7, "aa xyz")], "doc_id long, text string")
    out = unigram_apply(batch, max_len=4, model=model).collect()
    assert [(r["doc_id"], r["n_words"], r["n_unigram_tokens"]) for r in out] == [
        (7, 2, 1 + 3)
    ]


def test_unigram_max_len_1_char_segmentation(spark):
    """max_len=1 degrades to pure char segmentation instead of raising
    at plan-build time (F.greatest needs two args)."""
    from rat_strain_loader_pipeline_spark.operators.text import unigram_apply

    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    out = unigram_apply(docs, vocab_multi=1, rounds=1, max_len=1).collect()
    assert [(r["doc_id"], r["n_words"], r["n_unigram_tokens"]) for r in out] == [
        (1, 2, 4)
    ]
