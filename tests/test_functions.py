"""Unit tests for scalar domain functions (SURVEY.md §2.7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.functions.dna import (
    CODON_TABLE,
    reverse_complement,
    reverse_complement_str,
    translate_codons,
    translate_dna_str,
)
from rat_strain_loader_pipeline_spark.functions.variant import (
    adjust_for_indels,
    end_pos,
    quality_score,
    total_depth_derived,
    variant_type,
)


def test_variant_type(spark):
    df = spark.createDataFrame(
        [
            (None, "T", "ins"),
            ("", "T", "ins"),
            ("-", "T", "ins"),
            ("A", None, "del"),
            ("A", "-", "del"),
            ("A", "T", "snv"),
            ("AC", "GT", "snv"),
            ("A", "AT", "ins"),   # fixup length-diff path
            ("AT", "A", "del"),
        ],
        "ref string, var string, expected string",
    )
    out = df.withColumn("vt", variant_type(F.col("ref"), F.col("var"))).collect()
    for r in out:
        assert r["vt"] == r["expected"], (r["ref"], r["var"], r["vt"])


def test_end_pos(spark):
    df = spark.createDataFrame(
        [
            (100, "A", "snv", 101),
            (100, None, "ins", 100),
            (100, "ACG", "del", 103),
        ],
        "start long, ref string, vt string, expected long",
    )
    out = df.withColumn("e", end_pos(F.col("start"), F.col("ref"), F.col("vt"))).collect()
    for r in out:
        assert r["e"] == r["expected"]


def test_quality_score_half_up_integer_division(spark):
    # (100*rd + td/2) / td with int division — VariantLoad3.java:270-274
    df = spark.createDataFrame(
        [(5, 10, 50), (1, 3, 33), (2, 3, 67), (1, 8, 13), (7, 8, 88), (3, 0, None), (3, None, None)],
        "rd int, td int, expected int",
    )
    out = df.withColumn("q", quality_score(F.col("rd"), F.col("td"))).collect()
    for r in out:
        assert r["q"] == r["expected"], (r["rd"], r["td"], r["q"])


def test_total_depth_derived(spark):
    df = spark.createDataFrame(
        [
            (None, 1, 2, 3, 4, 99, "snv", 10),
            (42, 1, 2, 3, 4, 99, "snv", 42),
            (None, None, None, None, None, 17, "del", 17),
        ],
        "td int, a int, c int, g int, t int, rd int, vt string, expected int",
    )
    out = df.withColumn(
        "o",
        total_depth_derived(
            F.col("td"), F.col("a"), F.col("c"), F.col("g"), F.col("t"), F.col("rd"), F.col("vt")
        ),
    ).collect()
    for r in out:
        assert r["o"] == r["expected"]


def test_reverse_complement_matches_python_and_is_involution(spark):
    seqs = ["ACGT", "AAATTTCCCGGG", "ACGTN", "A", ""]
    df = spark.createDataFrame([(s,) for s in seqs], "seq string")
    out = {r["seq"]: r["rc"] for r in df.withColumn("rc", reverse_complement(F.col("seq"))).collect()}
    for s in seqs:
        assert out[s] == reverse_complement_str(s)
    df2 = df.withColumn("rc2", reverse_complement(reverse_complement(F.col("seq"))))
    for r in df2.collect():
        assert r["rc2"] == r["seq"]  # involution


def test_codon_table_is_complete_standard_code():
    assert len(CODON_TABLE) == 64
    assert CODON_TABLE["ATG"] == "M"
    assert {CODON_TABLE[c] for c in ("TAA", "TAG", "TGA")} == {"*"}
    assert translate_dna_str("ATGGCC") == "MA"
    assert translate_dna_str("ATGNNN") == "MX"
    assert translate_dna_str("ATGGC") == "M"  # trailing partial codon dropped


def test_translate_codons_expr_matches_python(spark):
    seqs = ["ATGGCCTAA", "atggcc", "ATGNNNTGA", "AC", "", "ATGGCCTA"]
    df = spark.createDataFrame([(s,) for s in seqs], "seq string")
    out = {r["seq"]: r["aa"] for r in df.withColumn("aa", translate_codons(F.col("seq"))).collect()}
    for s in seqs:
        assert out[s] == translate_dna_str(s), (s, out[s], translate_dna_str(s))


def test_adjust_for_indels(spark):
    df = spark.createDataFrame(
        [
            # VCF G→GT insertion: pos+1, ref NULL, var 'T', padding 'G'
            (100, "G", "GT", 101, None, "T", "G"),
            # VCF GT→G deletion: pos+1, ref 'T', var NULL, padding 'G'
            (100, "GT", "G", 101, "T", None, "G"),
            # SNV passthrough
            (100, "G", "T", 100, "G", "T", None),
        ],
        "pos long, ref string, alt string, e_pos long, e_ref string, e_var string, e_pad string",
    )
    cols = adjust_for_indels(F.col("pos"), F.col("ref"), F.col("alt"))
    out = df.withColumns({f"o_{k}": v for k, v in cols.items()}).collect()
    for r in out:
        assert r["o_position"] == r["e_pos"]
        assert r["o_ref_nuc"] == r["e_ref"]
        assert r["o_var_nuc"] == r["e_var"]
        assert r["o_padding_base"] == r["e_pad"]


def test_bpe_ish_token_count(spark):
    """BPE-style pretokens: contractions split, leading spaces attach to
    the following run, punctuation separates."""
    from rat_strain_loader_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "it's fine"),      # [it]['s][ fine] = 3
            (2, "hello,  world"),  # [hello][,][ ][ world]  -- ' ?' takes one space, '\s+' the rest... see below
            (3, "a1b2"),           # [a][1][b][2] = 4
            (4, ""),               # 0
        ],
        "id long, text string",
    )
    out = {r["id"]: r["n"] for r in df.select("id", T.bpe_ish_token_count(F.col("text")).alias("n")).collect()}
    assert out[1] == 3
    assert out[3] == 4
    assert out[4] == 0
    # cross-check row 2 against a hand regex (pattern is the contract)
    import re
    n2 = len(re.findall(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+", "hello,  world"))
    assert out[2] == n2


def test_repetition_stats(spark):
    from rat_strain_loader_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "a\nb\na\n\n  \nb\na"),  # a,b,a,b,a → 5 lines, 2 distinct
            (2, "x\ny\nz"),
            (3, ""),
        ],
        "id long, text string",
    )
    st = T.repetition_stats(F.col("text"))
    out = {r["id"]: r for r in df.select("id", *[v.alias(k) for k, v in st.items()]).collect()}
    assert out[1]["n_lines"] == 5
    assert out[1]["dup_line_frac_micros"] == 600000
    assert out[1]["max_line_repeat"] == 3
    assert out[2]["dup_line_frac_micros"] == 0 and out[2]["max_line_repeat"] == 1
    assert out[3]["n_lines"] == 0 and out[3]["max_line_repeat"] == 0


def test_redact_pii(spark):
    from rat_strain_loader_pipeline_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@x.co.uk now"),
            (2, "server 192.168.1.255 up"),
            (3, "call +44 20 7946 0958 ok"),
            (4, "clean text only"),
            (5, "both joe@x.io at 10.0.0.1"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["c"] for r in df.select("id", T.redact_pii(F.col("text")).alias("c")).collect()}
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server <IP> up"
    assert out[3] == "call <PHONE> ok"
    assert out[4] == "clean text only"
    assert out[5] == "both <EMAIL> at <IP>"


def test_greedy_pack(spark):
    """Packing invariants: offsets within [0, max), pack boundaries at
    running-sum multiples, deterministic across runs."""
    from rat_strain_loader_pipeline_spark.operators.text import greedy_pack

    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(200)],
        "doc_id long, n_tokens int",
    )
    out = greedy_pack(docs, max_tokens=1000, n_shards=4).collect()
    assert len(out) == 200
    by_shard = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        assert 0 <= r["offset_in_pack"] < 1000
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        cum = 0
        for r in rows:
            assert r["pack_id"] == cum // 1000, (shard, r)
            assert r["offset_in_pack"] == cum % 1000
            cum += r["n_tokens"]
    out2 = greedy_pack(docs, max_tokens=1000, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_pmi_bigrams_finds_planted_collocation(spark):
    from rat_strain_loader_pipeline_spark.operators.text import pmi_bigrams

    # "hong kong" always co-occurs; filler words are shuffled noise
    docs = []
    for i in range(30):
        filler = " ".join(f"w{j}" for j in ((i * 7 + k) % 13 for k in range(6)))
        docs.append((i, f"{filler} hong kong {filler}"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_bigrams(df, min_count=5, topn=5).collect()
    assert out[0]["a"] == "hong" and out[0]["b"] == "kong"
    assert out[0]["n_ab"] == 30
    # the planted pair's ratio strictly beats every filler pair
    assert out[0]["pmi_ratio_q"] > out[1]["pmi_ratio_q"]


def test_bpe_train_greedy_merge_and_determinism(spark):
    """Merge table matches a direct Python BPE model (word-histogram
    variant), including the left-to-right non-overlap rule on (a, a)
    runs; output is partition-count invariant."""
    from collections import Counter

    import rat_strain_loader_pipeline_spark.operators.text as T

    rows = [
        (0, "aaa aaa banana banana banana bandana"),
        (1, "aaa banana bandana bandana"),
        (2, "low lower lowest low low"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def python_bpe(texts, rounds):
        words = Counter(w for t in texts for w in t.lower().split())
        syms = {w: list(w) for w in words}
        out = []
        for r in range(rounds):
            pc = Counter()
            for w, s in syms.items():
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] += words[w]
            if not pc:
                break
            (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((r, a, b, n))
            for w, s in syms.items():
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                syms[w] = ns
        return out

    want = python_bpe([r[1] for r in rows], 5)
    got = [
        (r["merge_round"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in T.bpe_train(docs, rounds=5).orderBy("merge_round").collect()
    ]
    assert got == want
    got7 = [
        (r["merge_round"], r["merge_left"], r["merge_right"], r["pair_count"])
        for r in T.bpe_train(docs.repartition(7), rounds=5).orderBy("merge_round").collect()
    ]
    assert got7 == want


def test_bpe_disjoint_filter_rule():
    """Non-recursive keep rule: conflict against ANY higher-ranked
    candidate (kept or not) drops a candidate; conflicts are shared
    symbols or a concatenation equal to the other's symbol."""
    from rat_strain_loader_pipeline_spark.operators.text import (
        _bpe_disjoint_filter,
    )

    # shared-symbol conflict: (b, c) shares b with (a, b)
    kept = _bpe_disjoint_filter([("a", "b", 9), ("b", "c", 8), ("d", "e", 7)])
    assert kept == [(1, "a", "b", 9), (3, "d", "e", 7)]
    # concat conflict: ("ab", "c") matches (a, b)'s concatenation
    kept = _bpe_disjoint_filter([("a", "b", 9), ("ab", "c", 8)])
    assert kept == [(1, "a", "b", 9)]
    # non-recursive: r3 conflicts only with DISCARDED r2 — still dropped
    kept = _bpe_disjoint_filter(
        [("a", "b", 9), ("b", "c", 8), ("c", "x", 7), ("y", "z", 6)]
    )
    assert kept == [(1, "a", "b", 9), (4, "y", "z", 6)]


def test_bpe_train_batched_equals_sequential_when_disjoint(spark):
    """On a corpus whose top pairs are mutually disjoint and
    non-interacting (2-symbol words over separate alphabets), one
    batched round equals the same number of sequential single-merge
    rounds — the fastBPE batching contract."""
    import rat_strain_loader_pipeline_spark.operators.text as T

    text = " ".join(["ab"] * 8 + ["cd"] * 5 + ["ef"] * 3)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")

    seq = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in T.bpe_train(docs, rounds=3).orderBy("merge_round").collect()
    ]
    bat = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in T.bpe_train_batched(docs, rounds=1, window=3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert seq == bat == [("a", "b", 8), ("c", "d", 5), ("e", "f", 3)]


def test_bpe_merge_multi_expr_run_parity(spark):
    """The multi-pair fold keeps single-pair greedy semantics: an
    (a, a) run merges odd occurrences left-to-right while a disjoint
    (c, d) pair applies in the same pass."""
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.operators.text import (
        _bpe_merge_multi_expr,
    )

    df = spark.createDataFrame(
        [(["a", "a", "a", "c", "d"],)], "s array<string>"
    )
    out = df.select(
        _bpe_merge_multi_expr(F.col("s"), [("a", "a"), ("c", "d")]).alias("m")
    ).collect()[0]["m"]
    assert out == ["aa", "a", "cd"]


def test_quality_model_score_python_model(spark):
    """Map-side hashed linear model matches a direct Python replay of the
    md5-lower64 feature hash + Knuth weight table; empty docs score the
    bias."""
    import rat_strain_loader_pipeline_spark.operators.text as T
    from rat_strain_loader_pipeline_spark.operators.dedup import _md5_lower64

    rows = [(0, "the cat sat"), (1, ""), (2, "  "), (3, "Zebra zebra!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["logit"]
        for r in docs.select(
            "doc_id", T.quality_model_score(F.col("text")).alias("logit")
        ).collect()
    }

    def model(text):
        logit = 500_000
        for tok in text.lower().split():
            idx = _md5_lower64("qmodel:v1:" + tok) % 64
            logit += (idx * 2654435761) % 2_000_001 - 1_000_000
        return logit

    for d, t in rows:
        assert got[d] == model(t), d
