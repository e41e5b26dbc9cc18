"""PolyPhen round-trip tests: candidate export, consume-once import (J12),
swapped-AA reject (J13), FASTA wrap, flank QC (X22)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.pipelines.polyphen import (
    flank_match_qc,
    load_polyphen_results,
    parse_polyphen_results,
    polyphen_candidates,
    polyphen_input_lines,
    wrap_fasta_70,
)


def test_candidates_predicate(spark):
    vt = spark.createDataFrame(
        [
            (1, 100, "Q", "R", 5, 360),    # candidate
            (2, 100, "Q", "Q", 6, 360),    # same AA → no
            (3, 100, "Q", "*", 7, 360),    # stop → no
            (4, 100, None, "R", 8, 360),   # no ref AA → no
        ],
        "variant_rgd_id long, transcript_rgd_id int, ref_aa string, var_aa string, full_ref_aa_pos int, map_key int",
    )
    variant = spark.createDataFrame(
        [(1, "A", "C"), (2, "A", "C"), (3, "A", "C"), (4, "A", "C")],
        "rgd_id long, ref_nuc string, var_nuc string",
    )
    vmd = spark.createDataFrame(
        [(i, "1", 360) for i in (1, 2, 3, 4)], "rgd_id long, chromosome string, map_key int"
    )
    transcripts = spark.createDataFrame(
        [(100, 10, "N", "NM_1", "NP_1")],
        "transcript_rgd_id int, gene_rgd_id int, is_non_coding_ind string, acc_id string, protein_acc_id string",
    )
    genes = spark.createDataFrame(
        [(10, "+")], "gene_rgd_id int, strand string"
    )
    cand = polyphen_candidates(variant, vmd, vt, transcripts, genes)
    rows = cand.collect()
    assert [r["variant_rgd_id"] for r in rows] == [1]
    lines = polyphen_input_lines(cand).collect()
    assert lines[0]["line"] == "NP_1 5 Q R"


def test_wrap_fasta_70(spark):
    seq = "A" * 150
    df = spark.createDataFrame([("NP_1", seq)], "h string, s string")
    out = df.select(wrap_fasta_70(F.col("h"), F.col("s")).alias("f")).collect()[0]["f"]
    lines = out.split("\n")
    assert lines[0] == ">NP_1"
    assert [len(x) for x in lines[1:]] == [70, 70, 10]


RESULT_HEADER_COLS = 55


def _result_line(o_acc, o_pos, o_aa1, o_aa2, aa1, aa2, prob):
    cols = [""] * RESULT_HEADER_COLS
    cols[0], cols[1], cols[2], cols[3] = o_acc, str(o_pos), o_aa1, o_aa2
    cols[5], cols[6], cols[7], cols[8] = "Q4TU74", str(o_pos), aa1, aa2
    cols[11], cols[12], cols[13], cols[14] = "benign", "alignment", "", "neutral"
    cols[15], cols[16], cols[17], cols[18] = str(prob), "1", "1", "0.5"
    return "\t".join(cols)


def test_parse_reject_and_consume_once(spark):
    lines = [
        _result_line("NP_1", 5, "Q", "R", "Q", "R", 0.9),   # ok
        _result_line("NP_1", 5, "Q", "R", "Q", "R", 0.7),   # duplicate key
        _result_line("NP_2", 9, "K", "E", "E", "K", 0.5),   # swapped → reject
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "line string")
    parsed = parse_polyphen_results(raw)
    assert parsed.count() == 3
    info = spark.createDataFrame(
        [
            (101, "Gene1", "NP_1", 5, "Q", "R", "+", 7001),
            (102, "Gene1", "NP_1", 5, "Q", "R", "+", 7002),  # 2nd info row same key
            (103, "Gene2", "NP_2", 9, "K", "E", "+", 7003),
        ],
        "variant_rgd_id long, locus_name string, protein_acc_id string, pos int, ref_aa string, var_aa string, strand string, transcript_rgd_id int",
    )
    out = load_polyphen_results(parsed, info).collect()
    # swapped row rejected; two dup results consume the two distinct info rows
    assert len(out) == 2
    assert {r["variant_rgd_id"] for r in out} == {101, 102}
    assert {r["transcript_rgd_id"] for r in out} == {7001, 7002}
    probs = {r["variant_rgd_id"]: r["pph2_prob"] for r in out}
    assert probs[101] == 0.9  # highest-prob result binds first info row


def test_flank_match_qc(spark):
    cand = spark.createDataFrame(
        [
            (1, "NP_1", 3, "MKQRILY"),   # matches annotated
            (2, "NP_1", 3, "MKXRILY"),   # translated differs at flank
            (3, "NP_9", 3, "MKQRILY"),   # unknown protein
        ],
        "variant_rgd_id long, protein_acc_id string, pos int, full_ref_aa string",
    )
    prot = spark.createDataFrame([("NP_1", "MKQRILY")], "protein_acc_id string, protein_seq string")
    out = {r["variant_rgd_id"]: r["flank_ok"] for r in flank_match_qc(cand, prot, flank=3).collect()}
    assert out[1] is True
    assert out[2] is False
    assert out[3] is False


def test_polyphen_fasta_for_missing(spark):
    """PolyphenFasta: acc extraction (token up to next space), distinct,
    sequence join, 70-char wrap; unmatched acc flagged not dropped."""
    from rat_strain_loader_pipeline_spark.pipelines.polyphen import (
        polyphen_fasta_for_missing,
    )

    logs = spark.createDataFrame(
        [
            ("ERROR: Unable to locate protein entry NP_1 while processing",),
            ("ERROR: Unable to locate protein entry NP_1 again",),  # dup acc
            ("ERROR: Unable to locate protein entry NP_2 x",),
            ("ERROR: Unable to locate protein entry NP_9 y",),  # no sequence
            ("ERROR: Unable to locate protein entry NP_3",),  # no trailing space → dropped
            ("INFO: all good",),
        ],
        "line string",
    )
    seqs = spark.createDataFrame(
        [("NP_1", "M" * 75), ("NP_2", "KV"), ("NP_8", "AA")],
        "protein_acc_id string, protein_seq string",
    )
    out = {r["protein_acc_id"]: r for r in polyphen_fasta_for_missing(logs, seqs).collect()}
    assert set(out) == {"NP_1", "NP_2", "NP_9"}
    assert out["NP_1"]["found"] and out["NP_2"]["found"] and not out["NP_9"]["found"]
    assert out["NP_1"]["fasta"] == ">NP_1\n" + "M" * 70 + "\n" + "M" * 5
    assert out["NP_2"]["fasta"] == ">NP_2\nKV"
    assert out["NP_9"]["fasta"] is None
