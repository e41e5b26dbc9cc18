"""Golden tests for the consequence engine (X8-X17).

Fixture genome (chr '1', 1-based), built compositionally:
  [1-3]  TTT       upstream junk
  [4-6]  GGC       5'UTR (inside exon 1)
  [7-12] CAAATA    CDS part 1
  [13-15] GGG      intron
  [16-21] CTTTAC   CDS part 2
  [22-24] TAG      3'UTR (inside exon 2)
  [25-33] AAACCCGGG downstream junk

Transcript T1 (+ strand, gene G1): exons [4,12] and [16,24];
5'UTR [4,6]; 3'UTR [22,24] → CDS = 'CAAATA'+'CTTTAC' = 12 nt
→ codons CAA ATA CTT TAC → QILY.

Variant at pos 8 (A→G): codon 1 CAA→CGA → Q→R nonsynonymous.
The '-' strand twin exercises the UTR swap + revcomp + relpos flip.
"""

from __future__ import annotations

import pytest

from rat_strain_loader_pipeline_spark.operators.consequence import (
    compute_consequence,
)

SEQ = "TTT" + "GGC" + "CAAATA" + "GGG" + "CTTTAC" + "TAG" + "AAACCCGGG"
SEQS = {"1": SEQ}


def _sub(a, b):  # 1-based inclusive helper
    return SEQ[a - 1 : b]


FEATURES_T1 = sorted(
    [
        ("EXONS", "+", 4, 12),
        ("EXONS", "+", 16, 24),
        ("5UTRS", "+", 4, 6),
        ("3UTRS", "+", 22, 24),
    ]
)


def test_fixture_cds_is_what_we_think():
    assert _sub(7, 12) + _sub(16, 21) == "CAAATACTTTAC".replace(" ", "")


def test_snv_nonsynonymous_plus_strand():
    r = compute_consequence(8, 9, "A", "G", False, FEATURES_T1, SEQS, "1")
    assert r.location_name == "EXON"
    assert r.full_ref_nuc == "caaatactttac"
    assert (r.ref_aa, r.var_aa) == ("Q", "R")
    assert r.syn_status == "nonsynonymous"
    assert r.full_ref_aa == "QILY"
    assert r.full_ref_aa_pos == 1
    assert r.full_ref_nuc_pos == 2
    assert r.frameshift == "F"
    assert r.triplet_error == "F"


def test_snv_codon2(spark=None):
    r = compute_consequence(10, 11, "A", "G", False, FEATURES_T1, SEQS, "1")
    assert (r.ref_aa, r.var_aa) == ("I", "V")
    assert r.full_ref_aa_pos == 2


def test_snv_synonymous():
    # CDS pos 3 (genome pos 9): codon 1 = CAA; third base A→G gives CAG → Q
    r = compute_consequence(9, 10, "A", "G", False, FEATURES_T1, SEQS, "1")
    assert (r.ref_aa, r.var_aa) == ("Q", "Q")
    assert r.syn_status == "synonymous"


def test_exon_last_base_quirk_degrades_to_location_only():
    # Reference quirk (VariantPostProcessing.java:395: stop STRICTLY > varStop):
    # an SNV at the exon's last base (end_pos = stop+1) never matches the
    # relpos scan and degrades to a location row — replicated faithfully.
    r = compute_consequence(12, 13, "A", "T", False, FEATURES_T1, SEQS, "1")
    assert r.ref_aa is None


def test_variant_in_5utr_location_only():
    r = compute_consequence(5, 6, "T", "C", False, FEATURES_T1, SEQS, "1")
    # in exon AND in 5'UTR: full-cover label picks up both
    assert r.location_name == "5UTRS,EXON"
    # inside the clipped-away UTR part → no AA computed
    assert r.ref_aa is None and r.syn_status is None


def test_variant_in_intron():
    r = compute_consequence(14, 15, "G", "C", False, FEATURES_T1, SEQS, "1")
    assert r.location_name == "INTRON"
    assert r.ref_aa is None


def test_non_coding_transcript():
    r = compute_consequence(8, 9, "A", "G", True, FEATURES_T1, SEQS, "1")
    assert r.location_name == "EXON,NON-CODING"
    assert r.ref_aa is None


def test_near_splice_site():
    # second exon start = 16; variant at 17 is within ±10 → T
    r = compute_consequence(17, 18, "T", "A", False, FEATURES_T1, SEQS, "1")
    assert r.near_splice_site == "T"
    # first exon start (4) never counts, and first exon STOP does (not last)
    r2 = compute_consequence(8, 9, "A", "G", False, FEATURES_T1, SEQS, "1")
    assert r2.near_splice_site == "T"  # exon1 stop=12 within 10bp of pos 8


def test_minus_strand_reverse_complement():
    feats = sorted(
        [
            ("EXONS", "-", 4, 12),
            ("EXONS", "-", 16, 24),
            # '-' strand: swap semantics — 3' and 5' UTRs trade places
            ("5UTRS", "-", 22, 24),
            ("3UTRS", "-", 4, 6),
        ]
    )
    # CDS (after swap+clip) is the same [7,12]+[16,21]; revcomp('caaatactttac')
    # = 'GTAAAGTATTTG' → GTA AAG TAT TTG → V K Y L
    r = compute_consequence(8, 9, "A", "G", False, feats, SEQS, "1")
    assert r.full_ref_nuc == "GTAAAGTATTTG"
    assert r.full_ref_aa == "VKYL"
    # genome pos 8 = CDS rel 2 (+), flipped: 12-2+1 = 11 → codon 4
    assert r.full_ref_nuc_pos == 11
    assert r.full_ref_aa_pos == 4
    # ref codon TTG=L; variant: genome A→G at 8 → revcomp C at rel 11 →
    # TTG → TCG = S
    assert (r.ref_aa, r.var_aa) == ("L", "S")
    assert r.syn_status == "nonsynonymous"


def test_insertion_frameshift_truncation_quirk():
    # VCF-adjusted insertion: ref None, 'GG' inserted at pos 9. The Java
    # computes frameshift AFTER the %3 truncation (var 14→12, ref 12 →
    # diff 0 → 'F') — the reference ships FrameShiftFixUp to recompute it
    # from the raw alleles (fixup/FrameShiftFixUp.java:55-69). Replicated
    # faithfully here; the fixup pipeline corrects it.
    r = compute_consequence(9, 9, None, "GG", False, FEATURES_T1, SEQS, "1")
    assert r.frameshift == "F"  # the quirk
    assert r.syn_status is not None


def test_insertion_of_one_reports_frameshift():
    # 1-base insertion: var 13→12 after truncation... still diff 0? No:
    # ref 12 %3==0 kept, var 13→12 → diff 0 → 'F' again (quirk); but a
    # 1-base insertion in a CDS of length %3==1 (exon [4,13]) keeps a
    # genuine diff. CDS [7,13] = 7nt → ref trunc 6; var 8nt → trunc 6.
    # The stored flag still comes from the fixup in practice.
    r = compute_consequence(9, 9, None, "G", False, FEATURES_T1, SEQS, "1")
    assert r.frameshift == "F"


def test_deletion_applies_and_truncation_quirk():
    # 1-base deletion (var None): var_dna 11 → truncated to 9, ref 12 →
    # diff 3 → 'F' (the same truncation quirk; fixup recomputes 'T').
    r = compute_consequence(9, 10, "A", None, False, FEATURES_T1, SEQS, "1")
    assert r.frameshift == "F"
    # the deletion really happened: var AA seq shorter/shifted
    assert r.full_ref_aa == "QILY"
    assert r.ref_aa == "Q"


def test_triplet_error_truncation():
    # transcript with CDS length not divisible by 3: exon [4,12], 5UTR [4,6],
    # no 3'UTR → CDS [7,12] = 6nt? that's %3==0; use [7,13] instead:
    feats = sorted([("EXONS", "+", 4, 13), ("5UTRS", "+", 4, 6)])
    r = compute_consequence(8, 9, "A", "G", False, feats, SEQS, "1")
    assert r.triplet_error == "T"
    assert len(r.full_ref_nuc) % 3 == 0


def test_multi_allelic_and_bad_chrom_graceful():
    r = compute_consequence(8, 9, "A", "G", False, FEATURES_T1, {"2": "ACGT"}, "1")
    # unknown chromosome → empty DNA → degrades to location-only row
    assert r.location_name == "EXON"
    assert r.ref_aa is None


def test_spark_end_to_end_consequence(spark):
    from rat_strain_loader_pipeline_spark.pipelines.postprocess import (
        postprocess_variants,
    )

    variants = spark.createDataFrame(
        [
            (1, "1", 8, 9, "A", "G"),     # nonsynonymous Q→R
            (2, "1", 14, 15, "G", "C"),   # intron
            (3, "1", 8, 9, "A", "G,T"),   # multi-allelic → skipped (F4)
            (4, "1", 5000, 5001, "A", "G"),  # intergenic → no gene join hit
        ],
        "rgd_id long, chromosome string, start_pos long, end_pos long, ref_nuc string, var_nuc string",
    )
    genes = spark.createDataFrame(
        [(100, "1", 4, 24, "+", "ACTIVE", 360)],
        "gene_rgd_id int, chromosome string, start_pos long, stop_pos long, strand string, object_status string, map_key int",
    )
    transcripts = spark.createDataFrame(
        [(200, 100, "N", "NM_1", "NP_1")],
        "transcript_rgd_id int, gene_rgd_id int, is_non_coding_ind string, acc_id string, protein_acc_id string",
    )
    features = spark.createDataFrame(
        [
            (200, "EXONS", "+", "1", 4, 12, 360),
            (200, "EXONS", "+", "1", 16, 24, 360),
            (200, "5UTRS", "+", "1", 4, 6, 360),
            (200, "3UTRS", "+", "1", 22, 24, 360),
        ],
        "transcript_rgd_id int, object_name string, strand string, chromosome string, start_pos long, stop_pos long, map_key int",
    )
    fb = spark.sparkContext.broadcast(SEQS)
    res = postprocess_variants(variants, genes, transcripts, features, fb, 360)
    vt = {r["variant_rgd_id"]: r for r in res.variant_transcript.collect()}
    assert set(vt) == {1, 2}  # multi-allelic + intergenic excluded
    assert vt[1]["ref_aa"] == "Q" and vt[1]["var_aa"] == "R"
    assert vt[1]["syn_status"] == "nonsynonymous"
    assert vt[2]["location_name"] == "INTRON"
    assert vt[2]["full_ref_aa_seq_key"] is None
    seqs = res.sequences.collect()
    types = {r["seq_type"] for r in seqs}
    assert types == {"full_ref_aa", "full_ref_nuc"}
    # seq keys deterministic: recompute matches
    res2 = postprocess_variants(variants, genes, transcripts, features, fb, 360)
    k1 = {(r["variant_rgd_id"], r["full_ref_aa_seq_key"]) for r in res.variant_transcript.collect()}
    k2 = {(r["variant_rgd_id"], r["full_ref_aa_seq_key"]) for r in res2.variant_transcript.collect()}
    assert k1 == k2


def test_blocks_path_equals_broadcast_path(spark):
    """The broadcast-free consequence (transcript spans from the fasta
    block table) must produce byte-identical VT rows to the broadcast
    path — including the '-' strand twin, degraded rows, and clamping
    near the chromosome head/tail."""
    from rat_strain_loader_pipeline_spark.operators.consequence import (
        variant_transcript_consequences,
        variant_transcript_consequences_blocks,
    )
    from rat_strain_loader_pipeline_spark.sources.fasta import (
        fasta_blocks,
        fasta_from_dict,
    )

    variants = spark.createDataFrame(
        [
            (1, "1", 8, 9, "A", "G"),      # nonsynonymous
            (2, "1", 14, 15, "G", "C"),    # intron
            (3, "1", 5, 6, "G", "C"),      # 5'UTR
            (4, "1", 17, 18, "T", "A"),    # second exon
            (5, "1", 8, 9, None, "GG"),    # insertion
        ],
        "rgd_id long, chromosome string, start_pos long, end_pos long, "
        "ref_nuc string, var_nuc string",
    )
    genes = spark.createDataFrame(
        [(100, "1", 4, 24, "+", "ACTIVE", 360), (101, "1", 4, 24, "-", "ACTIVE", 360)],
        "gene_rgd_id int, chromosome string, start_pos long, stop_pos long, "
        "strand string, object_status string, map_key int",
    )
    transcripts = spark.createDataFrame(
        [(200, 100, "N"), (201, 101, "N")],
        "transcript_rgd_id int, gene_rgd_id int, is_non_coding_ind string",
    )
    rows = []
    for tid, strand in ((200, "+"), (201, "-")):
        rows += [
            (tid, "EXONS", strand, "1", 4, 12, 360),
            (tid, "EXONS", strand, "1", 16, 24, 360),
            (tid, "5UTRS", strand, "1", 4, 6, 360),
            (tid, "3UTRS", strand, "1", 22, 24, 360),
        ]
    features = spark.createDataFrame(
        rows,
        "transcript_rgd_id int, object_name string, strand string, "
        "chromosome string, start_pos long, stop_pos long, map_key int",
    )

    fb = spark.sparkContext.broadcast(SEQS)
    via_broadcast = sorted(
        tuple(r)
        for r in variant_transcript_consequences(
            variants, genes, transcripts, features, fb, 360
        ).collect()
    )
    blocks = fasta_blocks(fasta_from_dict(spark, SEQS), block_size=8)
    via_blocks = sorted(
        tuple(r)
        for r in variant_transcript_consequences_blocks(
            variants, genes, transcripts, features, blocks, 360, block_size=8
        ).collect()
    )
    assert via_blocks == via_broadcast
