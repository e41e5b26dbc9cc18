"""StructTypes for every table/file format in the engine.

Derived from the reference's column lists (SURVEY.md §1.2):
- CF2:                 convert/CommonFormat2Line.java:8-33
- variant:             VariantProcessingBase.java:225-239
- variant_map_data:    VariantProcessingBase.java:240-253
- variant_sample_detail: VariantProcessingBase.java:254-275
- variant_transcript:  VariantTranscriptBatch.java:137-148
- conservation:        ConservationScoreLoader.java:172
- snp_eff:             SnpEffLoader.java:167-208
- lookup tables:       GeneCache.java:29-34, TranscriptCache.java:29-30,
                       TranscriptFeatureCache.java:26-29,
                       convert/CommonFormat2Writer.java:139
Primitives only — no nested types needed (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _st(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


# ---------------------------------------------------------------- CF2 TSV
# 16-column Common Format 2, one allele per row
# (convert/CommonFormat2Line.java:8-33; header CommonFormat2Writer.java:57)
CF2_SCHEMA = _st(
    ("chr", StringType()),
    ("position", LongType()),
    ("ref_nuc", StringType()),
    ("var_nuc", StringType()),
    ("rs_id", StringType()),
    ("count_a", IntegerType()),
    ("count_c", IntegerType()),
    ("count_g", IntegerType()),
    ("count_t", IntegerType()),
    ("total_depth", IntegerType()),
    ("hgvs_name", StringType()),
    ("rgd_id", LongType()),
    ("allele_depth", IntegerType()),
    ("allele_count", IntegerType()),
    ("read_depth", IntegerType()),
    ("padding_base", StringType()),
)

# ---------------------------------------------------------------- raw VCF
# Fixed 8/9 leading columns; per-strain genotype columns are read
# positionally (VcfToCommonFormat2Converter.java:119-147).
VCF_FIXED_COLS = ["chrom", "pos", "id", "ref", "alt", "qual", "filter", "info"]

# ------------------------------------------------------------- store tables
VARIANT_SCHEMA = _st(
    ("rgd_id", LongType()),
    ("ref_nuc", StringType()),
    ("variant_type", StringType()),  # 'snv' | 'ins' | 'del'
    ("var_nuc", StringType()),
    ("rs_id", StringType()),
    ("clinvar_id", StringType()),
    ("species_type_key", IntegerType()),
)

VARIANT_MAP_DATA_SCHEMA = _st(
    ("rgd_id", LongType()),
    ("chromosome", StringType()),
    ("start_pos", LongType()),
    ("end_pos", LongType()),
    ("padding_base", StringType()),
    ("genic_status", StringType()),  # 'GENIC' | 'INTERGENIC'
    ("map_key", IntegerType()),
)

VARIANT_SAMPLE_DETAIL_SCHEMA = _st(
    ("rgd_id", LongType()),
    ("source", StringType()),
    ("sample_id", IntegerType()),
    ("total_depth", IntegerType()),
    ("var_freq", IntegerType()),
    ("zygosity_status", StringType()),
    ("zygosity_percent_read", IntegerType()),
    ("zygosity_poss_error", StringType()),
    ("zygosity_ref_allele", StringType()),  # 'Y' | 'N'
    ("zygosity_num_allele", IntegerType()),
    ("zygosity_in_pseudo", StringType()),
    ("quality_score", IntegerType()),
)

VARIANT_TRANSCRIPT_SCHEMA = _st(
    ("variant_rgd_id", LongType()),
    ("transcript_rgd_id", IntegerType()),
    ("ref_aa", StringType()),
    ("var_aa", StringType()),
    ("syn_status", StringType()),  # 'synonymous'|'nonsynonymous'|'unassignable'
    ("location_name", StringType()),
    ("near_splice_site", StringType()),  # 'T' | 'F'
    ("full_ref_aa_pos", IntegerType()),
    ("full_ref_nuc_pos", IntegerType()),
    ("triplet_error", StringType()),  # 'T' | 'F'
    ("full_ref_aa_seq_key", LongType()),
    ("full_ref_nuc_seq_key", LongType()),
    ("frameshift", StringType()),  # 'T' | 'F'
    ("map_key", IntegerType()),
)

CONSERVATION_SCHEMA = _st(
    ("position", LongType()),
    ("chr", StringType()),
    ("score", DoubleType()),
)

SNP_EFF_SCHEMA = _st(
    ("variant_rgd_id", LongType()),
    ("sample_id", IntegerType()),
    ("allele", StringType()),
    ("annotation", StringType()),
    ("impact", StringType()),
    ("gene_name", StringType()),
    ("gene_id", StringType()),
    ("feature_type", StringType()),
    ("feature_id", StringType()),
    ("transcript_biotype", StringType()),
    ("rank_", StringType()),
    ("hgvs_c", StringType()),
    ("hgvs_p", StringType()),
    ("cdna_pos", StringType()),
    ("cds_pos", StringType()),
    ("protein_pos", StringType()),
    ("distance_to_feature", StringType()),
    ("errors", StringType()),
)

# ---------------------------------------------------------- lookup tables
SAMPLE_SCHEMA = _st(
    ("sample_id", IntegerType()),
    ("analysis_name", StringType()),
    ("gender", StringType()),  # 'M' | 'F' | 'U' | 'P'
    ("map_key", IntegerType()),
    ("patient_id", IntegerType()),
    ("description", StringType()),
)

GENE_SCHEMA = _st(
    ("gene_rgd_id", IntegerType()),
    ("chromosome", StringType()),
    ("start_pos", LongType()),
    ("stop_pos", LongType()),
    ("strand", StringType()),
    ("object_status", StringType()),
    ("map_key", IntegerType()),
)

TRANSCRIPT_SCHEMA = _st(
    ("transcript_rgd_id", IntegerType()),
    ("gene_rgd_id", IntegerType()),
    ("is_non_coding_ind", StringType()),  # 'Y' | 'N'
    ("acc_id", StringType()),
    ("protein_acc_id", StringType()),
)

TRANSCRIPT_FEATURE_SCHEMA = _st(
    ("transcript_rgd_id", IntegerType()),
    ("object_name", StringType()),  # 'EXONS' | '3UTRS' | '5UTRS'
    ("strand", StringType()),
    ("chromosome", StringType()),
    ("start_pos", LongType()),
    ("stop_pos", LongType()),
    ("map_key", IntegerType()),
)

DB_SNP_SCHEMA = _st(
    ("position", LongType()),
    ("chromosome", StringType()),
    ("map_key", IntegerType()),
    ("source", StringType()),
    ("allele", StringType()),
    ("snp_name", StringType()),
    ("snp_class", StringType()),
)

FASTA_SEQ_SCHEMA = _st(
    ("chr", StringType()),
    ("seq", StringType()),
)

# PolyPhen-2 result rows: the loader extracts these named fields out of the
# 55-column TSV (PolyphenLoader.java:110-169); we keep the named subset.
POLYPHEN_SCHEMA = _st(
    ("o_acc", StringType()),
    ("o_pos", IntegerType()),
    ("o_aa1", StringType()),
    ("o_aa2", StringType()),
    ("acc", StringType()),
    ("pos", IntegerType()),
    ("aa1", StringType()),
    ("aa2", StringType()),
    ("prediction", StringType()),
    ("based_on", StringType()),
    ("effect", StringType()),
    ("pph2_class", StringType()),
    ("pph2_prob", DoubleType()),
    ("pph2_fpr", DoubleType()),
    ("pph2_tpr", DoubleType()),
    ("pph2_fdr", DoubleType()),
    ("variant_rgd_id", LongType()),
    ("transcript_rgd_id", IntegerType()),
    ("protein_acc_id", StringType()),
    ("ref_aa", StringType()),
    ("var_aa", StringType()),
    ("strand", StringType()),
)
