"""Side loaders and small converters.

- vcf8_to_cf2:       8-col single-strain VCF (S3/A8),
                     Vcf8ColToCommonFormat2Converter.java:107-260
- load_snpeff:       SnpEff ANN VCF → snp_eff rows matched to the
                     variant store (S10/X21/J11), SnpEffLoader.java:60-208
- load_conservation: wiggle → conservation table (S5),
                     ConservationScoreLoader.java:100-183
- txt2vcf_genotypes: Excel-export genotype grid → VCF-ish long rows
                     (S9/X24), convert/Txt2Vcf.java:62-234
- merge_sample_metadata: headered TSV → sample-table merge (S11),
                     fixup/LoadSampleMetadata1000_3000.java:24-51
- write_vcf / sort:  K5/W3 hand-built VCF output
- expand_iupac:      X19, convert/IUPAC.java:16-44
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.functions.dna import IUPAC_EXPANSION
from rat_strain_loader_pipeline_spark.functions.variant import adjust_for_indels
from rat_strain_loader_pipeline_spark.sources.vcf import parse_snpeff_ann, read_vcf_8col
from rat_strain_loader_pipeline_spark.sources.wig import read_fixedstep_wig


def vcf8_to_cf2(
    spark: SparkSession,
    path: str,
    accession_map: dict[str, str] | None = None,
    process_variants_same_as_ref: bool = False,
) -> DataFrame:
    """8-col VCF → CF2: DP/AC live in INFO; ref-depth inference (A8).

    When the reference allele is absent from ALT and AC is present:
    depth_ref = DP - Σ(AC); the ref is appended as a pseudo-allele when
    that depth is > 0 (Vcf8ColToCommonFormat2Converter.java:176-200).
    """
    vcf = read_vcf_8col(spark, path, accession_map)

    dp = F.element_at(F.col("info_map"), "DP").cast("int")
    ac_raw = F.element_at(F.col("info_map"), "AC")
    alts = F.split(F.col("alt"), ",")
    acs = F.when(ac_raw.isNotNull(), F.transform(F.split(ac_raw, ","), lambda x: x.cast("int")))

    ref_among = F.array_contains(alts, F.col("ref"))
    ref_depth = dp - F.aggregate(
        F.coalesce(acs, F.array().cast("array<int>")), F.lit(0), lambda a, x: a + F.coalesce(x, F.lit(0))
    )
    append_ref = ~ref_among & acs.isNotNull() & (ref_depth > 0)

    alleles = F.when(append_ref, F.concat(alts, F.array(F.col("ref")))).otherwise(alts)
    depths = F.when(append_ref, F.concat(acs, F.array(ref_depth))).otherwise(acs)

    df = vcf.select(
        "chrom", "pos", "id", "ref",
        dp.alias("total_depth"),
        alleles.alias("alleles"),
        depths.alias("depths"),
    ).select("*", F.posexplode("alleles").alias("i", "allele"))

    if not process_variants_same_as_ref:
        df = df.filter(F.col("allele") != F.col("ref"))

    def depth_of(allele: Column) -> Column:
        idx = F.array_position(F.col("alleles"), allele)
        return (
            F.when(F.col("depths").isNull(), F.lit(None))
            .when(idx > 0, F.element_at(F.col("depths"), idx.cast("int")))
            .otherwise(F.lit(0))
            .cast("int")
        )

    # without AC: counts fabricated from DP for the single alt (:230-247)
    no_ac = F.col("depths").isNull()
    count_for = lambda base: F.when(  # noqa: E731
        no_ac,
        F.when(F.col("allele") == base, F.col("total_depth")).otherwise(F.lit(None)),
    ).otherwise(depth_of(F.lit(base)))

    adj = adjust_for_indels(F.col("pos"), F.col("ref"), F.col("allele"))
    return df.select(
        F.col("chrom").alias("chr"),
        adj["position"].cast("long").alias("position"),
        adj["ref_nuc"].alias("ref_nuc"),
        adj["var_nuc"].alias("var_nuc"),
        F.when(F.col("id") != ".", F.col("id")).alias("rs_id"),
        count_for("A").alias("count_a"),
        count_for("C").alias("count_c"),
        count_for("G").alias("count_g"),
        count_for("T").alias("count_t"),
        F.when(F.col("total_depth") > 0, F.col("total_depth")).alias("total_depth"),
        F.lit(None).cast("string").alias("hgvs_name"),
        F.lit(None).cast("long").alias("rgd_id"),
        F.coalesce(
            F.when(no_ac, F.col("total_depth")).otherwise(
                F.element_at(F.col("depths"), (F.col("i") + 1).cast("int"))
            ),
            F.lit(0),
        ).cast("int").alias("allele_depth"),
        F.when(no_ac, F.lit(1)).otherwise(F.size("depths")).cast("int").alias("allele_count"),
        F.when(F.col("total_depth") > 0, F.col("total_depth")).cast("int").alias("read_depth"),
        adj["padding_base"].alias("padding_base"),
    )


def load_snpeff(
    spark: SparkSession,
    path: str | None,
    variant_store: DataFrame,
    sample_id: int,
    vcf8: DataFrame | None = None,
) -> DataFrame:
    """SnpEff ANN VCF → snp_eff rows (J11 join): match the variant store on
    (sample, chr, pos) then ref/var equality; explode ANN annotations.

    ``vcf8`` bypasses the file scan with a pre-read 8-col DataFrame
    carrying (chrom, pos, ref, alt, info)."""
    vcf = vcf8 if vcf8 is not None else read_vcf_8col(spark, path)
    ann = vcf.select(
        "chrom", "pos", "ref", "alt", parse_snpeff_ann(F.col("info")).alias("anns")
    ).filter(F.size("anns") > 0)

    v = variant_store.filter(F.col("sample_id") == sample_id).select(
        F.col("rgd_id").alias("variant_rgd_id"),
        F.col("sample_id"),
        F.col("chromosome"),
        F.col("start_pos"),
        F.col("ref_nuc"),
        F.col("var_nuc"),
    )
    joined = ann.join(
        v,
        (ann["chrom"] == v["chromosome"])
        & (ann["pos"] == v["start_pos"])
        & (ann["ref"] == v["ref_nuc"])
        & (ann["alt"] == v["var_nuc"]),
    )
    a = F.explode("anns").alias("a")
    exploded = joined.select("variant_rgd_id", "sample_id", a)
    fields = [
        "allele", "annotation", "impact", "gene_name", "gene_id", "feature_type",
        "feature_id", "transcript_biotype", "rank_", "hgvs_c", "hgvs_p",
        "cdna_pos", "cds_pos", "protein_pos", "distance_to_feature", "errors",
    ]
    return exploded.select(
        "variant_rgd_id",
        "sample_id",
        *[F.get(F.col("a"), i).alias(n) for i, n in enumerate(fields)],
    ).dropDuplicates(["variant_rgd_id", "sample_id", "annotation", "feature_id", "allele"])


def load_conservation(spark: SparkSession, path: str) -> DataFrame:
    """Wiggle fixedStep → conservation(position, chr, score) (S5)."""
    return read_fixedstep_wig(spark, path)


def txt2vcf_genotypes(genotype: Column, alleles: Column) -> dict[str, Column]:
    """X24 genotype→allele-depth synthesis (convert/Txt2Vcf.java:159-208).

    ``genotype``: observed call ('N' no data, 'H' homozygote-first-alt, or
    a literal base). ``alleles``: array with ref at index 1 (1-based
    element_at semantics: [ref, alt1, alt2...]).

    Returns gt and ad columns mirroring writeData: 'N' → './.:0,0';
    'H' → '1/i' with depth 9 on the first alt; base → '0/i' with ref
    depth 9 and the matching allele depth 9.
    """
    first_alt = F.element_at(alleles, 2)
    h_allele = first_alt
    n_alleles = F.size(alleles)

    def depths(target: Column, ref_depth: int) -> Column:
        idx = F.sequence(F.lit(2), n_alleles)
        per_alt = F.transform(
            idx, lambda i: F.when(F.element_at(alleles, i.cast("int")) == target, F.lit("9")).otherwise(F.lit("0"))
        )
        return F.concat_ws(",", F.lit(str(ref_depth)), F.array_join(per_alt, ","))

    def gt_index(target: Column) -> Column:
        # position of target among alleles (0-based: ref=0, alt1=1, ...)
        return F.array_position(alleles, target) - 1

    gt = (
        F.when(genotype == "N", F.lit("./."))
        .when(genotype == "H", F.concat(F.lit("1/"), gt_index(h_allele).cast("string")))
        .otherwise(F.concat(F.lit("0/"), gt_index(genotype).cast("string")))
    )
    ad = (
        F.when(genotype == "N", F.lit("0,0"))
        .when(genotype == "H", depths(h_allele, 0))
        .otherwise(depths(genotype, 9))
    )
    return {"gt": gt, "ad": ad}


def merge_sample_metadata(sample: DataFrame, metadata: DataFrame, key: str = "sample_id") -> DataFrame:
    """S11: header-driven UPDATE of the sample table — every metadata
    column overwrites the matching sample column on key match."""
    meta_cols = [c for c in metadata.columns if c != key]
    m = metadata.select(key, *[F.col(c).alias(f"__m_{c}") for c in meta_cols])
    out = sample.join(F.broadcast(m), key, "left")
    for c in meta_cols:
        if c in sample.columns:
            out = out.withColumn(c, F.coalesce(F.col(f"__m_{c}"), F.col(c)))
        else:
            out = out.withColumn(c, F.col(f"__m_{c}"))
    return out.drop(*[f"__m_{c}" for c in meta_cols])


def vcf_output_lines(df: DataFrame) -> DataFrame:
    """K5/W3: hand-built 8-col VCF data lines, sorted (chr, pos, id
    case-insensitive) like ClinVar2Vcf.java:148-202. Returns one 'line'
    column, globally ordered.

    Also the live surface of DbSnp2Vcf: its entire per-row pipeline
    (HGVS preferred-name parse, ref/var QC, strandedness) is commented
    out in the snapshot (DbSnp2Vcf.java:79-120 — the loop body is one
    block comment), so the tool's effective behavior is the VCF
    header/line writer plus counters, which this covers."""
    return (
        df.orderBy(
            F.col("chrom"), F.col("pos").cast("long"), F.lower(F.col("id"))
        )
        .select(
            F.concat_ws(
                "\t",
                "chrom",
                F.col("pos").cast("string"),
                F.coalesce(F.col("id"), F.lit(".")),
                "ref",
                "alt",
                F.coalesce(F.col("qual"), F.lit(".")),
                F.coalesce(F.col("filter"), F.lit(".")),
                F.coalesce(F.col("info"), F.lit(".")),
            ).alias("line")
        )
    )


def expand_iupac(allele: Column) -> Column:
    """X19: IUPAC ambiguity code → array of nucleotides (explode-ready)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in ((k, ",".join(v)) for k, v in IUPAC_EXPANSION.items()) for x in kv]
    )
    return F.split(F.element_at(mapping, F.upper(allele)), ",")
