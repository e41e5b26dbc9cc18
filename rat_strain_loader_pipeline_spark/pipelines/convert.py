"""VCF → CF2 converter pipeline (--tool VcfConverter2, SURVEY.md §3.1).

Reference flow (VcfToCommonFormat2Converter.java): per line — chromosome
normalize/validate (F3), multi-ALT skip, FORMAT introspection for AD/DP
(S4, CLCAD2 alias), RGDID/HGVS id parse (X20); per strain — genotype
presence filter (F5), AD parse ('.' → zeros), per-allele CF2 line with
A/C/G/T counts by allele order (A9), allele/read/total depth, same-as-ref
skip (F7), VCF indel padding adjustment (X2, reject missing padding);
rsId backfill from db_snp (J9).

Spark shape: read text → melt strains (posexplode) → filters → column
derivations → optional left join db_snp → CF2 columns. Everything is a
Column expression; the only shuffle is the optional db_snp join (and
that broadcasts when db_snp is dimension-sized per (map_key, chr)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.functions.variant import adjust_for_indels
from rat_strain_loader_pipeline_spark.sources.vcf import (
    format_index,
    gt_field,
    read_vcf_long,
)


def _read_count_for(allele: Column, alleles: Column, counts: Column) -> Column:
    """A9: the AD entry whose allele string matches; 0 when absent.

    ``alleles`` = [ref, alt...] in VCF order == AD order
    (getReadCountForAllele, VcfToCommonFormat2Converter.java:312-319).
    """
    idx = F.array_position(alleles, allele)
    return (
        F.when((idx > 0) & (F.size(counts) >= idx), F.element_at(counts, idx.cast("int")))
        .otherwise(F.lit(0))
        .cast("int")
    )


def vcf_to_cf2(
    spark: SparkSession,
    path: str | None = None,
    db_snp: DataFrame | None = None,
    map_key: int | None = None,
    accession_map: dict[str, str] | None = None,
    process_variants_same_as_ref: bool = False,
    process_missing_addp: bool = False,
    vcf_long: DataFrame | None = None,
) -> DataFrame:
    """Returns long-form CF2 rows + ``strain`` column (write with
    sources.cf2.write_cf2(partition_by_strain=True) for K4 parity).

    ``vcf_long`` bypasses the file scan with an already-melted DataFrame
    carrying (chrom, pos, id, ref, alt, format, strain, gt_data) —
    chromosomes are assumed normalized (apply
    sources.vcf.normalize_chromosome upstream when needed)."""
    vcf = vcf_long if vcf_long is not None else read_vcf_long(spark, path, accession_map)

    # multi-ALT lines skipped by this converter (:183-184)
    vcf = vcf.filter(~F.col("alt").contains(","))

    # F5 genotype presence: first 3 chars of the strain blob (:229-236)
    gt = F.substring(F.col("gt_data"), 1, 3)
    gt1 = F.col("gt_data")  # 1-char genotypes ('0'/'.') compare whole blob
    vcf = vcf.filter(
        ~(
            (gt == "./.")
            | (gt == "0/0")
            | (gt1 == ".")
            | (gt1 == "0")
            | (F.col("gt_data") == "")
            | F.col("gt_data").isNull()
        )
    )

    ad_i = format_index(F.col("format"), "AD")
    dp_i = format_index(F.col("format"), "DP")
    if not process_missing_addp:  # F8
        vcf = vcf.filter((ad_i > 0) & (dp_i > 0))

    ad_raw = gt_field(F.col("gt_data"), ad_i)
    # '.' AD → zeros (:243-247); missing AD with override → fabricated 9s
    counts = (
        F.when(ad_raw.isNull() | (ad_raw == "."),
               F.array(*[F.lit(9 if process_missing_addp else 0)] * 8))
        .otherwise(F.transform(F.split(ad_raw, ","), lambda x: x.cast("int")))
    )
    read_depth = F.aggregate(counts, F.lit(0), lambda a, x: a + F.coalesce(x, F.lit(0)))
    dp_raw = gt_field(F.col("gt_data"), dp_i)
    total_depth = (
        F.when(dp_raw.isNotNull() & (dp_raw != "."), dp_raw.cast("int"))
        .when(F.lit(process_missing_addp), F.lit(9))
        .otherwise(F.lit(0))
    )

    # X20 RGDID/HGVS parse (:201-217)
    rgd_id = F.when(
        F.col("id").startswith("RGDID:") & F.col("id").contains(";"),
        F.regexp_extract("id", r"^RGDID:(\d+);", 1).cast("long"),
    )
    hgvs = F.when(
        F.col("id").startswith("RGDID:") & F.col("id").contains(";"),
        F.regexp_extract("id", r"^RGDID:\d+;(.*)$", 1),
    )

    alleles = F.concat(F.array(F.col("ref")), F.array(F.col("alt")))

    df = vcf.select(
        "chrom", "pos", "id", "ref", "alt", "strain",
        counts.alias("counts"),
        read_depth.alias("read_depth"),
        total_depth.alias("total_depth"),
        rgd_id.alias("rgd_id"),
        hgvs.alias("hgvs_name"),
        alleles.alias("alleles"),
    )

    # per-allele fan-out: [ref, alt] minus same-as-ref unless overridden (F7)
    df = df.withColumn("allele", F.explode("alleles"))
    if not process_variants_same_as_ref:
        df = df.filter(F.col("allele") != F.col("ref"))

    df = df.select(
        "*",
        _read_count_for(F.lit("A"), F.col("alleles"), F.col("counts")).alias("count_a"),
        _read_count_for(F.lit("C"), F.col("alleles"), F.col("counts")).alias("count_c"),
        _read_count_for(F.lit("G"), F.col("alleles"), F.col("counts")).alias("count_g"),
        _read_count_for(F.lit("T"), F.col("alleles"), F.col("counts")).alias("count_t"),
        _read_count_for(F.col("allele"), F.col("alleles"), F.col("counts")).alias("allele_depth"),
        (F.size(F.split(F.col("alt"), ","))).alias("allele_count"),
    )

    # X2 VCF padding-base adjustment; reject indel rows missing the shared
    # leading base (CommonFormat2Line.adjustForIndels returns false)
    len_mismatch = F.length("ref") != F.length("allele")
    shares_first = F.substring("ref", 1, 1) == F.substring("allele", 1, 1)
    proper_indel = (F.length("ref") == 1) | (F.length("allele") == 1)
    df = df.filter(~len_mismatch | (shares_first & proper_indel))

    adj = adjust_for_indels(F.col("pos"), F.col("ref"), F.col("allele"))

    cf2 = df.select(
        F.col("chrom").alias("chr"),
        adj["position"].cast("long").alias("position"),
        adj["ref_nuc"].alias("ref_nuc"),
        adj["var_nuc"].alias("var_nuc"),
        F.when(F.col("id").rlike(r"^rs\d+$"), F.col("id")).alias("rs_id"),
        "count_a", "count_c", "count_g", "count_t",
        F.when(F.col("total_depth") > 0, F.col("total_depth")).alias("total_depth"),
        "hgvs_name",
        F.col("rgd_id"),
        "allele_depth", "allele_count", "read_depth",
        adj["padding_base"].alias("padding_base"),
        "strain",
    )

    # J9 rsId backfill: first db_snp name at (position, chr[, map_key])
    if db_snp is not None:
        snp = db_snp
        if map_key is not None:
            snp = snp.filter(F.col("map_key") == map_key)
        snp = (
            snp.groupBy(
                F.col("position").alias("s_pos"), F.col("chromosome").alias("s_chr")
            )
            .agg(F.min("snp_name").alias("s_name"))
        )
        cf2 = (
            cf2.join(
                F.broadcast(snp),
                (cf2["position"] == snp["s_pos"]) & (cf2["chr"] == snp["s_chr"]),
                "left",
            )
            .withColumn("rs_id", F.coalesce(F.col("rs_id"), F.col("s_name")))
            .drop("s_pos", "s_chr", "s_name")
        )
    return cf2
