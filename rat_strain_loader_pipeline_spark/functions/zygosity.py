"""Zygosity computation (X4 SNV path, X5 indel path).

Semantics recovered from the decompiled ``edu.mcw.rgd.util.Zygosity``
(lib/rgdcore_1.1.3.jar; call sites VariantLoad3.java:317-342, threshold
reuse fixup/ZygosityPercReadFixUp.java:130-138):

- per-allele percent = 100 * count / sum(counts), rounded HALF-UP to int
- ``zygosity_percent_read``: percent of the variant allele
- ``zygosity_num_allele``: number of A/C/G/T with count > 0
- ``zygosity_ref_allele``: 'Y' iff the reference allele's count > 0
- status ladder: 100 → 'homozygous'; >= 85 → 'possibly homozygous';
  else 'heterozygous'
- male/patient (gender M or P) on chr X/Y **outside** the
  pseudo-autosomal region: 100 → 'hemizygous'; >= 85 →
  'probably hemizygous'; else 'possibly hemizygous'; **inside** PAR the
  autosomal ladder applies and ``zygosity_in_pseudo`` = 'Y'
- ``zygosity_poss_error`` = 'Y' iff percent <= 15

Constants: HOMOZYGOUS_PERCENT=100, POSSIBLY_HOMOZYGOUS_PERCENT=85,
PROBABLY_HEMIZYGOUSE_PERCENT=85, POSSIBLE_ERROR_PERCENT=15.

Everything is a pure Column tree — whole-stage-codegen friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

HOMOZYGOUS_PERCENT = 100
POSSIBLY_HOMOZYGOUS_PERCENT = 85
PROBABLY_HEMIZYGOUS_PERCENT = 85
POSSIBLE_ERROR_PERCENT = 15

# Human pseudo-autosomal regions hard-coded in the reference jar's
# PseudoAutosomalRegion (public hg36/hg37 coordinates). map_key 17 =
# human build 36, map_key 38 = human build 37 (RGD assembly keys, see
# FIXTURES.md §3 domain).
PAR_REGIONS: list[tuple[int, str, int, int]] = [
    # (map_key, chr, start, stop)
    (17, "X", 1, 2_709_520),
    (17, "Y", 1, 2_709_520),
    (17, "X", 154_584_238, 154_913_754),
    (17, "Y", 57_443_438, 57_772_954),
    (38, "X", 60_001, 2_699_520),
    (38, "Y", 10_001, 2_649_520),
    (38, "X", 154_931_044, 155_260_560),
    (38, "Y", 59_034_050, 59_363_566),
]


def par_regions_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        PAR_REGIONS, schema="map_key int, chr string, par_start long, par_stop long"
    )


def _round_half_up_pct(num: Column, den: Column) -> Column:
    """round-half-up(100*num/den) as int; NULL when den NULL/0."""
    return (
        F.when(den.isNull() | (den == 0), F.lit(None))
        .otherwise(F.floor(F.lit(100.0) * num / den + F.lit(0.5)))
        .cast("int")
    )


def _status_ladder(percent: Column, hemizygous_path: Column) -> Column:
    """The two status ladders selected by ``hemizygous_path``."""
    return (
        F.when(
            hemizygous_path,
            F.when(percent >= HOMOZYGOUS_PERCENT, F.lit("hemizygous"))
            .when(percent >= PROBABLY_HEMIZYGOUS_PERCENT, F.lit("probably hemizygous"))
            .otherwise(F.lit("possibly hemizygous")),
        )
        .otherwise(
            F.when(percent >= HOMOZYGOUS_PERCENT, F.lit("homozygous"))
            .when(percent >= POSSIBLY_HOMOZYGOUS_PERCENT, F.lit("possibly homozygous"))
            .otherwise(F.lit("heterozygous"))
        )
    )


def zygosity_snv(
    ref_nuc: Column,
    var_nuc: Column,
    count_a: Column,
    count_c: Column,
    count_g: Column,
    count_t: Column,
    gender: Column,
    chromosome: Column,
    in_par: Column,
) -> dict[str, Column]:
    """SNV zygosity from per-base read counts (X4).

    ``in_par`` is a boolean column (variant position inside a PAR for
    its assembly — compute via an interval join against
    :func:`par_regions_df`, or pass ``F.lit(False)`` when no sex
    chromosomes are in play).

    Returns dict of columns: zygosity_status, zygosity_percent_read,
    zygosity_num_allele, zygosity_ref_allele, zygosity_poss_error,
    zygosity_in_pseudo.
    """
    a = F.coalesce(count_a, F.lit(0)).cast("long")
    c = F.coalesce(count_c, F.lit(0)).cast("long")
    g = F.coalesce(count_g, F.lit(0)).cast("long")
    t = F.coalesce(count_t, F.lit(0)).cast("long")
    total = a + c + g + t

    var_u = F.upper(var_nuc)
    ref_u = F.upper(ref_nuc)
    count_of = lambda nuc: (  # noqa: E731
        F.when(nuc == "A", a).when(nuc == "C", c).when(nuc == "G", g).when(nuc == "T", t).otherwise(F.lit(0))
    )
    var_count = count_of(var_u)
    ref_count = count_of(ref_u)

    percent = _round_half_up_pct(var_count, total)
    num_allele = (
        (a > 0).cast("int") + (c > 0).cast("int") + (g > 0).cast("int") + (t > 0).cast("int")
    )

    is_sex_chr = F.upper(chromosome).isin("X", "Y")
    is_male = F.upper(F.coalesce(gender, F.lit(""))).isin("M", "P")
    hemi = is_sex_chr & is_male & ~in_par

    return {
        "zygosity_status": _status_ladder(percent, hemi),
        "zygosity_percent_read": percent,
        "zygosity_num_allele": num_allele.cast("int"),
        "zygosity_ref_allele": F.when(ref_count > 0, F.lit("Y")).otherwise(F.lit("N")),
        "zygosity_poss_error": F.when(
            percent.isNotNull() & (percent <= POSSIBLE_ERROR_PERCENT), F.lit("Y")
        ).otherwise(F.lit("N")),
        "zygosity_in_pseudo": F.when(is_sex_chr & is_male & in_par, F.lit("Y")).otherwise(F.lit("N")),
    }


def zygosity_indel(
    allele_depth: Column,
    read_depth: Column,
    ref_nuc: Column,
    count_a: Column,
    count_c: Column,
    count_g: Column,
    count_t: Column,
    gender: Column,
    chromosome: Column,
    in_par: Column,
) -> dict[str, Column]:
    """Indel zygosity: percent = 100*allele_depth/read_depth (X5).

    Same status ladder; ``score`` (percent) of 0 marks a bad variant
    (dropped upstream by filter F9, VariantLoad3.java:338-346).
    ``zygosity_ref_allele`` falls back to the matching ACGT count when
    ref is a single base, else 'N' (decompiled
    computeZygosityStatus(int,int,...)).
    """
    ad = F.coalesce(allele_depth, F.lit(0)).cast("long")
    rd = read_depth.cast("long")
    percent = _round_half_up_pct(ad, rd)

    a = F.coalesce(count_a, F.lit(0)).cast("long")
    c = F.coalesce(count_c, F.lit(0)).cast("long")
    g = F.coalesce(count_g, F.lit(0)).cast("long")
    t = F.coalesce(count_t, F.lit(0)).cast("long")
    ref_u = F.upper(ref_nuc)
    ref_count = (
        F.when(ref_u == "A", a).when(ref_u == "C", c).when(ref_u == "G", g).when(ref_u == "T", t).otherwise(F.lit(0))
    )

    is_sex_chr = F.upper(chromosome).isin("X", "Y")
    is_male = F.upper(F.coalesce(gender, F.lit(""))).isin("M", "P")
    hemi = is_sex_chr & is_male & ~in_par

    num_allele = (
        (a > 0).cast("int") + (c > 0).cast("int") + (g > 0).cast("int") + (t > 0).cast("int")
    )

    return {
        "zygosity_status": _status_ladder(percent, hemi),
        "zygosity_percent_read": percent,
        "zygosity_num_allele": num_allele.cast("int"),
        "zygosity_ref_allele": F.when(ref_count > 0, F.lit("Y")).otherwise(F.lit("N")),
        "zygosity_poss_error": F.when(
            percent.isNotNull() & (percent <= POSSIBLE_ERROR_PERCENT), F.lit("Y")
        ).otherwise(F.lit("N")),
        "zygosity_in_pseudo": F.when(is_sex_chr & is_male & in_par, F.lit("Y")).otherwise(F.lit("N")),
    }
