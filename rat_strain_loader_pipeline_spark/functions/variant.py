"""Variant-level derivations: type, end position, depth, quality.

Reference semantics (SURVEY.md §2.7):
- X1 variant type:   VariantLoad3.java:668-680 / fixup/VariantTypeFixUp.java:47-63
- X3 end position:   VariantLoad3.java:299-315
- A5 total depth:    VariantLoad3.java:260-268
- A6 quality score:  VariantLoad3.java:270-274 (integer half-up via the
                     classic (100*rd + td/2) / td trick, all int division)

All are pure Column expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def variant_type(ref_nuc: Column, var_nuc: Column) -> Column:
    """'ins' when ref is empty/NULL, 'del' when var is empty/NULL, else 'snv'.

    CF2 rows arrive indel-adjusted (padding base stripped,
    convert/CommonFormat2Line.java:54-90), so an insertion has NULL
    ref_nuc and a deletion has NULL var_nuc (VariantLoad3.java:668-680).
    The fixup variant (VariantTypeFixUp.java:47-63) additionally treats
    '-' as empty and length differences as ins/del; we fold that in so
    the derivation is idempotent on already-loaded rows.
    """
    ref = F.when(ref_nuc.isNull() | (ref_nuc == "") | (ref_nuc == "-"), F.lit(None)).otherwise(ref_nuc)
    var = F.when(var_nuc.isNull() | (var_nuc == "") | (var_nuc == "-"), F.lit(None)).otherwise(var_nuc)
    return (
        F.when(ref.isNull(), F.lit("ins"))
        .when(var.isNull(), F.lit("del"))
        .when(F.length(ref) < F.length(var), F.lit("ins"))
        .when(F.length(ref) > F.length(var), F.lit("del"))
        .otherwise(F.lit("snv"))
    )


def end_pos(start_pos: Column, ref_nuc: Column, vtype: Column) -> Column:
    """snv: start+1; insertion: start; deletion: start+len(ref).

    VariantLoad3.java:299-315.
    """
    return (
        F.when(vtype == "ins", start_pos)
        .when(vtype == "del", start_pos + F.length(F.coalesce(ref_nuc, F.lit(""))))
        .otherwise(start_pos + F.lit(1))
    )


def total_depth_derived(
    total_depth: Column,
    count_a: Column,
    count_c: Column,
    count_g: Column,
    count_t: Column,
    read_depth: Column,
    vtype: Column,
) -> Column:
    """When total_depth is missing: snv → A+C+G+T, indel → read_depth.

    VariantLoad3.java:260-268.
    """
    acgt_sum = (
        F.coalesce(count_a, F.lit(0))
        + F.coalesce(count_c, F.lit(0))
        + F.coalesce(count_g, F.lit(0))
        + F.coalesce(count_t, F.lit(0))
    )
    return F.coalesce(
        total_depth,
        F.when(vtype == "snv", acgt_sum).otherwise(read_depth),
    ).cast("int")


def quality_score(read_depth: Column, total_depth: Column) -> Column:
    """Integer-arithmetic half-up percent: (100*rd + td/2) / td, all int div.

    VariantLoad3.java:270-274. NULL when total_depth is NULL or 0.
    """
    rd = read_depth.cast("long")
    td = total_depth.cast("long")
    return (
        F.when(td.isNull() | (td == 0), F.lit(None))
        .otherwise(F.floor((F.lit(100) * rd + F.floor(td / 2)) / td))
        .cast("int")
    )


def adjust_for_indels(
    pos: Column, ref: Column, alt: Column
) -> dict[str, Column]:
    """VCF-style shared-leading-base adjustment (X2).

    convert/CommonFormat2Line.java:54-90: for ``G→GT`` (insertion) strip
    the shared leading base into padding_base, bump position by 1 and
    NULL the ref; for ``GT→G`` (deletion) symmetric. Plain SNV/MNV rows
    pass through unchanged with NULL padding.

    Returns a dict of columns: position, ref_nuc, var_nuc, padding_base.
    ``ref_nuc``/``var_nuc`` become NULL (not '') on the stripped side.
    """
    is_ins = (F.length(ref) < F.length(alt)) & (F.substring(alt, 1, 1) == F.substring(ref, 1, 1)) & (F.length(ref) == 1)
    is_del = (F.length(ref) > F.length(alt)) & (F.substring(alt, 1, 1) == F.substring(ref, 1, 1)) & (F.length(alt) == 1)
    return {
        "position": F.when(is_ins | is_del, pos + 1).otherwise(pos),
        "ref_nuc": (
            F.when(is_ins, F.lit(None).cast("string"))
            .when(is_del, F.substring(ref, 2, 1_000_000))
            .otherwise(ref)
        ),
        "var_nuc": (
            F.when(is_del, F.lit(None).cast("string"))
            .when(is_ins, F.substring(alt, 2, 1_000_000))
            .otherwise(alt)
        ),
        "padding_base": F.when(is_ins | is_del, F.substring(ref, 1, 1)).otherwise(F.lit(None).cast("string")),
    }
