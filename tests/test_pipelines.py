"""End-to-end pipeline tests: VCF→CF2 conversion, CF2→store load, fixups."""

from __future__ import annotations

from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.pipelines.convert import vcf_to_cf2
from rat_strain_loader_pipeline_spark.pipelines.fixups import (
    frameshift_fixup,
    genic_status_fixup,
    num_alleles_fixup,
    variant_type_fixup,
    zygosity_poss_error_fixup,
)
from rat_strain_loader_pipeline_spark.pipelines.load import (
    derive_variants,
    load_variants,
)
from rat_strain_loader_pipeline_spark.schemas import CF2_SCHEMA

VCF_TEXT = """##fileformat=VCFv4.1
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tBN\tSHR
1\t100\trs7\tG\tA\t50\tPASS\tDP=60\tGT:AD:DP\t0/1:30,30:60\t./.
1\t150\t.\tG\tGT\t99\tPASS\t.\tGT:AD:DP\t1/1:0,40:40\t0/0
1\t180\t.\tGA\tG\t99\tPASS\t.\tGT:AD:DP\t1/1:0,35:35\t0/0
1\t200\t.\tA\tT,C\t99\tPASS\t.\tGT:AD:DP\t1/2:0,20,20:40\t0/1:10,5,5:20
1\t300\tRGDID:8650299;NM_1:c.27C>T\tC\tT\t99\tPASS\t.\tGT:AD:DP\t0/1:5,15:20\t0/0
1\t400\t.\tA\tT\t99\tPASS\t.\tGT:GQ\t0/1:99\t0/1:99
"""


def test_vcf_to_cf2(spark, tmp_path):
    p = tmp_path / "in.vcf"
    p.write_text(VCF_TEXT)
    cf2 = vcf_to_cf2(spark, str(p))
    rows = {(r["position"], r["strain"]): r for r in cf2.collect()}

    # site 100: BN only (SHR ./. filtered), snv
    r = rows[(100, "BN")]
    assert r["ref_nuc"] == "G" and r["var_nuc"] == "A"
    assert r["count_a"] == 30 and r["count_g"] == 30
    assert r["allele_depth"] == 30 and r["read_depth"] == 60 and r["total_depth"] == 60
    assert r["rs_id"] == "rs7"

    # site 150: insertion G→GT: padding stripped, pos+1, ref NULL
    r = rows[(151, "BN")]
    assert r["ref_nuc"] is None and r["var_nuc"] == "T" and r["padding_base"] == "G"

    # site 180: deletion GA→G: pos+1, var NULL, ref 'A'
    r = rows[(181, "BN")]
    assert r["var_nuc"] is None and r["ref_nuc"] == "A" and r["padding_base"] == "G"

    # site 200: multi-ALT line skipped entirely
    assert not any(pos == 200 for pos, _ in rows)

    # site 300: RGDID/HGVS parsed
    r = rows[(300, "BN")]
    assert r["rgd_id"] == 8650299 and r["hgvs_name"] == "NM_1:c.27C>T"

    # site 400: AD/DP missing → dropped (F8)
    assert not any(pos == 400 for pos, _ in rows)

    # (150, SHR) 0/0 filtered; site 100 SHR filtered
    assert ("SHR" not in {s for (_, s) in rows})


def _cf2_rows(spark):
    rows = [
        # snv: var C 90% → possibly homozygous
        ("1", 1000, "A", "C", None, 10, 90, 0, 0, 100, None, 0, 90, 1, 100, None),
        # duplicate of above with case flip (same natural key after upper)
        ("1", 1000, "a", "c", None, 10, 90, 0, 0, 100, None, 0, 90, 1, 100, None),
        # insertion with padding: percent 100*40/40
        ("1", 2000, None, "TT", None, None, None, None, None, None, None, 0, 40, 1, 40, "G"),
        # zero allele depth indel → F9 drop
        ("1", 3000, None, "G", None, None, None, None, None, None, None, 0, 0, 1, 50, "A"),
        # invalid allele chars → F6 drop
        ("1", 4000, "QQ", "C", None, 1, 1, 0, 0, 2, None, 0, 1, 1, 2, None),
    ]
    return spark.createDataFrame(rows, schema=CF2_SCHEMA)


def _genes(spark):
    return spark.createDataFrame(
        [(1, "1", 900, 1500, "+", "ACTIVE", 360), (2, "1", 5000, 6000, "+", "NON-ACTIVE", 360)],
        "gene_rgd_id int, chromosome string, start_pos long, stop_pos long, strand string, object_status string, map_key int",
    )


def test_derive_and_load_fresh_store(spark):
    derived = derive_variants(
        _cf2_rows(spark), sample_id=7, gender="F", map_key=360, genes=_genes(spark)
    )
    rows = {r["start_pos"]: r for r in derived.collect()}
    # F6 dropped 4000, F9 dropped 3000; duplicates at 1000 both present pre-upsert
    assert set(rows) == {1000, 2000}
    assert rows[1000]["genic_status"] == "GENIC"
    assert rows[2000]["genic_status"] == "INTERGENIC"
    assert rows[1000]["zygosity_status"] == "possibly homozygous"
    assert rows[1000]["zygosity_percent_read"] == 90
    assert rows[2000]["zygosity_status"] == "homozygous"
    assert rows[2000]["variant_type"] == "ins"
    assert rows[2000]["end_pos"] == 2000

    empty_var = spark.createDataFrame(
        [],
        "rgd_id long, chromosome string, start_pos long, end_pos long, ref_nuc string, var_nuc string, variant_type string",
    )
    empty_detail = spark.createDataFrame([], "rgd_id long, sample_id int")
    res = load_variants(derived, empty_var, empty_var, empty_detail)
    variants = res.variant.collect()
    # case-flipped duplicate collapses to ONE id; store gets upper-cased
    assert len(variants) == 2
    assert {v["ref_nuc"] for v in variants} == {"A", None}
    details = res.variant_sample_detail.collect()
    assert len(details) == 2
    assert res.counters["rows_new_variants"] == 2


def test_load_upsert_against_existing(spark):
    derived = derive_variants(
        _cf2_rows(spark), sample_id=7, gender="F", map_key=360, genes=_genes(spark)
    )
    existing_var = spark.createDataFrame(
        [(555, "1", 1000, 1001, "A", "C", "snv")],
        "rgd_id long, chromosome string, start_pos long, end_pos long, ref_nuc string, var_nuc string, variant_type string",
    )
    existing_detail = spark.createDataFrame([(555, 7)], "rgd_id long, sample_id int")
    res = load_variants(derived, existing_var, existing_var, existing_detail)
    # snv matched existing id 555 → not new; only the insertion is new
    assert res.counters["rows_new_variants"] == 1
    new_ids = [r["rgd_id"] for r in res.variant.collect()]
    assert new_ids == [556]  # max(555)+1 deterministic
    # sample detail for 555 already exists for sample 7 → anti-joined away
    detail_ids = {r["rgd_id"] for r in res.variant_sample_detail.collect()}
    assert detail_ids == {556}


def test_fixups_idempotent(spark):
    variant = spark.createDataFrame(
        [
            (1, "A", "snv", "T"),
            (2, None, "snv", "TT"),   # wrong: should be ins
            (3, "ACG", "del", None),
        ],
        "rgd_id long, ref_nuc string, variant_type string, var_nuc string",
    )
    fixed, counters = variant_type_fixup(variant)
    assert counters["rows_fixed"] == 1
    types = {r["rgd_id"]: r["variant_type"] for r in fixed.collect()}
    assert types == {1: "snv", 2: "ins", 3: "del"}
    # idempotence: second run fixes nothing
    _, counters2 = variant_type_fixup(fixed)
    assert counters2["rows_fixed"] == 0


def test_frameshift_fixup_corrects_truncation_quirk(spark):
    vt = spark.createDataFrame(
        [(10, 100, "Q", "R", "F"), (11, 100, None, None, None)],
        "variant_rgd_id long, transcript_rgd_id int, ref_aa string, var_aa string, frameshift string",
    )
    variant = spark.createDataFrame(
        [(10, None, "GG"), (11, "A", "T")],
        "rgd_id long, ref_nuc string, var_nuc string",
    )
    fixed, counters = frameshift_fixup(vt, variant)
    out = {r["variant_rgd_id"]: r["frameshift"] for r in fixed.collect()}
    assert out[10] == "T"  # 2-bp insertion IS a frameshift
    assert out[11] is None  # location-only rows untouched
    assert counters["rows_fixed"] == 1
    _, c2 = frameshift_fixup(fixed, variant)
    assert c2["rows_fixed"] == 0


def test_genic_status_and_poss_error_fixups(spark):
    vmd = spark.createDataFrame(
        [(1, "1", 1000, 1001, None, "INTERGENIC", 360), (2, "1", 7000, 7001, None, "GENIC", 360)],
        "rgd_id long, chromosome string, start_pos long, end_pos long, padding_base string, genic_status string, map_key int",
    )
    fixed, counters = genic_status_fixup(vmd, _genes(spark))
    out = {r["rgd_id"]: r["genic_status"] for r in fixed.collect()}
    assert out == {1: "GENIC", 2: "INTERGENIC"}  # both were wrong
    assert counters["rows_fixed"] == 2

    vsd = spark.createDataFrame(
        [(1, 7, 15, "N"), (2, 7, 16, "Y"), (3, 7, None, "N")],
        "rgd_id long, sample_id int, zygosity_percent_read int, zygosity_poss_error string",
    )
    fixed2, c2 = zygosity_poss_error_fixup(vsd)
    out2 = {r["rgd_id"]: r["zygosity_poss_error"] for r in fixed2.collect()}
    assert out2 == {1: "Y", 2: "N", 3: "N"}
    assert c2["rows_fixed"] == 2


def test_num_alleles_fixup(spark):
    vmd = spark.createDataFrame(
        [(1, "1", 1000, 1001, None, "GENIC", 360), (2, "1", 1000, 1001, None, "GENIC", 360)],
        "rgd_id long, chromosome string, start_pos long, end_pos long, padding_base string, genic_status string, map_key int",
    )
    vsd = spark.createDataFrame(
        [(1, 7, "Y", 1), (2, 7, "N", 1)],
        "rgd_id long, sample_id int, zygosity_ref_allele string, zygosity_num_allele int",
    )
    fixed, counters = num_alleles_fixup(vsd, vmd)
    out = {r["rgd_id"]: r["zygosity_num_allele"] for r in fixed.collect()}
    # 2 variants at same position + ref seen → 3 alleles
    assert out == {1: 3, 2: 3}
    assert counters["rows_fixed"] == 2


def test_derive_variants_multi_equals_per_sample(spark):
    """The one-job multi-sample path must produce exactly the union of
    per-sample runs — including gender-divergent hemizygous calls on X
    and PAR handling from the per-sample map_key."""
    from rat_strain_loader_pipeline_spark.functions.zygosity import par_regions_df
    from rat_strain_loader_pipeline_spark.pipelines.load import derive_variants_multi

    rows = [
        # X-chromosome snv, 90%: M → probably hemizygous, F → possibly homozygous
        ("X", 1000, "A", "C", None, 10, 90, 0, 0, 100, None, 0, 90, 1, 100, None),
        # autosomal snv 100%
        ("1", 1200, "G", "T", None, 0, 0, 0, 50, 50, None, 0, 50, 1, 50, None),
        # insertion 100%
        ("1", 2000, None, "TT", None, None, None, None, None, None, None, 0, 40, 1, 40, "G"),
    ]
    cf2 = spark.createDataFrame(rows, schema=CF2_SCHEMA)
    genes = _genes(spark)
    par = par_regions_df(spark)

    singles = []
    for sid, gender, mk in ((7, "M", 38), (8, "F", 360)):
        singles.append(
            derive_variants(
                cf2, sample_id=sid, gender=gender, map_key=mk,
                genes=genes, par_regions=par,
            )
        )
    expected = singles[0].unionByName(singles[1])

    multi_cf2 = cf2.withColumn("sample_id", F.lit(7)).unionByName(
        cf2.withColumn("sample_id", F.lit(8))
    )
    samples = spark.createDataFrame(
        [(7, "M", 38), (8, "F", 360)], "sample_id int, gender string, map_key int"
    )
    got = derive_variants_multi(multi_cf2, samples, genes=genes, par_regions=par)

    cols = sorted(expected.columns)
    assert sorted(got.columns) == cols
    e = sorted(tuple(r) for r in expected.select(*cols).collect())
    g = sorted(tuple(r) for r in got.select(*cols).collect())
    assert e == g
    # gender divergence actually exercised
    st = {(r["sample_id"], r["start_pos"]): r["zygosity_status"] for r in got.collect()}
    assert st[(7, 1000)] == "probably hemizygous"
    assert st[(8, 1000)] == "possibly homozygous"
