"""Full-chain integration: VCF text → CF2 → derive → load → store →
post-process → VARIANT_TRANSCRIPT — the complete reference workflow
(clinvar.sh STAGE2→STAGE4) through the engine's public API, landing in
and reloading from the partitioned parquet store between stages like
the reference lands in Oracle tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_consequence import SEQS

VCF = """##fileformat=VCFv4.1
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tBN
1\t8\trs8\tA\tG\t50\tPASS\tDP=60\tGT:AD:DP\t0/1:30,30:60
1\t14\t.\tG\tC\t99\tPASS\t.\tGT:AD:DP\t1/1:0,40:40
"""


def test_vcf_to_variant_transcript_full_chain(spark, tmp_path):
    from rat_strain_loader_pipeline_spark.pipelines.convert import vcf_to_cf2
    from rat_strain_loader_pipeline_spark.pipelines.load import (
        derive_variants,
        load_variants,
    )
    from rat_strain_loader_pipeline_spark.pipelines.postprocess import (
        postprocess_variants,
    )
    from rat_strain_loader_pipeline_spark.store import read_table, write_load_result

    # STAGE2: VCF → CF2
    vcf_path = tmp_path / "in.vcf"
    vcf_path.write_text(VCF)
    cf2 = vcf_to_cf2(spark, str(vcf_path))
    assert cf2.count() == 2

    # STAGE3: CF2 → derivations → upsert-load into the store
    genes = spark.createDataFrame(
        [(100, "1", 4, 24, "+", "ACTIVE", 360)],
        "gene_rgd_id int, chromosome string, start_pos long, stop_pos long, "
        "strand string, object_status string, map_key int",
    )
    derived = derive_variants(
        cf2.drop("strain"), sample_id=7, gender="F", map_key=360, genes=genes
    )
    empty_var = spark.createDataFrame(
        [],
        "rgd_id long, chromosome string, start_pos long, end_pos long, "
        "ref_nuc string, var_nuc string, variant_type string",
    )
    empty_detail = spark.createDataFrame([], "rgd_id long, sample_id int")
    res = load_variants(derived, empty_var, empty_var, empty_detail)
    assert res.counters["rows_new_variants"] == 2

    root = str(tmp_path / "store")
    write_load_result(res, root, map_key=360)

    # both variants are genic (inside the fixture gene) and zygosity kept
    vmd = read_table(spark, root, "variant_map_data", map_key=360, chromosome="1")
    assert {r["genic_status"] for r in vmd.collect()} == {"GENIC"}

    # STAGE4: store → consequence post-processing → VT
    store_variants = (
        read_table(spark, root, "variant").join(
            vmd.select("rgd_id", "chromosome", "start_pos", "end_pos"), "rgd_id"
        )
    ).select("rgd_id", "chromosome", "start_pos", "end_pos", "ref_nuc", "var_nuc")
    transcripts = spark.createDataFrame(
        [(200, 100, "N")],
        "transcript_rgd_id int, gene_rgd_id int, is_non_coding_ind string",
    )
    features = spark.createDataFrame(
        [
            (200, "EXONS", "+", "1", 4, 12, 360),
            (200, "EXONS", "+", "1", 16, 24, 360),
            (200, "5UTRS", "+", "1", 4, 6, 360),
            (200, "3UTRS", "+", "1", 22, 24, 360),
        ],
        "transcript_rgd_id int, object_name string, strand string, "
        "chromosome string, start_pos long, stop_pos long, map_key int",
    )
    fb = spark.sparkContext.broadcast(SEQS)
    pp = postprocess_variants(store_variants, genes, transcripts, features, fb, 360)

    by_pos = {}
    for r in pp.variant_transcript.collect():
        v = vmd.filter(F.col("rgd_id") == r["variant_rgd_id"]).first()
        by_pos[v["start_pos"]] = r
    assert set(by_pos) == {8, 14}
    # pos 8: CAA→CGA, Q→R nonsynonymous in the fixture CDS
    assert by_pos[8]["ref_aa"] == "Q" and by_pos[8]["var_aa"] == "R"
    assert by_pos[8]["syn_status"] == "nonsynonymous"
    # pos 14: intron of the fixture transcript
    assert by_pos[14]["location_name"] == "INTRON"
