"""Manager-analog CLI smoke tests: the reference's shell workflow
(Manager.java --tool dispatch) driven end-to-end through cli.main() —
convert → load → fixups → post-process → polyphen export, plus the
conservation loader, on tiny fixture inputs.
"""

from __future__ import annotations

import pytest

from rat_strain_loader_pipeline_spark import cli
from tests.test_consequence import SEQS

VCF = """##fileformat=VCFv4.1
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tBN
1\t8\trs8\tA\tG\t50\tPASS\tDP=60\tGT:AD:DP\t0/1:30,30:60
1\t14\t.\tG\tC\t99\tPASS\t.\tGT:AD:DP\t1/1:0,40:40
"""

WIG = """fixedStep chrom=chr1 start=5 step=1
0.5
0.75
"""


def test_usage_and_unknown_tool(capsys):
    assert cli.main([]) == 1
    assert "tool suite usage" in capsys.readouterr().out
    assert cli.main(["--tool", "NoSuchTool"]) == 1


@pytest.fixture(scope="module")
def dims_root(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("dims")
    spark.createDataFrame(
        [(100, "1", 4, 24, "+", "ACTIVE", 360)],
        "gene_rgd_id int, chromosome string, start_pos long, stop_pos long, "
        "strand string, object_status string, map_key int",
    ).write.parquet(str(root / "genes.parquet"))
    spark.createDataFrame(
        [(200, 100, "N", "NP_001")],
        "transcript_rgd_id int, gene_rgd_id int, is_non_coding_ind string, "
        "protein_acc_id string",
    ).write.parquet(str(root / "transcripts.parquet"))
    spark.createDataFrame(
        [
            (200, "EXONS", "+", "1", 4, 12, 360),
            (200, "EXONS", "+", "1", 16, 24, 360),
        ],
        "transcript_rgd_id int, object_name string, strand string, "
        "chromosome string, start_pos long, stop_pos long, map_key int",
    ).write.parquet(str(root / "features.parquet"))
    return str(root)


def test_cli_full_chain(spark, tmp_path, dims_root, capsys):
    vcf = tmp_path / "in.vcf"
    vcf.write_text(VCF)
    cf2_dir = tmp_path / "cf2"
    store = str(tmp_path / "store")

    # STAGE2: VcfConverter2
    assert cli.main([
        "--tool", "VcfConverter2", "--vcfFile", str(vcf), "--outDir", str(cf2_dir),
        "--mapKey", "360",
    ]) == 0
    assert "rows=2" in capsys.readouterr().out

    # STAGE3: VariantLoad3 into a fresh store
    assert cli.main([
        "--tool", "VariantLoad3", "-s", "7", "-i", str(cf2_dir / "strain=BN"),
        "--store", store, "--dims", dims_root, "--mapKey", "360",
    ]) == 0
    assert "rows_new_variants=2" in capsys.readouterr().out

    # rerun is a pure upsert: no new variants on identical input
    assert cli.main([
        "--tool", "VariantLoad3", "-s", "8", "-i", str(cf2_dir / "strain=BN"),
        "--store", store, "--dims", dims_root, "--mapKey", "360",
    ]) == 0
    assert "rows_new_variants=0" in capsys.readouterr().out

    # fixups are idempotent recomputes over the store
    assert cli.main(["--tool", "VariantTypeFixUp", "--store", store]) == 0
    assert "rows_fixed=0" in capsys.readouterr().out
    assert cli.main([
        "--tool", "GenicStatusFixUp", "--store", store, "--dims", dims_root,
    ]) == 0
    assert "rows_fixed=0" in capsys.readouterr().out

    # STAGE4: VariantPostProcessing from a FASTA file
    fasta = tmp_path / "g.fa"
    fasta.write_text("".join(f">{c}\n{s}\n" for c, s in SEQS.items()))
    assert cli.main([
        "--tool", "VariantPostProcessing", "--fastaFile", str(fasta),
        "--store", store, "--dims", dims_root, "--mapKey", "360",
    ]) == 0
    assert "variant_transcript_rows=2" in capsys.readouterr().out

    assert cli.main(["--tool", "FrameShiftFixUp", "--store", store]) == 0
    assert "rows_total=2" in capsys.readouterr().out

    # Polyphen export over the store (the pos-8 A>G Q→R row qualifies)
    pp_out = tmp_path / "pp"
    assert cli.main([
        "--tool", "Polyphen", "--outDir", str(pp_out), "--store", store,
        "--dims", dims_root,
    ]) == 0
    assert "candidates=1" in capsys.readouterr().out
    [line] = [
        ln for f in pp_out.glob("part-*.txt") for ln in f.read_text().splitlines()
    ]
    assert line == "NP_001 2 Q R"


def test_cli_conservation(spark, tmp_path, capsys):
    wig = tmp_path / "c.wig"
    wig.write_text(WIG)
    store = str(tmp_path / "store")
    assert cli.main([
        "--tool", "ConservationScore", "--fileName", str(wig), "--store", store,
    ]) == 0
    assert "rows=2" in capsys.readouterr().out
    got = sorted(
        map(tuple, spark.read.parquet(f"{store}/conservation_score").collect())
    )
    assert got == [(5, "1", 0.5), (6, "1", 0.75)]
