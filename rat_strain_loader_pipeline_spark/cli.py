"""Manager-analog CLI: ``--tool <Name>`` dispatch over the Spark
pipelines, tool-for-tool with the reference suite (Manager.java:30-91).

Every tool name the reference dispatches resolves here to the
corresponding pipeline on the parquet store:

    python -m rat_strain_loader_pipeline_spark.cli --tool VcfConverter2 \
        --vcfFile in.vcf --outDir out/

Store-table inputs that the reference reads from Oracle (genes,
transcripts, features, proteins, db_snp) come from a ``--dims`` parquet
root; variant-cycle tables live under ``--store``. Flags mirror the
reference's names (``--vcfFile``, ``--sampleId``, ``--outDir``, ...)
so existing run scripts translate 1:1.
"""

from __future__ import annotations

import argparse
import sys

TOOLS = {}


def tool(name):
    def reg(fn):
        TOOLS[name] = fn
        return fn

    return reg


def _spark(app: str):
    from rat_strain_loader_pipeline_spark.session import get_spark

    return get_spark(f"cli-{app}")


def _dims(spark, root: str, table: str):
    return spark.read.parquet(f"{root.rstrip('/')}/{table}.parquet")


def _store_or_empty(spark, root: str, table: str, schema, **filters):
    from pyspark.sql.utils import AnalysisException

    from rat_strain_loader_pipeline_spark.store import read_table

    try:
        return read_table(spark, root, table, **filters)
    except AnalysisException:
        return spark.createDataFrame([], schema)


def _write_lines(df, path: str) -> None:
    df.coalesce(1).write.mode("overwrite").text(path)


# ---------------------------------------------------------------- converters

@tool("VcfConverter2")
def vcf_converter2(argv):
    p = argparse.ArgumentParser(prog="VcfConverter2")
    p.add_argument("--vcfFile", required=True)
    p.add_argument("--outDir", required=True)
    p.add_argument("--mapKey", type=int, default=70)
    p.add_argument("--processVariantsSameAsRef", action="store_true")
    p.add_argument("--compressOutputFile", action="store_true")
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.convert import vcf_to_cf2
    from rat_strain_loader_pipeline_spark.sources.cf2 import read_cf2, write_cf2

    spark = _spark("vcf-convert")
    out = vcf_to_cf2(
        spark, a.vcfFile, map_key=a.mapKey,
        process_variants_same_as_ref=a.processVariantsSameAsRef,
    )
    write_cf2(out, a.outDir, partition_by_strain=True,
              compression="gzip" if a.compressOutputFile else "none")
    n = read_cf2(spark, a.outDir).count()  # count the landed files, not a re-run
    print(f"rows={n} outDir={a.outDir}")


@tool("Vcf8ColConverter2")
def vcf8_converter2(argv):
    p = argparse.ArgumentParser(prog="Vcf8ColConverter2")
    p.add_argument("--vcfFile", action="append", required=True)
    p.add_argument("--outFile", required=True)
    p.add_argument("--mapKey", type=int, default=70)
    p.add_argument("--processVariantsSameAsRef", action="store_true")
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.sideloaders import vcf8_to_cf2
    from rat_strain_loader_pipeline_spark.sources.cf2 import read_cf2, write_cf2

    spark = _spark("vcf8-convert")
    out = None
    for f in a.vcfFile:
        df = vcf8_to_cf2(spark, f, process_variants_same_as_ref=a.processVariantsSameAsRef)
        out = df if out is None else out.unionByName(df)
    write_cf2(out, a.outFile, compression="none")
    n = read_cf2(spark, a.outFile).count()
    print(f"rows={n} outFile={a.outFile}")


# ---------------------------------------------------------------- load cycle

@tool("VariantLoad3")
def variant_load3(argv):
    p = argparse.ArgumentParser(prog="VariantLoad3")
    p.add_argument("--sampleId", "-s", action="append", required=True, type=int)
    p.add_argument("--inputFile", "-i", action="append", required=True)
    p.add_argument("--store", required=True)
    p.add_argument("--dims")  # optional genes dimension for genic status
    p.add_argument("--mapKey", type=int, default=70)
    p.add_argument("--gender", default="F")
    p.add_argument("--verifyIfInRgd", "-v", action="store_true")
    a = p.parse_args(argv)
    if len(a.sampleId) != len(a.inputFile):
        p.error("need matching -s/-i pairs")
    from rat_strain_loader_pipeline_spark.pipelines.load import (
        derive_variants, load_variants,
    )
    from rat_strain_loader_pipeline_spark.schemas import (
        VARIANT_MAP_DATA_SCHEMA, VARIANT_SAMPLE_DETAIL_SCHEMA, VARIANT_SCHEMA,
    )
    from rat_strain_loader_pipeline_spark.sources.cf2 import read_cf2
    from rat_strain_loader_pipeline_spark.store import write_load_result

    spark = _spark("variant-load3")
    genes = _dims(spark, a.dims, "genes") if a.dims else None
    derived = None
    for sid, path in zip(a.sampleId, a.inputFile):
        d = derive_variants(read_cf2(spark, path), sid, a.gender, a.mapKey, genes=genes)
        derived = d if derived is None else derived.unionByName(d)
    v = _store_or_empty(spark, a.store, "variant", VARIANT_SCHEMA)
    # positions only collide within ONE assembly: probe THIS map_key's
    # map data, or a same-key row from another assembly suppresses the
    # map-data insert for this one
    existing_md = _store_or_empty(
        spark, a.store, "variant_map_data", VARIANT_MAP_DATA_SCHEMA, map_key=a.mapKey
    )
    existing_sd = _store_or_empty(
        spark, a.store, "variant_sample_detail", VARIANT_SAMPLE_DETAIL_SCHEMA
    )
    # the upsert probes the NATURAL key — pass the variant⋈map projection
    existing_v = v.join(
        existing_md.select("rgd_id", "chromosome", "start_pos", "end_pos"), "rgd_id"
    ).select(
        "rgd_id", "chromosome", "start_pos", "end_pos",
        "ref_nuc", "var_nuc", "variant_type",
    )
    res = load_variants(derived, existing_v, existing_md, existing_sd)
    write_load_result(res, a.store, a.mapKey)
    print(" ".join(f"{k}={v}" for k, v in res.counters.items()))


@tool("VariantPostProcessing")
def variant_post_processing(argv):
    p = argparse.ArgumentParser(prog="VariantPostProcessing")
    p.add_argument("--sampleId", action="append", type=int)
    p.add_argument("--fastaFile", required=True)
    p.add_argument("--store", required=True)
    p.add_argument("--dims", required=True)
    p.add_argument("--mapKey", type=int, default=70)
    p.add_argument("--chr", dest="chrom")
    p.add_argument("--verifyIfInRgd", action="store_true")
    a = p.parse_args(argv)
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.pipelines.postprocess import (
        postprocess_variants,
    )
    from rat_strain_loader_pipeline_spark.sources.fasta import (
        fasta_blocks, read_fasta,
    )
    from rat_strain_loader_pipeline_spark.store import read_table, write_table

    spark = _spark("post-processing")
    v = read_table(spark, a.store, "variant")
    md = read_table(spark, a.store, "variant_map_data", map_key=a.mapKey,
                    chromosome=a.chrom)
    variants = v.join(md.select("rgd_id", "chromosome", "start_pos", "end_pos"), "rgd_id")
    if a.sampleId:
        sd = read_table(spark, a.store, "variant_sample_detail")
        variants = variants.join(
            sd.filter(F.col("sample_id").isin(a.sampleId)).select("rgd_id").distinct(),
            "rgd_id",
        )
    verify = None
    if a.verifyIfInRgd:
        from pyspark.sql.utils import AnalysisException

        try:
            verify = read_table(spark, a.store, "variant_transcript")
        except AnalysisException:
            verify = None
    blocks = fasta_blocks(read_fasta(spark, a.fastaFile))
    res = postprocess_variants(
        variants,
        _dims(spark, a.dims, "genes"),
        _dims(spark, a.dims, "transcripts"),
        _dims(spark, a.dims, "features"),
        map_key=a.mapKey,
        verify_against=verify,
        fasta_blocks=blocks,
    )
    write_table(res.variant_transcript, a.store, "variant_transcript")
    print(f"variant_transcript_rows={res.variant_transcript.count()}")


# ------------------------------------------------------------------ polyphen

def _polyphen_candidates(spark, store, dims, sample, chrom):
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.pipelines.polyphen import (
        polyphen_candidates,
    )
    from rat_strain_loader_pipeline_spark.store import read_table

    vt = read_table(spark, store, "variant_transcript")
    v = read_table(spark, store, "variant")
    md = read_table(spark, store, "variant_map_data", chromosome=chrom)
    if sample is not None:
        sd = read_table(spark, store, "variant_sample_detail")
        v = v.join(
            sd.filter(F.col("sample_id") == sample).select("rgd_id").distinct(), "rgd_id"
        )
    return polyphen_candidates(
        v, md, vt, _dims(spark, dims, "transcripts"), _dims(spark, dims, "genes")
    )


@tool("Polyphen")
@tool("Polyphen2")
def polyphen(argv):
    p = argparse.ArgumentParser(prog="Polyphen")
    p.add_argument("--sample", type=int)
    p.add_argument("--chr", dest="chrom")
    p.add_argument("--outDir", required=True)
    p.add_argument("--store", required=True)
    p.add_argument("--dims", required=True)
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.polyphen import (
        polyphen_input_lines,
    )

    spark = _spark("polyphen")
    cand = _polyphen_candidates(spark, a.store, a.dims, a.sample, a.chrom)
    _write_lines(polyphen_input_lines(cand), a.outDir)
    n = spark.read.text(a.outDir).count()
    print(f"candidates={n} outDir={a.outDir}")


@tool("PolyphenFasta")
def polyphen_fasta(argv):
    p = argparse.ArgumentParser(prog="PolyphenFasta")
    p.add_argument("--sample", type=int)
    p.add_argument("--chr", dest="chrom")
    p.add_argument("--resultsDir", required=True)
    p.add_argument("--outputDir", required=True)
    p.add_argument("--dims", required=True)
    a = p.parse_args(argv)
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.pipelines.polyphen import (
        polyphen_fasta_for_missing,
    )

    spark = _spark("polyphen-fasta")
    logs = spark.read.text(a.resultsDir).withColumnRenamed("value", "line")
    out = polyphen_fasta_for_missing(logs, _dims(spark, a.dims, "proteins"))
    _write_lines(out.filter("found").select(F.col("fasta").alias("value")), a.outputDir)
    c = out.agg(
        F.sum(F.when(F.col("found"), 1).otherwise(0)).alias("w"),
        F.sum(F.when(~F.col("found"), 1).otherwise(0)).alias("m"),
    ).first()
    print(f"fasta_written={c['w'] or 0} no_sequence={c['m'] or 0}")


@tool("PolyphenLoader")
@tool("PolyphenLoader2")
def polyphen_loader(argv):
    p = argparse.ArgumentParser(prog="PolyphenLoader")
    p.add_argument("--sample", type=int)
    p.add_argument("--chr", dest="chrom")
    p.add_argument("--resultsDir", required=True)
    p.add_argument("--store", required=True)
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.polyphen import (
        load_polyphen_results, parse_polyphen_results,
    )
    from rat_strain_loader_pipeline_spark.store import read_table, write_table

    spark = _spark("polyphen-loader")
    raw = spark.read.text(a.resultsDir).withColumnRenamed("value", "line")
    results = parse_polyphen_results(raw)
    info = read_table(spark, a.store, "polyphen_info")
    out = load_polyphen_results(results, info)
    write_table(out, a.store, "polyphen")
    print(f"polyphen_rows={read_table(spark, a.store, 'polyphen').count()}")


# -------------------------------------------------------------------- fixups

def _run_fixup(name, compute):
    """Run a fixup and land the patched rows back OVER the source table:
    stage first (the patched plan reads the same parquet path it is
    about to truncate), then overwrite."""
    from rat_strain_loader_pipeline_spark.staging import stage_to_parquet

    patched, counters = compute()
    print(f"{name}: " + " ".join(f"{k}={v}" for k, v in counters.items()))
    return stage_to_parquet(patched, f"fixup-{name.lower()}")


@tool("VariantTypeFixUp")
def variant_type_fixup_tool(argv):
    p = argparse.ArgumentParser(prog="VariantTypeFixUp")
    p.add_argument("--store", required=True)
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.fixups import variant_type_fixup
    from rat_strain_loader_pipeline_spark.store import read_table, write_table

    spark = _spark("variant-type-fixup")
    patched = _run_fixup(
        "VariantTypeFixUp", lambda: variant_type_fixup(read_table(spark, a.store, "variant"))
    )
    write_table(patched, a.store, "variant", mode="overwrite")


@tool("FrameShiftFixUp")
def frameshift_fixup_tool(argv):
    p = argparse.ArgumentParser(prog="FrameShiftFixUp")
    p.add_argument("--store", required=True)
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.fixups import frameshift_fixup
    from rat_strain_loader_pipeline_spark.store import read_table, write_table

    spark = _spark("frameshift-fixup")
    patched = _run_fixup(
        "FrameShiftFixUp",
        lambda: frameshift_fixup(
            read_table(spark, a.store, "variant_transcript"),
            read_table(spark, a.store, "variant"),
        ),
    )
    write_table(patched, a.store, "variant_transcript", mode="overwrite")


@tool("GenicStatusFixUp")
def genic_status_fixup_tool(argv):
    p = argparse.ArgumentParser(prog="GenicStatusFixUp")
    p.add_argument("--store", required=True)
    p.add_argument("--dims", required=True)
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.fixups import genic_status_fixup
    from rat_strain_loader_pipeline_spark.store import read_table, write_table

    spark = _spark("genic-status-fixup")
    patched = _run_fixup(
        "GenicStatusFixUp",
        lambda: genic_status_fixup(
            read_table(spark, a.store, "variant_map_data"), _dims(spark, a.dims, "genes")
        ),
    )
    write_table(patched, a.store, "variant_map_data", mode="overwrite")


# ----------------------------------------------------------------- exporters

def _vcf_export(argv, prog, table):
    p = argparse.ArgumentParser(prog=prog)
    p.add_argument("--mapKey", type=int, default=70)
    p.add_argument("--source", default=None)  # DbSnp2Vcf only
    p.add_argument("--outputFile", required=True)
    p.add_argument("--store", required=True)
    a = p.parse_args(argv)
    from pyspark.sql import functions as F

    from rat_strain_loader_pipeline_spark.pipelines.sideloaders import (
        vcf_output_lines,
    )
    from rat_strain_loader_pipeline_spark.store import read_table

    spark = _spark(prog.lower())
    src = read_table(spark, a.store, table, map_key=a.mapKey)
    if a.source is not None and "source" in src.columns:
        src = src.filter(F.col("source") == a.source)
    lines = vcf_output_lines(src)
    _write_lines(lines.withColumnRenamed("line", "value"), a.outputFile)
    print(f"lines={spark.read.text(a.outputFile).count()} outputFile={a.outputFile}")


@tool("ClinVar2Vcf")
def clinvar2vcf(argv):
    _vcf_export(argv, "ClinVar2Vcf", "clinvar_vcf")


@tool("DbSnp2Vcf")
def dbsnp2vcf(argv):
    _vcf_export(argv, "DbSnp2Vcf", "db_snp_vcf")


@tool("GwasCat2Vcf")
def gwascat2vcf(argv):
    _vcf_export(argv, "GwasCat2Vcf", "gwas_vcf")


@tool("ConservationScore")
def conservation_score(argv):
    p = argparse.ArgumentParser(prog="ConservationScore")
    p.add_argument("--fileName", required=True)
    p.add_argument("--tableName", default="conservation_score")
    p.add_argument("--store", required=True)
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.pipelines.sideloaders import (
        load_conservation,
    )
    from rat_strain_loader_pipeline_spark.store import write_table

    spark = _spark("conservation")
    df = load_conservation(spark, a.fileName)
    write_table(df, a.store, a.tableName)
    n = spark.read.parquet(f"{a.store.rstrip('/')}/{a.tableName}").count()
    print(f"rows={n} table={a.tableName}")


@tool("VariantRatLoaderFromDb")
def variant_rat_loader_from_db(argv):
    p = argparse.ArgumentParser(prog="VariantRatLoaderFromDb")
    p.add_argument("--url", required=True)
    p.add_argument("--table", default="variant")
    p.add_argument("--driver", default=None)
    p.add_argument("--outDir", required=True)
    p.add_argument("--partitionColumn", default=None)
    p.add_argument("--lowerBound", type=int, default=None)
    p.add_argument("--upperBound", type=int, default=None)
    p.add_argument("--numPartitions", type=int, default=None)
    a = p.parse_args(argv)
    from rat_strain_loader_pipeline_spark.sinks import JdbcTarget, jdbc_scan_options

    spark = _spark("rat-loader-from-db")
    props = {"driver": a.driver} if a.driver else {}
    opts = jdbc_scan_options(
        JdbcTarget(a.url, a.table, props),
        partition_column=a.partitionColumn,
        lower_bound=a.lowerBound,
        upper_bound=a.upperBound,
        num_partitions=a.numPartitions,
    )
    df = spark.read.format("jdbc").options(**opts).load()
    df.write.mode("overwrite").parquet(a.outDir)
    print(f"rows={spark.read.parquet(a.outDir).count()} outDir={a.outDir}")


def usage() -> None:
    names = " | ".join(sorted(TOOLS))
    print("rat-strain-loader-pipeline-spark tool suite usage:")
    print(f"  --tool [{names}] <tool-dependent parameters>")
    print("  (flags mirror the reference Manager; see each tool's --help)")


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("-h", "--help"):
        usage()
        return 0
    if len(argv) < 2 or argv[0] != "--tool" or argv[1] not in TOOLS:
        usage()
        return 1
    try:
        TOOLS[argv[1]](argv[2:])
        return 0
    except Exception:
        print("\nERROR: PIPELINE ABORTED!", file=sys.stderr)
        raise


if __name__ == "__main__":
    sys.exit(main())
