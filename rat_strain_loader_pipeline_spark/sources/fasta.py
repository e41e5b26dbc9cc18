"""FASTA source (S6): per-chromosome sequence with random access.

The reference gunzips each chromosome FASTA into a single-line ``.nuc``
file and memory-maps substrings (ChrFastaFile.java:48-102), memoized per
gene (VariantPostProcessing.java:1201-1216).

Spark-first: parse FASTA → ``(chr, seq)`` rows; for the consequence
engine the dict is **broadcast** to executors (rat chr1 ≈ 280 MB — fits
executor memory; memoization is unnecessary because each task slices the
broadcast string directly). For a 100 TB design the same API can be
backed by ``(chr, block_start, seq_block)`` rows and a range join; the
broadcast path is the reference-scale default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rat_strain_loader_pipeline_spark.schemas import FASTA_SEQ_SCHEMA


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """Parse FASTA file(s) → (chr string, seq string), one row per record.

    Handles multi-record files; header line '>'-prefixed, first token
    taken as the name, 'chr' prefix stripped.
    """
    whole = spark.read.text(path, wholetext=True).select(F.col("value"))
    # split on '>' record starts; first element is empty preamble
    recs = whole.select(F.explode(F.split(F.col("value"), r"(?m)^>")).alias("rec")).filter(
        F.col("rec") != ""
    )
    name = F.regexp_extract(F.col("rec"), r"^(\S+)", 1)
    seq = F.upper(F.regexp_replace(F.regexp_replace(F.col("rec"), r"^[^\n]*\n", ""), r"\s+", ""))
    return recs.select(
        F.regexp_replace(name, "^chr", "").alias("chr"), seq.alias("seq")
    ).filter(F.col("seq") != "")


def fasta_dict(df: DataFrame) -> dict[str, str]:
    """Collect (chr, seq) rows to a plain dict for broadcasting."""
    return {r["chr"]: r["seq"] for r in df.collect()}


def broadcast_fasta(spark: SparkSession, df: DataFrame):
    """Broadcast the chromosome→sequence dict to executors."""
    return spark.sparkContext.broadcast(fasta_dict(df))


def fasta_from_dict(spark: SparkSession, seqs: dict[str, str]) -> DataFrame:
    return spark.createDataFrame(list(seqs.items()), schema=FASTA_SEQ_SCHEMA)


def get_dna_chunk(seqs: dict[str, str], chrom: str, start: int, stop: int) -> str:
    """1-based inclusive substring like FastaParser.getSequence(int,int);
    out-of-range clamped, unknown chromosome → ''. Python-side helper for
    the consequence pandas UDF."""
    seq = seqs.get(chrom) or seqs.get(f"chr{chrom}") or ""
    if not seq:
        return ""
    start = max(1, start)
    stop = min(len(seq), stop)
    if stop < start:
        return ""
    return seq[start - 1 : stop]
