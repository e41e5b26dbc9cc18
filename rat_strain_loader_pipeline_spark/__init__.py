"""rat_strain_loader_pipeline_spark — a PySpark-native analytics engine with the
data-processing capabilities of rat-genome-database/rat-strain-loader-pipeline.

The reference (surveyed in /root/repo/SURVEY.md) is a Java batch-ETL
suite for rat-strain variant data: VCF → Common Format 2 TSV → variant
store → protein-consequence post-processing, plus side loaders
(conservation wiggle, SnpEff, PolyPhen round trip) and fixups.

This package re-expresses those dataflow semantics Spark-first:

- ``session``   — SparkSession factory tuned for the engine
- ``schemas``   — StructTypes for every table in SURVEY.md §1.2
- ``sources``   — CF2 / VCF / wiggle / FASTA readers, parquet store
- ``functions`` — scalar domain functions (variant typing, zygosity,
                  reverse-complement, codon translation) as pure
                  Column expressions wherever possible
- ``operators`` — engine-level operators: interval join, dedup-upsert,
                  deterministic id allocation, LLM-data-pipeline ops
                  (dedup, similarity search, text analysis, multimodal)
- ``pipelines`` — end-to-end flows mirroring the reference tools
                  (convert, load, postprocess, fixups, polyphen)
- ``streaming`` — Structured Streaming ingest (extension surface)
"""

__version__ = "0.1.0"
