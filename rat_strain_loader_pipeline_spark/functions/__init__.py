"""Scalar domain functions (SURVEY.md §2.7), as pure Column expressions."""

from rat_strain_loader_pipeline_spark.functions.dna import (  # noqa: F401
    CODON_TABLE,
    reverse_complement,
    translate_codons,
)
from rat_strain_loader_pipeline_spark.functions.variant import (  # noqa: F401
    end_pos,
    quality_score,
    total_depth_derived,
    variant_type,
)
from rat_strain_loader_pipeline_spark.functions.zygosity import (  # noqa: F401
    zygosity_indel,
    zygosity_snv,
)
