"""Large-scale training-data-pipeline operators.

The reference is an ML library with no relational surface (SURVEY §2.10);
this package supplies the operators a 100 TB training-data pipeline needs,
expressed Catalyst-first: built-in Column functions (whole-stage codegen),
broadcast joins for small sides, inverted-index / LSH bucket joins instead
of cross products, and explicit skew guards.
"""

from henbun_spark.operators import (
    bpe,
    bucketing,
    clustering,
    decomposition,
    dedup,
    graph,
    layout,
    multimodal,
    quality,
    relational,
    sampling,
    selection,
    similarity,
    sketch,
    text,
)
