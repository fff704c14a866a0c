"""User-facing pipeline API — the Wallaroo surface on Spark."""

from wallaroo_spark.api.pipeline import (
    Pipeline,
    computation,
    computation_multi,
    key_extractor,
    state_computation,
)

__all__ = [
    "Pipeline",
    "computation",
    "computation_multi",
    "key_extractor",
    "state_computation",
]
