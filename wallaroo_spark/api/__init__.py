"""User-facing pipeline API — the Wallaroo surface on Spark."""

from wallaroo_spark.api.aggregation import Aggregation, validate_aggregation
from wallaroo_spark.api.pipeline import (
    Pipeline,
    computation,
    computation_multi,
    key_extractor,
    range_windows,
    state_computation,
    state_computation_multi,
)

__all__ = [
    "Aggregation",
    "Pipeline",
    "computation",
    "computation_multi",
    "key_extractor",
    "range_windows",
    "state_computation",
    "state_computation_multi",
    "validate_aggregation",
]
