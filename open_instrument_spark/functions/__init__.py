from open_instrument_spark.functions.durations import parse_duration_ms  # noqa: F401
from open_instrument_spark.functions.match import (  # noqa: F401
    VariableMatcher,
    variable_predicate,
)
