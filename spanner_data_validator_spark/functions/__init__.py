from spanner_data_validator_spark.functions.fingerprint import (  # noqa: F401
    FIELD_SEP,
    fingerprint_expr,
    normalized_payload,
    normalize_json_udf,
)
from spanner_data_validator_spark.functions.normalize import normalize_column  # noqa: F401
