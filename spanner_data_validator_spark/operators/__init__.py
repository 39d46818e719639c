from spanner_data_validator_spark.operators.comparator import (  # noqa: F401
    MATCH,
    MISMATCH,
    SOURCE_ONLY,
    TARGET_ONLY,
    classify_pair,
    dedup_first,
    tally_report,
    validate_batch,
)
from spanner_data_validator_spark.operators.digest import (  # noqa: F401
    digest_drift,
    incremental_validate,
    range_digest,
)
