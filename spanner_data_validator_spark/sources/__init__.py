"""Sources: transcript batch/stream readers (Iceberg-gated), ranged JDBC."""

from spanner_data_validator_spark.sources.transcript_source import (  # noqa: F401
    KEY_COLS,
    PAYLOAD_COLS,
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    stream_transcripts,
    write_transcripts,
)
from spanner_data_validator_spark.sources.jdbc_source import (  # noqa: F401
    range_predicates,
    ranged_predicates_for,
    read_jdbc_ranged,
)
