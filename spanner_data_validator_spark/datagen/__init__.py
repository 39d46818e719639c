from spanner_data_validator_spark.datagen.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    gen_transcript_pair,
)
