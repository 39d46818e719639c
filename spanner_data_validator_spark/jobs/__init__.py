"""spark-submit entry points and multi-table spec runner."""

from spanner_data_validator_spark.jobs.spec_runner import (  # noqa: F401
    TableSpec,
    load_specs,
    run_specs,
)
