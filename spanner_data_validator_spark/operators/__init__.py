from spanner_data_validator_spark.operators.timeseries import (  # noqa: F401
    ewma_by_group,
    resample_ffill,
)
from spanner_data_validator_spark.operators.bpe import (  # noqa: F401
    bpe_one_merge,
)
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
from spanner_data_validator_spark.operators.constraints import (  # noqa: F401
    Rule,
    accepted_values,
    check_constraints,
    fits_int32,
    in_range,
    matches_regex,
    max_length,
    not_null,
    unique,
)
from spanner_data_validator_spark.operators.funnel import (  # noqa: F401
    funnel_stages,
    retention_cohorts,
)
from spanner_data_validator_spark.operators.integrity import (  # noqa: F401
    duplicate_examples,
    orphan_check,
    partition_completeness,
    reconcile_header_detail,
    sequence_contiguity,
    uniqueness_check,
)
from spanner_data_validator_spark.operators.quantize import (  # noqa: F401
    quantize_int8,
    quantize_stats,
)
from spanner_data_validator_spark.operators.linkage import (  # noqa: F401
    fuzzy_candidates,
    fuzzy_match_keys,
    passjoin_candidates,
)
from spanner_data_validator_spark.operators.layout import (  # noqa: F401
    file_manifest,
    skip_scan_summary,
    write_zordered,
    zorder_key,
    zorder_sql_expr,
)
from spanner_data_validator_spark.operators.profile import (  # noqa: F401
    column_profile,
    hist_quantiles,
    histogram_drift,
    psi_terms,
    quantiles_by_rank,
    schema_drift,
)
from spanner_data_validator_spark.operators.scd import scd2_build  # noqa: F401
from spanner_data_validator_spark.operators.sessionize import (  # noqa: F401
    interval_join_bucketed,
    session_stats,
    sessionize,
)
from spanner_data_validator_spark.operators.skew import (  # noqa: F401
    join_cardinality,
    key_skew_profile,
    salted_join,
)
from spanner_data_validator_spark.operators.sketch import (  # noqa: F401
    cms_build,
    cms_lookup,
    hll_estimate,
    hll_merge,
    hll_registers,
    kmv_distinct,
    kmv_distinct_by_group,
    kmv_set_ops,
)
from spanner_data_validator_spark.operators.graph import (  # noqa: F401
    pagerank_fixed_point,
    triangle_participation,
)
from spanner_data_validator_spark.operators.cluster import (  # noqa: F401
    kmeans_fixed_point,
    quantize_vectors,
)
from spanner_data_validator_spark.operators.ivm import (  # noqa: F401
    apply_changes,
    base_agg,
)
from spanner_data_validator_spark.operators.sampling import (  # noqa: F401
    priority_sample,
    priority_score,
    temperature_mixture,
)
from spanner_data_validator_spark.operators.diff import (  # noqa: F401
    column_diff,
    column_drift_summary,
)
from spanner_data_validator_spark.operators.basket import (  # noqa: F401
    basket_arrays,
    pair_lift,
)
from spanner_data_validator_spark.operators.comparator import (  # noqa: F401
    classify_three_way,
)
from spanner_data_validator_spark.operators.graph import (  # noqa: F401
    hop_distance,
)
from spanner_data_validator_spark.operators.layout import (  # noqa: F401
    distributed_ntile,
    global_row_number,
)
from spanner_data_validator_spark.operators.sessionize import (  # noqa: F401
    merge_intervals,
)
from spanner_data_validator_spark.operators.spatial import (  # noqa: F401
    grid_neighbor_pairs,
)
from spanner_data_validator_spark.operators.stats import (  # noqa: F401
    cusum_changepoint,
    gini_coefficient,
    mann_whitney_u,
    theil_sen_trend,
    time_weighted_mean,
    trimmed_mean,
)
from spanner_data_validator_spark.operators.graph import (  # noqa: F401
    bellman_ford,
)
from spanner_data_validator_spark.operators.hierarchy import (  # noqa: F401
    bom_rollup,
    resolve_roots,
)
from spanner_data_validator_spark.operators.skyline import (  # noqa: F401
    pareto_frontier,
    pareto_frontier_wide,
)
from spanner_data_validator_spark.operators.quantize import (  # noqa: F401
    pq_assign,
)
from spanner_data_validator_spark.operators.lateness import (  # noqa: F401
    arrival_lag,
    watermark_recommendation,
)
from spanner_data_validator_spark.operators.survivorship import (  # noqa: F401
    golden_records,
)
from spanner_data_validator_spark.operators.skew import (  # noqa: F401
    adaptive_salted_join,
    hot_keys,
)
from spanner_data_validator_spark.operators.rollup import (  # noqa: F401
    branch_points,
    prefix_signatures,
)
