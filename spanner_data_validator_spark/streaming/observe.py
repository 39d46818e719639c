"""In-flight stream metrics via ``Dataset.observe`` — the zero-cost
data-quality counters a production validator exports per micro-batch.

``observe`` piggybacks accumulator-style aggregates on the SAME pass the
stream already makes (no second aggregation, no extra shuffle, no state):
each micro-batch's metrics arrive on the query's progress events. This is
the API a monitoring stack hooks (alert when null-rate spikes mid-stream);
the reference's nearest analogue is its Beam metrics gauges
(``JDBCToSpannerDVTWithHash.java`` custom counters), which similarly ride
the pipeline rather than re-scanning it.

Determinism contract: per-batch values depend on micro-batch boundaries,
but SUMs of per-batch sums and MAXes of per-batch maxes are functions of
the data alone — accumulate those, never expose raw per-batch rows to a
correctness check.
"""

from __future__ import annotations

from typing import Iterable


def fold_observed(query, name: str, sum_cols: Iterable[str],
                  max_cols: Iterable[str] = ()) -> dict:
    """Fold one observation's per-batch rows across a FINISHED query's
    ``recentProgress``: sums for ``sum_cols``, maxes for ``max_cols``,
    plus ``n_batches_with_data``.

    Only batches that actually carried the observation contribute (empty
    micro-batches emit no metrics row). Works on availableNow/drained
    runs where every batch's progress is still in the recent window
    (default retention 100 updates).
    """
    totals = {c: 0 for c in sum_cols}
    maxes = {c: None for c in max_cols}
    n_batches = 0
    for progress in query.recentProgress:
        om = progress.observedMetrics if not isinstance(progress, dict) \
            else progress.get("observedMetrics", {})
        row = om.get(name)
        if row is None:
            continue
        n_batches += 1
        d = row.asDict() if hasattr(row, "asDict") else dict(row)
        for c in totals:
            if d.get(c) is not None:
                totals[c] += d[c]
        for c in maxes:
            v = d.get(c)
            if v is not None and (maxes[c] is None or v > maxes[c]):
                maxes[c] = v
    return {**totals, **maxes, "n_batches_with_data": n_batches}
