"""Engine options (reference: xarray/core/options.py:418 OPTIONS +
set_options context manager).

- ``arithmetic_join``: the align mode of auto-aligning binary ops
  (xarray OPTIONS['arithmetic_join']; default 'inner').
- ``auto_segment_threshold``: window ops over a dim with NO complement
  dims (the single-task shape) automatically dispatch to the segmented
  implementations once the series is estimated to reach this many rows.
  The estimate is Catalyst plan statistics (_utils.estimated_rows) —
  lazy, no count() action — and both strategies are exact, so a wrong
  estimate costs only plan choice, never correctness.  ON by default
  (2M rows ≈ the point where a one-task global window becomes the job's
  straggler); set to None to always use the global window.
- ``keep_attrs``: whether attrs survive operators (catalog-side).
"""

from __future__ import annotations

OPTIONS: dict = {
    "arithmetic_join": "inner",
    "auto_segment_threshold": 2_000_000,
    "keep_attrs": True,
    # Grouped EXACT quantile/median: max rows any single group may
    # buffer in one SQL percentile/collect_list aggregation before the
    # plan switches to the distributed per-group histogram selection
    # (no buffering, ~4 scans).  The check is free (plan statistics)
    # when the whole table fits; above that one count job decides.
    # None = always buffer (pre-r5 behavior).  This is the MEMORY cap:
    # a group above it never enters one SQL aggregation buffer.
    "grouped_quantile_buffer_limit": 4_000_000,
    # PERF crossover (round-8 measurement, 90M rows cached, min-of-2):
    # per-group 3k -> buffer 7.2 s vs midbin 18.8 s; 30k -> 11.8 vs
    # 17.1; 300k -> 21.4 vs 6.1; 3M -> 61.3 vs 3.6.  Buffering wins
    # below ~1e5 rows per group at large totals; the bucket plans win
    # above.  Groups bigger than this threshold prefer midbin/hist
    # even when they would FIT the memory cap — unless the whole
    # table is under the total floor below, where the bucket plans'
    # fixed job costs dominate and buffering stays fastest.
    "grouped_quantile_midbin_threshold": 131_072,
    "grouped_quantile_midbin_total_floor": 16_000_000,
    # Rolling var/std plan picker: window widths AT or ABOVE this use
    # the Arrow-batched numpy kernel (applyInPandas over complement-dim
    # groups / halo segments — vectorized O(n·w), matches numpy's
    # windowed nanvar exactly); below it the in-plan collect_list +
    # F.aggregate form runs.  Measured round 10 (SCALE.md): there is
    # NO crossover — the interpreted per-element lambda loses at every
    # width (10M rows: w=3 12.4 s vs 1.9 s, w=20 38.9 vs 2.0, w=1000
    # ~1900 (extrapolated) vs 14.6), so the kernel is the default for
    # every real window.  None = always HOF (kept as the in-plan
    # fallback: streaming frames, centered global series).
    "rolling_var_arrow_threshold": 2,
    # MEMORY guard on the grouped Arrow rolling kernel (round-10
    # ADVICE #2): applyInPandas materializes each complement-dim group
    # as ONE pandas frame, so a long rolled dim with few groups could
    # OOM where the in-plan window streams.  When the table's
    # ESTIMATED rows (plan statistics, no job) exceed this bound and
    # complement dims exist (the grouped shape — the no-complement
    # shape is halo-segmented and memory-bounded already), rolling
    # var/std/median falls back to the in-plan HOF/collect_list form:
    # slower per row but streaming.  The bound is deliberately
    # generous (64M rows ≈ a few GB of Arrow frame across groups —
    # only pathological one-group skew goes over per task).  None =
    # never fall back.
    "rolling_arrow_est_rows_bound": 64_000_000,
    # Middle plan between the buffered aggregate and the histogram:
    # two-scan fixed-bucket (1/16-octave) selection — no stats pass,
    # no aggregation buffer.  The worst case (a whole group inside ONE
    # bucket) sorts the group in a single task, so this cap bounds
    # that task's sort (64M doubles ≈ 512 MB, spill-backed); above it
    # the 4-pass equi-width histogram splits tight clusters by value
    # range instead.  None = never take the midbin plan.
    "grouped_quantile_midbin_limit": 64_000_000,
}

_VALID = {
    "arithmetic_join": {"inner", "outer", "left", "right"},
}


class set_options:
    """Context manager / global setter (xarray.set_options parity).

    >>> with set_options(arithmetic_join="outer"):
    ...     c = a + b
    """

    def __init__(self, **kwargs):
        self._old = {}
        for k, v in kwargs.items():
            if k not in OPTIONS:
                raise ValueError(f"unknown option {k!r}; valid: {sorted(OPTIONS)}")
            if k in _VALID and v not in _VALID[k]:
                raise ValueError(f"option {k}={v!r}; valid: {sorted(_VALID[k])}")
            self._old[k] = OPTIONS[k]
            OPTIONS[k] = v

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        OPTIONS.update(self._old)


def get_options() -> dict:
    """Snapshot of the current options (xarray.get_options parity)."""
    return dict(OPTIONS)
