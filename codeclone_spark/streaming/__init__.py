"""Streaming / incremental validation.

The reference is batch-only; its incrementality (warm path re-analyzes only
changed files, ``core/discovery.py:118-190``) maps to our checkpoint-ledger
resume (``plans/ledger.py``).  This module adds the true streaming analog:
Structured Streaming micro-batch validation for a clips stream, using
``foreachBatch`` so each micro-batch reuses the exact batch rule pass —
one compute, two execution modes.
"""

from codeclone_spark.streaming.micro_batch import (  # noqa: F401
    stream_drift_monitor,
    stream_validate,
    windowed_violation_counts,
)
