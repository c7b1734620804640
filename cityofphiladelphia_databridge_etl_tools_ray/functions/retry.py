"""Bounded-retry policy for external-facing stages.

The reference hand-rolls the same budget twice: a 5-try exponential
1–10 s ``requests.Session`` retry for the AIS geocoder
(databridge_etl_tools/ais_geocoder/ais_request.py:6-26) and a
sniff-the-error-class retry loop around AGO edits
(databridge_etl_tools/ago/ago.py:716-931).  This module is the single
engine-side equivalent: a tiny ``retry_call`` used INSIDE actor-pool
stages (one policy per actor, around the raw I/O call), composed with
Ray's own task-level retry (``max_task_retries`` on the actor pool)
for crashes the in-process loop can't see.

Only ``TransientError`` subclasses (and whatever the caller lists in
``retry_on``) are retried — a permanent failure (bad key, schema
mismatch) must surface immediately, exactly like the reference's
error-class sniffing.  The ``sleep`` seam lets tests run the full
budget without wall-clock cost.
"""

from __future__ import annotations

import time

# reference budget: 5 tries, exponential backoff 1 s doubling, 10 s cap
# (ais_geocoder/ais_request.py:6-26: Retry(total=5, backoff_factor=1,
#  max 10 s between tries))
DEFAULT_TRIES = 5
DEFAULT_BASE_DELAY = 1.0
DEFAULT_MAX_DELAY = 10.0


class TransientError(RuntimeError):
    """An error worth retrying (network hiccup, 429/503, lock timeout)."""


def retry_call(
    fn,
    *args,
    tries: int = DEFAULT_TRIES,
    base_delay: float = DEFAULT_BASE_DELAY,
    max_delay: float = DEFAULT_MAX_DELAY,
    retry_on: tuple = (TransientError,),
    sleep=time.sleep,
    **kwargs,
):
    """Call ``fn(*args, **kwargs)`` with up to ``tries`` attempts.

    Retries only exceptions in ``retry_on``; the last attempt's
    exception propagates.  Backoff is ``base_delay * 2**attempt``
    capped at ``max_delay``.
    """
    for attempt in range(tries):
        try:
            return fn(*args, **kwargs)
        except retry_on:
            if attempt == tries - 1:
                raise
            sleep(min(max_delay, base_delay * (2.0**attempt)))
