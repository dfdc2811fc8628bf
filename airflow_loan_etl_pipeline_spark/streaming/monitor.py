"""Job SLA monitoring + failure handlers — the engine-side analogue of
the reference's roadmap item "Enhance alerts (Airflow SLAs, failure
handlers)" (/root/reference/README.md, Limitations) and its
log-and-swallow email failure path (drive_auto_compress_email.py:516-517).

Two pieces:

- :func:`sla_timer` — batch-side context manager: wall-clock an
  enclosed job, invoke ``on_breach`` if it exceeds the SLA, re-raise
  failures through ``on_failure`` (never swallow).
- :class:`QuerySLAListener` — streaming-side
  ``StreamingQueryListener``: watches every micro-batch's
  ``triggerExecution`` duration and fires ``on_breach`` when a trigger
  blows its budget; also records terminations with exceptions. This is
  push-based observability off the driver event bus — zero cost on the
  executors, works for every query in the session at once.

Handlers are plain callables so delivery routes anywhere (the SMTP
report sink in plans/report.py, a webhook, a log line). Alert delivery
failures are the caller's to handle — the monitor itself never raises
from a handler (a broken alert channel must not kill the job it
watches).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from contextlib import contextmanager

from pyspark.sql.streaming import StreamingQueryListener


@contextmanager
def sla_timer(
    name: str,
    sla_seconds: float,
    on_breach: Callable[[str, float], None] | None = None,
    on_failure: Callable[[str, BaseException], None] | None = None,
):
    """Time a batch job against an SLA. Breach fires the handler AND the
    job result stands (an SLA is an alert, not a cancellation); failure
    fires ``on_failure`` and RE-RAISES (the reference's silent swallow
    loses reports invisibly)."""
    t0 = time.perf_counter()
    try:
        yield
    except BaseException as exc:
        if on_failure is not None:
            try:
                on_failure(name, exc)
            except Exception:
                pass
        raise
    finally:
        elapsed = time.perf_counter() - t0
        if elapsed > sla_seconds and on_breach is not None:
            try:
                on_breach(name, elapsed)
            except Exception:
                pass


class QuerySLAListener(StreamingQueryListener):
    """Per-trigger SLA watchdog for every streaming query in a session.

    ``events`` accumulates (query_name, duration_s) for each completed
    trigger; ``breaches`` the subset over budget; ``failures`` records
    (query_name, exception_string) from terminations. Register with
    ``spark.streams.addListener(listener)`` and remove with
    ``removeListener`` when done.
    """

    def __init__(
        self,
        sla_seconds: float,
        on_breach: Callable[[str, float], None] | None = None,
    ) -> None:
        self.sla_seconds = sla_seconds
        self.on_breach = on_breach
        self.events: list[tuple[str, float]] = []
        self.breaches: list[tuple[str, float]] = []
        self.failures: list[tuple[str, str]] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        dur_ms = (p.durationMs or {}).get("triggerExecution", 0)
        dur = float(dur_ms) / 1000.0
        name = p.name or p.id
        self.events.append((str(name), dur))
        if dur > self.sla_seconds:
            self.breaches.append((str(name), dur))
            if self.on_breach is not None:
                try:
                    self.on_breach(str(name), dur)
                except Exception:
                    pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        if event.exception is not None:
            self.failures.append((str(event.id), str(event.exception)))


def with_quality_observation(
    df, name: str = "quality", value_col: str | None = None
):
    """Attach engine-native observed metrics (``df.observe``) to a plan:
    row count, null count of ``value_col``, and its sum. Metrics are
    computed INSIDE the action that materializes the DataFrame — zero
    extra passes, zero extra shuffles, collected on the driver via
    ``Observation`` (batch) — unlike a separate ``.count()`` audit query
    that re-reads 100 TB. This is the Spark-native replacement for the
    reference DAG's per-task row-count bookkeeping
    (drive_auto_compress_email.py:315-325: XCom dict summaries).

    Returns ``(observed_df, observation)``; read
    ``observation.get`` AFTER an action has run.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        metrics += [
            F.sum(F.col(value_col).isNull().cast("long")).alias("n_nulls"),
            F.sum(value_col).alias("value_sum"),
        ]
    return df.observe(obs, *metrics), obs
