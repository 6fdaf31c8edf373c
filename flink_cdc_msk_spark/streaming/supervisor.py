"""Restart supervisor (SURVEY.md A32).

The reference uses Flink's fixed-delay restart strategy: 3 attempts x 10 s
(MySQLCDC2AWSMSK.scala:65-68). Spark restarts *tasks*, not failed streaming
queries — the equivalent is this driver-side loop around query start /
awaitTermination.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql.streaming import StreamingQuery


class RestartSupervisor:
    """Fixed-delay restart: re-invoke ``start_query`` on failure, up to
    ``max_attempts`` times, sleeping ``delay_s`` between attempts — the
    counter resets after a successful (clean-stop) run."""

    def __init__(self, max_attempts: int = 3, delay_s: float = 10.0):
        self.max_attempts = max_attempts
        self.delay_s = delay_s
        self.attempts_used = 0

    def run(self, start_query: Callable[[], StreamingQuery]) -> None:
        while True:
            query = start_query()
            try:
                query.awaitTermination()
                return  # clean termination
            except Exception:
                self.attempts_used += 1
                if self.attempts_used >= self.max_attempts:
                    raise
                time.sleep(self.delay_s)
