"""Run logging + per-stage metrics (SURVEY D4/D5).

The reference writes two files under the working directory — an append-only
``conversion.log`` with every progress line and an ``errors.log`` that only
receives per-table failures — and echoes to stdout when the config asks
(manager.go:1694-1737; progress lines sync_data.go:279-310). The Spark
analog keeps the same observable surface (two files, config-gated echo,
per-table error records) and adds what a Spark operator actually reads at
100 TB: per-stage wall-clock timings, exposed as a dict so they can feed
any metrics sink.

The clock is injectable so tests assert exact durations.
"""

from __future__ import annotations

import os
import time
from datetime import datetime, timezone


class RunLogger:
    """errors.log + conversion.log + stage timings for one pipeline run."""

    def __init__(
        self,
        log_dir: str,
        echo: bool = False,
        clock=time.monotonic,
        now=lambda: datetime.now(timezone.utc),
    ):
        os.makedirs(log_dir, exist_ok=True)
        self.conversion_path = os.path.join(log_dir, "conversion.log")
        self.errors_path = os.path.join(log_dir, "errors.log")
        self.echo = echo
        self._clock = clock
        self._now = now
        self._stage_started: dict[str, float] = {}
        self.stage_seconds: dict[str, float] = {}
        self.errors: list[dict] = []

    # ---- plain progress ---------------------------------------------------

    def _stamp(self) -> str:
        return self._now().strftime("%Y-%m-%d %H:%M:%S")

    def info(self, msg: str) -> None:
        line = f"[{self._stamp()}] {msg}"
        with open(self.conversion_path, "a", encoding="utf-8") as f:
            f.write(line + "\n")
        if self.echo:
            print(line)

    # ---- per-table errors (errors.log, reference manager.go:1716-1737) ---

    def table_error(self, stage: str, target: str, err: Exception | str) -> None:
        rec = {"stage": stage, "target": target, "error": str(err)}
        self.errors.append(rec)
        line = f"[{self._stamp()}] stage={stage} target={target} error={err}"
        with open(self.errors_path, "a", encoding="utf-8") as f:
            f.write(line + "\n")
        self.info(f"ERROR {stage}/{target}: {err}")

    # ---- stage timings (D4 progress analog) -------------------------------

    def stage_start(self, stage: str) -> None:
        self._stage_started[stage] = self._clock()
        self.info(f"stage {stage}: start")

    def stage_end(self, stage: str, detail: str = "") -> None:
        t0 = self._stage_started.pop(stage, None)
        dur = (self._clock() - t0) if t0 is not None else 0.0
        self.stage_seconds[stage] = dur
        suffix = f" ({detail})" if detail else ""
        self.info(f"stage {stage}: done in {dur:.3f}s{suffix}")

    def summary(self) -> dict:
        return {
            "stages": dict(self.stage_seconds),
            "n_errors": len(self.errors),
            "errors": list(self.errors),
        }
