"""Long-operation monitoring: progress events, cancellation, timeout.

Port of ``Infidex.Api.ProcessMonitor`` (src/Infidex/Api/ProcessMonitor.cs:
12-260): progress percent with change events (handler exceptions swallowed),
started/completed latches, cancellation, a timeout wait, and the static
``should_abort`` check long operations poll (ProcessMonitor.cs:186-199).

Ray wiring: ``build_index(..., monitor=...)`` reports segment completion by
counting ``_SUCCESS`` markers from a driver-side poller thread while the
streaming job runs — progress is real (per finished partition), not
synthetic, and survives the driver being far from the workers."""

from __future__ import annotations

import threading
import time


class ProcessMonitor:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._completed = threading.Event()
        self._started = threading.Event()
        self._cancelled = threading.Event()
        self._progress = 0
        self.progress_changed: list = []  # callables taking (percent: int)
        self.is_running = False
        self.succeeded = False
        self.did_timeout = False
        self.error_message = ""
        self.exception: BaseException | None = None
        self.start_time = time.monotonic()
        self.timeout_seconds = -1  # -1 = no timeout

    # -- progress ----------------------------------------------------------
    @property
    def progress_percent(self) -> int:
        return self._progress

    @progress_percent.setter
    def progress_percent(self, value: int) -> None:
        clamped = max(0, min(100, int(value)))
        if clamped == self._progress:
            return
        self._progress = clamped
        for handler in list(self.progress_changed):
            try:
                handler(clamped)
            except Exception:  # noqa: BLE001 — ProcessMonitor.cs:44-55
                pass

    # -- cancellation ------------------------------------------------------
    def cancel(self) -> None:
        self._cancelled.set()

    @property
    def is_cancelled(self) -> bool:
        return (
            self._cancelled.is_set()
            and not self.succeeded
            and not self.is_running
            and not self.did_timeout
        )

    @property
    def cancellation_requested(self) -> bool:
        return self._cancelled.is_set()

    @property
    def is_completed(self) -> bool:
        return not self.is_running and self._completed.is_set()

    # -- waits -------------------------------------------------------------
    def wait_for_completion(self) -> bool:
        """Blocks until completion or timeout; returns False on timeout
        (ProcessMonitor.cs:131-150)."""
        timeout = self.timeout_seconds if self.timeout_seconds > 0 else None
        completed = self._completed.wait(timeout)
        self.is_running = False
        self.did_timeout = not completed
        if self.did_timeout:
            self.error_message = "Operation timed out."
        return completed

    def wait_for_process_started(self, timeout: float | None = None) -> None:
        self._started.wait(timeout)

    # -- lifecycle (internal) ---------------------------------------------
    def mark_started(self) -> None:
        with self._lock:
            # NOTE: reset() intentionally discards a cancel() issued BEFORE
            # the operation starts — the reference swaps in a fresh
            # CancellationTokenSource in Reset (ProcessMonitor.cs:211,246-247),
            # so only in-flight cancellation is honored. Locked by
            # tests/test_timeout.py::test_process_monitor_cancel_mid_run.
            self.reset()
            self.is_running = True
            self.start_time = time.monotonic()
            self._started.set()

    def mark_finished(self) -> None:
        with self._lock:
            self.is_running = False
            self._completed.set()
            if self.succeeded:
                self.progress_percent = 100

    def reset(self) -> None:
        self._started.clear()
        self._completed.clear()
        self._cancelled.clear()
        self.error_message = ""
        self.exception = None
        self.progress_percent = 0
        self.succeeded = False
        self.did_timeout = False
        self.start_time = time.monotonic()

    # -- polled abort check (ProcessMonitor.ShouldAbort, :186-199) ---------
    @staticmethod
    def should_abort(monitor: "ProcessMonitor | None") -> bool:
        if monitor is None:
            return False
        if monitor.cancellation_requested:
            monitor.error_message = "Operation was cancelled."
            monitor.succeeded = False
            return True
        if (
            monitor.timeout_seconds > 0
            and time.monotonic() - monitor.start_time > monitor.timeout_seconds
        ):
            monitor.error_message = "Operation timed out."
            monitor.did_timeout = True
            monitor.succeeded = False
            return True
        return False


class BuildCancelled(RuntimeError):
    """Raised by build_index when its monitor is cancelled or times out."""


class SegmentProgressPoller:
    """Watches a segments directory for ``_SUCCESS`` markers and feeds the
    monitor's progress (0..cap%) while a streaming build executes. When the
    monitor is cancelled or times out MID-BUILD, the poller drops a
    ``_CANCELLED`` sentinel next to the segments dir — segment-build workers
    poll it before starting each partition and raise, so the streaming job
    aborts promptly instead of running to completion (the abort stays
    resumable: finished segments keep their _SUCCESS markers)."""

    def __init__(
        self, monitor: ProcessMonitor, seg_root: str, n_expected: int, cap: int = 95
    ):
        import os

        self.monitor = monitor
        self.seg_root = seg_root
        self.n_expected = max(1, n_expected)
        self.cap = cap
        self.cancel_path = os.path.join(os.path.dirname(seg_root), "_CANCELLED")
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _count_done(self) -> int:
        import glob
        import os

        return len(glob.glob(os.path.join(self.seg_root, "*", "_SUCCESS")))

    def _run(self) -> None:
        import os

        while not self._stop.wait(0.25):
            done = self._count_done()
            self.monitor.progress_percent = int(self.cap * done / self.n_expected)
            if ProcessMonitor.should_abort(self.monitor) and not os.path.exists(
                self.cancel_path
            ):
                with open(self.cancel_path, "w") as f:
                    f.write(self.monitor.error_message)

    def __enter__(self) -> "SegmentProgressPoller":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2)
