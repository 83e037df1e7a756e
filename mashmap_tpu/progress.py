"""Live progress meter.

Equivalent of the reference's ``progress_meter::ProgressMeter``
(reference: src/common/progress.hpp:14-86): a background thread repaints
one stderr line every 500 ms with percent complete, bp/s throughput,
elapsed and estimated remaining time; ``finish`` paints 100% and joins.
"""

from __future__ import annotations

import sys
import threading
import time


def _fmt_dhms(seconds: float) -> str:
    seconds = max(0, int(seconds))
    d, rem = divmod(seconds, 86400)
    h, rem = divmod(rem, 3600)
    m, s = divmod(rem, 60)
    return f"{d:02d}:{h:02d}:{m:02d}:{s:02d}"


class ProgressMeter:
    def __init__(self, total: int, banner: str,
                 stream=None, interval: float = 0.5):
        # total <= 0 => unsized meter: paints count + rate only (used
        # when stderr is not a tty and no .fai exists, so sizing would
        # cost a full pass over the query files)
        self.sized = int(total) > 0
        self.total = max(int(total), 1)
        self.banner = banner
        self.stream = stream if stream is not None else sys.stderr
        self.interval = interval
        self._count = 0
        self._lock = threading.Lock()
        self._done = threading.Event()
        self._t0 = time.time()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def increment(self, n: int) -> None:
        with self._lock:
            self._count += int(n)

    def _paint(self) -> None:
        elapsed = time.time() - self._t0
        with self._lock:
            count = self._count
        rate = count / max(elapsed, 1e-9)
        if self.sized:
            frac = min(count / self.total, 1.0)
            remain = (self.total - count) / rate if rate > 0 else 0.0
            self.stream.write(
                f"\r{self.banner} {100.0 * frac:2.2f}% @ {rate:.2e} "
                f"bp/s elapsed: {_fmt_dhms(elapsed)} "
                f"remain: {_fmt_dhms(remain)}")
        else:
            self.stream.write(
                f"\r{self.banner} {count} bp @ {rate:.2e} bp/s "
                f"elapsed: {_fmt_dhms(elapsed)}")
        self.stream.flush()

    def _loop(self) -> None:
        while not self._done.wait(self.interval):
            self._paint()

    def finish(self) -> None:
        self._done.set()
        self._thread.join()
        if self.sized:
            with self._lock:
                self._count = self.total
        self._paint()
        self.stream.write("\n")
        self.stream.flush()
