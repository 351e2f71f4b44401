"""Terminal display: config tables, prefill progress, streaming panel, stats.

Parity with the reference's rich display layer (cpmcu/common/display.py:20-462)
— config tables, a prefill progress bar with live tok/s, streamed text, and
the generation/perf summaries — degrading to plain prints when rich or a TTY
is unavailable.
"""

from __future__ import annotations

import sys
import time
from typing import Dict, Optional

try:
    from rich.console import Console
    from rich.progress import (
        BarColumn, Progress, TextColumn, TimeElapsedColumn
    )
    from rich.table import Table

    _HAS_RICH = True
except ImportError:  # pragma: no cover
    _HAS_RICH = False


class Display:
    _instance: Optional["Display"] = None

    def __init__(self, plain: Optional[bool] = None):
        if plain is None:
            plain = not sys.stdout.isatty() or not _HAS_RICH
        self.plain = plain
        self.console = Console() if _HAS_RICH and not plain else None
        self._progress = None
        self._task = None
        self._prefill_t0 = 0.0

    @classmethod
    def get(cls) -> "Display":
        if cls._instance is None:
            cls._instance = Display()
        return cls._instance

    # -- config tables -------------------------------------------------------

    def show_config(self, title: str, cfg: Dict):
        if self.plain:
            print(f"=== {title} ===")
            for k, v in cfg.items():
                print(f"  {k}: {v}")
            return
        table = Table(title=title, show_header=False)
        for k, v in cfg.items():
            table.add_row(str(k), str(v))
        self.console.print(table)

    # -- prefill progress ------------------------------------------------------

    def progress_callback(self, event: str, info: Dict):
        """Engine progress hook (Engine.prefill's callback protocol)."""
        if event == "begin":
            self._prefill_t0 = time.time()
            total = info["total_tokens"]
            if self.plain:
                print(f"prefill: 0/{total} tokens", flush=True)
            else:
                self._progress = Progress(
                    TextColumn("[cyan]prefill"),
                    BarColumn(),
                    TextColumn("{task.completed}/{task.total} tok"),
                    TextColumn("[green]{task.fields[tps]:.0f} tok/s"),
                    TimeElapsedColumn(),
                    console=self.console,
                )
                self._progress.start()
                self._task = self._progress.add_task(
                    "prefill", total=total, tps=0.0
                )
        elif event == "advance":
            cur = info["current_tokens"]
            tps = cur / max(time.time() - self._prefill_t0, 1e-9)
            if self.plain:
                print(f"prefill: {cur} tokens ({tps:.0f} tok/s)", flush=True)
            elif self._progress:
                self._progress.update(self._task, completed=cur, tps=tps)
        elif event == "finish":
            if self._progress:
                self._progress.stop()
                self._progress = None

    # -- streaming -------------------------------------------------------------

    def stream_text(self, text: str):
        print(text, end="", flush=True)

    def stream_end(self):
        print(flush=True)

    # -- summaries ---------------------------------------------------------------

    def show_generation_stats(self, stats: Dict):
        rows = {}
        if "prefill_time" in stats and stats.get("prompt_tokens"):
            pt = stats["prefill_time"]
            rows["Prefill"] = (
                f"{stats['prompt_tokens']} tokens in {pt:.2f}s "
                f"({stats['prompt_tokens'] / max(pt, 1e-9):.2f} tok/s)"
            )
        if "decode_time" in stats and stats.get("decode_tokens"):
            dt = stats["decode_time"]
            rows["Decode"] = (
                f"{stats['decode_tokens']} tokens in {dt:.2f}s "
                f"({stats['decode_tokens'] / max(dt, 1e-9):.2f} tok/s)"
            )
        if stats.get("mean_accept_length"):
            rows["Mean accept length"] = f"{stats['mean_accept_length']:.2f}"
        self.show_config("Generation stats", rows)


display = Display.get()
