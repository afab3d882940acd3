"""Experiment tracking and throughput metering.

The reference logs step-keyed scalars to wandb (pretrain.py:122-130,
finetune.py:190-202, SURVEY.md §5.5). Here wandb is an explicit OPT-IN:
set ``WANDB_MODE`` (e.g. ``online``/``offline-sync``-able modes) or pass
``use_wandb=True`` to get the reference's projects/keys; with the env var
unset, scalars go to stdout (and a JSONL file if requested) so headless/CI
runs never create wandb state by surprise. A
lightweight cubes/sec meter covers the BASELINE.md throughput metric —
the reference has no profiling at all (SURVEY.md §5.1).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class Tracker:
    def __init__(
        self,
        project: str,
        config: Optional[Any] = None,
        use_wandb: Optional[bool] = None,
        jsonl_path: Optional[str] = None,
        quiet: bool = False,
    ):
        self.project = project
        self.quiet = quiet
        self.jsonl_path = jsonl_path
        self._wandb = None
        # pid suffix: two runs minted in the same SECOND (a shell loop over
        # configs) must not share models/<run_id> and overwrite each
        # other's checkpoints
        self.run_id = f"local-{int(time.time())}-{os.getpid()}"
        # multi-host: exactly one process owns persistence. Without this,
        # every host of a pod slice would wandb.init its own run and append
        # to the same JSONL — N duplicate runs and interleaved files. The
        # reference never faces this (single-process, SURVEY.md §2.3).
        if _process_index() != 0:
            use_wandb = False
            self.jsonl_path = None
            self.quiet = True
            # an explicit placeholder, not a local timestamp: ranks would
            # otherwise each mint a DIFFERENT-looking run_id (clock skew)
            # that reads like a real run. Non-primary ranks never persist,
            # so this id must never reach a filesystem path or wandb.
            self.run_id = f"nonprimary-{_process_index()}"
        if use_wandb is None:
            # a `wandb agent` worker sets sweep/run IDs but NOT WANDB_MODE —
            # without this, sweep trials would silently train yaml defaults
            # (wandb.config overrides live behind self._wandb)
            agent_driven = bool(
                os.environ.get("WANDB_SWEEP_ID") or os.environ.get("WANDB_RUN_ID")
            )
            # offline IS an opt-in (record locally, `wandb sync` later)
            use_wandb = agent_driven or os.environ.get(
                "WANDB_MODE", "disabled"
            ) != "disabled"
        if use_wandb:
            try:
                import wandb

                cfg = config.to_dict() if hasattr(config, "to_dict") else config
                run = wandb.init(project=project, config=cfg, save_code=True)
                self._wandb = wandb
                self.run_id = run.id
            except Exception as exc:
                # loud fallback: under a sweep agent, losing wandb also
                # loses the wandb.config overrides that drive the trial
                print(f"[tracking] wandb.init failed ({exc!r}); logging to stdout only")
                self._wandb = None

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        metrics = {k: _to_float(v) for k, v in metrics.items()}
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps({"step": step, **metrics}) + "\n")
        if not self.quiet and self._wandb is None:
            msg = " ".join(f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in metrics.items())
            print(f"[{self.project}] step {step}: {msg}", flush=True)

    def update_config(self, config: Any) -> None:
        if self._wandb is not None:
            cfg = config.to_dict() if hasattr(config, "to_dict") else config
            self._wandb.config.update(cfg, allow_val_change=True)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()


class Throughput:
    """steps/sec + items/sec meter (cubes/sec/chip for BASELINE.md).

    ``stats()`` is CUMULATIVE since ``start()`` — it includes the initial
    compile wait, so early readings underreport steady state (end-of-run
    summaries want this). ``window_stats()`` reports the rate since the
    previous ``window_stats()`` call — use it for per-boundary logging."""

    def __init__(self, items_per_step: int, num_chips: int = 1):
        self.items_per_step = items_per_step
        self.num_chips = max(num_chips, 1)
        self._t0: Optional[float] = None
        self._steps = 0
        self._win_t: Optional[float] = None
        self._win_steps = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0
        self._win_t = self._t0
        self._win_steps = 0

    def tick(self, n: int = 1) -> None:
        if self._t0 is None:
            self.start()
        self._steps += n
        self._win_steps += n

    def _rates(self, steps: int, dt: float) -> Dict[str, float]:
        sps = steps / max(dt, 1e-9)
        return {
            "steps_per_sec": sps,
            "items_per_sec": sps * self.items_per_step,
            "items_per_sec_per_chip": sps * self.items_per_step / self.num_chips,
        }

    def stats(self) -> Dict[str, float]:
        if self._t0 is None or self._steps == 0:
            return {}
        return self._rates(self._steps, time.perf_counter() - self._t0)

    def window_stats(self) -> Dict[str, float]:
        if self._win_t is None or self._win_steps == 0:
            return {}
        now = time.perf_counter()
        out = self._rates(self._win_steps, now - self._win_t)
        self._win_t = now
        self._win_steps = 0
        return out

    def rates_for_chunk(self, prev_step: int, step: int, freq: int):
        """window_stats() read at most ONCE per superstep chunk — the shared
        policy for both trainers' logging loops. Returns the windowed rates
        when (prev_step, step] crosses a ``freq`` logging boundary (the
        caller attaches them to EVERY boundary row the chunk emits), else
        None without consuming the window. window_stats() RESETS the
        window, so per-boundary reads would leave the second and later
        boundaries of one chunk with no rate fields (and the one row that
        had them would claim the multi-boundary aggregate)."""
        if step // freq == prev_step // freq:
            return None
        return self.window_stats()


def _process_index() -> int:
    """jax.process_index(), or 0 when no backend is reachable.

    Gated on ``jax.distributed.is_initialized()``: multi-host in this
    framework only exists through ``initialize_multihost`` (which calls
    ``jax.distributed.initialize``), so when the distributed runtime is
    absent the index is 0 BY DEFINITION — and skipping the query keeps
    Tracker construction free of backend-init side effects (the axon
    backend can block indefinitely on a dead tunnel, and initializing it
    under the caller would also pin the platform before a later
    ``jax.config.update("jax_platforms", ...)``).

    Looked up at call time (not cached) so tests can monkeypatch this
    function; the except arm covers interpreters without a usable jax."""
    try:
        import jax

        if not jax.distributed.is_initialized():
            return 0
        return jax.process_index()
    except Exception:
        return 0


def _to_float(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
