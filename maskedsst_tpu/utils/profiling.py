"""Profiling helpers.

The reference has no profiling at all (SURVEY.md §5.1). ``trace`` wraps
``jax.profiler`` (Perfetto/XProf trace directory) and degrades to wall-clock
timing when the backend does not support tracing (some tunneled TPU plugins
hang the profiler — guarded by a watchdog thread).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/maskedsst_trace", timeout_s: float = 10.0) -> Iterator[dict]:
    """Context manager: profiles the enclosed block when the backend allows.

    Yields a dict filled on exit with {'wall_s': float, 'traced': bool,
    'logdir': str|None}.
    """
    import jax

    info: dict = {"traced": False, "logdir": None}
    started = threading.Event()
    abandoned = threading.Event()

    def _start():
        try:
            jax.profiler.start_trace(logdir)
            if abandoned.is_set():
                # the watchdog already gave up: stop the late-started session
                # so it doesn't poison every later trace() in this process
                try:
                    jax.profiler.stop_trace()
                except Exception:
                    pass
                return
            info["traced"] = True
            info["logdir"] = logdir
        except Exception:
            pass
        finally:
            started.set()

    t = threading.Thread(target=_start, daemon=True)
    t.start()
    if not started.wait(timeout_s):  # hung profiler → proceed untraced
        abandoned.set()

    t0 = time.perf_counter()
    try:
        yield info
    finally:
        info["wall_s"] = time.perf_counter() - t0
        if info["traced"]:
            try:
                jax.profiler.stop_trace()
            except Exception:
                info["traced"] = False


# HLO categories that are CONTAINING events in the trace: a superstep's
# device `while` (and any conditional/call region) spans its body ops, so
# summing them double-counts every inner op. Detected round 3 on the
# Houston bench leg (device time > wall time); the exclusion must apply to
# EVERY consumer of the trace, hence this shared parser.
CONTROL_FLOW_CATS = frozenset({"while", "conditional", "call"})


class DeviceTrace:
    """Aggregated device-side op durations from one Perfetto trace export.

    Attributes
    ----------
    by_name: stripped op name → list of per-instance durations (ms).
             Control-flow envelopes are EXCLUDED (they are containers, not
             work); callers looking up kernel custom-call names are
             unaffected (Mosaic kernels export as hlo_category
             "custom-call", not "call" — validated on-chip, round 3).
    by_cat:  hlo_category → total ms (envelopes excluded).
    busy_ms: total device op time (envelopes excluded) — the metric.
    module_ms: the "XLA Modules" envelope total (wall span of each module,
             including inter-op idle gaps; always ≥ busy_ms on a correct
             trace).
    """

    def __init__(self) -> None:
        self.by_name: Dict[str, List[float]] = defaultdict(list)
        self.by_cat: Dict[str, float] = defaultdict(float)
        self.busy_ms: float = 0.0
        self.module_ms: float = 0.0

    @property
    def overcounted(self) -> bool:
        """Op sum exceeding the module envelope means an uncaught containing
        event kind is double-counting — the number is untrustworthy."""
        return self.module_ms > 0 and self.busy_ms > 1.02 * self.module_ms

    def undercount_vs_envelope(self) -> float:
        """busy_ms / module_ms (1.0 when no envelope was found).

        A low ratio is AMBIGUOUS: either the Perfetto export dropped op
        events (known on short traces) or the module legitimately contains
        device idle gaps (tiny-op workloads, DMA waits). busy_ms is still
        the correct busy-time metric in the latter case, so callers should
        warn, not reject, on a low ratio — and reject on `overcounted`."""
        if self.module_ms <= 0:
            return 1.0
        return self.busy_ms / self.module_ms


def parse_device_trace(logdir: str) -> Optional[DeviceTrace]:
    """Parse the NEWEST trace export under ``logdir`` into a DeviceTrace.

    Returns None when no trace file exists. This is the single trace-
    accounting policy for all perf tooling (kernel_tune, profile_step,
    bench_geometries) — three copies previously carried three subtly
    different policies, and the envelope-exclusion fix only landed in one.
    """
    paths = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    events = d.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "/device:" in e["args"].get("name", "")
    }
    tr = DeviceTrace()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        args = e.get("args", {})
        cat = args.get("hlo_category")
        dur_ms = e.get("dur", 0.0) / 1e3  # trace durations are in us
        if cat is None:
            # module-level envelope / python annotations; jit_ modules carry
            # the run_id arg — sum them as the envelope sanity anchor
            if "run_id" in args or e.get("name", "").startswith("jit_"):
                tr.module_ms += dur_ms
            continue
        if cat in CONTROL_FLOW_CATS:
            continue
        name = e.get("name", "?")
        # strip trailing .N instance suffixes so repeated instances aggregate
        base = name.rsplit(".", 1)
        if len(base) == 2 and base[1].isdigit():
            name = base[0]
        tr.by_name[name].append(dur_ms)
        tr.by_cat[cat] += dur_ms
        tr.busy_ms += dur_ms
    return tr


def traced_busy_ms(logdir: str, fn, timeout_s: float = 20.0) -> Optional[float]:
    """Run ``fn`` under ONE jax.profiler trace and return its device-busy
    milliseconds, or None when tracing fails, the trace is overcounted, or
    no device ops were captured (e.g. CPU backends whose traces carry no
    device pids). ``fn`` must force completion itself (host-fetch a result —
    block_until_ready is advisory on tunneled backends).

    This is the one home of the rmtree / trace / traced-flag / overcounted /
    busy>0 guard idiom (bench.py device attribution, zoo_tpu_check device
    column) — the round-3 lesson is that copies of trace-accounting policy
    diverge and the fix lands in only one."""
    import shutil

    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir, timeout_s=timeout_s) as info:
        fn()
    if not info["traced"]:
        return None
    tr = parse_device_trace(logdir)
    if tr is None or tr.overcounted or tr.busy_ms <= 0:
        return None
    return tr.busy_ms
