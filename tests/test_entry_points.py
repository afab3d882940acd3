"""Driver entry-point contracts: __graft_entry__ and bench.py.

The round driver invokes ``python -c "import __graft_entry__;
__graft_entry__.dryrun_multichip(8)"`` and ``python bench.py`` with whatever
``python`` its PATH resolves to. The image carries a bare system python with
no scientific stack next to the real /opt/venv interpreter, so both entry
points carry an interpreter fallback (re-exec / venv subprocess). These
tests pin the cheap invariants on the working interpreter; the bare-python
legs were validated end-to-end by hand (CLAUDE.md, end-of-round-2 notes).
"""

import sys


def test_graft_entry_imports_without_heavy_deps():
    """Module import must stay lazy: the driver imports it before calling
    dryrun_multichip, under an interpreter we don't control."""
    import __graft_entry__  # noqa: F401

    assert callable(__graft_entry__.entry)
    assert callable(__graft_entry__.dryrun_multichip)


def test_reexec_guard_inactive_in_venv():
    """Under the real interpreter (numpy importable) the fallback must be a
    no-op returning False — never spawning a subprocess."""
    import __graft_entry__

    assert __graft_entry__._reexec_if_bare(8) is False


def test_bench_module_importable_without_side_effects():
    """bench.py's re-exec shim is gated on __main__: importing the module
    must neither exec nor probe the device."""
    import importlib

    mod = importlib.import_module("bench")
    assert mod.BASELINE_CUBES_PER_SEC > 0
    assert "bench" in sys.modules
