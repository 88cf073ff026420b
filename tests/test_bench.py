"""The driver contract of bench.py: exactly ONE JSON line on stdout with
keys {metric, value, unit, vs_baseline}, diagnostics on stderr only.
Runs tiny shapes on the CPU backend (conftest forces it); the real-TPU
numbers live in BENCHMARKS.md.
"""

import io
import json
import sys
from contextlib import redirect_stdout

import pytest

import bench


def run_bench(argv):
    old = sys.argv
    sys.argv = ["bench.py"] + argv
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = bench.main()
        return rc, buf.getvalue()
    finally:
        sys.argv = old


@pytest.mark.parametrize("extra", [
    [],                                  # default: blocked L=128, mixed
    ["--block", "0", "--no-pallas"],     # sequential pure-XLA loop
    ["--dtype", "float64"],              # exact-parity dtype
])
def test_one_json_line_contract(extra):
    rc, out = run_bench(["--vars", "1200", "--constraints", "250",
                         "--iters", "16", "--repeats", "1"] + extra)
    assert rc == 0
    lines = [l for l in out.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert set(rec) == {"metric", "value", "unit", "vs_baseline",
                        "ceiling_gbs", "floor_ms_per_pivot",
                        "efficiency_pct", "pivot_rule",
                        "dantzig_ms_per_pivot",
                        "build_trace_s", "build_compile_s",
                        "build_exec_s", "loop_trace_s", "loop_compile_s"}
    # Setup attribution (VERDICT r4 next #6): every stage measured and
    # non-negative; the pivot rule of record is the resolved default.
    for k in ("build_trace_s", "build_compile_s", "build_exec_s",
              "loop_trace_s", "loop_compile_s"):
        assert rec[k] >= 0
    assert rec["pivot_rule"] in ("dantzig", "devex", "bland")
    assert rec["unit"] == "GB/s/chip"
    assert rec["value"] > 0
    # Self-normalization keys (VERDICT r3 #3): a positive in-run RMW
    # ceiling and a physical floor consistent with it.
    assert rec["ceiling_gbs"] > 0
    assert rec["floor_ms_per_pivot"] > 0
    assert rec["efficiency_pct"] > 0
    # value and vs_baseline are rounded independently (1 and 2 decimals).
    assert rec["vs_baseline"] == pytest.approx(
        rec["value"] / bench.REFERENCE_GBPS, abs=0.011)
