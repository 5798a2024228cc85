"""The driver-captured bench artifact schema (VERDICT r3 next #5).

Runs bench.py in QUICK mode on the CPU backend (a real end-to-end pass
through every metric path: mixed batch, homogeneous ladder, sample
throughput, triplet, long pair) and asserts the emitted JSON line carries
every field BENCH_r*.json is expected to record — so a bench.py refactor
cannot silently drop the ladder or sample metrics from the artifact.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_bench_quick_json_schema():
    env = dict(os.environ)
    env.update(
        BENCH_QUICK="1",
        COATI_TPU_FORCE_PLATFORM="cpu",
        JAX_PLATFORMS="cpu",
        BENCH_MAX_PASSES="2",
        BENCH_PASS_BUDGET_S="30",
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # the contract: stdout is ONE JSON line
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    out = json.loads(lines[0])

    for key in (
        "metric", "value", "unit", "vs_baseline", "cells_per_sec",
        "n_pairs", "batch_seconds", "pass_seconds", "stat",
        "baseline_cells_per_sec", "triplet_cells_per_sec",
        "triplet_long_cells_per_sec", "longpair_cells_per_sec",
        "samples_per_sec", "sample_n", "sample_nt",
        "samples_production_per_sec",
        "samples_baseline_per_sec", "samples_vs_baseline",
        "sample_long_per_sec", "sample_long_n", "sample_long_nt",
        "sample_long_vs_baseline",
        "device_seconds", "device_chunk_breakdown", "ladder", "device",
    ):
        assert key in out, key
    # device-only pass time (VERDICT r4 #5): estimated per-chunk via
    # single-dispatch device loops; must be positive and carry a breakdown
    assert out["device_seconds"] > 0
    assert isinstance(out["device_chunk_breakdown"], list)
    assert out["device_chunk_breakdown"]
    for entry in out["device_chunk_breakdown"]:
        assert entry["n_chunks"] >= 1 and entry["device_ms_per_chunk"] > 0
    # the sample metric carries its native single-thread anchor column
    # (reference-equivalent Forward + N-traceback workload)
    assert out["samples_vs_baseline"] is None or out["samples_vs_baseline"] > 0
    assert out["sample_long_per_sec"] > 0
    assert out["metric"] == "alignments_per_sec_mixed10k_marmg"
    assert out["value"] > 0
    assert out["stat"] == "median_of_agreeing_passes"
    # every pass time recorded (auditability, VERDICT r3 weak #3)
    assert isinstance(out["pass_seconds"], list) and out["pass_seconds"]
    assert all(t > 0 for t in out["pass_seconds"])
    # homogeneous ladder entries mirror the reference harness shape
    assert isinstance(out["ladder"], list) and out["ladder"]
    for entry in out["ladder"]:
        for key in ("nt", "n_pairs", "cells_per_sec",
                    "alignments_per_sec", "pass_seconds"):
            assert key in entry, entry
        assert entry["cells_per_sec"] > 0
    # sample throughput is a first-class metric
    assert out["samples_per_sec"] > 0
