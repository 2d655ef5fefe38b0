"""Close-out scaling tripwires, promoted from manual tool runs into
the test suite (r7 verdict, Next round #4): a plan regression between
rounds — a walk step join regaining a second equi-key, a sketch
losing its partial-aggregate shape — previously stayed invisible
until someone re-ran tools/*_scaling.py by hand. These tests execute
the same tools as subprocesses (fresh JVM with the UI REST API on,
which the shuffle-byte measurement needs) and assert the tools' own
gates plus the headline deltas.

Skipped by default (they cost minutes each); the round close-out runs

    python -m pytest -m scaling -q

or set RUN_SCALING=1. Full 1x/10x/100x curves stay in the tools.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(args: list[str], timeout: int = 560):
    """Run a tools/ script, return (exit_code, parsed JSON lines)."""
    proc = subprocess.run(
        [sys.executable, *args], cwd=REPO, timeout=timeout,
        capture_output=True, text=True)
    cells = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                cells.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    assert proc.returncode == 0, (
        f"{args} exited {proc.returncode}\n--- stdout tail ---\n"
        f"{proc.stdout[-3000:]}\n--- stderr tail ---\n"
        f"{proc.stderr[-2000:]}")
    return cells


@pytest.mark.scaling
def test_walk_ksweep_no_per_step_reexchange():
    """The walk family's re-exchange tripwire at the documented fast
    setting (sf0.1, factor 10 => ~1.5 M edges, above the 512 KB-floor
    regime): per-step shuffle delta must be frontier-sized for both
    random_walks and node2vec_walks, with the |E|-proportional limit
    (not the small-scale floor) as the binding gate. A regression to a
    two-key step join shows as ~one |E| exchange (~12 MB/M edges) per
    extra step and fails the tool."""
    cells = _run_tool(
        [os.path.join("tools", "walk_scaling.py"),
         "/root/testdata/sf0.1", "--ksweep", "10"])
    gates = [c for c in cells if "per_step_shuffle_mb" in c]
    assert {c["op"] for c in gates} == {"random", "node2vec"}, gates
    for g in gates:
        assert g["ok"], f"re-exchange: {g}"
        assert g["binding"] == "edges-proportional", (
            f"512 KB floor binding at this factor — gate is not "
            f"|E|-proportional: {g}")


@pytest.mark.scaling
def test_pq_adc_scan_shuffle_stays_corpus_independent():
    """The PQ tripwire (r8 verdict, Next #5): the wide-code ADC scan's
    only shuffle is the WindowGroupLimit's partial top-k stream, so
    its measured shuffle-write bytes must stay ~constant while the
    encoded corpus grows 8x (16k -> 128k vectors here; the falsified
    r8 (sub, code) equi-join shape would re-shuffle n*q*S rows and
    blow the tool's 3x-growth and 25%-of-codes-bytes gates). The
    row-contract gate (n_queries * topk rows) rides along via the
    tool's exit code."""
    cells = _run_tool(
        [os.path.join("tools", "pq_scaling.py"),
         "/root/testdata/sf0.1", "--factors", "8,64", "--reps", "1"])
    gate = [c for c in cells if c.get("gate") == "pq_scan_shuffle"]
    assert gate and gate[0]["ok"], gate
    assert gate[0]["corpus_growth"] >= 8.0, gate


@pytest.mark.scaling
def test_kmeans_pipeline_shuffle_stays_corpus_independent():
    """The k-means tripwire (r9 verdict, Next #5 — the PQ treatment for
    pipeline/cluster.py's kernel rewrite): the whole kmeans_fixed
    pipeline — seed rank, refit, final assignment — shuffles only
    codebook-sized data, so measured shuffle-write bytes must stay
    ~flat while the corpus grows 8x (16k -> 128k vectors; measured
    383 -> 381 KB). A regression to the falsified crossJoin +
    groupBy(vec_id) min-struct assignment would move >= one corpus of
    (vec_id, struct(d2, cid, v)) rows per iteration and blow the
    tool's 3x-growth and 1%-of-vector-bytes gates. The row contract
    (n rows out, cluster ids within [0, k)) rides along via the tool's
    exit code."""
    cells = _run_tool(
        [os.path.join("tools", "kmeans_scaling.py"),
         "/root/testdata/sf0.1", "--factors", "8,64", "--reps", "1"])
    gate = [c for c in cells if c.get("gate") == "kmeans_shuffle"]
    assert gate and gate[0]["ok"], gate
    assert gate[0]["corpus_growth"] >= 8.0, gate


@pytest.mark.scaling
def test_keyed_upsert_rewrites_touched_buckets_not_table():
    """The mutate-family tripwire (r9 verdict, Next #1): a keyed upsert
    against the bucketed layout (mutate/bucketed.py) rewrites
    O(|batch| + touched-bucket bytes), not O(table) — at a 10x table
    growth with a fixed ~50-key batch the rewritten fraction must fall
    to <= 15 % (a naive full-table rewrite is 100 % at every factor)
    and rewritten bytes must grow sub-sqrt. The TTL purge against the
    day-partitioned layout must rewrite ZERO bytes (partition drops
    are metadata ops). Exactness rides along via the tool's exit code:
    the reloaded table must equal the full-table logical operator's
    post-image."""
    cells = _run_tool(
        [os.path.join("tools", "mutate_scaling.py"),
         "/root/testdata/sf0.01", "--factors", "10,100",
         "--ops", "upsert,ttl"])
    up = [c for c in cells if c.get("gate") == "upsert_partial_rewrite"]
    ttl = [c for c in cells if c.get("gate") == "ttl_zero_rewrite"]
    assert up and up[0]["ok"], up
    assert up[0]["table_growth"] >= 10.0, up
    assert ttl and ttl[0]["ok"], ttl


@pytest.mark.scaling
def test_sketch_shuffle_bytes_stay_constant():
    """The sketch-constancy tripwire at 1x/10x (sf0.1 — at sf0.01 the
    HLL arm's ~190 KB base is AQE/metadata noise and the ratio is
    meaningless; at sf0.1 the measured cells are HLL 572 -> 675 KB
    (1.18x) vs exact-distinct 933 -> 7,912 KB (8.5x)): HLL's shuffle
    bytes are partial-aggregate-state-sized (registers x partitions,
    independent of input rows) while exact distinct must move the key
    universe and grows ~linearly. The tool's own gates (HLL within
    16 % of exact, CMS never-underestimate + 3N/w bound, percentile
    bins exact) are asserted via its exit code."""
    cells = _run_tool(
        [os.path.join("tools", "sketch_scaling.py"),
         "/root/testdata/sf0.1", "--factors", "1,10"])
    by = {(c["op"], c["factor"]): c for c in cells if "op" in c}
    hll = (by[("hll", 10)]["shuffle_kb"]
           / max(by[("hll", 1)]["shuffle_kb"], 1.0))
    exact = (by[("exact_distinct", 10)]["shuffle_kb"]
             / max(by[("exact_distinct", 1)]["shuffle_kb"], 1.0))
    assert hll <= 2.0, f"HLL shuffle grew {hll:.2f}x over 10x input"
    assert exact >= 4.0, (
        f"exact-distinct control only grew {exact:.2f}x — the 10x "
        f"amplification itself is broken, constancy proves nothing")
