"""Pin the bench stdout contract: ONE compact JSON line.

The per-round driver keeps only the last 2000 characters of bench.py's
stdout and json-parses them. Rounds 3 and 4 both recorded
``"parsed": null`` because the verbose line outgrew that window — the
judge never saw the headline metric. These tests pin the compact-line
codec so that can't regress.
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "bench_mod", os.path.join(REPO, "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def _fat_record() -> dict:
    """A record at least as verbose as the real r4 one."""
    return {
        "metric": "headline_suite_seconds",
        "value": 176.25,
        "unit": "sec",
        "queries": {
            "pagerank_1e6": 41.63, "cc": 11.15, "lp": 6.97,
            "triangles": 11.64, "extract_edges": 2.17,
            "pagerank_delta_1e6": 36.91, "pagerank_cogroup_1e6": 53.97,
            "minhash_dedup": 10.62, "cosine_topk": 1.19,
        },
        "sf": "0.1",
        "pagerank": {
            "iter_seconds": 38.49, "supersteps": 59, "converged": True,
            "n_edges": 330301, "edges_per_sec": 506249.06,
            "supersteps_per_hour": 5101.97, "backend": "relational",
            "input": "bucketed_table",
            "timed_region": "edge_scan+degrees+init+supersteps",
            "edges_per_sec_basis": "iter_seconds",
            "note": "x" * 400,
        },
        "scaling": {
            "cores_low": 8, "cores_high": 32, "seconds_low": 28.12,
            "seconds_high": 58.6, "n_edges": 13396631, "supersteps": 3,
            "efficiency": 0.11,
            "host_mem_bandwidth_gbps": {"p1": 6.2, "p2": 10.7, "p8": 42.5},
            "note": "y" * 400,
        },
        "scaling_diag": {
            "cores_low": 2, "cores_high": 8, "seconds_low": 47.35,
            "seconds_high": 28.12, "n_edges": 13396631, "supersteps": 3,
            "efficiency": 0.44, "note": "z" * 300,
        },
        "scaling_cogroup": {
            "cores_low": 8, "cores_high": 32, "seconds_low": 108.56,
            "seconds_high": 110.31, "n_edges": 13396631, "supersteps": 10,
            "efficiency": 0.238, "backend": "cogroup", "note": "w" * 300,
        },
        "scaling_standalone": {
            "proxy": "standalone-cluster", "backend": "relational",
            "executors_low": 1, "executors_high": 4, "exec_cores": 1,
            "cores_low": 1, "cores_high": 4, "supersteps": 3,
            "num_parts": 32, "n_edges": 26831934,
            "iter_seconds_low": 144.412, "iter_seconds_high": 59.048,
            "edges_per_sec_low": 557404.0, "edges_per_sec_high": 1363217.0,
            "efficiency": 0.611, "n_vertices": 4000000, "note": "v" * 400,
        },
        "bucketed_probe": {"plain_s": 3.83, "bucketed_s": 2.52},
        "webtext_ops": {"host_graph_s": 0.63, "sessionize_s": 0.68},
    }


def test_compact_line_fits_driver_window():
    line = bench._compact_line(_fat_record(), "/tmp/BENCH_local_latest.json")
    assert len(line) <= 1900
    assert "\n" not in line
    parsed = json.loads(line)
    # the driver contract fields survive
    assert parsed["metric"] == "headline_suite_seconds"
    assert parsed["value"] == 176.25
    assert parsed["unit"] == "sec"
    assert parsed["queries"]["pagerank_1e6"] == 41.63
    assert parsed["sf"] == "0.1"
    # the north-rule numbers survive compaction
    assert parsed["pagerank"]["supersteps_per_hour"] == 5101.97
    assert parsed["scaling_standalone"]["efficiency"] == 0.611
    assert parsed["scaling_standalone"]["executors_high"] == 4


def test_compact_line_degrades_diagnostics_first():
    rec = _fat_record()
    # 30 medium-named queries → the full verbose record cannot fit; the
    # codec must drop diagnostics, never the headline metric/queries
    rec["queries"] = {f"bench_query_name_{i:03d}": 1.23 for i in range(30)}
    line = bench._compact_line(rec, None)
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_seconds"
    assert len(parsed["queries"]) == 30
    assert parsed["scaling_standalone"]["efficiency"] == 0.611


def test_compact_line_propagates_probe_error():
    rec = _fat_record()
    rec["scaling_standalone"] = {"error": "RuntimeError('boom')" + "x" * 600}
    parsed = json.loads(bench._compact_line(rec, None))
    assert len(parsed["scaling_standalone"]["error"]) <= 120
