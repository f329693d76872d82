"""Round-13 (optimization round 2) pins: the bench tail line's
frozen-anchor membership and alarm truncation.

The driver parses bench.py's LAST stdout line from a ~2000-char captured
tail. Before r13 the truncated line ranked its per-query timings by THIS
run's cost, so any query that improved enough self-evicted from the
round-over-round comparison (r12: visible geomean 0.882 vs 1.12 over all
comparable queries), and a wide alarm sweep could push the line past the
budget entirely (95 alarms in the r13 baseline -> zero queries fit).
"""

import json
import importlib.util
import os


def _bench():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestBenchTailLine:
    def test_anchors_are_headline_members(self):
        b = _bench()
        assert len(b.TAIL_ANCHOR) == 13
        missing = [n for n in b.TAIL_ANCHOR if n not in b.HEADLINE]
        assert missing == [], missing

    def _payload(self, b, n_alarms):
        timings = {n: round(0.1 + (i % 37) * 0.07, 3)
                   for i, n in enumerate(b.HEADLINE)}
        tail_payload = {
            "metric": "headline_suite_total",
            "value": round(sum(timings.values()), 3),
            "unit": "sec", "queries": timings, "sf": 0.1,
            "n_queries": len(timings), "sentinel_sec": 0.15,
            "runs_merged": 1, "collapse_seam_build_sec": 9.0,
            "full_registry_total": 300.0,
            "full_registry_alarms": [f"entry_with_a_long_name_{i:03d}"
                                     for i in range(n_alarms)],
            "full_registry_sentinel_sec": 0.15,
            "full_registry_noise_factor": 1.0,
            "full_registry_n": 292,
        }
        return tail_payload, timings

    def test_anchor_membership_survives_truncation(self):
        """All 13 frozen anchors ride the line, the line fits the
        budget, and it stays one valid JSON object — for both a normal
        and a pathological (95-name) alarm list."""
        b = _bench()
        for n_alarms in (0, 5, 30, 95, 200):
            tail_payload, timings = self._payload(b, n_alarms)
            line = b._slim_tail_line(tail_payload, timings)
            assert len(line) <= b._TAIL_BUDGET, (n_alarms, len(line))
            parsed = json.loads(line)
            got = parsed["queries"]
            missing = [n for n in b.TAIL_ANCHOR if n not in got]
            assert missing == [], (n_alarms, missing)
            # timings on the line are the run's own, unmodified
            assert all(got[k] == timings[k] for k in got)
            # scalars survive slimming
            assert parsed["value"] == tail_payload["value"]
            assert parsed["queries_truncated"] is True

    def test_alarm_count_preserved_when_list_truncated(self):
        b = _bench()
        tail_payload, timings = self._payload(b, 95)
        parsed = json.loads(b._slim_tail_line(tail_payload, timings))
        assert parsed["full_registry_alarms_n"] == 95
        assert parsed.get("full_registry_alarms_truncated") is True
        assert len(parsed["full_registry_alarms"]) < 95

    def test_small_alarm_list_untouched(self):
        b = _bench()
        tail_payload, timings = self._payload(b, 5)
        parsed = json.loads(b._slim_tail_line(tail_payload, timings))
        assert parsed["full_registry_alarms"] == \
            tail_payload["full_registry_alarms"]
        assert "full_registry_alarms_truncated" not in parsed
