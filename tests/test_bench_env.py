"""bench.py env-factor normalization (r10 ask #3) — pure-Python checks
against synthetic prior artifacts (no Spark)."""

import json
import sys

sys.path.insert(0, "/root/repo")
from bench import _env_normalize  # noqa: E402


def _prior():
    # the SAME artifact _env_normalize will select (hardcoding a round
    # number here is how this test broke once BENCH_r11 landed)
    from bench import _select_prior

    prior, path = _select_prior(0.1)
    assert prior is not None and path.startswith("BENCH_r")
    return prior["queries"]


def test_uniform_drift_normalizes_to_parity():
    prior = _prior()
    timings = {k: round(v * 1.25, 3) for k, v in prior.items()}
    out = _env_normalize(timings, 0.1)
    assert out["env_factor"] == out["env_factor_raw"] == 1.25
    assert abs(out["normalized_vs_prior_shared"] - 1.0) < 0.02
    assert out["prior_artifact"].startswith("BENCH_r")


def test_across_the_board_regression_is_clamped():
    prior = _prior()
    timings = {k: round(v * 2.0, 3) for k, v in prior.items()}
    out = _env_normalize(timings, 0.1)
    assert out["env_factor_raw"] == 2.0
    assert out["env_factor"] == 1.4  # clamped: not absorbable as drift
    assert out["normalized_vs_prior_shared"] > 1.4


def test_no_prior_at_unknown_sf_returns_empty():
    prior = _prior()
    timings = {k: v for k, v in prior.items()}
    assert _env_normalize(timings, "/some/sf1/dir") == {}


def test_too_few_shared_queries_returns_empty():
    assert _env_normalize({"q1_pricing_summary": 1.0}, 0.1) == {}


def test_stdout_line_fits_driver_window():
    """The driver parses bench.py's JSON from the LAST 2000 bytes of
    stdout; r11's line outgrew it and the artifact recorded
    parsed=None (VERDICT r12 ask #8). Emulate the emitted compact line
    for the CURRENT headline list with worst-case-width timings and
    the full env-diagnostic field set, and assert the guard keeps it
    under 1900 bytes."""
    from bench import BENCH_QUERIES

    out = {
        "metric": "headline_suite_wall_seconds",
        "value": 9999.999,
        "unit": "sec",
        "queries": {name: 99.99 for name in BENCH_QUERIES},
        "sf": 0.1,
        "env_factor": 1.234,
        "env_factor_raw": 1.234,
        "prior_artifact": "BENCH_r99.json",
        "shared_queries": len(BENCH_QUERIES),
        "shared_total_sec": 9999.999,
        "shared_prior_sec": 9999.999,
        "normalized_total_sec": 9999.999,
        "normalized_vs_prior_shared": 1.234,
    }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        # the same drop order bench.py applies
        for k in ("shared_prior_sec", "shared_total_sec",
                  "prior_artifact", "env_factor_raw",
                  "normalized_total_sec"):
            out.pop(k, None)
            line = json.dumps(out, separators=(",", ":"))
            if len(line) <= 1900:
                break
    assert len(line) <= 1900, (
        f"bench stdout line would be {len(line)} bytes even after the "
        "diagnostic-drop fallback — the headline list has outgrown the "
        "driver's 2000-byte stdout window; shorten names or prune the "
        "env fields"
    )
