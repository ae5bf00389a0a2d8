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
