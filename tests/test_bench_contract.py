"""The driver-facing bench contract (round-6 verdict item 2): bench.py's
final stdout line must parse as JSON and fit the driver's 2,000-char tail
capture with margin — BENCH_r04–r06 all recorded `parsed: null` because the
full document (4.3–4.6 KB by round 6) was printed as the final line, which
silently dropped three rounds of cross-round trend data. The full document
now goes to bench_r{N}_local.json; `_compact_summary` is what the driver
sees, so its size bound and required keys are pinned here against a
representative full record (14 headline queries, realistic name lengths,
worst-case regression entries)."""

from __future__ import annotations

import json

from bench import _compact_summary

_QUERY_NAMES = [
    "topk_revenue_raw_24h", "rollup_1m", "topk_per_key", "dup_ngram_spans",
    "cosine_topk", "semantic_dedup", "q9_profit_by_nation_year",
    "q21_waiting_suppliers", "pricing_summary", "top_customers",
    "minhash_lsh_neardup", "bloom_prefilter_join", "trending_decayed_topk",
    "int8_quantized_topk",
]


def _full_record(n_regressions: int = 0) -> dict:
    timings = {n: 1.2345 for n in _QUERY_NAMES}
    return {
        "metric": "headline_queries_total_time",
        "value": 12.3456,
        "unit": "sec",
        "queries": timings,
        "r01_subset_total": 3.2109,
        "sf": 0.1,
        "streaming_ingest": {
            "events_per_sec": 26598.4,
            "trial_walls_s": [7.5191, 8.1234],
        },
        "streaming_ingest_skewed": {
            "events_per_sec": 33558.1,
            "trial_walls_s": [5.9601, 6.2345],
        },
        "streaming_scaling": {
            "neardup": {"rocksdb": {"alpha": 0.972}},
            "flagged": [],
        },
        "streaming_join_scaling": {"alpha": 0.136, "flagged": []},
        "streaming_join_skew": {
            "skew_over_uniform_per_pair": 0.084,
            "salted_over_uniform_per_pair": 0.093,
            "hot": {"salted_speedup": 1.9},
            "flagged": [],
        },
        "streaming_chain": {
            "chain_over_join_only": 1.113,
            "three_op_over_join_only": 1.2,
            "flagged": [],
        },
        "e2e_latency": {"raw_visible_s": 0.718, "rollup_visible_s": 1.675},
        "serving_point_read": {"warm": {"p50_ms": 40.9, "p99_ms": 59.0}},
        "serving_trending": {
            "rank_on_read": {"p50_ms": 133.5, "p99_ms": 164.1},
            "preranked": {"p50_ms": 72.7, "p99_ms": 95.8},
            "routed": {"p50_ms": 74.1, "p99_ms": 97.2},
        },
        "serving_percentiles": {
            "warm": {"p50_ms": 88.3, "p99_ms": 141.2},
            "cold_first_ms": {"p50_ms": 301.4},
        },
        "percentile_ladder": {
            "revenue_cents": {"rows_ratio": 1.0, "routed_speedup": 1.05},
            "quantity": {"rows_ratio": 1.14, "routed_speedup": 0.84},
            "quantity_dense": {"rows_ratio": 14.7, "routed_speedup": 2.31},
        },
        "serving_scaling": {
            "step": 10.0,
            "alphas": {
                "percentiles_warm": {"ref_p50_ms": 60.1, "main_p50_ms": 88.3,
                                     "alpha": 0.167},
                "trending_routed": {"ref_p50_ms": 50.2, "main_p50_ms": 74.1,
                                    "alpha": 0.169},
            },
        },
        "quantile_state": {
            "exact_large": {"raw_over_blob": 10.0,
                            "blob_bytes_binary": 400000},
            "gk": {"state_mem_per_key": 2048},
            "exact_over_gk_mem": 183.2,
        },
        "sliding_ratio": {
            "5m_1m": {"amplify_over_slices": 0.9},
            "1h_1m": {"amplify_over_slices": 2.201},
        },
        "sliding_state_rows": {
            "direct": {"final_state_rows": 300, "peak_state_rows": 54000},
            "slices": {"final_state_rows": 5, "peak_state_rows": 10900},
            "direct_over_slices_final": 60.0,
        },
        "scaling": {
            "flagged": [],
            "per_query": {
                n: {"sf0.001": 0.21, "sf0.01": 0.52, "main": 1.2345,
                    "alpha": 0.374}
                for n in _QUERY_NAMES
            },
        },
        "queries_retry": {"topk_revenue_raw_24h": 0.4097},
        "methodology": {"changed_this_round": [], "history": {}},
        "regressions": [
            {
                "query": "q21_waiting_suppliers",
                "prev_s": 1.3672,
                "now_s": 1.8622,
                "ratio": 1.36,
                "retry_s": 1.4011,
            }
        ] * n_regressions,
        "regressions_noise_cleared": [],
        "regressions_window_contended": [],
        "canary_s": {"first": 0.21, "retry": None},
    }


def test_compact_line_parses_and_fits_tail_capture():
    line = _compact_summary(_full_record(), "bench_r7_local.json")
    assert len(line) <= 1500, f"compact line is {len(line)} bytes"
    parsed = json.loads(line)
    # keys the cross-round readers depend on: the regression gate needs
    # queries+sf; the judge's trend table needs the rest.
    for k in (
        "metric", "value", "unit", "queries", "r01_subset_total", "sf",
        "ingest_eps", "ingest_skew_eps", "e2e_raw_s", "e2e_rollup_s",
        "serve_p50_ms", "serve_p99_ms", "trending_p99_ms",
        "trending_routed_p99_ms", "pctile_p99_ms", "ladder_ratio_qty",
        "ladder_ratio_rev", "ladder_ratio_dense", "ladder_speedup_dense",
        "serve_alpha_pct", "serve_alpha_trend_routed",
        "qstate_raw_over_blob",
        "sliding_r60_amp_over_slices", "sliding_r60_state_ratio", "join_alpha",
        "join_skew_per_pair_ratio", "chain_over_join_only",
        "scaling_flagged", "regressions", "detail",
    ):
        assert k in parsed, f"missing {k}"
    assert parsed["queries"] == {n: 1.2345 for n in _QUERY_NAMES}


def test_compact_line_round14_additions():
    """VERDICT r14 #7/#8 (additions-only): queries_retry and per-query
    scaling alphas ride the compact line when present; methodology_changed
    appears only when a round actually changed a measurement; no
    pre-existing key is renamed or dropped."""
    line = _compact_summary(_full_record(), "bench_r14_local.json")
    assert len(line) <= 1500, f"compact line is {len(line)} bytes"
    parsed = json.loads(line)
    assert parsed["queries_retry"] == {"topk_revenue_raw_24h": 0.4097}
    # alphas ride as a list aligned with the queries map's key order
    assert parsed["scaling_alpha"] == [0.374] * len(_QUERY_NAMES)
    assert list(parsed["queries"]) == _QUERY_NAMES
    assert "methodology_changed" not in parsed  # empty ⇒ omitted
    rec = _full_record()
    rec["methodology"]["changed_this_round"] = ["ingest_two_trial_min"]
    parsed = json.loads(_compact_summary(rec, "bench_r14_local.json"))
    assert parsed["methodology_changed"] == ["ingest_two_trial_min"]


def test_compact_line_sheds_new_keys_before_queries():
    """Overflow shedding drops the round-14 additions FIRST (the detail
    record always carries them); the queries block is only shed after."""
    rec = _full_record(n_regressions=6)
    line = _compact_summary(rec, "bench_r14_local.json")
    assert len(line) <= 1500
    parsed = json.loads(line)
    # with 6 regression entries the alphas no longer fit, but queries must
    # survive as long as shedding the additions suffices
    if "scaling_alpha" not in parsed:
        assert parsed["queries"] == {n: 1.2345 for n in _QUERY_NAMES} or (
            parsed["queries"] == {"see": "bench_r14_local.json"}
        )


def test_compact_line_sheds_queries_rather_than_overflowing():
    # Worst case: many confirmed regressions bloat the line — the queries
    # block must be shed (it lives in the detail file) and the result must
    # STILL parse and fit.
    line = _compact_summary(_full_record(n_regressions=12), "bench_r7_local.json")
    assert len(line) <= 1500, f"compact line is {len(line)} bytes"
    parsed = json.loads(line)
    assert parsed["queries"] == {"see": "bench_r7_local.json"}
    # regressions may be per-entry-compacted or a bare count, but the signal
    # (12 confirmed regressions) must survive the shedding
    r = parsed["regressions"]
    assert (len(r) if isinstance(r, list) else r) == 12


def test_detail_record_name_collision_guard(tmp_path):
    """Round-7 verdict item 1: the driver re-runs bench AFTER the builder
    commits bench_r{N}_local.json, and the overwrite left the committed
    record silently diverged from disk at judging time. The guard: a
    git-tracked-and-present target routes to the gitignored .driver.json
    name; an uncommitted record (the builder iterating pre-commit) is still
    overwritten in place."""
    import subprocess

    from bench import _detail_record_name

    here = str(tmp_path)
    # no file yet -> plain name
    assert _detail_record_name(here, [7]) == "bench_r8_local.json"
    # file exists but is untracked (no git repo even) -> still plain name
    (tmp_path / "bench_r8_local.json").write_text("{}")
    assert _detail_record_name(here, [7]) == "bench_r8_local.json"
    # tracked and present -> refuse to clobber
    subprocess.run(["git", "init", "-q"], cwd=here, check=True)
    subprocess.run(["git", "add", "bench_r8_local.json"], cwd=here, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-qm", "rec"],
        cwd=here, check=True,
    )
    assert _detail_record_name(here, [7]) == "bench_r8_local.driver.json"
    # a later round's name is free again
    assert _detail_record_name(here, [8]) == "bench_r9_local.json"


def test_prior_canary_floor_reads_newest_record(tmp_path):
    from bench import _prior_canary_floor

    assert _prior_canary_floor(str(tmp_path)) is None
    (tmp_path / "bench_r6_local.json").write_text(
        json.dumps({"canary_s": {"first": 0.30, "retry": None}})
    )
    (tmp_path / "bench_r7_local.json").write_text(
        json.dumps({"canary_s": {"first": 0.15, "retry": 0.2}})
    )
    assert _prior_canary_floor(str(tmp_path)) == 0.15
    # newest record malformed -> falls back to the next one
    (tmp_path / "bench_r8_local.json").write_text("not json")
    assert _prior_canary_floor(str(tmp_path)) == 0.15


def test_prior_canary_floor_prefers_committed_records(tmp_path):
    """An untracked record (e.g. a driver-window .driver.json) must not
    become the floor when a committed record exists — the committed one is
    the reviewed evidence; uncommitted windows may be arbitrarily idle or
    contended."""
    import subprocess

    from bench import _prior_canary_floor

    (tmp_path / "bench_r6_local.json").write_text(
        json.dumps({"canary_s": {"first": 0.30}})
    )
    subprocess.run(["git", "init", "-q"], cwd=str(tmp_path), check=True)
    subprocess.run(
        ["git", "add", "bench_r6_local.json"], cwd=str(tmp_path), check=True
    )
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-qm", "rec"],
        cwd=str(tmp_path), check=True,
    )
    # newer but untracked records (plain and .driver) must be ignored
    (tmp_path / "bench_r7_local.json").write_text(
        json.dumps({"canary_s": {"first": 0.05}})
    )
    (tmp_path / "bench_r7_local.driver.json").write_text(
        json.dumps({"canary_s": {"first": 0.04}})
    )
    assert _prior_canary_floor(str(tmp_path)) == 0.30
