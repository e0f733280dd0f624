"""Import smoke test — no Spark session needed, runs in milliseconds.

Round 4 shipped a one-line SyntaxError in queries/joins.py that zeroed
the entire driver contract (CORRECTNESS_r04 = {}, bench rc=1). This test
makes that class of bug fail loudly and instantly: every source file
must compile, every queries module must import, and the registry must
hold its full complement.
"""

from __future__ import annotations

import compileall
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dbx_workspace_and_emr_iceberg_spark")


def test_package_compiles():
    assert compileall.compile_dir(PKG, quiet=1, force=True), (
        "a source file in the package fails to compile — see stderr"
    )


def test_no_broken_query_modules():
    from dbx_workspace_and_emr_iceberg_spark.registry import (
        _BROKEN_MODULES,
        all_queries,
    )

    all_queries()
    assert _BROKEN_MODULES == {}, f"query modules failed to import: {_BROKEN_MODULES}"


def test_registry_full():
    from dbx_workspace_and_emr_iceberg_spark.registry import all_queries

    n = len(all_queries())
    assert n >= 160, f"registry shrank to {n} queries (expected >= 160)"


def test_driver_contract_importable():
    import __spark_entry__ as entry

    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert len(qs) >= 160
    assert set(os_) <= set(qs), "oracle_sql keys must be a subset of queries"


def test_driver_priority_names_resolve():
    # a typo'd changed-list name is silently ignored by the ordering —
    # the query would quietly lose its front-of-budget slot
    from dbx_workspace_and_emr_iceberg_spark import registry

    qs = registry.all_queries()
    missing = [n for n in registry._CHANGED_THIS_ROUND if n not in qs]
    assert not missing, f"changed-list names not in registry: {missing}"
    assert len(set(registry._CHANGED_THIS_ROUND)) == len(
        registry._CHANGED_THIS_ROUND
    )


def test_driver_order_rule():
    """Pin the derived driver ordering (r9 verdict #2): changed names
    first in list order, then every never-sampled query, then the rest
    with last-green round non-decreasing — so a stale hand list can
    never again spend the driver budget on already-green rows."""
    from dbx_workspace_and_emr_iceberg_spark import driver_history as H
    from dbx_workspace_and_emr_iceberg_spark import registry

    order = list(registry.queries_dict())
    changed = [n for n in registry._CHANGED_THIS_ROUND]
    assert order[: len(changed)] == changed

    tail = order[len(changed):]
    never = [n for n in tail if n not in H.LAST_SAMPLED]
    # every never-sampled query sits immediately after the changed tier
    assert tail[: len(never)] == never, (
        "never-sampled queries must precede all sampled ones"
    )
    greens = [H.LAST_GREEN.get(n, 0) for n in tail[len(never):]]
    assert greens == sorted(greens), "stalest-green must come first"


def test_driver_history_derives_from_record():
    """driver_history derives its maps at IMPORT time from the
    CORRECTNESS_r*.json files (r14, VERDICT-r13 #1) — the generated
    file + regeneration ritual it replaces was stale by construction
    at every judging point (the driver drops the round's result file
    AFTER the final commit).  The module-level maps must equal a fresh
    fold of the repo record.  (Historical names are deliberately NOT
    validated against the live registry: a renamed query keeps its old
    name in the immutable CORRECTNESS record and is simply demoted to
    never-sampled under its new name — wanted behavior; as of r14 the
    two sets happen to coincide exactly, 296=296.)"""
    from dbx_workspace_and_emr_iceberg_spark import driver_history as H

    last_green, last_sampled = H.collect()
    assert H.LAST_GREEN == last_green and H.LAST_SAMPLED == last_sampled
    assert set(last_green) <= set(last_sampled)
    assert last_sampled, "repo record present but fold returned nothing"


def test_driver_history_fold_semantics(tmp_path, capsys):
    """Pin the green rules on a synthetic record: hash_match=True is
    green; a clean rows-only run (err='no_oracle', compare fields
    absent-by-design) is green; a failed run that smuggles
    err='no_oracle' alongside partial compare fields is NOT (ADVICE
    r10); latest round wins; a half-written JSON file is skipped
    without poisoning the rest — but LOUDLY (review-pass r14: a
    silently dropped round would misdirect the driver budget, the r9
    failure mode)."""
    import json as _json

    from dbx_workspace_and_emr_iceberg_spark import driver_history as H

    (tmp_path / "CORRECTNESS_r01.json").write_text(_json.dumps({
        "q_green": {"hash_match": True, "err": None},
        "q_flaky": {"hash_match": False, "err": "boom"},
        "q_rows_only": {
            "err": "no_oracle", "spark_rows": 7,
            "rows_match": None, "schema_match": None, "hash_match": None,
        },
        "q_fake_rows_only": {
            # partial compare fields present -> must not read green
            "err": "no_oracle", "spark_rows": 7,
            "rows_match": True, "schema_match": None, "hash_match": None,
        },
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(_json.dumps({
        "q_green": {"hash_match": True, "err": None},
        "q_flaky": {"hash_match": True, "err": None},
        # a non-dict ROW is skipped loudly too (review-pass r14),
        # without poisoning the file's other rows
        "q_bad_row": None,
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text("{ not json")

    last_green, last_sampled = H.collect(str(tmp_path))
    assert last_green == {"q_green": 2, "q_flaky": 2, "q_rows_only": 1}
    assert last_sampled == {
        "q_green": 2, "q_flaky": 2, "q_rows_only": 1, "q_fake_rows_only": 1,
    }
    err = capsys.readouterr().err
    assert "CORRECTNESS_r03.json" in err and "NOT reflected" in err
    assert "q_bad_row" in err


def test_rows_only_set_is_pinned():
    """EVERY registered query carries a value oracle as of r17
    (VERDICT-r16 #6): the last rows-only entry, x3g, now runs the
    numpy-matmul top-k over quantized unit vectors where every float64
    partial sum is an exact integer, so its ranking is x3h's
    integer-exact key and the shared _X3H_ORACLE replays it
    value-for-value — while still costing exactly ONE plan execution
    under the bench clock (no in-function flag action). A new query
    landing without an oracle fails this instead of silently shifting
    the evidence mix the judge audits."""
    from dbx_workspace_and_emr_iceberg_spark.registry import all_queries

    rows_only = {n for n, q in all_queries().items() if q.oracle is None}
    assert rows_only == set(), rows_only


def test_bench_query_lists_resolve():
    """bench.py's HEADLINE / ADDITIONS / HEAVY_TAIL_WATCH lists must
    name registered queries (a rename that misses bench.py would crash
    the driver's per-round bench run, not a local test) and the watch
    list must be a subset of HEADLINE (the third timed run reuses the
    two shared-pass timings by name)."""
    import bench

    from dbx_workspace_and_emr_iceberg_spark.registry import all_queries

    names = set(all_queries())
    for lst in (bench.HEADLINE, bench.ADDITIONS, bench.HEAVY_TAIL_WATCH):
        missing = [n for n in lst if n not in names]
        assert not missing, missing
    assert set(bench.HEAVY_TAIL_WATCH) <= set(bench.HEADLINE)
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dups


def test_bench_heavy_tail_selection_dynamic():
    """Pin the r13-verdict-#3 rule: the third-run set is the top-5 of
    THIS run's per-query times (main() feeds the WORST of the two
    shared passes, so a pass-2-only outlier like r13's x49 is caught)
    plus any watch entries not already in it — a static list frozen
    from last round's history missed that 7.7 s outlier in r13."""
    import bench

    worst = {f"q{i:02d}": float(i) for i in range(1, 20)}
    worst["t18_stream_dedup_history"] = 0.5
    worst["x49_semantic_contamination"] = 25.0
    sel = bench.heavy_tail_names(worst)
    # heaviest five first, heaviest-first order
    assert sel[:5] == ["x49_semantic_contamination", "q19", "q18", "q17", "q16"]
    # watch entries not in the top-5 are appended, no duplicates
    assert sel[5:] == ["t18_stream_dedup_history"]
    assert len(sel) == len(set(sel))


def test_bench_heavy_tail_selection_properties():
    """Property-pin heavy_tail_names over random timing dicts: the
    result is the TOP_N argmaxes (heaviest first) plus every watch
    entry, no duplicates, and never longer than TOP_N + |watch|."""
    from hypothesis import given
    from hypothesis import strategies as st

    import bench

    names = st.text("abcdefgh", min_size=1, max_size=6)
    timings = st.dictionaries(
        names, st.floats(0.001, 1e6, allow_nan=False), min_size=1, max_size=40
    )

    @given(timings, st.booleans())
    def check(worst, include_watch):
        if include_watch:
            worst = dict(worst)
            for i, w in enumerate(bench.HEAVY_TAIL_WATCH):
                worst[w] = 0.0005 + i * 1e-6  # never in the top-N
        sel = bench.heavy_tail_names(worst)
        n_top = min(bench.HEAVY_TAIL_TOP_N, len(worst))
        assert len(sel) == len(set(sel))
        assert len(sel) <= bench.HEAVY_TAIL_TOP_N + len(bench.HEAVY_TAIL_WATCH)
        top = sel[:n_top]
        # the selected head is exactly the N heaviest, heaviest first
        assert [worst[n] for n in top] == sorted(
            worst.values(), reverse=True
        )[:n_top]
        # watch entries always present when they exist in the run
        for w in bench.HEAVY_TAIL_WATCH:
            if w in worst:
                assert w in sel

    check()


def test_plan_compare_normalizer():
    """tools/plan_compare.py's normalizer strips ONLY per-session ids:
    two plans differing in expression ids normalize equal; a plan with
    an extra node, a different partitioning, or a changed literal must
    stay different."""
    from tools.plan_compare import normalize

    a = "Project [n_chars#12L AS len#34L]\n+- Exchange hashpartitioning(host#5, 32) [id=#88]"
    b = "Project [n_chars#99L AS len#7L]\n+- Exchange hashpartitioning(host#3, 32) [id=#12]"
    assert normalize(a) == normalize(b)

    c = a.replace("32", "64")          # partitioning width is structural
    d = a + "\n+- Filter (rk#1 <= 15)"  # extra node is structural
    e = a.replace("hashpartitioning", "rangepartitioning")
    for other in (c, d, e):
        assert normalize(a) != normalize(other)


def test_invariance_sweep_log_parser(tmp_path):
    """Pin tools/invariance_sweep.py's per-axis counting against REAL
    driver_sim output shapes: the axis check is (rc == 0) AND
    (mismatch == 0) AND (match == oracled) AND (rows_only == expected),
    so the parser mis-reading any line shape would either fail a clean
    axis (annoying) or — worse — count a MISMATCH line as noise and
    pass a broken one."""
    from tools.invariance_sweep import parse_sim_log

    lines = [
        "SMOKE entry(): 32 rows, schema=['l_returnflag']\n",
        "296 queries, 295 with oracle\n",
        "  q1_pricing_summary: spark=4 duck=4 hash MATCH  [1.2s cum 1.2s]\n",
        # progress-bar prefixed lines from Spark stages must NOT match
        "[Stage 10:> (0 + 1) / 1]   q9_x: spark=1 duck=1 hash MATCH\n",
        "  x3g_topk_vectorized_bench: rows-only, 10 rows  [0.5s cum 2s]\n",
        "  d2_scalar_pandas_udf: spark=9 duck=9 hash MISMATCH ab12 vs cd34  [1s cum 3s]\n",
        # the rerun axis's divergence shapes (r15): an oracled rerun
        # divergence is a MISMATCH line; a rows-only divergence matches
        # NOTHING, so it fails the axis via the rows-only count check
        "  f9_listagg: spark=5 duck=5 hash MISMATCH rerun ab12 vs cd34  [1s cum 4s]\n",
        "  x3g_topk_vectorized_bench: rerun-diverged ab12 vs cd34\n",
        "RESULT: ALL MATCH\n",
    ]
    assert parse_sim_log(lines) == (1, 2, 1)

    # run_axis reads the log with DEFAULT text mode, i.e. universal
    # newlines: Spark's \r-progress-bars glue themselves onto query
    # lines in the raw bytes ('\r[Stage 86:>...]\r\r   \r  q: ...'),
    # and the \r-split is what un-glues them — pin the end-to-end
    # behavior through a real file, not just the pure parser
    raw = (
        "\r[Stage 86:> (0 + 1) / 1]\r\r        "
        "\r  d10_arrow_python_udf: spark=67 duck=67 hash MATCH  [2s cum 8s]\n"
        "  x3g_topk_vectorized_bench: rows-only, 10 rows\n"
    )
    log = tmp_path / "axis.log"
    log.write_text(raw)
    with open(log) as rd:
        assert parse_sim_log(rd) == (1, 0, 1)


def test_invariance_sweep_parse_args():
    """--jobs parsing must not eat axis names (and vice versa): a flag
    mistaken for an axis would abort the sweep; an axis mistaken for a
    flag would silently skip it."""
    import pytest

    from tools.invariance_sweep import AXES, parse_args

    assert parse_args([]) == (list(AXES), 1)
    assert parse_args(["--jobs=4"]) == (list(AXES), 4)
    assert parse_args(["tz", "aqe_off"]) == (["tz", "aqe_off"], 1)
    assert parse_args(["--jobs=2", "rerun"]) == (["rerun"], 2)
    # SystemExit, not assert: `python -O` strips asserts, and a bad
    # --jobs should print usage, not a ValueError traceback
    with pytest.raises(SystemExit):
        parse_args(["nonsense_axis"])
    with pytest.raises(SystemExit):
        parse_args(["--jobs=0"])
    with pytest.raises(SystemExit):
        parse_args(["--jobs=four"])


def test_invariance_sweep_env_names_reach_driver_sim():
    """The riskiest link between an axis and its effect is the SIM_*
    env-var NAME: if AXES sets SIM_ARROW_BATCH but driver_sim reads
    SIM_ARROWBATCH, the child runs the DEFAULT config and the axis
    vacuously passes (the conf-KEY pin in test_sim_knobs.py cannot see
    this). Every SIM_* name any axis sets must appear verbatim in
    driver_sim.py."""
    import os

    from tools.invariance_sweep import AXES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "tools", "driver_sim.py")) as fh:
        src = fh.read()
    sim_names = {k for _, env in AXES.values() for k in env if k.startswith("SIM_")}
    assert sim_names, "no SIM_* axes? the sweep lost its env wiring"
    for name in sorted(sim_names):
        assert f'"{name}"' in src, f"driver_sim.py never reads {name}"


def test_invariance_sweep_axes_point_at_fixtures():
    """Separate from the parser pin (review-pass r15): this one is
    fixture-coupled by design — a renamed fixture dir should fail HERE,
    not 10 minutes into the sweep's scale axis. The /tmp layout dirs
    are generated at sweep time, so only their prefix is checkable."""
    import os

    from tools.invariance_sweep import AXES

    for name, (sf, env) in AXES.items():
        if sf.startswith("/root/testdata/"):
            assert os.path.isdir(sf), (name, sf)
        else:
            assert sf.startswith("/tmp/"), (name, sf)


# --- review-pass r16: harness hardening pins ---------------------------------


def test_sim_vhash_escapes_separators():
    """Unescaped '|'/newlines let DIFFERENT result sets collide into
    one hash — ('a|b','z') vs ('a','b|z') was a false MATCH channel in
    the core oracle compare (review-pass r16, reproduced)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(REPO, "tools"))
    import sim_compare as S

    assert S.vhash(["a", "b"], [("a|b", "z")]) != S.vhash(
        ["a", "b"], [("a", "b|z")]
    )
    assert S.vhash(["a"], [("x\ny",)]) != S.vhash(["a"], [("x",), ("y",)])
    # same rows, shuffled -> same hash (the property the gate rests on)
    assert S.vhash(["a", "b"], [(1, 2), (3, 4)]) == S.vhash(
        ["a", "b"], [(3, 4), (1, 2)]
    )


def test_sim_cell_canonicalizes_aware_datetimes_to_utc():
    """DuckDB returns TIMESTAMPTZ localized to the HOST zone; a bare
    tzinfo strip compared host wall-clock against Spark's session-UTC
    wall-clock and diverged under the tz axis (review-pass r16)."""
    import datetime as dt
    import sys as _sys

    _sys.path.insert(0, os.path.join(REPO, "tools"))
    import sim_compare as S

    ny = dt.timezone(dt.timedelta(hours=-5))
    aware = dt.datetime(2024, 1, 1, 12, 0, tzinfo=ny)
    assert S.cell(aware) == "2024-01-01T17:00:00"
    naive = dt.datetime(2024, 1, 1, 12, 0)
    assert S.cell(naive) == "2024-01-01T12:00:00"


def test_sweep_child_env_pins_baseline():
    """A leftover exported SIM_*/SF/TZ must NOT leak into the axes'
    children — the sweep could otherwise pass 13/13 without ever
    executing the default config (review-pass r16)."""
    from tools.invariance_sweep import AXES, child_env

    dirty = {
        "PATH": "/usr/bin",
        "SIM_ANSI": "false",
        "SIM_AQE": "false",
        "SF": "/tmp/stale",
        "TZ": "Mars/Olympus",
    }
    env = child_env("aqe_off", base=dirty)
    assert env["SIM_AQE"] == "false"  # the axis's OWN knob
    assert "SIM_ANSI" not in env  # the stale knob is gone
    assert env["SF"] == AXES["aqe_off"][0]
    assert "TZ" not in env
    env2 = child_env("tz", base=dirty)
    assert env2["TZ"] == "America/New_York"  # axis TZ, not the stale one


def test_driver_sim_gates_broken_modules():
    """driver_sim must refuse to print ALL MATCH over a silently
    shrunken suite (source-level pin: the loud SystemExit is present
    and not a strippable bare assert)."""
    with open(os.path.join(REPO, "tools", "driver_sim.py")) as fh:
        src = fh.read()
    assert "_BROKEN_MODULES" in src
    assert "raise SystemExit" in src


def test_sim_cell_collision_channels_closed_r18():
    """Review-pass r18: three false-MATCH channels in cell() — a list
    join that collided ["a,b"] with ["a","b"], a forgeable "NULL"
    sentinel, and untyped strings colliding with numbers (the schema
    compare checks column names only)."""
    import sys as _sys

    _sys.path.insert(0, os.path.join(REPO, "tools"))
    import sim_compare as S

    assert S.cell(["a,b"]) != S.cell(["a", "b"])
    assert S.cell([["a"], ["b"]]) != S.cell([["a"], ["b["]])
    assert S.cell(["a]b"]) != S.cell(["a", "b"]) != S.cell([["a", "b"]])
    assert S.cell(None) != S.cell("NULL")
    assert S.cell("1.5") != S.cell(1.5)
    # deliberate collisions kept: int / Decimal / HUGEINT renderings of
    # the same value must still agree
    import decimal as _d

    assert S.cell(5) == S.cell(_d.Decimal(5)) == "5"
    assert S.cell(bytes(b"\x01")) == S.cell(bytearray(b"\x01"))


def test_bench_previous_floors_layout_gated(tmp_path, monkeypatch):
    """Review-pass r18: floors recorded on a different physical layout
    must not seed the >25%-mover rule — cross-layout diffs fire the
    re-pass suite-wide and an A/B run would poison the next baseline.
    Pre-r18 sidecars (no layout field) count as single-file."""
    import json as _json

    import bench

    p = tmp_path / "full.json"
    p.write_text(_json.dumps({"floors": {"q1": 1.0}, "layout": "multi16"}))
    monkeypatch.setattr(bench, "FULL_RESULT_PATH", str(p))
    assert bench.previous_floors("multi16") == {"q1": 1.0}
    # best_floors (r19) wins over the per-run floors when present
    p.write_text(
        _json.dumps(
            {
                "floors": {"q1": 1.0},
                "best_floors": {"q1": 0.7},
                "layout": "multi16",
            }
        )
    )
    assert bench.previous_floors("multi16") == {"q1": 0.7}
    p.write_text(_json.dumps({"floors": {"q1": 2.0}}))
    assert bench.previous_floors("single") == {"q1": 2.0}
    assert bench.previous_floors("multi16") == {}
    # ADVICE r18: a multi16 sidecar must NOT starve a layout=single
    # lookup — fall through to the BENCH_r*.json scan (single-only)
    p.write_text(_json.dumps({"floors": {"q1": 3.0}, "layout": "multi16"}))
    r = tmp_path / "BENCH_r99.json"
    r.write_text(_json.dumps({"parsed": {"floors": {"q1": 4.0}}}))
    monkeypatch.setattr(
        bench.glob, "glob", lambda pat: [str(r)] if "BENCH_r" in pat else []
    )
    assert bench.previous_floors("single") == {"q1": 4.0}
    assert bench.previous_floors("multi16") == {"q1": 3.0}  # sidecar still wins
