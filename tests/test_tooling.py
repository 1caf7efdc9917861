"""Tests for the perf/soak analysis tooling (scripts/).

The xplane self-time sweep and the logbook parser are pure logic with
subtle failure modes (nested-event double counting; operand-text
miscategorization — both produced wrong round-2 conclusions before being
fixed in round 3), so they get real tests.
"""

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))
sys.path.insert(0, REPO)


def test_bench_harness_builders_wire_up():
    """bench.build / bench.build_video are the driver-hook workload factories
    (and feed scripts/profile_finest_chunk.py); lock their wiring — config
    finalization, dataset, chunk/state assembly — without compiling a chunk
    (the e2e trainer tests cover execution)."""
    import jax
    import bench

    cfg, state, chunk, data_scale, data_zero, amps = bench.build(
        0, "float32")
    assert callable(chunk)
    assert data_scale.ndim == 4 and data_scale.shape[-1] == 3  # NHWC
    assert data_zero.shape == data_scale.shape  # scale 0 == scale 0
    assert amps.shape == (cfg.stop_scale + 2,)
    assert float(amps[0]) == 1.0
    assert jax.tree_util.tree_leaves(state.g_params)

    vcfg, vstate, vchunk, vS, v0, vamps = bench.build_video(0, "float32")
    assert callable(vchunk)
    assert vS.ndim == 5 and vS.shape[-1] == 3  # NTHWC
    assert v0.ndim == 5
    assert vamps.shape == (vcfg.stop_scale + 2,)
    assert jax.tree_util.tree_leaves(vstate.g_params)


def test_bench_supervisor_passthrough_and_wedge_retry(tmp_path):
    """bench's parent supervisor (transport wedges are per-process): a
    healthy child's last stdout line is returned; a silently-hung child is
    killed on the stall deadline and a fresh attempt can heal."""
    import sys

    import bench

    # healthy child
    rc, line, salvage = bench.supervise(
        [sys.executable, "-c", "print('{\"metric\": 1}')"],
        attempts=1, stall_s=30, deadline_s=60, poll_s=0.1)
    assert rc == 0 and line.strip() == '{"metric": 1}' and salvage is None

    # wedge on attempt 1 (silent sleep), heal on attempt 2 via a flag file
    flag = tmp_path / "tried"
    child = (
        "import os, sys, time\n"
        f"flag = {str(flag)!r}\n"
        "if not os.path.exists(flag):\n"
        "    open(flag, 'w').close()\n"
        "    time.sleep(60)\n"  # silent: no output -> stall kill
        "print('healed')\n")
    rc, line, _ = bench.supervise([sys.executable, "-c", child],
                                  attempts=2, stall_s=8, deadline_s=120,
                                  poll_s=0.1)  # stall >> interpreter startup
    # (the 1-core host can take seconds to exec python -c)
    assert rc == 0 and line.strip() == "healed" and flag.exists()

    # persistent wedge -> rc 1
    rc, line, salvage = bench.supervise(
        [sys.executable, "-c", "import time; time.sleep(120)"],
        attempts=2, stall_s=8, deadline_s=120, poll_s=0.1)
    assert rc == 1 and line == "" and salvage is None


def test_bench_supervisor_total_budget_and_salvage():
    """Round-3 postmortem (BENCH_r03 rc=124/parsed=null): the supervision
    must fit a TOTAL budget — t_end caps attempt deadlines and blocks new
    attempts under 120 s — and a child that printed a provisional headline
    before wedging is salvaged instead of discarded."""
    import sys
    import time

    import bench

    # t_end already nearly spent -> zero attempts started, immediate return
    t0 = time.time()
    rc, line, salvage = bench.supervise(
        [sys.executable, "-c", "import time; time.sleep(60)"],
        attempts=3, stall_s=60, deadline_s=60, t_end=time.time() + 100,
        poll_s=0.1)
    assert rc == 1 and line == "" and salvage is None
    assert time.time() - t0 < 30  # never ran the 60 s child

    # child prints a provisional JSON record, then dies (the row-wedge
    # shape: headline measured, a later row killed the process) -> the
    # record is salvaged across the failed attempts
    child = ("import json, sys\n"
             "print(json.dumps({'metric': 'm', 'value': 55.0}), flush=True)\n"
             "sys.exit(1)\n")
    rc, line, salvage = bench.supervise(
        [sys.executable, "-c", child], attempts=2, stall_s=60,
        deadline_s=60, poll_s=0.1)
    assert rc == 1 and salvage == {"metric": "m", "value": 55.0}

    # partial/garbage stdout lines are never salvaged
    assert bench._parse_json_line('{"metric": "m", "val') is None
    assert bench._parse_json_line("healed") is None
    assert bench._parse_json_line('{"metric": "m", "value": null}') is None
    assert bench._parse_json_line('{"metric": "m", "value": 1.5}') \
        == {"metric": "m", "value": 1.5}


def test_bench_child_budget_gating(monkeypatch):
    """_remaining_budget drives explicit row skipping: unsupervised runs are
    unbounded; a nearly-spent _BENCH_DEADLINE reports the truth."""
    import time

    import bench

    monkeypatch.delenv("_BENCH_DEADLINE", raising=False)
    assert bench._remaining_budget() == float("inf")
    monkeypatch.setenv("_BENCH_DEADLINE", repr(time.time() + 50))
    assert 40 < bench._remaining_budget() <= 50


def test_bench_last_known_picks_newest_real_measurement(tmp_path):
    """When every attempt wedges (transport outage), the null headline
    carries the newest REAL prior measurement from the driver-recorded
    BENCH_r*.json artifacts — labeled with its source file — and skips
    rounds whose own run was a null (an outage round must not become the
    'last known good')."""
    import json

    import bench

    def rec(n, value):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(json.dumps(
            {"parsed": {"metric": "m", "value": value, "unit": "steps/sec"}}))

    assert bench._last_known_bench(str(tmp_path)) is None  # no artifacts
    rec(1, 46.9)
    rec(2, 47.0)
    rec(3, None)  # outage round: parsed value null -> skipped
    (tmp_path / "BENCH_r04.json").write_text("not json")  # corrupt -> skipped
    (tmp_path / "BENCH_r05.json").write_text(
        '{"parsed": "driver error text"}')  # truthy non-dict -> skipped
    parsed, source = bench._last_known_bench(str(tmp_path))
    assert source == "BENCH_r02.json" and parsed["value"] == 47.0

    # and the repo's real artifacts resolve to SOME real measurement
    got = bench._last_known_bench()
    assert got is not None and got[0]["value"] is not None


def test_compare_runs_deltas_gate_and_missing(tmp_path):
    """scripts/compare_runs.py (the lever-qualification A/B tool): reports
    per-scale amp deltas and rate speedups, the --amp-tol gate fails on a
    deviation beyond tolerance, and missing artifacts exit 2."""
    import json

    def make_exp(name, amps, rate_lines, metrics=None):
        d = tmp_path / name
        (d / "eval").mkdir(parents=True)
        (d / "intermediate.json").write_text(json.dumps(
            {"noise_amps": amps, "scale_idx": len(amps) - 1}))
        (d / "logbook.txt").write_text("\n".join(rate_lines) + "\n")
        if metrics:
            (d / "eval" / "metrics.json").write_text(json.dumps(metrics))
        return str(d)

    a = make_exp("a", [1.0, 0.04], [
        "2026-01-01 00:00:00 scale 0 done in 10.0s (10.00 it/s)",
        "2026-01-01 00:01:00 scale 1 done in 20.0s (5.00 it/s)",
    ], {"metric": "SIFID", "value": 0.0094, "num_samples": 50})
    b = make_exp("b", [1.0, 0.042], [  # amp +5%; scale 1 retried: last wins
        "2026-01-01 00:00:00 scale 0 done in 5.0s (20.00 it/s)",
        "2026-01-01 00:01:00 scale 1 done in 99.0s (1.00 it/s)",
        "2026-01-01 00:02:00 scale 1 done in 10.0s (10.00 it/s)",
    ], {"metric": "SIFID", "value": 0.0090, "num_samples": 50})

    tool = os.path.join(REPO, "scripts", "compare_runs.py")
    out = subprocess.run([sys.executable, tool, a, b, "--amp-tol", "10"],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr[-2000:]
    assert "+5.00%" in out.stdout           # amp delta
    assert "2.00x" in out.stdout            # scale-0 rate speedup (it/s B/A)
    assert "10.00" in out.stdout            # retried scale: LAST line won
    assert "SIFID=0.009400" in out.stdout and "SIFID=0.009000" in out.stdout

    # gate: 5% deviation > 1% tolerance
    out = subprocess.run([sys.executable, tool, a, b, "--amp-tol", "1"],
                         capture_output=True, text=True)
    assert out.returncode == 1 and "AMP TOLERANCE EXCEEDED" in out.stdout

    # missing intermediate.json
    out = subprocess.run([sys.executable, tool, a, str(tmp_path / "nope")],
                         capture_output=True, text=True)
    assert out.returncode == 2 and "missing intermediate.json" in out.stdout

    # structural gate: B trained fewer scales (e.g. crashed mid-run) — every
    # common scale matches, but the gate must still fail, not exit 0
    short = make_exp("short", [1.0], [
        "2026-01-01 00:00:00 scale 0 done in 10.0s (10.00 it/s)"])
    out = subprocess.run([sys.executable, tool, a, short, "--amp-tol", "50"],
                         capture_output=True, text=True)
    assert out.returncode == 1, out.stdout
    assert "AMP GATE FAILED (structural)" in out.stdout
    # without a tolerance it is a report, not a gate: exit 0
    out = subprocess.run([sys.executable, tool, a, short],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stdout


def test_compare_runs_baselines_close_lines(tmp_path):
    """The baselines trainer's close line has no '(R it/s)' suffix
    (baselines_trainer.py:238); the rate table must still compare via the
    per-scale seconds ratio instead of silently reporting nothing."""
    import json

    def make_exp(name, secs):
        d = tmp_path / name
        d.mkdir()
        (d / "intermediate.json").write_text(json.dumps(
            {"noise_amps": [1.0], "scale_idx": 0}))
        (d / "logbook.txt").write_text("".join(
            f"2026-01-01 00:00:00 scale {k} done in {s}s\n"
            for k, s in enumerate(secs)))
        return str(d)

    a = make_exp("ba", [10.0, 30.0])
    b = make_exp("bb", [5.0, 30.0])
    tool = os.path.join(REPO, "scripts", "compare_runs.py")
    out = subprocess.run([sys.executable, tool, a, b],
                         capture_output=True, text=True)
    assert out.returncode == 0, out.stdout + out.stderr[-2000:]
    assert "2.00x" in out.stdout            # 10s vs 5s
    assert "no common per-scale close lines" not in out.stdout


def test_categorize_uses_instruction_name_only():
    from analyze_xplane import categorize
    # a fusion whose OPERANDS mention %copy must not land in the copy bucket
    assert categorize(
        "%select_reduce_fusion.1 = f32[64] fusion(f32[8] %copy.4350)"
    ) == "reduce fusion"
    assert categorize("%copy.4350 = f32[8] copy(f32[8] %p0)") \
        == "copy/transpose"
    assert categorize("%copy-start.11 = (f32[8], u32[]) copy-start(...)") \
        == "async-copy (DMA)"
    assert categorize("%convolution.7 = f32[8] convolution(...)") \
        == "convolution"
    assert categorize("%while.7 = (s32[]) while(...)") == "other"


def _self_times(events):
    """Run analyze_xplane's self-time sweep on (offset, dur, name) tuples."""
    evs_nest = sorted(((o, -d, name) for o, d, name in events))
    stack, selfs = [], []
    for o, nd, name in evs_nest:
        d = -nd
        while stack and stack[-1][0] <= o:
            stack.pop()
        if stack:
            selfs[stack[-1][1]][1] -= d
        selfs.append([name, d])
        stack.append((o + d, len(selfs) - 1))
    return {n: max(s, 0) for n, s in selfs}


def test_self_time_subtracts_nested_children():
    # while [0,100) wraps two fusions; fusion_a wraps a sub-op
    st = _self_times([
        (0, 100, "while"),
        (10, 30, "fusion_a"),
        (15, 10, "sub"),
        (50, 20, "fusion_b"),
    ])
    assert st["while"] == 100 - 30 - 20
    assert st["fusion_a"] == 30 - 10
    assert st["sub"] == 10
    assert st["fusion_b"] == 20
    # total self time == outermost span (no double counting)
    assert sum(st.values()) == 100


def test_self_time_sequential_events_keep_full_duration():
    st = _self_times([(0, 5, "a"), (5, 5, "b"), (12, 3, "c")])
    assert st == {"a": 5, "b": 5, "c": 3}


def test_soak_analyzer_reports_sustained_rate(tmp_path):
    log = tmp_path / "logbook.txt"
    lines = []
    # 4 intervals of 500 iters at exactly 100 s each => 5 it/s, one
    # restart boundary (iter resets) that must be skipped, finite metrics
    stamps = ["12:00:00", "12:01:40", "12:03:20", "12:05:00", "12:06:40"]
    iters = [500, 1000, 1500, 2000, 2500]
    for t, i in zip(stamps, iters):
        lines.append(f"2026-01-01 {t} [Scale 9/Iter {i}] Noise amp: 0.01, "
                     f"g_loss: 0.5, d_loss: -0.1")
    log.write_text("\n".join(lines) + "\n")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "analyze_soak.py"),
         str(log)], capture_output=True, text=True, check=True).stdout
    assert "scale 9" in out
    assert "0 intervals with non-finite metrics" in out
    # sustained rate = 2000 iters / 400 s = 5.0 it/s
    assert "sustained 5.0" in out


def test_soak_analyzer_skips_restart_boundary(tmp_path):
    # a watchdog restart resets the iter counter; the decreasing pair must
    # be excluded from the interval-rate series (not produce a negative or
    # inflated rate)
    log = tmp_path / "logbook.txt"
    log.write_text(textwrap.dedent("""\
        2026-01-01 12:00:00 [Scale 9/Iter 500] g_loss: 0.5
        2026-01-01 12:01:40 [Scale 9/Iter 1000] g_loss: 0.5
        2026-01-01 12:10:00 [Scale 9/Iter 500] g_loss: 0.5
        2026-01-01 12:11:40 [Scale 9/Iter 1000] g_loss: 0.5
        """))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "analyze_soak.py"),
         str(log)], capture_output=True, text=True, check=True).stdout
    # both valid intervals run at 5 it/s; the restart pair is dropped
    assert "min 5.000 max 5.000" in out


def test_soak_analyzer_flags_nonfinite(tmp_path):
    log = tmp_path / "logbook.txt"
    log.write_text(textwrap.dedent("""\
        2026-01-01 12:00:00 [Scale 9/Iter 500] g_loss: 0.5
        2026-01-01 12:01:40 [Scale 9/Iter 1000] g_loss: nan
        """))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "analyze_soak.py"),
         str(log)], capture_output=True, text=True, check=True).stdout
    assert "1 intervals with non-finite metrics" in out


def test_args_txt_preserves_spaces_in_values(tmp_path):
    """Rehydration must not strip spaces INSIDE values (a path under
    '/data/my photos/' would silently dangle after training completed)."""
    from hpvaegan_tpu.config import Config

    cfg = Config(image_path="/data/my photos/x.jpg", checkname="my run")
    path = str(tmp_path / "args.txt")
    cfg.write_args_txt(path)
    back = Config.from_args_txt(path)
    assert back.image_path == "/data/my photos/x.jpg"
    assert back.checkname == "my run"


def test_bench_main_rows_provisional_and_budget_skip(monkeypatch, capsys):
    """bench.main row plumbing without hardware: the child prints a
    provisional headline record before the extra rows (salvage source),
    labels the video row's workload, and when the supervisor budget is
    nearly spent it skips rows with an explicit reason instead of
    overrunning the driver's timeout."""
    import json
    import sys
    import time

    import bench

    monkeypatch.setattr(bench, "bench_scale", lambda *a, **k: 55.0)
    monkeypatch.setattr(bench, "bench_sampling", lambda *a, **k: 23.0)
    monkeypatch.setattr(bench, "bench_video_scale", lambda *a, **k: 11.0)
    monkeypatch.setattr(bench, "target_steps_per_sec", lambda: 2.9)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    monkeypatch.setenv("_BENCH_CHILD", "1")
    # the serving row must stay on the CARRIED path in tests even when this
    # VM has a live-prepared dir + built runner (never run hardware here)
    monkeypatch.setenv("BENCH_SERVING_DIR", "/nonexistent-bench-serving")

    # plenty of budget: all rows run; TWO stdout lines (provisional + full)
    monkeypatch.setenv("_BENCH_DEADLINE", repr(time.time() + 3600))
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    prov, full = json.loads(lines[0]), json.loads(lines[1])
    assert prov["value"] == 55.0 and "sampling_images_per_sec" not in prov
    assert full["sampling_images_per_sec"] == 23.0
    assert full["video_steps_per_sec"] == 11.0
    assert "128px" in full["video_workload"]
    assert full["video_finest_steps_per_sec"] == 11.0
    assert "13x192x257" in full["video_finest_workload"]
    assert full["vs_baseline"] == round(55.0 / 2.9, 4)
    # serving: no prepared dir -> carried from benchdata, explicitly labeled
    assert full["serving_warm_ms"] is not None
    assert full["serving_source"].startswith("CARRIED")

    # budget nearly spent: headline survives, rows skip with a reason
    monkeypatch.setenv("_BENCH_DEADLINE", repr(time.time() + 60))
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    full = json.loads(lines[-1])
    assert full["value"] == 55.0
    assert full["sampling_images_per_sec"] is None
    assert full["sampling_skipped"] == "bench budget exhausted"
    assert full["video_steps_per_sec"] is None
    assert full["video_skipped"] == "bench budget exhausted"
    assert full["video_finest_steps_per_sec"] is None
    assert full["video_finest_skipped"] == "bench budget exhausted"
    assert full["serving_source"].startswith("CARRIED")

    # --headline-only: exactly ONE line (manual/raw contract unchanged)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--headline-only"])
    monkeypatch.setenv("_BENCH_DEADLINE", repr(time.time() + 3600))
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 1 and json.loads(lines[0])["value"] == 55.0


def test_bench_serving_prepared_dir_detection(tmp_path, monkeypatch):
    """_serving_prepared_dir accepts only a COMPLETE export (model +
    compile options + all three input bins) — a half-written dir must fall
    back to the carried record, not crash the runner mid-bench."""
    import bench

    d = tmp_path / "exp"
    (d / "infer").mkdir(parents=True)
    monkeypatch.setenv("BENCH_SERVING_DIR", str(d))
    assert bench._serving_prepared_dir() is None  # empty infer/
    for n in ("compile_options.bin", "noise_amps", "seed"):
        (d / "infer" / n).write_bytes(b"x")
    assert bench._serving_prepared_dir() is None  # no model yet
    (d / "infer" / "netG_9.mlir").write_text("module {}")
    assert bench._serving_prepared_dir() == str(d)
    monkeypatch.setenv("BENCH_SERVING_DIR", "/nonexistent-bench-serving")
    assert bench._serving_prepared_dir() is None


def test_bench_serving_row_live_and_fallback(tmp_path, monkeypatch):
    """serving_row: a live runner execution wins and is labeled 'measured
    this run'; a failing runner (or no budget / no runner binary) falls
    back to the carried benchdata record labeled CARRIED."""
    import subprocess
    import time

    import bench

    monkeypatch.setenv("_BENCH_DEADLINE", repr(time.time() + 3600))
    prepared = tmp_path / "exp"
    (prepared / "infer").mkdir(parents=True)
    runner = tmp_path / "pjrt_runner"
    runner.write_text("#!/bin/sh\n")

    # live path: stub the script invocation, write the runner's report
    def fake_run(argv, **kw):
        assert argv[0] == "bash" and argv[1].endswith("run_infer_tpu.sh")
        assert kw["env"]["RUN_ONLY"] == "1"
        tr = prepared / "time_Result"
        tr.mkdir(exist_ok=True)
        (tr / "test_perform_static.txt").write_text(
            "NN inference cost average time: 61.25 ms of infer_count 8\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    row = bench.serving_row(lambda: True, runner=str(runner),
                            prepared=str(prepared))
    assert row["serving_warm_ms"] == 61.25
    assert row["serving_source"].startswith("measured this run")
    assert "8 non-warmup" in row["serving_source"]

    # failing runner -> carried fallback, explicit label
    def boom(argv, **kw):
        raise subprocess.CalledProcessError(1, argv)

    monkeypatch.setattr(subprocess, "run", boom)
    row = bench.serving_row(lambda: True, runner=str(runner),
                            prepared=str(prepared))
    assert row["serving_warm_ms"] is not None  # benchdata record exists
    assert row["serving_source"].startswith("CARRIED")

    # no budget -> never invokes the runner at all
    monkeypatch.setattr(subprocess, "run",
                        lambda *a, **k: (_ for _ in ()).throw(
                            AssertionError("must not run")))
    row = bench.serving_row(lambda: False, runner=str(runner),
                            prepared=str(prepared))
    assert row["serving_source"].startswith("CARRIED")
