#!/usr/bin/env python3
"""Benchmark harness: train steps/sec at the reference's full workload.

Workload: the default single-image config (img_size 256 -> 10 scales, nfc 64,
num_layer 5, latent_dim 128; reference train_image.py:225-263), measuring the
full GAN-phase iteration (D step with WGAN-GP double-backward + G step with
reconstruction + adversarial forward) at the FINEST pyramid scale (257px) —
the heaviest step of the run, the one that dominates the reference's
5000-iter-per-scale wall clock.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "steps/sec", "vs_baseline": N}

vs_baseline: the driver target is >=10x MindSpore-CPU step throughput
(BASELINE.md). MindSpore is not installable in this image, so the baseline
is a MEASUREMENT of this same finest-scale D+G step on the host CPU
(scripts/measure_cpu_baseline.py -> benchdata/cpu_baseline.json; methodology
recorded there and in BASELINE.md). XLA:CPU is an optimistic stand-in for
MindSpore-CPU, so target = 10 x measured is conservative;
vs_baseline = value / target.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def target_steps_per_sec() -> float:
    """10x the measured CPU baseline (lazy: the measurement script itself
    imports this module before the JSON exists)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchdata", "cpu_baseline.json")
    with open(path) as f:
        return 10 * float(json.load(f)["steps_per_sec"])


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(scale_idx: int, compute_dtype: str, steps_per_call: int = None,
          flat_opt: bool = None, xla_options: dict = None,
          fused_dg: bool = False):
    from hpvaegan_tpu import models
    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.data.image import (SingleImageDataset,
                                         make_image_batch_body)
    from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
    from hpvaegan_tpu.optim import adam, clipped_adam
    from hpvaegan_tpu.training.partition import (lr_tree_for, make_lr_plan,
                                                 split_params)
    from hpvaegan_tpu.training.state import ScaleTrainState
    from hpvaegan_tpu.training.steps import make_train_chunk

    cfg = Config(image_path="data/imgs/air_balloons.jpg",
                 compute_dtype=compute_dtype, fused_dg=fused_dg).finalize()
    cfg.scale_idx = scale_idx
    if steps_per_call:
        cfg.steps_per_call = steps_per_call
    if flat_opt is not None:
        cfg.flat_opt = flat_opt
    if xla_options:
        cfg.xla_options = xla_options
    dataset = SingleImageDataset(cfg)

    g_init, g_apply = models.get_generator(cfg.generator, 2)
    d_init, d_apply = models.get_discriminator(cfg.discriminator, 2)
    key = jax.random.PRNGKey(0)
    g_params, g_state = g_init(cfg, key)
    for i in range(scale_idx):
        g_params, g_state = generator_init_next_stage(cfg, g_params, g_state,
                                                      jax.random.PRNGKey(i))
    d_params, d_state = d_init(cfg, jax.random.PRNGKey(1))

    plan = make_lr_plan(cfg, scale_idx, len(g_params["body"]))
    trainable, _ = split_params(g_params, plan)
    opt_g = clipped_adam(lr_tree_for(trainable, plan), cfg.beta1,
                         grad_clip=cfg.grad_clip, flat=cfg.flat_opt)
    opt_d = adam(cfg.lr_d, cfg.beta1, flat=cfg.flat_opt)
    state = ScaleTrainState(g_params, g_state, d_params, d_state,
                            opt_g.init(trainable), opt_d.init(d_params),
                            jax.random.PRNGKey(2))

    vae_phase = cfg.vae_levels >= scale_idx + 1
    batch_body = make_image_batch_body(cfg, scale_idx)
    g_pair = models.get_generator_pair(cfg.generator, 2) \
        if getattr(cfg, "paired_g", False) else None
    chunk = make_train_chunk(cfg, g_apply, d_apply, opt_g, opt_d, plan,
                             vae_phase, batch_body, cfg.steps_per_call,
                             g_pair=g_pair)
    data_scale = dataset.scale_image(scale_idx)
    data_zero = dataset.scale_image(0)
    amps = jnp.concatenate([jnp.ones((scale_idx + 1,)),
                            jnp.zeros((cfg.stop_scale + 1 - scale_idx,))])
    return cfg, state, chunk, data_scale, data_zero, amps


def bench_scale(scale_idx: int, iters: int = 20, warmup: int = 2,
                compute_dtype: str = "float32", flat_opt: bool = None,
                xla_options: dict = None, fused_dg: bool = False) -> float:
    """steps/sec of the fused training chunk (the trainer's real dispatch
    pattern: `steps_per_call` full D+G iterations per XLA launch).

    NOTE: completion is forced with a scalar host readback of the last
    chunk's loss — on remote-device transports (the axon tunnel here)
    jax.block_until_ready can return before execution finishes, which
    silently inflates throughput by >10x."""
    cfg, state, chunk, data_scale, data_zero, amps = build(
        scale_idx, compute_dtype, flat_opt=flat_opt, xla_options=xla_options,
        fused_dg=fused_dg)
    for _ in range(warmup):
        state, m = chunk(state, data_scale, data_zero, amps)
    float(np.asarray(m["g_loss"]))  # true completion barrier

    n_chunks = max(1, iters // cfg.steps_per_call)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, m = chunk(state, data_scale, data_zero, amps)
    float(np.asarray(m["g_loss"]))  # depends on every prior step
    dt = time.perf_counter() - t0
    return n_chunks * cfg.steps_per_call / dt


def bench_sampling(num_samples: int = 64, reps: int = 5,
                   compute_dtype: str = "float32") -> float:
    """Batched diverse-sample generation at full depth (BASELINE config 5):
    images/sec for a 64-sample batch through all 10 scales, DP-sharded over
    the available devices (one chip here; scales out on a mesh)."""
    from hpvaegan_tpu import models
    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.data.image import SingleImageDataset
    from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
    from hpvaegan_tpu.parallel.sampling import sharded_sampler

    cfg = Config(image_path="data/imgs/air_balloons.jpg",
                 compute_dtype=compute_dtype).finalize()
    SingleImageDataset(cfg)  # sets cfg.ar
    cfg.Noise_Amps = [1.0] + [0.1] * cfg.stop_scale
    g_init, _ = models.get_generator(cfg.generator, 2)
    g_params, g_state = g_init(cfg, jax.random.PRNGKey(0))
    for i in range(cfg.stop_scale):
        g_params, g_state = generator_init_next_stage(cfg, g_params, g_state,
                                                      jax.random.PRNGKey(i))
    sample = sharded_sampler(cfg, g_params, g_state, ndim=2)
    sample(num_samples, jax.random.PRNGKey(1))  # warm + barrier

    # compute-only: device-resident samples, scalar barrier (on a tunneled
    # TPU the d2h of a 64-image batch costs seconds and is NOT generation
    # throughput; the on-device sinFID pipeline never transfers samples)
    @jax.jit
    def checksum(x):
        return jnp.sum(x)

    t0 = time.perf_counter()
    for r in range(reps):
        out = sample(num_samples, jax.random.PRNGKey(2 + r), device=True)
    float(np.asarray(checksum(out)))
    dt = time.perf_counter() - t0
    return num_samples * reps / dt


def bench_eval_sifid(num_samples: int = 64) -> float:
    """End-to-end BASELINE config 5 from the eval path: generate 64 diverse
    samples at full depth AND compute their sinFID on device (per-sample
    (mu, sigma) stats are the only host transfer). Returns seconds of
    wall-time for the warm pipeline (reference equivalent:
    eval_image.py:54-61,188 — a host sample loop + file-based FID)."""
    from hpvaegan_tpu import models
    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.data.image import SingleImageDataset
    from hpvaegan_tpu.models.networks_2d import generator_init_next_stage

    cfg = Config(image_path="data/imgs/air_balloons.jpg").finalize()
    ds = SingleImageDataset(cfg)
    cfg.Noise_Amps = [1.0] + [0.1] * cfg.stop_scale
    g_init, _ = models.get_generator(cfg.generator, 2)
    g_params, g_state = g_init(cfg, jax.random.PRNGKey(0))
    for i in range(cfg.stop_scale):
        g_params, g_state = generator_init_next_stage(cfg, g_params, g_state,
                                                      jax.random.PRNGKey(i))
    from hpvaegan_tpu.parallel.sampling import make_sampled_sifid

    real01 = np.asarray(ds.image_full_scale[0])
    run = make_sampled_sifid(cfg, g_params, g_state, real01)
    t0 = time.perf_counter()
    run(num_samples, jax.random.PRNGKey(1))  # cold: traces + compiles
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    vals = run(num_samples, jax.random.PRNGKey(2))
    dt = time.perf_counter() - t0
    assert len(vals) == num_samples
    log(f"  (cold incl. compile: {cold:.2f} s)")
    return dt


def build_video(scale_idx: int = 6, compute_dtype: str = "float32",
                fused_dg: bool = False,
                video_path: str = "data/vids/synthetic.avi",
                img_size: int = 128):
    """Video (Conv3D) GAN-phase chunk at a given scale of a video workload
    (default: the 128px/13-frame BASELINE config 4 shape); returns
    (cfg, state, chunk, data_scale, data_zero, amps) like build().
    scale_idx=None selects the finest scale (cfg.stop_scale)."""
    from hpvaegan_tpu import models
    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.data.video import (SingleVideoDataset,
                                         make_video_batch_body)
    from hpvaegan_tpu.models.networks_3d import generator_init_next_stage
    from hpvaegan_tpu.optim import adam, clipped_adam
    from hpvaegan_tpu.training.partition import (lr_tree_for, make_lr_plan,
                                                 split_params)
    from hpvaegan_tpu.training.state import ScaleTrainState
    from hpvaegan_tpu.training.steps import make_train_chunk
    from hpvaegan_tpu.utils import pyramid

    cfg = Config(video_path=video_path, img_size=img_size,
                 min_size=32, max_frames=13, compute_dtype=compute_dtype,
                 fused_dg=fused_dg,
                 discriminator="WDiscriminator3D", steps_per_call=8).finalize()
    if scale_idx is None:
        scale_idx = cfg.stop_scale
    cfg.scale_idx = scale_idx
    ds = SingleVideoDataset(cfg)
    fps, td, fi = pyramid.get_fps_td_by_index(scale_idx, cfg.stop_scale_time,
                                              cfg.sampling_rates, cfg.org_fps,
                                              cfg.fps_lcm)
    cfg.fps, cfg.td, cfg.fps_index = fps, td, fi
    g_init, g_apply = models.get_generator(cfg.generator, 3)
    d_init, d_apply = models.get_discriminator(cfg.discriminator, 3)
    g_params, g_state = g_init(cfg, jax.random.PRNGKey(0))
    for i in range(scale_idx):
        g_params, g_state = generator_init_next_stage(cfg, g_params, g_state,
                                                      jax.random.PRNGKey(i))
    d_params, d_state = d_init(cfg, jax.random.PRNGKey(1))
    plan = make_lr_plan(cfg, scale_idx, scale_idx)
    tr, _ = split_params(g_params, plan)
    opt_g = clipped_adam(lr_tree_for(tr, plan), cfg.beta1,
                         grad_clip=cfg.grad_clip, flat=cfg.flat_opt)
    opt_d = adam(cfg.lr_d, cfg.beta1, flat=cfg.flat_opt)
    bb = make_video_batch_body(cfg, scale_idx)
    chunk = make_train_chunk(cfg, g_apply, d_apply, opt_g, opt_d, plan,
                             False, bb, cfg.steps_per_call)
    st = ScaleTrainState(g_params, g_state, d_params, d_state,
                         opt_g.init(tr), opt_d.init(d_params),
                         jax.random.PRNGKey(2))
    dS, d0 = ds.scale_frames(scale_idx), ds.scale_frames(0)
    amps = jnp.ones((cfg.stop_scale + 2,)) * 0.1
    return cfg, st, chunk, dS, d0, amps


def bench_video_scale(scale_idx: int = 6, iters: int = 16,
                      compute_dtype: str = "float32",
                      fused_dg: bool = False,
                      video_path: str = "data/vids/synthetic.avi",
                      img_size: int = 128) -> float:
    cfg, st, chunk, dS, d0, amps = build_video(scale_idx, compute_dtype,
                                               fused_dg=fused_dg,
                                               video_path=video_path,
                                               img_size=img_size)
    st, m = chunk(st, dS, d0, amps)
    float(np.asarray(m["g_loss"]))
    n = max(1, iters // cfg.steps_per_call)
    t0 = time.perf_counter()
    for _ in range(n):
        st, m = chunk(st, dS, d0, amps)
    float(np.asarray(m["g_loss"]))
    return n * cfg.steps_per_call / (time.perf_counter() - t0)


def _serving_prepared_dir():
    """An experiment dir prepared for a LIVE native-serving measurement
    (exported StableHLO + noise bins + compile options — the products of
    `bash scripts/run_infer_tpu.sh EXP_DIR`), via BENCH_SERVING_DIR or the
    conventional /tmp/bench_serving. None when absent or incomplete
    (fresh VMs have neither — the carried record is the fallback)."""
    import glob
    d = os.environ.get("BENCH_SERVING_DIR", "/tmp/bench_serving")
    infer = os.path.join(d, "infer")
    if not all(os.path.exists(os.path.join(infer, n))
               for n in ("compile_options.bin", "noise_amps", "seed")):
        return None
    return d if glob.glob(os.path.join(infer, "netG_*.mlir")) else None


def serving_row(budget_ok, runner: str = None, prepared: str = None) -> dict:
    """The BASELINE.md native-serving row (reference
    ascend310_infer/src/main.cc:127-143 — there, latency is measured by the
    run that reports it; this row works the same way whenever it can).

    Preference order:
      1. LIVE: a prepared experiment dir + the built runner exist and budget
         remains -> execute the runner now (RUN_ONLY=1 run_infer_tpu.sh) and
         report the fresh time_Result average. A runner regression then
         fails THIS row instead of riding undetected into the artifact.
      2. CARRIED: benchdata/serving_latency.json, explicitly labeled as not
         measured this run, with its recording date + refresh recipe."""
    here = os.path.dirname(os.path.abspath(__file__))
    if runner is None:
        runner = os.path.join(here, "native", "pjrt_runner", "out",
                              "pjrt_runner")
    if prepared is None:
        prepared = _serving_prepared_dir()
    if prepared and os.path.exists(runner) and budget_ok():
        import re
        import subprocess
        log(f"serving: live native-runner measurement on {prepared}")
        try:
            subprocess.run(
                ["bash", os.path.join(here, "scripts", "run_infer_tpu.sh"),
                 prepared],
                env=dict(os.environ, RUN_ONLY="1"), check=True,
                stdout=sys.stderr, stderr=sys.stderr,
                timeout=max(60.0, min(_remaining_budget() - 60.0, 900.0)))
            report = open(os.path.join(
                prepared, "time_Result", "test_perform_static.txt")).read()
            m = re.search(
                r"average time:\s*([0-9.]+)\s*ms of infer_count\s*(\d+)",
                report)
            if m:
                log(f"serving (live): {report.strip()}")
                return {"serving_warm_ms": round(float(m.group(1)), 2),
                        "serving_source":
                            f"measured this run (native PJRT runner, "
                            f"{m.group(2)} non-warmup inferences, RUN_ONLY "
                            f"re-execution of the prepared export)"}
            log(f"serving report unparseable: {report!r} — falling back")
        except Exception as e:
            log(f"live serving measurement failed: {e!r} — "
                "falling back to the carried record")
    serving = os.path.join(here, "benchdata", "serving_latency.json")
    if not os.path.exists(serving):
        return {"serving_warm_ms": None}
    with open(serving) as f:
        rec = json.load(f)
    return {"serving_warm_ms": rec.get("warm_ms"),
            "serving_source":
                f"CARRIED (not measured this run): recorded "
                f"{rec.get('date')} ({rec.get('workload')}); "
                f"refresh: {rec.get('how')}"}


def _last_known_bench(here: str = None):
    """Newest previously-recorded REAL measurement, for the outage line.

    The round driver records every bench run as BENCH_r{N}.json next to
    this file; when the current run cannot reach the TPU at all, the null
    headline still carries the last real number — clearly labeled with its
    source file so nobody mistakes it for a fresh measurement. Rounds whose
    own run was a null (value None) are skipped: an outage round must not
    become the 'last known good'."""
    import glob
    import re
    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(path))
        if not m:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
        except Exception:
            continue
        # a truthy non-dict "parsed" (e.g. an error string) is as corrupt
        # as unparseable JSON — it must not crash the outage line
        if not isinstance(parsed, dict) or parsed.get("value") is None:
            continue
        if best is None or int(m.group(1)) > best[0]:
            best = (int(m.group(1)), parsed, os.path.basename(path))
    return (best[1], best[2]) if best else None


def _supervised_reexec() -> None:
    """Run the real bench in a CHILD process and retry transport wedges.

    The remote-TPU tunnel occasionally wedges a process indefinitely at
    device init or a d2h readback (observed round 3: jax.devices() hung
    >25 min with the process at 0% CPU). The wedge is per-process — a
    fresh process usually heals — so the parent supervises: forward the
    child's output, kill it if it goes silent for BENCH_STALL_SECS
    (default 600 s; the longest legitimate silence is the ~6 min finest
    remote compile) or exceeds its attempt deadline, and retry up to
    BENCH_ATTEMPTS (default 3) times.

    The WHOLE supervision — every attempt plus emitting the final line —
    is bounded by BENCH_TOTAL_BUDGET (default 1440 s — above the ~1200 s
    worst-case healthy cold path, inside the judge-suggested 20-25 min and
    under the round driver's own timeout): round 3's artifact
    was rc=124/parsed=null because 3 x 1 h worst-case attempts overran the
    driver's own timeout and the honest-null line never printed. Now the
    per-attempt deadline is sized from the remaining budget so a parseable
    JSON line is ALWAYS emitted before the budget expires.

    stdout keeps the one-JSON-line contract: the parent prints exactly one
    line. A child that measured the headline but wedged on a later row is
    salvaged — its last parseable stdout line (the provisional headline
    record it prints mid-run) is emitted with a `partial` reason rather
    than discarding a real measurement."""
    total_budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "1440"))
    margin = 30.0  # reserved for kill + final-line printing
    t_end = time.time() + total_budget - margin
    rc, line, salvage = supervise(
        [sys.executable, os.path.abspath(__file__)] + sys.argv[1:],
        attempts=int(os.environ.get("BENCH_ATTEMPTS", "3")),
        stall_s=float(os.environ.get("BENCH_STALL_SECS", "600")),
        deadline_s=float(os.environ.get("BENCH_ATTEMPT_DEADLINE", "3600")),
        t_end=t_end)
    if rc == 0:
        sys.stdout.write(line)
    elif salvage is not None:
        salvage["partial"] = ("later bench rows wedged/failed after the "
                              "headline was measured; see stderr tail")
        print(json.dumps(salvage))
    else:
        # still one parseable JSON line, honestly null — a transport outage
        # must be diagnosable from the recorded artifact (observed: the
        # tunnel wedged every process for hours, docs/PERF.md)
        rec = {
            "metric": "train_steps_per_sec_finest_scale_256px_image",
            "value": None, "unit": "steps/sec", "vs_baseline": None,
            "error": "all bench attempts failed or wedged — TPU transport "
                     "outage? (see docs/PERF.md, Measurement integrity)"}
        known = _last_known_bench()
        if known:
            rec["last_known"], rec["last_known_source"] = known
        print(json.dumps(rec))
    sys.stdout.flush()
    sys.exit(rc)


def _parse_json_line(line: str):
    """A dict parsed from a full stdout line, or None (partial writes from a
    killed child, non-JSON chatter)."""
    line = line.strip()
    if not (line.startswith("{") and line.endswith("}")):
        return None
    try:
        rec = json.loads(line)
    except ValueError:
        return None
    return rec if isinstance(rec, dict) and rec.get("value") is not None \
        else None


def supervise(child_argv, attempts: int, stall_s: float, deadline_s: float,
              t_end: float = None, poll_s: float = 1.0):
    """Run child_argv with retries; returns (rc, last_stdout_line, salvage).

    A child is killed when silent (no stdout/stderr) for stall_s or older
    than its attempt deadline; each retry is a fresh process. The attempt
    deadline is min(deadline_s, time left until t_end) — t_end is the hard
    ceiling for the whole supervision, and when under 120 s remain no
    further attempt is started. Child stderr is forwarded live; stdout is
    captured (the JSON contract line). `salvage` is the last parseable
    JSON dict any failed child managed to print (None if none did)."""
    import subprocess
    import threading

    if t_end is None:  # no total budget: bound by the attempts alone
        t_end = time.time() + attempts * deadline_s + 600
    salvage = None
    for attempt in range(1, attempts + 1):
        remaining = t_end - time.time()
        if remaining < 120:
            log(f"bench supervisor: {remaining:.0f}s of the total budget "
                f"left — not starting attempt {attempt}")
            break
        attempt_deadline = min(deadline_s, remaining)
        env = dict(os.environ, _BENCH_CHILD="1",
                   _BENCH_DEADLINE=repr(time.time() + attempt_deadline - 15))
        proc = subprocess.Popen(child_argv, env=env, stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE, text=True)
        t0 = time.time()
        last = [time.time()]
        out_lines = []

        def pump(stream, sink):
            for line in stream:
                last[0] = time.time()
                sink(line)

        threads = [
            threading.Thread(target=pump, args=(
                proc.stderr,
                lambda l: print(l, end="", file=sys.stderr, flush=True)),
                daemon=True),
            threading.Thread(target=pump, args=(proc.stdout,
                                                out_lines.append),
                             daemon=True),
        ]
        for t in threads:
            t.start()
        why = ""
        while proc.poll() is None:
            time.sleep(poll_s)
            if time.time() - last[0] > min(stall_s, attempt_deadline):
                why = f"silent for {min(stall_s, attempt_deadline):.0f}s " \
                      f"(transport wedge?)"
            elif time.time() - t0 > attempt_deadline:
                why = f"over the {attempt_deadline:.0f}s attempt deadline"
            if why:
                log(f"bench supervisor: attempt {attempt} {why} — killing")
                proc.kill()
                break
        proc.wait()
        for t in threads:
            t.join(timeout=10)
        if proc.returncode == 0 and out_lines:
            return 0, out_lines[-1], None
        if proc.returncode == 2:
            # argparse usage error — deterministic, retrying is noise
            return 2, out_lines[-1] if out_lines else "", None
        for ln in out_lines:  # salvage a mid-run provisional record
            rec = _parse_json_line(ln)
            if rec is not None:
                salvage = rec
        retry = attempt < attempts and t_end - time.time() >= 120
        log(f"bench supervisor: attempt {attempt} rc={proc.returncode}; "
            f"{'retrying in a fresh process' if retry else 'giving up'}")
    return 1, "", salvage


def _remaining_budget() -> float:
    """Seconds left before this child's supervisor deadline (inf when run
    un-supervised, e.g. `_BENCH_CHILD=1 python bench.py` by hand)."""
    dl = os.environ.get("_BENCH_DEADLINE")
    return float(dl) - time.time() if dl else float("inf")


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--compute-dtype", default="bfloat16",
                   help="default bfloat16: qualified vs f32 on the full "
                   "reference workload (round-3 A/B in docs/PERF.md — "
                   "SIFID delta 27x below the seed-to-seed noise floor)")
    p.add_argument("--all-scales", action="store_true",
                   help="also report a per-scale table to stderr")
    p.add_argument("--sampling", action="store_true",
                   help="also bench 64-sample batched generation")
    p.add_argument("--video", action="store_true",
                   help="also bench the 3D video train step (finest scale)")
    p.add_argument("--flat-opt", action="store_true", default=None,
                   help="flat single-buffer optimizer instead of the "
                   "per-leaf optax chain (A/B; measured slower)")
    p.add_argument("--xla-option", dest="xla_options", action="append",
                   default=None, metavar="KEY=VALUE",
                   help="extra XLA compiler option for the train chunk "
                   "(repeatable)")
    p.add_argument("--fused-dg", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="fused D+G chunk (shared fake forward); default on "
                   "since the round-3 quality A/B (docs/PERF.md)")
    p.add_argument("--headline-only", action="store_true",
                   help="skip the sampling/video rows (faster; the default "
                   "run reports all BASELINE.md rows)")
    args = p.parse_args()

    # validate EVERY input BEFORE any bench runs (a malformed option or a
    # missing baseline file must not surface after minutes of TPU compiles
    # — let alone after three full supervisor attempts)
    bad = [s for s in args.xla_options or [] if "=" not in s]
    if bad:
        p.error(f"--xla-option expects KEY=VALUE, got: {', '.join(bad)}")
    xla_opts = dict(s.split("=", 1) for s in args.xla_options) \
        if args.xla_options else None
    try:
        target_steps_per_sec()
    except Exception as e:
        p.error(f"benchdata/cpu_baseline.json unusable ({e!r}); regenerate "
                "with scripts/measure_cpu_baseline.py")

    if os.environ.get("_BENCH_CHILD") != "1":
        _supervised_reexec()

    log(f"devices: {jax.devices()}")
    if args.all_scales:
        for s in (0, 3, 5, 7, 9):
            sps = bench_scale(s, iters=args.iters,
                              compute_dtype=args.compute_dtype)
            log(f"scale {s}: {sps:.3f} steps/s")
    if args.sampling:
        ips16 = bench_sampling(compute_dtype="bfloat16")
        log(f"batched generation (bf16 flow-through): {ips16:.2f} images/s")
        secs = bench_eval_sifid()
        log(f"end-to-end 64 samples + on-device sinFID: {secs:.2f} s")

    # ---- headline: finest-scale image train step, the qualified config ----
    sps = bench_scale(9, iters=args.iters, compute_dtype=args.compute_dtype,
                      flat_opt=args.flat_opt, xla_options=xla_opts,
                      fused_dg=args.fused_dg)
    log(f"finest scale (9, 257px, {args.compute_dtype}"
        f"{'+fused-dg' if args.fused_dg else ''}): {sps:.3f} steps/s")

    result = {
        "metric": "train_steps_per_sec_finest_scale_256px_image",
        "value": round(sps, 4),
        "unit": "steps/sec",
        "vs_baseline": round(sps / target_steps_per_sec(), 4),
        "config": f"{args.compute_dtype}"
                  f"{'+fused_dg' if args.fused_dg else ''}",
    }
    # provisional record: if a LATER row wedges this process, the supervisor
    # salvages this line instead of discarding a real headline measurement
    # (the parent prints exactly one line either way — see supervise())
    if os.environ.get("_BENCH_CHILD") == "1" and not args.headline_only:
        print(json.dumps(result), flush=True)

    # ---- remaining BASELINE.md rows (all four tracked per round) ----
    # each row is gated on the supervisor budget: skipping with an explicit
    # reason beats overrunning the driver's timeout and losing the artifact
    # worst observed cold costs; video_finest = the ~600 s worst-case cold
    # remote compile of the finest 3D chunk (train_watchdog.sh sizing) plus
    # the measurement itself at ~1.8 steps/s
    ROW_COST = {"sampling": 300.0, "video": 420.0, "video_finest": 700.0,
                "serving": 420.0}
    if not args.headline_only:
        if _remaining_budget() < ROW_COST["sampling"]:
            log("sampling bench skipped: supervisor budget nearly spent")
            result["sampling_images_per_sec"] = None
            result["sampling_skipped"] = "bench budget exhausted"
        else:
            try:
                ips = bench_sampling()
                log(f"batched generation (64/batch, full depth, f32): "
                    f"{ips:.2f} images/s")
                result["sampling_images_per_sec"] = round(ips, 2)
            except Exception as e:  # a row failure must not kill the headline
                log(f"sampling bench failed: {e!r}")
                result["sampling_images_per_sec"] = None
        if _remaining_budget() < ROW_COST["video"]:
            log("video bench skipped: supervisor budget nearly spent")
            result["video_steps_per_sec"] = None
            result["video_skipped"] = "bench budget exhausted"
        else:
            try:
                vsps = bench_video_scale(compute_dtype=args.compute_dtype,
                                         fused_dg=args.fused_dg)
                log(f"video train step (scale 6 of the 128px/13-frame "
                    f"workload, {args.compute_dtype}"
                    f"{'+fused-dg' if args.fused_dg else ''}): "
                    f"{vsps:.2f} steps/s")
                result["video_steps_per_sec"] = round(vsps, 3)
            except Exception as e:
                log(f"video bench failed: {e!r}")
                result["video_steps_per_sec"] = None
            # NOT the 256px finest-3D soak workload from docs/PERF.md
            # (1.84 it/s there) — label so rounds can't conflate the two
            result["video_workload"] = ("scale 6/7, 128px/13-frame, "
                                        "td 13, fused chunk of 8")
        # the finest-3D rate — the most expensive compute shape of the whole
        # framework (the 256px pan-clip video workload's finest scale,
        # 13x192x257, td 13: the round-3 26k-iter soak shape, docs/PERF.md,
        # expected ~1.8 steps/s bf16+fused-dg) — tracked in the driver
        # artifact so cross-round regression checking no longer rests on
        # prose. Reference metric mechanism: src/utils/progress_bar.py:37-47.
        if _remaining_budget() < ROW_COST["video_finest"]:
            log("finest-3D bench skipped: supervisor budget nearly spent")
            result["video_finest_steps_per_sec"] = None
            result["video_finest_skipped"] = "bench budget exhausted"
        else:
            try:
                vf = bench_video_scale(
                    scale_idx=None, iters=16,
                    compute_dtype=args.compute_dtype,
                    fused_dg=args.fused_dg,
                    video_path="data/vids/balloons_pan.avi", img_size=256)
                log(f"video train step (finest scale of the 256px/13-frame "
                    f"pan-clip workload, {args.compute_dtype}"
                    f"{'+fused-dg' if args.fused_dg else ''}): "
                    f"{vf:.3f} steps/s")
                result["video_finest_steps_per_sec"] = round(vf, 3)
            except Exception as e:
                log(f"finest-3D bench failed: {e!r}")
                result["video_finest_steps_per_sec"] = None
            result["video_finest_workload"] = (
                "finest scale of the 256px/13-frame balloons_pan workload, "
                "13x192x257, td 13, fused chunk of 8")
        # native serving latency (live when a prepared export + built runner
        # exist on this VM, carried from benchdata otherwise — see
        # serving_row)
        result.update(serving_row(
            lambda: _remaining_budget() >= ROW_COST["serving"]))

    print(json.dumps(result))


if __name__ == "__main__":
    main()
