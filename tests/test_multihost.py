"""Multi-process (multi-host) training: 2 local processes × 2 virtual CPU
devices each, Gloo collectives — the process structure a TPU-pod run
executes (one process per host, global mesh, replicated params, sharded
batch, primary-only IO). SURVEY §2.3: the reference is strictly
single-process/single-device; this is a new capability surface."""

import glob
import json
import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def test_nullsaver_matches_datasaver_surface():
    """NullSaver must not drift behind DataSaver: every public method the
    trainers can call on a saver must exist with a compatible signature."""
    import inspect

    from hpvaegan_tpu.parallel.multihost import NullSaver
    from hpvaegan_tpu.utils.saver import DataSaver

    for name, fn in inspect.getmembers(DataSaver, inspect.isfunction):
        if name.startswith("_"):
            continue
        null_fn = getattr(NullSaver, name, None)
        assert null_fn is not None, f"NullSaver lacks {name}"
        assert (inspect.signature(fn).parameters.keys()
                == inspect.signature(null_fn).parameters.keys()), name


def test_single_process_helpers_are_identity():
    """In an ordinary (single-process) run every multihost helper must be a
    no-op/passthrough — these run inside the trainers unconditionally."""
    import numpy as np

    from hpvaegan_tpu.parallel import multihost

    assert not multihost.is_multiprocess()
    assert multihost.is_primary()
    assert multihost.agree_seed(123) == 123
    assert multihost.agree_seed(None) is None
    assert multihost.broadcast_str("abc") == "abc"
    multihost.sync("noop")
    x = np.arange(6.0).reshape(2, 3)
    np.testing.assert_array_equal(multihost.to_host(x), x)
    a, b = multihost.to_host((x, x + 1))  # pytree form: one gather per call
    np.testing.assert_array_equal(a, x)
    np.testing.assert_array_equal(b, x + 1)
    assert multihost.agree_float(2.5) == 2.5
    assert multihost.agree_minmax(2.5) == (2.5, 2.5)
    sentinel = object()
    assert multihost.select_saver(None, lambda: sentinel) is sentinel


def test_nullsaver_writes_nothing_reads_shared_dir(tmp_path):
    import pickle

    from hpvaegan_tpu.parallel.multihost import NullSaver

    with open(tmp_path / "netD_0.ckpt", "wb") as f:
        pickle.dump({"params": {"w": 1}}, f)
    s = NullSaver(None, experiment_dir=str(tmp_path))
    s.save_checkpoint({"x": 1}, "netG_0.ckpt")
    s.save_json({"a": 1}, "intermediate.json")
    s.save_inflight(0, None, None, 4, [1.0])
    s.finalize_scale(0, [1.0], {"x": 1})
    assert sorted(p.name for p in tmp_path.iterdir()) == ["netD_0.ckpt"]
    assert s.load_checkpoint("netD_0.ckpt")["params"] == {"w": 1}


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    by_proc = {o["proc"]: o for o in outs}

    # the primary's seed request (7) won the broadcast on BOTH processes
    assert by_proc[0]["seed"] == 7 and by_proc[1]["seed"] == 7

    # the replicated program produced IDENTICAL params everywhere
    assert by_proc[0]["checksum"] == by_proc[1]["checksum"]
    assert by_proc[0]["amps"] == by_proc[1]["amps"]
    assert all(a > 0 for a in by_proc[0]["amps"])

    # cross-process batched sampling: the batch shards over all 4 global
    # devices; process_allgather hands BOTH processes the identical batch
    assert by_proc[0]["sample_shape"] == by_proc[1]["sample_shape"]
    assert by_proc[0]["sample_shape"][0] == 4
    assert by_proc[0]["sample_sum"] == by_proc[1]["sample_sum"]
    assert by_proc[0]["sample_sum"] > 0

    # exactly one process owned file IO
    assert by_proc[0]["saver"] == "DataSaver"
    assert by_proc[1]["saver"] == "NullSaver"
    # the broadcast experiment dir reached the non-primary intact
    assert by_proc[1]["exp_dir"] == by_proc[0]["exp_dir"]

    # one experiment dir, with the full checkpoint contract
    exps = glob.glob(os.path.join(str(tmp_path), "**", "experiment_*"),
                     recursive=True)
    assert len(exps) == 1
    exp = exps[0]
    inter = json.load(open(os.path.join(exp, "intermediate.json")))
    n_scales = inter["scale_idx"] + 1
    assert n_scales >= 3
    for k in range(n_scales):
        assert os.path.exists(os.path.join(exp, f"netG_{k}.ckpt"))
    assert os.path.exists(os.path.join(exp, "args.txt"))

    # ---- eval leg (the worker runs the CLI path with --on-device-fid) ----
    # both processes agreed on the score, the primary persisted artifacts
    assert by_proc[0]["sifid"] == by_proc[1]["sifid"]
    assert by_proc[0]["sifid"] > 0
    assert os.path.exists(os.path.join(exp, "eval", "random_samples.npy"))
    metrics = json.load(open(os.path.join(exp, "eval", "metrics.json")))
    assert metrics["metric"] == "SIFID"
    assert metrics["value"] == by_proc[0]["sifid"]


def test_two_process_video_training(tmp_path):
    """Multi-process HPVAEGAN Conv3D video training — the flagship video
    trainer (VAE + GAN phases, fps/td schedule) certified bit-identical
    across 2 processes × 2 devices with real Gloo collectives and
    primary-only IO (SURVEY §2.3 new-capability surface)."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path),
         "video"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    by_proc = {o["proc"]: o for o in outs}

    # identical replicated params + amp trajectories on both processes
    assert by_proc[0]["checksum"] == by_proc[1]["checksum"]
    assert by_proc[0]["amps"] == by_proc[1]["amps"]
    assert all(a > 0 for a in by_proc[0]["amps"])
    # exactly one process owned file IO; the broadcast dir reached both
    assert by_proc[0]["saver"] == "DataSaver"
    assert by_proc[1]["saver"] == "NullSaver"
    assert by_proc[1]["exp_dir"] == by_proc[0]["exp_dir"]

    exps = glob.glob(os.path.join(str(tmp_path), "**", "experiment_*"),
                     recursive=True)
    assert len(exps) == 1
    exp = exps[0]
    assert by_proc[0]["n_scales"] >= 2  # a real multi-scale ladder ran
    for k in range(by_proc[0]["n_scales"]):
        assert os.path.exists(os.path.join(exp, f"netG_{k}.ckpt"))
    assert os.path.exists(os.path.join(exp, "args.txt"))
    assert os.path.exists(os.path.join(exp, "intermediate.json"))


def test_two_process_baselines_training(tmp_path):
    """Multi-process CSG video-baselines train: exercises the 3D chunk over
    a cross-process mesh AND the scale>0 netD warm-start symmetry allgather
    (agree_minmax) with real Gloo collectives."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port), str(tmp_path),
         "baselines"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    by_proc = {o["proc"]: o for o in outs}

    assert by_proc[0]["checksum"] == by_proc[1]["checksum"]
    assert by_proc[0]["amps"] == by_proc[1]["amps"]
    assert by_proc[0]["saver"] == "DataSaver"
    assert by_proc[1]["saver"] == "NullSaver"
    assert by_proc[0]["n_scales"] >= 2  # warm-start ran at scale >= 1

    exps = glob.glob(os.path.join(str(tmp_path), "**", "experiment_*"),
                     recursive=True)
    assert len(exps) == 1
    exp = exps[0]
    # baselines contract: netD at EVERY scale, persisted Z_init
    for k in range(by_proc[0]["n_scales"]):
        assert os.path.exists(os.path.join(exp, f"netG_{k}.ckpt"))
        assert os.path.exists(os.path.join(exp, f"netD_{k}.ckpt"))
    assert os.path.exists(os.path.join(exp, "Z_init.npy"))
