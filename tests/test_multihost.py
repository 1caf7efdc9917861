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
