"""Coverage for the small auxiliary surfaces: profiling (trace ctx +
barrier-correct StepTimer), the logbook progress bar, and the reverse
MindSpore-export CLI (python -m hpvaegan_tpu.tools.export_ms)."""

import json
import logging
import os
import sys

import jax
import numpy as np

IMG = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                   "air_balloons.jpg")


def test_trace_noop_and_real(tmp_path):
    from hpvaegan_tpu.utils.profiling import trace

    with trace(""):  # falsy -> no-op, no profiler started
        pass
    d = tmp_path / "prof"
    with trace(str(d)):
        jax.block_until_ready(jax.numpy.ones((8, 8)) @ jax.numpy.ones((8, 8)))
    # jax.profiler.trace writes plugins/profile/<ts>/*.xplane.pb
    found = [p for p in d.rglob("*") if p.suffix == ".pb"]
    assert found, f"no xplane output under {d}"


def test_barrier_and_steptimer():
    from hpvaegan_tpu.utils.profiling import StepTimer, barrier

    assert barrier(np.asarray([3.5, 1.0])) == 3.5
    assert barrier(jax.numpy.float32(2.0)) == 2.0
    t = StepTimer()
    rate = t.tick(5, sync_value=jax.numpy.sum(jax.numpy.ones(4)))
    assert rate is not None and rate > 0
    assert t.steps == 5
    t.reset()
    assert t.steps == 0


def test_logbook_tqdm_close_line(caplog):
    from hpvaegan_tpu.utils.logger import LOGBOOK_LEVEL
    from hpvaegan_tpu.utils.progress import create_progressbar

    with caplog.at_level(LOGBOOK_LEVEL):
        bar = create_progressbar(total=4, desc="unit")
        bar.update(4)
        bar.close()
    assert any(r.levelno == LOGBOOK_LEVEL and "unit" in r.message
               for r in caplog.records), "close-line not logged at LOGBOOK"

    caplog.clear()
    with caplog.at_level(LOGBOOK_LEVEL):
        bar = create_progressbar(total=4, desc="quiet", disable=True)
        bar.update(4)
        bar.close()
    assert not [r for r in caplog.records if r.levelno == LOGBOOK_LEVEL], \
        "disabled bar must not write the logbook close-line"


def test_export_ms_cli_round_trip(tmp_path, monkeypatch):
    """The reverse-export CLI writes a MindSpore Checkpoint that round-trips
    bit-exactly through the forward converter."""
    from hpvaegan_tpu import models
    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.tools.convert import m2j_HPVAEGAN
    from hpvaegan_tpu.tools.ms_ckpt import is_ms_checkpoint, load_ms_checkpoint
    from hpvaegan_tpu.utils.saver import save_pytree

    cfg = Config(image_path=IMG, checkname="x", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, manualSeed=0).finalize()
    g_init = models.get_generator(cfg.generator, 2)[0]
    params, state = g_init(cfg, jax.random.PRNGKey(0))

    exp = tmp_path / "experiment_0"
    exp.mkdir()
    cfg.write_args_txt(str(exp / "args.txt"))
    with open(exp / "intermediate.json", "w") as f:
        json.dump({"noise_amps": [1.0], "scale_idx": 0}, f)
    save_pytree({"params": params, "state": state}, str(exp / "netG_0.ckpt"))

    from hpvaegan_tpu.tools import export_ms

    monkeypatch.setattr(sys, "argv", ["export_ms", str(exp)])
    export_ms.main()

    out = exp / "netG_0.ms.ckpt"
    assert out.exists() and is_ms_checkpoint(str(out))
    rt_params, rt_state = m2j_HPVAEGAN(load_ms_checkpoint(str(out)), ndim=2)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rt_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
