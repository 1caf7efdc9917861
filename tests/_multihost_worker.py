"""Subprocess worker for tests/test_multihost.py: one JAX process of a
2-process × 2-virtual-CPU-device cluster (Gloo collectives), running the
full trainers over a global data=4 mesh.

Run: python tests/_multihost_worker.py <proc_id> <nprocs> <port> <workdir> [mode]
Modes:
  image      — image train + cross-process sampling + on-device-FID eval
               (the full primary/NullSaver IO contract)
  video      — 2-scale HPVAEGAN Conv3D video train (the flagship video
               trainer over a cross-process mesh: VAE + GAN phases,
               fps/td schedule, primary-only IO)
  baselines  — 2-scale CSG video-baselines train (exercises the scale>0
               netD warm-start symmetry allgather with real collectives)
Prints one JSON line with a params checksum for cross-process identity.
"""

import json
import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
workdir = sys.argv[4]
mode = sys.argv[5] if len(sys.argv) > 5 else "image"

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpvaegan_tpu.parallel import multihost  # noqa: E402

multihost.init_distributed(f"127.0.0.1:{port}", num_processes=nprocs,
                           process_id=proc_id)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hpvaegan_tpu.config import Config  # noqa: E402

assert jax.process_count() == nprocs
assert jax.device_count() == 2 * nprocs

DATA = os.path.join(os.path.dirname(__file__), "..", "data")
IMG = os.path.join(DATA, "imgs", "air_balloons.jpg")
VID = os.path.join(DATA, "vids", "synthetic.avi")


def checksum_of(params):
    leaves = [np.asarray(jax.device_get(x), np.float64)
              for x in jax.tree_util.tree_leaves(params)]
    return float(sum(float(np.sum(np.abs(l))) for l in leaves))


# ---- cross-process primitive contracts (cheap; run in every mode) ----
# agree_minmax: every process sees the full spread, not just the primary's
lo, hi = multihost.agree_minmax(float(proc_id))
assert (lo, hi) == (0.0, float(nprocs - 1)), (lo, hi)
# broadcast_str: when the PRIMARY's string is over-long, EVERY process must
# raise (never truncate to a wrong path) — the asymmetric shape is the real
# production case: non-primaries pass "" (select_saver), so a local length
# check would raise on the primary only and hang the rest in the collective
try:
    multihost.broadcast_str("x" * 5000 if multihost.is_primary() else "",
                            max_len=4096)
    raise AssertionError("broadcast_str accepted an over-long string")
except ValueError:
    pass
# exact-fit boundary survives the round-trip on every rank
assert multihost.broadcast_str(
    "y" * 4096 if multihost.is_primary() else "", max_len=4096) == "y" * 4096

# seed agreement: give the processes DIFFERENT requests; the primary's wins
seed = multihost.agree_seed(7 + proc_id * 1000)

if mode == "image":
    from hpvaegan_tpu.training.trainer import run_training

    cfg = Config(image_path=IMG, checkname="mh", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, batch_size=4, mesh_data=4,
                 steps_per_call=2, compile_ahead=False, print_interval=100,
                 run_dir=workdir, manualSeed=seed).finalize()
    g_params, g_state, amps, saver = run_training(cfg, mode="image",
                                                  seed=seed)
    checksum = checksum_of(g_params)

    # batched diverse-sample generation over the SAME cross-process mesh:
    # the batch shards across processes; to_host allgathers, so every
    # process must see the identical full batch
    from hpvaegan_tpu.parallel.mesh import make_mesh
    from hpvaegan_tpu.parallel.sampling import sharded_sampler

    cfg.Noise_Amps = [float(a) for a in amps]
    sample = sharded_sampler(cfg, g_params, g_state, ndim=2,
                             mesh=make_mesh(4, data_parallel=4))
    out = sample(4, jax.random.PRNGKey(0))
    sample_sum = float(np.sum(np.abs(np.asarray(out, np.float64))))

    # ---- eval leg: the CLI path (hydrate args.txt -> on-device FID) ----
    # multi-process eval: batch shards over the global mesh; the primary
    # writes eval artifacts, everyone agrees on the score
    from hpvaegan_tpu.evaluation import eval_image_experiment, hydrate_config

    exp_dir = saver.experiment_dir
    ecfg = hydrate_config(exp_dir, dict(
        niter=1, data_rep=1, batch_size=1, num_samples=4, max_samples=2,
        save_path="images", scale_idx=-1, mesh_data=4, on_device_fid=True,
        netG=""))
    sifid, _ = eval_image_experiment(ecfg, exp_dir)

    print(json.dumps({"proc": proc_id, "seed": seed, "checksum": checksum,
                      "amps": [float(a) for a in amps],
                      "saver": type(saver).__name__,
                      "exp_dir": saver.experiment_dir,
                      "sample_shape": list(out.shape),
                      "sample_sum": sample_sum,
                      "sifid": float(sifid)}), flush=True)

elif mode == "video":
    from hpvaegan_tpu.training.trainer import run_training

    cfg = Config(video_path=VID, checkname="mhv", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=18,
                 min_size=9, max_size=18, sampling_rates=[2, 1],
                 max_frames=5, vae_levels=1,
                 discriminator="WDiscriminator3D",
                 batch_size=4, mesh_data=4, steps_per_call=2,
                 compile_ahead=False, print_interval=100,
                 run_dir=workdir, manualSeed=seed).finalize()
    g_params, g_state, amps, saver = run_training(cfg, mode="video",
                                                  seed=seed)
    print(json.dumps({"proc": proc_id, "seed": seed,
                      "checksum": checksum_of(g_params),
                      "amps": [float(a) for a in amps],
                      "saver": type(saver).__name__,
                      "exp_dir": saver.experiment_dir,
                      "n_scales": int(cfg.stop_scale + 1)}), flush=True)

elif mode == "baselines":
    from hpvaegan_tpu.training.baselines_trainer import run_training as run_b
    from hpvaegan_tpu.utils.saver import DataSaver

    cfg = Config(video_path=VID, checkname="mhb", nfc=8, num_layer=1,
                 niter=2, img_size=18, min_size=9, max_size=18,
                 sampling_rates=[2, 1], max_frames=5,
                 generator="GeneratorCSG",
                 discriminator="WDiscriminatorBaselines",
                 batch_size=4, mesh_data=4, print_interval=100,
                 steps_per_call=2, run_dir=workdir,
                 manualSeed=seed).finalize()
    if multihost.is_primary():
        cfg.saver = DataSaver(cfg)
    g_params, g_state, amps, saver = run_b(cfg, seed=seed)
    print(json.dumps({"proc": proc_id, "seed": seed,
                      "checksum": checksum_of(g_params),
                      "amps": [float(a) for a in amps],
                      "saver": type(saver).__name__,
                      "exp_dir": saver.experiment_dir,
                      "n_scales": int(cfg.stop_scale + 1)}), flush=True)

else:
    raise SystemExit(f"unknown mode {mode!r}")
