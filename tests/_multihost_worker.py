"""Subprocess worker for tests/test_multihost.py: one JAX process of a
2-process × 2-virtual-CPU-device cluster (Gloo collectives), running the
full image trainer over a global data=4 mesh.

Run: python tests/_multihost_worker.py <proc_id> <nprocs> <port> <workdir>
Prints one JSON line with a params checksum for cross-process identity.
"""

import json
import os
import sys

proc_id, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
workdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hpvaegan_tpu.parallel import multihost  # noqa: E402

multihost.init_distributed(f"127.0.0.1:{port}", num_processes=nprocs,
                           process_id=proc_id)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from hpvaegan_tpu.config import Config  # noqa: E402
from hpvaegan_tpu.training.trainer import run_training  # noqa: E402

assert jax.process_count() == nprocs
assert jax.device_count() == 2 * nprocs

IMG = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                   "air_balloons.jpg")
# seed agreement: give the processes DIFFERENT requests; the primary's wins
seed = multihost.agree_seed(7 + proc_id * 1000)

cfg = Config(image_path=IMG, checkname="mh", nfc=8, latent_dim=8,
             num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
             max_size=24, vae_levels=1, batch_size=4, mesh_data=4,
             steps_per_call=2, compile_ahead=False, print_interval=100,
             run_dir=workdir, manualSeed=seed).finalize()
g_params, g_state, amps, saver = run_training(cfg, mode="image", seed=seed)

leaves = [np.asarray(jax.device_get(x), np.float64)
          for x in jax.tree_util.tree_leaves(g_params)]
checksum = float(sum(float(np.sum(np.abs(l))) for l in leaves))

# batched diverse-sample generation over the SAME cross-process mesh: the
# batch shards across processes; to_host allgathers, so every process must
# see the identical full batch
from hpvaegan_tpu.parallel.mesh import make_mesh  # noqa: E402
from hpvaegan_tpu.parallel.sampling import sharded_sampler  # noqa: E402

cfg.Noise_Amps = [float(a) for a in amps]
sample = sharded_sampler(cfg, g_params, g_state, ndim=2,
                         mesh=make_mesh(4, data_parallel=4))
out = sample(4, jax.random.PRNGKey(0))
sample_sum = float(np.sum(np.abs(np.asarray(out, np.float64))))

print(json.dumps({"proc": proc_id, "seed": seed, "checksum": checksum,
                  "amps": [float(a) for a in amps],
                  "saver": type(saver).__name__,
                  "exp_dir": saver.experiment_dir,
                  "sample_shape": list(out.shape),
                  "sample_sum": sample_sum}), flush=True)
