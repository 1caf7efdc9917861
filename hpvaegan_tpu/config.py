"""Typed configuration with CLI-flag parity to the reference drivers.

The reference mutates an argparse Namespace with derived state and serializes it
via `args.txt` (reference: train_image.py:215-339, eval_image.py:123-132). Here
the same surface is a dataclass with explicit derived-field computation and a
JSON/args.txt round-trip, so eval/export re-hydration is lossless.
"""

from __future__ import annotations

import ast
import dataclasses
import math
from dataclasses import dataclass, field
from typing import List, Optional


@dataclass
class Config:
    # Load / input / save (reference: train_image.py:219-222)
    netG: str = ""
    netD: str = ""
    intermediate: str = ""
    manualSeed: Optional[int] = None

    # Network hyper-parameters (reference: train_image.py:225-235)
    nc_im: int = 3
    nfc: int = 64
    latent_dim: int = 128
    vae_levels: int = 3
    enc_blocks: int = 2
    ker_size: int = 3
    num_layer: int = 5
    stride: int = 1
    padd_size: int = 1
    generator: str = "GeneratorHPVAEGAN"
    discriminator: str = "WDiscriminator2D"

    # Pyramid parameters (reference: train_image.py:238-241)
    scale_factor: float = 0.75
    noise_amp: float = 0.1
    min_size: int = 32
    max_size: int = 256

    # Optimization hyper-parameters (reference: train_image.py:244-256)
    niter: int = 5000
    lr_g: float = 5e-4
    lr_d: float = 5e-4
    beta1: float = 0.5
    lambda_grad: float = 0.1
    rec_weight: float = 10.0
    kl_weight: float = 1.0
    disc_loss_weight: float = 1.0
    lr_scale: float = 0.2
    train_depth: int = 1
    grad_clip: float = 5.0
    const_amp: bool = False
    train_all: bool = False

    # Dataset (reference: train_image.py:259-263, train_video.py:276-283)
    image_path: str = ""
    video_path: str = ""
    start_frame: int = 0
    max_frames: int = 13
    hflip: bool = False
    img_size: int = 256
    sampling_rates: List[int] = field(default_factory=lambda: [4, 3, 2, 1])
    stop_scale_time: int = -1
    data_rep: int = 1000

    # Main arguments (reference: train_image.py:266-271)
    checkname: str = "debug"
    mode: str = "train"
    print_interval: int = 10
    image_interval: int = 100
    batch_size: int = 1
    visualize: bool = False

    # Eval arguments (reference: eval_image.py:84-93)
    exp_dir: str = ""
    save_path: str = "images"
    num_samples: int = 10
    max_samples: int = 4

    # --- TPU-native additions (no reference equivalent) ---
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16' for conv compute
    steps_per_call: int = 8  # training iterations fused per XLA dispatch
    #                          (lax.scan chunk; 1 = reference-like stepping)
    scan_unroll: int = 1  # unroll factor of the iteration scan (straight-line
    #                       code frees XLA from the carry-layout contract)
    paired_g: bool = False  # GAN-phase G step: recon+fake in ONE width-2B
    #                         forward with per-half BN stats (exact vs the
    #                         two separate forwards; different noise stream)
    split_step: bool = False  # compile D/G updates as separate programs from
    #                           the start (what the compile-failure retry
    #                           fallback does; skips the doomed combined-chunk
    #                           compile at the largest 3D scales)
    compile_ahead: bool = True  # overlap scale k's training with scale k+1's
    #                             XLA compile (training/pipeline.py; 2.7x
    #                             full-run wall clock through the remote
    #                             tunnel, behavior-identical — measured,
    #                             docs/PERF.md). --no-compile-ahead disables.
    pallas_fused_sampling: bool = False  # TPU: fused Pallas upscale+noise in
    #                          the no-grad sampling path (~1.8x on that op)
    flat_opt: bool = False  # run clip+Adam on ONE flattened buffer (one
    #                         segment-sum for all clip norms, one fused
    #                         update) — numerically identical (optim.flat_adam)
    #                         but MEASURED SLOWER on v5e (44.6 vs 47.1
    #                         steps/s): the flatten/unflatten traffic costs
    #                         more than the per-leaf launches save (PERF.md)
    fused_dg: bool = False  # GAN phase: D and G losses share ONE fake forward
    #                         (same refinement noise for both; XLA CSEs the
    #                         generator forward; ~10% faster). Deviates from
    #                         the reference's fresh-noise-per-step fakes.
    bug_compat: bool = False  # replicate reference bugs (frozen GP alpha,
    #                           severed adversarial G gradient: losses.py:26,94;
    #                           noise amp divided by batch_size again after the
    #                           batch-mean RMSE: train_image.py:147)
    xla_options: Optional[dict] = None  # extra XLA compiler options for the
    #                         train chunk (PJRT CompileOptions env overrides;
    #                         reaches the remote TPU compiler where XLA_FLAGS
    #                         cannot). CLI: --xla-option key=value (repeat)
    ckpt_interval: int = 0  # mid-scale checkpoint cadence in iterations
    #                         (0 = scale-end only, the reference cadence:
    #                         train_image.py:206-210). At reference-scale
    #                         iteration counts (50k/scale) a supervisor
    #                         restart would otherwise lose hours — the
    #                         inflight_<k>.ckpt carries the FULL train state
    #                         (G+D params/state, both optimizer states, RNG)
    #                         so a resumed run continues bit-exactly.
    mesh_data: int = 1  # data-parallel mesh axis size (batched sampling/training)
    mesh_sp: int = 1  # spatial mesh axis size (H sharded when divisible; XLA
    #                   SPMD inserts the conv halo exchanges over ICI)
    dist_coordinator: str = ""  # multi-process bootstrap: "auto" (TPU pod
    #                   discovery) or host:port (+ dist_nprocs/dist_procid).
    #                   Empty = single-process (parallel/multihost.py).
    dist_nprocs: int = 0  # process count for explicit-coordinator bootstrap
    dist_procid: int = -1  # this process's id for explicit bootstrap
    device_id: int = 0  # which jax.devices() entry to run on (reference:
    #                     train_image.py:276 context.set_context(device_id))
    run_dir: str = "run"  # experiment root (reference hard-codes 'run/')

    # --- Derived state (computed, not user flags) ---
    ar: float = 1.0  # aspect ratio h/w (reference: image.py:29)
    num_scales: int = 0
    stop_scale: int = 0
    scale1: float = 1.0
    scale_factor_init: float = 0.75
    noise_amp_init: float = 0.1
    scale_idx: int = 0
    org_fps: float = 24.0
    fps_lcm: int = 12
    fps: float = 24.0
    td: int = 13
    fps_index: int = 0

    def finalize(self) -> "Config":
        """Compute derived pyramid state (reference: train_image.py:301-305)."""
        self.noise_amp_init = self.noise_amp
        self.scale_factor_init = self.scale_factor
        adjust_scales2image(self.img_size, self)
        if self.stop_scale_time == -1:
            self.stop_scale_time = self.stop_scale
        if self.data_rep < self.batch_size:
            self.data_rep = self.batch_size
        return self

    # --- args.txt round-trip (reference: train_image.py:336-339 / eval_image.py:123-132) ---
    def write_args_txt(self, path: str) -> None:
        with open(path, "w") as f:
            for k, v in sorted(dataclasses.asdict(self).items()):
                if isinstance(v, (str, int, float, tuple, list, bool)):
                    f.write("{}: {}\n".format(k, v))

    @classmethod
    def from_args_txt(cls, path: str, base: Optional["Config"] = None,
                      exceptions: Optional[List[str]] = None) -> "Config":
        cfg = base if base is not None else cls()
        exceptions = exceptions or []
        names = {f.name for f in dataclasses.fields(cls)}
        with open(path, "r") as f:
            for line in f.readlines():
                # strip EDGES only — blanket space removal would corrupt
                # any value containing a space (e.g. a path under
                # '/data/my photos/'), failing eval/export rehydration
                # long after training completed fine
                parts = [p.strip() for p in line.split(":", 1)]
                if len(parts) != 2 or parts[0] in exceptions or parts[0] not in names:
                    continue
                try:
                    value = ast.literal_eval(parts[1])
                except Exception:
                    value = parts[1]
                setattr(cfg, parts[0], value)
        return cfg


def adjust_scales2image(size: int, cfg) -> None:
    """Pyramid schedule (reference: src/utils/images.py:64-71).

    Defaults 256/32/0.75 -> num_scales=10, stop_scale=9, effective
    scale_factor = (min_size/size)^(1/stop_scale) ~= 0.7937.
    """
    cfg.num_scales = math.ceil(math.log(math.pow(cfg.min_size / size, 1),
                                        cfg.scale_factor_init)) + 1
    scale2stop = math.ceil(math.log(min(cfg.max_size, size) / size,
                                    cfg.scale_factor_init))
    cfg.stop_scale = cfg.num_scales - scale2stop
    cfg.scale1 = min(cfg.max_size / size, 1)
    cfg.scale_factor = math.pow(cfg.min_size / size, 1 / cfg.stop_scale)
