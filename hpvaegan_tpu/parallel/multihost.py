"""Multi-process (multi-host) training support.

The reference is strictly single-process, single-device — SURVEY §2.3: no
DP/TP/PP anywhere, device picked by --device-id (reference
train_image.py:276). This module adds the TPU-pod execution model on top of
the existing mesh machinery:

  * one JAX process per host, each addressing its local chips;
    ``jax.devices()`` is GLOBAL after ``jax.distributed`` bootstrap, so
    ``parallel.mesh.make_mesh`` spans hosts with no changes — XLA SPMD
    emits the identical program per process, gradient all-reduces ride ICI
    within a host and DCN across hosts;
  * params/optimizer state stay replicated and the batch shards over the
    global ('data', 'sp') mesh, exactly like the single-process path
    (training/steps.py `_shard`);
  * exactly ONE process (process_index 0) owns file IO — experiment dirs,
    checkpoints, logbook, media. The others run the same replicated
    computation against a :class:`NullSaver`. On a pod with a shared
    filesystem, ungated writers would race the run-id auto-increment and
    clobber each other's checkpoints.

Testability: the bootstrap works on the CPU backend through Gloo
collectives, so the full multi-process training path runs as N local
processes × M virtual devices each (tests/test_multihost.py) — no pod
needed to validate the program structure the pod will execute.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax


def init_distributed(coordinator: str = "auto",
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> None:
    """Bootstrap ``jax.distributed`` for a multi-process run.

    coordinator == "auto": no-arg ``jax.distributed.initialize()`` — on TPU
    pods the runtime discovers the coordinator, process count, and process
    id itself. Otherwise pass ``host:port`` plus explicit
    ``num_processes``/``process_id`` (the generic cluster form, and the form
    the CPU-backed tests use).

    Must run before any other JAX API touches a backend. On the CPU
    platform cross-process collectives need an implementation picked before
    backend init; Gloo is the one jaxlib ships.
    """
    try:
        platforms = jax.config.jax_platforms or ""
    except AttributeError:  # pragma: no cover - very old jax
        platforms = ""
    if "cpu" in platforms.split(","):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception as e:  # noqa: BLE001 - absent on some jaxlib builds
            logging.warning("could not select Gloo CPU collectives: %s", e)
    if coordinator == "auto":
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    logging.info("jax.distributed: process %d/%d, %d local / %d global devices",
                 jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())


def add_dist_flags(parser) -> None:
    """The --dist-* CLI surface, shared by every train/eval driver."""
    parser.add_argument('--dist-coordinator', type=str, default='',
                        help="multi-process bootstrap: 'auto' (TPU pod "
                             'discovery) or host:port with --dist-nprocs/'
                             '--dist-procid; process 0 owns all file IO')
    parser.add_argument('--dist-nprocs', type=int, default=0,
                        help='process count (explicit-coordinator bootstrap)')
    parser.add_argument('--dist-procid', type=int, default=-1,
                        help="this process's id (explicit bootstrap)")


def init_from_cfg(cfg) -> None:
    """Bootstrap from the --dist-* flags if given (no-op otherwise)."""
    coordinator = getattr(cfg, "dist_coordinator", "")
    if not coordinator:
        return
    nprocs = getattr(cfg, "dist_nprocs", 0)
    procid = getattr(cfg, "dist_procid", -1)
    init_distributed(coordinator,
                     num_processes=nprocs or None,
                     process_id=procid if procid >= 0 else None)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the single process that owns file IO (and always true in the
    ordinary single-process run)."""
    return jax.process_index() == 0


def sync(tag: str = "barrier") -> None:
    """Cross-process barrier (no-op single-process). Used at run boundaries
    so the primary's final checkpoint write cannot race a non-primary
    teardown on pods where the launcher kills stragglers."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def to_host(x):
    """np.asarray for global arrays/pytrees. Single-process it IS np.asarray;
    in a multi-process run a batch-sharded array has non-addressable shards
    and np.asarray raises — allgather the shards across processes first
    (every process gets the full value; the sampling paths need it for FID
    stats and artifact dumps). Pass related arrays as ONE pytree: each
    to_host call dispatches its own collective, and per-dispatch round-trip
    latency dominates on remote-device transports (docs/PERF.md)."""
    import numpy as np

    if not is_multiprocess():
        return jax.tree_util.tree_map(np.asarray, x)
    from jax.experimental import multihost_utils

    return jax.tree_util.tree_map(
        np.asarray, multihost_utils.process_allgather(x, tiled=True))


def agree_float(x: float) -> float:
    """Broadcast the primary's scalar to every process (identity
    single-process). Lets one process compute a host-side metric (e.g. the
    disk-read SIFID) and share the result instead of every process
    re-reading primary-written files. Also a cross-process barrier."""
    if not is_multiprocess():
        return float(x)
    import numpy as np
    from jax.experimental import multihost_utils

    val = np.asarray([x], dtype=np.float64)
    return float(multihost_utils.broadcast_one_to_all(val)[0])


def agree_seed(seed: Optional[int]) -> Optional[int]:
    """The whole run is one replicated program, so every process must train
    from the SAME seed — but the reference CLI draws a random one when
    --manualSeed is absent (train_image.py:287-289), which would diverge
    per process. Broadcast the primary's draw; identity single-process."""
    if not is_multiprocess():
        return seed
    import numpy as np
    from jax.experimental import multihost_utils

    val = np.asarray([seed if seed is not None else 0], dtype=np.int64)
    return int(multihost_utils.broadcast_one_to_all(val)[0])


def agree_minmax(x: float) -> tuple:
    """(min, max) of a per-process scalar across ALL processes (identity
    single-process). Unlike agree_float (a primary broadcast), EVERY
    process sees every process's value — so a symmetry check
    (`lo != hi -> raise`) aborts the job on all ranks instead of turning
    an asymmetric filesystem view into a distributed hang at the next
    collective (the primary, whose value defines a broadcast, would never
    have raised)."""
    if not is_multiprocess():
        return float(x), float(x)
    import numpy as np
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(
        np.asarray([x], dtype=np.float64))
    return float(np.min(vals)), float(np.max(vals))


def broadcast_str(s: str, max_len: int = 4096) -> str:
    """Broadcast a string from the primary (fixed-width uint8 buffer —
    broadcast_one_to_all needs identical shapes on every process).

    A string longer than max_len raises instead of silently truncating:
    a truncated experiment dir would point non-primary NullSavers at a
    wrong path for shared-FS reads (netD warm-start), surfacing later as
    a confusing FileNotFoundError or a symmetry abort. The PRIMARY's true
    length rides the same collective (8-byte header), so the raise fires
    on EVERY process — a local pre-collective check would raise only on
    the primary (whose string is the long one; non-primaries pass \"\")
    and leave the others hung in the collective."""
    if not is_multiprocess():
        return s
    import numpy as np
    from jax.experimental import multihost_utils

    b = s.encode()[:max_len]
    true_len = len(s.encode())
    buf = np.zeros(8 + max_len, np.uint8)
    buf[:8] = np.frombuffer(true_len.to_bytes(8, "big"), np.uint8)
    buf[8:8 + len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    primary_len = int.from_bytes(out[:8].tobytes(), "big")
    if primary_len > max_len:
        raise ValueError(
            f"broadcast_str: primary's encoded string is {primary_len} "
            f"bytes > the fixed broadcast buffer ({max_len}); raise max_len")
    return out[8:8 + primary_len].tobytes().decode()


def select_saver(cfg, make_primary):
    """The primary process builds the real saver (run-id auto-increment,
    directory creation); its experiment dir is then broadcast so non-primary
    NullSavers can READ shared-filesystem artifacts (the baselines trainer
    warm-starts each scale's D from the previous scale's netD checkpoint,
    baselines_trainer.py). Writes remain primary-only everywhere."""
    if not is_multiprocess():
        return make_primary()
    if is_primary():
        saver = make_primary()
        broadcast_str(saver.experiment_dir)
        return saver
    return NullSaver(cfg, experiment_dir=broadcast_str(""))


class NullSaver:
    """DataSaver stand-in for non-primary processes: same surface, writes
    are no-ops. Reads resolve against the primary's broadcast experiment
    dir — valid on a shared filesystem (the TPU-pod norm); without one the
    read raises FileNotFoundError, which the warm-start path already treats
    as 'no checkpoint'."""

    image_dir = None

    def __init__(self, cfg=None, experiment_dir: str = ""):
        self.cfg = cfg
        self.iteration = 0
        self.experiment_dir = experiment_dir \
            or "<non-primary: no experiment dir>"
        import os

        self.eval_dir = os.path.join(self.experiment_dir, "eval") \
            if experiment_dir else self.experiment_dir

    def save_checkpoint(self, tree, filename: str) -> None:
        pass

    def save_inflight(self, scale_idx: int, state, key, iteration: int,
                      noise_amps) -> None:
        pass

    def finalize_scale(self, scale_idx: int, noise_amps, g_tree,
                       d_tree=None, key=None) -> None:
        pass

    def save_json(self, obj, filename: str) -> None:
        pass

    def save_image(self, img, filename: str) -> None:
        pass

    def save_video(self, array, filename: str) -> None:
        pass

    def load_checkpoint(self, filename: str, path: Optional[str] = None):
        import os

        from ..utils.saver import load_pytree

        return load_pytree(os.path.join(path or self.experiment_dir,
                                        filename))

    def load_json(self, filename: str, path: Optional[str] = None):
        import json
        import os

        with open(os.path.join(path or self.experiment_dir, filename)) as f:
            return json.load(f)
