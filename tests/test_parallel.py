"""Mesh/sharding tests on the 8-device virtual CPU platform (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.config import Config
from hpvaegan_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                        shard_batch)


def test_virtual_device_count():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(8, data_parallel=4)
    assert mesh.shape == {"data": 4, "sp": 2}
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "sp": 1}


def test_shard_batch_places_on_devices():
    mesh = make_mesh(8, data_parallel=4)
    x = jnp.zeros((8, 16, 16, 3))
    y = shard_batch(x, mesh, spatial_axis=1)
    assert y.sharding.is_equivalent_to(
        batch_sharding(mesh, 4, spatial_axis=1), 4)


def test_sharded_sampler_matches_shapes():
    from hpvaegan_tpu import models
    from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
    from hpvaegan_tpu.parallel.sampling import sharded_sampler

    cfg = Config(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=24,
                 min_size=12, max_size=24, vae_levels=1).finalize()
    cfg.ar = 1.0
    cfg.Noise_Amps = [1.0, 0.1]
    g_init, _ = models.get_generator("GeneratorHPVAEGAN", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(1))

    mesh = make_mesh(8)
    sample = sharded_sampler(cfg, p, s, ndim=2, mesh=mesh)
    out = sample(16, jax.random.PRNGKey(2))
    assert out.shape[0] == 16
    assert np.isfinite(out).all()
    # diverse: samples differ
    assert np.abs(out[0] - out[1]).max() > 1e-6


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sampled_sifid_on_device():
    """BASELINE config 5 pipeline: device-resident samples -> Inception
    features -> per-sample stats; only stats reach the host."""
    from hpvaegan_tpu import models
    from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
    from hpvaegan_tpu.parallel.sampling import sampled_sifid

    cfg = Config(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=32,
                 min_size=16, max_size=32, vae_levels=1).finalize()
    cfg.ar = 1.0
    cfg.Noise_Amps = [1.0, 0.1]
    g_init, _ = models.get_generator("GeneratorHPVAEGAN", 2)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(1))

    real = np.random.RandomState(0).rand(48, 48, 3).astype(np.float32)
    vals = sampled_sifid(cfg, p, s, real, 8, jax.random.PRNGKey(2))
    assert len(vals) == 8
    assert all(np.isfinite(v) for v in vals)
    assert all(v >= 0 for v in vals)


def test_sampled_svfid_on_device():
    """Video variant: device-resident video samples -> C3D features."""
    from hpvaegan_tpu import models
    from hpvaegan_tpu.models.networks_3d import generator_init_next_stage
    from hpvaegan_tpu.parallel.sampling import sampled_svfid

    cfg = Config(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=24,
                 min_size=12, max_size=24, vae_levels=1, sampling_rates=[2, 1],
                 stop_scale_time=-1).finalize()
    cfg.ar = 1.0
    cfg.org_fps = 24.0
    cfg.fps_lcm = 2
    cfg.Noise_Amps = [1.0, 0.1]
    g_init, _ = models.get_generator("GeneratorHPVAEGAN", 3)
    p, s = g_init(cfg, jax.random.PRNGKey(0))
    p, s = generator_init_next_stage(cfg, p, s, jax.random.PRNGKey(1))

    real = np.random.RandomState(0).rand(5, 24, 24, 3).astype(np.float32)
    vals = sampled_svfid(cfg, p, s, real, 8, jax.random.PRNGKey(2))
    assert len(vals) == 8
    assert all(np.isfinite(v) and v >= 0 for v in vals)


def test_context_parallel_conv3d_over_time():
    """CP over the video time axis (SURVEY §2.3/§5: optional capability —
    halo exchange of ker//2 frames): XLA's SPMD partitioner inserts the
    halos automatically for a T-sharded Conv3D; result must equal the
    unsharded conv."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hpvaegan_tpu.ops.conv import conv3d_apply, conv3d_init

    mesh = make_mesh(8, data_parallel=2)  # sp axis = 4
    params = conv3d_init(jax.random.PRNGKey(0), 3, 8, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 12, 3))

    want = np.asarray(conv3d_apply(params, x, padding=1))

    xs = jax.device_put(x, NamedSharding(mesh, P("data", "sp")))
    with mesh:
        got = jax.jit(lambda p, x: conv3d_apply(p, x, padding=1))(params, xs)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_data_parallel_training(tmp_path):
    """Full trainer with batch sharded over the 8-device mesh (a capability
    the reference lacks entirely, SURVEY §2.3)."""
    import os

    from hpvaegan_tpu.training.trainer import run_training

    img = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                       "air_balloons.jpg")
    cfg = Config(image_path=img, checkname="dp", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, batch_size=8, mesh_data=8,
                 steps_per_call=2, run_dir=str(tmp_path),
                 manualSeed=1).finalize()
    g_params, _, amps, _ = run_training(cfg, mode="image", seed=1)
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)


def test_data_parallel_training_split_steps(tmp_path):
    """split_step=True (the compile-fallback path) must keep the mesh: the
    split builders apply the same batch sharding constraint as the fused
    chunk (steps._mesh_shard_fn) instead of silently training replicated."""
    import os

    from hpvaegan_tpu.training.trainer import run_training

    img = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                       "air_balloons.jpg")
    cfg = Config(image_path=img, checkname="dps", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, batch_size=8, mesh_data=8,
                 split_step=True, run_dir=str(tmp_path),
                 manualSeed=1).finalize()
    g_params, _, amps, _ = run_training(cfg, mode="image", seed=1)
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)


def test_sampler_per_sample_bn_parity():
    """sharded_sampler(train=True) must equal N independent batch-1
    forwards: BN statistics are PER SAMPLE (the reference's
    one-sample-per-G-call eval loop, eval_image.py:56-59), not pooled over
    the generated batch. Pools would couple samples through their BN stats."""
    from hpvaegan_tpu import models
    from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
    from hpvaegan_tpu.parallel.sampling import sharded_sampler
    from hpvaegan_tpu.utils.pyramid import scale_size_2d

    cfg = Config(nfc=8, latent_dim=8, num_layer=1, enc_blocks=1, img_size=24,
                 min_size=12, max_size=24, vae_levels=1).finalize()
    cfg.ar = 1.0
    cfg.Noise_Amps = [1.0] + [0.1] * cfg.stop_scale
    g_init, g_apply = models.get_generator("GeneratorHPVAEGAN", 2)
    g_params, g_state = g_init(cfg, jax.random.PRNGKey(0))
    for i in range(cfg.stop_scale):
        g_params, g_state = generator_init_next_stage(cfg, g_params, g_state,
                                                      jax.random.PRNGKey(i))
    mesh = make_mesh(1)
    sample = sharded_sampler(cfg, g_params, g_state, ndim=2, mesh=mesh)
    batch = 4
    key = jax.random.PRNGKey(7)
    out = sample(batch, key)

    # replicate the sampler's internal key discipline with explicit
    # batch-1 forwards
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                           cfg.ar)
    kn, kf = jax.random.split(key)
    noise = jax.random.normal(kn, (batch, h0, w0, cfg.latent_dim))
    amps = np.zeros((cfg.stop_scale + 2,), np.float32)
    amps[:len(cfg.Noise_Amps)] = cfg.Noise_Amps
    singles = []
    for z, k in zip(noise, jax.random.split(kf, batch)):
        o, _ = g_apply(cfg, g_params, g_state, video=None,
                       amps=jnp.asarray(amps), noise_init=z[None], key=k,
                       is_random=True, train=True)
        singles.append(np.asarray(o[0][0]))
    np.testing.assert_allclose(out, np.stack(singles), atol=2e-5)


def test_compile_ahead_mesh_cache_hit(tmp_path, caplog):
    """Compile-ahead must actually pre-populate the jit cache on MESH runs:
    each scale's chunk compiles exactly once (foreground for scale 0,
    background thread for later scales). Regression: AOT-lowering with
    sharding-less ShapeDtypeStructs keyed the cache as GSPMD-replicated,
    missing the NamedSharding-replicated real state -> a silent extra
    foreground compile per scale."""
    import logging
    import os

    from hpvaegan_tpu.training.trainer import run_training

    img = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                       "air_balloons.jpg")
    cfg = Config(image_path=img, checkname="cam", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=4, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, batch_size=2, mesh_data=2,
                 steps_per_call=2, run_dir=str(tmp_path),
                 manualSeed=1).finalize()
    assert cfg.compile_ahead
    jax.config.update("jax_log_compiles", True)
    try:
        with caplog.at_level(logging.WARNING,
                             logger="jax._src.interpreters.pxla"):
            run_training(cfg, mode="image", seed=1)
    finally:
        jax.config.update("jax_log_compiles", False)
    chunk_compiles = [r for r in caplog.records
                      if "Compiling jit(chunk)" in r.getMessage()]
    n_scales = cfg.stop_scale + 1
    assert len(chunk_compiles) == n_scales, (
        f"expected one chunk compile per scale ({n_scales}), got "
        f"{len(chunk_compiles)} — compile-ahead missed the jit cache")


def test_spatial_sharded_training(tmp_path):
    """Trainer-level sp>1: one tiny run on a ('data':2, 'sp':4) mesh — the
    formed batch is H-sharded over 'sp' at scales where H divides 4 (XLA
    SPMD inserts the conv halo exchanges), falling back to replicated-H
    otherwise."""
    import os

    from hpvaegan_tpu.training.trainer import run_training

    img = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                       "air_balloons.jpg")
    cfg = Config(image_path=img, checkname="sp", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, batch_size=2, mesh_data=2,
                 mesh_sp=4, steps_per_call=2, run_dir=str(tmp_path),
                 manualSeed=1).finalize()
    g_params, _, amps, _ = run_training(cfg, mode="image", seed=1)
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)


def test_mesh_inflight_resume_exact(tmp_path):
    """--ckpt-interval under a data-parallel mesh: the inflight save
    gathers the replicated state to host, resume re-replicates it — the
    round-trip must continue bit-exactly (same final params as an
    uninterrupted same-seed mesh run)."""
    import json
    import os

    from hpvaegan_tpu.training.trainer import run_training

    img = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                       "air_balloons.jpg")

    def _cfg(run_dir):
        return Config(image_path=img, checkname="mi", nfc=8, latent_dim=8,
                      num_layer=1, enc_blocks=1, niter=6, img_size=24,
                      min_size=12, max_size=24, vae_levels=1, batch_size=8,
                      mesh_data=8, steps_per_call=2, ckpt_interval=2,
                      print_interval=100, compile_ahead=False,
                      run_dir=run_dir, manualSeed=1).finalize()

    cfg_a = _cfg(str(tmp_path / "a"))
    g_a, _, amps_a, _ = run_training(cfg_a, mode="image", seed=1)

    class Boom(Exception):
        pass

    cfg_b = _cfg(str(tmp_path / "b"))
    last = cfg_b.stop_scale

    def cb(done, state, metrics):
        if cfg_b.scale_idx == last and done == 4:
            raise Boom()

    try:
        run_training(cfg_b, mode="image", seed=1, step_callback=cb)
        assert False, "expected the simulated kill"
    except Boom:
        pass
    exp_b = cfg_b.saver.experiment_dir
    with open(os.path.join(exp_b, "intermediate.json")) as f:
        inter = json.load(f)
    assert inter["inflight"] == f"inflight_{last}.ckpt"

    cfg_c = _cfg(str(tmp_path / "c"))
    cfg_c.netG = os.path.join(exp_b, inter["inflight"])
    cfg_c.intermediate = os.path.join(exp_b, "intermediate.json")
    g_c, _, amps_c, _ = run_training(cfg_c, mode="image", seed=1)

    assert amps_a == amps_c
    for a, c in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_c)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_video_mesh_training(tmp_path):
    """Trainer-level VIDEO run on a ('data':2, 'sp':4) mesh: the 5-D
    (B, T, H, W, C) batch is sharded over 'data' on B and H-sharded over
    'sp' at scales where H divides 4 (the chunk's _shard video branch,
    training/steps.py — XLA SPMD emits the Conv3D halo exchanges),
    replicated-H otherwise."""
    import os

    from hpvaegan_tpu.training.trainer import run_training

    vid = os.path.join(os.path.dirname(__file__), "..", "data", "vids",
                       "synthetic.avi")
    cfg = Config(video_path=vid, checkname="vmesh", nfc=8, latent_dim=8,
                 num_layer=1, enc_blocks=1, niter=2, img_size=24, min_size=12,
                 max_size=24, vae_levels=1, sampling_rates=[2, 1],
                 max_frames=5, discriminator="WDiscriminator3D",
                 batch_size=2, mesh_data=2, mesh_sp=4, steps_per_call=2,
                 run_dir=str(tmp_path), manualSeed=1).finalize()
    g_params, _, amps, _ = run_training(cfg, mode="video", seed=1)
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)


def test_baselines_mesh_training(tmp_path):
    """The SinGAN-baselines trainer shares make_train_chunk's mesh path
    (VERDICT round-1 unification) — run GeneratorCSG on a ('data':2,
    'sp':4) mesh end to end and check the amp schedule stays finite."""
    import os

    from hpvaegan_tpu.training.baselines_trainer import run_training as run_b

    vid = os.path.join(os.path.dirname(__file__), "..", "data", "vids",
                       "synthetic.avi")
    cfg = Config(video_path=vid, checkname="bmesh", nfc=8, num_layer=1,
                 niter=2, img_size=18, min_size=9, max_size=18,
                 sampling_rates=[2, 1], max_frames=5,
                 generator="GeneratorCSG",
                 discriminator="WDiscriminatorBaselines",
                 batch_size=2, mesh_data=2, mesh_sp=4, steps_per_call=2,
                 print_interval=100, run_dir=str(tmp_path),
                 manualSeed=1).finalize()
    g_params, _, amps, saver = run_b(cfg, seed=1)
    assert len(amps) == cfg.stop_scale + 1
    assert all(np.isfinite(a) for a in amps)
    assert os.path.exists(os.path.join(saver.experiment_dir, "Z_init.npy"))
