"""MindSpore .ckpt ingestion tests.

Closed loop: the test reimplements the REFERENCE's torch->MindSpore name
mapping verbatim (pt2ms.py:30-89 p2m_HPVAEGAN_2d, :8-27 p2m_WDiscriminator_2d)
as a fixture generator, then checks that our MS->JAX converter recovers the
exact same pytree the torch->JAX converter produces from the original
state_dict — validating the inverse mapping against the reference's forward
mapping without needing MindSpore.
"""

import os
import pickle
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpvaegan_tpu.tools.convert import (m2j_HPVAEGAN, m2j_WDiscriminator,
                                        p2j_HPVAEGAN, p2j_WDiscriminator)
from hpvaegan_tpu.tools.ms_ckpt import (is_ms_checkpoint, load_ms_checkpoint,
                                        save_ms_checkpoint)

from test_convert import _cfg, _fake_torch_netG


# ---- reference torch->MS mapping, reimplemented verbatim (pt2ms.py) --------

def _p2m_netG(sd):
    """pt2ms.p2m_HPVAEGAN_2d:30-89 without the MindSpore types."""
    new = {}
    for key, value in sd.items():
        if "encode." in key:
            m = re.search(r"features\.conv_block_(\d+?)\.", key)
            if m is not None:
                key = key.replace(m.group(0), f"_features.{m.group(1)}.")
            elif "mu" in key:
                key = key.replace("mu.", "_mu.", 1)
            elif "logvar" in key:
                key = key.replace("logvar.", "_logvar.", 1)
            if "conv." in key:
                key = key.replace("conv.", "0.", 1)
                if "weight_orig" in key:
                    key = key.replace("weight_orig", "weight", 1)
        if "decoder." in key or "body." in key:
            if "body." in key and \
                    int(re.search(r"body\.(\d+?)\.", key).group(1)) != 0:
                key = key.replace("body.", "body.0.0.", 1)
            if "head." in key:
                key = key.replace("head.", "0.", 1)
            elif re.search(r"block(\d+?)\.", key) is not None:
                m = re.search(r"block(\d+?)\.", key)
                key = key.replace(m.group(0), f"{int(m.group(1)) + 1}.", 1)
            elif "tail." in key:
                key = key.replace("tail.", "6.", 1)  # num_layer 5 hardcoded
            if "conv." in key:
                key = key.replace("conv.", "0.", 1)
            elif "norm." in key:
                key = key.replace("norm.", "1.", 1)
                if "weight" in key:
                    key = key.replace("weight", "gamma", 1)
                elif "bias" in key:
                    key = key.replace("bias", "beta", 1)
                elif "running_mean" in key:
                    key = key.replace("running_mean", "moving_mean", 1)
                elif "running_var" in key:
                    key = key.replace("running_var", "moving_variance", 1)
                elif "num_batches_tracked" in key:
                    continue
        if "weight_u" in key or "weight_v" in key:
            value = np.asarray(value).reshape(-1, 1)  # torch unsqueeze(-1)
        new[key] = np.asarray(value, np.float32)
    return new


def _p2m_netD(sd):
    """pt2ms.p2m_WDiscriminator_2d:8-27."""
    new = {}
    for key, value in sd.items():
        if "body." in key and \
                int(re.search(r"block(\d+?)\.", key).group(1)) != 0:
            key = key.replace("body.", "body.0.", 1)
        m = re.search(r"block(\d+?)\.", key)
        if m is not None:
            key = key.replace(m.group(0), f"{int(m.group(1))}.", 1)
        if "conv." in key:
            key = key.replace("conv.", "0.", 1)
            if "weight_orig" in key:
                key = key.replace("weight_orig", "weight", 1)
        if "weight_u" in key or "weight_v" in key:
            value = np.asarray(value).reshape(-1, 1)
        new[key] = np.asarray(value, np.float32)
    return new


def _fake_torch_netD(cfg, seed=1):
    rng = np.random.RandomState(seed)
    sd = {}

    def snconv(prefix, cin, cout, k=3):
        sd[f"{prefix}.weight_orig"] = rng.randn(cout, cin, k, k).astype(
            np.float32) * 0.05
        sd[f"{prefix}.bias"] = np.zeros(cout, np.float32)
        sd[f"{prefix}.weight_u"] = rng.randn(cout).astype(np.float32)
        sd[f"{prefix}.weight_v"] = rng.randn(cin * k * k).astype(np.float32)

    n = cfg.nfc
    snconv("head.conv", cfg.nc_im, n)
    for i in range(cfg.num_layer):
        snconv(f"body.block{i}.conv", n, n)
    sd["tail.weight"] = rng.randn(1, n, 3, 3).astype(np.float32) * 0.05
    sd["tail.bias"] = np.zeros(1, np.float32)
    return {"state_dict": sd}


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


# ---- wire format ------------------------------------------------------------

def test_ckpt_wire_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.randn(4, 3, 3, 3).astype(np.float32),
        "a.bias": rng.randn(4).astype(np.float32),
        "scalar": np.float32(2.5).reshape(()),
        "ints": np.arange(7, dtype=np.int64),
        "half": rng.randn(2, 5).astype(np.float16),
    }
    path = str(tmp_path / "t.ckpt")
    save_ms_checkpoint(tensors, path)
    back = load_ms_checkpoint(path)
    assert set(back) == set(tensors)
    for k in tensors:
        assert back[k].dtype == tensors[k].dtype
        np.testing.assert_array_equal(back[k], tensors[k])


def test_ckpt_bf16_roundtrip(tmp_path):
    import ml_dtypes
    x = np.arange(6, dtype=np.float32).reshape(2, 3).astype(ml_dtypes.bfloat16)
    path = str(tmp_path / "b.ckpt")
    save_ms_checkpoint({"x": x}, path)
    back = load_ms_checkpoint(path)
    assert back["x"].dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(back["x"], x)


def test_ckpt_malformed_inputs_fail_loudly(tmp_path):
    p = str(tmp_path / "bad.ckpt")
    # truncated varint / length header
    with open(p, "wb") as f:
        f.write(b"\x0a\xff\xff")
    with pytest.raises((ValueError, IndexError)):
        load_ms_checkpoint(p)
    # unsupported dtype name
    with pytest.raises(ValueError, match="unsupported"):
        save_ms_checkpoint({"x": np.zeros(2, np.complex64)},
                           str(tmp_path / "c.ckpt"))
    # empty file: not an MS checkpoint, and loads as zero parameters
    e = str(tmp_path / "empty.ckpt")
    open(e, "wb").close()
    assert not is_ms_checkpoint(e)
    assert load_ms_checkpoint(e) == {}


def test_content_sniff_vs_pickled_pytree(tmp_path):
    ms_path = str(tmp_path / "ms.ckpt")
    save_ms_checkpoint({"x": np.ones(3, np.float32)}, ms_path)
    pk_path = str(tmp_path / "ours.ckpt")
    with open(pk_path, "wb") as f:
        pickle.dump({"params": {"w": np.ones(3)}}, f)
    assert is_ms_checkpoint(ms_path)
    assert not is_ms_checkpoint(pk_path)


# ---- name-mapping closed loop ----------------------------------------------

def test_m2j_generator_matches_p2j(tmp_path):
    cfg = _cfg()  # num_layer=1; tail lands at '6.' exactly as p2m hardcodes
    torch_ckpt = _fake_torch_netG(cfg, n_stages=3)
    want_p, want_s = p2j_HPVAEGAN(torch_ckpt, ndim=2)

    ms = _p2m_netG(torch_ckpt["state_dict"])
    # through the actual file format too
    path = str(tmp_path / "netG_2.ckpt")
    save_ms_checkpoint(ms, path)
    assert is_ms_checkpoint(path)
    got_p, got_s = m2j_HPVAEGAN(load_ms_checkpoint(path), ndim=2)

    _trees_equal(want_p, got_p)
    _trees_equal(want_s, got_s)


def test_m2j_generator_raw_save_layout():
    """The reference's m2m path (pt2ms.py:92-104): generators saved straight
    from a MindSpore cell carry body keys WITHOUT the 'body.' prefix —
    stage 0 as '0.<rest>', stage k as '<k>.<rest>'."""
    cfg = _cfg()
    torch_ckpt = _fake_torch_netG(cfg, n_stages=3)
    want_p, want_s = p2j_HPVAEGAN(torch_ckpt, ndim=2)

    raw = {}
    for k, v in _p2m_netG(torch_ckpt["state_dict"]).items():
        if k.startswith("body."):
            segs = k[len("body."):].split(".")
            if len(segs) >= 5 and segs[0] == "0" and segs[1] == "0":
                raw[".".join(segs[2:])] = v  # stage k >= 1: '<k>.<rest>'
            else:
                raw[".".join(segs)] = v  # stage 0: '0.<rest>' (module
                # keys 'body.0.0.*' are len-4 and stay stage-0 — the same
                # structural rule the converter applies)
        else:
            raw[k] = v
    got_p, got_s = m2j_HPVAEGAN(raw, ndim=2)
    _trees_equal(want_p, got_p)
    _trees_equal(want_s, got_s)


def _fake_torch_netG_3d(cfg, n_stages=2, seed=3):
    rng = np.random.RandomState(seed)
    sd = {}

    def conv(prefix, cin, cout, k=3, sn=False, bn=False):
        w = rng.randn(cout, cin, k, k, k).astype(np.float32) * 0.05
        sd[f"{prefix}.conv.weight_orig" if sn else f"{prefix}.conv.weight"] = w
        sd[f"{prefix}.conv.bias"] = np.zeros(cout, np.float32)
        if sn:
            sd[f"{prefix}.conv.weight_u"] = rng.randn(cout).astype(np.float32)
            sd[f"{prefix}.conv.weight_v"] = rng.randn(cin * k ** 3).astype(
                np.float32)
        if bn:
            sd[f"{prefix}.norm.weight"] = np.ones(cout, np.float32)
            sd[f"{prefix}.norm.bias"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.norm.running_mean"] = np.zeros(cout, np.float32)
            sd[f"{prefix}.norm.running_var"] = np.ones(cout, np.float32)

    n = cfg.nfc
    conv("encode.features.conv_block_0", cfg.nc_im, n, sn=True)
    conv("encode.features.conv_block_1", n, n, sn=True)
    for head in ("mu", "logvar"):
        sd[f"encode.{head}.conv.weight"] = rng.randn(
            cfg.latent_dim, n, 3, 3, 3).astype(np.float32) * 0.05
        sd[f"encode.{head}.conv.bias"] = np.zeros(cfg.latent_dim, np.float32)

    def stack(prefix, cin):
        conv(f"{prefix}.head", cin, n, bn=True)
        for i in range(cfg.num_layer):
            conv(f"{prefix}.block{i}", n, n, bn=True)
        sd[f"{prefix}.tail.weight"] = rng.randn(
            cfg.nc_im, n, 3, 3, 3).astype(np.float32) * 0.05
        sd[f"{prefix}.tail.bias"] = np.zeros(cfg.nc_im, np.float32)

    stack("decoder", cfg.latent_dim)
    for k in range(n_stages):
        stack(f"body.{k}", cfg.nc_im)
    return {"state_dict": sd}


def _p2m_netG_3d(sd):
    """pt2ms.p2m_HPVAEGAN_3d:129-188 — identical to 2D except
    norm. -> 1.bn2d. (:175)."""
    new = {}
    for key, value in sd.items():
        if "norm." in key and ("decoder." in key or "body." in key):
            key = key.replace("norm.", "norm.bn2d$", 1)  # placeholder
        k2 = {}
        # reuse the 2D mapper, then expand the placeholder: 2D maps
        # norm.->1., so 'norm.bn2d$gamma' arrives as '1.bn2d$gamma'
        for kk, vv in _p2m_netG({key: value}).items():
            k2[kk.replace("bn2d$", "bn2d.")] = vv
        new.update(k2)
    return new


def test_m2j_generator_3d_matches_p2j():
    cfg = _cfg()
    torch_ckpt = _fake_torch_netG_3d(cfg, n_stages=3)
    want_p, want_s = p2j_HPVAEGAN(torch_ckpt, ndim=3)
    ms = _p2m_netG_3d(torch_ckpt["state_dict"])
    assert any(".bn2d." in k for k in ms)  # the 3D BN level is exercised
    got_p, got_s = m2j_HPVAEGAN(ms, ndim=3)
    _trees_equal(want_p, got_p)
    _trees_equal(want_s, got_s)


def test_m2j_discriminator_matches_p2j():
    cfg = _cfg()
    torch_ckpt = _fake_torch_netD(cfg)
    want_p, want_s = p2j_WDiscriminator(torch_ckpt, ndim=2)
    got_p, got_s = m2j_WDiscriminator(_p2m_netD(torch_ckpt["state_dict"]),
                                      ndim=2)
    _trees_equal(want_p, got_p)
    _trees_equal(want_s, got_s)


def test_train_resume_from_ms_checkpoint(tmp_path):
    """The reference's --netG training resume takes a MindSpore .ckpt
    (train_image.py:374-377) — a converted reference experiment must be
    continuable: the trainer retrains the resumed scale from the converted
    params and completes with the full artifact contract."""
    import json

    from hpvaegan_tpu.config import Config
    from hpvaegan_tpu.training.trainer import run_training

    img = os.path.join(os.path.dirname(__file__), "..", "data", "imgs",
                       "air_balloons.jpg")

    def mkcfg(run_dir):
        return Config(image_path=img, checkname="ms", nfc=8, latent_dim=8,
                      num_layer=1, enc_blocks=1, niter=2, img_size=24,
                      min_size=12, max_size=24, vae_levels=1,
                      print_interval=100, compile_ahead=False,
                      run_dir=run_dir, manualSeed=1).finalize()

    # a completed run provides the experiment layout (args/intermediate)
    cfg_a = mkcfg(str(tmp_path / "a"))
    run_training(cfg_a, mode="image", seed=1)
    exp = cfg_a.saver.experiment_dir
    with open(os.path.join(exp, "intermediate.json")) as f:
        inter = json.load(f)
    k = int(inter["scale_idx"])
    assert k >= 1

    # fabricate a reference-style MindSpore netG_<k>.ckpt at this config
    # (body length k — the same convention: netG_k retrains scale k)
    torch_ckpt = _fake_torch_netG(cfg_a, n_stages=k)
    ms_path = os.path.join(exp, "netG_ms.ckpt")
    save_ms_checkpoint(_p2m_netG(torch_ckpt["state_dict"]), ms_path)
    # the D warm-start in the same directory is MindSpore-format too
    netD = _fake_torch_netD(cfg_a)
    save_ms_checkpoint(_p2m_netD(netD["state_dict"]),
                       os.path.join(exp, f"netD_{k - 1}.ckpt"))

    cfg_b = mkcfg(str(tmp_path / "b"))
    cfg_b.netG = ms_path
    cfg_b.intermediate = os.path.join(exp, "intermediate.json")
    g_b, _, amps_b, saver_b = run_training(cfg_b, mode="image", seed=1)

    assert len(g_b["body"]) == k  # retrained scale k, no extra growth
    assert len(amps_b) == k + 1
    assert os.path.exists(os.path.join(saver_b.experiment_dir,
                                       f"netG_{k}.ckpt"))
    # the resumed scale's amp was recalibrated from the converted params
    assert amps_b[:k] == inter["noise_amps"][:k]


def test_eval_guard_rejects_stage_scale_mismatch(tmp_path):
    """An out-of-range per-stage amp index would CLAMP silently in the jnp
    gather — the eval loader must reject a checkpoint whose stage count
    disagrees with intermediate.json's scale_idx."""
    import json

    from hpvaegan_tpu.evaluation import load_generator

    cfg = _cfg()
    cfg.generator = "GeneratorHPVAEGAN"
    cfg.scale_idx = -1
    exp = str(tmp_path)
    with open(os.path.join(exp, "intermediate.json"), "w") as f:
        json.dump({"scale_idx": 2, "noise_amps": [1.0, 0.1, 0.05]}, f)
    torch_ckpt = _fake_torch_netG(cfg, n_stages=3)  # one stage too many
    path = os.path.join(exp, "netG_2.ckpt")
    save_ms_checkpoint(_p2m_netG(torch_ckpt["state_dict"]), path)
    cfg.run_dir = exp
    cfg.experiment_dir = exp
    with pytest.raises(RuntimeError, match="refinement.*stages"):
        load_generator(cfg, exp, ndim=2)


def test_reference_args_txt_hydrates(tmp_path):
    """A REFERENCE experiment's args.txt (train_image.py:336-339 writes
    'key: value' lines for every opt attr, including MindSpore-only keys
    and post-adjust derived values) must hydrate our Config: unknown keys
    skipped, derived fields land."""
    from hpvaegan_tpu.config import Config

    lines = {
        # reference-only keys our Config must skip
        "device_id": "0", "device_target": "Ascend", "data_rep": "1000",
        "netG": "", "checkname": "DEV", "mode": "train",
        # shared surface (post-adjust values as the reference writes them)
        "image_path": "data/imgs/air_balloons.jpg",
        "img_size": "256", "min_size": "32", "max_size": "256",
        "scale_factor": "0.7937005259840998", "scale_factor_init": "0.75",
        "stop_scale": "9", "num_scales": "10", "scale_idx": "0",
        "ar": "0.7490636704119851",
        "nfc": "64", "latent_dim": "128", "num_layer": "5",
        "enc_blocks": "2", "vae_levels": "3", "niter": "5000",
        "lr_g": "0.0005", "lr_d": "0.0005", "batch_size": "2",
        "sampling_rates": "[4, 3, 2, 1]", "hflip": "True",
        "train_depth": "1", "grad_clip": "5",
    }
    p = tmp_path / "args.txt"
    p.write_text("".join(f"{k}: {v}\n" for k, v in sorted(lines.items())))
    cfg = Config.from_args_txt(str(p))
    assert cfg.img_size == 256 and cfg.nfc == 64
    assert abs(cfg.scale_factor - 0.7937005259840998) < 1e-12
    assert cfg.stop_scale == 9
    assert cfg.sampling_rates == [4, 3, 2, 1]
    assert cfg.hflip is True
    assert abs(cfg.ar - 0.7490636704119851) < 1e-12
    assert not hasattr(cfg, "device_target")  # unknown keys skipped


# ---- reverse migration (ours -> MindSpore) ----------------------------------

def _grown_generator(ndim: int, n_stages: int = 2):
    from hpvaegan_tpu import models

    cfg = _cfg()
    g_init, _ = models.get_generator("GeneratorHPVAEGAN", ndim)
    params, state = g_init(cfg, jax.random.PRNGKey(0))
    if ndim == 2:
        from hpvaegan_tpu.models.networks_2d import generator_init_next_stage
    else:
        from hpvaegan_tpu.models.networks_3d import generator_init_next_stage
    for i in range(n_stages):
        params, state = generator_init_next_stage(cfg, params, state,
                                                  jax.random.PRNGKey(i + 1))
    return cfg, params, state


@pytest.mark.parametrize("ndim", [2, 3])
def test_j2m_m2j_roundtrip(ndim, tmp_path):
    """Ours -> MindSpore file -> ours is exact: transposes, SN u/v
    permutations, BN stats and the stage/stack naming all invert."""
    from hpvaegan_tpu.tools.convert import j2m_HPVAEGAN

    _, params, state = _grown_generator(ndim)
    ms = j2m_HPVAEGAN(params, state, ndim=ndim)
    path = str(tmp_path / "rt.ckpt")
    save_ms_checkpoint(ms, path)
    got_p, got_s = m2j_HPVAEGAN(load_ms_checkpoint(path), ndim=ndim)
    _trees_equal(params, got_p)
    _trees_equal(got_s, state)


def test_j2m_names_match_reference_layout():
    """The emitted MindSpore names follow the reference's p2m layout (spot
    checks against pt2ms.py's documented renames)."""
    from hpvaegan_tpu.tools.convert import j2m_HPVAEGAN

    _, params, state = _grown_generator(2, n_stages=3)
    ms = j2m_HPVAEGAN(params, state, ndim=2)
    assert "encode._features.0.0.weight" in ms
    assert "encode._features.0.0.weight_u" in ms
    assert "encode._mu.0.weight" in ms
    assert "decoder.0.0.weight" in ms          # head conv
    assert "decoder.1.1.gamma" in ms           # block0 BN
    assert "body.0.0.0.weight" in ms           # stage 0 head conv
    assert "body.0.0.2.0.0.weight" in ms       # stage 2 head conv
    assert any(k.endswith(".moving_mean") for k in ms)
    # u/v are MindSpore column vectors
    assert ms["encode._features.0.0.weight_u"].ndim == 2


# ---- converted checkpoint drives the model ----------------------------------

def test_ms_loaded_generator_runs(tmp_path):
    from hpvaegan_tpu import models
    from hpvaegan_tpu.utils.pyramid import scale_size_2d

    cfg = _cfg()
    torch_ckpt = _fake_torch_netG(cfg, n_stages=2)
    path = str(tmp_path / "netG.ckpt")
    save_ms_checkpoint(_p2m_netG(torch_ckpt["state_dict"]), path)
    params, state = m2j_HPVAEGAN(load_ms_checkpoint(path), ndim=2)

    _, g_apply = models.get_generator("GeneratorHPVAEGAN", 2)
    h0, w0 = scale_size_2d(0, cfg.scale_factor, cfg.stop_scale, cfg.img_size,
                           1.0)
    noise = jnp.zeros((1, h0, w0, cfg.latent_dim))
    amps = jnp.ones((len(params["body"]) + 1,))
    out, _ = g_apply(cfg, params, state, video=None, amps=amps,
                     noise_init=noise, key=jax.random.PRNGKey(0),
                     is_random=True, train=True)
    assert np.all(np.isfinite(np.asarray(out[0])))


def test_truncated_length_delimited_field_fails_loudly(tmp_path):
    """A checkpoint truncated inside a length-delimited field must raise,
    not 'successfully' parse with trailing parameters dropped (a dropped
    weight_u/weight_v would silently become a random SN vector)."""
    import numpy as np
    import pytest

    from hpvaegan_tpu.tools.ms_ckpt import load_ms_checkpoint, \
        save_ms_checkpoint

    path = str(tmp_path / "x.ckpt")
    save_ms_checkpoint({"a.weight": np.ones((4, 4), np.float32),
                        "b.weight_u": np.ones((4, 1), np.float32)}, path)
    blob = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(blob[:-7])  # cut inside the last tensor payload
    with pytest.raises(ValueError, match="truncated"):
        load_ms_checkpoint(path)


def test_m2j_rejects_wrong_checkpoint_type():
    """Feeding a discriminator checkpoint to the generator loader (an easy
    netG/netD filename mix-up) must fail loudly at the mapper, not as a
    cryptic pytree error downstream."""
    import numpy as np
    import pytest

    from hpvaegan_tpu.tools.convert import m2j_HPVAEGAN

    netd_like = {"head.0.weight_orig": np.ones((8, 3, 3, 3), np.float32),
                 "head.0.weight_u": np.ones((8, 1), np.float32),
                 "tail.0.weight": np.ones((1, 8), np.float32)}
    with pytest.raises(ValueError, match="wrong checkpoint type"):
        m2j_HPVAEGAN(netd_like, ndim=2)
